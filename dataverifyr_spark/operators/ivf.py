"""IVF (inverted-file) approximate nearest neighbor — the k-means-bucketed
alternative to hyperplane LSH for embedding search at scale.

``kmeans_fit`` is Lloyd's algorithm expressed as DataFrame ops: assignment is
an argmin over k centroid literals (pure column algebra, one scan per
iteration with map-side partial aggregation for the centroid update); no MLlib
dependency, deterministic init via seeded reservoir-free hash sampling.

Search: index rows by nearest centroid once (``ivf_index``); a query probes
only the ``nprobe`` closest centroids' lists — O(N·nprobe/k) per query, and a
table written partitioned by ``cluster`` turns the probe into partition
pruning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, brute_force_topk

__all__ = ["kmeans_fit", "ivf_index", "ivf_topk"]


def _sq_dist(vec_col, centroid: list[float]):
    c = F.array(*[F.lit(float(v)) for v in centroid])
    diff = F.zip_with(vec_col, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)


def _assign(vec_col, centroids: list[list[float]]):
    """Index of the nearest centroid (argmin over k literal arrays)."""
    best_d = _sq_dist(vec_col, centroids[0])
    best_i = F.lit(0)
    for i, c in enumerate(centroids[1:], start=1):
        d = _sq_dist(vec_col, c)
        cond = d < best_d
        best_i = F.when(cond, F.lit(i)).otherwise(best_i)
        best_d = F.when(cond, d).otherwise(best_d)
    return best_i


def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Lloyd's k-means; returns k centroids (driver-side list of k×dim floats
    — tiny).  Init: the k rows with the smallest xxhash64(id-ish) — a
    deterministic pseudo-random sample without RNG state."""
    init = (
        df.select(F.col(vec_col))
        .withColumn("__h", F.xxhash64(F.col(vec_col).cast("array<string>"), F.lit(seed)))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in init]
    for _ in range(iters):
        assigned = df.select(
            _assign(F.col(vec_col), centroids).alias("__c"), F.col(vec_col)
        )
        # centroid update: per-dimension mean via posexplode -> one shuffle of
        # (cluster, dim) partial sums
        sums = (
            assigned.select("__c", F.posexplode(F.col(vec_col)).alias("__d", "__v"))
            .groupBy("__c", "__d")
            .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in sums:
            new[r["__c"]][r["__d"]] = float(r["__m"])
        centroids = new
    return centroids


def ivf_index(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("cluster", _assign(F.col(vec_col), centroids))


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search the nprobe nearest centroids' inverted lists."""
    dists = [
        (i, sum((q - c) ** 2 for q, c in zip(query_vec, cent)))
        for i, cent in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(dists, key=lambda t: t[1])[:nprobe]]
    return brute_force_topk(
        indexed.filter(F.col("cluster").isin(probe)), query_vec, k, vec_col, id_col
    )
