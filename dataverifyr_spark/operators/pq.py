"""Product quantization (PQ) — the memory-compression leg of a 100 TB ANN
index (public method: Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011).

Why it matters at scale: a 64-dim float64 embedding is 512 bytes; its PQ
code at m=8 subspaces × 256 centroids is 8 BYTES — a 64× compression that
decides whether the scan side of an ANN query fits executor memory.  The
corpus is quantized ONCE (`pq_encode`); queries stay full-precision and
score codes via ADC (asymmetric distance computation): per query, an
m×k lookup table of subspace distances is built driver-side, and each
row's approximate distance is m table lookups + a sum — pure JVM-side
`element_at`/`aggregate` column algebra, no vectors shuffled, no Python in
the row path.

Composes with IVF (`ivf.py`): coarse-quantize into inverted lists, PQ-score
inside the probed lists — the standard IVF-PQ layout.  Training reuses
`ivf.kmeans_fit` per subspace; encoding reuses the same adaptive
expression/pandas-UDF argmin as cluster assignment (`ivf.assign_clusters`
semantics: first-minimum tie-break, NULL/wrong-length → -1).

Reference parity note: the reference (DavZim/dataverifyr) has no vector
operators at all — this is a graft extension like the rest of operators/.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ivf import _EXPR_ASSIGN_MAX, _assign, kmeans_fit

__all__ = ["pq_train", "pq_encode", "pq_adc_topk", "adc_lut"]


def _check_geometry(dim: int, m: int) -> int:
    if m <= 0 or dim % m != 0:
        raise ValueError(f"dim {dim} must split evenly into m={m} subspaces")
    return dim // m


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 256,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """m per-subspace codebooks (each k × dim/m), trained independently with
    the deterministic Lloyd's of :func:`ivf.kmeans_fit` on the subspace
    slices.  Driver memory: m·k·(dim/m) = k·dim floats — tiny."""
    sub = _check_geometry(dim, m)
    books: list[list[list[float]]] = []
    for j in range(m):
        sliced = df.select(F.slice(F.col(vec_col), j * sub + 1, sub).alias("__sv"))
        books.append(
            kmeans_fit(sliced, k=k, dim=sub, iters=iters, vec_col="__sv", seed=seed + j)
        )
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """``df`` + an ``array<int>`` code column (length m): per subspace, the
    index of the nearest codebook centroid.

    Small codebooks ride the in-plan literal argmin fold (one per subspace);
    above ``ivf._EXPR_ASSIGN_MAX`` total elements, ONE Arrow-batched pandas
    UDF encodes all m subspaces per batch against a broadcast (m, k, sub)
    tensor — batched BLAS, the same adaptive policy as
    ``ivf.assign_clusters`` / ``similarity._lsh_codes``."""
    m = len(codebooks)
    if m == 0:
        raise ValueError("empty codebooks")
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    if any(len(cb) != k or any(len(c) != sub for c in cb) for cb in codebooks):
        raise ValueError("ragged codebooks: every subspace needs k x dim/m floats")

    if m * k * sub <= _EXPR_ASSIGN_MAX:
        codes = [
            _assign(F.slice(F.col(vec_col), j * sub + 1, sub), codebooks[j])
            for j in range(m)
        ]
        # whole-vector length gate so a wrong-length vector is ALL -1 like
        # the UDF path (a partial slice would otherwise code its complete
        # leading subspaces); NULL size -> otherwise branch
        return df.withColumn(
            out_col,
            F.when(F.size(F.col(vec_col)) == m * sub, F.array(*codes)).otherwise(
                F.array(*[F.lit(-1)] * m)
            ),
        )

    tensor = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)
    bc = df.sparkSession.sparkContext.broadcast(
        (tensor, (tensor * tensor).sum(axis=2))  # + per-centroid norms (m, k)
    )
    dim = m * sub

    @F.pandas_udf("array<int>")
    def _codes(vecs: pd.Series) -> pd.Series:
        cb, cn2 = bc.value
        vals = vecs.to_numpy()
        ok = np.array([v is not None and len(v) == dim for v in vals])
        out = np.full((len(vals), cb.shape[0]), -1, dtype=np.int32)
        if ok.any():
            x = np.vstack(vals[ok]).astype(np.float64).reshape(-1, cb.shape[0], cb.shape[2])
            # ||x_j - c||² = ||c||² - 2 x_j·c (+ const per row-subspace)
            d = cn2[None, :, :] - 2.0 * np.einsum("nms,mks->nmk", x, cb)
            out[ok] = d.argmin(axis=2).astype(np.int32)
        return pd.Series([row.tolist() for row in out])

    return df.withColumn(out_col, _codes(F.col(vec_col)))


def adc_lut(codebooks: list[list[list[float]]], query_vec: list[float]) -> list[list[float]]:
    """Per-query ADC lookup table: lut[j][c] = ||q_j − codebook[j][c]||²."""
    if not codebooks or any(not cb for cb in codebooks):
        raise ValueError("codebooks must be a non-empty list of non-empty subspace codebooks")
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if sub == 0 or any(len(cent) != sub for cb in codebooks for cent in cb):
        raise ValueError(f"ragged codebooks: every centroid must have length {sub or '>=1'}")
    if len(query_vec) != m * sub:
        raise ValueError(f"query dim {len(query_vec)} != {m * sub}")
    lut: list[list[float]] = []
    for j, cb in enumerate(codebooks):
        qj = query_vec[j * sub : (j + 1) * sub]
        lut.append([float(sum((q - c) ** 2 for q, c in zip(qj, cent))) for cent in cb])
    return lut


def _adc_dist(code_col: Column, lut: list[list[float]]) -> Column:
    """Approximate squared distance: Σ_j lut[j][code_j] — m element_at
    lookups into one m×k literal, zero vector math per row.  The -1 sentinel
    (NULL/wrong-length vector at encode time) scores +inf, so invalid rows
    sort last and never displace a real candidate from the top-k."""
    lut_lit = F.lit(lut)  # array<array<double>>, m*k elements (small by design)
    pairs = F.zip_with(
        lut_lit,
        code_col,
        lambda row, c: F.when(c >= 0, F.element_at(row, c + F.lit(1))).otherwise(
            F.lit(float("inf"))
        ),
    )
    return F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    code_col: str = "pq_code",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance over PQ codes — the scan touches ONLY the
    (id, m-byte code) columns; `TakeOrderedAndProject` merges per-partition
    top-k, no shuffle of payloads.  Compose with IVF by filtering the
    encoded table to the probed clusters first."""
    dist = _adc_dist(F.col(code_col), adc_lut(codebooks, query_vec))
    return (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )
