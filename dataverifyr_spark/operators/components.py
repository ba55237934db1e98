"""Distributed connected components over a pair/edge list — the step that
turns near-dup candidate PAIRS (MinHash-LSH or embedding-LSH) into dedup
GROUPS ("keep one representative per component").

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public literature).  Each
iteration is two joins + aggregations on the edge list; converges in
O(log n) rounds, never materializes a component in one task, and every step
is a plain DataFrame op — so it runs at 10^12-edge scale where a driver-side
union-find cannot.

  large-star: for each node u, connect every neighbor v > u to min(N(u) ∪ u)
  small-star: for each node u, connect every neighbor v <= u to the minimum

Here we use the simpler, equivalent-fixpoint formulation: iterate
``label(u) = min(label(u), min(label(neighbors)))`` via a groupBy-min message
pass, checking convergence with an aggregate count of changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "near_dup_groups"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in the edge list; the
    component id is the minimum node id of the component.

    Label-propagation-to-minimum: each round, every node takes the min label
    among itself and its neighbors.  Rounds = graph diameter (near-dup
    clusters are dense, so typically 2-4).  Each round: one union + one
    groupBy — shuffle keyed on node id, partial-agg friendly.
    """
    # undirected edge list, both directions
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    both = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    both = both.cache()

    labels = both.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        # message: each node's label flows to its neighbors
        msgs = both.join(labels, "u").select(F.col("v").alias("u"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
        )
        changed = (
            labels.alias("old")
            .join(new_labels.alias("new"), "u")
            .filter(F.col("old.label") != F.col("new.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.cache()
        if changed == 0:
            break
    both.unpersist()
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def near_dup_groups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """End-to-end near-dup detection: MinHash → LSH candidate pairs →
    exact-Jaccard verify → connected components → (id, component, is_kept).

    ``is_kept`` marks the minimum id per component — filter on it to produce
    the deduplicated corpus; everything stays distributed.
    """
    from .dedup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard

    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k)
    pairs = lsh_candidate_pairs(sigs, id_col, num_bands, max_bucket_size)
    texts = docs.select(F.col(id_col), F.col(text_col))
    enriched = (
        pairs.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "text_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "text_b"), "id_b")
    )
    verified = ngram_jaccard(enriched, "text_a", "text_b", shingle_k).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    comps = connected_components(verified.select("id_a", "id_b"))
    out = docs.select(F.col(id_col)).join(
        comps, docs[id_col] == comps["node"], "left"
    ).select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("component"),
    )
    keep = out.groupBy("component").agg(F.min(id_col).alias("__keep"))
    return out.join(keep, "component").select(
        id_col, "component", (F.col(id_col) == F.col("__keep")).alias("is_kept")
    )
