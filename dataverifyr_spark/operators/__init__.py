"""Scale-path operators beyond the reference's surface: uniqueness sketches,
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding), text
analysis, similarity search, drift detection.  All built on DataFrame
primitives; Python appears only in Arrow-batched pandas UDFs."""

from .dedup import exact_dup_groups, drop_exact_dupes, minhash_signatures, lsh_candidate_pairs
from .similarity import brute_force_topk, hyperplane_lsh_buckets
from .text import language_scores, quality_metrics, token_stats
from .uniqueness import distinct_count_salted, uniqueness_check

__all__ = [
    "exact_dup_groups",
    "drop_exact_dupes",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "brute_force_topk",
    "hyperplane_lsh_buckets",
    "language_scores",
    "quality_metrics",
    "token_stats",
    "distinct_count_salted",
    "uniqueness_check",
]
