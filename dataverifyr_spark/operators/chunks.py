"""Document chunking — token-window passages as rows, the unit most
training-data dedup actually operates on (boilerplate repeats at PASSAGE
level across distinct documents; whole-doc fingerprints miss it).

``chunk_documents`` is PURE Catalyst: tokenize (split), derive the chunk
count, ``sequence → transform(slice → array_join) → posexplode`` — one
narrow projection per row, no shuffle, no Python.  A 10^12-doc corpus
chunks at scan speed and feeds the existing dedup stack
(``text.fingerprint`` / ``dedup.exact_dup_groups`` / MinHash-LSH) applied to
``chunk_text`` instead of whole documents.

Windows: ``chunk_tokens`` per chunk, ``overlap`` tokens shared with the
previous chunk (stride = chunk_tokens − overlap); the final partial window
is kept; a document with no tokens still emits ONE empty-chunk row (the
repo-wide never-silently-missing contract).

Reference analog: none (tabular-only); graft extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """One row per token window: ``(id, chunk_idx, chunk_text,
    n_chunk_tokens)``."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    # NULL text must behave like an empty document (ONE empty-chunk row):
    # without the coalesce the NULL propagates through size/sequence and
    # explode silently DROPS the row
    tok_expr = F.coalesce(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")),
        F.array().cast("array<string>"),
    )
    # stage the token array as its own projection: Catalyst does not CSE
    # across transform lambdas, so an inline `toks` subtree re-runs
    # split+filter for EVERY chunk — O(tokens²/chunk) on long documents
    # (same lesson as text.winnow_fingerprints, measured 75x there)
    tok_c = "__toks"
    while tok_c == id_col or tok_c in df.columns:
        tok_c = "_" + tok_c
    staged = df.select(F.col(id_col), tok_expr.alias(tok_c))
    toks = F.col(tok_c)
    n = F.size(toks)
    # chunks start at 0, stride, 2*stride, ...; a start at or past
    # n - overlap would be a pure suffix of the previous window (no new
    # tokens), so count = 1 + floor((n - overlap - 1) / stride), min 1
    n_eff = F.when(n <= 0, F.lit(1)).otherwise(
        F.greatest(
            F.lit(1),
            (F.lit(1) + F.floor((n - F.lit(overlap) - F.lit(1)) / F.lit(stride))).cast(
                "int"
            ),
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_eff - F.lit(1)),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(toks, i * F.lit(stride) + F.lit(1), chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.greatest(n - i * F.lit(stride), F.lit(0))
            ).cast("int").alias("n_chunk_tokens"),
        ),
    )
    return staged.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(id_col, "__c.chunk_idx", "__c.chunk_text", "__c.n_chunk_tokens")
