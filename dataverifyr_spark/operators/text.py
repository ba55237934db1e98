"""Text analysis for training-data pipelines: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

Everything here is pure ``pyspark.sql.functions`` — whole-stage codegen,
zero Python in the row path — so it runs at parquet-scan speed and all of it
is expressible as ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["token_stats", "quality_metrics", "language_scores", "fingerprint"]

# tiny per-language stopword lists for the n-gram/stopword language heuristic;
# deliberately short + deterministic (extend freely — it's a heuristic)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
}


def _tokens(text: Column) -> Column:
    # whitespace tokenizer; BPE-ish sub-token counting available via
    # token_stats(bpe=True)
    return F.split(text, " ")


def token_stats(df: DataFrame, text_col: str = "text", bpe: bool = False) -> DataFrame:
    """Per-document token counts: whitespace tokens plus a BPE-ish estimate.

    The BPE proxy counts word-piece chunks — runs of up to 4 letters, up to 4
    digits, or single punctuation — which tracks real BPE token counts on
    English text (BPE averages ~4 chars/token) while staying a pure
    ``regexp_count`` (JVM, one pass, no tokenizer model)."""
    text = F.col(text_col)
    toks = _tokens(text)
    out = df.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_chars", F.length(text)
    )
    if bpe:
        out = out.withColumn(
            "n_bpe_pieces",
            F.regexp_count(text, F.lit(r"[A-Za-z]{1,4}|[0-9]{1,4}|[^A-Za-z0-9\s]")).cast("int"),
        )
    return out


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / alpha-ratio / mean-token-length / repetition quality signals.

    All ratios are deterministic doubles; callers should round before
    cross-engine comparison.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_chars", n_chars)
        .withColumn(
            "alpha_ratio",
            F.when(n_chars > 0, alpha_chars.cast("double") / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_token_len",
            F.when(
                F.size(toks) > 0,
                (n_chars - F.size(toks) + 1).cast("double") / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "distinct_token_ratio",
            F.when(
                F.size(toks) > 0,
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
    )


def language_scores(
    df: DataFrame, text_col: str = "text", languages: list[str] | None = None
) -> DataFrame:
    """Stopword-hit-count language heuristic: per language, the number of
    tokens that are that language's stopwords; ``lang_guess`` is the argmax
    (ties broken by language-code order)."""
    langs = languages or sorted(STOPWORDS)
    toks = _tokens(F.col(text_col))
    out = df
    for lang in langs:
        words = list(STOPWORDS[lang])
        out = out.withColumn(
            f"score_{lang}", F.size(F.filter(toks, lambda t: t.isin(words)))
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return out.withColumn("lang_guess", F.when(best > 0, guess))


def fingerprint(df: DataFrame, text_col: str = "text", normalize: bool = True) -> DataFrame:
    """64-bit content fingerprint of (optionally normalized) text — the
    building block for exact dedup at scale: group/join on the fingerprint,
    verify full equality only inside colliding groups."""
    text = F.col(text_col)
    if normalize:
        text = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(text))
