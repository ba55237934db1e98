"""Distribution-drift rules: per-partition histogram aggregation compared to
a persisted baseline snapshot via PSI and a KS statistic (north_star:
"distribution-drift via per-partition histogram + KS/PSI comparison against a
baseline snapshot").

Shape: ONE groupBy over (partition_key, bucket) — the histogram is built with
``width_bucket``-style column math, so the shuffle carries only
(partitions × bins) counts no matter how many rows.  The baseline snapshot is
a tiny DataFrame persisted to parquet; comparison joins histogram-to-baseline
on bucket and reduces per partition — all driver-light.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["histogram", "snapshot_baseline", "psi", "ks", "drift_check"]

_EPS = 1e-6  # PSI smoothing for empty buckets


def _bucket(col, lo: float, hi: float, bins: int):
    width = (hi - lo) / bins
    b = F.floor((col.cast("double") - F.lit(lo)) / F.lit(width)).cast("int")
    return F.when(col.isNull(), F.lit(-1)).otherwise(
        F.when(b < 0, F.lit(0)).when(b >= bins, F.lit(bins - 1)).otherwise(b)
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 32,
    by: str | None = None,
) -> DataFrame:
    """(by?, bucket, cnt, frac) histogram; bucket -1 collects NULLs."""
    keys = ([F.col(by)] if by else []) + [
        _bucket(F.col(value_col), lo, hi, bins).alias("bucket")
    ]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.groupBy(*([by] if by else [])).agg(F.sum("cnt").alias("__total"))
    on = [by] if by else None
    joined = counts.join(total, on=on) if by else counts.crossJoin(total)
    return joined.select(
        *([by] if by else []),
        "bucket",
        "cnt",
        (F.col("cnt").cast("double") / F.col("__total")).alias("frac"),
    )


def snapshot_baseline(df: DataFrame, value_col: str, lo: float, hi: float, bins: int, path: str) -> None:
    """Persist the reference distribution (tiny: ``bins`` rows)."""
    histogram(df, value_col, lo, hi, bins).write.mode("overwrite").parquet(path)


def _aligned(current: DataFrame, baseline: DataFrame, by: str | None) -> DataFrame:
    """(by?, bucket, cur_frac, base_frac) — every key sees EVERY baseline
    bucket.  With a ``by`` key the (keyless, bins-row) baseline is first
    expanded across cur's distinct keys; a plain full-outer on bucket alone
    would route baseline buckets absent from one key's histogram into a
    spurious NULL-key group, leaving that key's base CDF summing < 1 (wrong
    KS, and wrong PSI in the fused path) whenever a key lacks a bucket —
    common for sparse categories.  The expansion is keys × bins rows (tiny;
    baseline side broadcast)."""
    cur = current.select(*([by] if by else []), "bucket", F.col("frac").alias("cur_frac"))
    if by is None:
        base = baseline.select(F.col("bucket"), F.col("frac").alias("base_frac"))
        return cur.join(base, "bucket", "full_outer").fillna(
            {"cur_frac": 0.0, "base_frac": 0.0}
        )
    if by in baseline.columns:
        # KEYED baseline (one snapshot per key, histogram(..., by=by)): the
        # full outer on [by, bucket] already gives every key the union of its
        # own buckets — no expansion needed
        expanded = baseline.select(F.col(by), F.col("bucket"), F.col("frac").alias("base_frac"))
    else:
        # keyless baseline: expand across cur's distinct keys
        base = baseline.select(F.col("bucket"), F.col("frac").alias("base_frac"))
        expanded = cur.select(by).distinct().crossJoin(F.broadcast(base))
    c, e = cur.alias("c"), expanded.alias("e")
    j = c.join(
        e,
        F.col(f"c.{by}").eqNullSafe(F.col(f"e.{by}"))
        & (F.col("c.bucket") == F.col("e.bucket")),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col(f"c.{by}"), F.col(f"e.{by}")).alias(by),
        F.coalesce(F.col("c.bucket"), F.col("e.bucket")).alias("bucket"),
        F.coalesce(F.col("c.cur_frac"), F.lit(0.0)).alias("cur_frac"),
        F.coalesce(F.col("e.base_frac"), F.lit(0.0)).alias("base_frac"),
    )


def psi(current: DataFrame, baseline: DataFrame, by: str | None = None) -> DataFrame:
    """Population Stability Index per partition key (or one global row).

    PSI = Σ_b (cur_b - base_b) * ln(cur_b / base_b); >0.2 is conventional
    drift; smoothing avoids log(0) on empty buckets.
    """
    j = _aligned(current, baseline, by)
    c = F.col("cur_frac") + _EPS
    b = F.col("base_frac") + _EPS
    term = (c - b) * F.log(c / b)
    if by:
        return j.groupBy(by).agg(F.sum(term).alias("psi"))
    return j.agg(F.sum(term).alias("psi"))


def ks(current: DataFrame, baseline: DataFrame, by: str | None = None) -> DataFrame:
    """Histogram-approximated Kolmogorov–Smirnov statistic per partition key:
    max over buckets of |CDF_cur − CDF_base| (running sums ordered by bucket;
    the NULL bucket -1 sorts first so missingness shifts count as drift).
    The window spans only ``bins`` rows per key — driver-light at any scale.
    """
    from pyspark.sql.window import Window

    j = _aligned(current, baseline, by)
    w = (Window.partitionBy(by) if by else Window.partitionBy()).orderBy("bucket")
    j = j.withColumn("__gap", F.abs(F.sum("cur_frac").over(w) - F.sum("base_frac").over(w)))
    if by:
        return j.groupBy(by).agg(F.max("__gap").alias("ks"))
    return j.agg(F.max("__gap").alias("ks"))


def drift_check(
    df: DataFrame,
    value_col: str,
    baseline: DataFrame,
    lo: float,
    hi: float,
    bins: int = 32,
    by: str | None = None,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-partition drift summary row: psi + ks + drifted flag — shaped like
    a check_data result so it can union into the same reporting sink.  ONE
    input scan: both statistics reduce the same histogram-to-baseline join
    (psi is a per-bucket sum, ks a max over the running CDF gap)."""
    from pyspark.sql.window import Window

    cur = histogram(df, value_col, lo, hi, bins, by=by)
    j = _aligned(cur, baseline, by)
    c = F.col("cur_frac") + _EPS
    b = F.col("base_frac") + _EPS
    w = (Window.partitionBy(by) if by else Window.partitionBy()).orderBy("bucket")
    j = j.withColumn("__term", (c - b) * F.log(c / b)).withColumn(
        "__gap", F.abs(F.sum("cur_frac").over(w) - F.sum("base_frac").over(w))
    )
    grouped = j.groupBy(by) if by else j.groupBy()
    scores = grouped.agg(F.sum("__term").alias("psi"), F.max("__gap").alias("ks"))
    return scores.select(
        *([by] if by else []),
        F.round("psi", 6).alias("psi"),
        F.round("ks", 6).alias("ks"),
        (F.col("psi") > threshold).alias("drifted"),
    )
