"""Freshness / completeness checks over event-time tables — data-quality
classics a validation engine needs at ingest scale (no reference analog;
graft extension alongside drift).

- ``freshness``: per-group max event time + lag vs a reference instant —
  one groupBy, partial-agg friendly.
- ``interval_gaps``: expected-interval completeness via a generated calendar
  anti-joined against observed buckets — the missing-bucket list, computed
  without ever sorting the event table (bucket truncation + distinct only).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["freshness", "interval_gaps"]


def freshness(
    df: DataFrame,
    ts_col: str,
    as_of: dt.datetime,
    max_lag_minutes: float = 60.0,
    by: str | None = None,
) -> DataFrame:
    """(by?, last_ts, lag_minutes, is_fresh) — one row per group.

    ``as_of`` is explicit (never now()): deterministic, testable, resume-safe.
    """
    keys = [by] if by else []
    out = df.groupBy(*keys).agg(F.max(ts_col).alias("last_ts"))
    # route NTZ through TIMESTAMP: TIMESTAMP_NTZ -> DOUBLE is not castable
    last_secs = F.col("last_ts").cast("timestamp").cast("double")
    lag_min = (F.lit(as_of).cast("timestamp").cast("double") - last_secs) / 60.0
    return out.select(
        *keys,
        "last_ts",
        F.round(lag_min, 3).alias("lag_minutes"),
        (lag_min <= max_lag_minutes).alias("is_fresh"),
    )


def interval_gaps(
    df: DataFrame,
    ts_col: str,
    start: dt.datetime,
    end: dt.datetime,
    interval_minutes: int = 60,
) -> DataFrame:
    """Expected time buckets in [start, end) with zero rows.

    The calendar side is generated with ``sequence`` (tiny — one row per
    bucket), the observed side is ``distinct`` truncated buckets; gaps =
    calendar LEFT ANTI observed.  The big table is touched once, aggregated
    to buckets map-side.
    """
    spark = df.sparkSession
    step = F.expr(f"INTERVAL {interval_minutes} MINUTES")
    calendar = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                step,
            )
        ).alias("bucket")
    ).filter(F.col("bucket") < F.lit(end).cast("timestamp"))
    secs = interval_minutes * 60
    # cast through timestamp first: TIMESTAMP_NTZ cannot cast to double
    # directly under Spark 4 ANSI (parquet event times are commonly NTZ)
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    observed = df.select(
        F.timestamp_seconds((F.floor(epoch / secs) * secs).cast("long")).alias("bucket")
    ).distinct()
    return calendar.join(observed, "bucket", "left_anti").orderBy("bucket")
