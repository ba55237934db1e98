"""Deterministic test fixtures (FIXTURES.md).

All in-process, fixed values/seeds — no external data.  ``cars`` hardcodes the
classic public mtcars matrix (the reference's contract table,
tests/testthat/test-check_data.R:4-14); ``orders`` mirrors the packaged
``sample_data`` (R/sample_data.R:19-31); ``flights``/``carriers`` mirror the
reference-rule pair (tests/testthat/test-features-v1.R:132-134).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# mpg cyl disp hp drat wt qsec vs am gear carb — classic mtcars (public data)
_MTCARS = [
    (21.0, 6, 160.0, 110, 3.90, 2.620, 16.46, 0, 1, 4, 4),
    (21.0, 6, 160.0, 110, 3.90, 2.875, 17.02, 0, 1, 4, 4),
    (22.8, 4, 108.0, 93, 3.85, 2.320, 18.61, 1, 1, 4, 1),
    (21.4, 6, 258.0, 110, 3.08, 3.215, 19.44, 1, 0, 3, 1),
    (18.7, 8, 360.0, 175, 3.15, 3.440, 17.02, 0, 0, 3, 2),
    (18.1, 6, 225.0, 105, 2.76, 3.460, 20.22, 1, 0, 3, 1),
    (14.3, 8, 360.0, 245, 3.21, 3.570, 15.84, 0, 0, 3, 4),
    (24.4, 4, 146.7, 62, 3.69, 3.190, 20.00, 1, 0, 4, 2),
    (22.8, 4, 140.8, 95, 3.92, 3.150, 22.90, 1, 0, 4, 2),
    (19.2, 6, 167.6, 123, 3.92, 3.440, 18.30, 1, 0, 4, 4),
    (17.8, 6, 167.6, 123, 3.92, 3.440, 18.90, 1, 0, 4, 4),
    (16.4, 8, 275.8, 180, 3.07, 4.070, 17.40, 0, 0, 3, 3),
    (17.3, 8, 275.8, 180, 3.07, 3.730, 17.60, 0, 0, 3, 3),
    (15.2, 8, 275.8, 180, 3.07, 3.780, 18.00, 0, 0, 3, 3),
    (10.4, 8, 472.0, 205, 2.93, 5.250, 17.98, 0, 0, 3, 4),
    (10.4, 8, 460.0, 215, 3.00, 5.424, 17.82, 0, 0, 3, 4),
    (14.7, 8, 440.0, 230, 3.23, 5.345, 17.42, 0, 0, 3, 4),
    (32.4, 4, 78.7, 66, 4.08, 2.200, 19.47, 1, 1, 4, 1),
    (30.4, 4, 75.7, 52, 4.93, 1.615, 18.52, 1, 1, 4, 2),
    (33.9, 4, 71.1, 65, 4.22, 1.835, 19.90, 1, 1, 4, 1),
    (21.5, 4, 120.1, 97, 3.70, 2.465, 20.01, 1, 0, 3, 1),
    (15.5, 8, 318.0, 150, 2.76, 3.520, 16.87, 0, 0, 3, 2),
    (15.2, 8, 304.0, 150, 3.15, 3.435, 17.30, 0, 0, 3, 2),
    (13.3, 8, 350.0, 245, 3.73, 3.840, 15.41, 0, 0, 3, 4),
    (19.2, 8, 400.0, 175, 3.08, 3.845, 17.05, 0, 0, 3, 2),
    (27.3, 4, 79.0, 66, 4.08, 1.935, 18.90, 1, 1, 4, 1),
    (26.0, 4, 120.3, 91, 4.43, 2.140, 16.70, 0, 1, 5, 2),
    (30.4, 4, 95.1, 113, 3.77, 1.513, 16.90, 1, 1, 5, 2),
    (15.8, 8, 351.0, 264, 4.22, 3.170, 14.50, 0, 1, 5, 4),
    (19.7, 6, 145.0, 175, 3.62, 2.770, 15.50, 0, 1, 5, 6),
    (15.0, 8, 301.0, 335, 3.54, 3.570, 14.70, 0, 1, 5, 8),
    (21.4, 4, 121.0, 109, 4.11, 2.780, 18.60, 1, 1, 4, 2),
]

_CARS_SCHEMA = T.StructType(
    [
        T.StructField("mpg", T.DoubleType(), True),
        T.StructField("cyl", T.DoubleType(), True),
        T.StructField("disp", T.DoubleType(), True),
        T.StructField("hp", T.StringType(), True),  # mutated to character
        T.StructField("drat", T.DoubleType(), True),
        T.StructField("wt", T.DoubleType(), True),
        T.StructField("qsec", T.DoubleType(), True),
        T.StructField("vs", T.DoubleType(), True),
        T.StructField("am", T.DoubleType(), True),
        T.StructField("gear", T.DoubleType(), True),
        T.StructField("carb", T.DoubleType(), True),
    ]
)


def cars(spark: SparkSession, variant: str = "contract") -> DataFrame:
    """Mutated-mtcars contract table.

    ``contract`` (test-check_data.R:4-6): hp as string with hp[4]="asd",
    disp[1]=disp[5]=NULL.  ``filters`` (test-filters.R:3-5): mpg[4]=NULL,
    cyl[5]=NULL, hp numeric-as-string untouched.
    """
    rows = []
    for i, r in enumerate(_MTCARS, start=1):  # 1-based like R
        mpg, cyl, disp, hp, drat, wt, qsec, vs, am, gear, carb = r
        mpg_v: float | None = mpg
        cyl_v: float | None = float(cyl)
        disp_v: float | None = disp
        hp_v = str(hp)
        if variant == "contract":
            if i == 4:
                hp_v = "asd"
            if i in (1, 5):
                disp_v = None
        elif variant == "filters":
            if i == 4:
                mpg_v = None
            if i == 5:
                cyl_v = None
        else:
            raise ValueError(f"unknown cars variant {variant!r}")
        rows.append(
            (
                mpg_v,
                cyl_v,
                disp_v,
                hp_v,
                drat,
                wt,
                qsec,
                float(vs),
                float(am),
                float(gear),
                float(carb),
            )
        )
    return spark.createDataFrame(rows, _CARS_SCHEMA)


_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), False),
        T.StructField("customer_tier", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("paid", T.BooleanType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("order_time", T.TimestampType(), True),
    ]
)


def orders(spark: SparkSession) -> DataFrame:
    """8-row demo table mirroring sample_data (R/sample_data.R:19-31)."""

    def ts(day: int, h: int, m: int) -> dt.datetime:
        return dt.datetime(2025, 1, day, h, m, 0)

    rows = [
        (1, "gold", 120.50, True, "card", ts(1, 9, 0)),
        (2, "silver", 80.00, True, "cash", ts(2, 10, 15)),
        (3, "bronze", -5.00, False, "none", ts(3, 11, 30)),
        (4, "gold", 320.25, True, "card", ts(4, 12, 45)),
        (5, None, 45.10, False, "none", None),
        (6, "silver", None, None, "card", ts(6, 14, 20)),
        (7, "bronze", 0.00, True, None, ts(7, 15, 35)),
        (8, "unknown", 99.99, True, "none", ts(8, 11, 5)),
    ]
    return spark.createDataFrame(rows, _ORDERS_SCHEMA)


def flights(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("AA",), ("BB",), (None,)], T.StructType([T.StructField("carrier", T.StringType(), True)])
    )


def carriers(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("AA",)], T.StructType([T.StructField("carrier_id", T.StringType(), True)])
    )
