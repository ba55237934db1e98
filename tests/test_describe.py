"""describe profiling — semantics per R/describe.R (see module docstring for
pinned divergences: min/mean/median/max/sd are doubles; timestamps profile as
epoch seconds)."""

import datetime as dt

import pytest

from dataverifyr_spark import describe


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1.0, "a", 10, dt.datetime(2025, 1, 1)),
        (2.0, "bb", 10, dt.datetime(2025, 1, 2)),
        (3.0, "ccc", 20, None),
        (None, None, 20, dt.datetime(2025, 1, 4)),
        (5.0, "a", 20, dt.datetime(2025, 1, 5)),
    ]
    return spark.createDataFrame(rows, "x double, s string, g int, t timestamp").cache()


def _by_var(res):
    return {r["var"]: r.asDict() for r in res.collect()}


class TestDescribe:
    def test_schema(self, spark, df):
        res = describe(df)
        assert res.columns == [
            "var",
            "type",
            "n",
            "n_distinct",
            "n_na",
            "most_frequent",
            "min",
            "mean",
            "median",
            "max",
            "sd",
        ]

    def test_numeric_stats(self, spark, df):
        r = _by_var(describe(df))["x"]
        assert r["type"] == "numeric"
        assert r["n"] == 5
        assert r["n_na"] == 1
        # n_distinct counts NA as a distinct value (R/describe.R:112)
        assert r["n_distinct"] == 5
        assert r["min"] == 1.0 and r["max"] == 5.0
        assert r["mean"] == pytest.approx(2.75)
        assert r["median"] == pytest.approx(2.5)
        assert r["sd"] == pytest.approx(1.7078251, rel=1e-6)

    def test_string_stats_over_lengths(self, spark, df):
        # non-numeric: min/mean/max over nchar (R/describe.R:106)
        r = _by_var(describe(df))["s"]
        assert r["type"] == "character"
        assert r["min"] == 1.0 and r["max"] == 3.0
        assert r["mean"] == pytest.approx(7 / 4)

    def test_most_frequent_formatting(self, spark, df):
        res = _by_var(describe(df, top_n=2))
        # g: 20 appears 3x, 10 appears 2x
        assert res["g"]["most_frequent"] == "20 (3), 10 (2)"
        # s: only 'a' repeats; skip_ones drops singletons
        assert res["s"]["most_frequent"] == "a (2)"

    def test_skip_ones_false(self, spark, df):
        res = _by_var(describe(df, skip_ones=False, top_n=2))
        assert res["g"]["most_frequent"] == "20 (3), 10 (2)"

    def test_single_distinct_suppressed(self, spark):
        df1 = _one_col(spark)
        r = _by_var(describe(df1))["v"]
        assert r["most_frequent"] == ""  # suppressed => "" (R/describe.R:76)

    def test_top_n_zero(self, spark, df):
        res = _by_var(describe(df, top_n=0))
        assert all(r["most_frequent"] == "" for r in res.values())

    def test_fast_mode(self, spark, df):
        # fast: n_distinct/median/most_frequent are NULL (R/describe.R:604-607)
        res = _by_var(describe(df, fast=True))
        for r in res.values():
            assert r["n_distinct"] is None
            assert r["median"] is None
            assert r["most_frequent"] is None
        assert res["x"]["mean"] == pytest.approx(2.75)

    def test_approx_mode_fills_everything(self, spark, df):
        res = _by_var(describe(df, approx=True))
        assert res["x"]["n_distinct"] is not None
        assert res["x"]["median"] is not None

    def test_timestamp_as_numeric(self, spark, df):
        r = _by_var(describe(df))["t"]
        assert r["type"] == "datetime"
        assert r["n_na"] == 1
        assert r["min"] is not None and r["max"] > r["min"]


def _one_col(spark):
    return spark.createDataFrame([(1,), (1,), (1,)], "v int")


class TestFusedTopK:
    def test_fused_matches_per_column(self, spark, df):
        a = {r["var"]: r["most_frequent"] for r in describe(df, top_n=2).collect()}
        b = {r["var"]: r["most_frequent"] for r in describe(df, top_n=2, fused_topk=True).collect()}
        assert a == b

    def test_approx_defaults_to_fused(self, spark, df, monkeypatch):
        """describe(approx=True) must NOT fall back to the K per-column
        top-k jobs — the at-scale path is sketch agg + ONE fused pass."""
        import importlib

        d = importlib.import_module("dataverifyr_spark.describe")

        def boom(*a, **k):
            raise AssertionError("per-column top-k ran under approx=True")

        monkeypatch.setattr(d, "_most_frequent", boom)
        res = {r["var"]: r["most_frequent"] for r in d.describe(df, approx=True).collect()}
        assert res["s"]  # populated through the fused pass
        # explicit override still honored
        with pytest.raises(Exception, match="per-column top-k"):
            d.describe(df, approx=True, fused_topk=False).collect()


class TestReferenceDescribeGoldens:
    """Pinned from the reference's own assertions (test-describe.R:130-143,
    :221-243): NA appears as a most_frequent VALUE with its count; one-distinct
    and all-NA columns suppress to ""; digits round the displayed values."""

    def test_na_as_value_and_suppression(self, spark):
        df = spark.createDataFrame(
            [
                (3.1415926535, None, 1.23456789),
                (3.1415926535, None, 1.23456789),
                (3.1415926535, None, 9.87654321),
                (3.1415926535, None, None),
                (3.1415926535, None, 9.87654321),
            ],
            "one_value double, all_na double, mixed double",
        )
        d = {r["var"]: r["most_frequent"] for r in describe(df, skip_ones=False).collect()}
        assert d["one_value"] == ""
        assert d["all_na"] == ""
        assert d["mixed"] == "1.2346 (2), 9.8765 (2), NA (1)"
        d2 = {r["var"]: r["most_frequent"] for r in describe(df).collect()}
        assert d2["mixed"] == "1.2346 (2), 9.8765 (2)"  # skip_ones drops NA (1)

    def test_digits_two(self, spark):
        df = spark.createDataFrame(
            [(1.234567, "a"), (1.234567, "a"), (9.876543, "b"), (9.876543, "c"), (None, None)],
            "num double, chr string",
        )
        d = {
            r["var"]: r["most_frequent"]
            for r in describe(df, skip_ones=False, digits=2).collect()
        }
        assert sorted(d["num"].split(", ")) == ["1.23 (2)", "9.88 (2)", "NA (1)"]
        assert d["chr"].startswith("a (2)")
        d2 = {
            r["var"]: r["most_frequent"]
            for r in describe(df, skip_ones=True, digits=2).collect()
        }
        assert sorted(d2["num"].split(", ")) == ["1.23 (2)", "9.88 (2)"]
        assert d2["chr"] == "a (2)"


class TestDescribeBy:
    def test_matches_per_group_describe(self, spark, df):
        """describe_by(g) row-for-row equals describe() run on each g-slice
        (minus most_frequent) — the same contract check_data_by has vs
        check_data."""
        from dataverifyr_spark import describe_by

        got = {
            (r["g"], r["var"]): r.asDict()
            for r in describe_by(df, by="g").collect()
        }
        stat_cols = ["type", "n", "n_distinct", "n_na", "min", "mean", "median", "max", "sd"]
        for g in (10, 20):
            ref = _by_var(describe(df.filter(f"g = {g}").drop("g"), top_n=0))
            for var, exp in ref.items():
                row = got[(g, var)]
                for c in stat_cols:
                    a, b = row[c], exp[c]
                    if isinstance(a, float) and isinstance(b, float):
                        assert a == pytest.approx(b), (g, var, c)
                    else:
                        assert a == b, (g, var, c)
        assert len(got) == 2 * 3  # 2 groups x 3 non-key columns

    def test_single_job_no_driver_loop(self, spark, df):
        """The plan is ONE grouped aggregate + explode; adding groups adds no
        jobs (the per-group describe() loop would run K jobs)."""
        import contextlib
        import io

        from dataverifyr_spark import describe_by

        plan_df = describe_by(df, by="g")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain(True)
        phys = buf.getvalue().split("== Physical Plan ==")[-1]
        assert phys.count("HashAggregate") <= 4  # partial+final (+percentile pair)

    def test_approx_plans_no_expand(self, spark, df):
        """describe_by(approx=True) is the at-scale per-partition profile:
        HLL + percentile_approx must fuse into one grouped aggregate with NO
        Expand node (exact mode replicates rows once per distinct agg)."""
        import contextlib
        import io

        from dataverifyr_spark import describe_by

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            describe_by(df, by="g", approx=True).explain(True)
        phys = buf.getvalue().split("== Physical Plan ==")[-1]
        assert "Expand" not in phys, phys

    def test_most_frequent_per_slice_parity(self, spark):
        """r5 (VERDICT ask #1): describe_by(top_n>0) adds a most_frequent
        column equal to describe()'s per slice — keyed top-k assembled
        entirely in Catalyst (no collect, no per-group jobs)."""
        from dataverifyr_spark import describe_by

        rows = [
            ("g1", 1, "a", True), ("g1", 1, "a", True), ("g1", 2, "b", False),
            ("g1", 3, "a", None),
            ("g2", 7, "z", True), ("g2", 7, "z", True), ("g2", 7, "y", False),
            ("g2", 8, None, False),
            ("g3", 5, "only", True),  # 1-distinct slice -> suppressed ""
        ]
        d = spark.createDataFrame(rows, "g string, num int, chr string, flag boolean")
        out = describe_by(d, by="g", top_n=3)
        assert out.columns[:6] == ["g", "var", "type", "n", "n_distinct", "n_na"]
        assert out.columns[6] == "most_frequent"
        got = {(r["g"], r["var"]): r["most_frequent"] for r in out.collect()}
        for g in ("g1", "g2", "g3"):
            ref = {
                r["var"]: r["most_frequent"]
                for r in describe(d.filter(f"g='{g}'").drop("g"), top_n=3).collect()
            }
            for var, exp in ref.items():
                assert got[(g, var)] == exp, (g, var, got[(g, var)], exp)
        # default keeps the original schema (no most_frequent column)
        assert "most_frequent" not in describe_by(d, by="g").columns

    def test_most_frequent_null_group_key(self, spark):
        """NULL group keys keep their top-k (null-safe join)."""
        from dataverifyr_spark import describe_by

        d = spark.createDataFrame(
            [(None, "a"), (None, "a"), (None, "b"), ("g", "c"), ("g", "c")],
            "k string, v string",
        )
        got = {r["k"]: r["most_frequent"] for r in describe_by(d, by="k", top_n=2).collect()}
        assert got[None] == "a (2)"
        assert got["g"] == ""  # 1-distinct slice suppressed

    def test_fused_boolean_column_no_crash(self, spark):
        """r5 bugfix: fused top-k crashed on booleans (float('true')); both
        strategies must now render R's TRUE/FALSE format."""
        d = spark.createDataFrame([(True,), (True,), (False,), (None,)], "b boolean")
        fused = describe(d, fused_topk=True).collect()[0]["most_frequent"]
        percol = describe(d, fused_topk=False).collect()[0]["most_frequent"]
        assert fused == percol == "TRUE (2)"

    def test_fast_and_missing_by_col(self, spark, df):
        from dataverifyr_spark import describe_by

        res = describe_by(df, by="g", fast=True).collect()
        assert all(r["n_distinct"] is None and r["median"] is None for r in res)
        assert {r["n"] for r in res} == {2, 3}
        with pytest.raises(ValueError, match="not in DataFrame"):
            describe_by(df, by="nope")


class TestApproxPlanShape:
    def test_approx_profile_plans_no_expand(self, spark):
        """approx=True is the at-scale path: HLL distinct + percentile_approx
        fuse into ONE aggregate with no Expand node (exact mode replicates
        every scanned row once per distinct aggregate — documented as the
        small-scale parity path only)."""
        import contextlib
        import io

        from pyspark.sql import functions as F

        from dataverifyr_spark.describe import describe

        df = spark.range(0, 1000).select(
            (F.col("id") % 7).alias("a"),
            (F.col("id") % 13).cast("double").alias("b"),
            (F.col("id") % 3).cast("string").alias("c"),
        )

        def physical(plan_df):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                plan_df.explain(True)
            return buf.getvalue().split("== Physical Plan ==")[-1]

        # rebuild the approx aggregate exactly as describe() runs it
        aggs = [
            F.approx_count_distinct("a"),
            F.approx_count_distinct("b"),
            F.approx_count_distinct("c"),
            F.percentile_approx("a", 0.5, 100),
            F.percentile_approx("b", 0.5, 100),
        ]
        assert "Expand" not in physical(df.agg(*aggs))
        exact = [F.count_distinct("a"), F.count_distinct("b"), F.count_distinct("c")]
        assert "Expand" in physical(df.agg(*exact))  # the cost approx avoids

        # and the public surface agrees end-to-end
        out = describe(df, approx=True)
        assert out.count() == 3


class TestMostFrequentByPlanShape:
    def test_approx_with_topk_still_no_expand(self, spark):
        """describe_by(approx=True, top_n>0) adds the keyed top-k join but
        must stay Expand-free (the at-scale plan: sketch agg + window
        group-limit + broadcast join, no row replication)."""
        import contextlib
        import io

        from dataverifyr_spark import describe_by

        d = spark.createDataFrame(
            [("g", 1, "a"), ("g", 2, "b"), ("h", 3, "c")], "g string, n int, s string"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            describe_by(d, by="g", approx=True, top_n=3).explain(True)
        phys = buf.getvalue().split("== Physical Plan ==")[-1]
        assert "Expand" not in phys, phys
        # the top-n is pre-limited before the shuffle (WindowGroupLimit)
        assert "WindowGroupLimit" in phys


class TestDescribeByFile:
    def test_per_file_profile_matches_per_key(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from dataverifyr_spark import describe_by_file

        root = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(40)], "id int, k int, v double"
        )
        df.repartition(2, "k").write.partitionBy("k").parquet(root)
        back = spark.read.parquet(root)
        got = describe_by_file(back)
        # file col first, then the describe_by schema
        assert got.columns[0] == "file"
        rows = got.withColumn(
            "k", F.regexp_extract("file", r"k=(\d+)", 1).cast("int")
        ).collect()
        mine = {(r["k"], r["var"]): (r["n"], r["n_na"], r["mean"]) for r in rows}
        # 2 files x 3 profiled vars (id, v, and the partition column k read
        # back from the directory name)
        assert len(mine) == 6
        import statistics

        for (k, var), (n, n_na, mean) in mine.items():
            assert n == 20 and n_na == 0
            want = (
                float(k)
                if var == "k"
                else statistics.mean(float(i) for i in range(40) if i % 2 == k)
            )
            assert abs(mean - want) < 1e-9, (k, var)

    def test_non_file_source_raises(self, spark):
        import pytest as _pytest

        from dataverifyr_spark import describe_by_file

        df = spark.createDataFrame([(1,)], "id int")
        with _pytest.raises(ValueError, match="file-backed"):
            describe_by_file(df)
