"""Source resolution and violation/summary sinks."""

from dataverifyr_spark import check_data, filter_fails, rule, ruleset
from dataverifyr_spark.sources import load_table, write_summary, write_violations


class TestSources:
    def test_load_table_parquet_fallback(self, spark, tmp_path):
        p = str(tmp_path / "t.parquet")
        spark.range(0, 10).write.parquet(p)
        assert load_table(spark, p).count() == 10

    def test_load_table_catalog_branch(self, spark, tmp_path):
        # the catalog-name branch (spark.read.table) is the same code path an
        # Iceberg catalog serves; exercised here with the built-in
        # spark_catalog since the sandbox ships no iceberg runtime jar
        spark.sql("CREATE DATABASE IF NOT EXISTS dv_test")
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").write.mode(
            "overwrite"
        ).saveAsTable("dv_test.load_me")
        try:
            assert load_table(spark, "dv_test.load_me").count() == 2
        finally:
            spark.sql("DROP TABLE IF EXISTS dv_test.load_me")
            spark.sql("DROP DATABASE IF EXISTS dv_test")

    def test_load_table_unresolvable_reports_iceberg_attempt(self, spark):
        # unknown catalog name falls through to format("iceberg"); with no
        # runtime jar that must surface an error, never return silently
        import pytest

        with pytest.raises(Exception):
            load_table(spark, "no_such_catalog.db.tbl")

    def test_partition_pruned_check_over_partitioned_table(self, spark, tmp_path):
        """check_data over one partition of a partitioned table reads ONLY
        that partition (PartitionFilters in the scan) — the mechanism that
        makes per-partition validation at 10^12 rows touch 1/N of the data;
        Iceberg serves the same pruning through its catalog."""
        import contextlib
        import io

        from pyspark.sql import functions as F

        p = str(tmp_path / "events_part")
        df = spark.createDataFrame(
            [(i, "t%d" % (i % 4), float(i)) for i in range(400)],
            "id int, event_type string, value double",
        )
        df.write.partitionBy("event_type").parquet(p)
        part = load_table(spark, p).filter(F.col("event_type") == "t1")
        agg = part.agg(F.sum(F.when(F.col("value") >= 0, 1).otherwise(0)))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters: [isnotnull(event_type" in plan, plan
        assert agg.collect()[0][0] == 100

    def test_violations_sink_partitioned_by_rule(self, spark, tmp_path):
        df = spark.createDataFrame([(1, -5.0), (2, 3.0), (3, None)], "id int, x double")
        rules = ruleset(rule("x >= 0", name="nonneg"))
        bad = filter_fails(rules, df, tag=True)
        out = str(tmp_path / "violations")
        write_violations(bad, out, run_id="r1")
        back = spark.read.parquet(out)
        assert back.count() == 2
        assert set(back.columns) >= {"id", "x", "run_id", "failed_rule"}
        # partition pruning surface: one directory per rule
        import os

        assert any(d.startswith("failed_rule=") for d in os.listdir(out))

    def test_summary_sink(self, spark, tmp_path):
        df = spark.createDataFrame([(1,)], "x int")
        res = check_data(df, rule("x > 0"))
        out = str(tmp_path / "summary")
        write_summary(res, out, run_id="r9")
        assert spark.read.parquet(out).filter("run_id = 'r9'").count() == 1


class TestTextFormats:
    def test_jsonl_and_csv_load(self, spark, tmp_path):
        import json

        from dataverifyr_spark import check_data, rule, ruleset
        from dataverifyr_spark.sources import load_table

        jl = tmp_path / "docs.jsonl"
        jl.write_text("\n".join(json.dumps({"doc_id": i, "text": f"t{i}"}) for i in range(20)))
        df = load_table(spark, str(jl))
        assert df.count() == 20 and set(df.columns) == {"doc_id", "text"}

        cv = tmp_path / "vals.csv"
        cv.write_text("k,v\n" + "\n".join(f"{i},{i*2}" for i in range(10)))
        cdf = load_table(spark, str(cv))
        assert cdf.count() == 10
        res = check_data(cdf, ruleset(rule("v == k * 2", name="double"))).collect()
        assert res[0]["fail"] == 0

    def test_tsv_same_parse_sniffed_or_forced(self, spark, tmp_path):
        """ADVICE r3: a .tsv file must parse identically whether fmt is
        sniffed from the extension, forced to 'csv', or forced to 'tsv'."""
        from dataverifyr_spark.sources import load_table

        tv = tmp_path / "vals.tsv"
        tv.write_text("k\tv\n" + "\n".join(f"{i}\t{i*3}" for i in range(5)))
        for fmt in (None, "csv", "tsv"):
            df = load_table(spark, str(tv), fmt=fmt)
            assert df.columns == ["k", "v"], (fmt, df.columns)
            assert df.count() == 5

    def test_fmt_override_and_unknown(self, spark, tmp_path):
        import pytest as pt

        from dataverifyr_spark.sources import load_table

        p = tmp_path / "data.dat"  # extension lies; fmt forces json
        p.write_text('{"a": 1}\n{"a": 2}\n')
        assert load_table(spark, str(p), fmt="json").count() == 2
        with pt.raises(ValueError, match="unknown fmt"):
            load_table(spark, str(p), fmt="orcish")
