"""Source resolution and violation/summary sinks."""

from dataverifyr_spark import check_data, filter_fails, rule, ruleset
from dataverifyr_spark.sources import load_table, write_summary, write_violations


class TestSources:
    def test_load_table_parquet_fallback(self, spark, tmp_path):
        p = str(tmp_path / "t.parquet")
        spark.range(0, 10).write.parquet(p)
        assert load_table(spark, p).count() == 10

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
