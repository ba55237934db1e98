"""Structured Streaming validation: windowed rule summaries over a
deterministic file-source stream must equal the batch engine's counts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataverifyr_spark import check_data, rule, ruleset
from dataverifyr_spark.ledger import ValidationLedger
from dataverifyr_spark.streaming import check_stream, validate_stream_to_ledger


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    """3 parquet files => 3 deterministic micro-batches with maxFilesPerTrigger=1."""
    root = tmp_path_factory.mktemp("stream_in")
    base = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows_per_file = 100
    for f in range(3):
        rows = []
        for i in range(rows_per_file):
            ts = base + dt.timedelta(seconds=f * 60 + (i % 50))
            val = float(i - 10)  # 10 negative per file
            rows.append((ts, val, f"s{i % 4}"))
        spark.createDataFrame(rows, "ts timestamp, value double, source string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(root / f"f{f}"))
    return str(root)


RULES = ruleset(
    rule("value >= 0", name="nonneg"),
    rule("source %in% c('s0', 's1', 's2', 's3')", name="src_ok"),
)


class TestCheckStream:
    def test_windowed_counts_match_batch(self, spark, stream_input, tmp_path):
        sdf = (
            spark.readStream.schema("ts timestamp, value double, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_input}/f*")
        )
        out = check_stream(sdf, RULES, time_col="ts", window="1 minute", watermark="0 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("stream_summary")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("select * from stream_summary").collect()
        # totals across windows == batch counts on the full static input
        static = spark.read.parquet(f"{stream_input}/f*")
        batch = {r["name"]: r for r in check_data(static, RULES).collect()}
        by_rule = {}
        for r in got:
            agg = by_rule.setdefault(r["name"], [0, 0, 0])
            agg[0] += r["tests"]
            agg[1] += r["pass"]
            agg[2] += r["fail"]
        for name, (tests, passed, fail) in by_rule.items():
            assert tests == batch[name]["tests"]
            assert passed == batch[name]["pass"]
            assert fail == batch[name]["fail"]
        # multiple event-time windows actually materialized
        assert len({(r["window_start"]) for r in got}) >= 3

    def test_reference_rule_rejected(self, spark, stream_input):
        from dataverifyr_spark import reference_rule

        sdf = (
            spark.readStream.schema("ts timestamp, value double, source string")
            .parquet(f"{stream_input}/f*")
        )
        with pytest.raises(ValueError, match="foreachBatch"):
            check_stream(sdf, ruleset(reference_rule("source", "codecs", "codec")), "ts")


class TestStreamToLedger:
    def test_micro_batches_append_ledger(self, spark, stream_input, tmp_path):
        sdf = (
            spark.readStream.schema("ts timestamp, value double, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_input}/f*")
        )
        ledger_path = str(tmp_path / "ledger")
        writer = validate_stream_to_ledger(
            sdf, RULES, part_col="source", ledger_path=ledger_path,
            checkpoint_path=str(tmp_path / "ckpt2"), run_id="st",
        )
        q = writer.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        led = ValidationLedger(spark, ledger_path)
        total = 0
        for b in range(3):
            rows = led.totals(f"st-b{b}").collect()
            if rows:
                total += sum(r["tests"] for r in rows if r["name"] == "nonneg")
        assert total == 300
