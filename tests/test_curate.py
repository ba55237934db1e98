"""curate_clips: the validate -> quality-gate -> caption-dedup pipeline,
plus the r6 VS-probe quality-trio parity."""

import pytest
from pyspark.sql import functions as F

from dataverifyr_spark.audio import (
    clips_table,
    curate_clips,
    expected_table,
    expected_transcript,
    with_audio_features,
    with_audio_features_vs,
)
from dataverifyr_spark.audio.fixtures import (
    BAD_DUR_EVERY,
    BAD_SR_EVERY,
    CORRUPT_BYTES_EVERY,
    EMPTY_TRANSCRIPT_EVERY,
    NULL_TRANSCRIPT_EVERY,
)

N = 400


def _survives(i: int) -> bool:
    return not any(
        i > 0 and i % c == 0
        for c in (
            BAD_SR_EVERY, BAD_DUR_EVERY, EMPTY_TRANSCRIPT_EVERY,
            NULL_TRANSCRIPT_EVERY, CORRUPT_BYTES_EVERY,
        )
    )


class TestCurate:
    def test_survivor_set_is_cadence_arithmetic(self, spark):
        clips = clips_table(spark, N)
        stats = {}
        out = curate_clips(clips, stats=stats)
        got = sorted(r["clip_id"] for r in out.select("clip_id").collect())
        want = sorted(f"clip-{i:012d}" for i in range(N) if _survives(i))
        assert got == want
        assert stats["input_rows"] == N
        assert stats["validated_rows"] == len(want)
        # all fixture captions distinct at this n -> dedup drops nothing
        assert stats["dup_captions_dropped"] == 0
        assert stats["output_rows"] == len(want)

    def test_caption_dedup_keeps_one_representative(self, spark):
        clips = clips_table(spark, 100)
        boiler = clips.withColumn(
            "transcript",
            F.when(
                F.substring("clip_id", -4, 4).cast("int") % 5 == 0,
                F.lit(expected_transcript(1)),
            ).otherwise(F.col("transcript")),
        )
        # transcript_equal would kill the altered rows vs the generator, so
        # run against a reference table carrying the SAME boilerplate edits
        exp = expected_table(spark, 100).withColumn(
            "expected_transcript",
            F.when(
                F.substring("clip_id", -4, 4).cast("int") % 5 == 0,
                F.lit(expected_transcript(1)),
            ).otherwise(F.col("expected_transcript")),
        )
        stats = {}
        out = curate_clips(boiler, expected=exp, stats=stats)
        kept = {r["clip_id"] for r in out.select("clip_id").collect()}
        # survivors among the boilerplate group (i%5==0) collapse to ONE
        boiler_survivors = [
            i for i in range(100) if i % 5 == 0 and _survives(i)
        ] + [1]  # clip 1 donated the caption and carries it naturally
        assert sum(1 for i in boiler_survivors if f"clip-{i:012d}" in kept) == 1
        assert stats["dup_captions_dropped"] == len(boiler_survivors) - 1

    def test_keep_features_retains_probe_columns(self, spark):
        out = curate_clips(clips_table(spark, 30), keep_features=True)
        assert "audio_snr_db" in out.columns and "audio_clip_ratio" in out.columns
        out2 = curate_clips(clips_table(spark, 30))
        assert [c for c in out2.columns] == list(clips_table(spark, 1).columns)


class TestVsProbeQualityParity:
    def test_quality_trio_equal_on_both_probe_paths(self, spark):
        """The r6 VS-probe extension: peak/clip_ratio/dc_offset from
        with_audio_features_vs must equal the fixture-probe values row for
        row (same decode, same definitions)."""
        clips = clips_table(spark, 120)
        exp = expected_table(spark, 120)
        a = {
            r["clip_id"]: (r["audio_peak"], r["audio_clip_ratio"], r["audio_dc_offset"])
            for r in with_audio_features(clips)
            .select("clip_id", "audio_peak", "audio_clip_ratio", "audio_dc_offset")
            .collect()
        }
        b = {
            r["clip_id"]: (r["audio_peak"], r["audio_clip_ratio"], r["audio_dc_offset"])
            for r in with_audio_features_vs(clips, exp)
            .select("clip_id", "audio_peak", "audio_clip_ratio", "audio_dc_offset")
            .collect()
        }
        assert a == b
