"""Audio payload: WAV codec round-trip, per-row invariants (SNR≥30dB +
transcript equality per BASELINE.json input_hint), and audio rules flowing
through check_data / filter_fails."""

import numpy as np
import pytest

import dataverifyr_spark as dv
import dataverifyr_spark.audio  # noqa: F401 — registers audio dialect functions
from dataverifyr_spark.audio.fixtures import (
    BAD_CODEC_EVERY,
    BAD_DUR_EVERY,
    BAD_SR_EVERY,
    CORRUPT_BYTES_EVERY,
    allowed_codecs,
    clip_index,
    clips_table,
    expected_pcm,
    expected_transcript,
)
from dataverifyr_spark.audio.wav import WavError, decode_wav, encode_wav_pcm16, snr_db

N = 120


@pytest.fixture(scope="module")
def clips(spark):
    return clips_table(spark, N).cache()


class TestWavCodec:
    def test_round_trip_snr(self):
        # the reference invariant: decode(encode(pcm)) allclose, SNR >= 30dB
        pcm = expected_pcm(7, 16000, 8000)
        dec, sr = decode_wav(encode_wav_pcm16(pcm, 16000))
        assert sr == 16000
        assert len(dec) == 8000
        s = snr_db(pcm, dec.astype(np.float64) / 32767.0)
        assert s >= 30.0  # int16 quantization actually gives ~60-90dB
        np.testing.assert_allclose(dec / 32767.0, pcm, atol=1.5 / 32767.0)

    def test_malformed_rejected(self):
        with pytest.raises(WavError):
            decode_wav(b"not a wav")
        good = encode_wav_pcm16(expected_pcm(1, 8000, 800), 8000)
        with pytest.raises(WavError):
            decode_wav(good[: len(good) // 3])

    def test_deterministic_fixture(self):
        a = expected_pcm(3, 8000, 1000)
        b = expected_pcm(3, 8000, 1000)
        np.testing.assert_array_equal(a, b)
        assert expected_transcript(11) == expected_transcript(11)


class TestClipsInvariants:
    def test_per_row_invariant_snr_and_transcript(self, spark, clips):
        """Every non-corrupted row decodes to the regenerated waveform with
        SNR>=30dB, and every non-injected transcript matches the generator."""
        res = dv.check_data(
            clips,
            dv.ruleset(
                dv.rule("audio_snr_vs_expected(clip_id, bytes) >= 30", name="snr"),
                dv.rule("transcript_matches_expected(clip_id, transcript)", name="tr"),
            ),
        ).collect()
        snr_row, tr_row = res[0], res[1]
        n_corrupt = len([i for i in range(1, N) if i % CORRUPT_BYTES_EVERY == 0])
        assert snr_row["tests"] == N
        assert snr_row["fail"] == n_corrupt  # only corrupted blobs fail SNR
        n_bad_tr = len(
            [i for i in range(1, N) if i % 31 == 0 or i % 37 == 0]
        )
        assert tr_row["fail"] == n_bad_tr

    def test_audio_rule_goldens(self, spark, clips):
        rules = dv.ruleset(
            dv.rule("audio_valid(bytes)", name="valid"),
            dv.rule("audio_sr(bytes) == sr_hz", name="sr_consistent"),
            dv.rule("abs(audio_dur_ms(bytes) - dur_ms) <= 2", name="dur_consistent"),
            dv.rule("sr_hz %in% c(8000, 16000, 44100, 48000)", name="sr_allowed"),
        )
        rows = {r["name"]: r for r in dv.check_data(clips, rules).collect()}
        bad = lambda k: len([i for i in range(1, N) if i % k == 0])
        corrupt = bad(CORRUPT_BYTES_EVERY)
        assert rows["valid"]["fail"] == corrupt
        # sr mismatch: lying sr column OR undecodable blob
        sr_bad = len(
            [i for i in range(1, N) if i % BAD_SR_EVERY == 0 or i % CORRUPT_BYTES_EVERY == 0]
        )
        assert rows["sr_consistent"]["fail"] == sr_bad
        dur_bad = len(
            [i for i in range(1, N) if i % BAD_DUR_EVERY == 0 or i % CORRUPT_BYTES_EVERY == 0]
        )
        assert rows["dur_consistent"]["fail"] == dur_bad
        assert rows["sr_allowed"]["fail"] == bad(BAD_SR_EVERY)

    def test_codec_reference_rule(self, spark, clips):
        rs = dv.ruleset(dv.reference_rule("codec", "codecs", "codec", name="codec_ok"))
        res = dv.check_data({"clips": clips, "codecs": allowed_codecs(spark)}, rs).collect()[0]
        assert res["fail"] == len([i for i in range(1, N) if i % BAD_CODEC_EVERY == 0])

    def test_violations_extractable(self, spark, clips):
        rules = dv.ruleset(dv.rule("audio_valid(bytes)", name="valid"))
        bad_rows = dv.filter_fails(rules, clips)
        ids = sorted(clip_index(r["clip_id"]) for r in bad_rows.collect())
        assert ids == [i for i in range(1, N) if i % CORRUPT_BYTES_EVERY == 0]

    def test_transcript_nonempty_rule(self, spark, clips):
        row = dv.check_data(
            clips, dv.rule("nchar(trimws(transcript)) > 0", name="nonempty")
        ).collect()[0]
        n_bad = len([i for i in range(1, N) if i % 31 == 0 or i % 37 == 0])
        assert row["fail"] == n_bad


class TestFusedProbe:
    def test_probe_matches_multi_udf_path(self, spark, clips):
        """with_audio_features + audio_ruleset gives the same pass/fail as the
        per-function UDF rules — one decode instead of five."""
        from dataverifyr_spark.audio import audio_ruleset, with_audio_features

        enriched = with_audio_features(clips)
        fused = {r["name"]: r for r in dv.check_data(enriched, audio_ruleset()).collect()}

        multi = {
            r["name"]: r
            for r in dv.check_data(
                clips,
                dv.ruleset(
                    dv.rule("audio_valid(bytes)", name="decodes"),
                    dv.rule("audio_sr(bytes) == sr_hz", name="sr_consistent"),
                    dv.rule("abs(audio_dur_ms(bytes) - dur_ms) <= 2", name="dur_consistent"),
                    dv.rule("audio_snr_vs_expected(clip_id, bytes) >= 30", name="pcm_allclose_snr"),
                    dv.rule(
                        "transcript_matches_expected(clip_id, transcript)", name="transcript_equal"
                    ),
                    dv.rule("nchar(trimws(transcript)) > 0", name="transcript_nonempty"),
                ),
            ).collect()
        }
        for name in fused:
            assert (fused[name]["pass"], fused[name]["fail"]) == (
                multi[name]["pass"],
                multi[name]["fail"],
            ), name

    def test_dialect_bytes_rules_share_one_decode(self, spark, clips):
        """All bytes-family dialect functions compile onto the SAME
        audio_bytes_probe(bytes) expression, which Spark evaluates once per
        row — the physical plan must show exactly one ArrowEvalPython node
        with one probe slot for a 5-audio-rule fused aggregate."""
        import contextlib
        import io

        from pyspark.sql import functions as F

        from dataverifyr_spark.check import compile_rule_predicate

        rules = dv.ruleset(
            dv.rule("audio_valid(bytes)"),
            dv.rule("audio_sr(bytes) == sr_hz"),
            dv.rule("abs(audio_dur_ms(bytes) - dur_ms) <= 2"),
            dv.rule("audio_rms(bytes) > 0.001", allow_na=True),
            dv.rule("audio_n_samples(bytes) > 0"),
        )
        preds = [compile_rule_predicate(r).column for r in rules]
        agg = clips.agg(
            *[F.sum(F.when(p, 1).otherwise(0)).alias(f"p{i}") for i, p in enumerate(preds)]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain(True)
        phys = buf.getvalue().split("== Physical Plan ==")[-1]
        arrow_lines = [ln for ln in phys.splitlines() if "ArrowEvalPython" in ln]
        assert len(arrow_lines) == 1, phys
        assert arrow_lines[0].count("_audio_bytes_probe") == 1, arrow_lines[0]

    def test_violations_on_probe_columns(self, spark, clips):
        from dataverifyr_spark.audio import audio_ruleset, with_audio_features

        enriched = with_audio_features(clips).cache()
        bad = dv.filter_fails(audio_ruleset(), enriched, tag=True)
        by_rule = {r["failed_rule"]: r["count"] for r in bad.groupBy("failed_rule").count().collect()}
        assert by_rule.get("audio_valid", 0) == len(
            [i for i in range(1, N) if i % CORRUPT_BYTES_EVERY == 0]
        )


class TestSilenceRatio:
    def test_silence_ratio_rule(self, spark):
        import numpy as np
        from dataverifyr_spark.audio.wav import encode_wav_pcm16

        sr = 16000
        loud = np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.5
        half_silent = loud.copy()
        half_silent[sr // 2:] = 0.0
        rows = [
            ("a", bytearray(encode_wav_pcm16(loud, sr))),
            ("b", bytearray(encode_wav_pcm16(half_silent, sr))),
            ("c", bytearray(encode_wav_pcm16(np.zeros(sr), sr))),
        ]
        df = spark.createDataFrame(rows, "clip_id string, bytes binary")
        # r6: silence_ratio is a field of the shared bytes probe (no
        # standalone UDF — zero extra decodes next to other audio rules)
        res = {r["clip_id"]: r["sil"] for r in df.select(
            "clip_id",
            __import__("dataverifyr_spark.audio.rules", fromlist=["_get_udf"])._get_udf(
                "audio_bytes_probe"
            )("bytes").getField("silence_ratio").alias("sil"),
        ).collect()}
        assert res["a"] < 0.05
        assert 0.4 < res["b"] < 0.6
        assert res["c"] == 1.0
        # and through the rule dialect
        row = dv.check_data(df, dv.rule("audio_silence_ratio(bytes) < 0.9", name="not_silent")).collect()[0]
        assert (row["pass"], row["fail"]) == (2, 1)


class TestUdfCacheInvalidation:
    def test_cache_keyed_by_spark_context(self, spark):
        """A cached wrapped pandas_udf closes over its context's warning
        accumulator; after a SparkContext restart the cache must rebuild so
        executor warnings reach the LIVE accumulator (not the dead one)."""
        from dataverifyr_spark.audio import rules as arules

        cache = arules._ctx_cache()
        arules._get_udf("audio_bytes_probe")
        assert "audio_bytes_probe" in arules._ctx_cache()
        assert arules._ctx_cache() is cache  # stable while the context lives

        saved_ctx = arules._udf_cache_ctx
        try:
            arules._udf_cache_ctx = -1  # simulate a context restart
            fresh = arules._ctx_cache()
            assert fresh is not cache and "audio_bytes_probe" not in fresh
        finally:
            # restore: next call re-keys to the live context and rebuilds
            arules._udf_cache_ctx = saved_ctx
            arules._udf_cache = cache
        assert arules._ctx_cache() is cache


class TestAudioVsReferenceTable:
    """with_audio_features_vs: expectations from a REFERENCE TABLE (joined
    expected_bytes / expected_transcript columns) instead of the synthetic
    generator — the real-corpus shape where no generator exists."""

    @pytest.fixture(scope="class")
    def expected_table(self, spark):
        from dataverifyr_spark.audio.fixtures import (
            SAMPLE_RATES,
            _rng,
            expected_pcm,
            expected_transcript,
        )
        from dataverifyr_spark.audio.wav import encode_wav_pcm16

        rows = []
        for i in range(200):
            sr = SAMPLE_RATES[i % len(SAMPLE_RATES)]
            dur = 200 + int(_rng(i, 5) * 800)
            n = int(round(sr * dur / 1000.0))
            rows.append(
                (
                    f"clip-{i:012d}",
                    bytearray(encode_wav_pcm16(expected_pcm(i, sr, n), sr)),
                    expected_transcript(i),
                )
            )
        return spark.createDataFrame(
            rows, "clip_id string, expected_bytes binary, expected_transcript string"
        ).cache()

    def test_matches_generator_path_rule_for_rule(self, spark, expected_table):
        import dataverifyr_spark as dv
        from dataverifyr_spark.audio import (
            audio_ruleset,
            clips_table,
            with_audio_features,
            with_audio_features_vs,
        )

        clips = clips_table(spark, 200)
        gen = {
            r["name"]: (r["tests"], r["pass"], r["fail"])
            for r in dv.check_data(with_audio_features(clips), audio_ruleset()).collect()
        }
        vs = {
            r["name"]: (r["tests"], r["pass"], r["fail"])
            for r in dv.check_data(
                with_audio_features_vs(clips, expected_table, broadcast_expected=True),
                audio_ruleset(),
            ).collect()
        }
        assert gen == vs
        assert vs["decodes"][2] > 0  # the fixture injects real violations

    def test_clip_missing_from_reference_fails_expectation_rules(self, spark, expected_table):
        import dataverifyr_spark as dv
        from dataverifyr_spark.audio import audio_ruleset, clips_table, with_audio_features_vs

        clips = clips_table(spark, 200)
        truncated = expected_table.filter("clip_id <> 'clip-000000000003'")
        feats = with_audio_features_vs(clips, truncated)
        row3 = feats.filter("clip_id = 'clip-000000000003'").collect()[0]
        assert row3["audio_valid"] is True  # the clip itself decodes
        assert row3["audio_snr_db"] is None  # no reference → not comparable
        assert row3["audio_transcript_ok"] is None
        by = {
            r["name"]: r["fail"]
            for r in dv.check_data(feats, audio_ruleset()).collect()
        }
        # one more failure than the fixture cadence on both expectation rules
        full = {
            r["name"]: r["fail"]
            for r in dv.check_data(
                with_audio_features_vs(clips, expected_table), audio_ruleset()
            ).collect()
        }
        assert by["pcm_allclose_snr"] == full["pcm_allclose_snr"] + 1
        assert by["transcript_equal"] == full["transcript_equal"] + 1


class TestBucketedVsJoin:
    def test_bucketed_tables_join_without_exchange(self, spark, tmp_path):
        """The 100 TB shape for with_audio_features_vs: clips AND the
        reference table bucketed by clip_id — the equi-join reads both
        bucketed tables with NO Exchange (shuffle) before the join, so the
        payload bytes never re-shuffle."""
        import contextlib
        import io

        from dataverifyr_spark.audio import clips_table, expected_table, with_audio_features_vs

        spark.sql("DROP TABLE IF EXISTS clips_bkt")
        spark.sql("DROP TABLE IF EXISTS expected_bkt")
        wh = str(tmp_path)
        clips_table(spark, 100).write.bucketBy(4, "clip_id").sortBy("clip_id").option(
            "path", f"{wh}/clips_bkt"
        ).saveAsTable("clips_bkt")
        expected_table(spark, 100).write.bucketBy(4, "clip_id").sortBy("clip_id").option(
            "path", f"{wh}/expected_bkt"
        ).saveAsTable("expected_bkt")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            clips = spark.table("clips_bkt")
            exp = spark.table("expected_bkt")
            feats = with_audio_features_vs(clips, exp)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                feats.explain("formatted")
            plan = buf.getvalue()
            join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in join_part, plan  # bucketed: no shuffle feeds the join
            # and the result is still correct end-to-end
            n_valid = feats.filter("audio_valid AND audio_snr_db >= 30").count()
            assert n_valid > 90
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS clips_bkt")
            spark.sql("DROP TABLE IF EXISTS expected_bkt")


class TestSpectralFeatures:
    """audio_dom_freq / audio_spec_centroid: one rfft inside the shared
    bytes probe.  The fixture's waveform is 0.45·sin(f1) + 0.25·sin(f2) +
    1% noise with f1 ∈ [100, 250) — the dominant peak must recover f1 to
    within one frequency bin for EVERY valid clip."""

    def test_dominant_recovers_f1(self, spark, clips):
        import math

        from pyspark.sql import functions as F

        from dataverifyr_spark.audio.fixtures import _rng, clip_index
        from dataverifyr_spark.expr import compile_expr

        dom = compile_expr("audio_dom_freq(bytes)").column
        rows = clips.filter(
            F.substring("clip_id", 6, 12).cast("int") % 41 != 0
        ).select("clip_id", dom.alias("dom"), (F.length("bytes") / 2 / 44100).alias("_")).collect()
        assert rows
        for r in rows:
            i = clip_index(r["clip_id"])
            f1 = 100.0 + 150.0 * _rng(i, 1)
            # bin resolution = sr / n_samples; duration >= 200 ms => <= 5 Hz
            assert r["dom"] is not None
            assert abs(r["dom"] - f1) <= 6.0, (i, f1, r["dom"])

    def test_centroid_above_dominant_and_corrupt_null(self, spark, clips):
        import dataverifyr_spark as dv

        res = {
            r["name"]: r
            for r in dv.check_data(
                clips,
                dv.ruleset(
                    dv.rule(
                        "audio_dom_freq(bytes) >= 95 & audio_dom_freq(bytes) <= 260",
                        name="dom_in_band",
                    ),
                    dv.rule(
                        "audio_spec_centroid(bytes) > audio_dom_freq(bytes)",
                        name="centroid_above",
                    ),
                ),
            ).collect()
        }
        n = clips.count()
        corrupt = len([i for i in range(1, n) if i % 41 == 0])
        # NULL (undecodable) -> fail without allow_na; every valid clip passes
        assert res["dom_in_band"]["fail"] == corrupt
        assert res["centroid_above"]["fail"] == corrupt


class TestAudioSegments:
    """Segment-level validation (audio/segments.py): windowing math, per-
    segment spectral ground truth, corrupt-row contract, partial windows."""

    @pytest.fixture(scope="class")
    def seg_df(self, spark):
        from dataverifyr_spark.audio.segments import audio_segments, long_clips_table

        return audio_segments(long_clips_table(spark, 60), window_ms=1000).cache()

    def test_segment_counts_and_ground_truth(self, spark, seg_df):
        from dataverifyr_spark.audio.segments import (
            LONG_BASE_SEGS,
            LONG_CORRUPT_EVERY,
            LONG_SILENT_EVERY,
        )

        rows = seg_df.collect()
        by_clip = {}
        for r in rows:
            by_clip.setdefault(r["clip_id"], []).append(r)
        assert len(by_clip) == 60  # corrupt clips still surface (one row)
        for cid, segs in by_clip.items():
            i = int(cid.split("-")[1])
            if i > 0 and i % LONG_CORRUPT_EVERY == 0:
                assert len(segs) == 1 and not segs[0]["seg_valid"]
                assert segs[0]["seg_error"] is not None
                continue
            assert len(segs) == LONG_BASE_SEGS + i % 3
            for r in sorted(segs, key=lambda r: r["seg_idx"]):
                s = r["seg_idx"]
                assert r["seg_start_ms"] == pytest.approx(s * 1000.0)
                if s == 1 and i > 0 and i % LONG_SILENT_EVERY == 0:
                    assert r["seg_rms"] == pytest.approx(0.0, abs=1e-9)
                else:
                    # per-segment tone recovered within one 1 Hz bin
                    assert r["seg_dom_freq_hz"] == pytest.approx(200.0 + 50.0 * s, abs=1.5)
                    assert r["seg_rms"] == pytest.approx(0.5 / 2**0.5, rel=0.01)

    def test_rules_over_segments(self, spark, seg_df):
        import dataverifyr_spark as dv
        from dataverifyr_spark.audio.segments import LONG_CORRUPT_EVERY, LONG_SILENT_EVERY

        res = {
            r["name"]: r
            for r in dv.check_data(
                seg_df,
                dv.ruleset(
                    dv.rule("seg_valid", name="decodes"),
                    dv.rule("seg_rms > 0.001", name="nonsilent"),
                ),
            ).collect()
        }
        corrupt = len([i for i in range(1, 60) if i % LONG_CORRUPT_EVERY == 0])
        silent = len(
            [i for i in range(1, 60) if i % LONG_SILENT_EVERY == 0 and i % LONG_CORRUPT_EVERY != 0]
        )
        assert res["decodes"]["fail"] == corrupt
        assert res["nonsilent"]["fail"] == corrupt + silent  # NULL rms -> fail

    def test_partial_window_kept_or_dropped(self, spark):
        import numpy as np

        from dataverifyr_spark.audio.segments import audio_segments
        from dataverifyr_spark.audio.wav import encode_wav_pcm16

        sr = 8000
        blob = encode_wav_pcm16(np.zeros(int(sr * 2.5)), sr)  # 2.5 s
        df = spark.createDataFrame([("c", bytearray(blob))], "clip_id string, bytes binary")
        kept = audio_segments(df, window_ms=1000).collect()
        assert [r["seg_idx"] for r in sorted(kept, key=lambda r: r["seg_idx"])] == [0, 1, 2]
        dropped = audio_segments(df, window_ms=1000, drop_partial=True).collect()
        assert len(dropped) == 2
        with pytest.raises(ValueError, match="positive"):
            audio_segments(df, window_ms=0)

    def test_drop_partial_short_clip_marker_row(self, spark):
        """ADVICE r5: drop_partial=True on a decodable clip shorter than one
        window must emit ONE marker row, never zero rows (the never-silently-
        missing contract)."""
        import numpy as np

        from dataverifyr_spark.audio.segments import audio_segments
        from dataverifyr_spark.audio.wav import encode_wav_pcm16

        sr = 8000
        blob = encode_wav_pcm16(np.ones(int(sr * 0.4)) * 0.1, sr)  # 0.4 s
        df = spark.createDataFrame([("short", bytearray(blob))], "clip_id string, bytes binary")
        rows = audio_segments(df, window_ms=1000, drop_partial=True).collect()
        assert len(rows) == 1 and not rows[0]["seg_valid"]
        assert "no whole window" in rows[0]["seg_error"]
        # default mode still computes features over the partial slice
        kept = audio_segments(df, window_ms=1000).collect()
        assert len(kept) == 1 and kept[0]["seg_valid"]

    def test_zero_sample_clip_gets_one_row(self, spark):
        """r4 review: a DECODABLE zero-sample clip must emit one
        seg_valid=false row, not vanish."""
        import numpy as np

        from dataverifyr_spark.audio.segments import audio_segments
        from dataverifyr_spark.audio.wav import encode_wav_pcm16

        blob = encode_wav_pcm16(np.zeros(0), 8000)
        df = spark.createDataFrame([("z", bytearray(blob))], "clip_id string, bytes binary")
        rows = audio_segments(df).collect()
        assert len(rows) == 1 and not rows[0]["seg_valid"]
        assert "empty" in rows[0]["seg_error"]

    def test_spectral_probe_is_separate_udf(self, spark, clips):
        """r4 review: cheap bytes rules must NOT pay the rfft — a cheap-only
        plan has ONE probe UDF, a mixed plan has two."""
        import contextlib
        import io

        import dataverifyr_spark as dv
        from dataverifyr_spark.check import compile_rule_predicate
        from pyspark.sql import functions as F

        def probes(rules):
            """Distinct probe UDF invocations in the plan (Spark batches
            several UDFs into ONE ArrowEvalPython node — count invocations,
            not nodes)."""
            preds = [compile_rule_predicate(r).column for r in rules]
            agg = clips.agg(*[F.sum(F.when(p, 1).otherwise(0)).alias(f"p{i}")
                              for i, p in enumerate(preds)])
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                agg.explain("formatted")
            plan = buf.getvalue()
            return (
                "_audio_bytes_probe_impl" in plan,
                "_audio_spectral_probe_impl" in plan,
            )

        cheap = dv.ruleset(dv.rule("audio_valid(bytes)"), dv.rule("audio_rms(bytes) > 0"))
        spectral = dv.ruleset(dv.rule("audio_dom_freq(bytes) > 0"),
                              dv.rule("audio_spec_centroid(bytes) > 0"))
        mixed = dv.ruleset(dv.rule("audio_rms(bytes) > 0"),
                           dv.rule("audio_dom_freq(bytes) > 0"))
        assert probes(cheap) == (True, False)   # cheap rules never pay the rfft
        assert probes(spectral) == (False, True)
        assert probes(mixed) == (True, True)
