"""Multi-codec WAV family: G.711 table anchors, per-codec round-trip SNR,
container rejection, and the mixed-codec corpus through the fused ruleset.

The reference has no audio support at all (R/ is tabular-only); this is graft
surface for the north_rule's (clip_id, bytes, sr_hz, dur_ms, codec,
transcript) table — the codec column becomes checkable against the actual
byte coding, not just against an allow-list.
"""

from __future__ import annotations

import numpy as np
import pytest

import dataverifyr_spark as dv
from dataverifyr_spark.audio.fixtures import (
    BAD_CODEC_EVERY,
    BAD_DUR_EVERY,
    BAD_SR_EVERY,
    CORRUPT_BYTES_EVERY,
    EMPTY_TRANSCRIPT_EVERY,
    MIXED_CODECS,
    NULL_TRANSCRIPT_EVERY,
    expected_pcm,
    mixed_codec_clips_table,
)
from dataverifyr_spark.audio.rules import audio_ruleset, with_audio_features
from dataverifyr_spark.audio.wav import (
    _ALAW_DEC,
    _ULAW_DEC,
    WAV_CODECS,
    WavError,
    decode_wav,
    decode_wav_info,
    encode_wav,
    encode_wav_pcm16,
    snr_db,
)


def _waveform(n=8000, sr=8000):
    return expected_pcm(3, sr, n)


class TestG711Tables:
    def test_ulaw_canonical_anchors(self):
        # anchors from the public g711.c / ITU-T G.711 μ-law decode table
        assert _ULAW_DEC[0x00] == -32124
        assert _ULAW_DEC[0x80] == 32124
        assert _ULAW_DEC[0xFF] == 0
        assert _ULAW_DEC[0x7F] == 0  # μ-law has a negative zero code

    def test_alaw_canonical_anchors(self):
        assert _ALAW_DEC[0x55] == -8
        assert _ALAW_DEC[0xD5] == 8
        assert int(_ALAW_DEC.max()) == 32256
        assert int(_ALAW_DEC.min()) == -32256

    def test_tables_are_sign_symmetric(self):
        # positive codes (sign bit set after inversion conventions) mirror
        # the negative half exactly
        assert sorted(-_ULAW_DEC[_ULAW_DEC < 0]) == sorted(_ULAW_DEC[_ULAW_DEC > 0])
        assert sorted(-_ALAW_DEC[_ALAW_DEC < 0]) == sorted(_ALAW_DEC[_ALAW_DEC > 0])

    def test_encoder_is_nearest_level(self):
        # every decode level must round-trip to exactly itself
        for table, codec in ((_ULAW_DEC, "ulaw"), (_ALAW_DEC, "alaw")):
            blob = encode_wav(table.astype(np.int16), 8000, codec)
            back, _sr, _c = decode_wav_info(blob)
            assert np.array_equal(back, table)


class TestRoundTrip:
    # measured round-trip SNR floors for the fixture waveform (worst codec,
    # μ-law, sits ≈37 dB — comfortably above the 30 dB north-rule invariant)
    SNR_FLOORS = {
        "pcm_s16le": 80.0,
        "pcm_f32le": 80.0,
        "pcm_u8": 40.0,
        "alaw": 33.0,
        "ulaw": 33.0,
    }

    @pytest.mark.parametrize("codec", sorted(WAV_CODECS))
    def test_round_trip_snr_and_metadata(self, codec):
        x = _waveform()
        blob = encode_wav(x, 8000, codec)
        samples, sr, got = decode_wav_info(blob)
        assert (sr, got, len(samples)) == (8000, codec, len(x))
        s = snr_db(x, samples.astype(np.float64) / 32767.0)
        assert s >= self.SNR_FLOORS[codec], (codec, s)

    def test_pcm16_alias_unchanged(self):
        x = _waveform(1000)
        assert encode_wav_pcm16(x, 16000) == encode_wav(x, 16000, "pcm_s16le")

    def test_decode_wav_two_tuple_contract(self):
        samples, sr = decode_wav(encode_wav(_waveform(500), 8000, "ulaw"))
        assert sr == 8000 and samples.dtype == np.int16

    def test_unknown_codec_raises(self):
        with pytest.raises(WavError, match="unsupported codec"):
            encode_wav(_waveform(100), 8000, "opus")


class TestContainerRejection:
    def test_stereo_rejected(self):
        blob = bytearray(encode_wav(_waveform(100), 8000, "pcm_s16le"))
        blob[22] = 2  # channels field
        with pytest.raises(WavError, match="mono"):
            decode_wav_info(bytes(blob))

    def test_unknown_format_code_rejected(self):
        blob = bytearray(encode_wav(_waveform(100), 8000, "pcm_s16le"))
        blob[20] = 2  # ADPCM — a real public code we do not implement
        with pytest.raises(WavError, match="format code 2"):
            decode_wav_info(bytes(blob))

    def test_wrong_bits_for_code_rejected(self):
        blob = bytearray(encode_wav(_waveform(100), 8000, "pcm_s16le"))
        blob[34] = 24  # bits field: PCM24 unsupported
        with pytest.raises(WavError, match="24 bits"):
            decode_wav_info(bytes(blob))

    def test_truncated_float32_data(self):
        blob = encode_wav(_waveform(100), 8000, "pcm_f32le")
        with pytest.raises(WavError):
            decode_wav_info(blob[:-2])


class TestMixedCodecCorpus:
    N = 500

    @staticmethod
    def _expected_counts(n):
        """Per-rule expected (tests, pass) from the pure index cadences —
        the same arithmetic the DuckDB oracle for the driver gate uses."""
        corrupt = {i for i in range(1, n) if i % CORRUPT_BYTES_EVERY == 0}
        bad_sr = {i for i in range(1, n) if i % BAD_SR_EVERY == 0}
        bad_dur = {i for i in range(1, n) if i % BAD_DUR_EVERY == 0}
        bad_codec = {i for i in range(1, n) if i % BAD_CODEC_EVERY == 0}
        empty_t = {i for i in range(1, n) if i % EMPTY_TRANSCRIPT_EVERY == 0}
        null_t = {i for i in range(1, n) if i % NULL_TRANSCRIPT_EVERY == 0}
        bad_t = empty_t | null_t
        return {
            "decodes": n - len(corrupt),
            "sr_consistent": n - len(corrupt | bad_sr),
            "dur_consistent": n - len(corrupt | bad_dur),
            "pcm_allclose_snr": n - len(corrupt),
            "transcript_equal": n - len(bad_t),
            "transcript_nonempty": n - len(bad_t),
            "codec_consistent": n - len(corrupt | bad_codec),
        }

    def test_codec_cycle_and_cadence_counts(self, spark):
        clips = mixed_codec_clips_table(spark, self.N, num_partitions=8).cache()
        feats = with_audio_features(clips)
        res = dv.check_data(feats, audio_ruleset(codec_consistent=True))
        rows = {r["name"]: r for r in res.collect()}
        expected = self._expected_counts(self.N)
        for name, exp_pass in expected.items():
            assert rows[name]["tests"] == self.N, name
            assert rows[name]["pass"] == exp_pass, (
                name, rows[name]["pass"], exp_pass,
            )
        # every codec actually appears in the decoded corpus
        got = {
            r["audio_codec"]
            for r in feats.select("audio_codec").distinct().collect()
        }
        assert set(MIXED_CODECS) <= got
        clips.unpersist()

    def test_codec_column_matches_header_except_liars(self, spark):
        clips = mixed_codec_clips_table(spark, 120, num_partitions=4)
        feats = with_audio_features(clips).select("clip_id", "codec", "audio_codec")
        for r in feats.collect():
            i = int(r["clip_id"].rsplit("-", 1)[-1])
            if i > 0 and i % CORRUPT_BYTES_EVERY == 0:
                assert r["audio_codec"] is None
            elif i > 0 and i % BAD_CODEC_EVERY == 0:
                assert r["codec"] == "mp3_unknown"
                assert r["audio_codec"] == MIXED_CODECS[i % len(MIXED_CODECS)]
            else:
                assert r["audio_codec"] == r["codec"]


class TestCrossCodecTranscodeValidation:
    """The with_audio_features_vs use case its docstring advertises —
    validating a TRANSCODED corpus against the original bytes — now runs
    with genuinely distinct codings: corpus is G.711 μ-law, reference is
    the PCM16 original.  SNR must clear the 30 dB invariant for every
    intact row, and the probe must report the corpus coding (ulaw), not
    the reference's."""

    def test_ulaw_corpus_vs_pcm16_reference(self, spark):
        from pyspark.sql import functions as F

        from dataverifyr_spark.audio.rules import with_audio_features_vs

        n, sr = 40, 8000
        rows, refs = [], []
        for i in range(n):
            pcm = expected_pcm(i, sr, 4000)
            rows.append(
                (f"c-{i:04d}", bytearray(encode_wav(pcm, sr, "ulaw")), sr, 500,
                 "ulaw", f"t {i}")
            )
            refs.append(
                (f"c-{i:04d}", bytearray(encode_wav_pcm16(pcm, sr)), f"t {i}")
            )
        clips = spark.createDataFrame(
            rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
                  "codec string, transcript string",
        )
        expected = spark.createDataFrame(
            refs, "clip_id string, expected_bytes binary, expected_transcript string"
        )
        feats = with_audio_features_vs(clips, expected, broadcast_expected=True)
        got = feats.select("clip_id", "audio_codec", "audio_snr_db",
                           "audio_transcript_ok").collect()
        assert len(got) == n
        for r in got:
            assert r["audio_codec"] == "ulaw", r
            assert r["audio_snr_db"] is not None and r["audio_snr_db"] >= 30.0, r
            assert r["audio_transcript_ok"] is True, r

        # a clip transcoded at the WRONG rate (sr mismatch vs reference)
        # must fail the SNR rule, not silently compare misaligned samples
        bad = spark.createDataFrame(
            [("c-0000", bytearray(encode_wav(expected_pcm(0, 16000, 8000),
                                             16000, "ulaw")), 16000, 500,
              "ulaw", "t 0")],
            "clip_id string, bytes binary, sr_hz int, dur_ms int, "
            "codec string, transcript string",
        )
        bad_feats = with_audio_features_vs(bad, expected, broadcast_expected=True)
        row = bad_feats.select("audio_snr_db").collect()[0]
        assert row["audio_snr_db"] is None or row["audio_snr_db"] < 30.0


class TestAudioFeatureDrift:
    """north_star composition: distribution-drift of DECODED audio features
    (per-partition histogram + PSI/KS vs a persisted baseline snapshot) —
    the drift operator over the Arrow decode probe's output, grouped by the
    codec partition column.  A corpus where only the μ-law clips lost 12 dB
    of level must flag codec='ulaw' and leave the other codings clean."""

    @staticmethod
    def _corpus(spark, n, quiet_codec=None):
        rows = []
        for i in range(n):
            sr = 8000
            codec = MIXED_CODECS[i % len(MIXED_CODECS)]
            pcm = expected_pcm(i, sr, 2000)
            if codec == quiet_codec:
                pcm = pcm * 0.25  # −12 dB level drop: shifts the RMS histogram
            rows.append(
                (f"c-{i:05d}", bytearray(encode_wav(pcm, sr, codec)), sr, 250,
                 codec, f"t {i}")
            )
        return spark.createDataFrame(
            rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
                  "codec string, transcript string",
        )

    def test_rms_drift_flags_only_the_degraded_codec(self, spark, tmp_path):
        from dataverifyr_spark.operators.drift import drift_check, snapshot_baseline

        n, lo, hi, bins = 400, 0.0, 0.5, 16
        base = with_audio_features(self._corpus(spark, n))
        path = str(tmp_path / "rms_baseline")
        snapshot_baseline(base, "audio_rms", lo, hi, bins, path)
        baseline = spark.read.parquet(path)

        # same corpus, no perturbation → nothing drifts
        cur_same = with_audio_features(self._corpus(spark, n))
        global_clean = drift_check(cur_same, "audio_rms", baseline, lo, hi, bins).collect()[0]
        assert not global_clean["drifted"], global_clean

        # ulaw clips dropped 12 dB → global PSI rises AND the per-codec view
        # (baseline recomputed per codec from the same snapshot corpus)
        from dataverifyr_spark.operators.drift import histogram

        by_base = histogram(base, "audio_rms", lo, hi, bins, by="codec")
        cur_bad = with_audio_features(self._corpus(spark, n, quiet_codec="ulaw"))
        rows = {
            r["codec"]: r
            for r in drift_check(
                cur_bad, "audio_rms", by_base, lo, hi, bins, by="codec"
            ).collect()
        }
        assert rows["ulaw"]["drifted"], rows["ulaw"]
        for codec in ("pcm_s16le", "alaw", "pcm_u8", "pcm_f32le"):
            assert not rows[codec]["drifted"], (codec, rows[codec])


class TestAudioNearDup:
    """Cross-codec audio near-dup: spectral-profile fingerprint through the
    banded-LSH embedding machinery.  A re-encode under any supported codec
    must pair with its original; distinct tones must not."""

    def test_profile_cross_codec_invariance_and_separability(self):
        import pandas as pd

        from dataverifyr_spark.audio.fixtures import DUP_SR, dup_tone
        from dataverifyr_spark.audio.rules import _audio_band_profile_impl

        def prof(blob):
            return np.array(_audio_band_profile_impl(pd.Series([blob])).iloc[0])

        w = dup_tone(7)
        profs = [prof(encode_wav(w, DUP_SR, c)) for c in WAV_CODECS]
        for a in profs:
            for b in profs:
                assert float(np.dot(a, b)) >= 0.999  # same waveform, any codecs
        # adjacent tones (20 Hz apart) stay far below any dedup threshold
        pa = prof(encode_wav(dup_tone(3), DUP_SR, "pcm_s16le"))
        pb = prof(encode_wav(dup_tone(4), DUP_SR, "ulaw"))
        assert float(np.dot(pa, pb)) < 0.1

    def test_profile_null_on_undecodable(self):
        import pandas as pd

        from dataverifyr_spark.audio.rules import _audio_band_profile_impl

        out = _audio_band_profile_impl(pd.Series([b"garbage", None]))
        assert out.iloc[0] is None and out.iloc[1] is None

    def test_tone_aliasing_guard(self):
        from dataverifyr_spark.audio.fixtures import dup_tone

        with pytest.raises(ValueError, match="aliases"):
            dup_tone(100_000)

    def test_pairs_exactly_match_injection_cadence(self, spark):
        from dataverifyr_spark.audio.fixtures import (
            CORRUPT_BYTES_EVERY,
            DUP_EVERY,
            dup_codec_clips_table,
        )
        from dataverifyr_spark.audio.rules import audio_near_dup_pairs

        n = 90
        clips = dup_codec_clips_table(spark, n, num_partitions=4)
        stats = {}
        got = {
            (r["id_a"], r["id_b"])
            for r in audio_near_dup_pairs(clips, stats=stats).collect()
        }

        def cid(i):
            return f"clip-{i:012d}"

        corrupt = {i for i in range(1, n) if i % CORRUPT_BYTES_EVERY == 0}
        exp = {
            (cid(i - 1), cid(i))
            for i in range(1, n)
            if i % DUP_EVERY == DUP_EVERY - 1
            and i not in corrupt
            and (i - 1) not in corrupt
        }
        assert got == exp
        assert stats == {"n_buckets_dropped": 0, "n_rows_dropped": 0}
