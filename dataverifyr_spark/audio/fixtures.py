"""Deterministic clips-table fixture (FIXTURES.md F1, BASELINE.json
input_hint schema: clip_id, bytes, sr_hz, dur_ms, codec, transcript).

Every cell derives from the row index through splitmix64, so driver, executor
and test can independently regenerate the expected waveform and transcript
for any clip_id — the basis of the per-row invariant (decoded-PCM allclose
SNR≥30dB + transcript equality) and of resume-safe verification at scale.
Violations are injected at deterministic indices for rule goldens.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.similarity import hash_u64
from .wav import encode_wav, encode_wav_pcm16

__all__ = [
    "clips_table",
    "mixed_codec_clips_table",
    "quality_clips_table",
    "MIXED_CODECS",
    "expected_table",
    "expected_pcm",
    "expected_transcript",
    "clip_index",
    "CLIP_SCHEMA",
    "EXPECTED_SCHEMA",
]

SAMPLE_RATES = (8000, 16000, 44100, 48000)
_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu"
).split()

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)

# violation injection cadence (deterministic, index-based)
BAD_SR_EVERY = 17  # sr_hz column lies about the true rate
BAD_DUR_EVERY = 23  # dur_ms off by +1500ms
BAD_CODEC_EVERY = 29  # unknown codec string
EMPTY_TRANSCRIPT_EVERY = 31
NULL_TRANSCRIPT_EVERY = 37
CORRUPT_BYTES_EVERY = 41  # truncated container


def clip_index(clip_id: str) -> int:
    return int(clip_id.rsplit("-", 1)[-1])


def _rng(i: int, stream: int) -> float:
    """Deterministic uniform [0,1) from (row index, stream id)."""
    return hash_u64(i * 1_000_003 + stream) / 2**64


def _sin_ramp(w: float, phase: float, n: int) -> np.ndarray:
    """``sin(phase + w·k)`` for k = 0..n-1 via block angle addition:
    ``sin(A + b) = sin A cos b + cos A sin b`` with A over block starts and b
    within one block — O(√n + B) transcendental evaluations plus 3 flops per
    sample, against one ``np.sin`` per sample for the direct form.  Both
    factors come from ``np.sin``/``np.cos`` themselves, so the identity is
    exact to ~1 ulp (no recurrence drift).  Measured 183 µs → ~55 µs per
    12k-sample clip — the regenerated-waveform SNR probe evaluates this for
    every clip it validates, where it was 2/3 of the per-clip compute
    (guide §1.2 step 2: per-task work)."""
    B = 256
    q = (n + B - 1) // B
    inner = np.arange(B, dtype=np.float64) * w
    sb, cb = np.sin(inner), np.cos(inner)
    base = phase + np.arange(q, dtype=np.float64) * (B * w)
    sa, ca = np.sin(base), np.cos(base)
    return (sa[:, None] * cb[None, :] + ca[:, None] * sb[None, :]).ravel()[:n]


def expected_pcm(i: int, sr_hz: int, n_samples: int) -> np.ndarray:
    """The canonical waveform for row i: two sines + low-level deterministic
    noise, amplitude well inside [-1, 1].

    r7: noise comes from ``np.random.default_rng`` (PCG64) instead of the
    legacy ``RandomState`` — identical distribution and determinism, but
    generator construction drops ~240 µs per call (MT19937 seeds a 624-word
    state; the probe constructs one generator per validated clip).  Encoder
    (:func:`_make_row` family) and regenerating probe share THIS function,
    so the waveform change is self-consistent: every SNR/quality/spectral
    verdict and its index-arithmetic oracle are unchanged."""
    f1 = 100.0 + 150.0 * _rng(i, 1)  # 100-250 Hz
    f2 = 300.0 + 500.0 * _rng(i, 2)  # 300-800 Hz
    phase = 2.0 * math.pi * _rng(i, 3)
    noise_seed = hash_u64(i * 31 + 7) & 0xFFFFFFFF
    noise = np.random.default_rng(noise_seed).uniform(-0.01, 0.01, n_samples)
    w1 = 2.0 * math.pi * f1 / sr_hz
    w2 = 2.0 * math.pi * f2 / sr_hz
    out = _sin_ramp(w1, phase, n_samples)
    out *= 0.45
    out += 0.25 * _sin_ramp(w2, 0.0, n_samples)
    out += noise
    return out


def expected_transcript(i: int) -> str:
    n_words = 3 + int(_rng(i, 4) * 10)
    return " ".join(_VOCAB[hash_u64(i * 53 + w) % len(_VOCAB)] for w in range(n_words))


def _make_row(i: int) -> tuple:
    sr = SAMPLE_RATES[i % len(SAMPLE_RATES)]
    true_dur_ms = 200 + int(_rng(i, 5) * 800)  # 200-1000 ms
    n_samples = int(round(sr * true_dur_ms / 1000.0))
    pcm = expected_pcm(i, sr, n_samples)
    blob = encode_wav_pcm16(pcm, sr)

    sr_col = sr
    dur_col = true_dur_ms
    codec = "pcm_s16le"
    transcript: str | None = expected_transcript(i)

    if i > 0 and i % BAD_SR_EVERY == 0:
        sr_col = 12345
    if i > 0 and i % BAD_DUR_EVERY == 0:
        dur_col = true_dur_ms + 1500
    if i > 0 and i % BAD_CODEC_EVERY == 0:
        codec = "mp3_unknown"
    if i > 0 and i % EMPTY_TRANSCRIPT_EVERY == 0:
        transcript = ""
    if i > 0 and i % NULL_TRANSCRIPT_EVERY == 0:
        transcript = None
    if i > 0 and i % CORRUPT_BYTES_EVERY == 0:
        blob = blob[: len(blob) // 3]

    return (f"clip-{i:012d}", bytearray(blob), sr_col, dur_col, codec, transcript)


def clips_table(
    spark: SparkSession, n: int = 200, num_partitions: int | None = None
) -> DataFrame:
    """Generate the clips fixture distributed: rows are built on executors
    from a range (no driver-side list of audio blobs), so the same generator
    scales from the 200-row pytest fixture to a multi-million-row bench input."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(_make_row)
    return spark.createDataFrame(rdd, CLIP_SCHEMA)


# codec cycle for the mixed-codec corpus: every supported WAVE coding
# (linear PCM 16/8-bit, IEEE float32, ITU-T G.711 μ-law/A-law) — all decode
# to linear int16, and all keep the fixture waveform's round-trip SNR well
# above the 30 dB invariant (worst: μ-law ≈37 dB; measured, see
# tests/test_audio_codecs.py)
MIXED_CODECS = ("pcm_s16le", "ulaw", "alaw", "pcm_u8", "pcm_f32le")


def _make_mixed_row(i: int) -> tuple:
    """Row i of the mixed-codec corpus: same waveform, transcript and
    violation cadences as :func:`_make_row`, but the encoding cycles through
    ``MIXED_CODECS`` and the ``codec`` column records the TRUE coding (except
    the every-29th liar row, unchanged from the base fixture) — so a
    ``audio_codec(bytes) == codec`` header-consistency rule has a
    deterministic, index-computable verdict for every row."""
    sr = SAMPLE_RATES[i % len(SAMPLE_RATES)]
    true_dur_ms = 200 + int(_rng(i, 5) * 800)
    n_samples = int(round(sr * true_dur_ms / 1000.0))
    pcm = expected_pcm(i, sr, n_samples)
    true_codec = MIXED_CODECS[i % len(MIXED_CODECS)]
    blob = encode_wav(pcm, sr, true_codec)

    sr_col = sr
    dur_col = true_dur_ms
    codec = true_codec
    transcript: str | None = expected_transcript(i)

    if i > 0 and i % BAD_SR_EVERY == 0:
        sr_col = 12345
    if i > 0 and i % BAD_DUR_EVERY == 0:
        dur_col = true_dur_ms + 1500
    if i > 0 and i % BAD_CODEC_EVERY == 0:
        codec = "mp3_unknown"
    if i > 0 and i % EMPTY_TRANSCRIPT_EVERY == 0:
        transcript = ""
    if i > 0 and i % NULL_TRANSCRIPT_EVERY == 0:
        transcript = None
    if i > 0 and i % CORRUPT_BYTES_EVERY == 0:
        blob = blob[: len(blob) // 3]

    return (f"clip-{i:012d}", bytearray(blob), sr_col, dur_col, codec, transcript)


def mixed_codec_clips_table(
    spark: SparkSession, n: int = 200, num_partitions: int | None = None
) -> DataFrame:
    """:func:`clips_table` with the encoding cycling through every supported
    codec (``MIXED_CODECS``) and an honest-except-every-29th ``codec``
    column — the corpus for codec-consistency validation."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(_make_mixed_row)
    return spark.createDataFrame(rdd, CLIP_SCHEMA)


# re-encoded-duplicate corpus: fixed geometry so every clip yields the same
# spectrum length, tones 20 Hz apart so distinct clips are separable at the
# clip's 2 Hz FFT resolution (0.5 s at 16 kHz) — the spectral fingerprint's
# documented separability floor.  16 kHz Nyquist bounds the corpus at ~350
# distinct tones; dup_tone raises past 0.45·sr rather than silently alias
# (an aliased tone folds onto another clip's frequency and breaks the
# pair-set determinism the gate oracle depends on)
DUP_SR = 16000
DUP_N_SAMPLES = 8000  # 500 ms
DUP_EVERY = 3  # every 3rd clip re-encodes the PREVIOUS clip's waveform
DUP_BASE_HZ = 100.0
DUP_STEP_HZ = 20.0


def dup_tone(j: int) -> np.ndarray:
    """Waveform of source j in the re-encoded-duplicate corpus: a unique
    tone (100 + 20·j Hz) plus seeded noise 40 dB down — deterministic, so
    driver/executor/test regenerate it independently."""
    t = np.arange(DUP_N_SAMPLES, dtype=np.float64) / DUP_SR
    freq = DUP_BASE_HZ + DUP_STEP_HZ * j
    if freq >= 0.45 * DUP_SR:
        raise ValueError(
            f"dup corpus source {j}: tone {freq} Hz aliases at sr={DUP_SR} "
            f"(max ~{int((0.45 * DUP_SR - DUP_BASE_HZ) / DUP_STEP_HZ)} sources)"
        )
    rng = np.random.default_rng(hash_u64(0xD0B0 + j) & 0x7FFFFFFF)
    return 0.6 * np.sin(2 * math.pi * freq * t) + 0.006 * rng.standard_normal(
        DUP_N_SAMPLES
    )


def _make_dup_row(i: int) -> tuple:
    """Row i of the re-encoded-duplicate corpus: every ``DUP_EVERY``-th clip
    carries the PREVIOUS clip's waveform re-encoded in a DIFFERENT codec
    (cycled), so byte-exact dedup cannot pair them but any decode-level
    fingerprint must.  Every 41st container is truncated (same
    CORRUPT_BYTES_EVERY cadence as F1), removing its pairs — all of which
    is pure index arithmetic for the oracle."""
    src = i - 1 if (i % DUP_EVERY == DUP_EVERY - 1 and i > 0) else i
    pcm = dup_tone(src)
    codec = MIXED_CODECS[i % len(MIXED_CODECS)]
    blob = encode_wav(pcm, DUP_SR, codec)
    if i > 0 and i % CORRUPT_BYTES_EVERY == 0:
        blob = blob[: len(blob) // 3]
    dur_ms = int(round(DUP_N_SAMPLES / DUP_SR * 1000))
    return (f"clip-{i:012d}", bytearray(blob), DUP_SR, dur_ms, codec, f"tone {src}")


def dup_codec_clips_table(
    spark: SparkSession, n: int = 150, num_partitions: int | None = None
) -> DataFrame:
    """Corpus for cross-codec audio near-dup detection: clip i where
    ``i % 3 == 2`` is a byte-DIFFERENT re-encode of clip i−1's waveform
    (different codec), everything else is a unique tone.  True duplicate
    pairs are exactly {(i−1, i) : i%3==2, neither container corrupt}."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(_make_dup_row)
    return spark.createDataFrame(rdd, CLIP_SCHEMA)


# signal-quality defect cadences (quality_clips_table).  Margins measured
# over the full i in [0, 2000) range (tests/test_audio_quality.py pins them):
# clean rows have clip_ratio == 0, |dc| <= 0.007, peak <= 0.71, rms >= 0.36;
# clipped rows clip_ratio >= 0.46 and peak == 1.0; dc rows |dc| >= 0.24;
# quiet rows rms <= 0.015 — every rule threshold sits >3x from both sides.
CLIPPED_EVERY = 19  # x4 gain -> encoder hard-clips at full scale
DC_OFFSET_EVERY = 43  # +0.25 DC bias
QUIET_EVERY = 47  # x0.01 gain -> inaudible (defeats clip/dc physically)


def _make_quality_row(i: int) -> tuple:
    """Row i of the signal-quality corpus: the F1 waveform with gain/bias
    defects injected at deterministic cadences (DC first, then gain, then
    attenuation — so a quiet re-take of a clipped clip is genuinely quiet,
    and the oracle's effective flags are (clipped AND NOT quiet) etc., still
    pure index arithmetic).  Metadata columns are honest; every 41st
    container is truncated (same CORRUPT_BYTES_EVERY as F1)."""
    sr = SAMPLE_RATES[i % len(SAMPLE_RATES)]
    true_dur_ms = 200 + int(_rng(i, 5) * 800)
    n_samples = int(round(sr * true_dur_ms / 1000.0))
    pcm = expected_pcm(i, sr, n_samples)
    if i > 0 and i % DC_OFFSET_EVERY == 0:
        pcm = pcm + 0.25
    if i > 0 and i % CLIPPED_EVERY == 0:
        pcm = pcm * 4.0  # encode_wav clips to [-1, 1] -> samples pin at 32767
    if i > 0 and i % QUIET_EVERY == 0:
        pcm = pcm * 0.01
    blob = encode_wav_pcm16(pcm, sr)
    if i > 0 and i % CORRUPT_BYTES_EVERY == 0:
        blob = blob[: len(blob) // 3]
    return (
        f"clip-{i:012d}", bytearray(blob), sr, true_dur_ms, "pcm_s16le",
        expected_transcript(i),
    )


def quality_clips_table(
    spark: SparkSession, n: int = 200, num_partitions: int | None = None
) -> DataFrame:
    """Corpus for signal-quality validation (clipping / DC bias / silence):
    same distributed generator pattern as :func:`clips_table`."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(_make_quality_row)
    return spark.createDataFrame(rdd, CLIP_SCHEMA)


# transcript-defect cadences (transcript_clips_table).  Applied in this
# order, later overriding earlier — the oracle's effective flags mirror the
# same priority (null > empty > garbage > typo > overlong).  Margins (pinned
# in tests/test_transcripts.py): clean speaking rate <= 11 words/s vs the
# 30 w/s rule threshold; overlong rows >= 120 w/s; typo rows sit at edit
# distance exactly 1 vs the <= 2 CER bound; garbage rows >= 40 (alphabet
# disjoint from the vocab, so LCS = 0).
OVERLONG_TRANSCRIPT_EVERY = 53  # 120-word caption on a <=1 s clip
TYPO_TRANSCRIPT_EVERY = 59  # one substituted char (bounded ASR noise)
GARBAGE_TRANSCRIPT_EVERY = 61  # 40 chars disjoint from the vocab alphabet


def rate_transcript(i: int) -> str:
    """Canonical duration-linked transcript for row i of the transcript
    corpus: word count = 1 + floor(dur_s * rate) with rate in [2, 6) words/s,
    so every clean row speaks at most 1/dur_s + 6 <= 11 words/s (dur >=
    200 ms) — 2.7x under the 30 w/s plausibility threshold."""
    dur_s = (200 + int(_rng(i, 5) * 800)) / 1000.0
    rate = 2.0 + 4.0 * _rng(i, 6)
    n_words = 1 + int(dur_s * rate)
    return " ".join(_VOCAB[hash_u64(i * 67 + w) % len(_VOCAB)] for w in range(n_words))


def _make_transcript_row(i: int) -> tuple:
    """Row i of the transcript-defect corpus: honest audio + metadata (the
    family under test is pure-Catalyst transcript rules — no decode), with
    caption defects injected at deterministic cadences.  Defects REPLACE the
    canonical transcript, later cadence winning, so every rule verdict is
    index arithmetic for the oracle."""
    sr = SAMPLE_RATES[i % len(SAMPLE_RATES)]
    true_dur_ms = 200 + int(_rng(i, 5) * 800)
    n_samples = int(round(sr * true_dur_ms / 1000.0))
    blob = encode_wav_pcm16(expected_pcm(i, sr, n_samples), sr)

    transcript: str | None = rate_transcript(i)
    if i > 0 and i % OVERLONG_TRANSCRIPT_EVERY == 0:
        transcript = " ".join(
            _VOCAB[hash_u64(i * 71 + w) % len(_VOCAB)] for w in range(120)
        )
    if i > 0 and i % TYPO_TRANSCRIPT_EVERY == 0:
        transcript = "Q" + rate_transcript(i)[1:]  # 'Q' never in the vocab
    if i > 0 and i % GARBAGE_TRANSCRIPT_EVERY == 0:
        transcript = "#" * 40
    if i > 0 and i % EMPTY_TRANSCRIPT_EVERY == 0:
        transcript = ""
    if i > 0 and i % NULL_TRANSCRIPT_EVERY == 0:
        transcript = None

    return (f"clip-{i:012d}", bytearray(blob), sr, true_dur_ms, "pcm_s16le", transcript)


def transcript_clips_table(
    spark: SparkSession, n: int = 200, num_partitions: int | None = None
) -> DataFrame:
    """Corpus for transcript-side validation (speaking-rate plausibility,
    CER-bounded equality, exact equality, non-emptiness): same distributed
    generator pattern as :func:`clips_table`."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(
        _make_transcript_row
    )
    return spark.createDataFrame(rdd, CLIP_SCHEMA)


TRANSCRIPT_EXPECTED_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("expected_transcript", T.StringType(), True),
    ]
)


def transcript_expected_table(
    spark: SparkSession, n: int = 200, num_partitions: int | None = None
) -> DataFrame:
    """Reference captions matching :func:`transcript_clips_table` — the
    originals table a real corpus persists; transcript rules join against it
    (data-scale equi-join on clip_id, never a broadcast assumption)."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(
        lambda i: (f"clip-{i:012d}", rate_transcript(i))
    )
    return spark.createDataFrame(rdd, TRANSCRIPT_EXPECTED_SCHEMA)


EXPECTED_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("expected_bytes", T.BinaryType(), True),
        T.StructField("expected_transcript", T.StringType(), True),
    ]
)


def _make_expected_row(i: int) -> tuple:
    """The REFERENCE row for clip i: the canonical waveform encoded clean
    (no violation injection) + the canonical transcript — what a real corpus
    would persist as its originals table."""
    sr = SAMPLE_RATES[i % len(SAMPLE_RATES)]
    true_dur_ms = 200 + int(_rng(i, 5) * 800)
    n_samples = int(round(sr * true_dur_ms / 1000.0))
    blob = encode_wav_pcm16(expected_pcm(i, sr, n_samples), sr)
    return (f"clip-{i:012d}", bytearray(blob), expected_transcript(i))


def expected_table(
    spark: SparkSession, n: int = 200, num_partitions: int | None = None
) -> DataFrame:
    """Distributed reference table matching :func:`clips_table` — feeds
    ``with_audio_features_vs`` so expectation checks need no generator at
    validation time."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(_make_expected_row)
    return spark.createDataFrame(rdd, EXPECTED_SCHEMA)


def allowed_codecs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("pcm_s16le",), ("flac",)], T.StructType([T.StructField("codec", T.StringType(), False)])
    )
