"""Audio payload support: WAV codec family (linear PCM 8/16-bit, IEEE
float32, ITU-T G.711 A-law/μ-law — pure numpy), deterministic clip fixtures,
and Arrow-batched pandas-UDF rules over binary audio columns."""

from .fixtures import (
    MIXED_CODECS,
    allowed_codecs,
    clips_table,
    dup_codec_clips_table,
    mixed_codec_clips_table,
    quality_clips_table,
    expected_pcm,
    expected_table,
    expected_transcript,
    rate_transcript,
    transcript_clips_table,
    transcript_expected_table,
)
from .rules import (
    audio_near_dup_pairs,
    with_audio_band_profile,
    audio_ruleset,
    audio_quality_ruleset,
    register_audio_functions,
    with_audio_features,
    with_audio_features_vs,
)
from .curate import curate_clips
from .transcripts import transcript_ruleset, with_expected_transcript
from .wav import WAV_CODECS, decode_wav, decode_wav_info, encode_wav, encode_wav_pcm16, snr_db

__all__ = [
    "encode_wav_pcm16",
    "encode_wav",
    "decode_wav",
    "decode_wav_info",
    "WAV_CODECS",
    "MIXED_CODECS",
    "mixed_codec_clips_table",
    "dup_codec_clips_table",
    "with_audio_band_profile",
    "audio_near_dup_pairs",
    "snr_db",
    "clips_table",
    "expected_table",
    "allowed_codecs",
    "expected_pcm",
    "expected_transcript",
    "register_audio_functions",
    "with_audio_features",
    "with_audio_features_vs",
    "audio_ruleset",
    "audio_quality_ruleset",
    "quality_clips_table",
    "rate_transcript",
    "transcript_clips_table",
    "transcript_expected_table",
    "transcript_ruleset",
    "with_expected_transcript",
    "curate_clips",
]
