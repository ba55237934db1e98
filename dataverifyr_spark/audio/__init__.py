"""Audio payload support: WAV/PCM16 codec (pure numpy), deterministic clip
fixtures, and Arrow-batched pandas-UDF rules over binary audio columns."""

from .fixtures import (
    allowed_codecs,
    clips_table,
    expected_pcm,
    expected_table,
    expected_transcript,
)
from .rules import (
    audio_ruleset,
    register_audio_functions,
    with_audio_features,
    with_audio_features_vs,
)
from .wav import decode_wav, encode_wav_pcm16, snr_db

__all__ = [
    "encode_wav_pcm16",
    "decode_wav",
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
]
