"""Transcript-side validation for audio clip + transcript pairs.

The north-rule table pairs every clip with a caption; decode-level rules
(audio/rules.py) validate the waveform, and THIS family validates the text
against it and against a reference-captions table — all in the same
reference rule dialect (R/rule.R:42-62 semantics: negate/allow_na, NA fails)
and all pure Catalyst:

    transcript_nonempty   nchar(trimws(transcript)) > 0
    rate_plausible        n_words(transcript) / (dur_ms / 1000.0) <= max_wps
    cer_bounded           edit_distance(transcript, expected_transcript) <= k
    transcript_exact      transcript == expected_transcript

``n_words`` is split/size and ``edit_distance`` is ``F.levenshtein`` — both
JVM-side, inside whole-stage codegen, so the whole ruleset fuses into the
ONE-scan conditional aggregate of ``check_data`` with zero Python in the hot
path (contrast: the decode rules need one ArrowEvalPython pass).  The
graded ``cer_bounded`` rule is the reason this family exists beyond exact
equality: a caption with one substituted character (ASR noise, encoding
slip) is usable training data; a garbage caption is not.  Exact equality
can't tell them apart — a bounded edit distance can.

Scale design: the expected-captions join is a plain equi-join on clip_id
(both sides are data-scale at 10^12 clips — never broadcast by assumption;
AQE picks broadcast when the reference side really is small).  The rules
reference only (transcript, dur_ms, expected_transcript), so the parquet
ReadSchema prunes to 3 columns + the join key — audio bytes are never
shuffled or even read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["transcript_ruleset", "with_expected_transcript"]


def with_expected_transcript(
    clips: DataFrame,
    expected: DataFrame,
    on: str = "clip_id",
    expected_col: str = "expected_transcript",
) -> DataFrame:
    """Join the reference-captions table onto the clips table.

    Left join: a clip missing from the reference table keeps a NULL
    ``expected_transcript`` and so FAILS the equality rules (NA-fails
    contract, R/check_data.R:277-280) instead of silently vanishing from
    ``tests`` — at corpus scale, losing rows in an inner join is an
    undercount bug, not a validation outcome."""
    if expected_col in clips.columns:
        # an ambiguous column would surface later as AMBIGUOUS_REFERENCE
        # inside rule compilation — fail here with an actionable message
        raise ValueError(
            f"clips already has a column named {expected_col!r}; "
            "drop/rename it or pass a different expected_col"
        )
    ref = expected.select(on, expected_col)
    return clips.join(ref, on=on, how="left")


def transcript_ruleset(
    max_words_per_sec: float = 30.0,
    max_edit_distance: int = 2,
    expected_col: str = "expected_transcript",
):
    """Caption-validation rules over ``with_expected_transcript`` output.

    ``max_words_per_sec``: speaking-rate plausibility ceiling.  Human speech
    tops out around 5-8 words/s; 30 flags only physically impossible
    captions (spam, misaligned segment boundaries) without judging fast
    talkers.  ``max_edit_distance``: the CER-style tolerance — 0 degenerates
    to exact equality; 2 tolerates single-char ASR/encoding noise."""
    from ..rules import rule, ruleset

    return ruleset(
        rule("nchar(trimws(transcript)) > 0", name="transcript_nonempty"),
        rule(
            f"n_words(transcript) / (dur_ms / 1000.0) <= {max_words_per_sec}",
            name="rate_plausible",
        ),
        rule(
            f"edit_distance(transcript, {expected_col}) <= {max_edit_distance}",
            name="cer_bounded",
        ),
        rule(f"transcript == {expected_col}", name="transcript_exact"),
    )
