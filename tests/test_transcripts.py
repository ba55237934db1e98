"""Transcript-side validation: n_words/edit_distance dialect functions,
speaking-rate + CER rules, fixture margins, and plan shape (pure Catalyst —
no Python in the fused scan)."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import dataverifyr_spark as dv
from dataverifyr_spark.audio import (
    rate_transcript,
    transcript_clips_table,
    transcript_expected_table,
    transcript_ruleset,
    with_expected_transcript,
)
from dataverifyr_spark.audio.fixtures import (
    EMPTY_TRANSCRIPT_EVERY,
    GARBAGE_TRANSCRIPT_EVERY,
    NULL_TRANSCRIPT_EVERY,
    OVERLONG_TRANSCRIPT_EVERY,
    TYPO_TRANSCRIPT_EVERY,
    _rng,
)
from dataverifyr_spark.expr import compile_expr, to_sql

N = 2000


def _flags(i: int) -> dict:
    """The oracle's effective defect flags (priority: null > empty >
    garbage > typo > overlong) — mirrors the fixture's if-chain order."""
    null_t = i > 0 and i % NULL_TRANSCRIPT_EVERY == 0
    empty_t = i > 0 and i % EMPTY_TRANSCRIPT_EVERY == 0 and not null_t
    garbage = i > 0 and i % GARBAGE_TRANSCRIPT_EVERY == 0 and not (empty_t or null_t)
    typo = (
        i > 0
        and i % TYPO_TRANSCRIPT_EVERY == 0
        and not (garbage or empty_t or null_t)
    )
    overlong = (
        i > 0
        and i % OVERLONG_TRANSCRIPT_EVERY == 0
        and not (typo or garbage or empty_t or null_t)
    )
    return {
        "null_t": null_t, "empty_t": empty_t, "garbage": garbage,
        "typo": typo, "overlong": overlong,
    }


class TestDialectFunctions:
    def test_n_words_contract(self, spark):
        df = spark.createDataFrame(
            [("a b  c",), ("  x ",), ("",), ("   ",), (None,), ("one",)],
            ["s"],
        )
        col = compile_expr("n_words(s)").column
        got = [r[0] for r in df.select(col.alias("n")).collect()]
        assert got == [3, 1, 0, 0, None, 1]

    def test_edit_distance_contract(self, spark):
        df = spark.createDataFrame(
            [("abc", "qbc"), ("abc", "abc"), ("", "abcd"), (None, "x"), ("x", None)],
            ["a", "b"],
        )
        col = compile_expr("edit_distance(a, b)").column
        got = [r[0] for r in df.select(col.alias("d")).collect()]
        assert got == [1, 0, 4, None, None]

    def test_sql_emitters_match_spark(self, spark):
        """The ANSI emission of both functions computes the same values in
        DuckDB as the Column compilation does in Spark — the cross-engine
        contract every dialect builtin carries."""
        rows = [
            ("a b  c", "a b c"), ("", "x"), ("   ", "y z"), (None, "q"),
            ("hello world", "hello w0rld"), ("x", None),
        ]
        df = spark.createDataFrame(rows, ["s", "t"])
        nw_col = compile_expr("n_words(s)").column
        ed_col = compile_expr("edit_distance(s, t)").column
        spark_vals = [
            (r[0], r[1])
            for r in df.select(nw_col.alias("n"), ed_col.alias("d")).collect()
        ]
        con = duckdb.connect()
        nw_sql = to_sql("n_words(s)")
        ed_sql = to_sql("edit_distance(s, t)")
        duck_vals = [
            con.execute(
                f"SELECT {nw_sql}, {ed_sql} FROM (SELECT ? AS s, ? AS t)", [s, t]
            ).fetchone()
            for s, t in rows
        ]
        assert spark_vals == duck_vals

    def test_symbols_extracted(self):
        # appearance order, like the reference's all.vars (R/rule.R:78-81)
        assert dv.get_symbols("edit_distance(transcript, expected) <= 2") == [
            "transcript",
            "expected",
        ]
        assert dv.get_symbols("n_words(transcript) / (dur_ms / 1000.0) <= 30") == [
            "transcript",
            "dur_ms",
        ]


class TestFixtureMargins:
    def test_rate_margins(self):
        """Clean rows speak well under the threshold; overlong rows far
        over — >2.5x on both sides of 30 w/s, over the full gate range."""
        worst_clean, best_overlong = 0.0, float("inf")
        for i in range(N):
            dur_s = (200 + int(_rng(i, 5) * 800)) / 1000.0
            f = _flags(i)
            if f["overlong"]:
                best_overlong = min(best_overlong, 120 / dur_s)
            elif not any(f.values()):
                n = len(rate_transcript(i).split())
                worst_clean = max(worst_clean, n / dur_s)
        assert worst_clean <= 11.5 < 30 / 2.5
        assert best_overlong >= 120 > 30 * 2.5

    def test_typo_is_distance_one(self):
        for i in range(1, N):
            f = _flags(i)
            if f["typo"]:
                t = rate_transcript(i)
                assert t[0] != "Q"  # vocab is lowercase: substitution is real
                assert len(t) >= 1

    def test_expected_min_word_length(self):
        for i in range(N):
            words = rate_transcript(i).split()
            assert len(words) >= 1
            assert min(len(w) for w in words) >= 4  # empty caption distance >= 4 > 2


class TestTranscriptRules:
    @pytest.fixture(scope="class")
    def summary(self, spark):
        clips = transcript_clips_table(spark, N)
        expected = transcript_expected_table(spark, N)
        joined = with_expected_transcript(clips, expected)
        rows = dv.check_data(joined, transcript_ruleset()).collect()
        return {r["name"]: r for r in rows}

    def test_counts_match_cadence_arithmetic(self, summary):
        exp_fail = {
            "transcript_nonempty": 0, "rate_plausible": 0,
            "cer_bounded": 0, "transcript_exact": 0,
        }
        for i in range(N):
            f = _flags(i)
            if f["empty_t"] or f["null_t"]:
                exp_fail["transcript_nonempty"] += 1
            if f["overlong"] or f["null_t"]:
                exp_fail["rate_plausible"] += 1
            if f["garbage"] or f["overlong"] or f["empty_t"] or f["null_t"]:
                exp_fail["cer_bounded"] += 1
            if any(f.values()):
                exp_fail["transcript_exact"] += 1
        for name, want in exp_fail.items():
            assert summary[name]["tests"] == N
            assert summary[name]["fail"] == want, name
            assert summary[name]["pass"] == N - want, name

    def test_cer_passes_typo_rows_exact_does_not(self, summary):
        """The reason the graded rule exists: bounded edit distance keeps
        single-char-noise captions that exact equality throws away."""
        n_typo = sum(1 for i in range(N) if _flags(i)["typo"])
        assert n_typo > 0
        assert summary["transcript_exact"]["fail"] - summary["cer_bounded"]["fail"] == n_typo

    def test_missing_reference_row_fails_not_vanishes(self, spark):
        """Left join: a clip absent from the captions table stays in
        `tests` and fails the equality rules (NA-fails), instead of being
        dropped by an inner join."""
        clips = transcript_clips_table(spark, 50)
        expected = transcript_expected_table(spark, 40)  # last 10 missing
        joined = with_expected_transcript(clips, expected)
        rows = dv.check_data(joined, transcript_ruleset()).collect()
        by = {r["name"]: r for r in rows}
        assert by["transcript_exact"]["tests"] == 50
        exact_fail_40 = sum(1 for i in range(40) if any(_flags(i).values()))
        assert by["transcript_exact"]["fail"] == exact_fail_40 + 10


class TestPlanShape:
    def test_no_python_and_pruned_scan(self, spark, tmp_path):
        """Over parquet: the fused transcript check reads only the rule
        columns + join key (audio bytes never read) and runs with zero
        Python evals — the property that makes this family free at corpus
        scale (contrast: decode rules pay one ArrowEvalPython pass)."""
        import contextlib
        import io

        from dataverifyr_spark.check import compile_rule_predicate

        clips_path = str(tmp_path / "clips")
        exp_path = str(tmp_path / "expected")
        transcript_clips_table(spark, 200).write.parquet(clips_path)
        transcript_expected_table(spark, 200).write.parquet(exp_path)
        joined = with_expected_transcript(
            spark.read.parquet(clips_path), spark.read.parquet(exp_path)
        )
        preds = [compile_rule_predicate(r).column for r in transcript_ruleset()]
        agg = joined.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.when(p, 1).otherwise(0)).alias(f"p{i}") for i, p in enumerate(preds)],
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain(True)
        phys = buf.getvalue().split("== Physical Plan ==")[-1]
        assert "ArrowEvalPython" not in phys and "BatchEvalPython" not in phys
        schemas = [ln for ln in phys.splitlines() if "ReadSchema" in ln]
        assert schemas, phys
        for ln in schemas:
            assert "bytes" not in ln, ln  # binary column pruned from every scan


class TestJoinGuards:
    def test_preexisting_expected_column_rejected(self, spark):
        clips = transcript_clips_table(spark, 10).withColumn(
            "expected_transcript", F.lit("x")
        )
        expected = transcript_expected_table(spark, 10)
        with pytest.raises(ValueError, match="expected_transcript"):
            with_expected_transcript(clips, expected)


class TestCorpusCompositions:
    def test_duplicate_captions_found_by_exact_dedup(self, spark):
        """Text dedup machinery over the AUDIO corpus: captions reused
        across clips (the boilerplate-subtitle problem) surface via the
        fingerprint groupBy with transcript as the text column."""
        from pyspark.sql import functions as F

        from dataverifyr_spark.operators.dedup import exact_dup_groups

        clips = transcript_clips_table(spark, 200)
        # duplicate the caption of clip 1 onto every 10th clip
        dup = clips.withColumn(
            "transcript",
            F.when(
                F.substring("clip_id", -4, 4).cast("int") % 10 == 0,
                F.lit(rate_transcript(1)),
            ).otherwise(F.col("transcript")),
        ).filter(F.col("transcript").isNotNull())
        groups = exact_dup_groups(dup, text_col="transcript", id_col="clip_id")
        big = groups.filter("n_copies >= 20").collect()
        # i=0,10,...,190 (20 recipients) + clip 1, the caption's own donor
        assert len(big) == 1 and big[0]["n_copies"] == 21

    def test_suggest_rules_on_input_hint_schema(self, spark):
        """Rule induction straight over the north-rule clips table: the
        induced set must carry the sr_hz value-set, dur_ms bounds, the
        clip_id PK draft, and allow_na on the NULL-bearing transcript."""
        import dataverifyr_spark as dv

        clips = transcript_clips_table(spark, 300).drop("bytes")
        rs = dv.suggest_rules(clips)
        by_expr = {r.expr: r for r in rs}
        # numeric columns induce bounds; the codec string induces a value set
        assert any(e.startswith("sr_hz >= 8000") for e in by_expr), list(by_expr)
        assert any(e.startswith("dur_ms >=") for e in by_expr)
        assert any("codec %in%" in e for e in by_expr), list(by_expr)
        from dataverifyr_spark.rules import UniquenessRule

        assert any(
            isinstance(r, UniquenessRule) and r.unique_cols == ("clip_id",) for r in rs
        ) or any(
            isinstance(r, UniquenessRule) and list(r.unique_cols) == ["clip_id"] for r in rs
        )
        # induced rules validate the trusted slice clean
        res = dv.check_data(clips, rs)
        assert all(r["fail"] == 0 for r in res.collect())
