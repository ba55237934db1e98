"""Kitchen-sink integration: schema declarations + expression rules (plain /
negate / allow_na / coercion / error) + reference rule + audio UDF rules in
ONE check_data call over the clips fixture, then violations + ledger on the
same ruleset."""

import pytest

import dataverifyr_spark as dv
import dataverifyr_spark.audio  # noqa: F401 — registers audio functions
from dataverifyr_spark.audio.fixtures import (
    BAD_CODEC_EVERY,
    CORRUPT_BYTES_EVERY,
    allowed_codecs,
    clips_table,
)

N = 100


@pytest.fixture(scope="module")
def clips(spark):
    return clips_table(spark, N).cache()


def kitchen_sink_ruleset():
    return dv.ruleset(
        dv.rule("sr_hz %in% c(8000, 16000, 44100, 48000)", name="sr_allowed"),
        dv.rule("dur_ms <= 0", name="dur_positive", negate=True),
        dv.rule("nchar(transcript) >= 0", name="tr_len", allow_na=True),
        dv.rule("as.numeric(codec) > 0", name="coercion_warn"),
        dv.rule("ghost_column > 1", name="broken"),
        dv.rule("audio_valid(bytes)", name="decodes"),
        dv.reference_rule("codec", "codecs", "codec", name="codec_fk"),
        data_columns=[
            dv.data_column("clip_id", "string"),
            dv.data_column("bytes"),
            dv.data_column("sr_hz", "int"),
            dv.data_column("dur_ms", "int"),
            dv.data_column("codec", "string"),
            dv.data_column("transcript", "string"),
            dv.data_column("ghost_column", optional=True),
        ],
    )


class TestKitchenSink:
    def test_everything_in_one_call(self, spark, clips):
        res = dv.check_data(
            {"clips": clips, "codecs": allowed_codecs(spark)},
            kitchen_sink_ruleset(),
            extra_columns="ignore",
        ).collect()
        by = {r["name"]: r for r in res}
        # ordering contract: schema rows first, reference last
        types = [r["check_type"] for r in res]
        assert types == sorted(types, key=["schema", "row_rule", "reference_rule"].index)
        # schema: 6 exists + 5 typed + optional ghost = rows all pass
        schema_rows = [r for r in res if r["check_type"] == "schema"]
        assert all(r["pass"] == 1 for r in schema_rows)
        bad = lambda k: len([i for i in range(1, N) if i % k == 0])
        assert by["sr_allowed"]["fail"] == bad(17)
        assert by["dur_positive"]["fail"] == 0
        assert by["tr_len"]["fail"] == 0  # NULL transcripts rescued
        assert by["coercion_warn"]["warn"] == "NAs introduced by coercion"
        assert by["coercion_warn"]["pass"] == 0  # no codec string is numeric
        assert by["broken"]["error"] != "" and by["broken"]["fail"] == N
        assert by["decodes"]["fail"] == bad(CORRUPT_BYTES_EVERY)
        assert by["codec_fk"]["fail"] == bad(BAD_CODEC_EVERY)

    def test_violations_and_ledger_same_ruleset(self, spark, clips, tmp_path):
        # expression rules flow into tagged violations; ledger resumes cleanly
        rules = dv.ruleset(
            dv.rule("sr_hz %in% c(8000, 16000, 44100, 48000)", name="sr_allowed"),
            dv.rule("audio_valid(bytes)", name="decodes"),
        )
        bad = dv.filter_fails(rules, clips, tag=True)
        counts = {r["failed_rule"]: r["count"] for r in bad.groupBy("failed_rule").count().collect()}
        assert counts["sr_hz %in% c(8000, 16000, 44100, 48000)"] == len(
            [i for i in range(1, N) if i % 17 == 0]
        )
        from dataverifyr_spark.ledger import ValidationLedger

        led = ValidationLedger(spark, str(tmp_path / "ledger"))
        led.run(clips, rules, "sr_hz", run_id="ks")
        totals = {r["name"]: r for r in led.totals("ks").collect()}
        assert totals["decodes"]["tests"] == N
        assert led.pending_partitions(clips, "sr_hz", "ks").count() == 0


class TestPipelineJourney:
    def test_trusted_slice_to_induced_contract(self, spark, clips):
        """The full training-data loop the engine exists for: profile a
        TRUSTED slice → induce a contract (bounds + value set + FK draft) →
        check the raw feed → the failures are exactly the injected
        violations; per-codec profile via describe_by on the same pass."""
        from pyspark.sql import functions as F

        from dataverifyr_spark.audio.fixtures import allowed_codecs

        # trusted slice: rows that pass the baseline payload checks
        idx = F.substring("clip_id", 6, 12).cast("int")
        trusted = clips.filter(
            ((idx % 17) != 0) & ((idx % 29) != 0) & ((idx % 41) != 0)
            & ((idx % 31) != 0) & ((idx % 37) != 0)
        ).select("sr_hz", "dur_ms", "codec")
        rates = spark.createDataFrame(
            [(8000,), (16000,), (44100,), (48000,)], "rate_hz int"
        )
        rs = dv.suggest_rules(
            trusted, datasets={"codecs": allowed_codecs(spark), "rates": rates}
        )
        names = [r.name for r in rs]
        assert "bounds_sr_hz" in names and "set_codec" in names
        assert "fk_codec" in names and "fk_sr_hz" in names

        res = {
            r["name"]: r
            for r in dv.check_data(
                {"clips": clips.select("sr_hz", "dur_ms", "codec"),
                 "codecs": allowed_codecs(spark), "rates": rates},
                rs,
            ).collect()
        }
        bad = lambda k: len([i for i in range(1, N) if i % k == 0])
        # the induced contract catches exactly the injected drift
        assert res["set_codec"]["fail"] == bad(29)
        assert res["fk_codec"]["fail"] == bad(29)
        # the sr lie (12345) sits INSIDE the observed numeric range — bounds
        # alone can't see it; the induced FK vs the rates table does.  This
        # is the reason FK induction exists.
        assert res["bounds_sr_hz"]["fail"] == 0
        assert res["fk_sr_hz"]["fail"] == bad(17)
        assert all(not r["error"] for r in res.values())

        # per-codec profile of the same feed: one grouped job
        prof = dv.describe_by(clips.select("codec", "sr_hz"), by="codec").collect()
        rows = {(r["codec"], r["var"]): r for r in prof}
        assert rows[("mp3_unknown", "sr_hz")]["n"] == bad(29)
        assert rows[("pcm_s16le", "sr_hz")]["n"] == N - bad(29)


class TestDriverContract:
    def test_every_oracle_key_has_a_query(self):
        """Guards the driver contract: oracle_sql() keys ⊆ queries() keys,
        and each callable/SQL pair exists (drift here means a silently
        unchecked gate)."""
        import __spark_entry__ as e

        qs, os_ = e.queries(), e.oracle_sql()
        assert set(os_) <= set(qs), set(os_) - set(qs)
        missing_oracle = set(qs) - set(os_)
        assert not missing_oracle, f"rows-only gates would weaken: {missing_oracle}"
        assert len(qs) >= 29
        for name, fn in qs.items():
            assert callable(fn), name
        for name, sql in os_.items():
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name
