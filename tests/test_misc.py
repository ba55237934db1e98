"""detect_backend, pretty_val / round_down / plot_res_table —
R/visualization.R:23-110 parity for everything renderable without matplotlib
(the sandbox has none; the draw path stays import-gated)."""

import pytest

from dataverifyr_spark import check_data, rule
from dataverifyr_spark.misc import detect_backend, plot_res, plot_res_table, pretty_val, round_down


class TestDetectBackend:
    def test_spark_frame(self, spark):
        assert detect_backend(spark.range(1)) == "pyspark"

    def test_pandas_frame(self):
        import pandas as pd

        assert detect_backend(pd.DataFrame({"a": [1]})) == "pandas"

    def test_unknown_raises(self):
        with pytest.raises(TypeError):
            detect_backend([1, 2, 3])


class TestPrettyVal:
    def test_suffixes_match_r(self):
        # R: pretty_val(1500) == "1.50k", 2.5e6 == "2.50mln", 1e9 == "1.00bln"
        assert pretty_val(1500, align=False) == "1.50k"
        assert pretty_val(2_500_000, align=False) == "2.50mln"
        assert pretty_val(1_000_000_000, align=False) == "1.00bln"

    def test_plain_values_strip_decimals(self):
        assert pretty_val(500, align=False) == "500"
        assert pretty_val(0, align=False) == "0"

    def test_vector_aligned_then_stripped(self):
        # R strips trailing .0+ AFTER right-aligning, so padding survives
        assert pretty_val([1500, 5]) == ["1.50k", " 5"]

    def test_round_down_never_rounds_up(self):
        assert round_down(99.999999) == 99.99
        assert round_down(33.339) == 33.33


class TestPlotRes:
    def test_table_rows(self, spark):
        df = spark.createDataFrame([(i,) for i in range(1500)], "x int")
        res = check_data(df, rule("x < 1000", name="r1"))
        cells = plot_res_table(res.select("name", "tests", "pass", "fail").collect())
        assert cells[0] == ("", "Pass", "Fail", "Total")
        assert cells[1] == ("r1", "1.00k", "500", "1.50k")

    def test_plot_requires_matplotlib(self, spark):
        # sandbox has no matplotlib: the render path must fail loud, not skip
        try:
            import matplotlib  # noqa: F401

            pytest.skip("matplotlib present; render path exercised elsewhere")
        except ImportError:
            pass
        res = check_data(spark.range(3), rule("id >= 0"))
        with pytest.raises(ImportError, match="matplotlib"):
            plot_res(res)


class TestSimpleTable:
    """Byte-format port of the reference's simple_table
    (/root/reference/R/misc.R:17-50): indentation, odd/even classes, and
    markdown blank-line padding traced from the R sprintf calls."""

    def test_golden_matches_r_format(self):
        from dataverifyr_spark.misc import simple_table

        d = [
            {"library": "[`arrow`](https://arrow.apache.org/docs/r/)", "n": "3"},
            {"library": "plain text", "n": "4"},
        ]
        out = simple_table(d, align="cl")
        expected = "\n".join(
            [
                "<table>",
                '  <thead class="header">',
                '    <th style="text-align:center;">library</th>',
                '    <th style="text-align:left;">n</th>',
                "  </thead>",
                "  <tbody>",
                '<tr class="odd">',
                '      <td style="text-align:center;">\n\n'
                "[`arrow`](https://arrow.apache.org/docs/r/)\n\n</td>",
                '      <td style="text-align:left;">3</td>',
                "</tr>",
                '<tr class="even">',
                '      <td style="text-align:center;">plain text</td>',
                '      <td style="text-align:left;">4</td>',
                "</tr>",
                "  </tbody>",
                "</table>",
            ]
        )
        assert out == expected

    def test_spark_dataframe_input_and_default_align(self, spark):
        from dataverifyr_spark.misc import simple_table

        df = spark.createDataFrame([("a", 1), ("b", 2)], "x string, y int")
        out = simple_table(df)
        assert '<th style="text-align:left;">x</th>' in out
        assert '<td style="text-align:left;">1</td>' in out
        assert out.count("<tr") == 2

    def test_align_validation(self):
        from dataverifyr_spark.misc import simple_table

        with pytest.raises(ValueError, match="l/r/c"):
            simple_table([{"x": "1"}], align="q")
        with pytest.raises(ValueError, match="entries"):
            simple_table([{"x": "1"}], align="ll")


class TestHasPkg:
    def test_present_missing_and_invalid(self):
        from dataverifyr_spark.misc import has_pkg

        assert has_pkg("pyspark") is True
        assert has_pkg("numpy") is True
        assert has_pkg("definitely_not_a_package_xyz") is False
        assert has_pkg("not..a..module") is False  # ValueError path


class TestSuggestRules:
    def test_induced_rules_pass_on_source_and_catch_drift(self, spark):
        """suggest_rules profiles once and emits bounds/set/not-null rules
        that (a) all PASS on the profiled data and (b) catch out-of-contract
        values in a drifted batch."""
        import dataverifyr_spark as dv

        src = spark.createDataFrame(
            [(i, float(i % 50), ["red", "green", "blue"][i % 3], None if i % 7 == 0 else i * 2)
             for i in range(1000)],
            "id bigint, score double, color string, opt bigint",
        )
        rs = dv.suggest_rules(src)
        names = {r.name for r in rs}
        assert {"bounds_id", "bounds_score", "set_color", "notnull_id", "bounds_opt"} <= names
        assert "notnull_opt" not in names  # opt has NULLs
        by_name = {r.name: r for r in rs}
        assert by_name["bounds_opt"].allow_na is True

        res = {r["name"]: r for r in dv.check_data(src, rs).collect()}
        assert all(r["fail"] == 0 for r in res.values()), {
            k: v["fail"] for k, v in res.items() if v["fail"]
        }

        drifted = spark.createDataFrame(
            [(2000, 99.5, "purple", None)], "id bigint, score double, color string, opt bigint"
        )
        dres = {r["name"]: r for r in dv.check_data(drifted, rs).collect()}
        assert dres["bounds_id"]["fail"] == 1      # 2000 > observed max
        assert dres["bounds_score"]["fail"] == 1   # 99.5 > 49.0
        assert dres["set_color"]["fail"] == 1      # purple not in set
        assert dres["notnull_id"]["fail"] == 0

    def test_values_with_quotes_round_trip(self, spark):
        """ADVICE r3: observed values containing quotes/backslashes must be
        escaped so the induced set rule parses and passes, not error."""
        import dataverifyr_spark as dv

        src = spark.createDataFrame(
            [(1, "O'Brien"), (2, 'say "hi"'), (3, "back\\slash"), (4, "plain")],
            "id bigint, who string",
        )
        rs = dv.suggest_rules(src)
        res = {r["name"]: r for r in dv.check_data(src, rs).collect()}
        assert not res["set_who"]["error"]
        assert (res["set_who"]["tests"], res["set_who"]["fail"]) == (4, 0)
        drift = spark.createDataFrame([(9, "D'Arcy")], "id bigint, who string")
        assert {r["name"]: r["fail"] for r in dv.check_data(drift, rs).collect()}[
            "set_who"
        ] == 1

    def test_fk_candidate_induction_and_drift(self, spark):
        """A low-cardinality column whose values ⊆ a provided table's column
        becomes a draft reference_rule; a new batch with an unknown key then
        fails exactly that rule."""
        import dataverifyr_spark as dv
        from dataverifyr_spark.rules import ReferenceRule

        src = spark.createDataFrame(
            [(i, i % 3, f"u{i}") for i in range(30)], "id bigint, dept int, who string"
        )
        depts = spark.createDataFrame([(0,), (1,), (2,), (3,)], "dept_id int")
        rs = dv.suggest_rules(src, datasets={"depts": depts})
        fk = [r for r in rs if isinstance(r, ReferenceRule)]
        assert [r.name for r in fk] == ["fk_dept"]
        assert (fk[0].ref_dataset, fk[0].ref_col) == ("depts", "dept_id")
        ok = {r["name"]: r for r in dv.check_data({"src": src, "depts": depts}, rs).collect()}
        assert ok["fk_dept"]["fail"] == 0 and not ok["fk_dept"]["error"]
        drift = spark.createDataFrame([(99, 7, "u99")], "id bigint, dept int, who string")
        bad = {r["name"]: r for r in dv.check_data({"src": drift, "depts": depts}, rs).collect()}
        assert bad["fk_dept"]["fail"] == 1

    def test_fk_not_induced_without_containment(self, spark):
        import dataverifyr_spark as dv
        from dataverifyr_spark.rules import ReferenceRule

        src = spark.createDataFrame([(i, i % 5) for i in range(20)], "id bigint, k int")
        ref = spark.createDataFrame([(0,), (1,)], "k2 int")  # misses 2,3,4
        rs = dv.suggest_rules(src, datasets={"ref": ref})
        assert not [r for r in rs if isinstance(r, ReferenceRule)]

    def test_fresh_rule_induction_and_drift(self, spark):
        """Temporal columns induce a lower-bound fresh_ rule that self-passes
        and catches a stale backfill batch."""
        import datetime as dt

        import dataverifyr_spark as dv

        base = dt.datetime(2025, 3, 1, 12, 0, 0)
        src = spark.createDataFrame(
            [(i, base + dt.timedelta(minutes=i)) for i in range(10)],
            "id bigint, ts timestamp",
        )
        rs = dv.suggest_rules(src)
        names = [r.name for r in rs]
        assert "fresh_ts" in names
        res = {r["name"]: r for r in dv.check_data(src, rs).collect()}
        assert res["fresh_ts"]["fail"] == 0 and not res["fresh_ts"]["error"]
        stale = spark.createDataFrame(
            [(99, base - dt.timedelta(days=2))], "id bigint, ts timestamp"
        )
        sres = {r["name"]: r for r in dv.check_data(stale, rs).collect()}
        assert sres["fresh_ts"]["fail"] == 1

    def test_high_cardinality_strings_get_no_set_rule(self, spark):
        import dataverifyr_spark as dv

        src = spark.createDataFrame(
            [(i, f"user-{i}") for i in range(500)], "id bigint, user string"
        )
        rs = dv.suggest_rules(src)
        assert not any(r.name == "set_user" for r in rs)

    def test_yaml_round_trip_of_suggested_rules(self, spark, tmp_path):
        import dataverifyr_spark as dv

        src = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
        rs = dv.suggest_rules(src)
        p = str(tmp_path / "suggested.yml")
        dv.write_rules(rs, p)
        back = dv.read_rules(p)
        assert [r.expr for r in back] == [r.expr for r in rs]


class TestSuggestVectorDim:
    def test_dim_rule_induced_and_drift_caught(self, spark):
        """r5: a numeric-array column with ONE observed element count drafts
        vec_dim(col) == d; a ragged corpus drafts nothing."""
        import dataverifyr_spark as dv

        ok = spark.createDataFrame(
            [(i, [float(i), 0.0, 1.0]) for i in range(20)],
            "id int, emb array<double>",
        )
        rs = dv.suggest_rules(ok)
        names = [r.name for r in rs]
        assert "dim_emb" in names
        # self-passes, and catches a wrong-dim batch
        assert {r["name"]: r["fail"] for r in dv.check_data(ok, rs).collect()}["dim_emb"] == 0
        drifted = spark.createDataFrame(
            [(99, [1.0, 2.0])], "id int, emb array<double>"
        )
        bad = {r["name"]: r for r in dv.check_data(drifted, rs).collect()}
        assert bad["dim_emb"]["fail"] == 1
        ragged = spark.createDataFrame(
            [(1, [1.0]), (2, [1.0, 2.0])], "id int, emb array<double>"
        )
        assert "dim_emb" not in [r.name for r in dv.suggest_rules(ragged)]
