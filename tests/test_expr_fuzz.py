"""Parser/compiler fuzz — driver-side only (no Spark jobs), so hundreds of
examples run in seconds.  Generated expressions must parse, expose exactly
their column symbols, and round-trip through negate/allow_na rewrites without
raising anything but ExprError."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from dataverifyr_spark.expr import ExprError, get_symbols, parse_expr

_COLS = ["a", "bb", "c_3", "val"]


@st.composite
def exprs(draw, depth=0):
    if depth > 3 or draw(st.booleans()):
        kind = draw(st.sampled_from(["col", "num", "str"]))
        if kind == "col":
            return draw(st.sampled_from(_COLS))
        if kind == "num":
            return repr(draw(st.integers(-100, 100)))
        return "'{}'".format(draw(st.text(alphabet="abcxyz", min_size=0, max_size=4)))
    kind = draw(
        st.sampled_from(["binop", "cmp", "not", "in", "func", "paren", "arith"])
    )
    if kind == "binop":
        return f"{draw(exprs(depth + 1))} {draw(st.sampled_from(['&', '|']))} {draw(exprs(depth + 1))}"
    if kind == "cmp":
        return f"{draw(exprs(depth + 1))} {draw(st.sampled_from(['<', '>', '<=', '>=', '==', '!=']))} {draw(exprs(depth + 1))}"
    if kind == "not":
        return f"!({draw(exprs(depth + 1))})"
    if kind == "in":
        col = draw(st.sampled_from(_COLS))
        vals = draw(st.lists(st.integers(-9, 9), min_size=1, max_size=4))
        return f"{col} %in% c({', '.join(map(str, vals))})"
    if kind == "func":
        fn = draw(st.sampled_from(["is.na", "nchar", "abs", "sqrt", "as.numeric", "trimws"]))
        return f"{fn}({draw(st.sampled_from(_COLS))})"
    if kind == "paren":
        return f"({draw(exprs(depth + 1))})"
    return f"{draw(exprs(depth + 1))} {draw(st.sampled_from(['+', '-', '*', '%%']))} {draw(exprs(depth + 1))}"


@given(exprs())
@settings(max_examples=300, deadline=None)
def test_generated_expressions_parse_and_extract_symbols(e):
    node = parse_expr(e)
    syms = get_symbols(node)
    assert set(syms) <= set(_COLS)
    for s in syms:  # every reported symbol literally appears in the source
        assert s in e


@given(st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_arbitrary_text_never_raises_unexpected(s):
    try:
        parse_expr(s)
    except ExprError:
        pass  # the only acceptable failure mode


class TestSqlDifferential:
    """Differential: each dialect expression evaluated by BOTH the Catalyst
    compilation and the to_sql() rendering in DuckDB must agree row-for-row
    on a NULL-rich table."""

    EXPRS = [
        "a > 0",
        "a > 0 & b < 4",
        "!(a > 0) | b %in% c(0, 1, 2)",
        "b %in% c(0, 1)",
        "!(b %in% c(0, 1))",
        "nchar(s) > 1",
        "is.na(a) | a < 50",
        "a + b > 0",
        "a * 2 - b / 2 >= 1",
        "as.numeric(s) > 0",
        "a %% 2 == 0",
        "abs(a) <= 50",
        "trimws(s) == 'x'",
        "ifelse(a > 0, 1, 0) == 1",
        "a ^ 2 < 100",
        "a - b != 0",
        "s %in% c('x', 'abc')",
        "!(s %in% c('x', 'abc'))",
        "b %in% c(0, NA)",
        "!(b %in% c(1, NA))",
        "s %in% c('x', NA)",
        "a %in% c(NA)",
    ]
    # NOTE: `1 < 2 < 3` and `a < !b` PARSE (R grammar) but need R's
    # logical->numeric coercion to evaluate; ANSI Spark/DuckDB both reject
    # BOOLEAN<INT, so boolean-arithmetic coercion is documented out of scope.

    def test_spark_vs_duckdb(self, spark):
        import random

        import duckdb
        import pandas as pd

        from dataverifyr_spark.expr import compile_expr, to_sql

        rng = random.Random(99)
        rows = []
        for _ in range(200):
            rows.append(
                (
                    rng.choice([None, float(rng.randint(-60, 60))]),
                    rng.choice([None, float(rng.randint(0, 5))]),
                    rng.choice([None, "", "x", " x ", "12", "-3.5", "abc"]),
                )
            )
        pdf = pd.DataFrame(rows, columns=["a", "b", "s"])
        df = spark.createDataFrame(pdf.astype(object).where(pd.notnull(pdf), None),
                                   "a double, b double, s string").cache()
        con = duckdb.connect()
        con.register("t", pdf)
        for e in self.EXPRS:
            spark_vals = [
                r["v"] for r in df.select(compile_expr(e).column.alias("v")).collect()
            ]
            duck_vals = [r[0] for r in con.execute(f"SELECT {to_sql(e)} FROM t").fetchall()]
            assert spark_vals == duck_vals, e
        df.unpersist()


@given(st.text(alphabet="abc0'\"\\()%&|!<>=+-*/. \t$,[]{}#~^@;:`?", max_size=40))
@settings(max_examples=400, deadline=None)
def test_garbage_strings_raise_only_expr_error(s):
    """Arbitrary junk must parse or raise ExprError — never a raw
    tokenizer/recursion/Unicode exception — so a malformed rule from a YAML
    file becomes an error ROW, not a dead job."""
    try:
        tree = parse_expr(s)
        get_symbols(tree)  # a successful parse must also walk cleanly
    except ExprError:
        pass
