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
