"""Expression dialect: parsing, symbol extraction, R precedence, compilation."""

import pytest

from dataverifyr_spark.expr import ExprError, compile_expr, get_symbols, parse_expr


class TestGetSymbols:
    # mirrors get_symbols behavior (R/rule.R:78-81; test-rule.R:25-35)
    def test_simple(self):
        assert get_symbols("mpg > 10") == ["mpg"]

    def test_unique_in_order(self):
        assert get_symbols("mpg > 10 & mpg < 30 | cyl == 4") == ["mpg", "cyl"]

    def test_functions_excluded(self):
        assert get_symbols("as.numeric(hp) > 0 & is.na(disp)") == ["hp", "disp"]

    def test_in_set(self):
        assert get_symbols("cyl %in% c(4, 6, 8)") == ["cyl"]

    def test_dollar_keeps_dataset_name(self):
        assert get_symbols("carrier %in% carriers$carrier_id") == ["carrier", "carriers"]

    def test_literals_not_symbols(self):
        assert get_symbols("x == TRUE | y != 'abc' | z > 1.5") == ["x", "y", "z"]


class TestPrecedence:
    def test_not_binds_looser_than_comparison(self):
        # R: !x > 1 parses as !(x > 1)
        node = parse_expr("!paid | payment_method != 'none'")
        # must be Binary('|', Unary('!', paid), Binary('!=', ...))
        assert node.op == "|"
        assert node.left.op == "!"
        assert node.right.op == "!="

    def test_and_binds_tighter_than_or(self):
        node = parse_expr("a | b & c")
        assert node.op == "|"
        assert node.right.op == "&"

    def test_in_tighter_than_comparison(self):
        node = parse_expr("cyl %in% c(4, 6) == TRUE")
        assert node.op == "=="

    def test_arithmetic(self):
        node = parse_expr("a + b * c > 1")
        assert node.op == ">"
        assert node.left.op == "+"
        assert node.left.right.op == "*"


class TestCompile:
    def _eval(self, spark, df, expr):
        res = compile_expr(expr)
        return [r["v"] for r in df.select(res.column.alias("v")).collect()]

    def test_basic_predicates(self, spark):
        df = spark.createDataFrame([(1, "a"), (5, "b"), (None, None)], "x int, s string")
        assert self._eval(spark, df, "x > 2") == [False, True, None]
        # R %in% never yields NA: NULL needle is FALSE (not SQL NULL)
        assert self._eval(spark, df, "x %in% c(1, 2)") == [True, False, False]
        assert self._eval(spark, df, "is.na(x)") == [False, False, True]
        assert self._eval(spark, df, "s == 'a'") == [True, False, None]
        assert self._eval(spark, df, "!(x > 2)") == [True, False, None]

    def test_string_set(self, spark):
        df = spark.createDataFrame([("gold",), ("odd",), (None,)], "t string")
        assert self._eval(spark, df, "t %in% c('gold', 'silver')") == [True, False, False]

    def test_na_in_set(self, spark):
        # R %in% is match-based: NA %in% c(1, NA) is TRUE, 2 %in% c(1, NA) is
        # FALSE (never NA) — unlike SQL IN's three-valued logic
        df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
        assert self._eval(spark, df, "x %in% c(1, NA)") == [True, False, True]
        assert self._eval(spark, df, "x %in% c(NA)") == [False, False, True]
        assert self._eval(spark, df, "!(x %in% c(1, NA))") == [False, True, False]

    def test_na_in_set_sql_emitter(self, spark):
        import duckdb

        from dataverifyr_spark.expr import to_sql

        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1), (2), (NULL)) v(x)")
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {to_sql('x %in% c(1, NA)')} FROM t ORDER BY x NULLS LAST"
            ).fetchall()
        ]
        assert got == [True, False, True]

    def test_try_cast_coercion(self, spark):
        df = spark.createDataFrame([("10",), ("asd",), (None,)], "hp string")
        res = compile_expr("as.numeric(hp) > 0")
        vals = [r["v"] for r in df.select(res.column.alias("v")).collect()]
        assert vals == [True, None, None]
        assert len(res.coercion_watchers) == 1
        watch = [
            r["w"] for r in df.select(res.coercion_watchers[0].alias("w")).collect()
        ]
        # watcher fires only where raw non-null but cast null
        assert watch == [False, True, False]

    def test_arithmetic_and_functions(self, spark):
        df = spark.createDataFrame([(4.0, "ab")], "x double, s string")
        assert self._eval(spark, df, "sqrt(x) == 2") == [True]
        assert self._eval(spark, df, "nchar(s) == 2") == [True]
        assert self._eval(spark, df, "x / 2 + 1 == 3") == [True]
        assert self._eval(spark, df, "-x < 0") == [True]
        assert self._eval(spark, df, "x ^ 2 == 16") == [True]

    def test_unknown_function_raises(self):
        with pytest.raises(ExprError, match="unknown function"):
            compile_expr("frobnicate(x) > 1")

    def test_dollar_rejected_outside_reference(self):
        with pytest.raises(ExprError, match="reference_rule"):
            compile_expr("x %in% ref$col")

    def test_parse_error(self):
        with pytest.raises(ExprError):
            compile_expr("x >")
        with pytest.raises(ExprError):
            compile_expr("x ?? y")


class TestModulo:
    def test_modulo(self, spark):
        df = spark.createDataFrame([(7,), (8,), (None,)], "x int")
        from dataverifyr_spark.expr import compile_expr

        vals = [r["v"] for r in df.select(compile_expr("x %% 2 == 0").column.alias("v")).collect()]
        assert vals == [False, True, None]

    def test_symbols_through_modulo(self):
        assert get_symbols("a %% b == 0") == ["a", "b"]
