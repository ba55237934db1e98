"""Every rule-expression string that appears in the reference's README and
test corpus must parse, extract the right symbols, and either compile or
fail the way the reference expects (error row).  This is the 'a user of the
reference could paste their rules in unchanged' guarantee."""

import pytest

from dataverifyr_spark import check_data, rule, ruleset
from dataverifyr_spark.expr import compile_expr, get_symbols, parse_expr

# harvested from /root/reference/README.md and tests/testthat/* (rule(...)
# call sites), NSE forms written as the equivalent strings
CORPUS = [
    "mpg > 10",
    "mpg > 10 & mpg < 30",
    "mpg > 10 & mpg < 35",
    "mpg < 10 & mpg > 34",
    "mpg < 20",
    "cyl != 5",
    "cyl != 6",
    "cyl %in% c(4, 6, 8)",
    "disp > 100",
    "hp < 300",
    "hp > 10",
    "as.numeric(hp) > 0 & as.numeric(hp) < 400",
    "as.numeric(vs) %in% c(0, 1)",
    "qsec > 14",
    "qsec >= 14.5 & qsec <= 22.9",
    "vs %in% c(0, 1)",
    "a > 0",
    "a %in% c('x', 'y')",
    "amount > 0",
    "amount >= 0",
    "amount >= 0 & amount <= 10000",
    "customer_tier %in% c('bronze', 'silver', 'gold')",
    "name == 'henry'",
    "sex == 'female'",
    "price >= 0",
    "does_not_exist > 0",
    "does_not_exist %in% c('a', 'b', 'c')",
    # NYC-taxi benchmark rules (README.md:1037-1041)
    "passenger_count >= 0 & passenger_count <= 10",
    "trip_distance >= 0 & trip_distance <= 1000",
    "payment_type %in% c(0, 1, 2, 3, 4)",
    # airquality examples — dotted column names (R idiom)
    "Ozone > 0 & Ozone < 120",
    "Solar.R > 0",
    "Solar.R < 200",
    "Temp < 100",
    "Wind > 10",
]


class TestReferenceCorpus:
    @pytest.mark.parametrize("expr", CORPUS)
    def test_parses_and_compiles(self, spark, expr):
        node = parse_expr(expr)
        assert get_symbols(node)  # at least one column referenced
        compile_expr(node)  # builds a Column without raising

    def test_dotted_column_names_resolve(self, spark):
        df = spark.createDataFrame([(150.0, 8.1), (None, 12.0)], "`Solar.R` double, Wind double")
        rows = check_data(df, ruleset(rule("Solar.R < 200"), rule("Wind > 10"))).collect()
        assert (rows[0]["pass"], rows[0]["fail"]) == (1, 1)  # NULL fails
        assert (rows[1]["pass"], rows[1]["fail"]) == (1, 1)

    def test_stop_rule_becomes_error_row(self, spark):
        # test-check_data.R:300: rule(stop(...)) must yield an error row,
        # never abort the run
        df = spark.createDataFrame([(1,)], "x int")
        r = check_data(df, rule("stop('Not going to work...')")).collect()[0]
        assert r["error"] != "" and (r["pass"], r["fail"]) == (0, 1)

    def test_dotted_names_in_guards(self, spark):
        # allow_na guard and anti-guard must also quote dotted symbols
        from dataverifyr_spark import filter_fails

        df = spark.createDataFrame([(150.0,), (None,), (250.0,)], "`Solar.R` double")
        r = check_data(df, rule("Solar.R < 200", allow_na=True)).collect()[0]
        assert (r["pass"], r["fail"]) == (2, 1)
        bad = filter_fails(ruleset(rule("Solar.R < 200")), df)
        assert bad.count() == 2  # 250 + NULL (anti-guard)
