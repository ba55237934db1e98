"""Rule suggestion: induce a starter ruleset from the data itself — profile a
reference slice once, emit the rules a human would write from that profile
(bounds, non-null, value sets), then `check_data` future ingests against them.

The training-pipeline loop this serves: snapshot rules from a trusted corpus
→ validate every new batch against the snapshot → alert on contract drift.
Pairs with operators.schema_drift (structure) and operators.drift (shape);
this covers VALUES.

Cost: ONE fused aggregation scan for all numeric/boolean bounds and null
counts (the describe machinery's shape), plus one `approx_count_distinct`-
gated pass collecting value sets for low-cardinality string columns only —
no per-column scans, no full distinct of high-cardinality columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .rules import Rule, Ruleset, rule, ruleset

__all__ = ["suggest_rules"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _fmt(v) -> str:
    """Literal spelled so the expr dialect parses it back exactly."""
    if isinstance(v, float):
        return repr(float(v))
    return str(v)


def _quote(v: str) -> str:
    """Single-quoted expr string literal; backslash-escape so values
    containing quotes (O'Brien) or backslashes round-trip through the
    expr lexer's \\. escape rule instead of producing an unparseable rule."""
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def suggest_rules(
    df: DataFrame,
    max_set_size: int = 20,
    include_null_rules: bool = True,
) -> Ruleset:
    """One rule per evidentiary pattern in ``df``:

    * numeric column → ``col >= observed_min & col <= observed_max``
      (``allow_na`` set when the profile saw NULLs)
    * string column with ≤ ``max_set_size`` distinct values →
      ``col %in% c(...)`` over the observed set
    * column with zero observed NULLs → ``!is.na(col)`` (the contract that
      it stays that way), unless ``include_null_rules=False``

    The suggested rules are ordinary :class:`Rule` objects — print them,
    edit them, ``write_rules`` them to YAML, or ``check_data`` directly.
    """
    fields = list(df.schema.fields)
    aggs: list = []
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"na__{f.name}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).alias(f"min__{f.name}"))
            aggs.append(F.max(c).alias(f"max__{f.name}"))
        if isinstance(f.dataType, T.StringType):
            aggs.append(F.approx_count_distinct(c).alias(f"nd__{f.name}"))
    prof = df.agg(*aggs).collect()[0].asDict()

    # value sets only for columns the sketch says are small (2x slack for
    # HLL error); ONE extra job collecting all small sets together
    small_strs = [
        f.name
        for f in fields
        if isinstance(f.dataType, T.StringType)
        and (prof.get(f"nd__{f.name}") or 0) <= max_set_size * 2
    ]
    value_sets: dict[str, list[str]] = {}
    if small_strs:
        sets_row = df.agg(
            *[F.collect_set(F.col(n)).alias(n) for n in small_strs]
        ).collect()[0]
        for n in small_strs:
            vals = sorted(sets_row[n])
            if 0 < len(vals) <= max_set_size:
                value_sets[n] = vals

    out: list[Rule] = []
    for f in fields:
        name = f.name
        n_na = int(prof[f"na__{name}"] or 0)
        if isinstance(f.dataType, _NUMERIC):
            lo, hi = prof[f"min__{name}"], prof[f"max__{name}"]
            if lo is not None and hi is not None:
                out.append(
                    rule(
                        f"{name} >= {_fmt(lo)} & {name} <= {_fmt(hi)}",
                        name=f"bounds_{name}",
                        allow_na=n_na > 0,
                    )
                )
        if name in value_sets:
            quoted = ", ".join(_quote(v) for v in value_sets[name])
            out.append(
                rule(f"{name} %in% c({quoted})", name=f"set_{name}", allow_na=n_na > 0)
            )
        if include_null_rules and n_na == 0:
            out.append(rule(f"!is.na({name})", name=f"notnull_{name}"))
    if not out:
        raise ValueError("no suggestable patterns found (empty or all-NULL input)")
    return ruleset(*out)
