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

from .rules import Rule, Ruleset, reference_rule, rule, ruleset, unique_rule

__all__ = ["suggest_rules"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGERISH = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_TEMPORAL = (T.TimestampType, T.TimestampNTZType, T.DateType)


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


def _type_family(dt: T.DataType) -> str | None:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, _INTEGERISH):
        return "integer"
    return None


def suggest_rules(
    df: DataFrame,
    max_set_size: int = 20,
    include_null_rules: bool = True,
    datasets: dict[str, DataFrame] | None = None,
) -> Ruleset:
    """One rule per evidentiary pattern in ``df``:

    * numeric column → ``col >= observed_min & col <= observed_max``
      (``allow_na`` set when the profile saw NULLs)
    * string column with ≤ ``max_set_size`` distinct values →
      ``col %in% c(...)`` over the observed set
    * timestamp/date column → ``col >= '<observed min>'`` (``fresh_col``:
      new batches must not backfill records older than the trusted slice —
      string literals compare via Spark's native timestamp coercion, so the
      rule round-trips through YAML and the expr dialect)
    * column with zero observed NULLs → ``!is.na(col)`` (the contract that
      it stays that way), unless ``include_null_rules=False``
    * id-shaped (integer/string) null-free column that is exactly unique →
      a :func:`unique_rule` PK draft (``unique_col``), HLL-shortlisted and
      exact-confirmed (see inline comment)
    * numeric-array (embedding) column whose observed element count is a
      single value → ``vec_dim(col) == d`` (``dim_col``, vectors dialect)
    * with ``datasets={'name': ref_df, ...}``: low-cardinality string or
      integer column whose observed value set is CONTAINED in some
      same-type-family column of a provided table → a draft
      :func:`reference_rule` (``fk_col``), checkable via
      ``check_data({'df': df, 'name': ref_df}, rs)``.  Containment probes
      are ONE aggregation per dataset (``collect_set`` of the ≤
      ``max_set_size`` matching values per candidate column — no Expand, no
      per-pair scans).

    The suggested rules are ordinary :class:`Rule` objects — print them,
    edit them, ``write_rules`` them to YAML, or ``check_data`` directly.
    """
    fields = list(df.schema.fields)
    aggs: list = [F.count(F.lit(1)).alias("n__")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"na__{f.name}"))
        if isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, _NUMERIC
        ):
            # vector column: observed element-count range (same fused scan)
            aggs.append(F.min(F.size(c)).alias(f"dimmin__{f.name}"))
            aggs.append(F.max(F.size(c)).alias(f"dimmax__{f.name}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(c).alias(f"min__{f.name}"))
            aggs.append(F.max(c).alias(f"max__{f.name}"))
        if isinstance(f.dataType, _TEMPORAL):
            aggs.append(F.min(c).alias(f"tmin__{f.name}"))
        if _type_family(f.dataType) is not None:
            # one sketch serves both ends of the cardinality spectrum:
            # small sets gate %in%/FK candidacy, near-n gates PK candidacy
            # (rsd 0.02 so the 0.8n shortlist threshold sits ~10σ clear of a
            # truly-unique column's estimate)
            aggs.append(F.approx_count_distinct(c, 0.02).alias(f"nd__{f.name}"))
    prof = df.agg(*aggs).collect()[0].asDict()
    n_rows = int(prof["n__"] or 0)

    # value sets only for columns the sketch says are small (2x slack for
    # HLL error); ONE extra job collecting all small sets together.  Integer
    # sets feed FK candidacy only (no %in% rules for numerics).
    small_cols = [
        f.name
        for f in fields
        if _type_family(f.dataType) is not None
        and (prof.get(f"nd__{f.name}") or 0) <= max_set_size * 2
    ]
    value_sets: dict[str, list] = {}
    if small_cols:
        sets_row = df.agg(
            *[F.collect_set(F.col(n)).alias(n) for n in small_cols]
        ).collect()[0]
        for n in small_cols:
            vals = sorted(sets_row[n])
            # FK candidacy keeps the 2x slack; %in% rules re-check the strict
            # cap at emission (a 25-value FK key is fine, a 25-literal set
            # rule is not)
            if 0 < len(vals) <= max_set_size * 2:
                value_sets[n] = vals

    fk_targets = _fk_containment(df, fields, value_sets, datasets) if datasets else {}

    # PK candidacy (r5): id-shaped columns (integer/string — keys, not
    # measures) with zero NULLs whose HLL estimate is within 20% of n are
    # shortlisted, then ONE exact count_distinct aggregation confirms
    # nd == n before a uniqueness rule is drafted — the sketch alone would
    # let a 2%-duplicated column masquerade as a PK.  The confirm job plans
    # an Expand over the candidates (rows × n_candidates); candidates are
    # typically the 1-2 id columns, and the scan carries only them.
    pk_shortlist = [
        f.name
        for f in fields
        if _type_family(f.dataType) is not None
        and int(prof[f"na__{f.name}"] or 0) == 0
        and n_rows > 1
        and (prof.get(f"nd__{f.name}") or 0) >= 0.8 * n_rows
    ]
    pk_cols: list[str] = []
    if pk_shortlist:
        exact = df.agg(
            *[F.count_distinct(F.col(c)).alias(c) for c in pk_shortlist]
        ).collect()[0]
        pk_cols = [c for c in pk_shortlist if int(exact[c]) == n_rows]

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
        if isinstance(f.dataType, _TEMPORAL):
            tmin = prof.get(f"tmin__{name}")
            if tmin is not None:
                out.append(
                    rule(
                        f"{name} >= '{tmin}'",
                        name=f"fresh_{name}",
                        allow_na=n_na > 0,
                    )
                )
        if (
            name in value_sets
            and isinstance(f.dataType, T.StringType)
            and len(value_sets[name]) <= max_set_size
        ):
            quoted = ", ".join(_quote(v) for v in value_sets[name])
            out.append(
                rule(f"{name} %in% c({quoted})", name=f"set_{name}", allow_na=n_na > 0)
            )
        if name in fk_targets:
            ds_name, ref_col = fk_targets[name]
            out.append(
                reference_rule(
                    name, ds_name, ref_col, name=f"fk_{name}", allow_na=n_na > 0
                )
            )
        if f"dimmin__{name}" in prof:
            lo_d, hi_d = prof[f"dimmin__{name}"], prof[f"dimmax__{name}"]
            if lo_d is not None and lo_d == hi_d and lo_d > 0:
                # every observed vector has ONE dimension: contract it
                # (vectors.py dialect fn — pure Catalyst size check)
                out.append(
                    rule(
                        f"vec_dim({name}) == {int(lo_d)}",
                        name=f"dim_{name}",
                        allow_na=n_na > 0,
                    )
                )
        if name in pk_cols:
            out.append(unique_rule(name, name=f"unique_{name}"))
        if include_null_rules and n_na == 0:
            out.append(rule(f"!is.na({name})", name=f"notnull_{name}"))
    if not out:
        raise ValueError("no suggestable patterns found (empty or all-NULL input)")
    return ruleset(*out)


def _fk_containment(
    df: DataFrame,
    fields: list[T.StructField],
    value_sets: dict[str, list],
    datasets: dict[str, DataFrame],
) -> dict[str, tuple[str, str]]:
    """local col → (dataset, ref col) for the first reference column that
    contains the local column's whole observed value set.  One aggregation
    job per dataset: per candidate ref column, ``collect_set`` of its values
    that hit ANY local set (bounded by the union of small sets), compared
    driver-side — no Expand node, no per-pair scan."""
    families = {f.name: _type_family(f.dataType) for f in fields}
    locals_by_family: dict[str, list[str]] = {}
    for n in value_sets:
        fam = families.get(n)
        if fam:
            locals_by_family.setdefault(fam, []).append(n)
    if not locals_by_family:
        return {}

    union_by_family = {
        fam: sorted({v for n in names for v in value_sets[n]})
        for fam, names in locals_by_family.items()
    }
    out: dict[str, tuple[str, str]] = {}
    for ds_name, ref in datasets.items():
        cand_cols = [
            (rf.name, fam)
            for rf in ref.schema.fields
            if (fam := _type_family(rf.dataType)) in locals_by_family
        ]
        if not cand_cols:
            continue
        probes = [
            F.collect_set(
                F.when(F.col(rc).isin(union_by_family[fam]), F.col(rc))
            ).alias(f"hit__{rc}")
            for rc, fam in cand_cols
        ]
        row = ref.agg(*probes).collect()[0].asDict()
        for rc, fam in cand_cols:
            hits = set(row[f"hit__{rc}"] or [])
            for local in locals_by_family[fam]:
                if local not in out and set(value_sets[local]) <= hits:
                    out[local] = (ds_name, rc)
    return out
