"""``check_data`` — the validation orchestrator (data plane).

Reference contract: R/check_data.R:52-171 (orchestration), :256-333 (per-rule
evaluation), :277-287 (negate → allow_na rewrite order), :301-315 (error
capture), :325 (fail = tests - pass); R/data_column.R:204-275 (schema rows),
:332-379 (reference rules).

Spark-first design — deliberately NOT the reference's one-scan-per-rule loop:

* All expression rules are fused into ONE ``df.agg`` pass: ``count(*)`` plus
  one conditional sum per rule (plus coercion-watch sums for warn synthesis).
  N rules ⇒ 1 job, 1 scan — the reference's own batched-describe path
  (R/describe.R:329-422) pushed to its logical conclusion.  At 100 TB this is
  the difference between N full-table scans and one.
* Before launching anything, each rule is resolved against the schema with a
  zero-row ``df.select`` — analysis errors (missing column, bad call) become
  error rows (pass=0, fail=tests) without aborting the job, matching
  R/check_data.R:301-315.
* Column pruning is left to Catalyst (the fused agg references only rule
  columns, so the Parquet/Iceberg ReadSchema shrinks to their union — see
  EXPLAIN.md); an explicit pre-agg select measured strictly slower on cached
  inputs and was removed.
* Reference rules evaluate as distinct-ref LEFT joins (AQE picks
  broadcast-hash when the distinct ref side is small; see ``_eval_reference``)
  — never a collected ``isin`` list, which would cap ref size at driver memory.
* ``by=[cols]`` returns a distributed per-group summary (one row per
  group × rule) via the same fused aggregation under ``groupBy`` — the
  north_rule's "per-partition pass/fail rows" — without collecting.
"""

from __future__ import annotations

import re
import time as _time
import warnings
from dataclasses import dataclass
from functools import reduce
from operator import or_
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import udf_warnings
from .expr import CompileResult, ExprError, col_ref, compile_expr, get_called_functions
from .rules import (
    DataColumn,
    ReferenceRule,
    Rule,
    Ruleset,
    UniquenessRule,
    ruleset,
    validate_data_columns,
)

__all__ = ["check_data", "CheckDataError", "RESULT_SCHEMA", "compile_rule_predicate"]

# Result-row contract: R/check_data.R:103-117 / :317-329
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("check_type", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("expr", T.StringType(), False),
        T.StructField("allow_na", T.BooleanType(), False),
        T.StructField("negate", T.BooleanType(), False),
        T.StructField("tests", T.LongType(), False),
        T.StructField("pass", T.LongType(), False),
        T.StructField("fail", T.LongType(), False),
        T.StructField("warn", T.StringType(), False),
        T.StructField("error", T.StringType(), False),
        T.StructField("time", T.DoubleType(), False),
    ]
)

_COERCION_WARN = "NAs introduced by coercion"


class CheckDataError(RuntimeError):
    """Raised by the stop_on_* gates (R/check_data.R:146-168)."""


@dataclass
class _Compiled:
    rule: Rule
    pred: Column | None
    watchers: list[Column]
    error: str


def compile_rule_predicate(r: Rule) -> CompileResult:
    """Compile a rule to its guarded predicate Column.

    Rewrite order is load-bearing (R/check_data.R:277-287): negate wraps the
    raw expression FIRST, the allow_na is-null guard ORs on top, one guard per
    symbol referenced by the original expression.
    """
    res = compile_expr(r.expr)
    pred = res.column
    if r.negate:
        pred = ~pred
    if r.allow_na:
        for s in res.symbols:
            pred = pred | col_ref(s).isNull()
    return CompileResult(column=pred, symbols=res.symbols, coercion_watchers=res.coercion_watchers)


def _compile_all(df: DataFrame, rules: list[Rule]) -> list[_Compiled]:
    # Probe rules against an EMPTY LocalRelation with the same schema, not
    # against df itself: analysis cost is proportional to the logical-plan
    # size, and df may carry an arbitrarily deep plan (unions, joins) that
    # would be re-analyzed once per rule.  The empty frame has identical
    # resolution semantics (missing column / type errors) at O(schema) cost.
    #
    # r7: the happy path probes ALL compilable rules in ONE select —
    # aliased probe columns are analyzed independently, so the combined
    # analysis succeeds iff each per-rule analysis would, and a ruleset of N
    # valid rules costs one driver analysis roundtrip instead of N (~20 ms
    # each; the dominant fixed cost of check_data on small/cached inputs).
    # Only when the batch fails does the per-rule loop run to attribute the
    # error rows (R/check_data.R:301-315 contract unchanged).
    probe_df = df.sparkSession.createDataFrame([], df.schema)
    staged: list[tuple[Rule, Exception | CompileResult]] = []
    for r in rules:
        try:
            staged.append((r, compile_rule_predicate(r)))
        except Exception as exc:  # ExprError and friends — compile-time
            staged.append((r, exc))

    compilable = [(i, res) for i, (_, res) in enumerate(staged) if isinstance(res, CompileResult)]
    batch_ok = False
    if compilable:
        try:
            probe_df.select(
                *[res.column.alias(f"__probe{i}") for i, res in compilable]
            )
            batch_ok = True
        except Exception:
            batch_ok = False  # fall through to per-rule attribution

    out: list[_Compiled] = []
    for i, (r, res) in enumerate(staged):
        if not isinstance(res, CompileResult):
            out.append(_Compiled(r, None, [], _strip_error(res)))
            continue
        if batch_ok:
            out.append(_Compiled(r, res.column, res.coercion_watchers, ""))
            continue
        try:
            # force analysis now so missing columns become error rows,
            # not a failed fused job (R/check_data.R:301-315)
            probe_df.select(res.column.alias("__probe"))
            out.append(_Compiled(r, res.column, res.coercion_watchers, ""))
        except Exception as exc:  # AnalysisException, ...
            out.append(_Compiled(r, None, [], _strip_error(exc)))
    return out


def _safe_alias(columns: Sequence[str], base: str) -> str:
    """Internal-alias name guaranteed not to shadow a user column (the
    same prefixing scheme as ``__dvfy_ref_val`` in _reference_ok_column:
    a dataset with a column literally named ``__cnt`` must not turn a
    valid uniqueness rule into an AMBIGUOUS_REFERENCE error)."""
    out = base
    while out in columns:
        out = "_" + out
    return out


def _strip_error(exc: Exception) -> str:
    msg = str(exc).strip().replace("\n", " ")
    # Spark analysis errors append the whole logical plan after "SQLSTATE: xxxxx;"
    # — keep the human-readable part only (parity with the reference's
    # ANSI-stripped message, R/check_data.R:370-380)
    m = re.search(r"SQLSTATE: \w+", msg)
    if m:
        msg = msg[: m.end()]
    return msg[:500]


def _result_row(
    r: Rule,
    tests: int,
    passed: int,
    warn: str = "",
    error: str = "",
    elapsed: float = 0.0,
) -> dict[str, Any]:
    return {
        "check_type": r.check_type,
        "name": r.name,
        "expr": r.expr,
        "allow_na": r.allow_na,
        "negate": r.negate,
        "tests": int(tests),
        "pass": int(passed),
        "fail": int(tests) - int(passed),
        "warn": warn,
        "error": error,
        "time": float(elapsed),
    }


# ---------------------------------------------------------------------------
# Schema (data_column) validation — pure driver metadata, zero data scan
# (R/data_column.R:204-275)
# ---------------------------------------------------------------------------

_SPARK_FAMILY = {
    "int": (T.IntegerType, T.LongType, T.ShortType, T.ByteType),
    "double": (
        T.DoubleType,
        T.FloatType,
        T.DecimalType,
        T.IntegerType,
        T.LongType,
        T.ShortType,
        T.ByteType,
    ),  # R is.numeric: ints pass as numeric (R/data_column.R:320)
    "string": (T.StringType,),
    "boolean": (T.BooleanType,),
}


def _schema_rows(
    df: DataFrame,
    decls: list[DataColumn],
    rules: list[Rule],
    extra_columns: str,
) -> tuple[list[dict[str, Any]], list[str]]:
    validate_data_columns(decls)
    rows: list[dict[str, Any]] = []
    warns: list[str] = []
    actual = {f.name: f.dataType for f in df.schema.fields}
    declared = {c.col for c in decls}

    # unknown-symbol hard stop — expression rules only; reference rules are
    # validated against their own datasets, not data_columns
    # (R/data_column.R:228-236 filters reference_rule out first)
    for r in rules:
        if isinstance(r, ReferenceRule):
            continue
        try:
            syms = r.symbols()
        except ExprError:
            continue
        unknown = [s for s in syms if s not in declared]
        if unknown:
            raise ValueError(
                f"rule '{r.name}' references undeclared column(s): {', '.join(unknown)}"
            )

    # extra-columns policy (R/data_column.R:215-226): warn emits a real
    # warning, fail hard-stops — both matching the reference's warning()/stop()
    extras = [c for c in actual if c not in declared]
    if extras:
        msg = (
            "Found extra columns not declared in `data_columns`: "
            + ", ".join(sorted(extras))
        )
        if extra_columns == "warn":
            warns.append(msg)
        elif extra_columns == "fail":
            raise ValueError(msg)

    for c in decls:
        exists = c.col in actual
        ok = exists or c.optional
        rows.append(
            {
                "check_type": "schema",
                "name": f"Column exists: {c.col}",
                "expr": f"column_exists('{c.col}')",
                "allow_na": False,
                "negate": False,
                "tests": 1,
                "pass": int(ok),
                "fail": int(not ok),
                "warn": "",
                "error": "" if ok else f"required column '{c.col}' not found",
                "time": 0.0,
            }
        )
        family = c.spark_type_family()
        if exists and c.type is not None:
            # unknown declared type ⇒ always passes (R/data_column.R:328)
            ok_t = True if family is None else isinstance(actual[c.col], _SPARK_FAMILY[family])
            rows.append(
                {
                    "check_type": "schema",
                    "name": f"Column type: {c.col}",
                    "expr": f"column_type('{c.col}') == '{c.type}'",
                    "allow_na": False,
                    "negate": False,
                    "tests": 1,
                    "pass": int(ok_t),
                    "fail": int(not ok_t),
                    "warn": "",
                    "error": ""
                    if ok_t
                    else f"column '{c.col}' has type '{actual[c.col].simpleString()}', declared '{c.type}'",
                    "time": 0.0,
                }
            )
    return rows, warns


# ---------------------------------------------------------------------------
# Reference (FK membership) rules — distinct-ref join, AQE-broadcastable
# (R/data_column.R:332-379)
# ---------------------------------------------------------------------------


def _reference_ok_column(
    df: DataFrame, r: ReferenceRule, datasets: Mapping[str, DataFrame]
) -> tuple[DataFrame, Column, str]:
    """Return (per-distinct-local-value counts joined with hit marker,
    ok Column, count alias) for one reference rule.

    R ``%in%`` never yields NA: NULL local ⇒ FALSE (R/data_column.R:352), so
    ``hit IS NOT NULL`` reproduces it exactly.  Rewrite order is the OPPOSITE
    of expression rules here: the reference applies the allow_na is-na rescue
    FIRST and negate LAST (R/data_column.R:353-358), so with both flags set a
    NULL local value is rescued to ok=TRUE and then negated to a FAIL.

    r7 (guide §2.3 "aggregate before you shuffle"): the local side is
    pre-aggregated to ``(value, count)`` BEFORE the membership join.  Every
    row's verdict depends only on its value, so the join needs one row per
    DISTINCT local value, not one per data row; partial aggregation combines
    duplicates (including a hyper-hot FK value) map-side, the shuffle and
    join carry |distinct| rows, and skew vanishes without AQE's help — the
    10^12-row orders-table check joins ~|customers| rows.  A NULL local
    value groups like any other value (count preserved) and still reads as
    a non-hit.
    """
    ref = datasets[r.ref_dataset]
    if r.ref_col not in ref.columns:
        raise ValueError(f"reference column '{r.ref_col}' not in dataset '{r.ref_dataset}'")
    # collision-proof alias: a local column literally named __ref_val must not
    # shadow the hit marker (same scheme as the check_data_by path below)
    ref_alias = "__dvfy_ref_val"
    while ref_alias in df.columns:
        ref_alias = "_" + ref_alias
    cnt = _safe_alias(df.columns, "__cnt")
    ref_vals = ref.select(F.col(r.ref_col).alias(ref_alias)).distinct()
    # project df to the local column ONLY, then count per distinct value:
    # membership counting needs nothing else, and at 10^12 rows neither the
    # payload nor the data rows themselves may enter the join
    local = df.select(F.col(r.local_col)).groupBy(r.local_col).agg(
        F.count(F.lit(1)).alias(cnt)
    )
    joined = local.join(ref_vals, local[r.local_col] == F.col(ref_alias), "left")
    ok = F.col(ref_alias).isNotNull()
    if r.allow_na:
        ok = ok | F.col(r.local_col).isNull()
    if r.negate:
        ok = ~ok
    return joined, ok, cnt


def _eval_uniqueness(df: DataFrame, r: "UniquenessRule", tests: int) -> dict[str, Any]:
    """One key-only groupBy job: tests = Σ group counts, pass = rows in
    singleton groups.  The projection ships ONLY the key columns into the
    shuffle (at 10^12 rows the audio payload never moves); partial
    aggregation combines duplicate keys map-side, and the second agg is a
    single-row reduce.  allow_na rescues NULL-key rows FIRST, negate LAST
    (the reference-rule flag order)."""
    t0 = _time.perf_counter()
    try:
        missing = [c for c in r.unique_cols if c not in df.columns]
        if missing:
            raise ValueError(f"column(s) {missing} not in dataset")
        keys = [F.col(c) for c in r.unique_cols]
        cnt = _safe_alias(df.columns, "__cnt")
        isn = _safe_alias(df.columns, "__isnull")
        null_key = None
        for c in r.unique_cols:
            cond = F.col(c).isNull()
            null_key = cond if null_key is None else (null_key | cond)
        grouped = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(cnt),
            F.max(null_key.cast("int")).alias(isn),
        )
        ok = F.col(cnt) == 1
        if r.allow_na:
            ok = ok | (F.col(isn) == 1)
        if r.negate:
            ok = ~ok
        row = grouped.agg(
            F.sum(F.when(ok, F.col(cnt)).otherwise(F.lit(0))).alias("p")
        ).collect()[0]
        return _result_row(r, tests, int(row["p"] or 0), elapsed=_time.perf_counter() - t0)
    except Exception as exc:
        return _result_row(r, tests, 0, error=_strip_error(exc), elapsed=_time.perf_counter() - t0)


def uniqueness_violations(df: DataFrame, r: "UniquenessRule") -> DataFrame:
    """Rows of ``df`` violating a uniqueness rule — the filter_fails
    complement (filter_fails itself skips aggregation rules the way the
    reference skips reference rules, R/filters.R:42-47).  A left-semi join
    against the duplicated key set; only keys shuffle."""
    from functools import reduce as _reduce
    from operator import and_ as _and

    keys = list(r.unique_cols)
    null_key = None
    for c in keys:
        cond = F.col(c).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    # allow_na rescues NULL-key rows FIRST: they leave the candidate pool
    # (and re-enter wholesale as violators under negation, flag order per
    # R/data_column.R:353-358)
    base = df.filter(~null_key) if r.allow_na else df
    cnt = _safe_alias(df.columns, "__cnt")
    bk = "__bk"
    while any(f"{bk}_{c}" in df.columns for c in keys):
        bk = "_" + bk
    grouped = base.groupBy(*[F.col(c) for c in keys]).agg(
        F.count(F.lit(1)).alias(cnt)
    )
    bad = F.col(cnt) > 1
    if r.negate:
        bad = ~bad  # singleton keys become the violators
    bad_keys = grouped.filter(bad).select(
        *[F.col(c).alias(f"{bk}_{c}") for c in keys]
    )
    # null-SAFE semi join: without allow_na a duplicated NULL-key group must
    # still surface (SQL GROUP BY groups NULLs together; a plain equi-join
    # would silently drop them)
    join_cond = _reduce(_and, [base[c].eqNullSafe(bad_keys[f"{bk}_{c}"]) for c in keys])
    out = base.join(bad_keys, join_cond, "left_semi")
    if r.allow_na and r.negate:
        out = out.unionByName(df.filter(null_key))
    return out


def _eval_reference(
    df: DataFrame, r: ReferenceRule, datasets: Mapping[str, DataFrame], tests: int
) -> dict[str, Any]:
    t0 = _time.perf_counter()
    if r.ref_dataset not in datasets:
        return _result_row(
            r,
            tests,
            0,
            error=f"reference dataset '{r.ref_dataset}' not provided",
            elapsed=_time.perf_counter() - t0,
        )
    try:
        joined, ok, cnt = _reference_ok_column(df, r, datasets)
        passed = joined.agg(
            F.sum(F.when(ok, F.col(cnt)).otherwise(F.lit(0))).alias("p")
        ).collect()[0]["p"]
        return _result_row(r, tests, int(passed or 0), elapsed=_time.perf_counter() - t0)
    except Exception as exc:
        # missing local column, analysis errors, etc. — error row, never throw
        # (R/check_data.R:301-315 contract applies to reference rules too)
        return _result_row(r, tests, 0, error=_strip_error(exc), elapsed=_time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# check_data
# ---------------------------------------------------------------------------


def _local_result_df(spark: SparkSession, rows: list[tuple], schema: T.StructType) -> DataFrame:
    """Tiny driver-built summary frame as ONE partition.

    ``spark.createDataFrame(list)`` parallelizes local rows over
    ``defaultParallelism`` slices, so collecting a 5-row summary runs a
    32-task job — measured ~0.3 s of pure scheduling per call (r7, guide
    §1.2: per-task work includes task COUNT).  A single-slice RDD makes the
    collect a one-task job with identical values and schema enforcement."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _upgrade(x, spark: SparkSession | None):
    """Accept pandas frames for tiny local inputs — the analog of the
    reference upgrading bare data.frames to the active backend
    (R/check_data.R:86-95)."""
    if isinstance(x, DataFrame):
        return x
    try:
        import pandas as pd

        if isinstance(x, pd.DataFrame):
            s = spark or SparkSession.getActiveSession()
            if s is None:
                raise ValueError("pass spark= to check_data for pandas inputs")
            return s.createDataFrame(x)
    except ImportError:
        pass
    return x


def _resolve_datasets(
    x, data_name: str | None, spark: SparkSession | None = None
) -> tuple[DataFrame, dict[str, DataFrame], str]:
    x = _upgrade(x, spark)
    if isinstance(x, DataFrame):
        return x, {}, data_name or "df"
    if isinstance(x, Mapping):
        if not x:
            raise ValueError("empty dataset mapping")
        datasets = {k: _upgrade(v, spark) for k, v in x.items()}
        primary_name = data_name or next(iter(datasets))
        if primary_name not in datasets:
            raise ValueError(f"data_name '{primary_name}' not in dataset mapping")
        return datasets[primary_name], datasets, primary_name
    raise TypeError(f"x must be a DataFrame or mapping of DataFrames, got {type(x).__name__}")


def check_data(
    x: DataFrame | Mapping[str, DataFrame],
    rules: Ruleset | Rule | str,
    *,
    stop_on_fail: bool = False,
    stop_on_warn: bool = False,
    stop_on_error: bool = False,
    stop_on_schema_fail: bool = False,
    extra_columns: str = "ignore",
    data_name: str | None = None,
    spark: SparkSession | None = None,
    timing: str = "shared",
) -> DataFrame:
    """Run a ruleset against a dataset; return the 11-column summary DataFrame.

    Row-order contract (R/check_data.R:127-144): schema rows first, then
    row_rules in ruleset order, then reference rules.

    ``timing`` semantics for the ``time`` column: the reference evaluates one
    scan per rule, so its per-rule times are real; this engine fuses all
    expression rules into ONE scan, so true per-rule cost does not exist.

    - ``"shared"`` (default): each rule's ``time`` is the fused scan's wall
      time divided evenly — total across rules equals real wall time, the
      per-rule split is nominal.
    - ``"per_rule"``: after the fused pass, each rule's predicate is ALSO
      timed in its own single-rule aggregation job and that wall time is
      reported — reference-comparable numbers, at the cost of N extra scans
      (use for profiling, never in production pipelines).
    """
    if isinstance(rules, str):
        from .io import read_rules

        rules = read_rules(rules)
    if isinstance(rules, Rule):
        rules = ruleset(rules)
    if extra_columns not in ("ignore", "warn", "fail"):
        raise ValueError("extra_columns must be one of ignore/warn/fail")
    if timing not in ("shared", "per_rule"):
        raise ValueError("timing must be 'shared' or 'per_rule'")

    df, datasets, primary_name = _resolve_datasets(x, data_name or rules.data_name, spark)
    spark = spark or df.sparkSession

    schema_rows: list[dict[str, Any]] = []
    if rules.data_columns:
        schema_rows, schema_warns = _schema_rows(
            df, rules.data_columns, rules.rules, extra_columns
        )
        for msg in schema_warns:
            warnings.warn(msg, stacklevel=2)

    expr_rules = [r for r in rules if not isinstance(r, (ReferenceRule, UniquenessRule))]
    ref_rules = [r for r in rules if isinstance(r, ReferenceRule)]
    uniq_rules = [r for r in rules if isinstance(r, UniquenessRule)]

    compiled = _compile_all(df, expr_rules)
    good = [c for c in compiled if c.pred is not None]

    # no explicit column-pruning select: Catalyst prunes the scan (parquet
    # ReadSchema / InMemoryTableScan) to the union of referenced columns on
    # its own, and an extra select only adds an analysis pass (measured 1.7x
    # slower — on CACHED inputs, where analysis overhead dominates; on cold
    # parquet the select is merely redundant, Catalyst prunes either way)
    scan_df = df

    t0 = _time.perf_counter()
    aggs: list[Column] = [F.count(F.lit(1)).alias("__tests")]
    for i, c in enumerate(good):
        aggs.append(F.sum(F.when(c.pred, F.lit(1)).otherwise(F.lit(0))).alias(f"__p{i}"))
        for j, w in enumerate(c.watchers):
            aggs.append(F.sum(F.when(w, F.lit(1)).otherwise(F.lit(0))).alias(f"__w{i}_{j}"))
    warn_before = udf_warnings.snapshot()
    if good or expr_rules or ref_rules:
        agg_row = scan_df.agg(*aggs).collect()[0].asDict()
    else:
        agg_row = {"__tests": df.count()}
    tests = int(agg_row["__tests"])
    scan_elapsed = _time.perf_counter() - t0
    per_rule_time = scan_elapsed / max(len(good), 1)

    rule_times: dict[int, float] = {}
    if timing == "per_rule":
        for i, c in enumerate(good):
            t1 = _time.perf_counter()
            scan_df.agg(F.sum(F.when(c.pred, F.lit(1)).otherwise(F.lit(0)))).collect()
            rule_times[i] = _time.perf_counter() - t1

    # executor-side warnings raised inside UDF batches during THIS job,
    # attributed to the rules whose expressions call the warning function
    # (reference records any evaluation warning, R/check_data.R:248-253)
    fn_warns: dict[str, list[str]] = {}
    for fn, msg in sorted(udf_warnings.new_since(warn_before)):
        fn_warns.setdefault(fn, []).append(msg)

    row_results: list[dict[str, Any]] = []
    gi = 0
    for c in compiled:
        if c.pred is None:
            # error row: pass=0, fail=tests (R/check_data.R:301-315)
            row_results.append(_result_row(c.rule, tests, 0, error=c.error, elapsed=0.0))
        else:
            passed = int(agg_row[f"__p{gi}"] or 0)
            warns: list[str] = []
            if c.watchers and any(
                int(agg_row[f"__w{gi}_{j}"] or 0) > 0 for j in range(len(c.watchers))
            ):
                warns.append(_COERCION_WARN)
            if fn_warns:
                try:
                    called = get_called_functions(c.rule.expr)
                except ExprError:
                    called = []
                for fn in called:
                    warns.extend(m for m in fn_warns.get(fn, ()) if m not in warns)
            row_results.append(
                _result_row(
                    c.rule,
                    tests,
                    passed,
                    # unique messages joined with ", " exactly like the
                    # reference's get_warnings (R/check_data.R:
                    # paste(unique(out), collapse = ", "))
                    warn=", ".join(warns),
                    elapsed=rule_times.get(gi, per_rule_time),
                )
            )
            gi += 1

    # reference rules are independent join+agg jobs — submit them concurrently
    # (Spark's scheduler interleaves jobs from multiple driver threads); order
    # of the result rows still follows ruleset order
    if len(ref_rules) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(ref_rules))) as pool:
            ref_results = list(
                pool.map(lambda r: _eval_reference(df, r, datasets, tests), ref_rules)
            )
    else:
        ref_results = [_eval_reference(df, r, datasets, tests) for r in ref_rules]

    # uniqueness rules are independent groupBy jobs — same concurrent driver
    # submission as reference rules (scheduler interleaves; row order kept)
    if len(uniq_rules) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(uniq_rules))) as pool:
            uniq_results = list(
                pool.map(lambda r: _eval_uniqueness(df, r, tests), uniq_rules)
            )
    else:
        uniq_results = [_eval_uniqueness(df, r, tests) for r in uniq_rules]

    all_rows = schema_rows + row_results + ref_results + uniq_results
    result = _local_result_df(
        spark,
        [tuple(r[f.name] for f in RESULT_SCHEMA.fields) for r in all_rows],
        RESULT_SCHEMA,
    )

    _apply_stop_gates(
        all_rows,
        primary_name,
        stop_on_fail=stop_on_fail,
        stop_on_warn=stop_on_warn,
        stop_on_error=stop_on_error,
        stop_on_schema_fail=stop_on_schema_fail,
    )
    return result


def _apply_stop_gates(
    rows: list[dict[str, Any]],
    data_name: str,
    *,
    stop_on_fail: bool,
    stop_on_warn: bool,
    stop_on_error: bool,
    stop_on_schema_fail: bool,
) -> None:
    # message format per R/check_data.R:159-167
    rule_rows = [
        r for r in rows
        if r["check_type"] in ("row_rule", "reference_rule", "uniqueness_rule")
    ]
    schema_rows = [r for r in rows if r["check_type"] == "schema"]
    n_fail = sum(1 for r in rule_rows if r["fail"] > 0)
    n_warn = sum(1 for r in rows if r["warn"])
    n_error = sum(1 for r in rows if r["error"])
    n_schema_fail = sum(1 for r in schema_rows if r["fail"] > 0)

    trip = (
        (stop_on_fail and n_fail > 0)
        or (stop_on_warn and n_warn > 0)
        or (stop_on_error and n_error > 0)
        or (stop_on_schema_fail and n_schema_fail > 0)
    )
    if trip:
        raise CheckDataError(
            f"In dataset '{data_name}' found {n_fail} rule fails, "
            f"{n_warn} warnings, {n_error} errors"
            + (f", {n_schema_fail} schema fails" if n_schema_fail else "")
        )


# ---------------------------------------------------------------------------
# Distributed per-group summary (north_rule per-partition pass/fail rows)
# ---------------------------------------------------------------------------


def check_data_by(
    df: DataFrame,
    rules: Ruleset | Rule,
    by: list[str] | str,
    datasets: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Per-group pass/fail summary — stays distributed (no collect).

    Reference (FK) rules are supported when ``datasets`` supplies the lookup
    tables: each becomes ONE key-only projection → distinct-ref left join →
    the same groupBy aggregation (payload bytes never join), and its rows
    union after the expression-rule rows.  Without ``datasets`` a ruleset
    containing reference rules raises instead of silently dropping them.

    One ``groupBy(by).agg`` computes every rule's conditional sum per group in
    a single shuffle; results are unpivoted to long form
    ``by..., name, expr, tests, pass, fail`` via an inline array-of-structs
    (pure Catalyst — no Python in the row path).  At 10^12 rows this yields
    one summary row per (partition-key × rule), the north_rule shape.

    Skew note (north_rule: hot clip_id partitions): conditional-sum
    aggregates combine map-side, so a key holding 90% of the rows shuffles
    ONE partial row per upstream task, not 90% of the data to one reducer —
    no salting needed for the summary path (tested under extreme skew in
    tests/test_scale_features.py::TestSkew).  Salting matters for DISTINCT
    counting (operators/uniqueness.py) and joins (AQE skewJoin enabled in
    session.build_spark), not for these sums.
    """
    if isinstance(rules, Rule):
        rules = ruleset(rules)
    by_cols = [by] if isinstance(by, str) else list(by)

    ref_rules = [r for r in rules if isinstance(r, ReferenceRule)]
    if ref_rules and datasets is None:
        raise ValueError(
            "ruleset contains reference rules; pass datasets={'name': ref_df, ...} "
            "to check_data_by (they would otherwise be silently dropped)"
        )
    uniq_rules = [r for r in rules if isinstance(r, UniquenessRule)]
    expr_rules = [
        r for r in rules if not isinstance(r, (ReferenceRule, UniquenessRule))
    ]

    out: DataFrame | None = None
    if expr_rules:
        compiled = _compile_all(df, expr_rules)
        good = [c for c in compiled if c.pred is not None]
        if not good:
            raise ValueError("no compilable rules for check_data_by")

        aggs: list[Column] = [F.count(F.lit(1)).alias("__tests")]
        for i, c in enumerate(good):
            aggs.append(F.sum(F.when(c.pred, F.lit(1)).otherwise(F.lit(0))).alias(f"__p{i}"))
        grouped = df.groupBy(*[F.col(c) for c in by_cols]).agg(*aggs)

        structs = [
            F.struct(
                F.lit(c.rule.name).alias("name"),
                F.lit(c.rule.expr).alias("expr"),
                F.col("__tests").alias("tests"),
                F.col(f"__p{i}").alias("pass"),
                (F.col("__tests") - F.col(f"__p{i}")).alias("fail"),
            )
            for i, c in enumerate(good)
        ]
        out = (
            grouped.select(*by_cols, F.explode(F.array(*structs)).alias("__r"))
            .select(*by_cols, "__r.name", "__r.expr", "__r.tests", "__r.pass", "__r.fail")
        )

    for r in ref_rules:
        if r.ref_dataset not in datasets:
            raise ValueError(f"reference dataset '{r.ref_dataset}' not provided")
        # collision-proof alias: never shadowed by a user column of the same
        # name, and unique even when the FK column is itself a by column
        ref_alias = "__dvfy_ref_val"
        while ref_alias in df.columns:
            ref_alias = "_" + ref_alias
        ref_vals = (
            datasets[r.ref_dataset].select(F.col(r.ref_col).alias(ref_alias)).distinct()
        )
        # key-only projection: by columns + the FK column (deduped — the FK
        # may itself be a by column); payload never joins.  r7: pre-aggregate
        # to (group, value, count) BEFORE the membership join (guide §2.3) —
        # the join carries one row per distinct (group × FK value), partial
        # aggregation absorbs hot keys map-side, and the per-group sums
        # reconstruct exact tests/pass from the counts.
        proj = list(by_cols) + ([r.local_col] if r.local_col not in by_cols else [])
        cnt = _safe_alias(df.columns, "__cnt")
        local = (
            df.select(*[F.col(c) for c in proj])
            .groupBy(*proj)
            .agg(F.count(F.lit(1)).alias(cnt))
        )
        joined = local.join(ref_vals, local[r.local_col] == F.col(ref_alias), "left")
        ok = F.col(ref_alias).isNotNull()
        if r.allow_na:  # rescue FIRST, negate LAST (R/data_column.R:353-358)
            ok = ok | F.col(r.local_col).isNull()
        if r.negate:
            ok = ~ok
        rows = (
            joined.groupBy(*[F.col(c) for c in by_cols])
            .agg(
                F.sum(F.col(cnt)).alias("tests"),
                F.sum(F.when(ok, F.col(cnt)).otherwise(F.lit(0))).alias("pass"),
            )
            .select(
                *by_cols,
                F.lit(r.name).alias("name"),
                F.lit(r.expr).alias("expr"),
                "tests",
                "pass",
                (F.col("tests") - F.col("pass")).alias("fail"),
            )
        )
        out = rows if out is None else out.unionByName(rows)

    for r in uniq_rules:
        # per-group uniqueness: ONE groupBy(by + keys) count, re-aggregated
        # per group — keys-only projection, payload never shuffles.  Missing
        # key columns raise (the _by contract has no error-row channel).
        missing = [c for c in r.unique_cols if c not in df.columns]
        if missing:
            raise ValueError(f"uniqueness rule '{r.name}': column(s) {missing} not in DataFrame")
        key_cols = [c for c in r.unique_cols if c not in by_cols]
        cnt = _safe_alias(df.columns, "__cnt")
        isn = _safe_alias(df.columns, "__isnull")
        null_key = None
        for c in r.unique_cols:
            cond = F.col(c).isNull()
            null_key = cond if null_key is None else (null_key | cond)
        grouped = (
            df.select(*[F.col(c) for c in by_cols + key_cols])
            .groupBy(*[F.col(c) for c in by_cols + list(r.unique_cols)])
            .agg(
                F.count(F.lit(1)).alias(cnt),
                F.max(null_key.cast("int")).alias(isn),
            )
        )
        ok = F.col(cnt) == 1
        if r.allow_na:
            ok = ok | (F.col(isn) == 1)
        if r.negate:
            ok = ~ok
        rows = (
            grouped.groupBy(*[F.col(c) for c in by_cols])
            .agg(
                F.sum(F.col(cnt)).alias("tests"),
                F.sum(F.when(ok, F.col(cnt)).otherwise(F.lit(0))).alias("pass"),
            )
            .select(
                *by_cols,
                F.lit(r.name).alias("name"),
                F.lit(r.expr).alias("expr"),
                "tests",
                "pass",
                (F.col("tests") - F.col("pass")).alias("fail"),
            )
        )
        out = rows if out is None else out.unionByName(rows)

    if out is None:
        raise ValueError("no compilable rules for check_data_by")
    return out


def check_data_by_file(
    df: DataFrame,
    rules: Ruleset | Rule,
    datasets: Mapping[str, DataFrame] | None = None,
    *,
    file_col: str = "file",
    basename: bool = False,
) -> DataFrame:
    """Per-SOURCE-FILE pass/fail summary rows — the north_rule's "per-rule,
    per-partition pass/fail summary" with the same file-lineage unit the
    resumable ledger uses (``ledger.ValidationLedger``: the file is the unit
    that survives retries, repartitions and cluster-size changes, unlike
    ``spark_partition_id()``).

    ``input_file_name()`` is stamped inside the scan (no extra pass) and the
    summary routes through :func:`check_data_by`, so the plan is the same
    single grouped conditional-sum aggregate — one shuffle carrying one
    partial row per (file × task), never data rows.  At 10^12 rows over
    ~10^6 parquet files this yields files × rules summary rows: the shape a
    validation dashboard joins against the ingest manifest to find WHICH
    shard went bad.

    The default keeps the FULL file URI — unique by construction.
    ``basename=True`` reduces it to the last path segment, which reads
    better in a report but is NOT unique under a Hive-partitioned layout:
    the same task writes identically-named ``part-00003-*.parquet`` files
    into different ``key=value/`` directories, and those would silently
    merge into one summary row (caught by
    tests/test_check_data.py::TestCheckDataByFile).  Non-file sources raise
    (same driver-only guard as ``ValidationLedger.run_incremental``).
    """
    stamped = stamp_file_col(df, file_col, basename, caller="check_data_by_file")
    return check_data_by(stamped, rules, by=file_col, datasets=datasets)


def stamp_file_col(df: DataFrame, file_col: str, basename: bool, caller: str) -> DataFrame:
    """Shared file-lineage stamp for the ``*_by_file`` summaries: adds
    ``input_file_name()`` (optionally reduced to the basename — see the
    uniqueness caveat in :func:`check_data_by_file`) inside the scan, with
    the driver-only non-file-source and column-collision guards.

    Call on the freshly-READ frame: ``input_file_name()`` is task-scoped,
    so any exchange between the scan and the stamp (``repartition``, a
    join, an aggregation) erases it to ``''`` and every row collapses into
    one blank-file summary group.  ``df.inputFiles()`` cannot detect this
    (the lineage still lists the files), so the stamp itself guards: an
    empty ``input_file_name()`` raises IN the scan (``raise_error`` branch
    — same pass, no extra job) instead of silently mis-grouping."""
    if not df.inputFiles():
        raise ValueError(
            f"{caller} requires a file-backed DataFrame "
            "(df.inputFiles() is empty — input_file_name() would be '')"
        )
    if file_col in df.columns:
        raise ValueError(
            f"file_col {file_col!r} collides with an input column; "
            "pass file_col=<unused name>"
        )
    src = F.input_file_name()
    src = F.when(
        src == "",
        F.raise_error(
            F.lit(
                f"{caller}: input_file_name() is empty — an exchange between the "
                "scan and the stamp erases file lineage; call on the freshly-read "
                "frame (before repartition/join/aggregate)"
            )
        ),
    ).otherwise(src)
    if basename:
        src = F.regexp_extract(src, r"([^/]+)$", 1)
    return df.withColumn(file_col, src)


def combined_fail_predicate(rules: Ruleset) -> Column:
    """OR of all per-rule failure predicates — one scan finds every violator."""
    from .filters import fail_predicate

    preds = [
        fail_predicate(r)
        for r in rules
        if not isinstance(r, (ReferenceRule, UniquenessRule))
    ]
    if not preds:
        return F.lit(False)
    return reduce(or_, preds)


def reference_violations(
    df: DataFrame, r: ReferenceRule, datasets: Mapping[str, DataFrame]
) -> DataFrame:
    """Rows of ``df`` violating a reference rule — the anti-join complement
    of the membership count (the reference's filter_fails skips reference
    rules, R/filters.R:42-47; this is the scale extension that materializes
    orphan rows for triage).

    Flag algebra mirrors check_reference_rule's order — allow_na rescue FIRST,
    negate LAST (R/data_column.R:353-358):

    Plain rule:          violators = rows whose local value is NOT in the set
                         (left_anti; NULL local is a violator: NULL∈set FALSE)
    allow_na:            NULL-local rows are rescued from the violator set
    negate:              ok = !in_set → violators = set hits (left_semi;
                         NULL local never matches, so it passes)
    negate + allow_na:   ok = !(in_set | is_na) → violators = set hits ∪ NULLs
    """
    if r.ref_dataset not in datasets:
        raise ValueError(f"reference dataset '{r.ref_dataset}' not provided")
    ref = datasets[r.ref_dataset]
    ref_vals = ref.select(F.col(r.ref_col).alias(r.local_col)).distinct()
    if r.negate:
        out = df.join(ref_vals, on=r.local_col, how="left_semi")
        if r.allow_na:
            # rescued-to-TRUE NULLs flip to FAIL under negation
            out = out.unionByName(df.filter(F.col(r.local_col).isNull()))
    else:
        out = df.join(ref_vals, on=r.local_col, how="left_anti")
        # left_anti keeps NULL locals (no match) -> violators, matching
        # %in% semantics; allow_na rescues them
        if r.allow_na:
            out = out.filter(F.col(r.local_col).isNotNull())
    return out
