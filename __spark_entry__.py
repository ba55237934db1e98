"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ training-data-pipeline extensions); ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL over the same parquet views.  Column names and
rounding are aligned on both sides (the driver hashes values after sorting
columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataverifyr_spark as dv
from dataverifyr_spark.check import check_data_by
from dataverifyr_spark.operators.similarity import cosine_similarity_col
from dataverifyr_spark.operators.text import STOPWORDS
from dataverifyr_spark.operators.uniqueness import distinct_count_salted


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# rule sets shared between queries() and entry()
# ---------------------------------------------------------------------------

_LINEITEM_RULES = dv.ruleset(
    dv.rule("l_quantity > 0 & l_quantity <= 30", name="q1"),
    dv.rule("l_discount >= 0 & l_discount <= 0.05", name="q2"),
    dv.rule("l_returnflag %in% c('A', 'N')", name="q3"),
    dv.rule("l_tax >= 0.05", name="q4", negate=True),
    dv.rule("l_extendedprice > 1000", name="q5", allow_na=True),
)

_CUSTOMER_RULES = dv.ruleset(
    dv.rule("c_acctbal >= 0", name="v1"),
    dv.rule(
        "c_mktsegment %in% c('MACHINERY', 'HOUSEHOLD', 'BUILDING', 'FURNITURE')", name="v2"
    ),
)

_SUMMARY_COLS = ["check_type", "name", "expr", "allow_na", "negate", "tests", "pass", "fail"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused 5-rule validation of sf0.001 lineitem."""
    li = _t(spark, "/root/testdata/sf0.001", "lineitem")
    return dv.check_data(li, _LINEITEM_RULES).select(*_SUMMARY_COLS)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_check_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return dv.check_data(li, _LINEITEM_RULES).select(*_SUMMARY_COLS)


def q_check_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rules = dv.ruleset(
        dv.rule("l_quantity > 0 & l_quantity <= 30", name="q1"),
        dv.rule("l_discount >= 0 & l_discount <= 0.05", name="q2"),
    )
    return check_data_by(li, rules, by="l_returnflag")


def q_violations_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return dv.filter_fails(_CUSTOMER_RULES, cust, tag=True)


def q_reference_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    datasets = {
        "orders": _t(spark, sf_dir, "orders"),
        "customer": _t(spark, sf_dir, "customer"),
    }
    rs = dv.ruleset(dv.reference_rule("o_custkey", "customer", "c_custkey", name="fk1"))
    return dv.check_data(datasets, rs).select(*_SUMMARY_COLS)


def q_describe_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    d = dv.describe(cust, top_n=0)
    return d.select(
        "var",
        "type",
        "n",
        "n_distinct",
        "n_na",
        F.round("min", 6).alias("min"),
        F.round("mean", 6).alias("mean"),
        F.round("median", 6).alias("median"),
        F.round("max", 6).alias("max"),
        F.round("sd", 6).alias("sd"),
    )


def q_uniqueness_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    total = li.count()
    distinct = distinct_count_salted(li, ["l_orderkey", "l_linenumber"])
    return spark.createDataFrame(
        [("l_orderkey.l_linenumber", total, distinct, total - distinct, distinct == total)],
        "key string, total_rows bigint, distinct_keys bigint, duplicate_rows bigint, is_unique boolean",
    )


def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5 fingerprint (not xxhash64) so the DuckDB oracle can reproduce it
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def q_token_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def q_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    toks = F.split(text, " ")
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    return docs.select(
        "doc_id",
        F.round(alpha.cast("double") / n_chars, 6).alias("alpha_ratio"),
        F.round((n_chars - n_tokens + 1).cast("double") / n_tokens, 6).alias("mean_token_len"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_tokens, 6).alias(
            "distinct_token_ratio"
        ),
    )


def q_lang_scores_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    langs = sorted(STOPWORDS)
    cols = [F.col("doc_id")]
    for lang in langs:
        words = list(STOPWORDS[lang])
        cols.append(F.size(F.filter(toks, lambda t: t.isin(words))).alias(f"score_{lang}"))
    out = docs.select(*cols)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    guess = F.coalesce(*[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs])
    return out.withColumn("lang_guess", F.when(best > 0, guess))


def q_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    q = F.array(*[F.lit(v) for v in qvec])
    sim = F.round(cosine_similarity_col(F.col("embedding"), q), 4)
    return (
        emb.filter(F.col("vec_id") > 0)
        .select("vec_id", sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )


def q_drift_psi_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift: PSI of l_extendedprice (full table) vs a baseline
    snapshot (returnflag='A' slice) over a 20-bin histogram."""
    from dataverifyr_spark.operators.drift import drift_check, histogram

    li = _t(spark, sf_dir, "lineitem")
    baseline = histogram(li.filter("l_returnflag = 'A'"), "l_extendedprice", 0.0, 110000.0, 20)
    return drift_check(li, "l_extendedprice", baseline, 0.0, 110000.0, bins=20, threshold=0.2)


def q_near_dup_pairs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup candidate pairs above a cosine threshold (brute
    force baseline path; the LSH-bucketed scale path is pytest-covered)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    sim = cosine_similarity_col(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(sim, 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.45)
    )


def q_check_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    rules = dv.ruleset(
        dv.rule("value > 0", name="e1"),
        dv.rule("value <= 400", name="e2"),
    )
    return check_data_by(ev, rules, by="event_type")


def q_events_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type freshness vs a fixed as_of instant (deterministic)."""
    import datetime as dt

    from dataverifyr_spark.operators.freshness import freshness

    ev = _t(spark, sf_dir, "events")
    return freshness(
        ev, "ts", as_of=dt.datetime(2024, 1, 31, 12, 0, 0), max_lag_minutes=720, by="event_type"
    )


def q_most_frequent_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()'s top-k most_frequent formatting on the two low-cardinality
    customer columns ("v (c), v2 (c2), v3 (c3)", R/describe.R:75-93)."""
    cust = _t(spark, sf_dir, "customer")
    d = dv.describe(cust.select("c_nationkey", "c_mktsegment"), top_n=3)
    return d.select("var", "most_frequent")


def q_near_dup_groups_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH→Jaccard→connected-components dedup groups (rows-only
    check: distributed CC is not reasonably SQL-expressible)."""
    from dataverifyr_spark.operators.components import near_dup_groups

    docs = _t(spark, sf_dir, "documents")
    return near_dup_groups(docs, num_hashes=32, num_bands=8, jaccard_threshold=0.7)


def q_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (rows-only: xxhash64 not in DuckDB)."""
    from dataverifyr_spark.operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs.select("doc_id", "text"), bits=16).select("doc_id", "simhash")


def q_audio_validate_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graft flagship: validate a deterministic audio clip + transcript
    table (input_hint schema) — decode, SNR-vs-regenerated-waveform allclose,
    transcript equality, sr/dur consistency — in one fused scan.  Not
    SQL-expressible (binary decode), so no oracle entry: the driver records
    the rows-only check; pytest pins the exact pass/fail goldens
    (tests/test_audio.py)."""
    from dataverifyr_spark.audio import audio_ruleset, clips_table, with_audio_features

    clips = clips_table(spark, 2000)
    return dv.check_data(with_audio_features(clips), audio_ruleset()).select(*_SUMMARY_COLS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "check_lineitem": q_check_lineitem,
        "check_by_returnflag": q_check_by_returnflag,
        "violations_customer": q_violations_customer,
        "reference_orders_customer": q_reference_orders_customer,
        "describe_customer": q_describe_customer,
        "uniqueness_lineitem": q_uniqueness_lineitem,
        "dedup_exact_documents": q_dedup_exact_documents,
        "token_stats_documents": q_token_stats_documents,
        "quality_documents": q_quality_documents,
        "lang_scores_documents": q_lang_scores_documents,
        "topk_embeddings": q_topk_embeddings,
        "drift_psi_lineitem": q_drift_psi_lineitem,
        "near_dup_pairs_embeddings": q_near_dup_pairs_embeddings,
        "check_by_event_type": q_check_by_event_type,
        "events_freshness": q_events_freshness,
        "most_frequent_customer": q_most_frequent_customer,
        "near_dup_groups_documents": q_near_dup_groups_documents,
        "simhash_documents": q_simhash_documents,
        "audio_validate_clips": q_audio_validate_clips,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def _rule_row_sql(name: str, expr_label: str, pred_sql: str, allow_na: str, negate: str) -> str:
    return f"""
    SELECT 'row_rule' AS check_type, '{name}' AS name, '{expr_label}' AS expr,
           {allow_na} AS allow_na, {negate} AS negate,
           CAST(COUNT(*) AS BIGINT) AS tests,
           CAST(COALESCE(SUM(CASE WHEN {pred_sql} THEN 1 ELSE 0 END), 0) AS BIGINT) AS "pass",
           CAST(COUNT(*) - COALESCE(SUM(CASE WHEN {pred_sql} THEN 1 ELSE 0 END), 0) AS BIGINT) AS fail
    FROM lineitem"""


def oracle_sql() -> dict[str, str]:
    seg = "('MACHINERY', 'HOUSEHOLD', 'BUILDING', 'FURNITURE')"
    seg_expr = "c_mktsegment %in% c(''MACHINERY'', ''HOUSEHOLD'', ''BUILDING'', ''FURNITURE'')"
    check_lineitem = " UNION ALL ".join(
        [
            _rule_row_sql(
                "q1", "l_quantity > 0 & l_quantity <= 30",
                "l_quantity > 0 AND l_quantity <= 30", "FALSE", "FALSE",
            ),
            _rule_row_sql(
                "q2", "l_discount >= 0 & l_discount <= 0.05",
                "l_discount >= 0 AND l_discount <= 0.05", "FALSE", "FALSE",
            ),
            _rule_row_sql(
                "q3", "l_returnflag %in% c(''A'', ''N'')",
                "l_returnflag IN ('A', 'N')", "FALSE", "FALSE",
            ),
            _rule_row_sql("q4", "l_tax >= 0.05", "NOT (l_tax >= 0.05)", "FALSE", "TRUE"),
            _rule_row_sql(
                "q5", "l_extendedprice > 1000",
                "l_extendedprice > 1000 OR l_extendedprice IS NULL", "TRUE", "FALSE",
            ),
        ]
    )

    check_by = """
    SELECT l_returnflag, 'q1' AS name, 'l_quantity > 0 & l_quantity <= 30' AS expr,
           CAST(COUNT(*) AS BIGINT) AS tests,
           CAST(SUM(CASE WHEN l_quantity > 0 AND l_quantity <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS "pass",
           CAST(COUNT(*) - SUM(CASE WHEN l_quantity > 0 AND l_quantity <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS fail
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'q2' AS name, 'l_discount >= 0 & l_discount <= 0.05' AS expr,
           CAST(COUNT(*) AS BIGINT) AS tests,
           CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS "pass",
           CAST(COUNT(*) - SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS fail
    FROM lineitem GROUP BY l_returnflag
    """

    violations = f"""
    SELECT *, 'c_acctbal >= 0' AS failed_rule FROM customer
    WHERE NOT (c_acctbal >= 0 AND c_acctbal IS NOT NULL)
    UNION ALL
    SELECT *, '{seg_expr}' AS failed_rule FROM customer
    WHERE NOT (c_mktsegment IN {seg} AND c_mktsegment IS NOT NULL)
    """

    reference = """
    SELECT 'reference_rule' AS check_type, 'fk1' AS name,
           'o_custkey %in% customer$c_custkey' AS expr,
           FALSE AS allow_na, FALSE AS negate,
           CAST(COUNT(*) AS BIGINT) AS tests,
           CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) AS BIGINT) AS "pass",
           CAST(COUNT(*) - SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END) AS BIGINT) AS fail
    FROM orders
    """

    def desc_col(col: str, typ: str, numeric: bool) -> str:
        val = col if numeric else f"LENGTH(CAST({col} AS VARCHAR))"
        return f"""
        SELECT '{col}' AS var, '{typ}' AS type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT {col}) + CASE WHEN COUNT(*) > COUNT({col}) THEN 1 ELSE 0 END AS BIGINT) AS n_distinct,
               CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_na,
               ROUND(CAST(MIN({val}) AS DOUBLE), 6) AS min,
               ROUND(AVG(CAST({val} AS DOUBLE)), 6) AS mean,
               ROUND(CAST(quantile_cont(CAST({val} AS DOUBLE), 0.5) AS DOUBLE), 6) AS median,
               ROUND(CAST(MAX({val}) AS DOUBLE), 6) AS max,
               ROUND(STDDEV_SAMP(CAST({val} AS DOUBLE)), 6) AS sd
        FROM customer"""

    describe = " UNION ALL ".join(
        [
            desc_col("c_custkey", "integer", True),
            desc_col("c_name", "character", False),
            desc_col("c_nationkey", "integer", True),
            desc_col("c_acctbal", "numeric", True),
            desc_col("c_mktsegment", "character", False),
        ]
    )

    uniqueness = """
    SELECT 'l_orderkey.l_linenumber' AS key,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS total_rows,
           CAST(d.n AS BIGINT) AS distinct_keys,
           CAST((SELECT COUNT(*) FROM lineitem) - d.n AS BIGINT) AS duplicate_rows,
           (SELECT COUNT(*) FROM lineitem) = d.n AS is_unique
    FROM (SELECT COUNT(*) AS n FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) d
    """

    dedup = """
    SELECT md5(text) AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id
    FROM documents GROUP BY md5(text)
    """

    token_stats = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(LENGTH(text) AS INT) AS n_chars_calc,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens
    FROM documents
    """

    quality = """
    SELECT doc_id,
           ROUND(CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS alpha_ratio,
           ROUND(CAST(LENGTH(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_token_len,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS distinct_token_ratio
    FROM documents
    """

    langs = sorted(STOPWORDS)
    score_exprs = []
    for lang in langs:
        inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_exprs.append(
            f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({inlist}))) AS INT) AS score_{lang}"
        )
    best = "GREATEST(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    guess_cases = " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    lang_scores = f"""
    SELECT doc_id, {", ".join(f"score_{lang}" for lang in langs)},
           CASE WHEN {best} > 0 THEN (CASE {guess_cases} END) END AS lang_guess
    FROM (SELECT doc_id, {", ".join(score_exprs)} FROM documents)
    """

    topk = """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(
             list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))),
             4) AS cosine_sim
    FROM embeddings, q
    WHERE vec_id > 0
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """

    # drift PSI — replicate drift.py's bucket/psi math exactly:
    # bucket = clamp(floor((v-lo)/width)), NULL→-1; psi term uses frac+eps
    drift = """
    WITH cur AS (
      SELECT CASE WHEN l_extendedprice IS NULL THEN -1
                  ELSE LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 5500.0) AS INT), 0), 19) END AS bucket,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1
    ), curf AS (
      SELECT bucket, CAST(c AS DOUBLE) / (SELECT SUM(c) FROM cur) AS cur_frac FROM cur
    ), base AS (
      SELECT CASE WHEN l_extendedprice IS NULL THEN -1
                  ELSE LEAST(GREATEST(CAST(FLOOR((l_extendedprice - 0.0) / 5500.0) AS INT), 0), 19) END AS bucket,
             COUNT(*) AS c
      FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
    ), basef AS (
      SELECT bucket, CAST(c AS DOUBLE) / (SELECT SUM(c) FROM base) AS base_frac FROM base
    ), j AS (
      SELECT COALESCE(curf.cur_frac, 0.0) AS cf, COALESCE(basef.base_frac, 0.0) AS bf
      FROM curf FULL OUTER JOIN basef USING (bucket)
    )
    SELECT ROUND(SUM((cf - bf) * LN((cf + 1e-6) / (bf + 1e-6))), 6) AS psi,
           SUM((cf - bf) * LN((cf + 1e-6) / (bf + 1e-6))) > 0.2 AS drifted
    FROM j
    """

    near_dup = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine_sim
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND ROUND(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.45
    """

    check_by_event = """
    SELECT event_type, 'e1' AS name, 'value > 0' AS expr,
           CAST(COUNT(*) AS BIGINT) AS tests,
           CAST(SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS BIGINT) AS "pass",
           CAST(COUNT(*) - SUM(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fail
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'e2' AS name, 'value <= 400' AS expr,
           CAST(COUNT(*) AS BIGINT) AS tests,
           CAST(SUM(CASE WHEN value <= 400 THEN 1 ELSE 0 END) AS BIGINT) AS "pass",
           CAST(COUNT(*) - SUM(CASE WHEN value <= 400 THEN 1 ELSE 0 END) AS BIGINT) AS fail
    FROM events GROUP BY event_type
    """

    # most_frequent: replicate describe's top-k formatter — order by count
    # desc then value asc, take 3, "v (c)" joined with ", "
    most_frequent = """
    WITH ranked AS (
      SELECT 'c_nationkey' AS var, CAST(c_nationkey AS VARCHAR) AS v, COUNT(*) AS c,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c_nationkey ASC) AS rn
      FROM customer GROUP BY c_nationkey
      UNION ALL
      SELECT 'c_mktsegment' AS var, c_mktsegment AS v, COUNT(*) AS c,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c_mktsegment ASC) AS rn
      FROM customer GROUP BY c_mktsegment
    )
    SELECT var, string_agg(v || ' (' || c || ')', ', ' ORDER BY rn) AS most_frequent
    FROM ranked WHERE rn <= 3 GROUP BY var
    """

    return {
        "check_lineitem": check_lineitem,
        "check_by_returnflag": check_by,
        "most_frequent_customer": most_frequent,
        "events_freshness": """
    SELECT event_type, MAX(ts) AS last_ts,
           ROUND((epoch(TIMESTAMP '2024-01-31 12:00:00') - epoch(MAX(ts))) / 60.0, 3) AS lag_minutes,
           (epoch(TIMESTAMP '2024-01-31 12:00:00') - epoch(MAX(ts))) / 60.0 <= 720 AS is_fresh
    FROM events GROUP BY event_type
    """,
        "drift_psi_lineitem": drift,
        "near_dup_pairs_embeddings": near_dup,
        "check_by_event_type": check_by_event,
        "violations_customer": violations,
        "reference_orders_customer": reference,
        "describe_customer": describe,
        "uniqueness_lineitem": uniqueness,
        "dedup_exact_documents": dedup,
        "token_stats_documents": token_stats,
        "quality_documents": quality,
        "lang_scores_documents": lang_scores,
        "topk_embeddings": topk,
    }
