"""Structured Streaming validation — the same compiled rulesets over
unbounded inputs.

The reference is strictly batch (SURVEY.md §2.5), so this is a graft
extension: a training-data ingest pipeline validates clips AS THEY ARRIVE and
alerts on quality regressions per event-time window.  Rules compile to the
identical Column predicates as the batch path, so semantics (NULL→fail,
negate-then-guard) carry over verbatim; the fused conditional-sum aggregation
becomes a (windowed) streaming aggregation with watermark-bounded state.

Two shapes:
- ``check_stream``: declarative — streaming DataFrame in, streaming
  summary DataFrame out (one row per window × rule after the explode).
- ``validate_stream_to_ledger``: foreachBatch — every micro-batch runs the
  batch ``check_data_by`` and appends per-partition rows to the
  ValidationLedger, unifying streaming ingest with the resumable batch
  ledger (exactly-once per micro-batch via the sink's idempotent run key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..check import compile_rule_predicate
from ..rules import ReferenceRule, Rule, Ruleset, ruleset

__all__ = ["check_stream", "validate_stream_to_ledger"]


def _rule_aggs(rules: Ruleset) -> tuple[list[Column], list[Rule]]:
    aggs: list[Column] = [F.count(F.lit(1)).alias("__tests")]
    good: list[Rule] = []
    for r in rules:
        if isinstance(r, ReferenceRule):
            raise ValueError("reference rules need a static lookup side; use foreachBatch")
        pred = compile_rule_predicate(r).column
        aggs.append(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).alias(f"__p{len(good)}")
        )
        good.append(r)
    return aggs, good


def check_stream(
    sdf: DataFrame,
    rules: Ruleset | Rule,
    time_col: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-window rule summary.

    One streaming aggregation keyed on the event-time window computes every
    rule's conditional sum (state size: one row per open window, NOT per
    input row); late data beyond ``watermark`` is dropped and closed windows
    emit finalized counts in append mode.
    """
    if isinstance(rules, Rule):
        rules = ruleset(rules)
    aggs, good = _rule_aggs(rules)
    grouped = (
        sdf.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("window"))
        .agg(*aggs)
    )
    structs = [
        F.struct(
            F.lit(r.name).alias("name"),
            F.lit(r.expr).alias("expr"),
            F.col("__tests").alias("tests"),
            F.col(f"__p{i}").alias("pass"),
            (F.col("__tests") - F.col(f"__p{i}")).alias("fail"),
        )
        for i, r in enumerate(good)
    ]
    return grouped.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.explode(F.array(*structs)).alias("__r"),
    ).select("window_start", "window_end", "__r.name", "__r.expr", "__r.tests", "__r.pass", "__r.fail")


def validate_stream_to_ledger(
    sdf: DataFrame,
    rules: Ruleset | Rule,
    part_col: str,
    ledger_path: str,
    checkpoint_path: str,
    run_id: str = "stream",
):
    """foreachBatch bridge: every micro-batch validates through the batch
    engine and appends per-partition rows to the ValidationLedger, keyed by
    (run_id, batch) so replays after failure are idempotent."""
    from ..ledger import ValidationLedger

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ledger = ValidationLedger(batch_df.sparkSession, ledger_path)
        ledger.run(batch_df, rules, part_col, run_id=f"{run_id}-b{batch_id}")

    return (
        sdf.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
