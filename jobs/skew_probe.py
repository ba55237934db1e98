"""Task-skew probe for the skewed-corpus dedup bench entry (r5 VERDICT #7).

Runs the identical ``dedup_lsh_skewed_groups`` pipeline from bench.py with the
Spark UI enabled, then pulls per-task durations for every completed stage from
the local REST status API and reports max/median task time per stage.  The
claim under test: with the hot-bucket cap in place, NO task in the band-join
pipeline runs >10× the stage's median task time (i.e. the constant-hot-key
skew the corpus was built with never concentrates into one straggler task).

Usage:  python jobs/skew_probe.py [sf_dir] [mult]
Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def build_skewed_docs(spark, sf_dir: str, mult: int):
    """The EXACT corpus the bench entry times — single-sourced from
    bench.build_skewed_docs so the two can never diverge."""
    from bench import _scale_up, build_skewed_docs as _build

    docs = _scale_up(spark.read.parquet(f"{sf_dir}/documents.parquet"), mult, 64)
    return _build(docs).cache()


def main() -> None:
    from dataverifyr_spark.operators.components import connected_components
    from dataverifyr_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from dataverifyr_spark.session import build_spark

    spark = build_spark(
        master="local[32]",
        app_name="skew-probe",
        shuffle_partitions=32,
        spark_ui_enabled="true",  # REST status API needed for task metrics
        spark_driver_memory="16g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    docs_skew = build_skewed_docs(spark, SF_DIR, MULT)
    n_docs = docs_skew.count()

    # snapshot completed stages BEFORE the pipeline so setup work
    # (parquet read, cache build, count) is EXCLUDED from the skew report
    def _completed_stage_ids() -> set:
        url0 = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url0) as r0:
            return {st["stageId"] for st in json.load(r0)}

    baseline_ids = _completed_stage_ids()

    stats: dict = {}
    pairs = lsh_candidate_pairs(
        minhash_signatures(docs_skew, num_hashes=32),
        num_bands=8,
        max_bucket_size=500,
        stats=stats,
    )
    n_pairs = pairs.count()
    groups = connected_components(pairs).agg(
        F.count_distinct("component").alias("g")
    ).collect()[0]["g"]

    # pull per-stage task distributions from the REST API
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete&withSummaries=true"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)

    rows = []
    worst = 0.0
    for st in stages:
        if st["stageId"] in baseline_ids:  # setup: cache build / count
            continue
        q = (st.get("taskMetricsDistributions") or {}).get("executorRunTime")
        n_tasks = st.get("numCompleteTasks", 0)
        if not q or n_tasks < 8:  # skip trivial stages
            continue
        # quantiles [0, .25, .5, .75, 1.0]
        med, mx = q[2], q[4]
        if med < 20.0:
            # micro-stages (ms-scale medians) produce meaningless ratios —
            # scheduler jitter alone is several ms; a straggler claim only
            # makes sense where tasks do real work
            continue
        ratio = (mx / med) if med > 0 else float("inf")
        worst = max(worst, ratio if med > 0 else 0.0)
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:60],
                "tasks": n_tasks,
                "median_ms": med,
                "max_ms": mx,
                "max_over_median": round(ratio, 2),
            }
        )

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "mult": MULT,
                "n_docs": n_docs,
                "n_candidate_pairs": n_pairs,
                "n_groups": int(groups),
                "cap_stats": stats,
                "worst_task_max_over_median": round(worst, 2),
                "stages": sorted(rows, key=lambda r: -r["max_over_median"])[:10],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
