"""Benchmark harness — one JSON line for the driver, plus a --scaling mode
that runs the identical job at two parallelism levels (sandbox evidence for
the north_rule's N→4N ≥0.8 scaling-efficiency criterion).

Usage:
  python bench.py                 # $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling       # same queries at local[8] and local[32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import dataverifyr_spark as dv
from dataverifyr_spark.audio import (
    audio_quality_ruleset,
    audio_ruleset,
    clips_table,
    with_audio_features,
)
from dataverifyr_spark.operators.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from dataverifyr_spark.operators.similarity import brute_force_topk
from dataverifyr_spark.operators.uniqueness import distinct_count_salted

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

LINEITEM_RULES = dv.ruleset(
    dv.rule("l_quantity > 0 & l_quantity <= 30", name="q1"),
    dv.rule("l_discount >= 0 & l_discount <= 0.05", name="q2"),
    dv.rule("l_returnflag %in% c('A', 'N')", name="q3"),
    dv.rule("l_tax >= 0.05", name="q4", negate=True),
    dv.rule("l_extendedprice > 1000", name="q5", allow_na=True),
)


def make_spark(cores: int) -> SparkSession:
    from dataverifyr_spark.session import build_spark

    return build_spark(
        master=f"local[{cores}]",
        app_name="dataverifyr-spark-bench",
        shuffle_partitions=max(cores, 8),
        spark_ui_enabled="false",
        # 48g of the box's 128 GiB: the 21-query suite caches lineitem x16,
        # orders/docs/embeddings x16 AND four media corpora — at 16g the
        # storage pool evicted lineitem partitions mid-run, so late-round
        # lineitem queries silently re-paid the union+repartition shuffle
        # (violations_tagged_scan 1.2 s isolated vs 3.3+ s in-suite, r6)
        spark_driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )


MULT = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "16"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))


def _scale_up(df, mult: int, parts: int):
    """The sf0.1 parquet files are single-row-group toys (lineitem = 10.8 MB,
    1 row group ⇒ 1 scan task), so raw-file timings measure one thread's
    parquet decode plus job overhead, not the engine.  Union the input MULT
    times and cache repartitioned — at sf0.1×16 lineitem is 9.6M rows,
    comparable to the reference's 8.76M-row NYC-taxi benchmark — so the timed
    section measures distributed rule evaluation the way a 1000-file 100 TB
    table would behave."""
    out = df
    for _ in range(mult - 1):
        out = out.unionAll(df)
    return out.repartition(parts).cache()


def build_skewed_docs(docs):
    """90%-boilerplate skew corpus (r5 VERDICT #7): fresh unique ids, ~5%
    ONE mega identical cluster (over the hot-bucket cap → dropped AND
    accounted), ~85% spread over 240 medium boilerplate variants (hot band
    buckets under the cap → full B²/2 pair fan-out), ~10% original text.
    The worst documented production shape for banded LSH (constant hot
    keys, where AQE skew-join does not even trigger).  SHARED between the
    official `dedup_lsh_skewed_groups` bench entry and jobs/skew_probe.py —
    keep single-sourced so the probe's task-skew evidence always matches
    the timed workload."""
    return (
        docs.withColumn("doc_id", F.monotonically_increasing_id())
        .withColumn("__r", F.abs(F.xxhash64("doc_id", F.lit(1))) % 100)
        .withColumn(
            "text",
            F.when(
                F.col("__r") < 5,
                F.lit("mega boilerplate cluster identical text repeated across the entire corpus forever"),
            )
            .when(
                F.col("__r") < 90,
                F.concat(
                    F.lit("subscribe to newsletter boilerplate variant number "),
                    (F.abs(F.xxhash64("doc_id", F.lit(2))) % 240).cast("string"),
                    F.lit(" terms and conditions apply to everyone today"),
                ),
            )
            .otherwise(F.col("text")),
        )
        .drop("__r")
    )


def bench_queries(
    spark: SparkSession, sf_dir: str, cores: int
) -> tuple[dict[str, float], dict[str, float], int]:
    parts = cores * 2
    li = _scale_up(spark.read.parquet(f"{sf_dir}/lineitem.parquet"), MULT, parts)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ords = _scale_up(spark.read.parquet(f"{sf_dir}/orders.parquet"), MULT, parts)
    docs = _scale_up(spark.read.parquet(f"{sf_dir}/documents.parquet"), max(MULT // 4, 1), parts)
    emb = _scale_up(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), MULT, parts)

    n_rows = li.count()  # materialize caches / warm JVM
    ords.count(), docs.count(), emb.count()

    # deferred registration: queries are collected first, then timed in
    # INTERLEAVED rounds (q1 q2 ... qN, q1 q2 ... qN, ...) taking the best
    # per query — a host-steal burst on this Firecracker VM then hits one
    # round of many queries instead of every sample of one query, so the
    # single driver invocation is noise-robust (same scheme --scaling uses)
    queries: list[tuple[str, object]] = []

    def run(name, fn):
        queries.append((name, fn))

    run("check_fused_5rules", lambda: dv.check_data(li, LINEITEM_RULES).collect())
    run(
        "violations_tagged_scan",
        lambda: dv.filter_fails(LINEITEM_RULES, li, tag=True)
        .groupBy("failed_rule")
        .count()
        .collect(),
    )
    run(
        "reference_fk_join",
        lambda: dv.check_data(
            {"orders": ords, "customer": cust},
            dv.ruleset(dv.reference_rule("o_custkey", "customer", "c_custkey")),
        ).collect(),
    )
    # approx=True is the at-scale profile path: HLL distinct + t-digest-style
    # percentile_approx instead of exact distinct (Expand) + sort percentile
    run("describe_lineitem_approx", lambda: dv.describe(li, top_n=0, approx=True).collect())
    run(
        "uniqueness_salted_distinct",
        lambda: distinct_count_salted(li, ["l_orderkey", "l_linenumber"]),
    )
    run("dedup_exact_groups", lambda: exact_dup_groups(docs).filter("n_copies > 1").count())
    # stats (cap-drop accounting) are collected ONCE here, untimed — with
    # stats in the timed closure the eager accounting job would both add
    # in-region work and materialize state the next iteration could reuse,
    # making the number incomparable to r4/r5.  The timed entry is the
    # stats-free pipeline, identical to prior rounds.
    _lsh_stats: dict = {}
    _lsh_n = lsh_candidate_pairs(
        minhash_signatures(docs, num_hashes=32), num_bands=8, stats=_lsh_stats
    ).count()
    bench_queries.lsh_stats = {"n_candidate_pairs": int(_lsh_n), **_lsh_stats}
    run(
        "dedup_minhash_lsh",
        lambda: lsh_candidate_pairs(
            minhash_signatures(docs, num_hashes=32), num_bands=8
        ).count(),
    )

    # LONG-document regime (r6): real web corpora run 10^3-10^4 tokens/doc,
    # not the fixture's ~50 — this entry pins the shingle cost as LINEAR in
    # document length (the pre-r6 inline shingles were O(tokens^2): this
    # exact workload measured 8x slower).  8,000 docs x 1,000 tokens
    # generated in-plan (pure Catalyst, deterministic), cached once.
    # Token residues are pseudo-random per SOURCE doc over a 50k vocab so
    # distinct docs share no shingles (a cyclic vocab makes every doc's
    # shingle SET identical and the pair output degenerates to all-pairs);
    # every 4th doc duplicates its predecessor's text — the candidate-pair
    # output is exactly the planted n/4 duplicates, so the timing measures
    # the shingle+minhash scan, not pair materialization.
    _src = F.col("id") - F.when(F.col("id") % 4 == 3, F.lit(1)).otherwise(F.lit(0))
    docs_long = (
        spark.range(8000)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(1000)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(_src, i), F.lit(49999)).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(parts)
        .cache()
    )
    n_long_docs = docs_long.count()
    bench_queries.n_long_docs = n_long_docs
    run(
        "dedup_minhash_longdocs",
        lambda: lsh_candidate_pairs(
            minhash_signatures(docs_long, num_hashes=32), num_bands=8
        ).count(),
    )
    run(
        "simhash_documents",
        lambda: simhash(docs, bits=64)
        .agg(F.count(F.when(F.col("simhash") > 0, 1)))
        .collect(),
    )

    # skewed dedup corpus (r5 VERDICT #7): see build_skewed_docs below —
    # the SAME builder jobs/skew_probe.py imports, so the task-skew table in
    # BENCH.md always describes the exact workload this entry times.
    docs_skew = build_skewed_docs(docs).cache()
    docs_skew.count()

    from dataverifyr_spark.operators.components import connected_components

    def _skewed_pipeline(stats=None):
        pairs = lsh_candidate_pairs(
            minhash_signatures(docs_skew, num_hashes=32),
            num_bands=8,
            max_bucket_size=500,
            stats=stats,
        )
        return (
            connected_components(pairs)
            .agg(F.count_distinct(F.col("component")).alias("g"))
            .collect()[0]["g"]
        )

    # accounting pass once, untimed (same rationale as dedup_minhash_lsh)
    _skew_stats: dict = {}
    _skew_groups = _skewed_pipeline(stats=_skew_stats)
    _skew_stats.pop("rounds", None), _skew_stats.pop("converged", None)
    bench_queries.skew_stats = {"n_groups": int(_skew_groups), **_skew_stats}
    run("dedup_lsh_skewed_groups", lambda: _skewed_pipeline())

    # hot-key FK: 90% of orders share one custkey, broadcast DISABLED so the
    # membership join takes the sort-merge shape of a too-big-to-broadcast
    # reference at 10^12 rows; AQE skew-join (session default) splits the hot
    # partition — this entry proves the reference check stays flat under skew
    ords_skew = ords.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 != 0, F.lit(7).cast("long")).otherwise(
            F.col("o_custkey")
        ),
    )

    def skewed_fk():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            dv.check_data(
                {"orders": ords_skew, "customer": cust},
                dv.ruleset(dv.reference_rule("o_custkey", "customer", "c_custkey")),
            ).collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    run("reference_fk_skewed_smj", skewed_fk)

    def topk():
        qvec = [float(v) for v in emb.select("embedding").head()[0]]
        brute_force_topk(emb, qvec, k=10).collect()

    run("similarity_topk_cosine", topk)

    # THE headline metric (BASELINE.json): validated clips/sec over the
    # input_hint audio table — decode + SNR-vs-regenerated-waveform +
    # transcript equality + consistency rules, single Arrow decode pass
    # fused with the column rules
    # media tables: ONE task per core (not cores*2) — per-row Arrow decode
    # is uniform work, so bigger batches amortize IPC/task overhead and
    # stragglers don't exist; measured 9,794 vs 8,856 clips/s (r6,
    # interleaved best-of-3 at 64 vs 32 partitions on 20k clips)
    media_parts = cores
    clips = clips_table(spark, N_CLIPS, num_partitions=media_parts).cache()
    clips.count()
    run(
        "audio_validate_clips",
        lambda: dv.check_data(with_audio_features(clips), audio_ruleset()).collect(),
    )

    # signal-quality rules (r6): peak/clip_ratio/dc_offset ride the SAME
    # single-decode probe as audio_valid/audio_rms — timing the 5-rule
    # quality check on the SAME cached corpus as the headline isolates the
    # probe-field cost (~3 numpy vector folds) from decode/fixture noise
    run(
        "audio_quality_rules",
        lambda: dv.check_data(clips, audio_quality_ruleset()).collect(),
    )

    # transcript rules (r6): speaking-rate + levenshtein-CER + equality vs
    # the reference-captions table — pure Catalyst (zero Python), so this
    # times the caption equi-join + fused 4-rule aggregate WITHOUT any
    # decode cost.  Same cached corpus size as the headline; the join side
    # regenerates per run (it's two narrow string columns, cheap, and the
    # join is the thing being measured).
    from dataverifyr_spark.audio import (
        transcript_clips_table,
        transcript_expected_table,
        transcript_ruleset,
        with_expected_transcript,
    )

    # cache only the columns the transcript check reads — the WAV bytes
    # never enter the plan, and the slim cache survives all timed rounds
    # (an unpersist here would run at REGISTRATION time, before any timed
    # round, silently re-running the 20k-clip generator every round)
    tclips = (
        transcript_clips_table(spark, N_CLIPS, num_partitions=media_parts)
        .select("clip_id", "dur_ms", "transcript")
        .cache()
    )
    tclips.count()
    texp = transcript_expected_table(spark, N_CLIPS, num_partitions=media_parts).cache()
    texp.count()
    run(
        "transcript_rules",
        lambda: dv.check_data(
            with_expected_transcript(tclips, texp), transcript_ruleset()
        ).collect(),
    )

    # cross-codec audio dedup FINGERPRINT throughput (r6): one Arrow decode
    # + rfft + 512-bin profile per clip — the dominant per-clip cost of
    # audio_near_dup_pairs.  The LSH pair join itself is deliberately NOT
    # benched on this corpus: clips_table waveforms are two tones in a
    # narrow band, so spectrally they really ARE near-duplicates by the
    # hundreds of thousands (measured 333k pairs at cosine>=0.98) and the
    # join cost becomes output-size-bound — pair-set correctness is the
    # audio_dedup_pairs gate's job, join scalability is the (shared)
    # near_dup_pairs_embeddings cap-join story.  Consume element 1 of the
    # profile so the UDF runs but no 512-double array ships to the driver.
    from dataverifyr_spark.audio import with_audio_band_profile

    run(
        "audio_dedup_fingerprint",
        lambda: with_audio_band_profile(clips)
        .agg(F.sum(F.element_at("audio_band_profile", 1)))
        .collect(),
    )

    # full curation pipeline end-to-end (r6): ONE decode probe -> 9-rule
    # keep-filter -> caption exact-dedup -> count of the clean corpus.  The
    # pipeline number is what a training-data ingest actually pays per
    # corpus pass; only (fingerprint, clip_id) pairs shuffle.
    from dataverifyr_spark.audio import curate_clips

    run("curate_pipeline", lambda: curate_clips(clips).count())

    # video payload: Y4M header math + offset-seek frame sampling through the
    # same fused rule machinery (round 3)
    from dataverifyr_spark.operators.image import video_probe, videos_table

    vids = videos_table(spark, N_VIDEOS, num_partitions=media_parts).cache()
    vids.count()
    video_rules = dv.ruleset(
        dv.rule("vid_valid", name="decodes"),
        dv.rule("vid_n_frames >= 5", name="enough_frames", allow_na=True),
        dv.rule("vid_mean_luma > 1", name="not_black", allow_na=True),
    )
    run(
        "video_validate_y4m",
        lambda: dv.check_data(video_probe(vids), video_rules).collect(),
    )

    # H.264 container probe (round 4): NAL/SPS header walk, no pixel decode —
    # cost per clip is O(NAL count), independent of payload bytes
    from dataverifyr_spark.operators.h264 import h264_videos_table

    h264 = h264_videos_table(spark, N_VIDEOS, num_partitions=media_parts).cache()
    h264.count()
    h264_rules = dv.ruleset(
        dv.rule("vid_valid", name="decodes"),
        dv.rule("vid_n_frames >= 5", name="enough_frames", allow_na=True),
        dv.rule("vid_n_idr >= 2", name="has_keyframes", allow_na=True),
    )
    run(
        "video_validate_h264",
        lambda: dv.check_data(video_probe(h264), h264_rules).collect(),
    )

    # MJPEG (round 5): REAL compressed-video pixel decode — RIFF/marker
    # container walk by offsets, every 2nd frame through the numpy JPEG
    # entropy/DCT path; cost per clip tracks sampled-frame pixels, the
    # expensive arm of the video family
    from dataverifyr_spark.operators.mjpeg import mjpeg_videos_table

    mjp = mjpeg_videos_table(spark, N_MJPEG, num_partitions=media_parts).cache()
    mjp.count()
    mjpeg_rules = dv.ruleset(
        dv.rule("vid_valid", name="decodes"),
        dv.rule("vid_n_frames >= 5", name="enough_frames", allow_na=True),
        dv.rule("vid_mean_luma > 10", name="not_black", allow_na=True),
    )
    run(
        "video_validate_mjpeg",
        lambda: dv.check_data(video_probe(mjp), mjpeg_rules).collect(),
    )

    # per-partition profiling (round 4): ONE groupBy(key).agg(fused stats)
    # job for every group x column, in-plan unpivot, no driver loop
    run(
        "describe_by_returnflag",
        lambda: dv.describe_by(li, by="l_returnflag", approx=True).collect(),
    )

    # segment-level long audio (round 4): window each clip into 1 s slices in
    # one Arrow decode pass, rms + rfft per window, fused 3-rule check
    from dataverifyr_spark.audio.segments import audio_segments, long_clips_table

    longs = long_clips_table(spark, N_LONG_CLIPS, num_partitions=media_parts).cache()
    longs.count()
    # actual validated segment-row count (corrupt clips emit ONE row, not
    # ~4) so the reported segments/s is rows-validated, not an estimate
    bench_queries.n_seg_rows = audio_segments(longs).count()
    seg_rules = dv.ruleset(
        dv.rule("seg_valid", name="decodes"),
        dv.rule("seg_rms > 0.001", name="nonsilent"),
        dv.rule("seg_dom_freq_hz >= 150 & seg_dom_freq_hz <= 460", name="freq_ok"),
    )
    run(
        "audio_segments_validate",
        lambda: dv.check_data(audio_segments(longs), seg_rules).collect(),
    )

    # warmup sweep (JIT + codegen compile + cache touch), then ROUNDS
    # interleaved timed sweeps; per-query best + spread
    for _, fn in queries:
        fn()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    samples: dict[str, list[float]] = {name: [] for name, _ in queries}
    for _ in range(ROUNDS):
        for name, fn in queries:
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)
    for name, ts in samples.items():
        timings[name] = round(min(ts), 4)
        spreads[name] = round(max(ts) / min(ts), 2)

    clips.unpersist()
    vids.unpersist()
    h264.unpersist()
    mjp.unpersist()
    longs.unpersist()
    docs_skew.unpersist()
    return timings, spreads, n_rows


N_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "20000"))
N_VIDEOS = int(os.environ.get("SPARK_GRAFT_BENCH_VIDEOS", "10000"))
N_MJPEG = int(os.environ.get("SPARK_GRAFT_BENCH_MJPEG", "4000"))
N_LONG_CLIPS = int(os.environ.get("SPARK_GRAFT_BENCH_LONG_CLIPS", "3000"))


def _hw_control(procs: int, n: int = 6000) -> float:
    """Hardware-ceiling control: the same per-clip work (waveform regen +
    encode + decode) through plain multiprocessing, NO Spark.  Bounds what any
    framework could achieve at this parallelism on this box — this VM's
    effective compute saturates well below 32x1 (measured 0.53 efficiency
    8→32 with zero framework overhead), so engine scaling must be judged
    relative to this control."""
    import multiprocessing as mp

    chunks = [(i * n // procs, (i + 1) * n // procs) for i in range(procs)]
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(_HW_WORK, chunks)
    return n / (time.perf_counter() - t0)


def _HW_WORK(bounds):
    from dataverifyr_spark.audio.fixtures import expected_pcm
    from dataverifyr_spark.audio.wav import decode_wav, encode_wav_pcm16

    lo, hi = bounds
    for i in range(lo, hi):
        decode_wav(encode_wav_pcm16(expected_pcm(i, 16000, 12000), 16000))
    return hi - lo


def _measure_level(cores: int, n_clips: int, mult: int) -> tuple[float, float]:
    """One session at local[cores]: (clips/sec, rule-eval rows/sec),
    best-of-2 after warmup."""
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    parts = cores * 2
    clips = clips_table(spark, n_clips, num_partitions=cores).cache()  # 1 task/core (see bench_queries)
    clips.count()
    li = _scale_up(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"), mult, parts)
    n_rows = li.count()

    def audio():
        dv.check_data(with_audio_features(clips), audio_ruleset()).collect()

    def rules():
        dv.check_data(li, LINEITEM_RULES).collect()

    audio(), rules()  # warm
    best_a = best_r = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        audio()
        best_a = min(best_a, time.perf_counter() - t0)
        t0 = time.perf_counter()
        rules()
        best_r = min(best_r, time.perf_counter() - t0)
    spark.stop()
    return n_clips / best_a, n_rows * 5 / best_r


def _run_scaling() -> None:
    """Scaling-efficiency evidence (north_rule two-cluster-size criterion,
    sandbox form): the SAME job at local[N] and local[4N], interleaved over
    ROUNDS alternating rounds with best-per-level, because this Firecracker
    VM sees host-level steal that can bias any single multi-minute window.
    A no-Spark multiprocessing control of the identical per-clip work bounds
    the hardware's own attainable scaling."""
    n_clips = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS_SCALING", "60000"))
    lo_cores = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    hi_cores = lo_cores * 4
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))

    best = {lo_cores: (0.0, 0.0), hi_cores: (0.0, 0.0)}
    controls = {lo_cores: 0.0, hi_cores: 0.0}
    for _ in range(rounds):
        for cores in (lo_cores, hi_cores):
            controls[cores] = max(controls[cores], _hw_control(cores))
            clips_ps, rules_ps = _measure_level(cores, n_clips, MULT)
            best[cores] = (
                max(best[cores][0], clips_ps),
                max(best[cores][1], rules_ps),
            )

    clips_speedup = best[hi_cores][0] / best[lo_cores][0]
    rules_speedup = best[hi_cores][1] / best[lo_cores][1]
    hw_speedup = controls[hi_cores] / controls[lo_cores]
    print(
        json.dumps(
            {
                "metric": f"clips_throughput_scaling_local{lo_cores}_to_local{hi_cores}",
                "value": round(clips_speedup / 4.0, 3),
                "relative_efficiency_vs_hw_ceiling": round(clips_speedup / hw_speedup, 3),
                "engine_clips_speedup": round(clips_speedup, 3),
                "rule_eval_speedup": round(rules_speedup, 3),
                "rule_eval_efficiency": round(rules_speedup / 4.0, 3),
                "hw_control_speedup": round(hw_speedup, 3),
                "hw_control_clips_per_sec": {k: round(v, 1) for k, v in controls.items()},
                "clips_per_sec": {k: round(v[0], 1) for k, v in best.items()},
                "rule_rows_per_sec": {k: round(v[1], 1) for k, v in best.items()},
                "unit": "ratio",
                "n_clips": n_clips,
                "rounds": rounds,
                "sf": SF_DIR,
            }
        )
    )


def _decode_bench_row(i: int, fmt: str, side: int) -> tuple:
    """Deterministic side×side RGB gradient image encoded as the given
    format — built ON EXECUTORS so the fixture itself parallelizes."""
    import numpy as np

    from dataverifyr_spark.operators.image import _encode_bmp24, encode_png, encode_ppm
    from dataverifyr_spark.operators.jpeg import encode_jpeg

    y, x = np.mgrid[0:side, 0:side]
    # channel 2 is a splitmix-style per-pixel hash: without incompressible
    # content PNG/JPEG blobs shrink to ~1 KB and MB/s measures zlib, not decode
    idx = (np.uint64(i) * np.uint64(side * side) + (y * side + x).astype(np.uint64))
    z = idx * np.uint64(0x9E3779B97F4A7C15)  # splitmix64 finalizer: the xor-
    z ^= z >> np.uint64(30)                  # shifts break the per-row arith-
    z *= np.uint64(0xBF58476D1CE4E5B9)       # metic progression a bare multiply
    z ^= z >> np.uint64(27)                  # leaves (zlib crushed that to 3 KB)
    noise = z & np.uint64(0xFF)
    img = np.stack(
        [(x + i) % 256, (y * 3 + i) % 256, noise.astype(np.int64)], axis=-1
    ).astype(np.uint8)
    if fmt == "ppm":
        blob = encode_ppm(img)
    elif fmt == "bmp":
        blob = _encode_bmp24(img)
    elif fmt == "png":
        blob = encode_png(img, filter_type=1)
    else:
        blob = encode_jpeg(img, quality=85)
    return (f"{fmt}-{i:06d}", bytearray(blob))


def _run_decode_bench() -> None:
    """Per-format still-image decode throughput (VERDICT r3 ask #2): puts a
    NUMBER on the pure-numpy codec layer — above all the JPEG Python-Huffman
    entropy walk, the engine's one perf-weak spot — as images/s and MB/s at
    local[CPUS] through the real image_probe path.  Production swap point:
    ``operators.image.register_decoder`` (see its docstring)."""
    from dataverifyr_spark.operators.image import image_probe

    n = int(os.environ.get("SPARK_GRAFT_DECODE_BENCH_N", "2000"))
    side = int(os.environ.get("SPARK_GRAFT_DECODE_BENCH_SIDE", "64"))
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    per_format: dict[str, dict] = {}
    for fmt in ("ppm", "bmp", "png", "jpeg"):
        rdd = sc.parallelize(range(n), CPUS * 2).map(
            lambda i, f=fmt: _decode_bench_row(i, f, side)
        )
        df = spark.createDataFrame(rdd, "media_id string, bytes binary").cache()
        total_bytes = int(df.agg(F.sum(F.length("bytes"))).first()[0])

        def run() -> int:
            return image_probe(df).agg(
                F.sum(F.when(F.col("img_valid"), 1).otherwise(0))
            ).first()[0]

        assert run() == n, f"{fmt}: probe reported invalid images"  # warm + verify
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        per_format[fmt] = {
            "images_per_sec": round(n / best, 1),
            "mb_per_sec": round(total_bytes / 1e6 / best, 2),
            "avg_kb": round(total_bytes / n / 1024, 1),
            "sec": round(best, 3),
        }
        df.unpersist()
    print(
        json.dumps(
            {
                "metric": "still_decode_throughput_per_format",
                "value": per_format["jpeg"]["mb_per_sec"],
                "unit": "MB/s (jpeg)",
                "formats": per_format,
                "n_images": n,
                "side": side,
                "cores": CPUS,
                "swap_point": "dataverifyr_spark.operators.image.register_decoder",
            }
        )
    )
    spark.stop()


def main() -> None:
    if "--decode-bench" in sys.argv:
        _run_decode_bench()
        return
    scaling = "--scaling" in sys.argv
    if scaling:
        _run_scaling()
        return

    # no-Spark control flanking the timed section: the same per-clip work
    # through plain multiprocessing.  Interleaving defends against steal
    # BURSTS; a steal plateau spanning the whole invocation is only visible
    # against this absolute yardstick (BENCH.md documents windows where every
    # query ran ~4x slow with tight spreads).  ~23k clips/s = clean box.
    hw_before = round(_hw_control(CPUS, n=4000), 1)
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings, spreads, n_rows = bench_queries(spark, SF_DIR, CPUS)
    hw_after = round(_hw_control(CPUS, n=4000), 1)
    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": f"total_wall_{len(timings)}_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_spread_max_over_min": spreads,
                "bench_rounds": ROUNDS,
                "hw_control_clips_per_sec": {"before": hw_before, "after": hw_after},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "lineitem_rows": n_rows,
                "bench_mult": MULT,
                "rule_eval_rows_per_sec": round(
                    n_rows * 5 / timings["check_fused_5rules"], 1
                ),
                "validated_clips_per_sec": round(
                    N_CLIPS / timings["audio_validate_clips"], 1
                ),
                "n_clips": N_CLIPS,
                "validated_videos_per_sec": round(
                    N_VIDEOS / timings["video_validate_y4m"], 1
                ),
                "validated_h264_containers_per_sec": round(
                    N_VIDEOS / timings["video_validate_h264"], 1
                ),
                "validated_mjpeg_videos_per_sec": round(
                    N_MJPEG / timings["video_validate_mjpeg"], 1
                ),
                "n_mjpeg": N_MJPEG,
                "n_videos": N_VIDEOS,
                "validated_audio_segments_per_sec": round(
                    getattr(bench_queries, "n_seg_rows", N_LONG_CLIPS * 4)
                    / timings["audio_segments_validate"],
                    1,
                ),
                "n_long_clips": N_LONG_CLIPS,
                "n_segment_rows": getattr(bench_queries, "n_seg_rows", None),
                # skewed-corpus dedup evidence (r6): group count + what the
                # hot-bucket cap dropped (no silent caps)
                "skewed_dedup": getattr(bench_queries, "skew_stats", None),
                "dedup_minhash_lsh_stats": getattr(bench_queries, "lsh_stats", None),
                "n_long_docs": getattr(bench_queries, "n_long_docs", None),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
