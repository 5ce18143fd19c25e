"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "events/sec", "queries": {...}, "sf": ...}.

The headline metric is the CDC apply throughput (change-events/sec applied,
sustained MERGE throughput — BASELINE.json metric); per-query wall times for
the operator suite ride along in "queries".

Noise methodology (this host's load drifts in ±3x waves — BENCH/
SCALING_NOTES.md): the three throughput points run INTERLEAVED, best-of-N
(default 3) — a load wave that hits iteration k hits every point equally,
and the best iteration approximates the uncontended number. Input logs are
materialized to parquet once and re-scanned per run (the production shape:
the engine tails a log on shared storage; executor-pinned Spark caches
serialize downstream jobs in multi-executor mode)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "broadcast_dim_join",
    "topk_per_group",
    "latest_event_per_user",
    "groupby_multi_agg",
    "distinct_dedup",
    "cdc_lww_reduce_only",
    "windowed_event_counts",
    "session_windows_per_user",
    "ann_ivf_flat",
]

N_ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))

# sf1 (10x sf0.1, tools/make_sf1.py): run the exchange-heavy families at a
# scale where shuffle cost dominates — sf0.1 is ~17MB and plan regressions
# (a lost broadcast, an unpushed filter, an all-pairs candidate join) hide
# inside JVM fixed cost there. Disable with SPARK_GRAFT_SF1=0.
SF1_HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_per_group",
    "latest_event_per_user",
    "groupby_multi_agg",
    "windowed_event_counts",
    "session_windows_per_user",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_flat",
    # last: inherently the biggest output at sf1 (16.8M true dup pairs);
    # rides only if the wall budget still has room
    "dedup_simhash_pairs",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from translator_ingests_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = {name: fn for name, (fn, _sql) in entrymod._registry(full=True).items()}
    timings: dict[str, float] = {}

    # warm the JVM/codegen once with a trivial action
    spark.range(1000).count()

    # best-of-2 per query, whole suite interleaved — this host's external
    # load drifts in multi-minute waves, so a single pass tars every query
    # hit by a wave (measured ~1.5x uniform inflation); a second pass with
    # per-query min recovers the uncontended number at ~30s extra cost
    for _pass in range(2):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.count()
            e = round(time.monotonic() - t0, 3)
            if name not in timings or e < timings[name]:
                timings[name] = e

    # ---- sf1: same interleaved best-of-2, 10x the data (shuffles engage)
    sf1_timings: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            from tools.make_sf1 import ensure_sf1

            sf1_dir = ensure_sf1(
                spark, os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"))
            # hard wall budget: sf1 rides along the driver's bench run and
            # must never dominate it — stop where the budget lands and
            # report what completed (queries keep priority order)
            sf1_deadline = time.monotonic() + float(
                os.environ.get("SPARK_GRAFT_SF1_BUDGET", "300"))
            for _pass in range(2):
                for name in SF1_HEADLINE:
                    fn = qs.get(name)
                    if fn is None or time.monotonic() > sf1_deadline:
                        continue
                    t0 = time.monotonic()
                    fn(spark, sf1_dir).count()
                    e = round(time.monotonic() - t0, 3)
                    if name not in sf1_timings or e < sf1_timings[name]:
                        sf1_timings[name] = e
        except Exception as exc:  # fixture generation is best-effort
            sf1_timings = {"error": str(exc)[:200]}

    # ---- throughput points: materialize inputs once, interleave best-of-N
    from pyspark.sql import functions as F

    from translator_ingests_spark.cdc.apply import CdcEngine
    from translator_ingests_spark.cdc.generator import generate_event_log
    from translator_ingests_spark.operators.cdc_queries import events_as_cdc_log

    work = tempfile.mkdtemp(prefix="bench_work_")
    try:
        replay_path = os.path.join(work, "replay_log")
        events_as_cdc_log(spark, sf_dir).write.parquet(replay_path)
        n_events = spark.read.parquet(replay_path).count()

        gen_path = os.path.join(work, "gen_log")
        generate_event_log(
            spark, 500_000, seed=42, n_repos=500, n_mega_repos=2,
            hot_fraction=0.3, paths_per_repo=200, content_repeat=16,
            n_spark_partitions=cpus * 2,
        ).write.parquet(gen_path)
        gn = spark.read.parquet(gen_path).count()

        seed_path = os.path.join(work, "clu_seed")
        generate_event_log(
            spark, 200_000, seed=7, n_repos=500, n_mega_repos=2,
            hot_fraction=0.1, paths_per_repo=200, content_repeat=16,
            n_spark_partitions=cpus * 2,
        ).write.parquet(seed_path)
        clu_path = os.path.join(work, "clu_log")
        (
            generate_event_log(
                spark, 300_000, seed=8, n_repos=500, n_mega_repos=2,
                hot_fraction=0.1, paths_per_repo=200, content_repeat=16,
                key_locality=48, locality_window=100_000,
                n_spark_partitions=cpus * 2,
            )
            # updates arrive AFTER the seed epoch: shift LSNs past the seed
            # log's range (otherwise the exactly-once watermark correctly
            # rejects them as already-applied)
            .withColumn("lsn", F.col("lsn") + F.lit(200_000))
            .withColumn("source_offset", F.col("source_offset") + F.lit(200_000))
            .write.parquet(clu_path)
        )
        cn = spark.read.parquet(clu_path).count()

        def run_replay() -> float:
            root = tempfile.mkdtemp(prefix="bench_cdc_")
            try:
                log = spark.read.parquet(replay_path)
                eng = CdcEngine(spark, root, num_buckets=32, use_arrow_normalize=False)
                t0 = time.monotonic()
                eng.apply_log(log, n_batches=4, total_events=n_events, cache_log=False)
                return time.monotonic() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)

        def run_generator() -> float:
            root = tempfile.mkdtemp(prefix="bench_gen_")
            try:
                log = spark.read.parquet(gen_path)
                eng = CdcEngine(spark, root, num_buckets=32, use_arrow_normalize=False)
                t0 = time.monotonic()
                eng.apply_log(log, n_batches=1, total_events=gn, cache_log=False)
                return time.monotonic() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)

        def run_clustered() -> float:
            # key-CLUSTERED update batches against an already-populated table
            # — the realistic CDC regime (a batch touches a small active
            # working set; manifest bucket pruning bounds the COW rewrite to
            # the touched buckets). Seeding is NOT timed.
            root = tempfile.mkdtemp(prefix="bench_clu_")
            try:
                eng = CdcEngine(spark, root, num_buckets=256, use_arrow_normalize=False)
                eng.apply_log(
                    spark.read.parquet(seed_path),
                    n_batches=1, total_events=200_000, cache_log=False,
                )
                clu = spark.read.parquet(clu_path)
                t0 = time.monotonic()
                eng.apply_log(clu, n_batches=3, total_events=cn, cache_log=False)
                return time.monotonic() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)

        def run_clustered_mor() -> tuple[float, float]:
            # the SAME clustered-update scenario in merge-on-read mode: each
            # batch commits as delta files (no base rewrite), so write cost
            # is O(batch) instead of O(touched buckets). The folded read
            # afterwards is timed separately — the MOR trade measured on
            # both sides.
            root = tempfile.mkdtemp(prefix="bench_mor_")
            try:
                eng = CdcEngine(spark, root, num_buckets=256,
                                use_arrow_normalize=False, write_mode="mor",
                                auto_compact_every=None)
                eng.apply_log(
                    spark.read.parquet(seed_path),
                    n_batches=1, total_events=200_000, cache_log=False,
                )
                clu = spark.read.parquet(clu_path)
                t0 = time.monotonic()
                eng.apply_log(clu, n_batches=3, total_events=cn, cache_log=False)
                w = time.monotonic() - t0
                t0 = time.monotonic()
                eng.final_state().count()  # read through the LWW fold
                return w, time.monotonic() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)

        points = {
            "replay": run_replay,
            "generator": run_generator,
            "clustered": run_clustered,
            "clustered_mor": run_clustered_mor,
        }
        best: dict[str, float] = {}
        for _it in range(N_ITERS):
            for name, fn in points.items():  # interleaved: noise hits all
                e = fn()
                if name not in best:
                    best[name] = e
                elif isinstance(e, tuple):
                    # multi-metric point (MOR write + folded read): each
                    # component is an independent timing of a deterministic
                    # workload, so best-of-N applies PER COMPONENT — a
                    # lexicographic tuple-min would let a one-off hiccup in
                    # the read ride along with the best write iteration
                    best[name] = tuple(
                        min(a, b) for a, b in zip(best[name], e)
                    )
                elif e < best[name]:
                    best[name] = e
    finally:
        shutil.rmtree(work, ignore_errors=True)

    elapsed = best["replay"]
    gen_elapsed = best["generator"]
    clu_elapsed = best["clustered"]
    mor_w, mor_r = best["clustered_mor"]  # component-wise best-of (above)
    timings["cdc_replay_full_engine"] = round(elapsed, 3)
    timings["cdc_apply_generator_500k_1kb"] = round(gen_elapsed, 3)
    timings["cdc_apply_clustered_updates_300k"] = round(clu_elapsed, 3)
    timings["cdc_apply_mor_clustered_300k"] = round(mor_w, 3)
    timings["cdc_mor_folded_read"] = round(mor_r, 3)

    print(
        json.dumps(
            {
                "metric": "cdc_apply_events_per_sec",
                "value": round(n_events / elapsed, 1),
                "unit": "events/sec",
                "elapsed_sec": round(elapsed, 3),
                "n_events": n_events,
                "generator_events_per_sec": round(gn / gen_elapsed, 1),
                "clustered_update_events_per_sec": round(cn / clu_elapsed, 1),
                "mor_clustered_events_per_sec": round(cn / mor_w, 1),
                "best_of": N_ITERS,
                "queries": timings,
                "sf1_queries": sf1_timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
