"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline metric is the CDC apply throughput (change-events/sec applied,
sustained MERGE throughput — BASELINE.json metric); per-query wall times for
the operator suite ride along in "queries".
"""

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
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from translator_ingests_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM/codegen once with a trivial action
    spark.range(1000).count()

    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        _ = n

    # headline: CDC apply throughput (events/sec through the full engine)
    from translator_ingests_spark.cdc.apply import CdcEngine
    from translator_ingests_spark.operators.cdc_queries import events_as_cdc_log

    root = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        log = events_as_cdc_log(spark, sf_dir).persist()
        n_events = log.count()
        eng = CdcEngine(spark, root, num_buckets=32, use_arrow_normalize=False)
        t0 = time.monotonic()
        eng.apply_log(log, n_batches=4, total_events=n_events)
        elapsed = time.monotonic() - t0
        log.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    timings["cdc_replay_full_engine"] = round(elapsed, 3)
    events_per_sec = round(n_events / elapsed, 1)

    # second throughput point: seeded generator log with realistic ~1KB
    # source-file contents, one sustained micro-batch (amortized regime)
    from translator_ingests_spark.cdc.generator import generate_event_log

    root2 = tempfile.mkdtemp(prefix="bench_gen_")
    try:
        glog = generate_event_log(
            spark, 500_000, seed=42, n_repos=500, n_mega_repos=2,
            hot_fraction=0.3, paths_per_repo=200, content_repeat=16,
            n_spark_partitions=cpus * 2,
        ).persist()
        gn = glog.count()
        eng2 = CdcEngine(spark, root2, num_buckets=32, use_arrow_normalize=False)
        t0 = time.monotonic()
        eng2.apply_log(glog, n_batches=1, total_events=gn)
        gen_elapsed = time.monotonic() - t0
        glog.unpersist()
    finally:
        shutil.rmtree(root2, ignore_errors=True)
    gen_eps = round(gn / gen_elapsed, 1)
    timings["cdc_apply_generator_500k_1kb"] = round(gen_elapsed, 3)

    # third throughput point: key-CLUSTERED update batches against an
    # already-populated table — the realistic CDC regime (a batch touches a
    # small active working set, so manifest bucket pruning bounds the COW
    # rewrite to the touched buckets, not the whole table)
    root3 = tempfile.mkdtemp(prefix="bench_clu_")
    try:
        seed_log = generate_event_log(
            spark, 200_000, seed=7, n_repos=500, n_mega_repos=2,
            hot_fraction=0.1, paths_per_repo=200, content_repeat=16,
            n_spark_partitions=cpus * 2,
        )
        eng3 = CdcEngine(spark, root3, num_buckets=256, use_arrow_normalize=False)
        eng3.apply_log(seed_log, n_batches=1, total_events=200_000)
        from pyspark.sql import functions as F

        clu_log = (
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
            .persist()
        )
        cn = clu_log.count()
        t0 = time.monotonic()
        ms = eng3.apply_log(clu_log, n_batches=3, total_events=cn)
        clu_elapsed = time.monotonic() - t0
        clu_log.unpersist()
        _ = ms
    finally:
        shutil.rmtree(root3, ignore_errors=True)
    clu_eps = round(cn / clu_elapsed, 1)
    timings["cdc_apply_clustered_updates_300k"] = round(clu_elapsed, 3)

    print(
        json.dumps(
            {
                "metric": "cdc_apply_events_per_sec",
                "value": events_per_sec,
                "unit": "events/sec",
                "elapsed_sec": round(elapsed, 3),
                "n_events": n_events,
                "generator_events_per_sec": gen_eps,
                "clustered_update_events_per_sec": clu_eps,
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
