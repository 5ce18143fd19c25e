"""Billion-event apply run at local[32] — scale evidence toward the north
rule's 10^10-event regime, one order of magnitude past the 96M-event train
in BENCH/BASELINE.md.

What this validates that the 96M run cannot:

1. **Driver/manifest behavior at >=1,000 accumulated snapshots.** A
   1,000-batch train commits >=1,000 snapshots (plus auto-compaction
   commits); the manifest-segment store and its LRU (lake/table.py:150-240)
   must keep snapshot load O(touched segments) and driver heap flat — not
   O(total history). Sampled every chunk: driver JVM heap after System.gc(),
   manifest dir size/file count, and a COLD table open (fresh LakeTable —
   no warm segment cache) timing `current()` + full file-list materialize.
2. **Sustained throughput with the maintenance cadence engaged** —
   auto-compaction every 16 commits, tombstone folding, pointer heals — for
   ~10^3 commits, not ~10^1.

The log never exists in full on local disk (it wouldn't fit: ~109 B/event
parquet => ~109 GB): it is generated and materialized to parquet in chunks
— every generator column is a pure function of (seed, lsn), so chunk
[i*C, (i+1)*C) is byte-identical to that slice of a full-range generation
(cdc/generator.py lsn_start). Each chunk is written to "shared storage"
(parquet, no Spark cache), applied in events_per_batch micro-batches, then
deleted. Only APPLY time counts toward throughput; generation is synthetic
input cost a production tail doesn't pay (it reads the upstream log), and
is reported separately.

Workload parameters match the 96M baseline exactly (seed=42, 500 repos,
2 mega-repos at 30% hot fraction, 200 paths/repo, content_repeat=2).

Usage:
  python tools/bench_billion.py [total] [per_batch] [chunk] [mode]
  python tools/bench_billion.py 1000000000 1000000 50000000 cow
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _dir_stats(path: str) -> tuple[int, int]:
    n, total = 0, 0
    for r, _, fs in os.walk(path):
        for f in fs:
            n += 1
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return n, total


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000_000
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000_000
    mode = sys.argv[4] if len(sys.argv) > 4 else "cow"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from translator_ingests_spark.cdc.apply import CdcEngine
    from translator_ingests_spark.cdc.generator import generate_event_log
    from translator_ingests_spark.lake.table import LakeTable
    from translator_ingests_spark.session import get_spark
    from tools.probe_membw import probe as env_probe

    spark = get_spark(
        "billion", cores=cores, shuffle_partitions=64,
        extra_conf={
            # the apply loop's content plane is allocation-heavy; default 5%
            # G1 young gen turns that into GC churn (BENCH/SCALING_NOTES.md)
            "spark.driver.extraJavaOptions":
                "-XX:+UnlockExperimentalVMOptions "
                "-XX:G1NewSizePercent=50 -XX:G1MaxNewSizePercent=70",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm

    def heap_mb() -> float:
        jvm.java.lang.System.gc()
        rt = jvm.java.lang.Runtime.getRuntime()
        return (rt.totalMemory() - rt.freeMemory()) / 1e6

    env0 = env_probe(quick=True)
    print(f"env: DRAM {env0['membw_aggregate_gbps_2p']}->"
          f"{env0['membw_aggregate_gbps_8p']} GB/s, cpu scaling "
          f"{env0['cpu_scaling_2_to_8']}"
          + (" — WINDOW IS BANDWIDTH-BOUND" if env0["bandwidth_bound"] else ""))

    root = tempfile.mkdtemp(prefix=f"billion_{mode}_")
    eng = CdcEngine(spark, root, num_buckets=64, use_arrow_normalize=False,
                    write_mode=mode)

    # warm-up: JIT the hot codegen loops on a throwaway table
    warm_root = tempfile.mkdtemp(prefix="billion_warm_")
    warm = CdcEngine(spark, warm_root, num_buckets=32,
                     use_arrow_normalize=False, write_mode=mode)
    wlog = generate_event_log(
        spark, 200_000, seed=42, n_repos=500, n_mega_repos=2,
        hot_fraction=0.3, paths_per_repo=200, content_repeat=2,
        n_spark_partitions=cores * 2)
    warm.apply_log(wlog, n_batches=1, total_events=200_000, cache_log=False)
    shutil.rmtree(warm_root, ignore_errors=True)

    apply_s = 0.0
    gen_s = 0.0
    samples: list[dict] = []
    t_start = time.monotonic()
    n_chunks = -(-total // chunk)
    for ci in range(n_chunks):
        lo = ci * chunk
        n_ev = min(chunk, total - lo)
        chunk_dir = tempfile.mkdtemp(prefix="billion_log_")
        log_path = os.path.join(chunk_dir, "log.parquet")
        t0 = time.monotonic()
        generate_event_log(
            spark, n_ev, seed=42, n_repos=500, n_mega_repos=2,
            hot_fraction=0.3, paths_per_repo=200, content_repeat=2,
            n_spark_partitions=max(cores * 4, 128), lsn_start=lo,
        ).write.parquet(log_path)
        gen_s += time.monotonic() - t0

        log = spark.read.parquet(log_path)
        t0 = time.monotonic()
        eng.apply_log(log, events_per_batch=per_batch, total_events=n_ev,
                      cache_log=False)
        apply_s += time.monotonic() - t0
        shutil.rmtree(chunk_dir, ignore_errors=True)

        # cold open: a FRESH handle (no warm segment cache) loads the
        # pointer, snapshot json, and materializes the full file list
        t0 = time.monotonic()
        cold = LakeTable(spark, eng.table.root)
        snap = cold.current()
        n_files = len(snap.files)
        cold_open_s = time.monotonic() - t0
        mn, msz = _dir_stats(os.path.join(eng.table.root, "manifests"))
        sn, ssz = _dir_stats(os.path.join(eng.table.root, "snapshots"))
        s = {
            "events_applied": lo + n_ev,
            "snapshots": snap.version,
            "apply_s": round(apply_s, 1),
            "events_per_sec": round((lo + n_ev) / apply_s),
            "driver_heap_mb": round(heap_mb()),
            "cold_open_s": round(cold_open_s, 3),
            "live_files": n_files,
            "manifest_files": mn,
            "manifest_mb": round(msz / 1e6, 1),
            "snapshot_json_mb": round(ssz / 1e6, 1),
            "snapshot_files": sn,
        }
        samples.append(s)
        print(json.dumps(s), flush=True)

    wall = time.monotonic() - t_start
    final = samples[-1]
    result = {
        "mode": mode, "cores": cores, "total_events": total,
        "events_per_batch": per_batch, "chunk_events": chunk,
        "apply_elapsed_s": round(apply_s, 1),
        "events_per_sec": round(total / apply_s),
        "gen_elapsed_s": round(gen_s, 1),
        "wall_s": round(wall, 1),
        "snapshots": final["snapshots"],
        "driver_heap_mb_series": [s["driver_heap_mb"] for s in samples],
        "cold_open_s_series": [s["cold_open_s"] for s in samples],
        "final": final,
        "env": env0,
    }
    print(json.dumps(result), flush=True)
    out = os.path.join(REPO, "BENCH", f"billion_{mode}.json")
    with open(out, "w") as fh:
        json.dump({"samples": samples, "result": result}, fh, indent=1)
    print(f"wrote {out}")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
