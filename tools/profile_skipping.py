"""Data-skipping effectiveness at scale: the measured I/O-reduction story
for BENCH/SKIPPING.md.

Builds a lake table from the deterministic generator log, then measures —
files actually opened (manifest math) and wall time (best-of-3) — each
skipping layer:

1. column-stat file pruning after linear clustering (lake/scan.py):
   `read_where` vs the same filter over the full file list;
2. z-order: file pruning for predicates on EACH clustered dimension;
3. point lookup on a bloom-filter column (commit sha — min/max useless):
   pushed equality over tables written with vs without parquet blooms.

Every number is derived from the same committed table state; nothing is
synthetic except the input log (seeded). Usage:

    python tools/profile_skipping.py [n_events] [cpus]   (default 400000 8)
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


def timed(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from translator_ingests_spark.session import get_spark

    spark = get_spark("profile-skipping", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from translator_ingests_spark.cdc.apply import CdcEngine
    from translator_ingests_spark.cdc.generator import generate_event_log
    from translator_ingests_spark.lake import scan
    from translator_ingests_spark.lake.maintenance import cluster_by, z_order_by

    root = tempfile.mkdtemp(prefix="skipping_prof_")
    results: dict = {"n_events": n_events, "cpus": cpus}
    try:
        log = generate_event_log(spark, n_events, seed=42)
        eng = CdcEngine(spark, os.path.join(root, "plain"), num_buckets=32,
                        auto_compact_every=None)
        eng.apply_log(log, n_batches=1)
        table = eng.table

        # -- 1. bloom column point lookup (commit sha) ----------------------
        # measured FIRST so both tables sit in the identical merged layout
        target = (
            table.read().select("commit").orderBy("repo", "path")
            .limit(1).collect()[0]["commit"]
        )
        blm = CdcEngine(spark, os.path.join(root, "bloom"), num_buckets=32,
                        auto_compact_every=None,
                        bloom_cols={"commit": 20_000})
        blm.apply_log(log, n_batches=1)

        def point(t):
            return t.read().filter(F.col("commit") == target).count()

        results["bloom_commit_point"] = {
            "t_plain_s": round(timed(lambda: point(table)), 3),
            "t_bloom_s": round(timed(lambda: point(blm.table)), 3),
            "bytes_plain": sum(os.path.getsize(f["path"])
                               for f in table.current().files),
            "bytes_bloom": sum(os.path.getsize(f["path"])
                               for f in blm.table.current().files),
        }

        # -- 2. linear clustering + column-stat file pruning ----------------
        snap = cluster_by(table, ["lang"], target_files=32)
        preds = [("lang", "=", "rust")]
        pruned = scan.prune_files(table, snap, preds)
        t_full = timed(lambda: table.read().filter(F.col("lang") == "rust").count())
        t_pruned = timed(lambda: scan.read_where(table, preds).count())
        n_match = scan.read_where(table, preds).count()
        results["cluster_lang"] = {
            "files_total": len(snap.files), "files_read": len(pruned),
            "skip_ratio": round(1 - len(pruned) / len(snap.files), 3),
            "t_full_filter_s": round(t_full, 3),
            "t_pruned_s": round(t_pruned, 3),
            "rows_matched": n_match,
        }

        # -- 3. z-order: both dimensions prune ------------------------------
        snap = z_order_by(table, ["repo", "lang"], target_files=32)
        out = {}
        for col, val in (("repo", "org/repo-00013"), ("lang", "rust")):
            p = [(col, "=", val)]
            kept = scan.prune_files(table, snap, p)
            out[col] = {
                "files_total": len(snap.files), "files_read": len(kept),
                "skip_ratio": round(1 - len(kept) / len(snap.files), 3),
                "t_pruned_s": round(
                    timed(lambda p=p: scan.read_where(table, p).count()), 3),
                "rows_matched": scan.read_where(table, p).count(),
            }
        results["zorder_repo_lang"] = out

        print(json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
