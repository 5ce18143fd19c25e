"""Interleaved A/B of the fused vs join COW merge on the bench replay point.

The host's load drifts in multi-minute ±3x waves, so back-to-back process
runs are incomparable; this interleaves variants within one session and
reports per-variant best-of-N (the bench's own noise methodology).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/ab_merge.py [iters]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from translator_ingests_spark.session import get_spark

    spark = get_spark("ab_merge", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    from translator_ingests_spark.cdc.apply import CdcEngine
    from translator_ingests_spark.operators.cdc_queries import events_as_cdc_log

    work = tempfile.mkdtemp(prefix="ab_merge_")
    samples: dict[str, list[float]] = {"fuse": [], "join": []}
    try:
        log_path = os.path.join(work, "replay_log")
        events_as_cdc_log(spark, sf_dir).write.parquet(log_path)
        n = spark.read.parquet(log_path).count()

        def run() -> float:
            root = tempfile.mkdtemp(prefix="ab_cdc_")
            try:
                eng = CdcEngine(spark, root, num_buckets=32,
                                use_arrow_normalize=False)
                t0 = time.monotonic()
                eng.apply_log(spark.read.parquet(log_path), n_batches=4,
                              total_events=n, cache_log=False)
                return time.monotonic() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)

        for _ in range(iters):
            for variant, flag in (("fuse", "1"), ("join", "0")):
                os.environ["SPARK_GRAFT_MERGE_FUSE"] = flag
                samples[variant].append(round(run(), 3))
    finally:
        os.environ.pop("SPARK_GRAFT_MERGE_FUSE", None)
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        v: {"best": min(s), "samples": s} for v, s in samples.items()
    }))


if __name__ == "__main__":
    main()
