"""spark-submit entrypoint: tail a change-event log into a lake table.

Usage:
  spark-submit --py-files translator_ingests_spark.zip jobs/apply_log_job.py \
      --events <parquet path or event count for the seeded generator> \
      --table-root /path/to/lake \
      [--batches 8] [--buckets 64] [--stream] [--validate]

With ``--stream`` the events path is tailed via Structured Streaming
(AvailableNow); otherwise the batch micro-loop runs. ``--validate`` runs the
replay-validation gate afterwards and exits non-zero on failure.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--events", required=True,
                   help="parquet path of the event log, or an integer to use "
                        "the deterministic generator")
    p.add_argument("--table-root", required=True)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--partial-updates", action="store_true",
                   help="treat NULL value columns in non-delete events as "
                        "'no change' (sparse column patches; requires cow)")
    p.add_argument("--write-mode", choices=["cow", "mor", "auto"], default="cow",
                   help="cow rewrites touched bucket files per batch; mor "
                        "commits delta files (O(batch) writes, read-time "
                        "LWW fold, folded back on the compaction cadence); "
                        "auto decides per batch from manifest row stats")
    p.add_argument("--staged", action="store_true",
                   help="write-audit-publish: commit units staged (invisible "
                        "to readers); with --validate, publish on pass and "
                        "roll back on failure — without it, publish later "
                        "via maintenance_job.py publish")
    p.add_argument("--stream", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="streaming checkpoint dir (required with --stream)")
    p.add_argument("--validate", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("cdc-apply-log").getOrCreate()

    from translator_ingests_spark.cdc.apply import EVENT_SCHEMA, CdcEngine
    from translator_ingests_spark.cdc.generator import generate_event_log

    engine = CdcEngine(spark, args.table_root, num_buckets=args.buckets,
                       write_mode=args.write_mode,
                       partial_updates=args.partial_updates,
                       staged=args.staged)

    if args.stream:
        from translator_ingests_spark.streaming import CdcStream

        if not args.checkpoint:
            p.error("--stream requires --checkpoint")
        CdcStream(engine, args.events, args.checkpoint).run_available_now()
        manifests = engine.manifests()
    else:
        if args.events.isdigit():
            log = generate_event_log(spark, int(args.events), seed=42)
            cache_log = True
        else:
            log = spark.read.schema(EVENT_SCHEMA).parquet(args.events)
            # the log is already on shared storage: re-scan instead of
            # pinning a Spark cache per executor (multi-executor poison)
            cache_log = False
        manifests = engine.apply_log(log, n_batches=args.batches, cache_log=cache_log)

    total = sum(m["metrics"]["events_in"] for m in manifests)
    print(json.dumps({"batches_committed": len(manifests), "events_applied": total,
                      "snapshot": engine.table.head().version,
                      "published": engine.table.current().version}))

    if args.validate:
        from translator_ingests_spark.cdc.validate import validate_engine_state

        report = validate_engine_state(engine)
        print(json.dumps({"validation": report}))
        if not report["passed"]:
            if args.staged:
                snap = engine.rollback_staged()
                print(json.dumps({"rollback": snap.version}))
            return 1
        if args.staged:
            snap = engine.publish_staged()
            print(json.dumps({"published": snap.version}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
