"""spark-submit entrypoint for lake-table maintenance and predicate DML.

Usage:
  spark-submit --py-files translator_ingests_spark.zip jobs/maintenance_job.py \
      --table-root /path/to/lake <command> [options]

Commands:
  compact              incremental compaction (tombstoned + delta files only)
  compact-full         full rewrite (optionally --target-files N)
  rebucket             partition-spec evolution: --num-buckets N (or --auto
                       to take suggest_num_buckets' advice; no-op when the
                       current count already satisfies the target)
  expire               snapshot GC: --keep-last N
  sync-replica         exactly-once replica sync via the change feed:
                       --replica-root PATH --cursor-dir PATH [--name N]
                       (creates the replica on first run)
  refresh-agg          incremental aggregate refresh: --agg-root PATH
                       --group-cols a,b [--sum/--max/--min out=src_col ...]
                       [--no-auto-strategy]
  delete-where         bulk delete: --predicate "<SQL bool expr>" --at-lsn N
  update-where         bulk update: --predicate ... --set "col=<SQL expr>"
                       (repeatable) --at-lsn N

delete-where / update-where also take --preds '<JSON [[col,op,value],...]>'
(ops = < <= > >= in, conjunctive): triples compile to the same filter AND
stat-prune the probe scan via the manifest column bounds (lake/scan.py), so
the probe reads only possibly-matching files instead of the whole table.
--predicate and --preds compose (ANDed); at least one is required.

Every command prints one JSON line with the resulting snapshot version and
operation so schedulers can assert on the outcome.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--table-root", required=True)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("compact")
    full = sub.add_parser("compact-full")
    full.add_argument("--target-files", type=int, default=None)
    full.add_argument("--drop-tombstones", action="store_true")
    reb = sub.add_parser("rebucket")
    reb.add_argument("--num-buckets", type=int, default=None)
    reb.add_argument("--auto", action="store_true",
                     help="use suggest_num_buckets' manifest-stat advice")
    reb.add_argument("--target-rows-per-bucket", type=int, default=2_000_000)
    clu = sub.add_parser("cluster")
    clu.add_argument("--cols", required=True,
                     help="comma-separated secondary-clustering columns")
    clu.add_argument("--target-files", type=int, default=None)
    zo = sub.add_parser("zorder")
    zo.add_argument("--cols", required=True,
                    help="comma-separated columns to z-order (>= 2)")
    zo.add_argument("--target-files", type=int, default=None)
    zo.add_argument("--bits", type=int, default=8)
    exp = sub.add_parser("expire")
    exp.add_argument("--keep-last", type=int, default=2)
    exp.add_argument("--orphan-grace", type=float, default=3600.0,
                     help="seconds an UNREFERENCED file must be old before "
                          "GC may assume it is not an in-flight writer's")
    exp.add_argument("--max-cursor-lag", type=int, default=None,
                     help="evict registered consumer pins more than this "
                          "many versions behind head (default: pins hold)")
    exp.add_argument("--ignore-cursors", action="store_true",
                     help="expire without retaining registered consumer "
                          "cursors (they will re-bootstrap)")
    sub.add_parser("publish")   # write-audit-publish: make staged visible
    sub.add_parser("rollback")  # discard the staged suffix
    rep = sub.add_parser("sync-replica")
    rep.add_argument("--replica-root", required=True)
    rep.add_argument("--cursor-dir", required=True)
    rep.add_argument("--name", default="replica")
    ra = sub.add_parser("refresh-agg")
    ra.add_argument("--agg-root", required=True,
                    help="root for the aggregate's state table + cursor")
    ra.add_argument("--group-cols", required=True,
                    help="comma-separated grouping columns")
    ra.add_argument("--sum", action="append", default=[],
                    help='sum spec "out_col=source_col", repeatable')
    ra.add_argument("--max", action="append", default=[],
                    help='max spec "out_col=source_col", repeatable '
                         "(switches to affected-group recompute)")
    ra.add_argument("--min", action="append", default=[],
                    help='min spec "out_col=source_col", repeatable')
    ra.add_argument("--count-col", default="n_rows")
    ra.add_argument("--no-auto-strategy", action="store_true",
                    help="always take the incremental path, never the "
                         "metadata-picked full regroup")
    dw = sub.add_parser("delete-where")
    dw.add_argument("--predicate", default=None)
    dw.add_argument("--preds", default=None,
                    help='JSON triples [[col,op,value],...] — stat-prunes the probe')
    dw.add_argument("--at-lsn", type=int, required=True)
    uw = sub.add_parser("update-where")
    uw.add_argument("--predicate", default=None)
    uw.add_argument("--preds", default=None,
                    help='JSON triples [[col,op,value],...] — stat-prunes the probe')
    uw.add_argument("--set", action="append", required=True,
                    help='assignment "col=<SQL expr>", repeatable')
    uw.add_argument("--at-lsn", type=int, required=True)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName(f"lake-{args.cmd}").getOrCreate()

    from translator_ingests_spark.lake import maintenance
    from translator_ingests_spark.lake.table import LakeTable

    table = LakeTable(spark, args.table_root)
    out: dict = {"cmd": args.cmd}

    if args.cmd == "compact":
        snap = maintenance.compact_incremental(table)
        out.update(version=snap.version, operation=snap.operation)
    elif args.cmd == "compact-full":
        snap = maintenance.compact(
            table, target_files=args.target_files,
            drop_tombstones=args.drop_tombstones,
        )
        out.update(version=snap.version, operation=snap.operation)
    elif args.cmd == "rebucket":
        if args.auto:
            nb = maintenance.suggest_num_buckets(
                table.current(), target_rows_per_bucket=args.target_rows_per_bucket
            )
            if nb is None:
                out.update(version=table.current().version, operation="noop",
                           reason="bucket count already satisfies the target")
                print(json.dumps(out))
                return 0
        else:
            if args.num_buckets is None:
                p.error("rebucket needs --num-buckets or --auto")
            nb = args.num_buckets
        snap = maintenance.rebucket(table, nb)
        out.update(version=snap.version, operation=snap.operation, num_buckets=nb)
    elif args.cmd == "cluster":
        snap = maintenance.cluster_by(
            table, [c.strip() for c in args.cols.split(",") if c.strip()],
            target_files=args.target_files,
        )
        out.update(version=snap.version, operation=snap.operation)
    elif args.cmd == "zorder":
        snap = maintenance.z_order_by(
            table, [c.strip() for c in args.cols.split(",") if c.strip()],
            target_files=args.target_files, bits=args.bits,
        )
        out.update(version=snap.version, operation=snap.operation)
    elif args.cmd == "expire":
        res = maintenance.expire_snapshots(
            table, keep_last=args.keep_last, orphan_grace_s=args.orphan_grace,
            respect_cursors=not args.ignore_cursors,
            max_cursor_lag=args.max_cursor_lag,
        )
        out.update(version=table.current().version, **res)
    elif args.cmd in ("publish", "rollback"):
        from translator_ingests_spark.lake import wap

        n_staged = len(wap.staged_versions(table))
        snap = (wap.publish_staged(table) if args.cmd == "publish"
                else wap.rollback_staged(table))
        out.update(version=snap.version, operation=snap.operation,
                   staged_resolved=n_staged)
    elif args.cmd == "sync-replica":
        from translator_ingests_spark.lake import derived
        from translator_ingests_spark.streaming.change_consumer import (
            ChangesConsumer,
        )

        dst = LakeTable(spark, args.replica_root)
        if not dst.exists():
            dst = derived.create_replica(spark, table, args.replica_root)
        cons = ChangesConsumer(table, args.cursor_dir, name=args.name)
        n = derived.sync_replica(table, dst, cons)
        out.update(version=dst.current().version, operation="sync_replica",
                   batches_applied=n)
    elif args.cmd == "refresh-agg":
        from translator_ingests_spark.lake.derived import IncrementalAggregate

        def specs(items, flag):
            out_specs = {}
            for s in items:
                o, _, c = s.partition("=")
                if not c:
                    p.error(f'{flag} needs "out_col=source_col", got {s!r}')
                out_specs[o.strip()] = c.strip()
            return out_specs

        agg = IncrementalAggregate(
            spark, table, args.agg_root,
            group_cols=[c.strip() for c in args.group_cols.split(",") if c.strip()],
            sums=specs(args.sum, "--sum"),
            maxes=specs(args.max, "--max"),
            mins=specs(args.min, "--min"),
            count_col=args.count_col,
            auto_strategy=not args.no_auto_strategy,
        )
        n = agg.refresh()
        out.update(version=agg.state.current().version,
                   operation="refresh_agg", batches_applied=n,
                   groups=agg.read().count())
    elif args.cmd in ("delete-where", "update-where"):
        from translator_ingests_spark.lake.dml import delete_where, update_where

        if args.predicate is None and args.preds is None:
            p.error(f"{args.cmd} needs --predicate and/or --preds")
        cond = F.expr(args.predicate) if args.predicate else None
        preds = (
            [tuple(t) for t in json.loads(args.preds)] if args.preds else None
        )
        if args.cmd == "delete-where":
            snap = delete_where(table, cond, at_lsn=args.at_lsn, preds=preds)
        else:
            assignments = {}
            for a in args.set:
                col, _, expr = a.partition("=")
                if not expr:
                    p.error(f'--set needs "col=<SQL expr>", got {a!r}')
                assignments[col.strip()] = F.expr(expr)
            snap = update_where(
                table, cond, assignments, at_lsn=args.at_lsn, preds=preds
            )
        out.update(version=snap.version, operation=snap.operation)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
