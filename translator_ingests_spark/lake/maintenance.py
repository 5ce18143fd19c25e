"""Lake maintenance: snapshot expiry (GC) and small-file compaction.

Reference analogs: S15 old-version cleanup
(/root/reference/src/translator_ingest/util/storage/s3.py:220-366) and the
save-memory merge mode — re-expressed as Iceberg-style `expire_snapshots`
plus a bucket-range compaction that rewrites many small files into few,
folding tombstones out once no retained snapshot needs them.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from translator_ingests_spark.lake.table import (
    LakeTable,
    Snapshot,
    _bucket_range_from_footer,
)


def expire_snapshots(table: LakeTable, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete data files
    referenced by no retained snapshot. The current pointer is never
    touched; deletion order (files before manifests) keeps every retained
    snapshot readable at all times."""
    history = table.history()
    if len(history) <= keep_last:
        return {"snapshots_removed": 0, "files_removed": 0}
    keep = set(history[-keep_last:])
    keep.add(table.current().version)

    live: set[str] = set()
    for v in keep:
        snap = table.snapshot_at(v)
        live.update(f["path"] for f in snap.files)

    removed_files = 0
    data_root = os.path.join(table.root, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for fn in files:
            full = os.path.join(dirpath, fn)
            if full.endswith(".parquet") and full not in live:
                os.remove(full)
                removed_files += 1

    removed_snaps = 0
    for v in history:
        if v not in keep:
            os.remove(table._snapshot_path(v))
            removed_snaps += 1
    return {"snapshots_removed": removed_snaps, "files_removed": removed_files}


def compact(table: LakeTable, target_files: int | None = None,
            drop_tombstones: bool = False, force: bool = False) -> Snapshot:
    """Rewrite the table's data files into ~target_files range-partitioned
    files. With ``drop_tombstones`` the retained delete markers are folded
    out — **watermark-gated**: only tombstones with ``last_lsn`` at or below
    the snapshot's ``low_watermark`` are dropped, because the merge path
    rejects any future event at or below the watermark, so a dropped
    tombstone can never be resurrected by a redelivered stale update.
    Tombstones above the watermark (still-contested LSN territory) are kept.
    ``force=True`` drops ALL tombstones regardless — only for callers that
    own an external retention guarantee."""
    snap = table.current()
    df = table._read_files(snap, snap.files, raw=True)
    if drop_tombstones:
        from translator_ingests_spark.lake.table import TOMBSTONE_COL

        is_tomb = F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
        if force:
            df = df.filter(~is_tomb)
        else:
            df = df.filter(
                ~is_tomb | (F.col(snap.lsn_col) > F.lit(snap.low_watermark))
            )
    df = df.withColumn(
        "__bucket", table._bucket_expr(snap.num_buckets, snap.key_cols)
    )
    n = target_files or max(1, snap.num_buckets // 4)
    new_version = snap.version + 1
    out_dir = table._data_dir(new_version)
    (
        df.repartitionByRange(n, "__bucket")
        .sortWithinPartitions("__bucket")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    new_files = []
    for fn in sorted(os.listdir(out_dir)):
        if not fn.endswith(".parquet"):
            continue
        path = os.path.join(out_dir, fn)
        rng = _bucket_range_from_footer(path)
        if rng is None:
            continue
        new_files.append(
            {"path": path, "schema_version": snap.schema_version,
             "bucket_min": rng[0], "bucket_max": rng[1]}
        )
    new_snap = Snapshot(
        version=new_version,
        parent=snap.version,
        batch_id=None,
        last_batch_id=snap.last_batch_id,
        schema_version=snap.schema_version,
        schemas=snap.schemas,
        num_buckets=snap.num_buckets,
        key_cols=snap.key_cols,
        lsn_col=snap.lsn_col,
        files=new_files,
        code_hash=snap.code_hash,
        added_lsn=snap.added_lsn,
        low_watermark=snap.low_watermark,
        operation="compact",
        # record how far tombstones may have been folded out: consumers of
        # the raw state (merge_lakes) rebuild if this passes their watermark
        tombstones_dropped_below=(
            (2**62 if force else max(snap.tombstones_dropped_below, snap.low_watermark))
            if drop_tombstones
            else snap.tombstones_dropped_below
        ),
    )
    table._commit_snapshot(new_snap)
    return new_snap
