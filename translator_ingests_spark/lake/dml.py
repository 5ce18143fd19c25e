"""Predicate DML over the lake table: bulk DELETE WHERE / UPDATE WHERE.

The CDC event path expresses deletes per key; compliance-style bulk
operations ("purge every row of repo X", "null the content of every .pem
file") need a predicate form — the Delta/Iceberg `DELETE FROM ... WHERE`
analog. Both operations follow the same two-phase scale shape:

1. **Probe** (one column-pruned scan): find the FILES that hold visible
   rows matching the predicate, via ``input_file_name()`` + a distinct-file
   aggregation. Files without matches are never rewritten — cost of phase 2
   is O(matching files), not O(table). An arbitrary predicate cannot prune
   below one scan (no stats exist for it); predicates on key columns should
   use the CDC delete path or ``LakeTable.lookup`` instead.
2. **Targeted rewrite**: the matching files (bucket-closure-expanded when
   merge-on-read deltas overlap them) are read as NET state, the predicate
   rows are tombstoned (delete) or column-rewritten (update) at ``at_lsn``,
   and the manifest splices every untouched file through unchanged — the
   same discipline as incremental compaction.

Deleted rows become ordinary tombstones at ``at_lsn``: a later CDC event
with a higher LSN legitimately re-inserts the key; a redelivered stale
update cannot resurrect it.

Predicates evaluate against the STORED columns (probe and rewrite agree on
this by construction). For a column added by schema evolution, rows merged
*before* the add store the value only in the hidden ``__extras`` map until
their next merge — a predicate on such a column sees NULL there, while
``read()`` materializes it. Run a compaction first if a DML predicate must
see extras-materialized values. Re-running the same DELETE is a no-op (the
probe sees no visible matches). ``at_lsn`` must exceed every applied LSN
for the affected keys — the caller owns that contract (use the engine's
manifest ``applied_lsn_max`` + 1), exactly like choosing a Kafka offset.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

from translator_ingests_spark.lake import scan
from translator_ingests_spark.lake.maintenance import _rewrite_files
from translator_ingests_spark.lake.table import (
    EXTRAS_COL,
    TOMBSTONE_COL,
    LakeTable,
    Snapshot,
)


def _matching_files(
    table: LakeTable,
    snap: Snapshot,
    cond: Column,
    preds: list[tuple] | None = None,
) -> list[dict]:
    """Phase 1: manifest files whose VISIBLE rows match ``cond`` — one scan,
    pruned to the predicate's columns + file name, aggregated to a tiny
    distinct-file list driver-side. When the caller expresses the predicate
    as stat-prunable triples (``preds``), the probe scan itself skips files
    whose manifest column bounds prove them irrelevant (lake/scan.py) — the
    probe cost drops from O(table) to O(possibly-matching files)."""
    probe_files = (
        scan.prune_files(table, snap, preds) if preds else list(snap.files)
    )
    raw = table._read_files(snap, probe_files, raw=True)
    hits = (
        raw.withColumn("__file", F.input_file_name())
        .filter(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)) & cond)
        .select("__file")
        .distinct()
        .collect()  # bounded-collect: one row per matching data FILE
    )
    matched = set()
    for r in hits:
        p = r["__file"]
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//") and not os.path.exists(p):
                p = p[1:]
        matched.add(os.path.normpath(p))
    return [
        f for f in snap.files
        if os.path.normpath(table.localize_path(f["path"])) in matched
    ]


def _closure(table: LakeTable, snap: Snapshot, files: list[dict]) -> list[dict]:
    if not files:
        return files
    if not any(f.get("delta") for f in snap.files):
        return files
    seed: set[int] = set()
    for f in files:
        seed.update(range(f["bucket_min"], f["bucket_max"] + 1))
    return table._bucket_closure(snap.files, seed)


def delete_where(
    table: LakeTable,
    cond: Column | None,
    at_lsn: int,
    preds: list[tuple] | None = None,
) -> Snapshot:
    """Tombstone every visible row matching ``cond`` at LSN ``at_lsn``.

    ``preds`` — optional conjunctive triples ``(col, op, value)`` (see
    lake/scan.py). When given they stat-prune the probe scan; with
    ``cond=None`` they ARE the predicate. A ``cond`` passed alongside is
    ANDed with them — sound unconditionally, because a file whose stats
    exclude ``preds`` cannot match the conjunction either.

    Returns the committed snapshot (``operation="delete"``), or the current
    snapshot untouched when nothing matches (no empty commits)."""
    if cond is None:
        if not preds:
            raise ValueError("delete_where needs cond or preds")
        cond = scan.predicates_condition(preds)
    elif preds:
        cond = cond & scan.predicates_condition(preds)
    snap = table.head()
    rewrite = _closure(table, snap, _matching_files(table, snap, cond, preds))
    if not rewrite:
        return snap
    keep_paths = {f["path"] for f in rewrite}
    keep = [f for f in snap.files if f["path"] not in keep_paths]
    value_cols = [
        n for n in snap.schema.names()
        if n not in snap.key_cols and n != snap.lsn_col
    ]

    def tombstonize(df: DataFrame) -> DataFrame:
        extras_t = df.schema[EXTRAS_COL].dataType
        hit = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)) & cond
        # ONE select: every output column resolves against the ORIGINAL row
        # (sequential withColumn would re-evaluate `cond` on already-nulled
        # columns and miss rows whose predicate column was itself nulled)
        proj = []
        for c in df.columns:
            if c in value_cols:
                proj.append(F.when(hit, F.lit(None)).otherwise(F.col(c)).alias(c))
            elif c == snap.lsn_col:
                proj.append(F.when(hit, F.lit(at_lsn)).otherwise(F.col(c)).alias(c))
            elif c == EXTRAS_COL:
                proj.append(
                    F.when(hit, F.lit(None).cast(extras_t))
                    .otherwise(F.col(c)).alias(c)
                )
            elif c == TOMBSTONE_COL:
                proj.append((F.coalesce(F.col(c), F.lit(False)) | hit).alias(c))
            else:
                proj.append(F.col(c))
        return df.select(*proj)

    n = max(1, min(len(rewrite), max(1, snap.num_buckets // 4)))
    return _rewrite_files(
        table, snap, rewrite=rewrite, keep=keep, target_files=n,
        drop_tombstones=False, force=False, operation="delete",
        transform=tombstonize,
    )


def update_where(
    table: LakeTable,
    cond: Column | None,
    assignments: dict[str, Column],
    at_lsn: int,
    preds: list[tuple] | None = None,
) -> Snapshot:
    """Rewrite columns of every visible row matching ``cond``: each key in
    ``assignments`` (a non-key, non-LSN column) is set to its Column
    expression (evaluated against the row), and the row's LSN advances to
    ``at_lsn`` so the change wins LWW against redelivered stale events.
    ``preds`` stat-prunes the probe exactly as in :func:`delete_where`.

    Returns the committed snapshot (``operation="update"``), or the current
    snapshot when nothing matches."""
    if cond is None:
        if not preds:
            raise ValueError("update_where needs cond or preds")
        cond = scan.predicates_condition(preds)
    elif preds:
        cond = cond & scan.predicates_condition(preds)
    snap = table.head()
    illegal = set(assignments) & ({*snap.key_cols, snap.lsn_col})
    if illegal:
        raise ValueError(f"cannot update key/lsn columns: {sorted(illegal)}")
    unknown = set(assignments) - set(snap.schema.names())
    if unknown:
        raise ValueError(f"unknown columns: {sorted(unknown)}")
    rewrite = _closure(table, snap, _matching_files(table, snap, cond, preds))
    if not rewrite:
        return snap
    keep_paths = {f["path"] for f in rewrite}
    keep = [f for f in snap.files if f["path"] not in keep_paths]

    def apply_set(df: DataFrame) -> DataFrame:
        hit = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)) & cond
        # ONE select: SQL UPDATE semantics — every assignment AND the
        # predicate evaluate against the ORIGINAL row (SET a=b, b=a swaps;
        # sequential withColumn would chain)
        proj = []
        for c in df.columns:
            if c in assignments:
                proj.append(
                    F.when(hit, assignments[c]).otherwise(F.col(c)).alias(c)
                )
            elif c == snap.lsn_col:
                proj.append(F.when(hit, F.lit(at_lsn)).otherwise(F.col(c)).alias(c))
            else:
                proj.append(F.col(c))
        return df.select(*proj)

    n = max(1, min(len(rewrite), max(1, snap.num_buckets // 4)))
    return _rewrite_files(
        table, snap, rewrite=rewrite, keep=keep, target_files=n,
        drop_tombstones=False, force=False, operation="update",
        transform=apply_set,
    )
