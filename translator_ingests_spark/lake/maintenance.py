"""Lake maintenance: snapshot expiry (GC) and small-file compaction.

Reference analogs: S15 old-version cleanup
(/root/reference/src/translator_ingest/util/storage/s3.py:220-366) and the
save-memory merge mode — re-expressed as Iceberg-style `expire_snapshots`
plus a bucket-range compaction that rewrites many small files into few,
folding tombstones out once no retained snapshot needs them.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import functions as F

from translator_ingests_spark.lake.table import (
    LakeTable,
    Snapshot,
    _file_stats_from_footer,
)


def expire_snapshots(
    table: LakeTable, keep_last: int = 2, orphan_grace_s: float = 3600.0,
    respect_cursors: bool = True, max_cursor_lag: int | None = None,
) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete data files
    referenced by no retained snapshot. The current pointer is never
    touched; deletion order (files before manifests) keeps every retained
    snapshot readable at all times.

    ``respect_cursors`` (default on) additionally retains every snapshot a
    registered change-feed consumer is parked at
    (:func:`translator_ingests_spark.lake.refs.list_cursors`): the
    consumer's next ``changes(cursor, head)`` poll is an endpoint diff, so
    pinning exactly the cursor snapshot — never the commits in between —
    keeps incremental consumption servable while history between cursor
    and the ``keep_last`` window still expires. ``max_cursor_lag`` bounds
    how much history an abandoned consumer can pin: a cursor more than
    that many VERSIONS behind head is not pinned (warned — that consumer
    re-bootstraps), so one dead registration cannot hold the table's
    garbage hostage forever.

    Unreferenced files fall in two classes with different proof obligations:
    files referenced by an EXPIRED snapshot are known garbage (their only
    readers were the snapshots being dropped — deleted immediately), while
    files referenced by NO snapshot at all may belong to an IN-FLIGHT
    writer that has written its data but not yet won the commit fence —
    deleting those would corrupt the winner's commit from under it. True
    orphans (fence losers, crashed writers) are only deleted once older
    than ``orphan_grace_s`` (Iceberg's remove-orphan-files age gate)."""
    import time as _time

    from translator_ingests_spark.lake.refs import list_cursors, list_tags

    history = table.history()
    keep = set(history[-keep_last:])
    # the whole staged chain head→published is load-bearing: current()'s
    # marker walk reads every snapshot on it, and publish may land any prefix
    snap = table.head()
    head_version = snap.version
    keep.add(snap.version)
    while snap.parent is not None and table.is_staged(snap.version):
        snap = table.snapshot_at(snap.parent)
        keep.add(snap.version)
    # tagged snapshots are load-bearing regardless of age (refs.py)
    keep.update(list_tags(table).values())
    if respect_cursors:
        retained = set(history)
        for cname, cv in list_cursors(table).items():
            if cv not in retained:
                # already expired (registered after the fact, or a prior
                # run with a lag bound let it go): nothing to pin — the
                # consumer hits CursorExpiredError and re-bootstraps
                continue
            if max_cursor_lag is not None and head_version - cv > max_cursor_lag:
                warnings.warn(
                    f"consumer {cname!r} cursor v{cv} lags head v{head_version} "
                    f"beyond max_cursor_lag={max_cursor_lag}; not pinned — "
                    "it will need to re-bootstrap",
                    stacklevel=2,
                )
                continue
            keep.add(cv)
    if len(history) <= len(keep):
        return {"snapshots_removed": 0, "files_removed": 0, "segments_removed": 0}

    live: set[str] = set()
    live_segs: set[str] = set()
    for v in keep:
        snap = table.snapshot_at(v)
        live.update(table.localize_path(f["path"]) for f in snap.files)
        for ref in snap.segments or []:
            live_segs.add(ref["name"])
    # known garbage: referenced ONLY by snapshots this call expires
    expired_refs: set[str] = set()
    expired_segs: set[str] = set()
    for v in history:
        if v not in keep:
            snap = table.snapshot_at(v)
            expired_refs.update(
                table.localize_path(f["path"]) for f in snap.files
            )
            for ref in snap.segments or []:
                expired_segs.add(ref["name"])
    expired_refs -= live
    expired_segs -= live_segs

    now = _time.time()

    def _expendable(path: str, known_garbage: bool) -> bool:
        if known_garbage:
            return True
        try:  # referenced by nothing: maybe an in-flight writer — age-gate
            return now - os.path.getmtime(path) > orphan_grace_s
        except FileNotFoundError:
            return False

    removed_files = 0
    data_root = os.path.join(table.root, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for fn in files:
            full = os.path.join(dirpath, fn)
            if (
                full.endswith(".parquet")
                and full not in live
                and _expendable(full, full in expired_refs)
            ):
                os.remove(full)
                removed_files += 1
    # sweep commit directories the deletions emptied (cosmetic: reads go
    # through manifest paths, but at a compaction cadence the dead dirs of
    # uuid-suffixed write attempts would otherwise accumulate forever)
    for dirpath, dirs, files in os.walk(data_root, topdown=False):
        if dirpath != data_root and not dirs and not files:
            try:
                os.rmdir(dirpath)
            except OSError:
                pass

    # manifest segments referenced by no retained snapshot: expired
    # versions' exclusive segments immediately; unreferenced strays (a
    # writer that has put its segments but not yet committed) age-gated
    removed_segs = 0
    mdir = table._manifest_dir
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            full = os.path.join(mdir, fn)
            if (
                fn.startswith("seg-")
                and fn.endswith(".json")
                and fn not in live_segs
                and _expendable(full, fn in expired_segs)
            ):
                os.remove(full)
                removed_segs += 1

    removed_snaps = 0
    for v in history:
        if v not in keep:
            os.remove(table._snapshot_path(v))
            try:  # stale marker of an expired version (normally never staged)
                os.remove(table._staged_marker_path(v))
            except FileNotFoundError:
                pass
            removed_snaps += 1
    return {
        "snapshots_removed": removed_snaps,
        "files_removed": removed_files,
        "segments_removed": removed_segs,
    }


def _rewrite_files(
    table: LakeTable,
    snap: Snapshot,
    rewrite: list[dict],
    keep: list[dict],
    target_files: int,
    drop_tombstones: bool,
    force: bool,
    new_num_buckets: int | None = None,
    operation: str = "compact",
    transform=None,
    cluster_cols: list[str] | None = None,
    drop_cols: list[str] | None = None,
) -> Snapshot:
    """Shared compaction engine: read ONLY ``rewrite`` files, optionally fold
    tombstones (watermark-gated), write ~target_files range-partitioned
    key-sorted files, and commit a snapshot whose manifest splices
    ``keep`` (untouched, never read) with the new files. Cost is
    O(rewrite), never O(table), when callers select a subset.

    Merge-on-read delta files in ``rewrite`` are resolved to their per-key
    winners first (``_net_raw``'s LWW fold — ``rewrite`` must then be a
    bucket-closure-complete subset, which both callers guarantee); the
    rewritten output is plain base files, restoring the COW disjointness
    invariant for every bucket touched — THIS is what bounds MOR read
    amplification on the auto-compact cadence."""
    df = table._net_raw(snap, rewrite)
    if transform is not None:
        # row-level DML (delete_where / update_where): applied to the NET
        # raw state of the rewrite subset before the layout write
        df = transform(df)
    if drop_tombstones:
        from translator_ingests_spark.lake.table import TOMBSTONE_COL

        is_tomb = F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
        if force:
            df = df.filter(~is_tomb)
        else:
            df = df.filter(
                ~is_tomb | (F.col(snap.lsn_col) > F.lit(snap.low_watermark))
            )
    nb = new_num_buckets if new_num_buckets is not None else snap.num_buckets
    df = df.withColumn("__bucket", table._bucket_expr(nb, snap.key_cols))
    sort_cols = cluster_cols if cluster_cols else list(snap.key_cols)
    new_version = snap.version + 1
    out_dir = table._data_dir(new_version)
    (
        # range-partition by (__bucket, secondary sort) — not bucket alone —
        # so FILE boundaries fall along the secondary order too: cluster_by
        # then yields per-file disjoint ranges on its cluster columns and the
        # manifest column stats (lake/scan.py) prune whole files, not just
        # row groups. __bucket still leads, keeping bucket ranges contiguous.
        df.repartitionByRange(target_files, "__bucket", *sort_cols)
        # key-sorted within bucket groups — same layout as merge's write, so
        # compaction preserves the tight row-group key stats the point-lookup
        # path relies on (round-3 ADVICE: a bucket-only sort silently
        # discarded row-group skipping on every auto-compact). cluster_by
        # swaps in its own secondary sort columns instead.
        .sortWithinPartitions("__bucket", *sort_cols)
        # helper layout columns (e.g. the interleaved z-value) steered the
        # range partitioner + sort above; a projection drops them without
        # disturbing intra-partition row order, so they never hit disk
        .drop(*(drop_cols or []))
        .write.mode("overwrite")
        .options(**table._parquet_write_options(df.columns))
        .parquet(out_dir)
    )
    added_files = []
    for fn in sorted(os.listdir(out_dir)):
        if not fn.endswith(".parquet"):
            continue
        path = os.path.join(out_dir, fn)
        st = _file_stats_from_footer(path)
        if st is None:
            continue
        entry = {"path": path, "schema_version": snap.schema_version, **st}
        if drop_tombstones and not force and entry.get("has_tombstones"):
            # every tombstone at/below the watermark was folded out above,
            # so the survivors all have lsn > low_watermark. Stamp that on
            # the entry: the auto-compact cadence skips this file until the
            # watermark actually advances past the stamp — without it, a
            # file holding one contested (above-watermark) tombstone is
            # re-rewritten on EVERY cadence for zero benefit (unbounded
            # write amplification, and a fence-contention livelock against
            # the apply loop — tests/test_concurrency_soak.py).
            entry["tombstones_gt"] = snap.low_watermark
        added_files.append(entry)
    new_files = list(keep) + added_files
    new_snap = Snapshot(
        version=new_version,
        parent=snap.version,
        batch_id=None,
        last_batch_id=snap.last_batch_id,
        schema_version=snap.schema_version,
        schemas=snap.schemas,
        num_buckets=nb,
        key_cols=snap.key_cols,
        lsn_col=snap.lsn_col,
        files=new_files,
        code_hash=snap.code_hash,
        added_lsn=snap.added_lsn,
        low_watermark=snap.low_watermark,
        operation=operation,
        # record how far tombstones may have been folded out: consumers of
        # the raw state (merge_lakes) rebuild if this passes their watermark
        tombstones_dropped_below=(
            (2**62 if force else max(snap.tombstones_dropped_below, snap.low_watermark))
            if drop_tombstones
            else snap.tombstones_dropped_below
        ),
    )
    if new_num_buckets is not None and new_num_buckets != snap.num_buckets:
        # rebucket changes every file's bucket assignment — no concurrent
        # commit is compatible with it; fail the fence loudly instead
        table._commit_snapshot(new_snap)
        return new_snap
    # layout commit (compaction / clustering / DML rewrite): rebases over
    # any concurrent commit that did not replace one of the files this
    # rewrite read — the long-running-OPTIMIZE-vs-apply-loop case. A
    # same-file race (the apply loop merged a bucket this rewrite also
    # folded) raises ConcurrentModificationError: the rewrite output would
    # resurrect pre-merge rows, so it must be recomputed, never spliced.
    return table.commit_rebase(
        new_snap, base=snap, added=added_files,
        replaced_paths={f["path"] for f in rewrite},
    )


def compact(table: LakeTable, target_files: int | None = None,
            drop_tombstones: bool = False, force: bool = False) -> Snapshot:
    """FULL rewrite of the table's data files into ~target_files
    range-partitioned files. With ``drop_tombstones`` the retained delete
    markers are folded out — **watermark-gated**: only tombstones with
    ``last_lsn`` at or below the snapshot's ``low_watermark`` are dropped,
    because the merge path rejects any future event at or below the
    watermark, so a dropped tombstone can never be resurrected by a
    redelivered stale update. Tombstones above the watermark
    (still-contested LSN territory) are kept. ``force=True`` drops ALL
    tombstones regardless — only for callers that own an external retention
    guarantee.

    This is the EXPLICIT maintenance entry point (one-shot table rebuild);
    the steady-state auto-compact cadence uses :func:`compact_incremental`,
    which rewrites only fragmented buckets."""
    snap = table.head()
    n = target_files or max(1, snap.num_buckets // 4)
    return _rewrite_files(
        table, snap, rewrite=list(snap.files), keep=[],
        target_files=n, drop_tombstones=drop_tombstones, force=force,
    )


def rebucket(
    table: LakeTable,
    new_num_buckets: int,
    target_files: int | None = None,
    drop_tombstones: bool = True,
) -> Snapshot:
    """Bucket-count (partition-spec) evolution: rewrite the table under a
    new ``num_buckets`` — the Iceberg partition-spec-evolution analog.

    Why it exists at 10^10 rows: the bucket count fixed at CREATE becomes
    the scaling ceiling — per-bucket data grows ∝ table size, and with it
    every COW merge's rewrite unit, point-lookup scan, and compaction slice.
    Growing the table 100× wants ~100× the buckets. The rewrite is one
    cluster-parallel job (read → re-hash → range-partitioned write), run
    RARELY (bucket counts move in 4× steps); afterwards every path derives
    bucketing from the snapshot (``snap.num_buckets``), so merges, masks,
    pruning and lookups switch over atomically at the commit.

    Pending merge-on-read deltas are folded in (the rewrite reads the NET
    state), watermark-passed tombstones are dropped by default, and the
    exactly-once batch guard is untouched (``last_batch_id`` carries over).
    Do not run concurrently with a live apply loop: the loop's precomputed
    bucket masks assume the bucket count they were derived under (the apply
    loop itself re-validates per unit; an external racer loses the commit
    fence)."""
    snap = table.head()
    if new_num_buckets == snap.num_buckets:
        return snap
    if new_num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {new_num_buckets}")
    n = target_files or max(1, new_num_buckets // 4)
    return _rewrite_files(
        table, snap, rewrite=list(snap.files), keep=[],
        target_files=n, drop_tombstones=drop_tombstones, force=False,
        new_num_buckets=new_num_buckets, operation="rebucket",
    )


def cluster_by(
    table: LakeTable, cols: list[str], target_files: int | None = None
) -> Snapshot:
    """Secondary clustering (the OPTIMIZE ... ZORDER analog, linear form):
    rewrite the table sorted by ``(__bucket, *cols)`` so parquet row-group
    min/max statistics on ``cols`` become tight and predicates on them —
    analytics filters, the DML probe scan — skip row groups instead of
    reading every page.

    Trade-off stated plainly: the key-sorted layout (merge/compaction
    default) is what point lookups rely on; clustering by non-key columns
    REPLACES that secondary order inside each bucket group, so pick the
    columns the read workload actually filters on. Whole-table rewrite,
    one cluster-parallel job, run rarely like :func:`rebucket`; the next
    merge re-sorts only the buckets it touches (by key), so clustering
    degrades gradually under writes rather than breaking anything.
    Merge-on-read deltas fold in (NET state is what gets clustered)."""
    snap = table.head()
    unknown = [c for c in cols if c not in snap.schema.names()]
    if unknown:
        raise ValueError(f"unknown cluster columns: {unknown}")
    n = target_files or max(1, snap.num_buckets // 4)
    return _rewrite_files(
        table, snap, rewrite=list(snap.files), keep=[],
        target_files=n, drop_tombstones=True, force=False,
        operation="cluster", cluster_cols=list(cols),
    )


def _z_source_expr(dtype: str, col: str):
    """Order-preserving numeric image of ``col`` for quantile coding.

    Strings map through their first 6 UTF-8 bytes read as a big-endian
    integer, zero-padded on the right — exactly the binary-collation prefix
    order Spark's UTF8String comparison uses, and 48 bits stays exact in a
    double. Numerics/dates/timestamps cast directly. Coarse ties (strings
    sharing a 6-byte prefix) are fine: codes only steer layout, never
    correctness."""
    if dtype == "string":
        return F.conv(
            F.rpad(F.hex(F.substring(F.encode(F.col(col), "UTF-8"), 1, 6)),
                   12, "0"),
            16, 10,
        ).cast("double")
    if dtype in ("byte", "tinyint", "short", "smallint", "int", "integer",
                 "long", "bigint", "float", "double", "boolean", "date",
                 "timestamp"):
        return F.col(col).cast("double")
    raise ValueError(f"z-order does not support column type {dtype!r} ({col})")


def z_order_by(
    table: LakeTable, cols: list[str], target_files: int | None = None,
    bits: int = 8,
) -> Snapshot:
    """Multi-dimensional secondary clustering — the OPTIMIZE ... ZORDER
    analog proper, where :func:`cluster_by` is the linear form.

    Each column is quantile-coded to ``bits`` bits (one ``approxQuantile``
    pass over the visible data for the split points — O(2^bits · cols)
    driver memory — then a JVM binary-search Bucketizer), the codes are
    bit-interleaved into one z-value, and the table rewrites range-
    partitioned and sorted by (__bucket, z). File boundaries then cut the
    z-curve, so every file covers a small hyper-rectangle of the clustered
    columns and the manifest min/max stats (lake/scan.py) prune files for a
    predicate on ANY clustered column — the property linear clustering only
    gives its leading column. Quantile (not uniform) coding makes the curve
    skew-proof: each code covers an equal row mass, so hot values cannot
    collapse the interleave into one giant cell.

    Same operational envelope as :func:`cluster_by`: whole-table rewrite,
    run rarely, degrades gradually under subsequent key-sorted merges;
    deltas fold in, z-values never hit disk (dropped pre-write)."""
    snap = table.head()
    unknown = [c for c in cols if c not in snap.schema.names()]
    if unknown:
        raise ValueError(f"unknown z-order columns: {unknown}")
    if len(cols) < 2:
        raise ValueError("z-order needs >= 2 columns; use cluster_by for one")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(f"bits * len(cols) must fit a long: {bits}*{len(cols)}")
    from pyspark.ml.feature import Bucketizer

    vis = table.read()
    dtypes = dict(vis.dtypes)
    srcs = [f"__zsrc_{j}" for j in range(len(cols))]
    code_cols = [f"__zcode_{j}" for j in range(len(cols))]
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    proj = vis.select(
        *[_z_source_expr(dtypes[c], c).alias(s) for c, s in zip(cols, srcs)]
    )
    # bounded-collect: 2^bits quantiles per column, driver-side split points
    quantiles = proj.approxQuantile(srcs, probs, 0.001)
    splits_arr = [
        [float("-inf"), *sorted(set(q)), float("inf")] for q in quantiles
    ]
    # a column with NO quantile points (empty visible state — every row a
    # dropped tombstone — or an all-null column) yields the 2-point splits
    # [-inf, inf], which Bucketizer rejects. Such a column carries no layout
    # information: it codes as a constant 0 and only the informative columns
    # feed the Bucketizer. With none informative the rewrite still runs as a
    # plain compaction (z constant), so tombstones drop as requested.
    informative = [i for i, s in enumerate(splits_arr) if len(s) >= 3]
    bucketizer = None
    if informative:
        bucketizer = Bucketizer(
            splitsArray=[splits_arr[i] for i in informative],
            inputCols=[srcs[i] for i in informative],
            outputCols=[code_cols[i] for i in informative],
            handleInvalid="keep",  # nulls → overflow code; reads as 0 below
        )
    constant = set(range(len(cols))) - set(informative)
    k = len(cols)

    def add_z(df: DataFrame) -> DataFrame:
        for c, s in zip(cols, srcs):
            df = df.withColumn(s, _z_source_expr(dtypes[c], c))
        if bucketizer is not None:
            df = bucketizer.transform(df)
        for j in constant:
            df = df.withColumn(code_cols[j], F.lit(0.0))
        z = F.lit(0).cast("long")
        for b in range(bits):
            for j, code in enumerate(code_cols):
                bit = (
                    F.shiftright(F.col(code).cast("long"), b)
                    .bitwiseAND(F.lit(1))
                )
                z = z.bitwiseOR(F.shiftleft(bit, b * k + j))
        return df.withColumn("__zvalue", z).drop(*srcs, *code_cols)

    n = target_files or max(1, snap.num_buckets // 4)
    return _rewrite_files(
        table, snap, rewrite=list(snap.files), keep=[],
        target_files=n, drop_tombstones=True, force=False,
        operation="zorder", transform=add_z,
        cluster_cols=["__zvalue"], drop_cols=["__zvalue"],
    )


def suggest_num_buckets(
    snap: Snapshot, target_rows_per_bucket: int = 2_000_000
) -> int | None:
    """Manifest-only rebucket advisor: the power-of-two bucket count that
    keeps expected per-bucket rows at or below the target, from the
    manifests' per-file footer row counts (no data read). Returns None when
    the current count already satisfies the target or row stats are absent
    (manifests written before the stat existed). Pending merge-on-read
    delta rows count once per version of a key — an over-estimate, which
    only ever suggests rebucketing EARLIER (safe for an advisor)."""
    rows = [f.get("rows") for f in snap.files]
    if not rows or any(r is None for r in rows):
        return None
    total = sum(rows)
    if total <= target_rows_per_bucket * snap.num_buckets:
        return None
    nb = 1
    while total > target_rows_per_bucket * nb:
        nb *= 2
    return nb


def tombstone_files(snap: Snapshot) -> list[dict]:
    """Data files that may hold tombstone rows, from the manifest's per-file
    ``has_tombstones`` footer stat — a driver-side O(files) metadata scan,
    no data read. Entries from manifests written before the stat existed
    default to True (conservative: rewrite once, stat recorded after)."""
    return [f for f in snap.files if f.get("has_tombstones", True)]


def compact_incremental(
    table: LakeTable,
    drop_tombstones: bool = True,
    force: bool = False,
) -> Snapshot:
    """INCREMENTAL compaction: rewrite ONLY the files that may hold
    tombstones, splice every clean file through the manifest untouched.

    This is the steady-state auto-compact shape. The COW merge keeps bucket
    coverage disjoint (every merge rewrites all files whose range touches
    its batch), so small-file fragmentation cannot accumulate — the ONLY
    O(table) cost the full :func:`compact` pays on a 100 TB table is
    scanning clean files to fold out a few tombstones (round-3 VERDICT #1).
    Selection here is manifest-metadata-only via the per-file
    ``has_tombstones`` footer stat, so the cadence cost is O(files recently
    touched by deletes), not O(table); a table with no tombstoned files is
    a complete no-op (no Spark job, no new snapshot).

    Splicing whole files is sound: a key lives in exactly one manifest file
    (disjoint coverage), so rewriting any subset of files preserves exactly
    that subset's rows. Tombstones still ABOVE the low watermark survive
    the rewrite (watermark gate, unchanged) and their file stays flagged —
    it is re-examined on the next cadence until the watermark passes.

    Merge-on-read DELTA files are always selected (folding them into base
    files is what bounds MOR read amplification), and a selection that
    touches any delta expands to its bucket-overlap closure so the fold
    sees every row of every key it rewrites."""
    snap = table.head()
    # skip files already scrubbed at the current watermark: their remaining
    # tombstones are all above it (``tombstones_gt`` stamp, written by the
    # previous cadence rewrite), so another rewrite cannot drop anything —
    # they re-enter the cadence only when the watermark advances past the
    # stamp. ``force`` ignores the stamp (it drops contested tombstones).
    rewrite = [
        f for f in tombstone_files(snap)
        if force or f.get("tombstones_gt", -(2 ** 62)) < snap.low_watermark
    ]
    deltas = [f for f in snap.files if f.get("delta")]
    if deltas:
        seed: set[int] = set()
        for f in rewrite + deltas:
            seed.update(range(f["bucket_min"], f["bucket_max"] + 1))
        rewrite = table._bucket_closure(snap.files, seed)
    if not rewrite:
        return snap
    keep_paths = {f["path"] for f in rewrite}
    keep = [f for f in snap.files if f["path"] not in keep_paths]
    # output density matches the full-compact target, bounded by the number
    # of files actually rewritten
    n = max(1, min(len(rewrite), max(1, snap.num_buckets // 4)))
    return _rewrite_files(
        table, snap, rewrite=rewrite, keep=keep,
        target_files=n, drop_tombstones=drop_tombstones, force=force,
    )
