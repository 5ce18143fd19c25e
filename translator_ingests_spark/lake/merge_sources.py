"""Multi-source merge job — the reference's second entry point
(/root/reference/src/translator_ingest/merging.py:170-315): N per-source
lake tables merge into one, gated on version consistency across sources
(merging.py:233-243), stamped with an md5-of-sorted-build-versions release
version (merging.py:255), and skipped early when the release is already
current (merging.py:273-275).

CDC-faithful semantics: sources are merged from their **raw** states
(tombstones included), then globally last-writer-wins-reduced per key — a
delete in one source must out-rank an older update for the same key in
another source, exactly as if the union of the sources' logs had been
replayed into a single table.

Scale shape: one union (no shuffle), one map-side-combinable max_by
aggregation on the key, then the lake's bucket-pruned MERGE — the same plan
a single-source apply uses, so the merged write is O(union), never O(N·table).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

from translator_ingests_spark.lake.table import (
    EXTRAS_COL,
    TOMBSTONE_COL,
    LakeTable,
)


class VersionConsistencyError(RuntimeError):
    """Sources were built with inconsistent component versions — merging
    them would mix incompatible builds (reference gate: merging.py:233-243)."""


def release_version(build_versions: list[str]) -> str:
    """md5 over the sorted per-source build versions — identical input
    builds ⇒ identical release version, any change ⇒ new one
    (reference: merging.py:255)."""
    return hashlib.md5("|".join(sorted(build_versions)).encode()).hexdigest()


def merge_lakes(
    spark: SparkSession,
    sources: list[LakeTable],
    out_root: str,
    require_consistent: bool = True,
) -> tuple[LakeTable, dict]:
    """Merge N source lake tables into one at ``out_root``.

    Returns ``(merged_table, info)`` where info carries the release version
    and whether the merge was skipped as already-current.
    """
    if not sources:
        raise ValueError("need at least one source table")
    snaps = [t.current() for t in sources]

    if require_consistent:
        codes = {s.code_hash for s in snaps}
        if len(codes) > 1:
            raise VersionConsistencyError(
                f"sources built with inconsistent code versions: {sorted(map(str, codes))}"
            )
        shapes = {
            (
                tuple((f.field_id, f.name, f.type) for f in s.schema.fields),
                tuple(s.key_cols),
                s.lsn_col,
                s.num_buckets,
            )
            for s in snaps
        }
        if len(shapes) > 1:
            raise VersionConsistencyError(
                "sources have divergent schemas/keys/bucketing — re-build before merging"
            )

    builds = sorted(f"{s.code_hash or 'none'}:{s.version}" for s in snaps)
    rel_ver = release_version(builds)
    ref = snaps[0]
    roots = sorted(t.root for t in sources)

    # Recover a crash mid-swap from a previous rebuild: the old release was
    # renamed aside but the new one never landed — restore the old one.
    _recover_swap(out_root)

    out = LakeTable(spark, out_root)
    rebuilt = False
    build_root = out_root
    if out.exists():
        cur = out.current()
        if (cur.metrics or {}).get("release_version") == rel_ver:
            return out, {"release_version": rel_ver, "skipped": True}
        # An INCREMENTAL re-merge is only sound when (a) the source set is
        # unchanged — a newly added source's rows at or below the merged
        # table's watermark would be silently filtered by merge()'s duplicate
        # guard — and (b) no source has folded out tombstones past the
        # merged table's consumed watermark — such a delete would never reach
        # the merged table and the dead key would survive there. Either
        # condition → rebuild from scratch (reference rebuilds every release
        # anyway: merging.py:255-275). The rebuild goes into a TEMP root and
        # atomically swaps in on success — a crash mid-rebuild must leave
        # the previous good release intact (same discipline as the lake's
        # atomic snapshot publish).
        prev_roots = _last_merged_roots(out)
        sources_changed = prev_roots is not None and prev_roots != roots
        compacted_past = any(
            s.tombstones_dropped_below > cur.low_watermark for s in snaps
        )
        if sources_changed or compacted_past or prev_roots is None:
            build_root = out_root + ".__rebuild__"
            shutil.rmtree(build_root, ignore_errors=True)
            out = LakeTable(spark, build_root)
            rebuilt = True

    if not out.exists():
        LakeTable.create(
            spark,
            build_root,
            ref.schema,
            key_cols=ref.key_cols,
            lsn_col=ref.lsn_col,
            num_buckets=ref.num_buckets,
            added_lsn=ref.added_lsn,
        )
        out = LakeTable(spark, build_root)

    # union raw states — includes tombstones; LWW reduction happens in ONE
    # map-side-combinable max_by aggregation keyed on the table key
    union = sources[0].read_raw()
    for t in sources[1:]:
        union = union.unionByName(t.read_raw())

    keys = ref.key_cols
    lsn = ref.lsn_col
    cols = union.columns
    hashable = [
        f.name
        for f in union.schema.fields
        if f.name != lsn and not isinstance(f.dataType, MapType)
    ]
    payload = F.struct(*[F.col(c) for c in cols])
    order = F.struct(
        F.col(lsn).alias("o1"),
        # deterministic tie-break when two sources carry the same key at the
        # same LSN (duplicate delivery across sources)
        F.xxhash64(*[F.col(c) for c in hashable]).alias("o2"),
    )
    reduced = (
        union.groupBy(*keys)
        .agg(F.max_by(payload, order).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols])
    )

    source_df = reduced.select(
        *[F.col(c) for c in cols if c not in (TOMBSTONE_COL, EXTRAS_COL, lsn)],
        F.when(F.col(TOMBSTONE_COL), F.lit("delete"))
        .otherwise(F.lit("insert"))
        .alias("op"),
        F.col(lsn).alias("lsn"),
        F.col(EXTRAS_COL).alias("extras"),
    )

    batch_id = out.current().last_batch_id + 1
    watermarks = [s.low_watermark for s in snaps]
    out.merge(
        source_df,
        batch_id=batch_id,
        lineage={"sources": [t.root for t in sources], "builds": builds},
        metrics={"release_version": rel_ver, "n_sources": len(sources)},
        code_hash=ref.code_hash,
        # the merged table may safely claim only what EVERY source guarantees
        advance_watermark_to=min(watermarks) if watermarks else None,
    )
    if rebuilt and build_root != out_root:
        # Swap the fully-built release into place. The window between the
        # two renames is metadata-only (microseconds vs the merge job) and
        # _recover_swap heals a crash inside it on the next call.
        old_root = out_root + ".__old__"
        shutil.rmtree(old_root, ignore_errors=True)
        os.rename(out_root, old_root)
        os.rename(build_root, out_root)
        shutil.rmtree(old_root, ignore_errors=True)
        out = LakeTable(spark, out_root)
    return out, {"release_version": rel_ver, "skipped": False, "rebuilt": rebuilt}


def _recover_swap(out_root: str) -> None:
    """Heal a crash inside the rebuild swap window: if the live root is
    gone but the renamed-aside previous release survives, restore it; stale
    temp build roots are always discarded (they never committed)."""
    old_root = out_root + ".__old__"
    if not os.path.exists(out_root) and os.path.exists(old_root):
        os.rename(old_root, out_root)
    shutil.rmtree(old_root, ignore_errors=True)
    shutil.rmtree(out_root + ".__rebuild__", ignore_errors=True)


def _last_merged_roots(out: LakeTable) -> list[str] | None:
    """The sorted source-root set recorded by the newest merge snapshot of a
    merged table (compaction/schema snapshots carry no lineage — walk past
    them). None when no merge lineage survives (e.g. expired) — treated as
    unsafe, forcing a rebuild."""
    for v in reversed(out.history()):
        lin = out.snapshot_at(v).lineage
        if lin and "sources" in lin:
            return sorted(lin["sources"])
    return None
