"""Tombstone retention + watermark-gated auto-compaction (SURVEY.md §2.8
merge semantics at scale): under copy-on-write the tombstones a delete
retains must eventually fold out, but ONLY below the exactly-once retention
watermark — and a stale event older than the watermark must still be
rejected after its tombstone is gone (the merge watermark guard, not the
tombstone, carries the invariant from then on)."""

from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake.maintenance import compact
from translator_ingests_spark.lake.table import TOMBSTONE_COL


def ev(lsn, op, repo=None, path=None, commit=None, lang=None, content=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": content, "schema_change": None,
        "source_partition": 0, "source_offset": lsn, "extras": None,
    }


def _tombstones(table):
    return table.read_raw().filter(F.col(TOMBSTONE_COL)).collect()


def test_compact_drops_tombstones_below_watermark_only(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(1, "insert", "r", "b", "c1", "py", "w0"),
        ev(2, "delete", "r", "a"),
        ev(3, "update", "r", "b", "c3", "py", "w1"),
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), events_per_batch=2)
    snap = eng.table.current()
    # in-order delivery advanced the watermark to the max applied LSN
    assert snap.low_watermark == 3
    assert len(_tombstones(eng.table)) == 1

    compact(eng.table, drop_tombstones=True)
    assert eng.table.current().operation == "compact"
    assert _tombstones(eng.table) == []
    # visible state unchanged
    st = {(r["repo"], r["path"]): r["content"] for r in eng.table.read().collect()}
    assert st == {("r", "b"): "w1"}


def test_stale_event_below_watermark_rejected_after_compaction(spark, tmp_path):
    """The delete's tombstone is compacted away; a stale update (lsn below
    the watermark) redelivered later must STILL not resurrect the key —
    merge's watermark guard drops it."""
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(5, "delete", "r", "a"),
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), events_per_batch=10)
    assert eng.table.current().low_watermark == 5
    compact(eng.table, drop_tombstones=True)
    assert _tombstones(eng.table) == []

    # a corrupt/late producer re-emits the old update in a NEW batch (so the
    # batch-id replay guard does not catch it)
    stale = [ev(3, "update", "r", "a", "c3", "py", "v-resurrect")]
    eng.apply_log(spark.createDataFrame(stale, EVENT_SCHEMA), events_per_batch=10)
    assert eng.table.read().filter("repo = 'r' AND path = 'a'").count() == 0


def test_scatter_delivery_keeps_tombstones(spark, tmp_path):
    """Scatter delivery gives no contiguity guarantee — the watermark must
    not advance and compaction must retain every tombstone."""
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(1, "insert", "r", "b", "c1", "py", "w0"),
        ev(2, "delete", "r", "a"),
        ev(3, "update", "r", "b", "c3", "py", "w1"),
    ]
    eng.apply_log(
        spark.createDataFrame(events, EVENT_SCHEMA), n_batches=2, scatter_delivery=True
    )
    assert eng.table.current().low_watermark == -1
    compact(eng.table, drop_tombstones=True)
    assert len(_tombstones(eng.table)) == 1  # retained: still-contested LSNs
    # and the late stale update is STILL rejected — by the tombstone this time
    stale = [ev(1, "update", "r", "a", "c1x", "py", "v-resurrect")]
    eng.apply_log(spark.createDataFrame(stale, EVENT_SCHEMA), events_per_batch=10)
    assert eng.table.read().filter("repo = 'r' AND path = 'a'").count() == 0


def test_auto_compaction_wired_into_apply_loop(spark, tmp_path):
    eng = CdcEngine(
        spark, str(tmp_path / "cdc"), num_buckets=4, auto_compact_every=2
    )
    events = [
        ev(i, "delete" if i % 3 == 2 else "insert", "r", f"p{i // 3}", f"c{i}", "py",
           None if i % 3 == 2 else f"v{i}")
        for i in range(12)
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), events_per_batch=3)
    ops = [eng.table.snapshot_at(v).operation for v in eng.table.history()]
    assert "compact" in ops  # compaction visible in snapshot lineage
    # final state matches a replay without compaction
    eng2 = CdcEngine(spark, str(tmp_path / "cdc2"), num_buckets=4)
    eng2.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), events_per_batch=3)
    s1 = {(r["repo"], r["path"]): r["content"] for r in eng.table.read().collect()}
    s2 = {(r["repo"], r["path"]): r["content"] for r in eng2.table.read().collect()}
    assert s1 == s2


def test_default_engine_auto_compacts_and_watermark_guard_holds(spark, tmp_path):
    """The DEFAULT engine (no auto_compact_every argument) must fold out
    watermarked tombstones on its own — production replays may not grow
    tombstones unboundedly — and a stale event below the watermark must
    still be rejected afterwards at the default setting."""
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    assert eng.auto_compact_every == 16  # default ON
    # 17 single-event units: insert then delete the same key repeatedly so
    # tombstones accrue, crossing the every-16-units compaction trigger
    events = [
        ev(i, "delete" if i % 2 == 1 else "insert", "r", f"p{i // 2}",
           f"c{i}", "py", None if i % 2 == 1 else f"v{i}")
        for i in range(17)
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), events_per_batch=1)
    ops = [eng.table.snapshot_at(v).operation for v in eng.table.history()]
    assert "compact" in ops
    assert _tombstones(eng.table) == []  # in-order watermark covered them all
    # stale redelivery below the watermark: still rejected post-compaction
    stale = [ev(3, "update", "r", "p1", "cx", "py", "v-resurrect")]
    eng.apply_log(spark.createDataFrame(stale, EVENT_SCHEMA), events_per_batch=100)
    assert eng.table.read().filter("path = 'p1'").count() == 0
