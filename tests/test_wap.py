"""Write-audit-publish: staged commits are invisible to every reader path
until published, the writer plane stacks on the staged chain, publish is
an oldest-first idempotent marker drop, and rollback reverts content AND
the exactly-once guard so a corrected batch can re-apply.
"""

import json

from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake import wap
from translator_ingests_spark.streaming.change_consumer import ChangesConsumer


def ev(lsn, op, repo=None, path=None, commit=None, lang=None, content=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": content, "schema_change": None,
        "source_partition": 0, "source_offset": lsn, "extras": None,
    }


def events(spark, rng):
    rows = [ev(i, "insert", "r0", f"p{i}", f"c{i}", "py", f"v{i}") for i in rng]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_staged_commits_invisible_until_publish(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    published_v = eng.table.current().version

    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(4, 10)), events_per_batch=2)  # 3 units
    assert len(wap.staged_versions(eng.table)) == 3
    # every reader path serves the published state
    assert eng.table.current().version == published_v
    assert eng.table.read().count() == 4
    assert eng.table.lookup([("r0", "p5")]).count() == 0
    # the audit's view sees the staged state
    assert wap.read_staged(eng.table).count() == 10

    snap = wap.publish_staged(eng.table)
    assert wap.staged_versions(eng.table) == []
    assert snap.version == eng.table.head().version
    assert eng.table.read().count() == 10
    # idempotent
    assert wap.publish_staged(eng.table).version == snap.version


def test_rollback_reverts_content_and_batch_guard(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    before = sorted(r["path"] for r in eng.table.read().collect())
    guard = eng.table.head().last_batch_id

    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(4, 8)), events_per_batch=100)
    snap = eng.rollback_staged()  # reverts table AND checkpoint manifests
    assert snap.operation == "rollback" and not eng.table.is_staged(snap.version)
    assert wap.staged_versions(eng.table) == []
    assert sorted(r["path"] for r in eng.table.read().collect()) == before
    assert eng.table.head().last_batch_id == guard

    # the corrected batch re-applies under the same unit ids — exactly-once
    # guard reverted with the rollback
    eng.table.staged_writes = False
    eng.apply_log(events(spark, range(4, 8)), events_per_batch=100)
    assert eng.table.read().count() == 8
    # rollback with nothing staged is a no-op
    assert wap.rollback_staged(eng.table).version == eng.table.head().version


def test_change_consumer_never_sees_staged(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    consumer = ChangesConsumer(eng.table, str(tmp_path / "ckpt"))
    consumer.bootstrap()

    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(4, 8)), events_per_batch=100)
    assert consumer.poll() is None  # staged commits are not consumable
    wap.publish_staged(eng.table)
    changes, _v_from, v_to = consumer.poll()
    got = {r["path"] for r in changes.collect()}
    assert got == {"p4", "p5", "p6", "p7"}
    consumer.commit(v_to)


def test_maintenance_stacks_on_staged_chain(spark, tmp_path):
    # auto-compaction and DML inside a staged session stay staged; publish
    # reveals the maintained result, never an intermediate
    from translator_ingests_spark.lake.dml import delete_where
    from translator_ingests_spark.lake.maintenance import compact

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(4, 8)), events_per_batch=100)
    delete_where(eng.table, F.col("path") == "p5", at_lsn=1000)
    compact(eng.table, target_files=1)
    assert eng.table.read().count() == 4  # still the published view
    wap.publish_staged(eng.table)
    got = sorted(r["path"] for r in eng.table.read().collect())
    assert got == ["p0", "p1", "p2", "p3", "p4", "p6", "p7"]


def test_gc_keeps_the_staged_chain(spark, tmp_path):
    from translator_ingests_spark.lake.maintenance import expire_snapshots

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(4, 10)), events_per_batch=2)
    expire_snapshots(eng.table, keep_last=1)
    # published current and the whole staged chain survive
    assert eng.table.read().count() == 4
    assert len(wap.staged_versions(eng.table)) == 3
    wap.publish_staged(eng.table)
    assert eng.table.read().count() == 10


def test_crash_mid_publish_leaves_published_prefix(spark, tmp_path):
    import os

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(2)), events_per_batch=100)
    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(2, 8)), events_per_batch=2)
    vs = wap.staged_versions(eng.table)
    # simulate the crash: only the OLDEST marker got removed
    os.remove(eng.table._staged_marker_path(vs[0]))
    assert eng.table.current().version == vs[0]  # prefix published, consistent
    assert eng.table.read().count() == 4
    # re-run completes
    wap.publish_staged(eng.table)
    assert eng.table.read().count() == 8


def test_staged_marker_removed_on_fence_loss(spark, tmp_path):
    # a fence-losing staged writer must not leave a marker that shadows the
    # winner's published commit
    import pytest

    from translator_ingests_spark.lake.table import CommitConflictError

    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    head = eng.table.head()
    from dataclasses import replace
    racer = replace(head, version=head.version + 1, parent=head.version,
                    files=list(head.files), operation="merge")
    eng.table._commit_snapshot(racer, staged=False)  # winner publishes v+1
    loser = replace(head, version=head.version + 1, parent=head.version,
                    files=list(head.files), operation="merge")
    with pytest.raises(CommitConflictError):
        eng.table._commit_snapshot(loser, staged=True)
    assert not eng.table.is_staged(racer.version)
    assert eng.table.current().version == racer.version


def test_rollback_recomputes_over_racing_staged_commit(spark, tmp_path, monkeypatch):
    """A staged writer extends the chain between a rollback's head read and
    its fence attempt. The rollback must NOT rebase (its content IS the
    published file list) — it recomputes from the fresh head, so the revert
    also discards the racer's unit, which stacked on rejected state."""
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    eng.apply_log(events(spark, range(4)), events_per_batch=100)
    pub_v = eng.table.current().version
    want = sorted(r["path"] for r in eng.table.read().collect())

    eng.table.staged_writes = True
    eng.apply_log(events(spark, range(4, 6)), events_per_batch=100)
    assert len(wap.staged_versions(eng.table)) == 1

    orig = eng.table._commit_snapshot
    fired = {}

    def racy(snap, staged=None):
        if not fired:
            fired["x"] = True
            racer = CdcEngine(spark, eng.root, num_buckets=4,
                              auto_compact_every=None, staged=True)
            racer.apply_log(events(spark, range(6, 8)), n_batches=1)
        return orig(snap, staged)

    monkeypatch.setattr(eng.table, "_commit_snapshot", racy)
    snap = eng.rollback_staged()

    assert snap.operation == "rollback" and not eng.table.is_staged(snap.version)
    assert eng.table.current().version == snap.version == eng.table.head().version
    # BOTH staged units (ours and the racer's) are gone from the content
    assert sorted(r["path"] for r in eng.table.read().collect()) == want
    assert snap.last_batch_id == eng.table.snapshot_at(pub_v).last_batch_id
    # corrected data re-applies exactly-once after the revert
    eng.table.staged_writes = False
    eng.apply_log(events(spark, range(4, 8)), n_batches=1)
    assert eng.table.read().count() == 8
