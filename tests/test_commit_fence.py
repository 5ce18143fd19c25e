"""Optimistic-concurrency commit fence: exactly one of two writers racing
to the same snapshot version may commit; the loser gets
CommitConflictError and the table stays consistent. A crash between the
manifest create and the pointer swap must heal, not wedge."""

import json
import os

import pytest
from pyspark.sql import functions as F

from translator_ingests_spark.lake.table import (
    CommitConflictError,
    LakeSchema,
    LakeTable,
)


def _mk_table(spark, root):
    return LakeTable.create(
        spark,
        root,
        LakeSchema.from_names(
            [("repo", "string"), ("path", "string"), ("content", "string"),
             ("last_lsn", "long")]
        ),
        key_cols=["repo", "path"],
        lsn_col="last_lsn",
        num_buckets=4,
    )


def _batch(spark, lsn0, n=4):
    rows = [
        ("r", f"f{i}.py", f"c{lsn0 + i}", "insert", lsn0 + i) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string, lsn long"
    )


def test_racing_writers_one_wins(spark, tmp_path):
    root = str(tmp_path / "lake")
    _mk_table(spark, root)
    a = LakeTable(spark, root)
    b = LakeTable(spark, root)

    a.merge(_batch(spark, 0), batch_id=0)
    # both instances now observe version 1 and race to commit version 2
    base_a = a.current().version
    base_b = b.current().version
    assert base_a == base_b

    a.merge(_batch(spark, 100), batch_id=1)
    # b computed its merge against the SAME base; its commit must fail
    # rather than silently overwrite a's published snapshot
    with pytest.raises(CommitConflictError):
        snap = b.current()
        # simulate b having planned against the stale base: force the same
        # target version a just took
        from translator_ingests_spark.lake.table import _atomic_create_json

        _atomic_create_json(
            b._snapshot_path(snap.version), {"any": "payload"}
        )

    # retry path: b re-reads the healed current() and commits cleanly on top
    b.merge(_batch(spark, 200), batch_id=2)
    assert b.current().last_batch_id == 2
    # a's batch-1 rows and b's batch-2 rows are both present
    state = {r["path"]: r["last_lsn"] for r in b.read().collect()}
    assert state["f0.py"] == 200 and len(state) == 4


def test_crash_between_create_and_pointer_swap_heals(spark, tmp_path):
    root = str(tmp_path / "lake")
    _mk_table(spark, root)
    t = LakeTable(spark, root)
    t.merge(_batch(spark, 0), batch_id=0)
    committed = t.current()

    # simulate the crash: manifest for version+1 exists, pointer still lags
    with open(t._snapshot_path(committed.version)) as fh:
        payload = json.load(fh)
    payload["version"] = committed.version + 1
    payload["parent"] = committed.version
    payload["last_batch_id"] = 1
    from translator_ingests_spark.lake.table import _atomic_create_json

    _atomic_create_json(t._snapshot_path(committed.version + 1), payload)

    healed = LakeTable(spark, root).current()
    assert healed.version == committed.version + 1
    assert healed.last_batch_id == 1
    # the pointer file itself was repaired on read
    with open(t._pointer_path) as fh:
        assert json.load(fh)["version"] == committed.version + 1


def test_exactly_once_skip_still_holds_after_heal(spark, tmp_path):
    """A resume run against a healed table must skip the already-committed
    batch (exactly-once) rather than double-applying it."""
    root = str(tmp_path / "lake")
    _mk_table(spark, root)
    t = LakeTable(spark, root)
    t.merge(_batch(spark, 0), batch_id=0)
    v1 = t.current().version

    t2 = LakeTable(spark, root)
    # replay of batch 0 on a fresh handle: merge's batch-id guard must skip
    out = t2.merge(_batch(spark, 0), batch_id=0)
    assert t2.current().version == v1  # no new snapshot
    _ = out
    rows = t2.read().count()
    assert rows == 4
