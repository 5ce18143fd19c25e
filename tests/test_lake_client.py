"""Lake client surfaces: tags (named refs), metadata tables, and the
checkpointed change-feed consumer (downstream incremental reads)."""

import os

import pytest

from translator_ingests_spark.lake import LakeSchema, LakeTable
from translator_ingests_spark.lake import refs
from translator_ingests_spark.lake.maintenance import expire_snapshots
from translator_ingests_spark.lake.metadata_tables import (
    file_size_histogram,
    files_table,
    snapshots_table,
)
from translator_ingests_spark.streaming.change_consumer import (
    ChangesConsumer,
    CursorExpiredError,
)

SCHEMA = LakeSchema.from_names(
    [("repo", "string"), ("path", "string"), ("content", "string"), ("last_lsn", "long")]
)


def mk(spark, root):
    return LakeTable.create(spark, root, SCHEMA, key_cols=["repo", "path"],
                            lsn_col="last_lsn", num_buckets=8)


def src(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string, lsn long"
    )


def seed(spark, root, n=20):
    t = mk(spark, root)
    t.merge(src(spark, [(f"r{i}", "a", f"v0-{i}", "insert", i) for i in range(n)]),
            batch_id=0)
    return t


# -- tags -------------------------------------------------------------------

def test_tag_pin_read_and_move(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    v0 = refs.tag(t, "prod")
    t.merge(src(spark, [("r0", "a", "patched", "update", 1000)]), batch_id=1)
    # tagged read sees the pre-update state, live read the new one
    tagged = {r["content"] for r in refs.read_tag(t, "prod").collect()}
    assert "patched" not in tagged
    assert {r["content"] for r in t.read().collect()} >= {"patched"}
    # moving the tag re-pins
    assert refs.tag(t, "prod") == t.current().version > v0
    assert "patched" in {r["content"] for r in refs.read_tag(t, "prod").collect()}


def test_tag_requires_committed_snapshot_and_drop(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    with pytest.raises(FileNotFoundError):
        refs.tag(t, "nope", version=99)
    refs.tag(t, "x")
    refs.drop_tag(t, "x")
    assert refs.list_tags(t) == {}
    with pytest.raises(KeyError):
        refs.drop_tag(t, "x")


def test_gc_keeps_tagged_snapshots(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    v_tagged = refs.tag(t, "keepme")
    for b in range(1, 4):
        t.merge(src(spark, [("r1", "a", f"p{b}", "update", 1000 + b)]), batch_id=b)
    res = expire_snapshots(t, keep_last=1)
    assert res["snapshots_removed"] > 0
    # the tagged snapshot survived and still reads
    assert v_tagged in t.history()
    assert refs.read_tag(t, "keepme").count() == 20
    # drop the tag → next GC may reclaim it
    refs.drop_tag(t, "keepme")
    expire_snapshots(t, keep_last=1)
    assert v_tagged not in t.history()


# -- metadata tables --------------------------------------------------------

def test_files_and_snapshots_tables(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    t.merge(src(spark, [("r1", "a", "p", "update", 1000)]), batch_id=1)
    refs.tag(t, "prod")

    ft = files_table(t)
    assert ft.count() == len(list(t.current().files))
    assert {"path", "rows", "bucket_min", "is_delta"} <= set(ft.columns)

    st = snapshots_table(t).orderBy("version").collect()
    versions = [r["version"] for r in st]
    assert versions == t.history()
    cur = [r for r in st if r["is_current"]]
    assert len(cur) == 1 and cur[0]["version"] == t.current().version
    assert cur[0]["tags"] == ["prod"]
    # n_files agrees with the manifest
    assert cur[0]["n_files"] == len(list(t.current().files))


def test_file_size_histogram_buckets(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    h = file_size_histogram(t).collect()
    assert sum(r["n_files"] for r in h) == len(list(t.current().files))
    assert all(r["n_deltas"] == 0 for r in h)
    t.merge(src(spark, [("r1", "a", "d", "update", 1000)]), batch_id=1, mode="mor")
    h2 = {r["bucket_min"]: r for r in file_size_histogram(t).collect()}
    assert sum(r["n_deltas"] for r in h2.values()) >= 1


# -- change-feed consumer ---------------------------------------------------

def test_consumer_bootstrap_then_incremental(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    c = ChangesConsumer(t, str(tmp_path / "ckpt"), name="idx")
    assert c.bootstrap().count() == 20
    assert c.poll() is None  # caught up

    t.merge(src(spark, [("r1", "a", "p1", "update", 1000),
                        ("r2", "a", None, "delete", 1001)]), batch_id=1)
    df, v_from, v_to = c.poll()
    got = {(r["repo"], r["_change_type"]) for r in df.collect()}
    assert ("r1", "upsert") in got and ("r2", "delete") in got
    c.commit(v_to)
    assert c.poll() is None


def test_consumer_redelivers_until_commit_and_coalesces(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    c = ChangesConsumer(t, str(tmp_path / "ckpt"))
    c.bootstrap()
    t.merge(src(spark, [("r1", "a", "p1", "update", 1000)]), batch_id=1)
    first = c.poll()
    assert first is not None
    # crash before commit → same position, next poll redelivers
    again = c.poll()
    assert again is not None and again[1] == first[1]
    # two further commits before processing → ONE coalesced net batch
    t.merge(src(spark, [("r1", "a", "p2", "update", 1001)]), batch_id=2)
    t.merge(src(spark, [("r1", "a", "p3", "update", 1002)]), batch_id=3)
    df, v_from, v_to = c.poll()
    rows = [r for r in df.collect() if r["repo"] == "r1"]
    assert len(rows) == 1 and rows[0]["content"] == "p3"
    c.commit(v_to)
    # cursor can never regress
    with pytest.raises(ValueError):
        c.commit(v_from)


def test_consumer_cursor_survives_restart_and_expiry_raises(spark, tmp_path):
    # pin_retention=False: this test exercises the UNPINNED consumer's
    # offset-out-of-range path (the pinned default is covered by
    # tests/test_cursor_retention.py)
    root = str(tmp_path / "l")
    t = seed(spark, root)
    ck = str(tmp_path / "ckpt")
    c = ChangesConsumer(t, ck, pin_retention=False)
    c.bootstrap()
    pos = c.position()
    # a fresh consumer instance resumes from the persisted cursor
    c2 = ChangesConsumer(LakeTable(spark, root), ck, pin_retention=False)
    assert c2.position() == pos
    # age the cursor out of retained history
    for b in range(1, 5):
        t.merge(src(spark, [("r1", "a", f"p{b}", "update", 1000 + b)]), batch_id=b)
    expire_snapshots(t, keep_last=1)
    with pytest.raises(CursorExpiredError):
        c2.poll()
    # rebuild path: bootstrap again, then incremental resumes cleanly
    assert c2.bootstrap().count() == 20
    assert c2.poll() is None


def test_consumer_process_available_drains(spark, tmp_path):
    t = seed(spark, str(tmp_path / "l"))
    c = ChangesConsumer(t, str(tmp_path / "ckpt"))
    c.bootstrap()
    seen = []
    t.merge(src(spark, [("r3", "a", "x", "update", 1000)]), batch_id=1)
    n = c.process_available(lambda df, a, b: seen.append((a, b, df.count())))
    assert n == 1 and len(seen) == 1 and seen[0][2] >= 1
    assert c.process_available(lambda *a: None) == 0
