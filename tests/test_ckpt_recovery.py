"""Checkpoint-manifest crash recovery: a crash BETWEEN the lake snapshot
commit and the manifest write must not lose the manifest forever — the
replay-skip path rebuilds it from the committed snapshot, and the
validation gate still passes on the recovered state."""

import glob
import os

import pytest

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.cdc.validate import validate_engine_state


def ev(lsn, op, repo, path, content=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": f"c{lsn}",
        "lang": "py", "content": content, "schema_change": None,
        "source_partition": lsn % 2, "source_offset": lsn, "extras": None,
    }


def test_manifest_lost_after_commit_is_rebuilt(spark, tmp_path):
    events = [ev(i, "insert", "r", f"p{i}", f"v{i}") for i in range(6)]
    df = spark.createDataFrame(events, EVENT_SCHEMA)

    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    eng.apply_log(df, events_per_batch=3)

    # simulate the crash window: batch 0's lake commit survived but its
    # checkpoint manifest was never written
    ckpts = sorted(glob.glob(str(tmp_path / "cdc" / "ckpt" / "batch-*.json")))
    assert len(ckpts) == 2
    os.remove(ckpts[0])

    # rerun from the top (crash-resume): the skip path must RECONSTRUCT the
    # lost manifest from the committed snapshot, not return None
    eng2 = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    manifests = eng2.apply_log(df, events_per_batch=3)
    assert len(manifests) == 2
    m0 = manifests[0]
    assert m0 is not None and m0["batch_id"] == 0
    assert m0.get("recovered") is True
    assert m0["applied_lsn_min"] == 0 and m0["applied_lsn_max"] == 2
    assert m0["metrics"]["rows_upserted"] == 3
    # rebuilt manifest is persisted for future runs
    assert os.path.exists(ckpts[0])

    # the validation gate accepts the recovered state (applied-LSN bounds
    # come from the rebuilt manifest's lineage)
    report = validate_engine_state(eng2)
    assert report["passed"], report
    assert eng2.final_state().count() == 6


def sev(lsn, kind, column, new_type=None):
    return {
        "lsn": lsn, "op": "schema_change", "repo": None, "path": None,
        "commit": None, "lang": None, "content": None,
        "schema_change": {"kind": kind, "column": column, "new_name": None,
                          "new_type": new_type},
        "source_partition": 0, "source_offset": lsn, "extras": None,
    }


def _ckpt_ids(root):
    return sorted(
        int(os.path.basename(p)[len("batch-"):-len(".json")])
        for p in glob.glob(str(root / "cdc" / "ckpt" / "batch-*.json"))
    )


def test_empty_schema_split_slot_survives_snapshot_expiry(spark, tmp_path):
    """A schema event at a batch's lowest LSN makes the sub-range below it
    empty: that slot commits nothing and writes no manifest — a checkpoint
    HOLE. Replaying after aggressive snapshot expiry must not misread the
    hole as a crash-lost manifest: manifests are written strictly in unit
    order, so a later unit's manifest proves the hole finished empty even
    when the pre-hole snapshots are gone."""
    from translator_ingests_spark.lake.maintenance import expire_snapshots

    events = [ev(i, "insert", "r", f"p{i}", f"v{i}") for i in range(6)]
    events.append(sev(6, "add_column", "meta1", "string"))
    events += [ev(i, "insert", "r", f"p{i}", f"v{i}") for i in (7, 8, 9)]
    df = spark.createDataFrame(events, EVENT_SCHEMA)

    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    eng.apply_log(df, events_per_batch=3)
    # batch {6,7,8} schema-splits; the below-lsn-6 sub-range is empty →
    # unit 2 is a hole, units 0,1,3,4 committed with manifests
    assert _ckpt_ids(tmp_path) == [0, 1, 3, 4]

    # expire everything but the head — the snapshots the hole-vs-lost walk
    # used as evidence are now gone
    expire_snapshots(eng.table, keep_last=1)

    # replay-classified second call (all data LSNs already applied) walks
    # every slot including the hole; before the fix this raised
    # "manifest for committed batch 2 is lost"
    eng2 = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    manifests = eng2.apply_log(df, events_per_batch=3)
    assert [m["batch_id"] for m in manifests] == [0, 1, 3, 4]
    assert eng2.final_state().count() == 9

    report = validate_engine_state(eng2)
    assert report["passed"], report


def test_lost_newest_manifest_self_heals_by_tail_reapply(spark, tmp_path):
    """Externally losing the NEWEST unit's manifest (with its backing
    snapshot expired) does not hit the skip path's later-manifest fallback
    at all: the resume run derives its applied watermark from the REMAINING
    manifests, so the uncovered LSN range classifies as a tail and
    re-applies idempotently — LWW keeps the state byte-identical, and the
    new manifests re-cover the lost range's lineage. The loud-raise path
    stays reserved for a mid-sequence slot whose coverage no surviving
    manifest or snapshot can vouch for."""
    from translator_ingests_spark.lake.maintenance import expire_snapshots

    events = [ev(i, "insert", "r", f"p{i}", f"v{i}") for i in range(6)]
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    eng.apply_log(df, events_per_batch=3)
    assert _ckpt_ids(tmp_path) == [0, 1]
    before = sorted(
        (r["repo"], r["path"], r["content"], r["last_lsn"])
        for r in eng.final_state().collect()
    )

    # externally lose the NEWEST unit's manifest...
    os.remove(str(tmp_path / "cdc" / "ckpt" / "batch-00000001.json"))
    # ...and expire its backing snapshot (a later metadata-only commit
    # becomes the only retained head)
    eng.table.update_schema("add_column", "meta1", new_type="string")
    expire_snapshots(eng.table, keep_last=1)

    eng2 = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    with pytest.warns(UserWarning, match="redelivered boundary"):
        manifests = eng2.apply_log(df, events_per_batch=3)
    # the uncovered range re-applied as fresh units (manifest coverage
    # restored past the lost unit's LSNs)...
    covered_max = max(m["applied_lsn_max"] for m in manifests if m)
    assert covered_max == 5
    # ...and LWW kept the state byte-identical
    after = sorted(
        (r["repo"], r["path"], r["content"], r["last_lsn"])
        for r in eng2.final_state().collect()
    )
    assert after == before
    report = validate_engine_state(eng2)
    assert report["passed"], report
