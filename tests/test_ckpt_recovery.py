"""Checkpoint-manifest crash recovery: a crash BETWEEN the lake snapshot
commit and the manifest write must not lose the manifest forever — the
replay-skip path rebuilds it from the committed snapshot, and the
validation gate still passes on the recovered state."""

import glob
import os

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
