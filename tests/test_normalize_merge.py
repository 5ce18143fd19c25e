"""Normalization-map stage (strict/lenient modes, dependent dropping,
artifacts) and the multi-source merge job (version-consistency gate, release
versioning, early-exit, delete propagation across sources)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from translator_ingests_spark.lake import LakeSchema, LakeTable
from translator_ingests_spark.lake.merge_sources import (
    VersionConsistencyError,
    merge_lakes,
    release_version,
)
from translator_ingests_spark.operators.normalize import (
    apply_normalization_map,
    drop_dependents,
    write_normalization_artifacts,
)

# -- normalization stage ------------------------------------------------------


@pytest.fixture()
def norm_fixture(spark):
    nodes = spark.createDataFrame(
        [("A", 1), ("B", 2), ("C", 3), ("D", 4)], "id string, payload int"
    )
    # B maps to NULL (known-unnormalizable), D is absent from the map
    norm_map = spark.createDataFrame(
        [("A", "pref:A"), ("B", None), ("C", "pref:C")],
        "raw_id string, preferred_id string",
    )
    edges = spark.createDataFrame(
        [("A", "C", 1), ("B", "C", 2), ("C", "D", 3)],
        "src string, dst string, w int",
    )
    return nodes, norm_map, edges


def test_strict_mode_drops_and_reports(spark, norm_fixture):
    nodes, norm_map, _ = norm_fixture
    normalized, failures = apply_normalization_map(nodes, norm_map, "id", strict=True)
    assert {r["id"] for r in normalized.collect()} == {"pref:A", "pref:C"}
    fails = {r["id"]: r["failure_reason"] for r in failures.collect()}
    assert fails == {"B": "unnormalizable", "D": "not_in_map"}


def test_lenient_mode_passes_through(spark, norm_fixture):
    nodes, norm_map, _ = norm_fixture
    normalized, failures = apply_normalization_map(nodes, norm_map, "id", strict=False)
    assert {r["id"] for r in normalized.collect()} == {"pref:A", "B", "pref:C", "D"}
    assert failures.count() == 2  # still reported, not dropped


def test_dependents_of_failed_ids_dropped(spark, norm_fixture):
    nodes, norm_map, edges = norm_fixture
    _, failures = apply_normalization_map(nodes, norm_map, "id", strict=True)
    kept = drop_dependents(edges, failures, fk_col="src", failed_id_col="id")
    kept = drop_dependents(kept, failures, fk_col="dst", failed_id_col="id")
    # edge B->C dropped (src failed), C->D dropped (dst failed)
    assert [(r["src"], r["dst"]) for r in kept.collect()] == [("A", "C")]


def test_normalization_artifacts_written(spark, norm_fixture, tmp_path):
    nodes, norm_map, _ = norm_fixture
    _, failures = apply_normalization_map(nodes, norm_map, "id", strict=True)
    summary = write_normalization_artifacts(str(tmp_path), norm_map, failures, "id")
    assert summary["map_entries"] == 3 and summary["failed_ids"] == 2
    meta = json.load(open(tmp_path / "normalization_metadata.json"))
    assert meta["failed_ids"] == 2
    written_map = spark.read.json(summary["map_path"])
    assert written_map.count() == 3


def test_broadcast_join_in_normalize_plan(spark, norm_fixture):
    nodes, norm_map, _ = norm_fixture
    normalized, _ = apply_normalization_map(nodes, norm_map, "id", strict=True)
    plan = normalized._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the map never shuffles the fact side


# -- multi-source merge -------------------------------------------------------

SCHEMA = LakeSchema.from_names(
    [("repo", "string"), ("path", "string"), ("content", "string"), ("last_lsn", "long")]
)


def _mk_source(spark, root, rows, code_hash="cafe0001", batch_id=0):
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], "last_lsn", 4)
    df = spark.createDataFrame(
        rows, "repo string, path string, content string, op string, lsn long"
    )
    t.merge(df, batch_id=batch_id, code_hash=code_hash)
    return t


def test_merge_lakes_lww_and_delete_across_sources(spark, tmp_path):
    # source A: older update for k1, insert k2. source B: delete k1 (newer),
    # update k2 (newer). merged: k1 gone, k2 = B's version.
    a = _mk_source(spark, str(tmp_path / "a"),
                   [("r", "k1", "a1", "insert", 1), ("r", "k2", "a2", "insert", 2)])
    b = _mk_source(spark, str(tmp_path / "b"),
                   [("r", "k1", None, "delete", 5), ("r", "k2", "b2", "update", 6)])
    merged, info = merge_lakes(spark, [a, b], str(tmp_path / "m"))
    state = {(r["repo"], r["path"]): r["content"] for r in merged.read().collect()}
    assert state == {("r", "k2"): "b2"}
    assert not info["skipped"]
    # rerun with unchanged inputs: early-exit on identical release version
    merged2, info2 = merge_lakes(spark, [a, b], str(tmp_path / "m"))
    assert info2["skipped"] and info2["release_version"] == info["release_version"]


def test_merge_lakes_version_gate_rejects_mixed_builds(spark, tmp_path):
    a = _mk_source(spark, str(tmp_path / "a"),
                   [("r", "k1", "a1", "insert", 1)], code_hash="cafe0001")
    b = _mk_source(spark, str(tmp_path / "b"),
                   [("r", "k2", "b1", "insert", 2)], code_hash="beef0002")
    with pytest.raises(VersionConsistencyError):
        merge_lakes(spark, [a, b], str(tmp_path / "m"))


def test_release_version_is_order_insensitive_md5(spark):
    v1 = release_version(["b:1", "a:2"])
    v2 = release_version(["a:2", "b:1"])
    assert v1 == v2 and len(v1) == 32
    assert v1 != release_version(["a:3", "b:1"])


def test_merge_lakes_with_mor_source(spark, tmp_path):
    # a source with PENDING merge-on-read deltas: read_raw folds them, so
    # the cross-lake merge sees the net state (B's delta delete of k1 must
    # out-rank A's older update; B's delta update of k2 must win)
    a = _mk_source(spark, str(tmp_path / "a"),
                   [("r", "k1", "a1", "insert", 1), ("r", "k2", "a2", "insert", 2)])
    b = _mk_source(spark, str(tmp_path / "b"),
                   [("r", "k1", "b0", "insert", 3), ("r", "k2", "b1", "insert", 4)])
    df = spark.createDataFrame(
        [("r", "k1", None, "delete", 5), ("r", "k2", "b2", "update", 6)],
        "repo string, path string, content string, op string, lsn long",
    )
    b.merge(df, batch_id=1, code_hash="cafe0001", mode="mor")
    assert any(f.get("delta") for f in b.current().files)
    merged, info = merge_lakes(spark, [a, b], str(tmp_path / "m"))
    state = {(r["repo"], r["path"]): r["content"] for r in merged.read().collect()}
    assert state == {("r", "k2"): "b2"}
