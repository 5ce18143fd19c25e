"""Incremental re-merge safety (ADVICE r2, medium): merge_lakes must detect
when an incremental re-merge would be UNSOUND and rebuild the merged table
from scratch instead:

1. a source compacted tombstones away past the merged table's consumed
   watermark — the delete would otherwise never reach the merged table and
   the dead key would survive there (resurrection);
2. the source set changed — a newly added source's rows at or below the
   merged table's watermark would be silently dropped by merge()'s
   duplicate guard.
"""

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake.maintenance import compact
from translator_ingests_spark.lake.merge_sources import merge_lakes


def _ev(lsn, op, repo, path, content=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path,
        "commit": format(lsn, "040x"), "lang": "py", "content": content,
        "schema_change": None, "source_partition": 0, "source_offset": lsn,
        "extras": None,
    }


def _apply(spark, root, events):
    eng = CdcEngine(spark, root, num_buckets=4)
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), n_batches=1)
    return eng


def _keys(table):
    return {(r["repo"], r["path"]) for r in table.read().collect()}


def test_compacted_tombstone_triggers_rebuild_no_resurrection(spark, tmp_path):
    s1 = _apply(spark, str(tmp_path / "s1"),
                [_ev(0, "insert", "r1", "a", "v0"), _ev(1, "insert", "r1", "b", "v1")])
    s2 = _apply(spark, str(tmp_path / "s2"), [_ev(2, "insert", "r2", "c", "w0")])
    out_root = str(tmp_path / "merged")

    out, info = merge_lakes(spark, [s1.table, s2.table], out_root)
    assert _keys(out) == {("r1", "a"), ("r1", "b"), ("r2", "c")}

    # source 1 deletes a key, then compacts the tombstone away BEFORE the
    # merged table re-consumes — the classic lost-delete hazard
    s1.apply_log(
        spark.createDataFrame([_ev(10, "delete", "r1", "a")], EVENT_SCHEMA),
        n_batches=1,
    )
    compact(s1.table, drop_tombstones=True)
    assert s1.table.current().tombstones_dropped_below >= 10

    out, info = merge_lakes(spark, [s1.table, s2.table], out_root)
    assert info["rebuilt"] is True
    assert _keys(out) == {("r1", "b"), ("r2", "c")}  # no resurrection


def test_source_set_change_triggers_rebuild(spark, tmp_path):
    s1 = _apply(spark, str(tmp_path / "s1"),
                [_ev(0, "insert", "r1", "a", "v0"), _ev(5, "insert", "r1", "b", "v1")])
    out_root = str(tmp_path / "merged")
    out, _ = merge_lakes(spark, [s1.table], out_root)
    assert out.current().low_watermark == 5

    # a NEW source whose rows all sit at/below the merged watermark — an
    # incremental merge would filter them as "known duplicates"
    s2 = _apply(spark, str(tmp_path / "s2"), [_ev(3, "insert", "r2", "c", "w0")])
    out, info = merge_lakes(spark, [s1.table, s2.table], out_root)
    assert info["rebuilt"] is True
    assert _keys(out) == {("r1", "a"), ("r1", "b"), ("r2", "c")}


def test_unchanged_sources_skip_or_incremental(spark, tmp_path):
    s1 = _apply(spark, str(tmp_path / "s1"), [_ev(0, "insert", "r1", "a", "v0")])
    out_root = str(tmp_path / "merged")
    merge_lakes(spark, [s1.table], out_root)
    # identical builds: second call is a metadata no-op
    out, info = merge_lakes(spark, [s1.table], out_root)
    assert info["skipped"] is True
    # a normal source advance (no compaction, same set) re-merges in place
    s1.apply_log(
        spark.createDataFrame([_ev(7, "insert", "r1", "b", "v1")], EVENT_SCHEMA),
        n_batches=1,
    )
    out, info = merge_lakes(spark, [s1.table], out_root)
    assert info["skipped"] is False and info["rebuilt"] is False
    assert _keys(out) == {("r1", "a"), ("r1", "b")}
