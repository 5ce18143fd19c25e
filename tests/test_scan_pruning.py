"""Manifest column statistics → predicate file skipping (lake/scan.py).

The Iceberg data-skipping analog: per-file min/max recorded at write time
(one footer read, no data pages), a conservative driver-side evaluator that
proves files irrelevant, and a pruned read that must be RESULT-IDENTICAL to
the unpruned filter. Soundness axes covered here: missing stats keep the
file, evolution-added columns never prune (``__extras`` fallback), renamed
columns resolve per file via field ids, merge-on-read delta closures are
always read, and the DML probe with triples matches the Column form.
"""

import dataclasses

from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake import scan
from translator_ingests_spark.lake.dml import delete_where, update_where
from translator_ingests_spark.lake.maintenance import cluster_by
from translator_ingests_spark.lake.scan import _excludes


def ev(lsn, op, repo=None, path=None, commit=None, lang=None, content=None,
       extras=None, schema_change=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": content, "schema_change": schema_change,
        "source_partition": 0, "source_offset": lsn, "extras": extras,
    }


def seed(spark, tmp_path, n=24, num_buckets=1, **kw):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=num_buckets,
                    auto_compact_every=None, **kw)
    events = [
        ev(i, "insert", f"r{i % 2}", f"p{i}", f"c{i}",
           f"l{i // 8:02d}", f"v{i}")
        for i in range(n)
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA),
                  events_per_batch=100)
    return eng


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_excludes_truth_table():
    # [10, 20] bounds vs each op — prune only on PROOF
    assert _excludes(10, 20, "=", 5) and _excludes(10, 20, "=", 25)
    assert not _excludes(10, 20, "=", 10) and not _excludes(10, 20, "=", 15)
    assert _excludes(10, 20, "<", 10) and not _excludes(10, 20, "<", 11)
    assert _excludes(10, 20, "<=", 9) and not _excludes(10, 20, "<=", 10)
    assert _excludes(10, 20, ">", 20) and not _excludes(10, 20, ">", 19)
    assert _excludes(10, 20, ">=", 21) and not _excludes(10, 20, ">=", 20)
    assert _excludes(10, 20, "in", [1, 2, 30]) and not _excludes(10, 20, "in", [1, 15])
    assert _excludes(10, 20, "in", [])  # empty IN matches nothing
    assert _excludes("bb", "dd", "=", "aa") and not _excludes("bb", "dd", "=", "cc")
    # type mismatch is never provable
    assert not _excludes("bb", "dd", "=", 5)
    assert not _excludes(10, 20, ">", "zz")


def test_read_where_prunes_files_after_cluster_by(spark, tmp_path):
    eng = seed(spark, tmp_path)  # 24 rows, langs l00/l01/l02, one bucket
    snap = cluster_by(eng.table, ["lang"], target_files=3)
    assert len(snap.files) > 1
    preds = [("lang", "=", "l00")]
    pruned = scan.prune_files(eng.table, snap, preds)
    assert 0 < len(pruned) < len(snap.files)  # real skipping happened
    got = scan.read_where(eng.table, preds)
    want = eng.table.read().filter(F.col("lang") == "l00")
    assert rows(got) == rows(want) and got.count() == 8


def test_range_preds_and_conjunction(spark, tmp_path):
    eng = seed(spark, tmp_path)
    cluster_by(eng.table, ["lang"], target_files=3)
    for preds in (
        [("lang", ">=", "l01")],
        [("lang", "<", "l01")],
        [("lang", "in", ["l00", "l02"])],
        [("lang", ">", "l00"), ("repo", "=", "r1")],
        [("lang", "in", [])],
    ):
        got = scan.read_where(eng.table, preds)
        want = eng.table.read().filter(scan.predicates_condition(preds))
        assert rows(got) == rows(want)


def test_missing_stats_keep_every_file(spark, tmp_path):
    # manifests written before the column stats existed must never prune
    eng = seed(spark, tmp_path)
    snap = cluster_by(eng.table, ["lang"], target_files=3)
    legacy = dataclasses.replace(
        snap,
        files=[{k: v for k, v in f.items() if k != "cols"} for f in snap.files],
    )
    kept = scan.prune_files(eng.table, legacy, [("lang", "=", "zz")])
    assert len(kept) == len(snap.files)


def test_evolution_added_column_never_prunes(spark, tmp_path):
    eng = seed(spark, tmp_path, n=8)
    add = {"kind": "add_column", "column": "tier", "new_name": None,
           "new_type": "string"}
    nxt = [
        ev(100, "schema_change", schema_change=add),
        ev(101, "insert", "r0", "pX", "cX", "l09", "vX",
           extras={"tier": "gold"}),
    ]
    eng.apply_log(spark.createDataFrame(nxt, EVENT_SCHEMA), n_batches=1)
    snap = eng.table.current()
    # stats exist for files written post-add, but the column may surface
    # from __extras on older rows — pruning on it is forbidden
    kept = scan.prune_files(eng.table, snap, [("tier", "=", "gold")])
    assert len(kept) == len(snap.files)
    got = scan.read_where(eng.table, [("tier", "=", "gold")])
    assert [r["path"] for r in got.collect()] == ["pX"]


def test_renamed_column_resolves_per_file_stats(spark, tmp_path):
    eng = seed(spark, tmp_path)
    cluster_by(eng.table, ["lang"], target_files=3)
    ren = {"kind": "rename_column", "column": "lang", "new_name": "language",
           "new_type": None}
    eng.apply_log(
        spark.createDataFrame([ev(100, "schema_change", schema_change=ren)],
                              EVENT_SCHEMA),
        n_batches=1,
    )
    snap = eng.table.current()
    # rename is metadata-only: stats live under the STORED name "lang";
    # a predicate on the current name must still prove files irrelevant
    kept = scan.prune_files(eng.table, snap, [("language", "=", "zz")])
    assert len(kept) < len(snap.files)
    assert scan.read_where(eng.table, [("language", "=", "zz")]).count() == 0
    got = scan.read_where(eng.table, [("language", "=", "l02")])
    assert got.count() == 8


def test_mor_delta_closure_always_read(spark, tmp_path):
    eng = seed(spark, tmp_path, write_mode="mor")
    # a delta update moves p1's lang to a value no base file's stats hold
    nxt = [ev(100, "update", "r1", "p1", "cZ", "zz", "patched")]
    eng.apply_log(spark.createDataFrame(nxt, EVENT_SCHEMA), n_batches=1)
    snap = eng.table.current()
    assert any(f.get("delta") for f in snap.files)
    got = scan.read_where(eng.table, [("lang", "=", "zz")])
    assert [r["content"] for r in got.collect()] == ["patched"]
    # and the superseded base row must NOT resurrect under the old value
    old = scan.read_where(eng.table, [("lang", "=", "l00"), ("path", "=", "p1")])
    assert old.count() == 0


def test_dml_preds_match_column_form(spark, tmp_path):
    a = seed(spark, tmp_path / "a")
    b = seed(spark, tmp_path / "b")
    delete_where(a.table, F.col("lang") == "l00", at_lsn=1000)
    delete_where(b.table, None, at_lsn=1000, preds=[("lang", "=", "l00")])
    assert rows(a.table.read()) == rows(b.table.read())
    update_where(a.table, F.col("lang") == "l01",
                 {"content": F.lit("x")}, at_lsn=2000)
    update_where(b.table, None, {"content": F.lit("x")}, at_lsn=2000,
                 preds=[("lang", "=", "l01")])
    assert rows(a.table.read()) == rows(b.table.read())


def test_dml_probe_prunes_with_preds(spark, tmp_path, monkeypatch):
    """The preds-pruned probe must land on the same files as the full probe
    and the rewrite must splice untouched files through unrewritten — and
    BOTH DML verbs must actually route preds into prune_files (a spy pins
    the call: without it the probe regresses to an O(table) full scan with
    every result-level assertion still green)."""
    eng = seed(spark, tmp_path)
    cluster_by(eng.table, ["lang"], target_files=3)
    before = {f["path"] for f in eng.table.current().files}
    probe_sizes = []
    real_prune = scan.prune_files

    def spy(table, snap, preds):
        out = real_prune(table, snap, preds)
        probe_sizes.append((len(out), len(snap.files)))
        return out

    monkeypatch.setattr("translator_ingests_spark.lake.dml.scan.prune_files", spy)
    snap = delete_where(eng.table, None, at_lsn=1000,
                        preds=[("lang", "=", "l02")])
    assert snap.operation == "delete"
    assert before & {f["path"] for f in snap.files}  # untouched files kept
    assert eng.table.read().filter(F.col("lang") == "l02").count() == 0
    assert eng.table.read().count() == 16
    update_where(eng.table, None, {"content": F.lit("x")}, at_lsn=2000,
                 preds=[("lang", "=", "l01")])
    assert {r["content"] for r in
            eng.table.read().filter(F.col("lang") == "l01").collect()} == {"x"}
    # one pruned probe per verb, each scanning fewer files than the table
    assert len(probe_sizes) == 2
    assert all(kept < total for kept, total in probe_sizes)
