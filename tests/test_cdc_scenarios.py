"""End-to-end CDC engine scenarios (FIXTURES.md §A4, north-star test matrix):
LWW basics, out-of-order delivery, duplicate redelivery, delete semantics,
mid-stream schema evolution, rename/widen, crash-resume, hot-key salting,
and full oracle equality under the content-sha256 invariant."""

import hashlib

import pytest
from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA, generate_event_log
from translator_ingests_spark.cdc.oracle import replay_oracle


def ev(lsn, op, repo=None, path=None, commit=None, lang=None, content=None,
       schema_change=None, source_partition=0, source_offset=None, extras=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": content, "schema_change": schema_change,
        "source_partition": source_partition,
        "source_offset": source_offset if source_offset is not None else lsn,
        "extras": extras,
    }


def make_engine(spark, tmp_path, **kw):
    return CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4, **kw)


def run(spark, tmp_path, events, **apply_kw):
    eng = make_engine(spark, tmp_path)
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    apply_kw.setdefault("events_per_batch", 3)
    eng.apply_log(df, **apply_kw)
    return eng


def state(eng):
    return {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}


def sha(text):
    return hashlib.sha256(text.encode()).hexdigest()


def test_lww_basics(spark, tmp_path):
    events = [
        ev(0, "insert", "r", "a", "c0", "python", "v0"),
        ev(1, "update", "r", "a", "c1", "python", "v1"),
        ev(2, "update", "r", "a", "c2", "python", "v2"),
    ]
    eng = run(spark, tmp_path, events, events_per_batch=10)
    st = state(eng)
    assert set(st) == {("r", "a")}
    row = st[("r", "a")]
    assert row["content"] == "v2" and row["last_lsn"] == 2
    assert row["content_sha256"] == sha("v2")


def test_out_of_order_across_batches(spark, tmp_path):
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(5, "update", "r", "a", "c5", "py", "v5"),
        ev(3, "update", "r", "a", "c3", "py", "v3"),
        ev(1, "update", "r", "b", "c1", "py", "w1"),
        ev(4, "delete", "r", "b"),
        ev(2, "update", "r", "b", "c2", "py", "w2"),
    ]
    # scatter delivery: events land in arbitrary batches
    eng = run(spark, tmp_path, events, events_per_batch=None, n_batches=3,
              scatter_delivery=True)
    st = state(eng)
    assert set(st) == {("r", "a")}
    assert st[("r", "a")]["content"] == "v5"


def test_duplicate_redelivery_idempotent(spark, tmp_path):
    base = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(1, "update", "r", "a", "c1", "py", "v1"),
    ]
    # every event delivered three times
    events = base + base + base
    eng = run(spark, tmp_path, events, events_per_batch=2)
    st = state(eng)
    assert st[("r", "a")]["content"] == "v1" and len(st) == 1
    ms = eng.manifests()
    assert sum(m["metrics"]["dups_dropped"] for m in ms) > 0

    # replaying the *whole log* against the existing table changes nothing
    v_before = eng.table.current().version
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    eng.apply_log(df, events_per_batch=2)
    assert eng.table.current().version == v_before
    assert state(eng) == st


def test_delete_semantics(spark, tmp_path):
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(9, "delete", "r", "a"),
        ev(5, "update", "r", "a", "c5", "py", "v5"),  # stale, after delete
    ]
    eng = run(spark, tmp_path, events, events_per_batch=1)
    assert state(eng) == {}


def test_mid_stream_schema_evolution(spark, tmp_path):
    sc = {"kind": "add_column", "column": "lang_meta", "new_name": None,
          "new_type": "string"}
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(1, "schema_change", schema_change=sc),
        ev(2, "insert", "r", "b", "c2", "py", "v2", extras={"lang_meta": "m2"}),
    ]
    eng = run(spark, tmp_path, events, events_per_batch=10)
    st = state(eng)
    assert st[("r", "a")]["lang_meta"] is None       # written pre-evolution
    assert st[("r", "b")]["lang_meta"] == "m2"       # post-evolution row
    assert "lang_meta" in eng.final_state().columns


def test_schema_evolution_gates_stale_events(spark, tmp_path):
    """An event *older* than the add_column delivered late must not populate
    the new column (order-independence of the final state)."""
    sc = {"kind": "add_column", "column": "lang_meta", "new_name": None,
          "new_type": "string"}
    events = [
        ev(5, "schema_change", schema_change=sc),
        # lsn 3 < 5 but delivered in a later batch than the schema change
        ev(3, "insert", "r", "a", "c3", "py", "v3", extras={"lang_meta": "SHOULD_NOT_APPEAR"}),
        ev(7, "insert", "r", "b", "c7", "py", "v7", extras={"lang_meta": "ok"}),
    ]
    eng = run(spark, tmp_path, events, events_per_batch=1)
    st = state(eng)
    assert st[("r", "a")]["lang_meta"] is None
    assert st[("r", "b")]["lang_meta"] == "ok"


def test_rename_and_widen(spark, tmp_path):
    add = {"kind": "add_column", "column": "score", "new_name": None, "new_type": "int"}
    ren = {"kind": "rename_column", "column": "score", "new_name": "rank_score",
           "new_type": None}
    wid = {"kind": "widen_type", "column": "rank_score", "new_name": None,
           "new_type": "long"}
    events = [
        ev(0, "schema_change", schema_change=add),
        ev(1, "insert", "r", "a", "c1", "py", "v1", extras={"score": "7"}),
        ev(2, "schema_change", schema_change=ren),
        ev(3, "schema_change", schema_change=wid),
        # post-rename producers key extras by the new name
        ev(4, "insert", "r", "b", "c4", "py", "v4", extras={"rank_score": "9000000000"}),
    ]
    eng = run(spark, tmp_path, events, events_per_batch=2)
    st = state(eng)
    assert st[("r", "a")]["rank_score"] == 7
    assert st[("r", "b")]["rank_score"] == 9000000000
    fields = {f.name: f.type for f in eng.table.current().schema.fields}
    assert fields["rank_score"] == "long"


def test_crash_resume_byte_identical(spark, tmp_path):
    events_df = generate_event_log(spark, 2000, seed=11, n_repos=20,
                                   paths_per_repo=10)
    rows = [r.asDict(recursive=True) for r in events_df.collect()]

    # uninterrupted run
    eng_full = CdcEngine(spark, str(tmp_path / "full"), num_buckets=4)
    eng_full.apply_log(spark.createDataFrame(rows, EVENT_SCHEMA), events_per_batch=500)
    full = {(r["repo"], r["path"]): r.asDict() for r in eng_full.final_state().collect()}

    # crashed run: stops after 2 committed units, then a fresh process resumes
    eng_a = CdcEngine(spark, str(tmp_path / "crash"), num_buckets=4)
    eng_a.apply_log(spark.createDataFrame(rows, EVENT_SCHEMA),
                    events_per_batch=500, max_units=2)
    assert eng_a.table.current().last_batch_id == 1

    eng_b = CdcEngine(spark, str(tmp_path / "crash"), num_buckets=4)  # "new process"
    eng_b.apply_log(spark.createDataFrame(rows, EVENT_SCHEMA), events_per_batch=500)
    resumed = {(r["repo"], r["path"]): r.asDict() for r in eng_b.final_state().collect()}

    assert resumed == full
    # per-row invariant: identical content_sha256 everywhere
    assert all(
        resumed[k]["content_sha256"] == full[k]["content_sha256"] for k in full
    )


def test_hot_key_knobs_do_not_change_results(spark, tmp_path):
    """Skew config is legacy: the decomposed LWW reduce needs no salting
    (see cdc/reduce.py), so a skewed log applies identically under any
    hot-key-threshold setting and reports hot_keys_salted == 0."""
    events_df = generate_event_log(spark, 3000, seed=13, n_repos=10,
                                   n_mega_repos=1, hot_fraction=0.6,
                                   paths_per_repo=5)
    rows = [r.asDict(recursive=True) for r in events_df.collect()]
    df = lambda: spark.createDataFrame(rows, EVENT_SCHEMA)  # noqa: E731

    eng_a = CdcEngine(spark, str(tmp_path / "a"), num_buckets=4,
                      hot_key_threshold=1, hot_sample_fraction=1.0)
    eng_a.apply_log(df(), events_per_batch=1000)
    assert all(m["metrics"]["hot_keys_salted"] == 0 for m in eng_a.manifests())

    eng_b = CdcEngine(spark, str(tmp_path / "b"), num_buckets=4,
                      hot_key_threshold=10**12)
    eng_b.apply_log(df(), events_per_batch=1000)

    s1 = {(r["repo"], r["path"]): r.asDict() for r in eng_a.final_state().collect()}
    s2 = {(r["repo"], r["path"]): r.asDict() for r in eng_b.final_state().collect()}
    assert s1 == s2


@pytest.mark.parametrize("scatter", [False, True])
def test_oracle_equality_full_log(spark, tmp_path, scatter):
    """FIXTURES scenario 9: engine replay == sequential Python oracle under
    per-row content_sha256 equality, for in-order and scattered delivery."""
    schema_changes = [
        {"lsn": 2500, "kind": "add_column", "column": "lang_meta",
         "new_type": "string"},
    ]
    events_df = generate_event_log(
        spark, 5000, seed=42, n_repos=30, n_mega_repos=2, hot_fraction=0.4,
        paths_per_repo=8, schema_changes=schema_changes,
    )
    rows = [r.asDict(recursive=True) for r in events_df.collect()]

    eng = CdcEngine(spark, str(tmp_path / ("sc" if scatter else "ord")), num_buckets=8)
    eng.apply_log(
        spark.createDataFrame(rows, EVENT_SCHEMA),
        events_per_batch=None if scatter else 1000,
        n_batches=5 if scatter else None,
        scatter_delivery=scatter,
    )
    got = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}

    want = replay_oracle(rows)
    assert set(got) == set(want)
    for k, wrow in want.items():
        grow = got[k]
        assert grow["content_sha256"] == wrow["content_sha256"], k
        assert grow["last_lsn"] == wrow["last_lsn"], k
        assert grow["commit"] == wrow["commit"], k
        assert grow.get("lang_meta") == wrow.get("lang_meta"), k


def test_manifests_lineage_and_metrics(spark, tmp_path):
    events_df = generate_event_log(spark, 1000, seed=5, n_source_partitions=4)
    rows = [r.asDict(recursive=True) for r in events_df.collect()]
    eng = run(spark, tmp_path, rows, events_per_batch=250)
    ms = eng.manifests()
    assert len(ms) == 4
    assert sum(m["metrics"]["events_in"] for m in ms) == 1000
    assert ms[-1]["metrics"]["lag_events"] == 0
    for m in ms:
        assert m["code_hash"] == eng.code_hash
        offs = {int(d["partition"]) for d in m["per_partition_lineage"]}
        assert offs.issubset(set(range(4)))
        assert sum(d["rows"] for d in m["per_partition_lineage"]) == m["metrics"]["events_in"]
    # DataFrame view of the manifests (FIXTURES A3 shape)
    mdf = eng.manifests_df()
    assert mdf.count() == 4
    assert "per_partition_lineage" in mdf.columns


def test_drop_column_mid_stream(spark, tmp_path):
    """drop_column is metadata-only via field ids: the column disappears
    from the visible schema immediately, old files stay readable, and a
    later re-add with the same NAME is a fresh column — dropped values
    never resurface (round-3 VERDICT #6)."""
    add = {"kind": "add_column", "column": "score", "new_name": None, "new_type": "int"}
    drop = {"kind": "drop_column", "column": "score", "new_name": None, "new_type": None}
    readd = {"kind": "add_column", "column": "score", "new_name": None, "new_type": "int"}
    events = [
        ev(0, "schema_change", schema_change=add),
        ev(1, "insert", "r", "a", "c1", "py", "v1", extras={"score": "7"}),
        ev(2, "schema_change", schema_change=drop),
        ev(3, "insert", "r", "b", "c3", "py", "v3", extras={"score": "8"}),
        ev(4, "schema_change", schema_change=readd),
        ev(5, "insert", "r", "c", "c5", "py", "v5", extras={"score": "9"}),
    ]
    eng = run(spark, tmp_path, events, events_per_batch=2)
    st = state(eng)
    # re-added column: only the post-re-add writer populates it
    assert st[("r", "a")]["score"] is None   # written under the DROPPED id
    assert st[("r", "b")]["score"] is None   # written while no column existed
    assert st[("r", "c")]["score"] == 9
    # fresh field id, not a resurrected one
    fields = {f.name: f.field_id for f in eng.table.current().schema.fields}
    assert fields["score"] == max(fields.values())


def test_drop_base_column_and_oracle_agree(spark, tmp_path):
    """Dropping a base (schema-v1) column removes it everywhere — replay
    equality vs the sequential oracle still holds on the surviving
    columns, out of order and with redelivery."""
    drop = {"kind": "drop_column", "column": "lang", "new_name": None, "new_type": None}
    events = [
        ev(0, "insert", "r", "a", "c0", "py", "v0"),
        ev(1, "insert", "r", "b", "c1", "rs", "v1"),
        ev(2, "schema_change", schema_change=drop),
        ev(3, "update", "r", "a", "c3", "go", "v3"),  # lang ignored post-drop
    ]
    eng = run(spark, tmp_path, events, events_per_batch=2)
    assert "lang" not in eng.final_state().columns
    st = state(eng)
    assert st[("r", "a")]["content"] == "v3"
    oracle = replay_oracle(events)
    for key, row in oracle.items():
        assert "lang" not in row or key not in st  # oracle purged lang too
        assert st[key]["content"] == row["content"]
        assert st[key]["content_sha256"] == row["content_sha256"]
    # engine columns that survive match the oracle row keys
    assert set(st[("r", "b")].keys()) >= set(oracle[("r", "b")]) - {"lang"}


def test_drop_column_guards_engine_columns(spark, tmp_path):
    eng = make_engine(spark, tmp_path)
    events = [ev(0, "insert", "r", "a", "c0", "py", "v0")]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), events_per_batch=10)
    with pytest.raises(ValueError):
        eng.table.update_schema("drop_column", "repo")
    # idempotent replay: dropping a never-existed column is a no-op
    v = eng.table.current().version
    eng.table.update_schema("drop_column", "nope")
    assert eng.table.current().version == v
