"""Graph-metadata artifact job: the per-snapshot stats JSON must reconcile
exactly with direct groupBy queries over the same state, and stamp the
snapshot it describes."""

import json

from translator_ingests_spark.lake import LakeSchema, LakeTable
from translator_ingests_spark.lake.stats import (
    per_lang_stats,
    repo_prefix_cards,
    write_graph_metadata,
)

SCHEMA = LakeSchema.from_names(
    [("repo", "string"), ("path", "string"), ("lang", "string"),
     ("content", "string"), ("last_lsn", "long")]
)


def _table(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], "last_lsn", 4)
    rows = [
        (f"org{i % 3}/r{i % 5}", f"p{i}", ["py", "go", "rs"][i % 3], "x" * (i + 1),
         "insert", i)
        for i in range(30)
    ]
    t.merge(
        spark.createDataFrame(
            rows,
            "repo string, path string, lang string, content string, op string, lsn long",
        ),
        0,
    )
    return t


def test_artifact_reconciles_with_queries(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    out = tmp_path / "graph-metadata.json"
    artifact = write_graph_metadata(t, str(out))

    assert artifact["snapshot_version"] == t.current().version
    assert artifact["totals"]["n_rows"] == 30
    assert artifact["totals"]["n_keys"] == 30

    by_lang = {r["lang"]: r for r in per_lang_stats(t.read()).collect()}
    for entry in artifact["per_lang"]:
        q = by_lang[entry["lang"]]
        assert entry["n_rows"] == q["n_rows"]
        assert entry["n_repos"] == q["n_repos"]
        assert entry["content_chars"] == q["content_chars"]
    assert sum(e["n_rows"] for e in artifact["per_lang"]) == 30

    cards = {r["repo_prefix"]: r["n_repos"] for r in repo_prefix_cards(t.read()).collect()}
    assert {e["repo_prefix"]: e["n_repos"] for e in artifact["repo_prefixes"]} == cards
    assert set(cards) == {"org0", "org1", "org2"}

    # the artifact on disk is valid JSON and atomic-published
    assert json.load(open(out))["totals"]["n_rows"] == 30


def test_emergent_schema_reconciles_with_declared_and_data(spark, tmp_path):
    """ORION generate_schema analog: the observed-from-data schema must list
    every declared column with its type and exact non-null counts, and must
    surface keys seen only inside the extras map (values from schema-change
    events without a declared column)."""
    from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
    from translator_ingests_spark.lake.stats import emergent_schema, write_graph_metadata

    ev = [
        {
            "lsn": i, "op": "insert", "repo": "org/r", "path": f"p{i}",
            "commit": format(i, "040x"), "lang": None if i < 4 else "py",
            "content": f"c{i}", "schema_change": None,
            "source_partition": 0, "source_offset": i,
            "extras": {"lang_meta": f"m{i}"} if i % 2 == 0 else None,
        }
        for i in range(10)
    ]
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    eng.apply_log(spark.createDataFrame(ev, EVENT_SCHEMA), n_batches=1)
    state = eng.table.read_raw()  # raw state carries the extras map column
    rep = emergent_schema(state)
    assert rep["n_rows"] == 10
    cols = rep["columns"]
    assert cols["repo"]["n_nonnull"] == 10
    assert cols["lang"]["n_nonnull"] == 6
    assert cols["lang"]["type"] == "string"
    assert cols["content_sha256"]["n_nonnull"] == 10
    # extras keys observed from data, with row counts
    assert {e["key"]: e["n_rows"] for e in rep["extras_keys"]} == {"lang_meta": 5}

    # and the artifact embeds it
    out = tmp_path / "meta.json"
    art = write_graph_metadata(eng.table, str(out))
    assert art["emergent_schema"]["columns"]["repo"]["n_nonnull"] == 10
