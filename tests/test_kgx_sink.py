"""KGX JSONL sink: canonical names, atomic publish, JSONL round-trip."""

import json
import os

from translator_ingests_spark.sources.kgx_sink import write_kgx


def test_write_kgx_single_file_roundtrip(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("CHEM:1", ["biolink:ChemicalEntity"], "aspirin")],
        "id string, category array<string>, name string",
    )
    edges = spark.createDataFrame(
        [("e1", "CHEM:1", "biolink:treats", "DIS:2", ["PMID:1", "PMID:2"])],
        "id string, subject string, predicate string, object string, publications array<string>",
    )
    out = write_kgx(nodes, edges, str(tmp_path / "kgx"), stage="normalized",
                    single_file=True)
    assert os.path.basename(out["nodes"]) == "normalized_nodes.jsonl"
    assert os.path.basename(out["edges"]) == "normalized_edges.jsonl"
    node_rows = [json.loads(l) for l in open(out["nodes"])]
    assert node_rows == [
        {"id": "CHEM:1", "category": ["biolink:ChemicalEntity"], "name": "aspirin"}
    ]
    edge_rows = [json.loads(l) for l in open(out["edges"])]
    assert edge_rows[0]["publications"] == ["PMID:1", "PMID:2"]

    # re-publish overwrites atomically
    out2 = write_kgx(nodes, edges, str(tmp_path / "kgx"), stage="normalized",
                     single_file=True)
    assert out2 == out


def test_write_kgx_sharded(spark, tmp_path):
    nodes = spark.range(100).selectExpr("concat('N:', id) AS id")
    edges = spark.range(10).selectExpr(
        "concat('E:', id) AS id", "'N:1' AS subject", "'p' AS predicate", "'N:2' AS object"
    )
    out = write_kgx(nodes, edges, str(tmp_path / "kgx2"), stage="merged")
    assert os.path.isdir(out["nodes"])
    total = 0
    for fn in os.listdir(out["nodes"]):
        if fn.endswith(".json"):
            total += sum(1 for _ in open(os.path.join(out["nodes"], fn)))
    assert total == 100
