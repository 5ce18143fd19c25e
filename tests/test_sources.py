"""Declared-schema source scans (reference S3-S6, P1 reader filters)."""

import json

from translator_ingests_spark.sources import SourceConfig, read_source


def test_csv_declared_schema_comment_prefix_and_filters(spark, tmp_path):
    p1 = tmp_path / "a.tsv"
    p1.write_text("# header comment\np1\tp2\t700\np3\tp4\t300\n")
    p2 = tmp_path / "b.tsv"
    p2.write_text("p5\tp6\t900\n")
    cfg = SourceConfig(
        files=[str(p1), str(p2)],
        format="csv",
        delimiter="\t",
        comment_prefix="#",
        columns=[("protein1", "string"), ("protein2", "string"), ("combined_score", "int")],
        filters=[{"inclusion": "include", "column": "combined_score",
                  "filter_code": "gt", "value": 500}],
    )
    df = read_source(spark, cfg)
    rows = sorted((r["protein1"], r["combined_score"]) for r in df.collect())
    # multi-file union + comment skip + typed column + pushed filter
    assert rows == [("p1", 700), ("p5", 900)]
    # the filter reaches the scan (Catalyst pushdown)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "combined_score" in plan


def test_exclude_and_in_filters(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,1\nb,2\nc,3\nd,4\n")
    cfg = SourceConfig(
        files=[str(p)], format="csv", delimiter=",",
        columns=[("k", "string"), ("v", "int")],
        filters=[
            {"inclusion": "exclude", "column": "k", "filter_code": "in", "value": ["c"]},
            {"inclusion": "include", "column": "v", "filter_code": "le", "value": 2},
        ],
    )
    rows = sorted(r["k"] for r in read_source(spark, cfg).collect())
    assert rows == ["a", "b"]


def test_jsonl_declared(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"subject":"s1","pubs":["p1","p2"]}\n{"subject":"s2","pubs":[]}\n')
    cfg = SourceConfig(
        files=[str(p)], format="jsonl",
        columns=[("subject", "string")],
    )
    # declared schema prunes to requested columns (no inference)
    df = read_source(spark, cfg)
    assert df.columns == ["subject"]
    assert df.count() == 2


def test_json_document_explode(spark, tmp_path):
    p = tmp_path / "doc.json"
    p.write_text(json.dumps({"meta": "x", "records": [
        {"id": "r1", "score": 5}, {"id": "r2", "score": 9}]}))
    cfg = SourceConfig(
        files=[str(p)], format="json",
        columns=[("id", "string"), ("score", "long")],
        filters=[{"column": "score", "filter_code": "gt", "value": 6}],
    )
    rows = read_source(spark, cfg, explode_field="records").collect()
    assert [(r["id"], r["score"]) for r in rows] == [("r2", 9)]
