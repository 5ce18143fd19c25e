"""Ingest-transform API in the reference's unit-test idiom: literal records
in → typed entities out (MockKozaWriter shape, tests/unit/ingests/__init__.py:21-43
of the reference), with the transform running Arrow-batched."""

import pandas as pd
from pyspark.sql import functions as F

from translator_ingests_spark.functions.transform_api import IngestPipeline


def test_prepare_lookup_transform_observe(spark):
    # literal source records (reference: CTD-style rows)
    src = spark.createDataFrame(
        [
            ("chem1", "dis1", "therapeutic", 900),
            ("chem2", "dis2", "", 800),          # dropped by prepare filter
            ("chem3", "dis3", "marker", 300),    # dropped by score filter
        ],
        "chemical string, disease string, evidence string, score int",
    )
    taxon = spark.createDataFrame(
        [("chem1", "human"), ("chem3", "mouse")], "chemical string, species string"
    )

    def to_edges(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "subject": "CHEM:" + pdf["chemical"],
                    "predicate": "biolink:treats",
                    "object": "DIS:" + pdf["disease"],
                    "species": pdf["species"],
                }
            )

    calls = {"begin": 0, "end": None}
    pipe = (
        IngestPipeline("ctd_like")
        .on_begin(lambda: calls.__setitem__("begin", calls["begin"] + 1))
        .prepare(lambda df: df.filter((F.col("evidence") != "") & (F.col("score") > 500)))
        .lookup("taxon", taxon, on=["chemical"])
        .observe("counts", F.count(F.lit(1)).alias("records_in"))
        .transform_batches(
            to_edges,
            "subject string, predicate string, object string, species string",
        )
        .on_end(lambda m: calls.__setitem__("end", m))
    )
    rows, metrics = pipe.run(src)
    assert [(r["subject"], r["object"], r["species"]) for r in rows] == [
        ("CHEM:chem1", "DIS:dis1", "human")
    ]
    assert metrics["counts"]["records_in"] == 1
    assert calls["begin"] == 1 and calls["end"] == metrics


def test_transform_yields_zero_to_n_records(spark):
    """transform_record's 0..n fan-out: one input row may emit several
    entities (or none) — expressed as batch-level pandas ops."""
    src = spark.createDataFrame(
        [("g1", "p1|p2|p3"), ("g2", "")], "gene string, pubs string"
    )

    def explode_pubs(batches):
        for pdf in batches:
            out = []
            nonempty = pdf[pdf["pubs"] != ""]
            for _, row in nonempty.iterrows():
                for p in row["pubs"].split("|"):
                    out.append({"gene": row["gene"], "pub": p})
            yield pd.DataFrame(out, columns=["gene", "pub"])

    pipe = IngestPipeline("fanout").transform_batches(
        explode_pubs, "gene string, pub string"
    )
    rows, _ = pipe.run(src)
    assert sorted((r["gene"], r["pub"]) for r in rows) == [
        ("g1", "p1"), ("g1", "p2"), ("g1", "p3")
    ]
