"""Graph-metadata artifact job — the reference writes a per-build stats
artifact alongside every release (`graph-metadata.json` / meta-KG:
/root/reference/src/translator_ingest/pipeline.py:501-588, output shape
/root/reference/src/translator_ingest/ingests/string/meta.json:67-101):
row totals, per-category histograms, id-prefix cards. Here the analog over
the lake table's visible state: row count, per-lang histogram, repo-prefix
cards and content-size totals — computed in ONE aggregation job each and
persisted as a JSON artifact stamped with the snapshot it describes.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from translator_ingests_spark.lake.table import LakeTable


def per_lang_stats(state: DataFrame) -> DataFrame:
    """Per-lang histogram over a table state: rows, distinct repos, content
    volume — the per-predicate/per-category counts analog."""
    return (
        state.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("repo").alias("n_repos"),
            F.sum(F.length("content")).alias("content_chars"),
        )
        .orderBy("lang")
    )


def repo_prefix_cards(state: DataFrame, sep: str = "/") -> DataFrame:
    """Id-prefix cardinalities (meta.json's curie-prefix cards analog):
    group repos by their org prefix."""
    prefix = F.substring_index(F.col("repo"), sep, 1).alias("repo_prefix")
    return (
        state.groupBy(prefix)
        .agg(
            F.countDistinct("repo").alias("n_repos"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("repo_prefix")
    )


def emergent_schema(state: DataFrame) -> dict:
    """Schema *observed from the data* (ORION ``generate_schema`` analog,
    /root/reference/src/translator_ingest/pipeline.py:544-546): per column
    its Spark type and non-null count, plus every key observed inside the
    ``extras`` map (values delivered by schema-change events that predate —
    or never got — a declared column). One aggregation job for the column
    plane; one tiny job over exploded map keys for the extras plane."""
    extras_col = next(
        (c for c in ("__extras", "extras") if c in state.columns), None
    )
    cols = [f for f in state.schema.fields if f.name != extras_col]
    agg = state.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.count(f.name).alias(f.name) for f in cols],
    ).collect()[0]  # bounded-collect: one aggregate row
    total = agg["__total"]
    observed = {
        f.name: {
            "type": f.dataType.simpleString(),
            "n_nonnull": int(agg[f.name]),
            "fraction_nonnull": (int(agg[f.name]) / total) if total else 0.0,
        }
        for f in cols
    }
    extras_keys: list[dict] = []
    if extras_col is not None:
        rows = (
            state.select(F.explode(F.map_keys(extras_col)).alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("key")
            .collect()  # bounded-collect: one row per distinct extras key (schema-plane cardinality)
        )
        extras_keys = [{"key": r["key"], "n_rows": int(r["n_rows"])} for r in rows]
    return {"n_rows": int(total), "columns": observed, "extras_keys": extras_keys}


def write_graph_metadata(table: LakeTable, out_path: str) -> dict:
    """Compute and atomically publish the stats artifact for the CURRENT
    snapshot. All heavy lifting is two aggregation jobs whose results are
    O(langs + prefixes) — never O(rows) — so the driver-side JSON stays tiny."""
    # head(), not current(): under write-audit-publish the stats artifact is
    # part of the audit, so it must describe the state that WOULD be
    # published — version label and data both from the same snapshot
    snap = table.head()
    state = table._visible(table._net_raw(snap, snap.files), snap)
    totals_row = state.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("repo").alias("n_repos"),
        F.countDistinct("repo", "path").alias("n_keys"),
        F.sum(F.length("content")).alias("content_chars"),
    ).collect()[0]  # bounded-collect: one aggregate row
    langs = [r.asDict() for r in per_lang_stats(state).collect()]  # bounded-collect: one row per language
    prefixes = [r.asDict() for r in repo_prefix_cards(state).collect()]  # bounded-collect: one row per repo prefix (bounded fan-out)
    artifact = {
        "snapshot_version": snap.version,
        "schema_version": snap.schema_version,
        "code_hash": snap.code_hash,
        "totals": {k: (int(v) if v is not None else 0) for k, v in totals_row.asDict().items()},
        "per_lang": langs,
        "repo_prefixes": prefixes,
        "emergent_schema": emergent_schema(state),
    }
    tmp = f"{out_path}.tmp.{uuid.uuid4().hex}"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(artifact, fh, default=str)
    os.replace(tmp, out_path)
    return artifact
