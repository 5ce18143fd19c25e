"""Inspectable metadata tables — the Iceberg `table$files` / `$snapshots` /
`$history` analog, surfaced as plain DataFrames so operational queries
("how many small files per bucket?", "what did batch 17 commit?") run with
the same engine as data queries.

These are O(metadata) by construction: rows come from the snapshot/segment
JSONs (driver-plane, bounded by file count — the same bound the manifest
itself has), parallelized into a DataFrame; no data file is opened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from translator_ingests_spark.lake.refs import list_tags
from translator_ingests_spark.lake.table import LakeTable

_FILES_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("rows", T.LongType()),
    T.StructField("bucket_min", T.IntegerType()),
    T.StructField("bucket_max", T.IntegerType()),
    T.StructField("schema_version", T.IntegerType()),
    T.StructField("is_delta", T.BooleanType()),
    T.StructField("has_tombstones", T.BooleanType()),
])

_SNAPSHOTS_SCHEMA = T.StructType([
    T.StructField("version", T.LongType()),
    T.StructField("parent", T.LongType()),
    T.StructField("batch_id", T.LongType()),
    T.StructField("operation", T.StringType()),
    T.StructField("schema_version", T.IntegerType()),
    T.StructField("num_buckets", T.IntegerType()),
    T.StructField("n_files", T.LongType()),
    T.StructField("n_segments", T.LongType()),
    T.StructField("total_rows", T.LongType()),
    T.StructField("low_watermark", T.LongType()),
    T.StructField("is_current", T.BooleanType()),
    T.StructField("is_staged", T.BooleanType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
])


def files_table(table: LakeTable, version: int | None = None) -> DataFrame:
    """One row per live data/delta file of a snapshot (default current)."""
    snap = table.snapshot_at(version) if version is not None else table.current()
    spark: SparkSession = table.spark
    rows = [
        (
            f["path"],
            f.get("rows"),
            f["bucket_min"],
            f["bucket_max"],
            f.get("schema_version"),
            bool(f.get("delta")),
            bool(f.get("has_tombstones", False)),
        )
        for f in snap.files
    ]
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def snapshots_table(table: LakeTable) -> DataFrame:
    """One row per retained snapshot: the table's commit history with
    per-commit shape stats and any tags pinning it."""
    spark: SparkSession = table.spark
    current = table.current().version
    by_version_tags: dict[int, list[str]] = {}
    for name, v in sorted(list_tags(table).items()):
        by_version_tags.setdefault(v, []).append(name)
    rows = []
    for v in table.history():
        raw = table._raw_snapshot(v)
        segs = raw.get("segments")
        if segs is not None:
            n_files = sum(r["n_files"] for r in segs)
            n_segments = len(segs)
            snap_rows = None  # per-file rows live in the leaves; skip reading
        else:
            files = raw.get("files", [])
            n_files, n_segments = len(files), 0
            snap_rows = sum(f.get("rows") or 0 for f in files)
        rows.append(
            (
                v,
                raw.get("parent"),
                raw.get("batch_id"),
                raw.get("operation", "merge"),
                raw.get("schema_version"),
                raw.get("num_buckets"),
                n_files,
                n_segments,
                snap_rows,
                raw.get("low_watermark", -1),
                v == current,
                table.is_staged(v),
                by_version_tags.get(v, []),
            )
        )
    return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)


def file_size_histogram(table: LakeTable) -> DataFrame:
    """Per-bucket file/row stats of the CURRENT snapshot — the compaction
    planner's view ("which buckets have many small files?") as a query."""
    from pyspark.sql import functions as F

    return (
        files_table(table)
        .groupBy("bucket_min")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("rows").alias("rows"),
            F.sum(F.when(F.col("is_delta"), 1).otherwise(0)).alias("n_deltas"),
        )
        .orderBy("bucket_min")
    )
