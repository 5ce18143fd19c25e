"""Declared-schema source scans — the reference's reader layer re-expressed.

The reference declares every source's format, delimiter, header handling,
ordered column names, per-column types and reader-level filters in yaml
(`{source}.yaml`, e.g. /root/reference/src/translator_ingest/ingests/ctd/ctd.yaml:10-27
and string/string.yaml:17-57); Koza applies filters before object
construction as its "production efficiency path". Here the same declaration
becomes a `SourceConfig` whose filters are ordinary Catalyst predicates —
pushdown into the scan is free (PushedFilters), and column pruning comes
from the declared schema (never inferred in production).

Covered reference operators (SURVEY.md §2.1): S3 (csv/tsv with declared
schema, comment prefix), S4 (multi-file union under one tag), S5 (jsonl),
S6 (whole-document json + explode), P1 (reader-level include/exclude
filters with gt/lt/eq/in codes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}

# reader-level filter codes (reference: string.yaml:49-57 filter_code gt/lt/eq)
_FILTER_CODES = {"gt", "ge", "lt", "le", "eq", "ne", "in"}


@dataclass
class SourceConfig:
    """Declarative source: format, files, ordered typed columns, filters.

    ``columns``: list of (name, type) in file order — the declared reader
    schema. ``filters``: list of dicts {inclusion: include|exclude,
    column, filter_code, value}.
    """

    files: list[str]
    format: str = "csv"  # csv | jsonl | json
    delimiter: str = "\t"
    header: bool = False
    comment_prefix: str | None = None
    columns: list[tuple[str, str]] = field(default_factory=list)
    filters: list[dict] = field(default_factory=list)

    def spark_schema(self) -> T.StructType:
        return T.StructType([T.StructField(n, _TYPES[t], True) for n, t in self.columns])


def _apply_filters(df: DataFrame, filters: list[dict]) -> DataFrame:
    """Declarative include/exclude predicates — expressed as Catalyst
    filters so they push down into the scan (the reference skips object
    construction for dropped rows; Spark skips row-group decoding)."""
    for f in filters:
        col = F.col(f["column"])
        code = f["filter_code"]
        if code not in _FILTER_CODES:
            raise ValueError(f"unknown filter_code {code!r}")
        val = f["value"]
        pred = {
            "gt": lambda: col > val,
            "ge": lambda: col >= val,
            "lt": lambda: col < val,
            "le": lambda: col <= val,
            "eq": lambda: col == val,
            "ne": lambda: col != val,
            "in": lambda: col.isin(val),
        }[code]()
        if f.get("inclusion", "include") == "exclude":
            pred = ~pred
        df = df.filter(pred)
    return df


def read_csv_declared(spark: SparkSession, cfg: SourceConfig) -> DataFrame:
    """S3/S4: delimited scan with declared schema; multiple files under one
    tag are an implicit UNION ALL (one multi-path scan, not N scans)."""
    reader = (
        spark.read.schema(cfg.spark_schema())
        .option("sep", cfg.delimiter)
        .option("header", str(cfg.header).lower())
        .option("mode", "PERMISSIVE")
    )
    if cfg.comment_prefix:
        reader = reader.option("comment", cfg.comment_prefix)
    df = reader.csv(cfg.files)
    return _apply_filters(df, cfg.filters)


def read_jsonl_declared(spark: SparkSession, cfg: SourceConfig) -> DataFrame:
    """S5: line-delimited JSON with declared schema (never inferred)."""
    df = spark.read.schema(cfg.spark_schema()).json(cfg.files)
    return _apply_filters(df, cfg.filters)


def read_json_document(
    spark: SparkSession, cfg: SourceConfig, explode_field: str | None = None
) -> DataFrame:
    """S6: whole-document JSON; optionally explode a top-level array field
    into rows (the reference's ttd.yaml document → records pattern)."""
    df = spark.read.option("multiLine", "true").json(cfg.files)
    if explode_field:
        inner = df.select(F.explode(F.col(explode_field)).alias("rec")).select("rec.*")
        if cfg.columns:
            inner = inner.select(
                *[F.col(n).cast(_TYPES[t]).alias(n) for n, t in cfg.columns]
            )
        return _apply_filters(inner, cfg.filters)
    return _apply_filters(df, cfg.filters)


def read_source(spark: SparkSession, cfg: SourceConfig, **kw) -> DataFrame:
    if cfg.format == "csv":
        return read_csv_declared(spark, cfg)
    if cfg.format == "jsonl":
        return read_jsonl_declared(spark, cfg)
    if cfg.format == "json":
        return read_json_document(spark, cfg, **kw)
    raise ValueError(f"unknown format {cfg.format!r}")
