from translator_ingests_spark.sources.readers import (
    SourceConfig,
    read_source,
    read_csv_declared,
    read_jsonl_declared,
    read_json_document,
)

__all__ = [
    "SourceConfig",
    "read_source",
    "read_csv_declared",
    "read_jsonl_declared",
    "read_json_document",
]
