"""translator_ingests_spark — a from-scratch PySpark-native CDC/incremental-ingest
analytics engine with the query and data-processing capabilities of
NCATSTranslator/translator-ingests, re-expressed Spark-first.

Subpackages
-----------
lake       : snapshot-based parquet lake-table format (atomic commits, bucketed
             copy-on-write MERGE, field-id schema evolution) — plays the role
             Iceberg plays in the design (no Iceberg runtime jar is available,
             so the table format is implemented from scratch on parquet).
cdc        : the change-event apply loop — validation, salted max-LSN LWW
             reduction, idempotent MERGE, checkpoint manifests with lineage
             and throughput metrics (reference analog: the pipeline lifecycle
             at /root/reference/src/translator_ingest/pipeline.py).
operators  : relational / dedup / similarity / window operators.
sources    : declared-schema scans (csv/tsv/jsonl/json, multi-file union).
functions  : vectorized content plane (normalization, hashing, text analysis).
streaming  : micro-batch driver utilities (Trigger.AvailableNow-style loop).
"""

__version__ = "0.1.0"
