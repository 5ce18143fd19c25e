"""Operator/query library. Each module exposes ``QUERIES: dict[str, tuple]``
mapping query name -> (callable(spark, sf_dir) -> DataFrame, oracle_sql | None).

Oracle SQL is ANSI SQL runnable by DuckDB over the same parquet tables; the
driver compares row counts, schemas and order-insensitive value hashes, so
every computed column is aliased identically on both sides and
floating-point aggregates are rounded identically on both sides.
"""
