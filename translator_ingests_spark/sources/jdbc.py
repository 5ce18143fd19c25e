"""S8/S9: relational-database scans (Postgres / SQLite in the reference:
drugcentral.py:100-125, chembl.py:329-340) as Spark JDBC reads.

No database server or JDBC driver jar ships in this container, so the
functions build the reader spec (fully testable) and only touch the network
when ``load=True``. At scale, use ``partition_column``/bounds so the scan
parallelizes across executors instead of a single JDBC cursor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    properties: dict | None = None,
    load: bool = True,
) -> DataFrame | dict:
    """Build (and optionally execute) a parallel JDBC scan.

    With partition bounds, Spark issues ``num_partitions`` range-predicated
    queries concurrently — the distributed replacement for the reference's
    single-cursor SELECT loops."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("fetchsize", str(fetchsize))
    )
    spec = {"url": url, "query": query, "fetchsize": fetchsize}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned JDBC scan needs lower/upper bounds and num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
        spec.update(
            partitionColumn=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
        spec[k] = v
    if not load:
        return spec
    return reader.load()
