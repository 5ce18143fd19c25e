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
    single-cursor SELECT loops.

    Spark rejects ``query`` combined with ``partitionColumn`` (JDBCOptions:
    "Options 'query' and 'partitionColumn' can not be specified together"),
    so the partitioned path wraps the SQL as a ``dbtable`` subquery; the
    partition column must match a column of the subquery's output schema
    (Spark validates it against the resolved relation, unqualified)."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "fetchsize", str(fetchsize)
    )
    spec = {"url": url, "query": query, "fetchsize": fetchsize}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned JDBC scan needs lower/upper bounds and num_partitions")
        dbtable = f"({query}) spark_jdbc_subq"
        reader = (
            reader.option("dbtable", dbtable)
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
        spec.update(
            dbtable=dbtable,
            partitionColumn=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
        )
    else:
        reader = reader.option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
        spec[k] = v
    if not load:
        return spec
    return reader.load()
