"""Live JDBC round-trip (S8/S9): the container ships no Postgres/SQLite
driver, but Spark bundles Apache Derby (an embedded file-backed SQL engine,
the same role SQLite plays in the reference's chembl ingest at
/root/reference/src/translator_ingest/ingests/chembl/chembl.py:329-340).
These tests exercise the REAL ``load=True`` path end-to-end: write a table
over JDBC, read it back plain and with the partitioned (parallel) scan.
"""

import pytest

from translator_ingests_spark.sources.jdbc import jdbc_reader

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": _DRIVER}
    df = spark.range(0, 500).selectExpr(
        "id", "cast(id * 2 as double) as val", "concat('r', cast(id % 7 as string)) as tag"
    )
    df.write.jdbc(url, "t_src", mode="overwrite", properties=props)
    return url, props


def test_jdbc_plain_query_roundtrip(spark, derby):
    url, props = derby
    out = jdbc_reader(
        spark, url, 'SELECT "id", "val", "tag" FROM t_src', properties=props
    )
    assert out.count() == 500
    assert set(out.columns) == {"id", "val", "tag"}


def test_jdbc_partitioned_scan_parallel_and_complete(spark, derby):
    url, props = derby
    out = jdbc_reader(
        spark,
        url,
        'SELECT "id", "val" FROM t_src',
        partition_column='"id"',
        lower_bound=0,
        upper_bound=500,
        num_partitions=4,
        properties=props,
    )
    # the scan really splits into range-predicated partitions AND the union
    # of the ranges loses/duplicates nothing
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 500
    assert out.agg({"id": "sum"}).collect()[0][0] == sum(range(500))


def test_jdbc_spec_building_without_network(spark):
    spec = jdbc_reader(
        spark,
        "jdbc:postgresql://db:5432/x",
        "SELECT a FROM t",
        partition_column="a",
        lower_bound=0,
        upper_bound=10,
        num_partitions=2,
        load=False,
    )
    # partitioned path must use dbtable-subquery form (query+partitionColumn
    # is rejected by Spark's JDBCOptions)
    assert spec["dbtable"] == "(SELECT a FROM t) spark_jdbc_subq"
    assert spec["partitionColumn"] == "a"
