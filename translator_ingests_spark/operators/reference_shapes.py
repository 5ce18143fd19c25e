"""Operators matching specific reference shapes that the general suite
doesn't already cover one-for-one."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def topk_union_two_criteria(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (semmeddb.py:200-233): cap a hot group's payload by keeping the
    top-K by one criterion ∪ top-K by another — here per user: top-2 events
    by value ∪ top-2 most recent, deduped, original order preserved.

    This is the skew-capping pattern for hot keys where the payload (60k+
    PMIDs on one edge in the reference) must shrink but both 'best' and
    'newest' evidence must survive."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    by_value = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    by_recency = W.partitionBy("user_id").orderBy(F.desc("event_id"))
    ranked = (
        ev.withColumn("rk_value", F.row_number().over(by_value))
        .withColumn("rk_recent", F.row_number().over(by_recency))
    )
    return (
        ranked.filter((F.col("rk_value") <= 2) | (F.col("rk_recent") <= 2))
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id", "event_id")
    )


TOPK_UNION_SQL = """
SELECT user_id, event_id, event_type, value
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk_value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY event_id DESC) AS rk_recent
  FROM events
)
WHERE rk_value <= 2 OR rk_recent <= 2
ORDER BY user_id, event_id
"""


def referential_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (validate_biolink_kgx.py:330-340): referential integrity as
    anti-joins — "edges" whose endpoints are missing from the "nodes" table
    and orphan nodes nothing references. Here: lineitem↔orders/part/supplier
    and customers with no orders."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    # all four anti-joins union into ONE aggregation job (4 sequential
    # driver-blocking counts would quadruple the latency for no reason);
    # a static dim of check names left-joins the counts so zero-violation
    # checks still appear with 0.
    def labeled(df, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"))

    violations = (
        labeled(li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
                "lineitem_missing_order")
        .unionAll(labeled(li.join(part, li.l_partkey == part.p_partkey, "left_anti"),
                          "lineitem_missing_part"))
        .unionAll(labeled(li.join(supp, li.l_suppkey == supp.s_suppkey, "left_anti"),
                          "lineitem_missing_supplier"))
        .unionAll(labeled(cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti"),
                          "customers_without_orders"))
        .groupBy("check_name")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    names = spark.createDataFrame(
        [("customers_without_orders",), ("lineitem_missing_order",),
         ("lineitem_missing_part",), ("lineitem_missing_supplier",)],
        "check_name string",
    )
    return (
        names.join(violations, "check_name", "left")
        .select("check_name", F.coalesce(F.col("violations"), F.lit(0)).alias("violations"))
        .orderBy("check_name")
    )


REF_INTEGRITY_SQL = """
SELECT * FROM (
  SELECT 'customers_without_orders' AS check_name, count(*)::BIGINT AS violations
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  UNION ALL
  SELECT 'lineitem_missing_order', count(*)::BIGINT FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
  UNION ALL
  SELECT 'lineitem_missing_part', count(*)::BIGINT FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
  UNION ALL
  SELECT 'lineitem_missing_supplier', count(*)::BIGINT FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
)
ORDER BY check_name
"""


def self_group_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 (dgidb.py:113-126): per-group aggregate joined back onto the rows
    — each order annotated with its customer's order count and whether it's
    the customer's biggest order (window formulation: zero extra join)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = W.partitionBy("o_custkey")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.count(F.lit(1)).over(w).alias("cust_order_count"),
            (F.col("o_totalprice") == F.max("o_totalprice").over(w)).alias("is_biggest"),
        )
        .orderBy("o_orderkey")
    )


SELF_GROUP_SQL = """
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey) AS cust_order_count,
       o_totalprice = max(o_totalprice) OVER (PARTITION BY o_custkey) AS is_biggest
FROM orders
ORDER BY o_orderkey
"""


QUERIES = {
    "topk_union_two_criteria": (topk_union_two_criteria, TOPK_UNION_SQL),
    "referential_integrity_check": (referential_integrity_check, REF_INTEGRITY_SQL),
    "self_group_lookup": (self_group_lookup, SELF_GROUP_SQL),
}
