"""Temporal joins Spark lacks as built-ins: AS-OF join and range join,
implemented as compositions of existing DataFrame ops (the brief's
preferred strategy) with the partitioning patterns that survive scale.

- AS-OF: the union-and-carry-forward formulation — tag both sides, union,
  one window per key ordered by time carrying the last reference row
  forward, keep probe rows. ONE shuffle on the key, no inequality join, no
  per-key explosion (vs the naive t1 ≤ t2 theta join which is O(n·m)).
- RANGE join: coarse bucketing on the time dimension (join on overlapping
  day-buckets — an equi-join Catalyst can shuffle/broadcast) followed by an
  exact refine filter. Candidate volume ∝ true matches, never the cross
  product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_events_to_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order at-or-before the event
    time (classic AS-OF). Returns events of users < 50 for bounded output."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_id", "ts")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        F.col("o_orderdate").alias("ots"),
    )
    probe = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_time"),
    )
    ref = orders.select(
        "user_id",
        F.col("ots").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.col("ots").alias("o_time"),
    )
    # reference rows sort before probe rows at equal t (is_probe asc) so an
    # order exactly at the event time counts as "at or before"
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "is_probe", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = (
        probe.unionByName(ref)
        .withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("asof_ordertime", F.last("o_time", ignorenulls=True).over(w))
    )
    return (
        merged.filter(F.col("is_probe") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("asof_orderkey"),
            F.date_format("asof_ordertime", "yyyy-MM-dd").alias("asof_orderdate"),
        )
        .orderBy("user_id", "event_id")
    )


ASOF_SQL = """
SELECT e.user_id, e.event_id,
       o.o_orderkey AS asof_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS asof_orderdate
FROM (SELECT user_id, event_id, ts FROM events WHERE user_id < 50) e
ASOF LEFT JOIN (
    SELECT o_custkey, o_orderdate, o_orderkey,
           -- deterministic pick among same-timestamp orders: max orderkey
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
) o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts AND o.rn = 1
ORDER BY e.user_id, e.event_id
"""


def range_join_follow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range-join: pairs of a user's events where the second falls
    within 1 hour after the first (interval join). The bucket-and-refine
    plan: both sides keyed by (user, hour-bucket), the left side exploded to
    the buckets its window covers → equi-join → exact refine filter."""
    window_sec = 3600
    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_id", "ts")
    )
    right = base.select(
        "user_id",
        F.col("event_id").alias("next_event_id"),
        F.col("ts").alias("next_ts"),
        F.floor(F.unix_timestamp("ts") / F.lit(window_sec)).alias("hour"),
    )
    left = base.withColumn(
        "hour",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("ts") / F.lit(window_sec)),
                F.floor(F.unix_timestamp("ts") / F.lit(window_sec)) + 1,
            )
        ),
    )
    joined = left.join(right, ["user_id", "hour"]).filter(
        (F.col("next_ts") > F.col("ts"))
        & (F.unix_timestamp("next_ts") - F.unix_timestamp("ts") <= window_sec)
    )
    return (
        joined.select("user_id", "event_id", "next_event_id")
        .distinct()
        .orderBy("user_id", "event_id", "next_event_id")
    )


RANGE_JOIN_SQL = """
SELECT DISTINCT a.user_id, a.event_id, b.event_id AS next_event_id
FROM (SELECT user_id, event_id, ts FROM events WHERE user_id < 20) a
JOIN (SELECT user_id, event_id, ts FROM events WHERE user_id < 20) b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch(b.ts) - epoch(a.ts) <= 3600
ORDER BY a.user_id, a.event_id, next_event_id
"""


QUERIES = {
    "asof_join_events_to_orders": (asof_join_events_to_orders, ASOF_SQL),
    "range_join_follow_events": (range_join_follow_events, RANGE_JOIN_SQL),
}
