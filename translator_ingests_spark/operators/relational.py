"""Relational operator suite over the TPC-H-ish test tables.

Covers the reference's operator inventory (SURVEY.md §2): declared-schema
scans, pushed-down filters/projections (P1-P8), multi-key and broadcast
joins (J1-J8), group-by aggregations (A1-A12), window reductions / top-k
(W1-W5), set operations (SO1-SO3) and scalar functions (§2.7) — each
expressed as a declarative DataFrame plan so Catalyst handles pushdown,
pruning, join strategy and AQE at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Scans / filters / aggregations
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + pushed filter + hash aggregate (A12 analog).

    The filter and 7-column projection reach the parquet scan (Catalyst
    PushedFilters / ReadSchema); the aggregate is partial (map-side) then
    final — one shuffle of ~4 groups regardless of input size.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + group + top-10 (J1/J5 + W5 analog). Catalyst broadcasts
    the filtered customer side automatically under AQE at small SF; at scale
    the same plan degrades gracefully to sort-merge on the shuffled keys."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            F.col("o_orderkey"),
            F.col("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join (J5 analog): region ⋈ nation ⋈ customer ⋈ orders ⋈
    lineitem ⋈ supplier with the customer-and-supplier-same-nation predicate.
    Dimension sides (region/nation) are explicitly broadcast."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join (J2/J3 analog: hand-rolled dict lookup →
    broadcast join): lineitem ⋈ broadcast(part), revenue per brand."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


BROADCAST_DIM_SQL = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


def semi_join_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (J7 analog: EXISTS semantics, no row duplication)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def anti_join_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (J7/J8 analog: exclusion lists / referential-integrity
    checks as anti-joins)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


ANTI_JOIN_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
ORDER BY p_partkey
"""


def multi_key_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key LEFT OUTER join with coalesce (J1 analog: the reference's
    DuckDB 3-key outer join at hpoa.py:328-352)."""
    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_orderkey", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    orders = load(spark, sf_dir, "orders")
    joined = orders.join(
        agg,
        (orders.o_orderkey == agg.l_orderkey) & (agg.l_linestatus == orders.o_orderstatus),
        "left",
    )
    return (
        joined.select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce(F.col("qty"), F.lit(0.0)).alias("matched_qty"),
        )
        .orderBy("o_orderkey", "o_orderstatus")
    )


MULTI_KEY_JOIN_SQL = """
SELECT o_orderkey, o_orderstatus,
       coalesce(qty, 0.0) AS matched_qty
FROM orders LEFT OUTER JOIN (
    SELECT l_orderkey, l_linestatus, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY l_orderkey, l_linestatus
) agg ON o_orderkey = l_orderkey AND l_linestatus = o_orderstatus
ORDER BY o_orderkey, o_orderstatus
"""


# --------------------------------------------------------------------------
# Windows / top-k / LWW shapes
# --------------------------------------------------------------------------

def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority (W1 analog: top-K per group with a
    deterministic tiebreak — row_number over partitionBy)."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rk")
    )


TOPK_SQL = """
SELECT o_orderpriority, rk, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY o_orderpriority, rk
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LWW core (W3 analog, and the CDC engine's reduction shape): one
    max_by aggregation — single shuffle, map-side combinable, no sort."""
    ev = load(spark, sf_dir, "events")
    payload = F.struct(F.col("event_id"), F.col("event_type"), F.col("value"))
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(payload, F.col("event_id")).alias("w"))
        .select(
            "user_id",
            F.col("w.event_id").alias("last_event_id"),
            F.col("w.event_type").alias("last_event_type"),
            F.col("w.value").alias("last_value"),
        )
        .orderBy("user_id")
    )


LATEST_EVENT_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


def running_sum_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: running revenue per supplier ordered by ship date
    (beyond the reference's inventory — standard lakehouse analytics)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        li.select(
            "l_suppkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum(F.col("l_extendedprice")).over(w), 2).alias("running_revenue"),
        )
        .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
    )


RUNNING_SUM_SQL = """
SELECT l_suppkey,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
       l_orderkey, l_linenumber,
       round(sum(l_extendedprice) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
FROM lineitem
WHERE l_suppkey < 10
ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber
"""


def group_null_out_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 analog (dgidb.py:128-136): groups with >1 member get scores nulled
    on non-primary rows — count().over(window) + when()."""
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey", "c_mktsegment")
    wmin = W.partitionBy("c_nationkey", "c_mktsegment").orderBy("c_custkey")
    return (
        cust.withColumn("grp_n", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wmin))
        .select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.when((F.col("grp_n") > 1) & (F.col("rn") > 1), F.lit(None))
            .otherwise(F.col("c_acctbal"))
            .alias("acctbal_primary_only"),
        )
        .orderBy("c_custkey")
    )


GROUP_NULL_OUT_SQL = """
SELECT c_custkey, c_nationkey, c_mktsegment,
       CASE WHEN grp_n > 1 AND rn > 1 THEN NULL ELSE c_acctbal END
           AS acctbal_primary_only
FROM (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
         count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS grp_n,
         row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY c_custkey) AS rn
  FROM customer
)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Set ops / explode / scalar functions / string aggregation
# --------------------------------------------------------------------------

def union_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1/SO3 analog: (building ∪ machinery) minus automobile-nation set."""
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    c = cust.filter(F.col("c_nationkey") < 5).select("c_custkey")
    return a.union(b).exceptAll(c).distinct().orderBy("c_custkey")


UNION_EXCEPT_SQL = """
SELECT DISTINCT c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
) u
WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
ORDER BY c_custkey
"""


def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 analog (row explode on a delimited field): split document text on
    whitespace, explode, count — top 20 tokens."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


EXPLODE_WORDCOUNT_SQL = """
SELECT word, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


def scalar_functions_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 scalar surface in one projection: split/substring/regex/upper/
    concat, date extraction, casts, least, CASE WHEN chains (P7 analog)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.upper(F.col("o_orderstatus")).alias("status_u"),
            F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("prio_rank"),
            F.regexp_extract(F.col("o_orderpriority"), "^[0-9]+-(.*)$", 1).alias("prio_name"),
            F.concat(F.lit("ORD:"), F.col("o_orderkey").cast("string")).alias("order_tag"),
            F.year(F.col("o_orderdate")).alias("order_year"),
            F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
            F.when(F.col("o_totalprice") > 300000, F.lit("high"))
            .when(F.col("o_totalprice") > 100000, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("price_band"),
        )
        .orderBy("o_orderkey")
    )


SCALAR_FUNCS_SQL = """
SELECT o_orderkey,
       upper(o_orderstatus) AS status_u,
       CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
       regexp_extract(o_orderpriority, '^[0-9]+-(.*)$', 1) AS prio_name,
       concat('ORD:', CAST(o_orderkey AS VARCHAR)) AS order_tag,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       least(o_totalprice, 100000.0) AS capped_price,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders
ORDER BY o_orderkey
"""


def string_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6 analog: sorted-distinct string aggregation per group
    (concat_ws(';', sort_array(collect_set(...))))."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.concat_ws(";", F.sort_array(F.collect_set("lang"))).alias("langs"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


STRING_AGG_SQL = """
SELECT source,
       array_to_string(list_sort(list_distinct(list(lang))), ';') AS langs,
       count(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""


def groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 analog: multi-aggregate per key incl. distinct count + first by
    deterministic order (min)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
        .orderBy("event_type")
    )


GROUPBY_MULTI_AGG_SQL = """
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS sum_value,
       round(avg(value), 4) AS avg_value,
       min(event_id) AS first_event_id,
       max(event_id) AS last_event_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 JSON analog: schema-declared from_json over the events.props
    column (never infer)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "k int").alias("p"),
    )
    return (
        parsed.select("event_id", F.col("p.k").alias("k"))
        .filter(F.col("k") > 90)
        .orderBy("event_id")
    )


JSON_EXTRACTION_SQL = """
SELECT event_id, k FROM (
  SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events
)
WHERE k > 90
ORDER BY event_id
"""


def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 analog: subset-keyed drop_duplicates with deterministic survivor
    (min doc_id per text) — exact dedup by content."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    )


DISTINCT_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id
FROM documents
GROUP BY text
ORDER BY doc_id
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "broadcast_dim_join": (broadcast_dim_join, BROADCAST_DIM_SQL),
    "semi_join_customers_with_urgent_orders": (
        semi_join_customers_with_urgent_orders, SEMI_JOIN_SQL),
    "anti_join_parts_never_ordered": (anti_join_parts_never_ordered, ANTI_JOIN_SQL),
    "multi_key_left_join": (multi_key_left_join, MULTI_KEY_JOIN_SQL),
    "topk_per_group": (topk_per_group, TOPK_SQL),
    "latest_event_per_user": (latest_event_per_user, LATEST_EVENT_SQL),
    "running_sum_window": (running_sum_window, RUNNING_SUM_SQL),
    "group_null_out_window": (group_null_out_window, GROUP_NULL_OUT_SQL),
    "union_except_customers": (union_except_customers, UNION_EXCEPT_SQL),
    "explode_wordcount": (explode_wordcount, EXPLODE_WORDCOUNT_SQL),
    "scalar_functions_projection": (scalar_functions_projection, SCALAR_FUNCS_SQL),
    "string_agg_per_group": (string_agg_per_group, STRING_AGG_SQL),
    "groupby_multi_agg": (groupby_multi_agg, GROUPBY_MULTI_AGG_SQL),
    "json_extraction": (json_extraction, JSON_EXTRACTION_SQL),
    "distinct_dedup": (distinct_dedup, DISTINCT_DEDUP_SQL),
}
