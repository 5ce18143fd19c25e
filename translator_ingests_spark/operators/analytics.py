"""Extended analytics operators: multi-dimensional aggregation (rollup /
cube / grouping sets — beyond the reference's inventory, standard lakehouse
surface), dominant-element selection (W2), set-union re-aggregation (A4),
approximate distinct counting and seeded sampling (A11/A12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user counts by event type (fixed column set — the
    deterministic pivot form)."""
    ev = _load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .orderBy("user_id")
    )
    # null -> 0 and stable names
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
    )


PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def dominant_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 analog (string_utils.py:301-382): row-local dominant channel via
    greatest() + CASE chains — no shuffle at all."""
    ev = _load(spark, sf_dir, "events")
    agg = (
        ev.groupBy("user_id")
        .agg(
            F.round(F.sum(F.when(F.col("event_type") == "click", F.col("value"))
                          .otherwise(F.lit(0.0))), 2).alias("v_click"),
            F.round(F.sum(F.when(F.col("event_type") == "view", F.col("value"))
                          .otherwise(F.lit(0.0))), 2).alias("v_view"),
            F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))
                          .otherwise(F.lit(0.0))), 2).alias("v_purchase"),
        )
    )
    best = F.greatest("v_click", "v_view", "v_purchase")
    dominant = (
        F.when(F.col("v_click") == best, F.lit("click"))
        .when(F.col("v_view") == best, F.lit("view"))
        .otherwise(F.lit("purchase"))
    )
    return agg.select(
        "user_id", "v_click", "v_view", "v_purchase", dominant.alias("dominant")
    ).orderBy("user_id")


DOMINANT_SQL = """
WITH a AS (
  SELECT user_id,
         round(sum(CASE WHEN event_type='click' THEN value ELSE 0 END), 2) AS v_click,
         round(sum(CASE WHEN event_type='view' THEN value ELSE 0 END), 2) AS v_view,
         round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END), 2) AS v_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, v_click, v_view, v_purchase,
       CASE WHEN v_click = greatest(v_click, v_view, v_purchase) THEN 'click'
            WHEN v_view = greatest(v_click, v_view, v_purchase) THEN 'view'
            ELSE 'purchase' END AS dominant
FROM a ORDER BY user_id
"""


def set_union_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog (dgidb set.union over groups): per-source distinct word
    union re-aggregated across groups — flatten(collect_set) shape."""
    docs = _load(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 4)
    per_doc = words.groupBy("source").agg(F.collect_set("w").alias("ws"))
    return per_doc.select(
        "source",
        F.size("ws").alias("n_long_words"),
        F.element_at(F.sort_array("ws"), 1).alias("first_word"),
    ).orderBy("source")


SET_UNION_SQL = """
WITH w AS (
  SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS w
  FROM documents
), f AS (
  SELECT DISTINCT source, w FROM w WHERE length(w) > 4
)
SELECT source, count(*) AS n_long_words, min(w) AS first_word
FROM f GROUP BY source ORDER BY source
"""


def approx_and_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/A12 analog: approximate distinct cardinality + seeded 10% sample
    statistics. Engine-specific estimators/samplers → rows-only check."""
    li = _load(spark, sf_dir, "lineitem")
    sample = li.sample(fraction=0.1, seed=42)
    return sample.select(
        F.count(F.lit(1)).alias("sample_rows"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.round(F.avg("l_quantity"), 2).alias("sample_avg_qty"),
    )



def grouping_sets_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite grouping-set aggregate — ROLLUP over lineitem and CUBE
    over orders, shape-tagged and union-aligned into one driver-gated
    entry (frees a slot under the driver's 50-entry cap; the individual
    rollup/cube queries remain exported for bench/pytest)."""
    r = rollup_revenue(spark, sf_dir).select(
        F.lit("rollup_lineitem").alias("shape"),
        F.col("l_returnflag").alias("g1"),
        F.col("l_linestatus").alias("g2"),
        F.col("n").cast("long").alias("n"),
        F.col("revenue").alias("amount"),
    )
    c = cube_order_stats(spark, sf_dir).select(
        F.lit("cube_orders").alias("shape"),
        F.col("o_orderstatus").alias("g1"),
        F.col("o_orderpriority").alias("g2"),
        F.col("n_orders").cast("long").alias("n"),
        F.col("total").alias("amount"),
    )
    return r.unionByName(c).orderBy(
        "shape", F.col("g1").asc_nulls_first(), F.col("g2").asc_nulls_first()
    )


GROUPING_SETS_SQL = """
SELECT * FROM (
  SELECT 'rollup_lineitem' AS shape, l_returnflag AS g1, l_linestatus AS g2,
         count(*) AS n, round(sum(l_extendedprice), 2) AS amount
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)
  UNION ALL
  SELECT 'cube_orders', o_orderstatus, o_orderpriority,
         count(*), round(sum(o_totalprice), 2)
  FROM orders
  GROUP BY CUBE (o_orderstatus, o_orderpriority)
)
ORDER BY shape, g1 ASC NULLS FIRST, g2 ASC NULLS FIRST
"""


QUERIES = {
    # rollup/cube are driver-gated through the grouping_sets_stats composite
    "grouping_sets_stats": (grouping_sets_stats, GROUPING_SETS_SQL),
    "pivot_event_counts": (pivot_event_counts, PIVOT_SQL),
    "dominant_element": (dominant_element, DOMINANT_SQL),
    "set_union_reagg": (set_union_reagg, SET_UNION_SQL),
    "approx_and_sample_stats": (approx_and_sample_stats, None),  # rows-only
}
