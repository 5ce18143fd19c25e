"""Physical-plan quality gates: the plans we'd want at 100 TB, asserted at
test scale — filters/projections reach the parquet scan, dimension joins go
broadcast, the LWW reduce is one partial-aggregated shuffle, and no data
path collects rows to the driver."""

import re

from pyspark.sql import functions as F

from translator_ingests_spark.cdc.generator import generate_event_log
from translator_ingests_spark.cdc.reduce import lww_reduce
from translator_ingests_spark.operators import relational

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_and_projection_pushdown(spark):
    plan = plan_of(relational.q1_pricing_summary(spark, SF))
    # predicate reaches the scan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # column pruning: unused columns (l_comment-like: l_partkey/suppkey) not read
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "l_partkey" not in m.group(1) and "l_orderkey" not in m.group(1)
    # aggregation is partial (map-side combine) then final
    assert "partial_sum" in plan and plan.count("HashAggregate") >= 2


def test_q5_broadcasts_dimensions(spark):
    plan = plan_of(relational.q5_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan  # region/nation sides broadcast


def test_semi_and_anti_joins_stay_semi(spark):
    p1 = plan_of(relational.semi_join_customers_with_urgent_orders(spark, SF))
    assert "LeftSemi" in p1
    p2 = plan_of(relational.anti_join_parts_never_ordered(spark, SF))
    assert "LeftAnti" in p2


def test_lww_reduce_plan_is_primitive_hashagg_plus_join(spark):
    """The reduce's only full-batch aggregation must be a HashAggregate over
    a primitive max(lsn) buffer (whole-stage codegen + map-side combine — the
    scale path); the variable-buffer max_by tie-break runs only over the
    joined candidates. The full event rows themselves must never feed an
    Exchange: the two hash exchanges carry winners and candidates only."""
    log = generate_event_log(spark, 1000, seed=3)
    red = lww_reduce(log, keys=["repo", "path"])
    plan = plan_of(red)
    assert "HashAggregate" in plan and "max(lsn" in plan
    assert plan.count("max_by") >= 2  # partial + final tie-break
    # winners agg + candidates agg; the events side joins via broadcast or
    # shuffled-hash chosen by AQE — either way no third full-data exchange
    assert plan.count("Exchange hashpartitioning") == 2


def test_lww_reduce_no_full_data_sort_or_object_agg(spark):
    """The full-data path must stay on codegen HashAggregate: the only
    SortAggregates in the reduce are the max_by tie-break pair over the
    post-join candidates (~1 row/key), never over the raw events, and no
    ObjectHashAggregate (interpreted, boxes per row) may appear at all."""
    log = generate_event_log(spark, 1000, seed=3)
    plan = plan_of(lww_reduce(log, keys=["repo", "path"]))
    assert "ObjectHashAggregate" not in plan
    sort_aggs = [l for l in plan.splitlines() if "SortAggregate" in l]
    assert len(sort_aggs) == 2  # partial + final tie-break only
    assert all("max_by" in l for l in sort_aggs)


def test_lww_reduce_hot_keys_arg_is_plan_noop(spark):
    log = generate_event_log(spark, 1000, seed=3)
    import re

    strip_ids = lambda p: re.sub(r"#\d+|plan_id=\d+", "#", p)  # noqa: E731
    p1 = strip_ids(plan_of(lww_reduce(log, keys=["repo", "path"])))
    p2 = strip_ids(plan_of(lww_reduce(log, keys=["repo", "path"],
                                      hot_keys=["org/mega-repo-000"],
                                      salt_buckets=8)))
    assert p1 == p2
    assert "__salt" not in p2


def test_reader_filter_pushdown_counts_as_scan_filter(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter(F.col("l_quantity") > 30)
    )
    plan = plan_of(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_quantity" in m.group(1)
    m2 = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m2 and "l_extendedprice" not in m2.group(1)


def test_no_collect_in_operator_sources():
    """Static gate: no untagged .collect( anywhere in the package
    (driver-side loops disqualify an operator from being distributed).
    A collect may be justified with `# bounded-collect: <reason>` on the
    call line or within the 3 lines above it — ONLY when its cardinality
    is bounded independent of row count (one aggregate row, ≤ num_buckets,
    O(rules), broadcast-dimension pattern), never O(rows)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "translator_ingests_spark")
    offenders = []
    for path in glob.glob(f"{root}/**/*.py", recursive=True):
        rel = os.path.relpath(path, root)
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines, 1):
            if ".collect()" not in line:
                continue
            # i is 1-based, so lines[i-4:i] = the call line (index i-1)
            # plus the 3 lines above it — and nothing after the call
            window = lines[max(0, i - 4):i]
            if not any("# bounded-collect:" in ln for ln in window):
                offenders.append(f"{rel}:{i}")
    assert not offenders, offenders
