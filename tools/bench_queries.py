"""Query-lane bench: times declared queries exactly like bench.py's HEADLINE
loop (interleaved best-of-2, count() action) without the throughput points —
for fast optimization A/B at any sf. bench.py itself is frozen for
measurement; cite numbers from here in OPTIMIZATION notes only.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/bench_queries.py [q ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "broadcast_dim_join",
    "topk_per_group",
    "latest_event_per_user",
    "groupby_multi_agg",
    "distinct_dedup",
    "cdc_lww_reduce_only",
    "windowed_event_counts",
    "session_windows_per_user",
    "ann_ivf_flat",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
]


def main():
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_QBENCH_PASSES", "2"))

    import __spark_entry__ as entrymod
    from translator_ingests_spark.session import get_spark

    spark = get_spark("bench_queries", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    qs = {n: f for n, (f, _s) in entrymod._registry(full=True).items()}
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            e = round(time.monotonic() - t0, 3)
            if name not in timings or e < timings[name]:
                timings[name] = e
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
