"""Synthesize an sf1 fixture by deterministic 10x replication of the
driver-generated sf0.1 tables (/root/testdata is read-only; TESTDATA.md).

Each copy i (0..9) offsets every surrogate key by i * (max_key + 1), and
remaps the fact tables' foreign keys with the SAME offset, so joins stay
consistent *within* a copy: q1/q3/q5-shaped plans see 10x the rows, 10x the
join build sides, and 10x the groups — the regime where exchange cost
dominates and plan regressions actually surface (sf0.1 is ~17MB; shuffles
barely engage). nation/region stay fixed (they are fixed-size in TPC-H too).
documents/embeddings replicate with offset ids and unchanged payloads —
for dedup that is an adversarial 10-way exact/near-dup corpus, for ANN a
10x corpus with tie-heavy neighborhoods; both stress the candidate-pair
paths linearly, which is the point.

The replication is one pass per table (explode over a literal copy array —
no union fan-in of 10 subplans), written with copy-count partitioning so
downstream scans parallelize.

Usage: python tools/make_sf1.py [target_dir] (default /tmp/spark_graft_sf1)
Import: ensure_sf1(spark, target) is idempotent via a _DONE marker.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DEFAULT_TARGET = "/tmp/spark_graft_sf1"
COPIES = 10

# table -> (surrogate key cols offset by their OWN table max,
#           fk col -> parent table whose max supplies the offset)
_KEYED = {
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": ([], {"l_orderkey": "orders", "l_partkey": "part",
                      "l_suppkey": "supplier"}),
    "events": (["event_id"], {"user_id": "events:user_id"}),
    "documents": (["doc_id"], {}),
    "embeddings": (["vec_id"], {}),
}
_COPY_ASIS = ["nation", "region"]


def _max_plus_one(spark: SparkSession, table: str) -> int:
    if ":" in table:  # "events:user_id" — non-key column's own max
        table, col = table.split(":")
    else:
        col = _KEYED[table][0][0]
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    return int(df.agg(F.max(col)).first()[0]) + 1


def ensure_sf1(spark: SparkSession, target: str = DEFAULT_TARGET) -> str:
    marker = os.path.join(target, "_DONE")
    if os.path.exists(marker):
        return target
    os.makedirs(target, exist_ok=True)

    strides: dict[str, int] = {}
    for t, (keys, fks) in _KEYED.items():
        for ref in list(fks.values()) + ([t] if keys else []):
            if ref not in strides:
                strides[ref] = _max_plus_one(spark, ref)

    copies = F.explode(F.array(*[F.lit(i) for i in range(COPIES)])).alias("__copy")
    for t in _COPY_ASIS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            os.path.join(target, f"{t}.parquet"))
    for t, (keys, fks) in _KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet").select("*", copies)
        stride_of = {k: strides[t] for k in keys}
        stride_of.update({col: strides[ref] for col, ref in fks.items()})
        for col, stride in stride_of.items():
            dt = dict(df.dtypes)[col]
            df = df.withColumn(
                col, (F.col(col) + F.col("__copy") * F.lit(stride)).cast(dt))
        # lineitem's copy identity rides entirely on the remapped FKs
        (df.repartition(32, "__copy", *list(stride_of)[:1]).drop("__copy")
           .write.mode("overwrite").parquet(os.path.join(target, f"{t}.parquet")))

    with open(marker, "w") as fh:
        fh.write("sf1 = 10x key-offset replication of /root/testdata/sf0.1\n")
    return target


if __name__ == "__main__":
    tgt = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_TARGET
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from translator_ingests_spark.session import get_spark

    spark = get_spark("make-sf1", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_sf1(spark, tgt)
    for name in sorted(os.listdir(tgt)):
        p = os.path.join(tgt, name)
        if os.path.isdir(p):
            sz = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(p) for f in fs)
            print(f"{name}: {sz / 1e6:.1f} MB")
    spark.stop()
