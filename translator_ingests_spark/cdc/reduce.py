"""Within-batch last-writer-wins reduction with explicit hot-key salting.

Semantics: for each key, keep the single event with the greatest
``(lsn, op_rank, row_hash)`` — a fully deterministic total order, so duplicate
redelivery (identical rows) and even pathological same-LSN conflicts reduce
identically on every replay. Reference analog: the max-reduction /
group-dedup patterns at /root/reference/src/translator_ingest/ingests/hpoa/hpoa.py:339-344
and string.py:126-139.

Skew: a mega-repo carrying ~50% of a batch's events would send one giant
group to a single reducer. Spark's hash aggregate already does map-side
partial aggregation (each task pre-reduces its slice of the hot key), which
bounds the skew for this *aggregation*; we additionally support an explicit
two-phase salted reduce — phase 1 groups on ``(key, salt)`` where
``salt = pmod(xxhash64(lsn), salt_buckets)`` for detected hot repos, phase 2
re-reduces per key — which is the pattern that generalizes to agg functions
without cheap partial merge (reference analog: hot-edge capping at
semmeddb.py:200-233, except we must preserve the winner exactly, so
salt+re-reduce, never cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ranking for deterministic tie-break at equal LSN (higher wins):
# delete > update > insert > schema_change — a delete that shares an LSN with
# a data op (corrupt producer) resolves the same way on every replay.
def _op_rank(op_col: str):
    c = F.col(op_col)
    return (
        F.when(c == "delete", 3)
        .when(c == "update", 2)
        .when(c == "insert", 1)
        .otherwise(0)
    )


def detect_hot_keys(
    df: DataFrame,
    key_col: str = "repo",
    sample_fraction: float = 0.05,
    hot_threshold: int = 10_000,
    seed: int = 7,
) -> list[str]:
    """Estimate which ``key_col`` values are hot via a cheap sample.

    Returns values whose *estimated* full count exceeds ``hot_threshold``.
    The sample aggregation is tiny (distinct repos), so the driver collect is
    safe at any scale.
    """
    if sample_fraction >= 1.0:
        counts = df.groupBy(key_col).count()
        scale = 1.0
    else:
        counts = df.sample(fraction=sample_fraction, seed=seed).groupBy(key_col).count()
        scale = 1.0 / sample_fraction
    rows = counts.filter(F.col("count") * scale > hot_threshold).select(key_col).collect()
    return sorted(r[key_col] for r in rows if r[key_col] is not None)


def lww_reduce(
    df: DataFrame,
    keys: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    hot_keys: list[str] | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Reduce to one row per key: the max-(lsn, op_rank, hash) survivor.

    Uses ``max_by(struct(all columns), struct(order))`` so the whole row of
    the winner survives in a single (map-side-combinable) aggregation.
    When ``hot_keys`` is non-empty, runs the two-phase salted variant.
    """
    cols = df.columns
    # xxhash64 doesn't accept MapType columns — exclude them from the tie hash
    from pyspark.sql.types import MapType

    hashable = [
        f.name for f in df.schema.fields
        if f.name != lsn_col and not isinstance(f.dataType, MapType)
    ]
    payload = F.struct(*[F.col(c) for c in cols]).alias("__row")
    order = F.struct(
        F.col(lsn_col).alias("o1"),
        _op_rank(op_col).alias("o2"),
        F.xxhash64(*[F.col(c) for c in hashable]).alias("o3"),
    )

    if hot_keys:
        salt = F.when(
            F.col(keys[0]).isin(hot_keys),
            F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)).alias("__salt")
        phase1 = (
            df.select(*cols, salt)
            .groupBy(*keys, "__salt")
            .agg(F.max_by(payload, order).alias("__row"))
        )
        # re-expand order columns from the surviving row for phase 2
        p1 = phase1.select(
            *keys,
            F.col("__row"),
            F.col(f"__row.{lsn_col}").alias("__o1"),
            F.col(f"__row.{op_col}").alias("__op_tmp"),
            F.xxhash64(*[F.col(f"__row.{c}") for c in hashable]).alias("__o3"),
        ).withColumn("__o2", _op_rank("__op_tmp"))
        reduced = p1.groupBy(*keys).agg(
            F.max_by(F.col("__row"), F.struct("__o1", "__o2", "__o3")).alias("__row")
        )
    else:
        reduced = df.groupBy(*keys).agg(F.max_by(payload, order).alias("__row"))

    return reduced.select(*[F.col(f"__row.{c}").alias(c) for c in cols])
