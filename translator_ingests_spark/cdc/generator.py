"""Deterministic synthetic CDC event-log generator.

Generates the ordered change-event log described in FIXTURES.md §A2 entirely
with Spark column expressions — `spark.range` + hash-derived pseudo-randomness
(``xxhash64(seed, lsn)``), so the log is byte-deterministic for a given seed
(no ``rand()``, no wall clock, no uuid4 — the reference's uuid4 edge ids at
/root/reference/src/translator_ingest/util/transform_utils.py:3-12 are the
anti-pattern we deliberately avoid, since replay equality requires determinism).

Skew knob: a small set of "mega repos" carries ``hot_fraction`` of all events,
to exercise salt-based hot-key splitting (reference analog: 60k-PMID hot edges
at /root/reference/src/translator_ingest/ingests/semmeddb/semmeddb.py:56-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_event_log(
    spark: SparkSession,
    n_events: int,
    seed: int = 42,
    n_repos: int = 100,
    n_mega_repos: int = 2,
    hot_fraction: float = 0.4,
    paths_per_repo: int = 50,
    delete_fraction: float = 0.05,
    n_source_partitions: int = 8,
    schema_changes: list[dict] | None = None,
    shuffle_delivery: bool = False,
    n_spark_partitions: int | None = None,
    content_repeat: int = 1,
    key_locality: int | None = None,
    locality_window: int = 100_000,
    lsn_start: int = 0,
) -> DataFrame:
    """Build the event log. ``lsn`` is a total order 0..n_events-1.

    ``schema_changes``: list of ``{"lsn": int, "kind": str, "column": str,
    "new_name": str|None, "new_type": str|None}`` — those LSNs become
    ``op='schema_change'`` events instead of data events.

    ``shuffle_delivery=True`` returns rows in a deterministic but
    LSN-scrambled order (delivery order ≠ commit order) to exercise
    out-of-order handling.

    ``key_locality``: real CDC batches cluster on a small active working set
    (hot files being rewritten), they don't spray uniform-random keys across
    the whole keyspace. When set, each ``locality_window`` of consecutive
    LSNs draws its (repo, path) keys from a rotating window of exactly
    ``key_locality`` keys out of the full ``n_repos × paths_per_repo``
    keyspace — so a micro-batch touches few distinct keys and the lake's
    bucket/file pruning actually engages, as it would in production.
    """
    # every column below is a pure function of (seed, lsn), so generating the
    # range [lsn_start, lsn_start + n_events) yields byte-identical rows to
    # the same slice of one full-range generation — billion-event runs
    # materialize the log in chunks without ever holding it all on disk
    df = spark.range(
        lsn_start, lsn_start + n_events, 1,
        n_spark_partitions or spark.sparkContext.defaultParallelism,
    )
    df = df.withColumnRenamed("id", "lsn")

    h = lambda salt: F.abs(F.xxhash64(F.lit(seed), F.lit(salt), F.col("lsn")))  # noqa: E731

    hot_pm = 1_000_000
    is_hot = (h("hot") % hot_pm) < int(hot_fraction * hot_pm)
    repo = F.when(
        is_hot,
        F.concat(F.lit("org/mega-repo-"), F.lpad((h("mr") % n_mega_repos).cast("string"), 3, "0")),
    ).otherwise(
        F.concat(F.lit("org/repo-"), F.lpad((h("r") % n_repos).cast("string"), 5, "0"))
    )
    path = F.concat(
        F.lit("src/dir"), (h("d") % 10).cast("string"),
        F.lit("/file"), (h("p") % paths_per_repo).cast("string"), F.lit(".py"),
    )
    if key_locality is not None:
        # rotating working set: window w activates key ids
        # [w·locality, w·locality + key_locality) mod the full keyspace
        total_keys = n_repos * paths_per_repo
        window = F.floor(F.col("lsn") / F.lit(locality_window))
        key_id = (window * key_locality + (h("loc") % key_locality)) % total_keys
        repo = F.concat(
            F.lit("org/repo-"),
            F.lpad((key_id / paths_per_repo).cast("long").cast("string"), 5, "0"),
        )
        path = F.concat(
            F.lit("src/file"), (key_id % paths_per_repo).cast("string"), F.lit(".py")
        )
    lang = F.element_at(
        F.array(F.lit("python"), F.lit("rust"), F.lit("go"), F.lit("java"), F.lit("c")),
        ((h("l") % 5) + 1).cast("int"),
    )
    commit = F.substring(F.sha2(F.concat(F.lit(str(seed)), F.lit(":"), F.col("lsn").cast("string")), 256), 1, 40)
    body_line = F.concat(
        F.lit("fn body_"), (h("c") % 100000).cast("string"),
        F.lit("() { return "), (h("v") % 1000).cast("string"), F.lit("; }\n"),
    )
    # content_repeat scales per-row payload toward realistic source-file
    # sizes (KBs) without changing determinism
    content = F.concat(
        F.lit("// commit "), commit, F.lit("\n"), F.repeat(body_line, content_repeat)
    )
    del_pm = 1_000_000
    is_delete = (h("del") % del_pm) < int(delete_fraction * del_pm)
    is_update = (h("upd") % 2) == 0
    op = F.when(is_delete, F.lit("delete")).otherwise(
        F.when(is_update, F.lit("update")).otherwise(F.lit("insert"))
    )

    df = df.select(
        F.col("lsn"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        F.when(~is_delete, content).alias("content"),
        F.lit(None).cast(
            "struct<kind:string,column:string,new_name:string,new_type:string>"
        ).alias("schema_change"),
        (h("sp") % n_source_partitions).cast("int").alias("source_partition"),
        # offset within the origin partition: rank of lsn within partition —
        # a deterministic stand-in; monotone in lsn per partition
        F.col("lsn").alias("source_offset"),
        # values for dynamically-added columns (harmless before the column
        # exists — the engine gates fill on the add_column LSN)
        F.when(
            ~is_delete,
            F.create_map(F.lit("lang_meta"), F.concat(F.lit("meta-"), lang)),
        ).alias("extras"),
    )

    for sc in schema_changes or []:
        at = sc["lsn"]
        df = df.select(
            "lsn",
            F.when(F.col("lsn") == at, F.lit("schema_change")).otherwise(F.col("op")).alias("op"),
            *[F.when(F.col("lsn") == at, F.lit(None).cast("string")).otherwise(F.col(c)).alias(c)
              for c in ["repo", "path", "commit", "lang", "content"]],
            F.when(
                F.col("lsn") == at,
                F.struct(
                    F.lit(sc["kind"]).alias("kind"),
                    F.lit(sc["column"]).alias("column"),
                    F.lit(sc.get("new_name")).cast("string").alias("new_name"),
                    F.lit(sc.get("new_type")).cast("string").alias("new_type"),
                ),
            ).otherwise(F.col("schema_change")).alias("schema_change"),
            "source_partition",
            "source_offset",
            "extras",
        )

    if shuffle_delivery:
        # deterministic scramble: order by a hash of lsn, not lsn itself
        df = df.orderBy(F.xxhash64(F.lit(seed), F.lit("shuffle"), F.col("lsn")))
    return df
