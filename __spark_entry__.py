"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full CDC replay through the engine)
at sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md §2 as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the value-hash correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the sf0.001 change log through the full CDC engine
    (LWW reduce → tombstoned MERGE → snapshot read) and return final state."""
    from translator_ingests_spark.operators.cdc_queries import cdc_replay_final_state

    return cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from translator_ingests_spark.operators import cdc_queries, relational

    reg: dict[str, tuple] = {}
    for mod in (relational, cdc_queries):
        reg.update(mod.QUERIES)
    try:
        from translator_ingests_spark.operators import (
            analytics,
            dedup,
            merge_queries,
            normalize,
            reference_shapes,
            similarity,
            temporal,
            text,
        )

        for mod in (
            analytics,
            dedup,
            merge_queries,
            normalize,
            reference_shapes,
            similarity,
            temporal,
            text,
        ):
            reg.update(mod.QUERIES)
    except ImportError:
        pass
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
