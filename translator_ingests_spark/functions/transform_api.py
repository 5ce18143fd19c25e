"""The ingest-transform API: the reference's user-extension surface
re-expressed Spark-first.

Reference (§2.9, /root/reference/src/translator_ingest/_ingest_template/_ingest_template.py:44-169):
- ``@koza.prepare_data``      — whole-input rewrite before the transform
- ``@koza.transform_record``  — one record → 0..n output entities
- ``@koza.transform``         — iterator→iterator over batches
- ``@koza.on_data_begin/end`` — setup/teardown (lookup maps, metric flush)
- ``koza.state``              — shared per-run state

Spark mapping implemented here:
- ``prepare``     — an ordinary DataFrame→DataFrame stage (Catalyst plans it)
- ``transform_batches`` — Arrow-batched ``mapInPandas`` (iterator of pandas
  frames → iterator of pandas frames); the *only* place user Python runs,
  and it runs vectorized per batch — the per-record dict-at-a-time loop is
  the one reference pattern deliberately not reproduced
- ``lookup(name, df)`` — broadcast dimension tables replacing the
  reference's hand-rolled in-heap dict probes (string.py:70-83)
- ``on_begin/on_end`` — driver-side hooks around the run
- metrics — ``df.observe`` accumulators replacing koza.state counters
  (semmeddb.py:287-338)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class IngestPipeline:
    """Composable ingest: prepare stages → one Arrow-batched transform →
    writer. Stages are declared, then ``run(df)`` executes."""

    name: str
    _prepare: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    _transform: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] | None = None
    _transform_schema: T.StructType | str | None = None
    _lookups: dict[str, DataFrame] = field(default_factory=dict)
    _on_begin: list[Callable[[], None]] = field(default_factory=list)
    _on_end: list[Callable[[dict], None]] = field(default_factory=list)
    _observations: dict[str, list] = field(default_factory=dict)

    # -- declaration ---------------------------------------------------------
    def prepare(self, fn: Callable[[DataFrame], DataFrame]) -> "IngestPipeline":
        self._prepare.append(fn)
        return self

    def lookup(self, name: str, dim: DataFrame, on: list[str],
               how: str = "left") -> "IngestPipeline":
        """Broadcast dimension join (the reference's on_data_begin dict-load
        + per-record .get() probe, as a real join)."""
        self._prepare.append(lambda df: df.join(F.broadcast(dim), on=on, how=how))
        return self

    def transform_batches(
        self,
        fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
        schema: T.StructType | str,
    ) -> "IngestPipeline":
        self._transform = fn
        self._transform_schema = schema
        return self

    def observe(self, name: str, *exprs) -> "IngestPipeline":
        self._observations[name] = list(exprs)
        return self

    def on_begin(self, fn: Callable[[], None]) -> "IngestPipeline":
        self._on_begin.append(fn)
        return self

    def on_end(self, fn: Callable[[dict], None]) -> "IngestPipeline":
        self._on_end.append(fn)
        return self

    # -- execution -------------------------------------------------------------
    def plan(self, df: DataFrame) -> tuple[DataFrame, dict[str, Observation]]:
        for hook in self._on_begin:
            hook()
        obs: dict[str, Observation] = {}
        for stage in self._prepare:
            df = stage(df)
        for name, exprs in self._observations.items():
            ob = Observation(name)
            df = df.observe(ob, *exprs)
            obs[name] = ob
        if self._transform is not None:
            df = df.mapInPandas(self._transform, self._transform_schema)
        return df, obs

    def run(self, df: DataFrame) -> tuple[list, dict]:
        """Execute and collect (test-scale helper); production writes via
        any sink on the planned DataFrame instead."""
        planned, obs = self.plan(df)
        rows = planned.collect()  # bounded-collect: documented test-scale helper, not a production path
        metrics = {name: ob.get for name, ob in obs.items()}
        for hook in self._on_end:
            hook(metrics)
        return rows, metrics
