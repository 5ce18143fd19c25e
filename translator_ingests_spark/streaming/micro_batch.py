"""Structured Streaming front-end for the CDC engine.

``readStream`` tails a directory of event files (the stand-in for a
binlog/WAL topic; a Kafka source drops in with the same schema) and
``foreachBatch`` routes each micro-batch through the same exactly-once
apply path the batch loop uses:

- Spark's streaming checkpoint guarantees each epoch's file set is stable
  across restarts (same epoch_id → same data on replay);
- the lake's batch-id guard makes the re-application of a replayed epoch a
  metadata no-op — together: end-to-end exactly-once into the lake table.

``Trigger.AvailableNow`` drains the backlog in bounded micro-batches and
stops — the reference's batch-pipeline shape (SURVEY.md §2.8) — while the
same code serves a continuous trigger in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from translator_ingests_spark.cdc.apply import _DATA_OPS, EVENT_SCHEMA, CdcEngine

# max committed units per epoch: unit ids are epoch_id * _UNITS_PER_EPOCH + i
# (schema-change events split an epoch into multiple committed units)
_UNITS_PER_EPOCH = 1000


class CdcStream:
    def __init__(
        self,
        engine: CdcEngine,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
    ):
        self.engine = engine
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.manifests: list[dict] = []

    # -- foreachBatch sink ---------------------------------------------------
    def _apply_epoch(self, batch: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        engine = self.engine
        engine.init_table()
        # file-stream epochs carry no cross-epoch LSN-order guarantee, so the
        # retention watermark must NOT advance (a wrongly-advanced watermark
        # makes merge drop valid late events); offset-range disjointness is
        # likewise not assumed by the validator for stream batches
        engine._delivery = "stream"
        # detach the epoch from the streaming source: localCheckpoint
        # materializes the batch and truncates its lineage, so the many
        # downstream jobs the apply unit runs (concurrent lineage/hot-key
        # aggregations, the single-pass observed merge write) execute as
        # plain batch jobs — re-executing a foreachBatch source plan from
        # multiple jobs can wedge the microbatch thread (observed hang)
        batch = batch.localCheckpoint(eager=True)
        try:
            schema_rows = (
                batch.filter(F.col("op") == "schema_change")
                .select("lsn", "schema_change")
                .collect()  # bounded-collect: capped at _UNITS_PER_EPOCH schema events (raises above)
            )
            schema_rows.sort(key=lambda r: r["lsn"])
            if len(schema_rows) >= _UNITS_PER_EPOCH:
                raise RuntimeError(
                    f"epoch {epoch_id}: {len(schema_rows)} schema events exceed "
                    f"the {_UNITS_PER_EPOCH}-unit epoch budget"
                )
            data = batch.filter(F.col("op").isin(*_DATA_OPS))

            unit_id = epoch_id * _UNITS_PER_EPOCH
            bounds = [r["lsn"] for r in schema_rows]
            lows = [None] + bounds
            highs = bounds + [None]
            for i, (lo, hi) in enumerate(zip(lows, highs)):
                sub = data
                if lo is not None:
                    sub = sub.filter(F.col("lsn") > lo)
                if hi is not None:
                    sub = sub.filter(F.col("lsn") < hi)
                # lag is unknowable on the streaming path (no total backlog
                # count without draining the source) — record null, not a
                # misleading negative number
                m = engine._apply_data_unit(sub, unit_id, lag_events=None)
                if m is not None:
                    self.manifests.append(m)
                unit_id += 1
                if i < len(schema_rows):
                    sc = schema_rows[i]["schema_change"]
                    engine.table.update_schema(
                        sc["kind"], sc["column"], sc["new_name"], sc["new_type"],
                        at_lsn=schema_rows[i]["lsn"],
                    )
        finally:
            # localCheckpoint blocks are freed when the DataFrame is GC'd
            pass

    # -- drivers ---------------------------------------------------------------
    def run_available_now(self, timeout_sec: int | None = None) -> None:
        """Drain everything currently in source_dir, then stop (bounded
        micro-batches via maxFilesPerTrigger)."""
        reader = (
            self.engine.spark.readStream.schema(EVENT_SCHEMA)
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(self.source_dir)
        q = (
            stream.writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
