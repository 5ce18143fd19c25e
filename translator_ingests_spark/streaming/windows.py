"""Event-time windowing: tumbling windows with watermarks, session windows,
and a custom stateful operator via ``applyInPandasWithState``.

Spark-first shapes (brief-mandated streaming coverage beyond the CDC
micro-batch loop in ``micro_batch.py``):

- ``windowed_event_counts`` — tumbling event-time windows via ``F.window``.
  The SAME expression runs in batch (driver oracle query) and on a stream;
  ``streaming_windowed_counts`` adds ``withWatermark`` so state for closed
  windows is dropped and late rows beyond the watermark are discarded —
  the standard late-data design at 100 TB/day event volumes.
- ``session_windows_per_user`` — ``F.session_window`` (gap-based sessions),
  again identical in batch and streaming. The DuckDB oracle reproduces the
  semantics relationally (LAG + gap-flag running sum), which pins down the
  session boundary definition instead of trusting Spark's.
- ``running_latest_state`` — ``applyInPandasWithState``: per-key state (the
  latest event by ts) carried across micro-batches with a processing-time
  timeout; the custom-stateful-operator slot for semantics the built-in
  windowed aggregates can't express.

Reference analog: the reference's ingest pipeline is batch-only (ORION
`pipeline.py` stages); these operators are the streaming superset the brief
mandates for the Spark re-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregation (batch or streaming input).

    Returns one row per (window_start, event_type) with count and value sum
    — the canonical watermark-friendly aggregation: every aggregate is a
    primitive buffer (codegen HashAggregate), partial-aggregated map-side,
    shuffled once on (window, event_type).
    """
    return (
        events.groupBy(
            F.window(F.col("ts"), width).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def streaming_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "2 hours",
    width: str = "1 hour",
) -> DataFrame:
    """The same windowed aggregation over a FILE STREAM with a watermark.

    ``withWatermark`` bounds state: windows older than (max event time −
    watermark) are finalized and evicted, and rows arriving later than the
    watermark are dropped — without it, unbounded event-time state is a
    guaranteed OOM on an unbounded stream.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # watermarks are only defined on TIMESTAMP (with timezone); parquet
    # event times arrive as TIMESTAMP_NTZ — cast is lossless under the
    # engine's fixed UTC session timezone
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return windowed_event_counts(stream.withWatermark("ts", watermark), width)


def session_windows_per_user(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user (``F.session_window``).

    A session = consecutive events of one user with < ``gap`` between
    neighbors; windows merge at aggregation time. Works identically on
    batch and (with a watermark) streaming input.
    """
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("s"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


def running_latest_state(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator: per-user latest event carried across
    micro-batches via ``applyInPandasWithState``.

    Emits, per user per micro-batch, the latest (ts, event_type, value) seen
    SO FAR across the whole stream — state the built-in aggregations can't
    express incrementally when downstream wants per-batch deltas. On batch
    input Spark runs the same function once over each group.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("latest_ts", TimestampType()),
            StructField("latest_type", StringType()),
            StructField("latest_value", DoubleType()),
            StructField("events_seen", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ts", LongType()),  # microseconds since epoch
            StructField("etype", StringType()),
            StructField("value", DoubleType()),
            StructField("seen", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        ts_us, etype, value, seen = (
            state.get if state.exists else (None, None, None, 0)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            seen += len(pdf)
            idx = pdf["ts"].idxmax()
            row_us = int(pd.Timestamp(pdf["ts"][idx]).value // 1000)
            if ts_us is None or row_us >= ts_us:
                ts_us = row_us
                etype = pdf["event_type"][idx]
                value = float(pdf["value"][idx])
        state.update((ts_us, etype, value, seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "latest_ts": [pd.Timestamp(ts_us * 1000)],
                "latest_type": [etype],
                "latest_value": [value],
                "events_seen": [seen],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
