"""Driver-registry wrappers for the event-time windowing operators
(`streaming/windows.py`): tumbling windows and gap-based session windows
over the `events` table, each with a DuckDB oracle that reproduces the
window semantics relationally — the oracle pins down the boundary rules
(epoch-aligned tumbling buckets; a new session at gap ≥ 30 min) instead of
trusting Spark's implementation of them.

The same expressions run unchanged over a stream (``withWatermark`` added
— see `streaming/windows.py` and `tests/test_streaming_windows.py` for the
late-data/watermark and stateful variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan-out here: the tumbling-window aggregate collapses map-side to
    # a few thousand (hour, type) groups, so the serial partial pass on the
    # single-file fixture is cheaper than shuffling the raw rows first
    # (A/B at sf1.0: 0.49s raw vs 0.96s fanned)
    from translator_ingests_spark.streaming.windows import windowed_event_counts as w

    return w(_events(spark, sf_dir), width="1 hour")


def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan-out by the session key (batch wrapper only — streams keep their
    # source partitioning): session merging sorts every row, so the serial
    # single-file scan gates the whole query; partitioning by user_id is
    # reused by the session aggregation's clustering requirement
    # (A/B at sf1.0: 1.16s raw vs 0.63s fanned)
    from translator_ingests_spark.operators.scan_util import fan_out
    from translator_ingests_spark.streaming.windows import (
        session_windows_per_user as s,
    )

    return s(
        fan_out(spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id"),
        gap="30 minutes",
    )


# Spark's 1-hour tumbling windows are epoch-aligned — date_trunc('hour')
# is the exact relational equivalent.
WINDOWED_COUNTS_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

# Session semantics: consecutive events of a user belong to one session
# while the gap to the previous event is < 30 min; a gap >= 30 min starts a
# new one. LAG + new-session flag + running sum assigns session ids.
SESSION_WINDOWS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS value_sum
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


QUERIES = {
    "windowed_event_counts": (windowed_event_counts, WINDOWED_COUNTS_SQL),
    "session_windows_per_user": (session_windows_per_user, SESSION_WINDOWS_SQL),
}
