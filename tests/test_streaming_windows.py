"""Streaming windowing: tumbling windows with watermarks over a file
stream, and the applyInPandasWithState custom stateful operator — state
must carry across micro-batches and late data must obey the watermark."""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from translator_ingests_spark.streaming.windows import (
    running_latest_state,
    streaming_windowed_counts,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _events_schema(spark):
    return spark.read.parquet(f"{SF}/events.parquet").schema


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """availableNow over a file stream (complete mode) must equal the batch
    windowed aggregation over the same files."""
    src = str(tmp_path / "stream_src")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(src)

    out = streaming_windowed_counts(spark, src, _events_schema(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["value_sum"], 4))
        for r in spark.sql("select * from winagg").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["value_sum"], 4))
        for r in windowed_event_counts(
            spark.read.parquet(f"{SF}/events.parquet")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row arriving in a later micro-batch with event time older than
    (max seen − watermark) must be DROPPED from the aggregation; a late row
    within the watermark must be counted. Append mode only emits windows
    the watermark has closed."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"

    def write_file(name, rows):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["ts", "event_type", "value"])
        ).write.mode("append").parquet(src)
        _ = name

    t0 = pd.Timestamp("2024-01-01 00:30:00")
    # batch 1: events at 00:30 and 06:30 → watermark advances to 04:30
    write_file("a", [(t0, "x", 1.0), (pd.Timestamp("2024-01-01 06:30:00"), "x", 1.0)])
    # batch 2: one LATE row in hour 00 (beyond watermark → dropped) and one
    # within the watermark in hour 05 (kept)
    late = [(pd.Timestamp("2024-01-01 00:45:00"), "x", 1.0),
            (pd.Timestamp("2024-01-01 05:15:00"), "x", 1.0)]

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    agg = windowed_event_counts(stream.withWatermark("ts", "2 hours"))
    q = (
        agg.writeStream.format("memory")
        .queryName("lateagg")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark advances to 04:30
        write_file("b", late)
        q.processAllAvailable()  # batch 2: the 00:45 row is beyond watermark
    finally:
        q.stop()

    # the hour-00 window closed once the watermark passed 02:00 with exactly
    # the one pre-watermark row — the late 00:45 arrival must NOT have
    # reopened or recounted it (the hour-05/06 windows stay open in state:
    # the watermark never passes their end, so append emits nothing for them)
    rows = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("select * from lateagg").collect()
    }
    h0 = pd.Timestamp("2024-01-01 00:00:00")
    assert rows.get(h0) == 1  # late row beyond watermark was dropped


@pytest.mark.parametrize("n_files", [2])
def test_running_latest_state_carries_across_batches(spark, tmp_path, n_files):
    """applyInPandasWithState: with maxFilesPerTrigger=1 each file is its
    own micro-batch; per-user state (latest event + events_seen) must
    accumulate across them."""
    src = str(tmp_path / "state_src")
    events = spark.read.parquet(f"{SF}/events.parquet").filter(F.col("user_id") < 50)
    n_total = events.count()
    # split into n_files disjoint files by parity of event_id
    for i in range(n_files):
        events.filter(F.col("event_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = running_latest_state(stream.select("user_id", "ts", "event_type", "value"))
    q = (
        out.writeStream.format("memory")
        .queryName("latstate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    res = spark.sql("select * from latstate").collect()
    # keep the LAST emission per user (highest events_seen)
    last = {}
    for r in res:
        if r["user_id"] not in last or r["events_seen"] > last[r["user_id"]]["events_seen"]:
            last[r["user_id"]] = r

    # oracle: python max-by-ts per user over the full batch input
    want = {}
    seen_counts = {}
    for r in events.select("user_id", "ts", "event_type", "value").collect():
        seen_counts[r["user_id"]] = seen_counts.get(r["user_id"], 0) + 1
        cur = want.get(r["user_id"])
        if cur is None or r["ts"] >= cur["ts"]:
            want[r["user_id"]] = r

    assert set(last) == set(want)
    assert sum(seen_counts.values()) == n_total
    for uid, r in last.items():
        assert r["events_seen"] == seen_counts[uid]
        assert r["latest_ts"] == want[uid]["ts"]
    shutil.rmtree(src, ignore_errors=True)
