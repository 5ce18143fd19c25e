"""Structured Streaming front-end: micro-batched tail of an event directory
through foreachBatch into the lake, exactly-once across stream restarts."""

import os

from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA, generate_event_log
from translator_ingests_spark.cdc.oracle import replay_oracle
from translator_ingests_spark.streaming import CdcStream


def _write_event_files(spark, events_rows, src_dir, n_files=4):
    os.makedirs(src_dir, exist_ok=True)
    per = -(-len(events_rows) // n_files)
    for i in range(n_files):
        chunk = events_rows[i * per:(i + 1) * per]
        if not chunk:
            continue
        (
            spark.createDataFrame(chunk, EVENT_SCHEMA)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src_dir}/chunk-{i:03d}")
        )


def test_stream_available_now_matches_oracle(spark, tmp_path):
    events_df = generate_event_log(spark, 1500, seed=21, n_repos=15, paths_per_repo=6)
    rows = [r.asDict(recursive=True) for r in events_df.collect()]
    src = str(tmp_path / "stream_src")
    # write each chunk as its own parquet dir; the file source tails them
    for i in range(3):
        chunk = rows[i * 500:(i + 1) * 500]
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/chunk-{i:03d}"
        )

    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    stream = CdcStream(
        eng,
        source_dir=f"{src}/chunk-*",
        checkpoint_dir=str(tmp_path / "sckpt"),
        max_files_per_trigger=1,
    )
    stream.run_available_now(timeout_sec=300)

    got = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}
    want = replay_oracle(rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"], k
    # multiple epochs committed, manifests recorded
    assert len(stream.manifests) >= 2


def test_stream_restart_is_exactly_once(spark, tmp_path):
    events_df = generate_event_log(spark, 600, seed=23, n_repos=10, paths_per_repo=4)
    rows = [r.asDict(recursive=True) for r in events_df.collect()]
    src = str(tmp_path / "src2")
    for i in range(2):
        chunk = rows[i * 300:(i + 1) * 300]
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/chunk-{i:03d}"
        )

    eng = CdcEngine(spark, str(tmp_path / "cdc2"), num_buckets=4)
    ckpt = str(tmp_path / "sckpt2")
    CdcStream(eng, f"{src}/chunk-*", ckpt, max_files_per_trigger=1).run_available_now(300)
    v1 = eng.table.current().version
    state1 = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}

    # "restart": a new stream over the same checkpoint sees nothing new
    CdcStream(eng, f"{src}/chunk-*", ckpt, max_files_per_trigger=1).run_available_now(300)
    assert eng.table.current().version == v1

    # new data arrives → only it is applied
    extra = [dict(r, lsn=10_000 + i, op="update") for i, r in enumerate(rows[:5])]
    spark.createDataFrame(extra, EVENT_SCHEMA).coalesce(1).write.parquet(
        f"{src}/chunk-999"
    )
    CdcStream(eng, f"{src}/chunk-*", ckpt, max_files_per_trigger=1).run_available_now(300)
    state2 = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}
    changed = {k for k in state2 if k not in state1 or state2[k] != state1[k]}
    assert all(state2[k]["last_lsn"] >= 10_000 for k in changed) and changed


def test_stream_mor_epochs_match_oracle(spark, tmp_path):
    # the foreachBatch path inherits the engine's write_mode: streaming
    # epochs commit as MOR delta files and the folded read serves the state
    events_df = generate_event_log(spark, 900, seed=29, n_repos=10, paths_per_repo=5)
    rows = [r.asDict(recursive=True) for r in events_df.collect()]
    src = str(tmp_path / "mor_src")
    for i in range(3):
        chunk = rows[i * 300:(i + 1) * 300]
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/chunk-{i:03d}"
        )
    eng = CdcEngine(spark, str(tmp_path / "mor_cdc"), num_buckets=4,
                    write_mode="mor", auto_compact_every=None)
    CdcStream(
        eng, source_dir=f"{src}/chunk-*",
        checkpoint_dir=str(tmp_path / "mor_ckpt"),
        max_files_per_trigger=1,
    ).run_available_now(timeout_sec=300)
    assert any(f.get("delta") for f in eng.table.current().files)
    got = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}
    want = replay_oracle(rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"], k


def test_stream_partial_updates_epoch(spark, tmp_path):
    # partial mode through the streaming epoch path: a later chunk patches
    # one column; the folded-in target value survives
    rows = [
        {"lsn": 0, "op": "insert", "repo": "r", "path": "a", "commit": "c0",
         "lang": "py", "content": "v0", "schema_change": None,
         "source_partition": 0, "source_offset": 0, "extras": None},
        {"lsn": 1, "op": "update", "repo": "r", "path": "a", "commit": None,
         "lang": "go", "content": None, "schema_change": None,
         "source_partition": 0, "source_offset": 1, "extras": None},
    ]
    src = str(tmp_path / "ppart")
    for i, chunk in enumerate([rows[:1], rows[1:]]):
        spark.createDataFrame(chunk, EVENT_SCHEMA).coalesce(1).write.parquet(
            f"{src}/chunk-{i:03d}"
        )
    eng = CdcEngine(spark, str(tmp_path / "ppart_cdc"), num_buckets=4,
                    partial_updates=True, auto_compact_every=None)
    CdcStream(
        eng, source_dir=f"{src}/chunk-*",
        checkpoint_dir=str(tmp_path / "ppart_ckpt"),
        max_files_per_trigger=1,
    ).run_available_now(timeout_sec=300)
    row = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}[("r", "a")]
    assert row["lang"] == "go" and row["content"] == "v0" and row["last_lsn"] == 1
