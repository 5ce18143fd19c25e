"""Hot-key detection fallback (ADVICE r2): the cheap run-wide-average gate
(approx_events) can skip detection for a run whose AVERAGE batch is small,
yet a single skewed batch may still exceed the hot-key threshold — the
engine must then fall back to the authoritative per-batch detector so the
skewed reduce still gets salted."""

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA


def _events(n, repo="mega"):
    return [
        {
            "lsn": i, "op": "insert", "repo": repo, "path": f"p{i}.py",
            "commit": format(i, "040x"), "lang": "py", "content": f"c{i}",
            "schema_change": None, "source_partition": 0, "source_offset": i,
            "extras": None,
        }
        for i in range(n)
    ]


def test_skewed_batch_salted_despite_small_run_average(spark, tmp_path):
    eng = CdcEngine(
        spark,
        str(tmp_path / "cdc"),
        num_buckets=4,
        hot_key_threshold=100,
        hot_sample_fraction=1.0,  # deterministic full count at test size
    )
    eng.init_table()
    batch = spark.createDataFrame(_events(200), EVENT_SCHEMA)
    # approx_events=10 simulates a run whose average batch is far below the
    # threshold (run_hot short-circuit False) while THIS batch holds 200
    # events of one repo — the fallback must detect and salt it
    m = eng._apply_data_unit(batch, unit_id=0, lag_events=200, approx_events=10)
    assert m is not None
    assert m["metrics"]["hot_keys_salted"] == 1
    assert eng.final_state().count() == 200


def test_small_batch_below_threshold_not_salted(spark, tmp_path):
    eng = CdcEngine(
        spark,
        str(tmp_path / "cdc"),
        num_buckets=4,
        hot_key_threshold=100,
        hot_sample_fraction=1.0,
    )
    eng.init_table()
    batch = spark.createDataFrame(_events(50), EVENT_SCHEMA)
    m = eng._apply_data_unit(batch, unit_id=0, lag_events=50, approx_events=10)
    assert m["metrics"]["hot_keys_salted"] == 0
