"""Z-order clustering: bit-interleaved quantile codes → file boundaries
that cut the z-curve, so manifest min/max stats prune files for predicates
on ANY clustered column (linear cluster_by only serves its leading column).
"""

import pytest

from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake import scan
from translator_ingests_spark.lake.maintenance import z_order_by


def ev(lsn, op, repo=None, path=None, commit=None, lang=None, content=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": content, "schema_change": None,
        "source_partition": 0, "source_offset": lsn, "extras": None,
    }


def seed(spark, tmp_path, **kw):
    # two independent 4-value dimensions: repo cycles fast, lang slow —
    # every (repo, lang) combo occurs, so no linear sort serves both
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=1,
                    auto_compact_every=None, **kw)
    events = [
        ev(i, "insert", f"r{i % 4}", f"p{i}", f"c{i}",
           f"l{(i // 4) % 4}", f"v{i}")
        for i in range(64)
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA),
                  events_per_batch=100)
    return eng


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_zorder_preserves_state_and_prunes_both_dims(spark, tmp_path):
    eng = seed(spark, tmp_path)
    before = rows(eng.table.read())
    snap = z_order_by(eng.table, ["repo", "lang"], target_files=4)
    assert snap.operation == "zorder"
    assert rows(eng.table.read()) == before  # pure layout change
    assert len(snap.files) > 1
    # the z-value helper column never reaches disk
    import pyarrow.parquet as pq
    names = set(pq.ParquetFile(snap.files[0]["path"]).schema_arrow.names)
    assert "__zvalue" not in names and "__zsrc_0" not in names
    # predicates on EITHER dimension skip files
    for col, val in (("repo", "r0"), ("repo", "r3"),
                     ("lang", "l0"), ("lang", "l3")):
        kept = scan.prune_files(eng.table, snap, [(col, "=", val)])
        assert len(kept) < len(snap.files), (col, val)
        got = scan.read_where(eng.table, [(col, "=", val)])
        assert got.count() == 16, (col, val)


def test_zorder_guards(spark, tmp_path):
    eng = seed(spark, tmp_path)
    with pytest.raises(ValueError):
        z_order_by(eng.table, ["repo"])  # needs >= 2 columns
    with pytest.raises(ValueError):
        z_order_by(eng.table, ["repo", "nope"])
    with pytest.raises(ValueError):
        z_order_by(eng.table, ["repo", "lang"], bits=32)  # 64 bits > long


def test_zorder_folds_mor_deltas(spark, tmp_path):
    eng = seed(spark, tmp_path, write_mode="mor")
    nxt = [ev(1000, "update", "r1", "p1", "cZ", "l9", "patched")]
    eng.apply_log(spark.createDataFrame(nxt, EVENT_SCHEMA), n_batches=1)
    assert any(f.get("delta") for f in eng.table.current().files)
    snap = z_order_by(eng.table, ["repo", "lang"], target_files=4)
    assert not any(f.get("delta") for f in snap.files)  # net state rewritten
    got = eng.table.read().filter(F.col("path") == "p1").collect()
    assert [r["content"] for r in got] == ["patched"]


def test_zorder_empty_visible_state(spark, tmp_path):
    # every row deleted → approxQuantile has no points for ANY column; the
    # rewrite must still run (degrading to a plain compaction) instead of
    # handing Bucketizer a 2-point splits array. Found by the maintenance-
    # composition property (insert×5 + delete, rebucket, compact_inc, zorder).
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=1,
                    auto_compact_every=None)
    events = [ev(i, "insert", "r0", "a", f"c{i}", "py", f"v{i}")
              for i in range(5)] + [ev(5, "delete", "r0", "a")]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), n_batches=1)
    snap = z_order_by(eng.table, ["repo", "lang"], target_files=2)
    assert snap.operation == "zorder"
    assert eng.table.read().count() == 0


def test_zorder_all_null_column_codes_constant(spark, tmp_path):
    # one clustered column entirely null → no quantile points for it; it
    # codes as a constant and the OTHER column still drives the layout
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=1,
                    auto_compact_every=None)
    events = [ev(i, "insert", f"r{i % 4}", f"p{i}", f"c{i}", None, f"v{i}")
              for i in range(64)]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA), n_batches=1)
    before = rows(eng.table.read())
    snap = z_order_by(eng.table, ["repo", "lang"], target_files=4)
    assert rows(eng.table.read()) == before
    kept = scan.prune_files(eng.table, snap, [("repo", "=", "r0")])
    assert len(kept) < len(snap.files)
    assert scan.read_where(eng.table, [("repo", "=", "r0")]).count() == 16


def test_zorder_numeric_dimension(spark, tmp_path):
    # last_lsn exercises the numeric (non-string) quantile path
    eng = seed(spark, tmp_path)
    snap = z_order_by(eng.table, ["lang", "last_lsn"], target_files=4)
    kept = scan.prune_files(eng.table, snap, [("last_lsn", "<", 8)])
    assert len(kept) < len(snap.files)
    assert scan.read_where(eng.table, [("last_lsn", "<", 8)]).count() == 8
