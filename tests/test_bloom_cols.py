"""Parquet-native bloom filters on configured columns: executor-side
row-group skipping for point/IN predicates on high-cardinality columns
(commit hashes) whose per-file min/max range spans the whole domain — the
layer below manifest file skipping. The table config opts columns in once;
every writer (merge, compaction, z-order, DML rewrite) applies it.

pyarrow 16 cannot surface bloom offsets from footers, so presence is
asserted the way it manifests physically: byte-identical data written with
and without the config differs by the serialized filter's size.
"""

import os

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake.maintenance import compact


def ev(lsn, op, repo=None, path=None, commit=None, lang=None, content=None):
    return {
        "lsn": lsn, "op": op, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": content, "schema_change": None,
        "source_partition": 0, "source_offset": lsn, "extras": None,
    }


def seed(spark, root, **kw):
    eng = CdcEngine(spark, root, num_buckets=2, auto_compact_every=None, **kw)
    events = [
        ev(i, "insert", "r0", f"p{i}", f"{i:040x}", "py", f"v{i}")
        for i in range(200)
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA),
                  events_per_batch=1000)
    return eng


def data_bytes(snap):
    return sum(os.path.getsize(f["path"]) for f in snap.files)


def test_bloom_config_grows_files_and_point_reads_stay_correct(spark, tmp_path):
    plain = seed(spark, str(tmp_path / "plain"))
    bloom = seed(spark, str(tmp_path / "bloom"),
                 bloom_cols={"commit": 1000})
    delta = data_bytes(bloom.table.current()) - data_bytes(plain.table.current())
    # parquet-mr serializes ~13 bits/expected-value: >= 1 KiB per data file
    assert delta >= 1024 * len(bloom.table.current().files)
    target = f"{7:040x}"
    got = bloom.table.read().filter(f"commit = '{target}'").collect()
    assert len(got) == 1 and got[0]["path"] == "p7"


def test_bloom_survives_compaction_rewrite(spark, tmp_path):
    plain = seed(spark, str(tmp_path / "plain"))
    bloom = seed(spark, str(tmp_path / "bloom"), bloom_cols=["commit"])
    ps = compact(plain.table, target_files=1)
    bs = compact(bloom.table, target_files=1)
    assert data_bytes(bs) - data_bytes(ps) >= 1024
    assert bloom.table.read().count() == 200


def test_bloom_rejects_unknown_column(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        seed(spark, str(tmp_path / "bad"), bloom_cols=["nope"])


def test_write_options_reach_every_writer(spark, tmp_path):
    # generic writer passthrough: the codec choice (zstd — the 100-TB
    # storage/scan-I/O trade) applies to merge writes AND maintenance
    # rewrites, proven from the parquet footers
    import pyarrow.parquet as pq

    eng = seed(spark, str(tmp_path / "z"),
               write_options={"parquet.compression": "zstd"})

    def codecs(snap):
        out = set()
        for f in snap.files:
            md = pq.ParquetFile(f["path"]).metadata
            out.add(md.row_group(0).column(0).compression)
        return out

    assert codecs(eng.table.current()) == {"ZSTD"}
    assert codecs(compact(eng.table, target_files=1)) == {"ZSTD"}
    assert eng.table.read().count() == 200
