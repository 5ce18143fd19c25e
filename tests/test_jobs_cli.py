"""spark-submit job entrypoints driven in-process: the maintenance job's
commands print one JSON line per invocation and mutate the table through
the same library paths the unit tests cover — here we assert the CLI
wiring itself (argument parsing, JSON contract, --preds stat-pruned DML).
"""

import json

import pytest

from jobs.maintenance_job import main as maint_main
from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA


def seed(spark, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "t"), num_buckets=4,
                    auto_compact_every=None)
    events = [
        {"lsn": i, "op": "insert", "repo": f"r{i % 2}", "path": f"p{i}",
         "commit": f"c{i}", "lang": "py" if i % 3 else "java",
         "content": f"v{i}", "schema_change": None,
         "source_partition": 0, "source_offset": i, "extras": None}
        for i in range(12)
    ]
    eng.apply_log(spark.createDataFrame(events, EVENT_SCHEMA),
                  events_per_batch=100)
    return eng


def run(capsys, *argv):
    rc = maint_main(list(argv))
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_maintenance_job_roundtrip(spark, tmp_path, capsys):
    eng = seed(spark, tmp_path)
    root = str(tmp_path / "t" / "lake")

    out = run(capsys, "--table-root", root, "delete-where",
              "--preds", json.dumps([["lang", "=", "java"]]),
              "--at-lsn", "1000")
    assert out["operation"] == "delete"
    assert eng.table.read().filter("lang = 'java'").count() == 0

    out = run(capsys, "--table-root", root, "update-where",
              "--predicate", "lang = 'py'",
              "--preds", json.dumps([["repo", "=", "r1"]]),
              "--set", "content=concat('seen:', path)", "--at-lsn", "2000")
    assert out["operation"] == "update"
    got = {r["path"]: r["content"] for r in eng.table.read().collect()}
    assert got["p1"] == "seen:p1" and got["p2"] == "v2"

    out = run(capsys, "--table-root", root, "zorder",
              "--cols", "repo,lang", "--target-files", "2")
    assert out["operation"] == "zorder"

    out = run(capsys, "--table-root", root, "compact")
    assert out["cmd"] == "compact"
    out = run(capsys, "--table-root", root, "expire", "--keep-last", "1")
    assert out["snapshots_removed"] >= 0


def test_apply_job_staged_validate_publishes(spark, tmp_path, capsys):
    from jobs.apply_log_job import main as apply_main
    from translator_ingests_spark.lake.table import LakeTable

    root = str(tmp_path / "aj")
    rc = apply_main(["--events", "1000", "--table-root", root,
                     "--batches", "2", "--buckets", "4",
                     "--staged", "--validate"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"published"' in out
    t = LakeTable(spark, root + "/lake")
    # validation passed → staged units were published, nothing left staged
    assert t.current().version == t.head().version
    assert not t.is_staged(t.head().version)
    assert t.read().count() > 0


def test_maintenance_job_requires_some_predicate(spark, tmp_path, capsys):
    seed(spark, tmp_path)
    with pytest.raises(SystemExit):
        maint_main(["--table-root", str(tmp_path / "t"),
                    "delete-where", "--at-lsn", "10"])


def test_maintenance_job_derived_commands(spark, tmp_path, capsys):
    eng = seed(spark, tmp_path)
    root = str(tmp_path / "t" / "lake")
    rep_root = str(tmp_path / "replica")
    cur_dir = str(tmp_path / "cursor")

    out = run(capsys, "--table-root", root, "sync-replica",
              "--replica-root", rep_root, "--cursor-dir", cur_dir)
    assert out["operation"] == "sync_replica" and out["batches_applied"] == 1
    from translator_ingests_spark.lake.table import LakeTable
    dst = LakeTable(spark, rep_root)
    assert dst.read().count() == eng.table.read().count()

    # second run with nothing new: zero batches, still rc 0
    out = run(capsys, "--table-root", root, "sync-replica",
              "--replica-root", rep_root, "--cursor-dir", cur_dir)
    assert out["batches_applied"] == 0

    out = run(capsys, "--table-root", root, "refresh-agg",
              "--agg-root", str(tmp_path / "agg"),
              "--group-cols", "repo", "--sum", "sum_lsn=last_lsn")
    assert out["operation"] == "refresh_agg"
    assert out["groups"] == 2  # r0, r1

    # max/min specs route through the affected-group recompute strategy
    out = run(capsys, "--table-root", root, "refresh-agg",
              "--agg-root", str(tmp_path / "agg2"),
              "--group-cols", "repo", "--sum", "sum_lsn=last_lsn",
              "--max", "max_path=path", "--min", "min_lsn=last_lsn",
              "--no-auto-strategy")
    assert out["operation"] == "refresh_agg"
    assert out["groups"] == 2
