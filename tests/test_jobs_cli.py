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


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north-rule packaging path for real: `spark-submit --py-files
    <zip> jobs/apply_log_job.py` as a SUBPROCESS — executors import the
    engine from the zip, not the repo checkout. Asserts the committed-batch
    JSON line and the replay-validation gate (rc 0 implies sha256/lineage/
    duplicate-key checks all passed inside the job)."""
    import os
    import shutil
    import subprocess
    import sys

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = tmp_path / "engine.zip"
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "make_pyfiles.py"),
         str(zip_path)],
        check=True, cwd=repo)
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         os.path.join(repo, "jobs", "apply_log_job.py"),
         "--events", "5000", "--table-root", str(tmp_path / "lake"),
         "--batches", "2", "--buckets", "8", "--validate"],
        cwd=str(tmp_path),  # NOT the repo root: the zip must satisfy imports
        capture_output=True, text=True, timeout=240)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    applied = [l for l in lines if l.get("events_applied")]
    assert applied and applied[0]["events_applied"] == 5000
    assert applied[0]["batches_committed"] == 2
    validated = [l for l in lines if "validation" in l]
    assert validated and validated[0]["validation"]["passed"] is True
