"""Row-level declarative validation report (reference QA gate shape:
/root/reference/src/translator_ingest/util/validate_biolink_kgx.py:226-261):
per-rule PASS/FAIL counts in one aggregation pass, example violating rows
capped at 100 per rule, truncation flag, atomic artifact publish."""

import hashlib
import json
import os

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.cdc.report import (
    rule_counts,
    rule_examples,
    validation_report,
    write_validation_report,
)

_SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    "content_sha256 string, last_lsn long"
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _dirty_rows():
    good = ("org/a", "f0.py", "a" * 40, "py", "hello", _sha("hello"), 1)
    bad_digest = ("org/a", "f1.py", "b" * 40, "py", "text", "0" * 64, 2)
    null_path = ("org/a", None, "c" * 40, "py", "x", _sha("x"), 3)
    empty_content = ("org/b", "f2.py", "d" * 40, "py", "", _sha(""), 4)
    no_lang = ("org/b", "f3.py", "e" * 40, None, "y", _sha("y"), 5)
    bad_commit = ("org/b", "f4.py", "not-a-sha", "py", "z", _sha("z"), 6)
    neg_lsn = ("org/c", "f5.py", "f" * 40, "py", "w", _sha("w"), -1)
    return [good, bad_digest, null_path, empty_content, no_lang, bad_commit, neg_lsn]


def test_rule_counts_single_pass(spark):
    df = spark.createDataFrame(_dirty_rows(), _SCHEMA)
    got = {r["rule"]: (r["n_violations"], r["status"]) for r in rule_counts(df).collect()}
    assert got["key_not_null"] == (1, "FAIL")
    assert got["digest_matches_content"] == (1, "FAIL")
    assert got["commit_wellformed"] == (1, "FAIL")
    assert got["lsn_nonnegative"] == (1, "FAIL")
    assert got["content_nonempty"] == (1, "FAIL")
    assert got["lang_present"] == (1, "FAIL")
    # digest_wellformed: the bad digest is 64 hex zeros — well-formed
    assert got["digest_wellformed"] == (0, "PASS")


def test_examples_capped_and_truncated(spark):
    # 150 rows all violating lang_present -> examples cap at 100, flag set
    rows = [
        ("org/a", f"f{i}.py", "a" * 40, None, "t", _sha("t"), i) for i in range(150)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    ex = rule_examples(df).collect()
    by_rule: dict = {}
    for r in ex:
        by_rule.setdefault(r["rule"], []).append(r)
    assert len(by_rule["lang_present"]) == 100
    # deterministic order: ranked by key
    assert [r["example_rank"] for r in by_rule["lang_present"]] == list(range(1, 101))

    rep = validation_report(df)
    assert rep["validation_status"] == "PASSED"  # only WARNING rules fail
    assert rep["issues"]["truncated"] is True
    assert len(rep["issues"]["examples"]["lang_present"]) == 100


def test_report_shape_and_artifact(spark, tmp_path):
    df = spark.createDataFrame(_dirty_rows(), _SCHEMA)
    rep = validation_report(df)
    assert rep["validation_status"] == "FAILED"
    assert rep["statistics"]["rules_failed"] == 6
    err_rules = {e["rule"] for e in rep["issues"]["errors"]}
    assert err_rules == {
        "key_not_null",
        "digest_matches_content",
        "commit_wellformed",
        "lsn_nonnegative",
    }
    # every failed rule carries concrete example keys
    assert rep["issues"]["examples"]["digest_matches_content"] == [
        {"repo": "org/a", "path": "f1.py"}
    ]
    out = str(tmp_path / "qa" / "validation_report.json")
    write_validation_report(rep, out)
    assert json.load(open(out))["validation_status"] == "FAILED"
    assert not [p for p in os.listdir(os.path.dirname(out)) if ".tmp." in p]


def test_clean_engine_state_passes(spark, tmp_path):
    """The gate over a genuinely-replayed lake state: everything PASSes."""
    ev = [
        {
            "lsn": i,
            "op": "insert",
            "repo": "org/r",
            "path": f"p{i}.py",
            "commit": hashlib.sha1(str(i).encode()).hexdigest(),
            "lang": "py",
            "content": f"body {i}",
            "schema_change": None,
            "source_partition": 0,
            "source_offset": i,
            "extras": None,
        }
        for i in range(20)
    ]
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    eng.apply_log(spark.createDataFrame(ev, EVENT_SCHEMA), events_per_batch=10)
    rep = validation_report(eng.final_state())
    assert rep["validation_status"] == "PASSED"
    assert all(r["status"] == "PASS" for r in rep["rules"])
