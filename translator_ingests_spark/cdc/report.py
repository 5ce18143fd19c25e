"""Row-level declarative validation report — the QA gate's human-facing
output.

Reference analog: the biolink-KGX validator's structured report
(/root/reference/src/translator_ingest/util/validate_biolink_kgx.py:226-261):
per-rule PASS/FAIL with violation counts and *example violating rows capped
at 100 per rule*, plus a ``truncated`` flag — the thing a human debugs from.

Spark-first shape:

- :func:`rule_counts` — ALL rule counts in ONE single-pass aggregation
  (``sum(when(pred, 1))`` per rule, map-side combinable), then an unpivot of
  the single result row into one row per rule. O(rules) output, never
  O(rows) on the driver.
- :func:`rule_examples` — ONE job for every failed rule's examples: rows are
  tagged with their violated-rule array, exploded, filtered to violations
  only (rare by construction), then capped with a per-rule row_number
  window. The window shuffles only the violating rows.
- :func:`validation_report` — the JSON artifact in the reference's shape.

Rules are plain (name, severity, Column-predicate) declarations; the
predicate marks a VIOLATION (true = bad) and must be null-safe.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

MAX_EXAMPLES = 100


@dataclass(frozen=True)
class Rule:
    name: str
    severity: str  # "ERROR" | "WARNING"
    violation: Column  # true => row violates the rule
    message: str = ""


def default_rules() -> list[Rule]:
    """Declarative row-level rules for the lake table's visible state
    (repo, path, commit, lang, content, content_sha256, last_lsn)."""
    digest = F.col("content_sha256")
    return [
        Rule(
            "key_not_null",
            "ERROR",
            F.col("repo").isNull() | F.col("path").isNull(),
            "primary key (repo, path) must be non-null",
        ),
        Rule(
            "digest_matches_content",
            "ERROR",
            F.col("content").isNotNull()
            & digest.isNotNull()
            & (F.sha2(F.col("content"), 256) != digest),
            "stored content_sha256 must equal sha256(content)",
        ),
        Rule(
            "digest_wellformed",
            "ERROR",
            digest.isNull() | ~digest.rlike("^[0-9a-f]{64}$"),
            "content_sha256 must be 64 lowercase hex chars",
        ),
        Rule(
            "commit_wellformed",
            "ERROR",
            F.col("commit").isNull() | ~F.col("commit").rlike("^[0-9a-f]{40}$"),
            "commit must be a 40-hex git sha",
        ),
        Rule(
            "lsn_nonnegative",
            "ERROR",
            F.col("last_lsn").isNull() | (F.col("last_lsn") < 0),
            "applied LSN must be present and non-negative",
        ),
        Rule(
            "content_nonempty",
            "WARNING",
            F.col("content").isNull() | (F.length("content") == 0),
            "visible rows should carry content",
        ),
        Rule(
            "lang_present",
            "WARNING",
            F.col("lang").isNull() | (F.col("lang") == ""),
            "lang metadata should be populated",
        ),
    ]


def rule_counts(df: DataFrame, rules: list[Rule] | None = None) -> DataFrame:
    """One row per rule: (rule, severity, n_violations, status). Single
    aggregation pass over ``df`` — every rule folds into the same map-side
    combine; the unpivot happens on the 1-row aggregate."""
    rules = default_rules() if rules is None else rules
    agg = df.agg(
        *[
            F.sum(F.when(r.violation, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(r.name)
            for r in rules
        ]
    )
    stack_args = ", ".join(f"'{r.name}', '{r.severity}', `{r.name}`" for r in rules)
    return (
        agg.select(
            F.expr(
                f"stack({len(rules)}, {stack_args}) AS (rule, severity, n_violations)"
            )
        )
        .withColumn("n_violations", F.coalesce(F.col("n_violations"), F.lit(0)).cast("long"))
        .withColumn(
            "status",
            F.when(F.col("n_violations") == 0, F.lit("PASS")).otherwise(F.lit("FAIL")),
        )
        .orderBy("rule")
    )


def rule_examples(
    df: DataFrame,
    rules: list[Rule] | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    max_examples: int = MAX_EXAMPLES,
) -> DataFrame:
    """Capped example violating rows: (rule, severity, <key_cols...>,
    example_rank). ONE job: tag each row with its violated-rule array, explode,
    filter to violations, then row_number per rule — only violating rows
    (rare) reach the window shuffle."""
    rules = default_rules() if rules is None else rules
    tagged = df.select(
        *key_cols,
        F.array_compact(
            F.array(
                *[
                    F.when(r.violation, F.struct(F.lit(r.name).alias("rule"), F.lit(r.severity).alias("severity")))
                    for r in rules
                ]
            )
        ).alias("__violated"),
    )
    exploded = (
        tagged.filter(F.size("__violated") > 0)
        .select(*key_cols, F.explode("__violated").alias("v"))
        .select(F.col("v.rule").alias("rule"), F.col("v.severity").alias("severity"), *key_cols)
    )
    w = Window.partitionBy("rule").orderBy(*[F.col(c) for c in key_cols])
    return (
        exploded.withColumn("example_rank", F.row_number().over(w))
        .filter(F.col("example_rank") <= max_examples)
        .orderBy("rule", "example_rank")
    )


def validation_report(
    df: DataFrame,
    rules: list[Rule] | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    max_examples: int = MAX_EXAMPLES,
) -> dict:
    """The reference-shaped report dict: per-rule status + counts, example
    violating keys capped at ``max_examples`` per rule, truncation flag.
    Driver-side size is O(rules × max_examples) regardless of table size."""
    rules = default_rules() if rules is None else rules
    by_name = {r.name: r for r in rules}
    counts = [r.asDict() for r in rule_counts(df, rules).collect()]  # bounded-collect: one row per validation rule
    failed = [c["rule"] for c in counts if c["status"] == "FAIL"]
    examples: dict[str, list] = {name: [] for name in failed}
    if failed:
        failed_rules = [by_name[n] for n in failed]
        for row in rule_examples(df, failed_rules, key_cols, max_examples).collect():  # bounded-collect: <= rules x max_examples rows
            d = row.asDict()
            examples[d["rule"]].append({c: d[c] for c in key_cols})
    issues = {
        "errors": [c for c in counts if c["status"] == "FAIL" and c["severity"] == "ERROR"],
        "warnings": [c for c in counts if c["status"] == "FAIL" and c["severity"] == "WARNING"],
        "examples": examples,
        "truncated": any(
            c["n_violations"] > max_examples for c in counts if c["status"] == "FAIL"
        ),
    }
    n_err = sum(c["n_violations"] for c in issues["errors"])
    return {
        "rules": counts,
        "statistics": {
            "rules_evaluated": len(rules),
            "rules_failed": len(failed),
            "total_error_violations": int(n_err),
            "max_examples_per_rule": max_examples,
            "messages": {r.name: r.message for r in rules},
        },
        "issues": issues,
        "validation_status": "PASSED" if n_err == 0 else "FAILED",
    }


def write_validation_report(report: dict, out_path: str) -> str:
    """Atomically publish the report artifact (tmp + rename, the same
    publish discipline as the lake's snapshot commit)."""
    tmp = f"{out_path}.tmp.{uuid.uuid4().hex}"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(report, fh, default=str)
    os.replace(tmp, out_path)
    return out_path
