"""Replay-validation job: the QA gate run after (or during) ingestion.

Reference analog: the pipeline's hard validation gate
(/root/reference/src/translator_ingest/util/validate_biolink_kgx.py:280-390,
abort on fail at pipeline.py:669-672) — re-expressed as Spark queries over
the final lake table and the checkpoint manifests:

1. **content invariant**: every visible row's stored ``content_sha256``
   equals a recomputation from ``content`` (the per-row replay invariant);
2. **key uniqueness**: (repo, path) is unique in the visible state;
3. **lineage integrity**: per-source-partition offset ranges never overlap
   across committed batches, and manifest row counts reconcile;
4. **watermark sanity**: every visible row's last_lsn lies within the
   applied LSN range recorded by the manifests.

Returns a report dict; ``gate()`` raises on any failure (the pipeline-abort
behavior).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from translator_ingests_spark.cdc.apply import CdcEngine


def validate_engine_state(engine: CdcEngine) -> dict:
    state = engine.final_state()
    manifests = engine.manifests()

    agg = state.select(
        F.count(F.lit(1)).alias("rows"),
        F.count(
            F.when(F.sha2(F.col("content"), 256) != F.col("content_sha256"), 1)
        ).alias("sha_mismatches"),
        F.count(F.when(F.col("content_sha256").isNull(), 1)).alias("null_digests"),
        F.countDistinct("repo", "path").alias("distinct_keys"),
        F.min("last_lsn").alias("lsn_min"),
        F.max("last_lsn").alias("lsn_max"),
    ).collect()[0]  # bounded-collect: one aggregate row

    report: dict = {
        "rows": agg["rows"],
        "sha_mismatches": agg["sha_mismatches"],
        "null_digests": agg["null_digests"],
        "duplicate_keys": agg["rows"] - agg["distinct_keys"],
        "batches": len(manifests),
        "lineage_overlaps": 0,
        "lineage_row_mismatch": 0,
        "rows_outside_applied_lsn": 0,
    }

    # lineage: per source partition, offset *ranges* across batches must not
    # overlap — valid only for in-order delivery, where each batch consumes a
    # contiguous offset window. Under scatter delivery each batch holds an
    # arbitrary offset subset, so spans legitimately interleave: those
    # batches are excluded from the range check (their exactly-once property
    # is enforced by the batch-id replay guard, covered by the redelivery
    # scenario tests) and surfaced in ``scatter_batches``.
    by_partition: dict = {}
    report["scatter_batches"] = 0
    report["redelivered_batches"] = 0
    for m in manifests:
        delivery = m.get("delivery", "in_order")
        in_order = delivery == "in_order"
        if delivery == "redelivered":
            # boundary-redelivery units legitimately overlap earlier offset
            # windows; count them under their own label instead of
            # mislabeling them as scatter delivery
            report["redelivered_batches"] += 1
        elif not in_order:
            report["scatter_batches"] += 1
        for d in m["per_partition_lineage"]:
            if in_order:
                by_partition.setdefault(d["partition"], []).append(
                    (d["offset_min"], d["offset_max"], d["rows"])
                )
        ev_in = m["metrics"]["events_in"]
        lineage_rows = sum(d["rows"] for d in m["per_partition_lineage"])
        if lineage_rows + m["metrics"].get("invalid_events", 0) != ev_in:
            report["lineage_row_mismatch"] += 1
    for spans in by_partition.values():
        spans.sort()
        for (a_lo, a_hi, _), (b_lo, b_hi, _) in zip(spans, spans[1:]):
            if b_lo <= a_hi:
                report["lineage_overlaps"] += 1

    if manifests and agg["rows"]:
        lo = min(m["applied_lsn_min"] for m in manifests)
        hi = max(m["applied_lsn_max"] for m in manifests)
        outside = state.filter(
            (F.col("last_lsn") < lo) | (F.col("last_lsn") > hi)
        ).count()
        report["rows_outside_applied_lsn"] = outside

    report["passed"] = (
        report["sha_mismatches"] == 0
        and report["null_digests"] == 0
        and report["duplicate_keys"] == 0
        and report["lineage_overlaps"] == 0
        and report["lineage_row_mismatch"] == 0
        and report["rows_outside_applied_lsn"] == 0
    )
    return report


def gate(engine: CdcEngine) -> dict:
    """Validation as a hard gate: raise on failure (pipeline-abort shape)."""
    report = validate_engine_state(engine)
    if not report["passed"]:
        raise AssertionError(f"replay validation failed: {report}")
    return report
