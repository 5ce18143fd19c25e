"""Write-audit-publish (WAP): stage commits invisibly, validate, then
atomically publish or roll back — the Iceberg WAP / Delta shallow-clone
audit pattern over this table's linear snapshot chain.

Mechanics (no new commit machinery — the fence and pointer heal are
untouched):

- a handle with ``table.staged_writes = True`` (or
  ``CdcEngine(staged=True)``) commits every snapshot behind a ``.staged``
  marker file created BEFORE the commit fence, so the snapshot is staged
  from the first instant it exists;
- the writer plane (merge, schema evolution, DML, maintenance) builds on
  ``head()`` — staged units stack exactly like published ones, auto-
  compaction included — while the reader plane (``current()``, ``read``,
  point lookup, change-feed consumers) walks markers back to the newest
  published snapshot;
- :func:`publish_staged` removes markers OLDEST-FIRST, so the published
  set is a prefix of the chain at every instant — a crash mid-publish
  leaves a shorter, still-consistent prefix published and a re-run
  finishes the job (idempotent);
- :func:`rollback_staged` commits a NEW published snapshot that reproduces
  the published state's content on top of the staged head (history stays
  linear for the pointer heal; the rejected snapshots remain as dead chain
  links until ``expire_snapshots``). ``last_batch_id`` reverts with it, so
  the exactly-once guard lets the corrected batch re-apply.

The audit itself is whatever the caller runs between apply and publish —
typically the validation report (cdc/report.py) or a referential-integrity
check over ``read_staged``.

Reference anchor: the reference validates each ingest's output and only
then publishes the release artifact
(/root/reference/src/translator_ingest/util/storage/release.py:20-48);
WAP is that gate made transactional at the table layer.
"""

from __future__ import annotations

import os
from dataclasses import replace

from pyspark.sql import DataFrame

from translator_ingests_spark.lake.table import LakeTable, Snapshot


def staged_versions(table: LakeTable) -> list[int]:
    """The staged suffix of the chain, oldest first (empty when nothing is
    staged). O(chain length) small JSON reads, no data I/O."""
    out: list[int] = []
    snap = table.head()
    while snap.parent is not None and table.is_staged(snap.version):
        out.append(snap.version)
        snap = table.snapshot_at(snap.parent)
    out.reverse()
    return out


def read_staged(table: LakeTable) -> DataFrame:
    """The audit's view: the visible state INCLUDING staged commits — what
    ``read()`` would serve after publish."""
    snap = table.head()
    return table._visible(table._net_raw(snap, snap.files), snap)


def publish_staged(table: LakeTable) -> Snapshot:
    """Make every staged snapshot visible to readers. Markers drop
    oldest-first so concurrent readers only ever see a published PREFIX of
    the chain; idempotent, crash-resumable. Returns the new published
    current."""
    for v in staged_versions(table):
        try:
            os.remove(table._staged_marker_path(v))
        except FileNotFoundError:
            pass  # already published by a concurrent/crashed publisher
    return table.current()


def rollback_staged(table: LakeTable) -> Snapshot:
    """Discard the staged suffix: commit a published snapshot reproducing
    the published state's CONTENT on top of the staged head. Readers never
    flicker (they were serving that state all along); the writer plane's
    ``head()`` lands on the rollback, so the next batch re-derives
    ``last_batch_id`` from the reverted value and the corrected data can
    re-apply under the same unit ids. No-op when nothing is staged."""
    from translator_ingests_spark.lake.table import CommitConflictError

    last_err: Exception | None = None
    for _ in range(5):
        head = table.head()
        pub = table.current()
        if head.version == pub.version:
            return pub
        new_snap = replace(
            pub,
            version=head.version + 1,
            parent=head.version,
            batch_id=None,
            files=list(pub.files),
            lineage={},
            metrics={},
            operation="rollback",
        )
        try:
            table._commit_snapshot(new_snap, staged=False)
            return new_snap
        except CommitConflictError as err:
            # a racing staged writer extended the chain mid-rollback. A
            # rebase would be WRONG here (the rollback's entire content is
            # "the published file list", not a splice onto the new head) —
            # recompute from the fresh head so the revert also covers the
            # racer's unit, which stacked on state this call is discarding.
            last_err = err
    raise last_err
