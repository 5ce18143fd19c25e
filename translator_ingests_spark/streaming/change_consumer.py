"""Checkpointed incremental consumption of a lake table's change feed —
the Delta CDF / Iceberg incremental-read analog for DOWNSTREAM jobs.

The ingest side (`cdc/apply.py`) writes snapshots; a downstream pipeline
(index build, aggregate refresh, replication) wants each commit's net row
changes exactly once. :class:`ChangesConsumer` tracks a per-consumer cursor
(last fully processed snapshot version) in its own checkpoint file and
serves `table.changes(cursor, current)` batches:

- cost per poll ∝ buckets rewritten between the two versions (the change
  feed's manifest pruning), never table size;
- the cursor advances only after the caller's process function returns, so
  a crash replays the pending range — at-least-once delivery, upgraded to
  exactly-once by idempotent sinks exactly like the ingest side's batch-id
  guard (the batch is keyed by ``(v_from, v_to]`` for the sink to dedup on).
  CAVEAT for stateful sinks: the replayed poll targets the head AT REPLAY
  TIME, i.e. a crash between the sink's write and the cursor commit
  redelivers a net diff over a MOVED window ``(v_from, v_to']`` with
  ``v_to' ≥ v_to`` — NOT the same batch. Row-level LWW makes the overlap
  value-stable, but a net diff is not idempotent under a moved endpoint: an
  insert→delete lifecycle contained in the wider window cancels to nothing,
  so the crashed window's already-written insert would never be retracted.
  A sink that records the last applied ``v_to`` (e.g. a lake table's
  ``last_batch_id``) must treat that record as the authoritative cursor and
  fast-forward the consumer to it before polling — see
  ``lake.derived.sync_replica`` / ``IncrementalAggregate.refresh``;
- a cursor older than the table's retained history (GC'd snapshot) raises
  :class:`CursorExpiredError` — the consumer must rebuild from a full read,
  the Kafka offset-out-of-range analog. By default the consumer prevents
  this itself: ``pin_retention=True`` registers the cursor in the SOURCE
  table's retention registry (:func:`lake.refs.register_cursor`) on every
  bootstrap/commit, and ``expire_snapshots`` keeps registered cursor
  snapshots alive (bounded by its ``max_cursor_lag``) — so the ingest
  side's auto-expiry cadence (``CdcEngine.auto_expire_every``) no longer
  has to be hand-coordinated with the slowest consumer's lag.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from translator_ingests_spark.lake.table import LakeTable, _atomic_write_json


class CursorExpiredError(RuntimeError):
    """The consumer's cursor snapshot has been expired by GC; incremental
    reads can no longer be served and the consumer must re-bootstrap."""


class ChangesConsumer:
    def __init__(
        self,
        table: LakeTable,
        checkpoint_dir: str,
        name: str = "consumer",
        include_preimage: bool = False,
        columns: list[str] | None = None,
        pin_retention: bool = True,
    ):
        self.table = table
        self.name = name
        # register the cursor as a retention pin in the source table so GC
        # (expire_snapshots) keeps the snapshot this consumer will diff
        # FROM on its next poll; names must be unique per table — two
        # consumers sharing a name would clobber each other's pins
        self.pin_retention = pin_retention
        # preimage rows (``_change_type='update_preimage'``) make batches
        # subtractable — what incremental aggregate maintenance needs
        # (lake/derived.py); plain replication leaves this off
        self.include_preimage = include_preimage
        # projection-scoped feed: prune scans + diff to key cols + these
        # columns; a key changed only outside them does not emit
        self.columns = list(columns) if columns is not None else None
        # the name doubles as the local cursor filename AND the retention-pin
        # registry key: validate it BEFORE any file is written, so a name
        # with a path separator can neither escape checkpoint_dir here nor
        # fail register_cursor only after _advance persisted the local file
        from translator_ingests_spark.lake.refs import _check_cursor_name

        _check_cursor_name(name)
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._cursor_path = os.path.join(checkpoint_dir, f"{name}.cursor.json")

    # -- cursor --------------------------------------------------------------
    def position(self) -> int | None:
        """Last fully processed snapshot version; None before bootstrap."""
        if not os.path.exists(self._cursor_path):
            return None
        with open(self._cursor_path) as fh:
            return json.load(fh)["version"]

    def _advance(self, version: int) -> None:
        _atomic_write_json(self._cursor_path, {"version": version})
        if self.pin_retention:
            from translator_ingests_spark.lake.refs import register_cursor

            # racing GC window: the local cursor is durable before the pin
            # lands, so a concurrent expire between the two writes can at
            # worst expire THIS version once — the consumer then re-bootstraps
            # (at-least-once contract unchanged); every later poll is pinned.
            # A version already expired by that race fails register's
            # existence check — skip: the pin would protect nothing.
            try:
                register_cursor(self.table, self.name, version)
            except FileNotFoundError:
                pass

    # -- consumption ---------------------------------------------------------
    def bootstrap(self) -> DataFrame:
        """Initial full state; positions the cursor at the snapshot served,
        so the next poll is incremental from here."""
        snap = self.table.current()
        df = self.table.read_at(snap.version)
        self._advance(snap.version)
        return df

    def poll(self) -> tuple[DataFrame, int, int] | None:
        """Changes since the cursor up to the current snapshot, as
        ``(changes_df, v_from, v_to)`` — or None when already caught up.
        Does NOT advance the cursor; call :meth:`commit` (or use
        :meth:`process_available`) after the batch is durably handled."""
        pos = self.position()
        if pos is None:
            raise RuntimeError("consumer has no cursor; call bootstrap() first")
        cur = self.table.current().version
        if cur <= pos:
            return None
        try:
            self.table.snapshot_at(pos)
        except FileNotFoundError as e:
            raise CursorExpiredError(
                f"cursor v{pos} expired from table history; re-bootstrap"
            ) from e
        return (
            self.table.changes(
                pos,
                cur,
                include_preimage=self.include_preimage,
                columns=self.columns,
            ),
            pos,
            cur,
        )

    def commit(self, version: int) -> None:
        """Mark everything up to ``version`` processed. Refuses to move the
        cursor backwards (a late commit of an old poll after a newer one)."""
        pos = self.position()
        if pos is not None and version < pos:
            raise ValueError(f"cursor may not regress: {version} < {pos}")
        self._advance(version)

    def process_available(self, fn) -> int:
        """Drain all pending changes through ``fn(changes_df, v_from, v_to)``,
        committing after each successful call (one table commit may be
        coalesced with later ones into a single batch — net semantics).
        Returns the number of batches processed."""
        n = 0
        while True:
            try:
                batch = self.poll()
            except CursorExpiredError as e:
                # report partial progress: batches already applied AND
                # committed before the cursor expired mid-drain — heal paths
                # (lake/derived.py) add it to their returned batch count
                e.batches_done = n
                raise
            if batch is None:
                return n
            df, v_from, v_to = batch
            fn(df, v_from, v_to)
            self.commit(v_to)
            n += 1
