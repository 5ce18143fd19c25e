"""Predicate-pruned lake scans: manifest column statistics → file skipping.

The manifest records per-file min/max for every primitive user column
(``_file_stats_from_footer``, collected in the same single footer read that
already yields the bucket range). This module turns a conjunctive predicate
into (a) the subset of data files that can possibly hold a matching row —
driver-side manifest math, no data read — and (b) the residual Spark filter
applied to the pruned scan. It is the Iceberg data-skipping analog
(min/max metrics in manifest entries + an evaluator that proves files
irrelevant), re-expressed over this table's JSON manifests.

Predicates are triples ``(column, op, value)`` with op in
``= < <= > >= in`` and are ANDed. The same triple list compiles to the
Spark ``Column`` via :func:`predicates_condition`, so the prune and the
filter cannot disagree.

Soundness rules (each is load-bearing):

- A file is skipped only when some predicate is PROVABLY unsatisfiable
  against the file's recorded bounds; a missing stat (old manifest,
  all-null column, string bound too long, type mismatch) always keeps the
  file.
- Stats cover ALL stored rows, visible rows are a subset — so "no stored
  row matches" implies "no visible row matches" (tombstone rows have
  nulled values, and nulls never satisfy a comparison anyway).
- Columns added by schema evolution (``snap.added_lsn``) are NEVER pruned
  on: their visible value may come from the hidden ``__extras`` map of a
  row merged before the add, which no column stat covers.
- Renamed columns resolve per file through the field-id model: the
  predicate names the CURRENT column, each file's stat is recorded under
  the name its schema version stored.
- Merge-on-read delta files and their bucket-overlap closure are always
  read: a delta row may change a key's winning version in or out of the
  predicate, so pruning any file of a delta-touched bucket could
  resurrect a superseded row (filter-then-fold ≠ fold-then-filter). In a
  delta-free bucket the COW invariant (one stored row per key) makes
  per-file pruning exact.

Reference anchor: the reference reads whole source files and filters in
Python (/root/reference/src/translator_ingest/ingests rows iterate full
parsed payloads); at 100 TB the win is never scheduling the task at all —
this module deletes the I/O, the filter then runs on what remains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from translator_ingests_spark.lake.table import LakeTable, Snapshot

_OPS = ("=", "<", "<=", ">", ">=", "in")


def _check(preds: list[tuple]) -> None:
    for p in preds:
        if len(p) != 3 or p[1] not in _OPS:
            raise ValueError(f"predicate must be (col, op, value) with op in {_OPS}: {p!r}")
        if p[1] == "in" and not isinstance(p[2], (list, tuple, set)):
            raise ValueError(f"'in' predicate needs a collection value: {p!r}")


def predicates_condition(preds: list[tuple]) -> Column:
    """The conjunctive Spark filter for a predicate triple list — the ONE
    compilation both the pruned scan and the DML probe apply, so pruning
    and filtering share semantics by construction."""
    _check(preds)
    cond = F.lit(True)
    for col, op, val in preds:
        c = F.col(col)
        if op == "=":
            cond = cond & (c == F.lit(val))
        elif op == "<":
            cond = cond & (c < F.lit(val))
        elif op == "<=":
            cond = cond & (c <= F.lit(val))
        elif op == ">":
            cond = cond & (c > F.lit(val))
        elif op == ">=":
            cond = cond & (c >= F.lit(val))
        else:
            vs = list(val)
            # x IN () is false for every row (mirrors _excludes, which
            # prunes every file for an empty list)
            cond = cond & (c.isin(*vs) if vs else F.lit(False))
    return cond


def _comparable(a, b) -> bool:
    """Python-side comparability guard: numeric stats compare against
    numeric predicate values (int/float interop, bool included), strings
    against strings. Anything else → not provable → keep the file."""
    num = (bool, int, float)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return isinstance(a, str) and isinstance(b, str)


def _excludes(stat_min, stat_max, op: str, val) -> bool:
    """True iff [stat_min, stat_max] PROVES no row satisfies ``col op val``.
    Conservative by construction — any doubt returns False (keep)."""
    if op == "in":
        vs = list(val)
        if not vs:
            return True  # x IN () is false for every row
        return all(
            _comparable(stat_min, v) and (v < stat_min or v > stat_max)
            for v in vs
        )
    if not _comparable(stat_min, val):
        return False
    if op == "=":
        return val < stat_min or val > stat_max
    if op == "<":
        return stat_min >= val
    if op == "<=":
        return stat_min > val
    if op == ">":
        return stat_max <= val
    # op == ">="
    return stat_max < val


def _stored_names(snap: Snapshot, col: str) -> dict[int, str] | None:
    """Per-schema-version stored name of the CURRENT column ``col``, via
    the field-id model (renames leave stats recorded under old names).
    None ⇒ the column is not prunable (unknown, or evolution-added with a
    possible ``__extras`` fallback)."""
    fld = next((f for f in snap.schema.fields if f.name == col), None)
    if fld is None:
        raise ValueError(f"unknown column: {col!r}")
    if fld.field_id in snap.added_lsn:
        return None  # visible value may come from __extras — stats can't see it
    out: dict[int, str] = {}
    for sv, schema in snap.schemas.items():
        src = schema.by_id().get(fld.field_id)
        if src is not None:
            out[sv] = src.name
    return out


def prune_files(table: LakeTable, snap: Snapshot, preds: list[tuple]) -> list[dict]:
    """Manifest-only file selection for a conjunctive predicate: delta
    files and their bucket-overlap closure are always included (LWW fold
    completeness); every other file is dropped when its recorded column
    bounds prove the predicate unsatisfiable. O(files · preds) driver-side,
    zero data read."""
    _check(preds)
    names = {col: _stored_names(snap, col) for col, _op, _val in preds}
    deltas = [f for f in snap.files if f.get("delta")]
    closure_paths: set[str] = set()
    kept: list[dict] = []
    if deltas:
        seed: set[int] = set()
        for f in deltas:
            seed.update(range(f["bucket_min"], f["bucket_max"] + 1))
        closure = table._bucket_closure(snap.files, seed)
        closure_paths = {f["path"] for f in closure}
        kept.extend(closure)
    for f in snap.files:
        if f["path"] in closure_paths:
            continue
        stats = f.get("cols") or {}
        skip = False
        for col, op, val in preds:
            by_sv = names[col]
            if by_sv is None:
                continue
            stored = by_sv.get(f["schema_version"])
            if stored is None:
                # column absent from this file's schema version and NOT
                # evolution-added (excluded above) — cannot happen under
                # the add/rename/widen/drop model, but stay conservative
                continue
            st = stats.get(stored)
            if st is None:
                continue
            if _excludes(st[0], st[1], op, val):
                skip = True
                break
        if not skip:
            kept.append(f)
    return kept


def read_where(
    table: LakeTable, preds: list[tuple], at: int | None = None
) -> DataFrame:
    """Predicate-pruned visible read: ``table.read().filter(...)`` with the
    file list cut down by manifest column stats first. Identical results,
    strictly less I/O — the residual filter still runs (file bounds are
    necessary, not sufficient) and still pushes into the parquet scan.

    ``at`` pins the read to a committed snapshot version (the pruned
    analog of ``table.read_at``) — what an incremental consumer needs so a
    commit racing in after its poll stays out of the refresh."""
    snap = table.current() if at is None else table.snapshot_at(at)
    files = prune_files(table, snap, preds)
    df = table._visible(table._net_raw(snap, files), snap)
    return df.filter(predicates_condition(preds))
