"""Metadata-scaling evidence for the two-level manifest.

Synthesizes snapshot manifests of growing file counts (no Spark, no data
files — file entries are what cost at metadata scale) and measures, at each
size, the three metadata paths a 100-TB table exercises every micro-batch:

- commit: segment a new snapshot whose file list differs from its parent in
  ONE bucket (the steady-state bucket-pruned merge shape);
- load: ``current()``-equivalent snapshot resolution (raw read, no file
  enumeration);
- pruned read: enumerate the file entries for one bucket
  (``_files_for_buckets``).

The claim under test: commit bytes written and pruned-read bytes opened are
O(touched segments) — flat as the table grows — while only the unavoidable
first-build cost is O(files). Prints one JSON line per size plus a summary.

Usage: python tools/profile_manifest.py [sizes ...]   (default 1k 10k 100k)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import translator_ingests_spark.lake.table as lt
from translator_ingests_spark.lake.table import Snapshot

NUM_BUCKETS = 1024


class _MetaTable:
    """The metadata slice of LakeTable — enough to drive the manifest code
    paths without a SparkSession (segments never touch Spark)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "manifests")

    _segment_path = lt.LakeTable._segment_path
    _snapshot_path = lt.LakeTable._snapshot_path
    _raw_snapshot = lt.LakeTable._raw_snapshot
    _load_segment = lt.LakeTable._load_segment
    _snapshot_from_raw = lt.LakeTable._snapshot_from_raw
    _write_segments = lt.LakeTable._write_segments
    _put_segment = lt.LakeTable._put_segment
    _commit_snapshot = lt.LakeTable._commit_snapshot

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "current.json")


def _entry(i: int, commit: int) -> dict:
    b = i % NUM_BUCKETS
    return {
        "path": f"data/commit-{commit:08d}/b{b:04d}-f{i:08d}.parquet",
        "rows": 10_000,
        "bucket_min": b,
        "bucket_max": b,
        "has_tombstones": False,
        # representative per-column min/max stats (lake/scan.py skipping):
        # the realistic CDC-schema payload — content itself is dropped by
        # the 64-char string cap, so entries carry the short columns only.
        # Included here so the metadata-scaling claim is measured WITH the
        # data-skipping stats, not for the stat-free best case.
        "cols": {
            "repo": [f"org/repo-{i % 97:04d}", f"org/repo-{i % 97 + 512:04d}"],
            "path": [f"src/a{i % 31:03d}/f0.py", f"src/z{i % 31:03d}/f9.py"],
            "commit": ["0" * 40, "f" * 40],
            "lang": ["c", "rust"],
            "last_lsn": [i * 1000, i * 1000 + 999],
        },
    }


_SCHEMA = lt.LakeSchema.from_names(
    [("repo", "string"), ("path", "string"), ("last_lsn", "long")]
)


def _mk_snapshot(version: int, parent, files: list[dict]) -> Snapshot:
    return Snapshot(
        version=version,
        parent=parent,
        batch_id=version,
        last_batch_id=version,
        schema_version=1,
        schemas={1: _SCHEMA},
        num_buckets=NUM_BUCKETS,
        key_cols=["repo", "path"],
        lsn_col="last_lsn",
        files=files,
        lineage={},
        metrics={},
    )


def measure(n_files: int) -> dict:
    root = tempfile.mkdtemp(prefix="manifest_prof_")
    t = _MetaTable(root)
    try:
        lt._SEGMENT_CACHE.clear()
        base = [_entry(i, 0) for i in range(n_files)]
        t0 = time.perf_counter()
        t._commit_snapshot(_mk_snapshot(0, None, base))
        build_s = time.perf_counter() - t0

        # steady state: replace bucket 7's files, keep the rest (the shape a
        # bucket-pruned merge produces)
        nxt = [f for f in base if f["bucket_min"] != 7]
        nxt += [_entry(7 + k * NUM_BUCKETS, 1) for k in range(2)]
        seg_dir = t._manifest_dir
        before = {fn: os.path.getsize(os.path.join(seg_dir, fn))
                  for fn in os.listdir(seg_dir)}
        t0 = time.perf_counter()
        t._commit_snapshot(_mk_snapshot(1, 0, nxt))
        commit_s = time.perf_counter() - t0
        new_segs = [fn for fn in os.listdir(seg_dir) if fn not in before]
        commit_bytes = sum(os.path.getsize(os.path.join(seg_dir, fn))
                           for fn in new_segs)

        # cold load: snapshot resolution without file enumeration
        lt._SEGMENT_CACHE.clear()
        t0 = time.perf_counter()
        snap = t._snapshot_from_raw(t._raw_snapshot(1))
        load_s = time.perf_counter() - t0

        # pruned read for one bucket: count segments actually opened
        opened: list[str] = []
        orig = _MetaTable._load_segment

        def counting(self, name):
            opened.append(name)
            return orig(self, name)

        _MetaTable._load_segment = counting
        try:
            lt._SEGMENT_CACHE.clear()
            t0 = time.perf_counter()
            files = lt.LakeTable._files_for_buckets(t, snap, [7])
            prune_s = time.perf_counter() - t0
        finally:
            _MetaTable._load_segment = orig
        assert files and all(f["bucket_min"] == 7 for f in files)

        return {
            "n_files": n_files,
            "n_segments": len(snap.segments),
            "first_build_s": round(build_s, 4),
            "steady_commit_s": round(commit_s, 4),
            "steady_commit_new_segments": len(new_segs),
            "steady_commit_bytes": commit_bytes,
            "snapshot_load_s": round(load_s, 5),
            "pruned_read_s": round(prune_s, 5),
            "pruned_segments_opened": len(set(opened)),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000, 10_000, 100_000]
    rows = []
    for n in sizes:
        r = measure(n)
        rows.append(r)
        print(json.dumps(r))
    lo, hi = rows[0], rows[-1]
    growth = hi["n_files"] / lo["n_files"]
    print(json.dumps({
        "files_growth": growth,
        "steady_commit_bytes_growth":
            round(hi["steady_commit_bytes"] / max(lo["steady_commit_bytes"], 1), 2),
        "pruned_segments_opened_growth":
            round(hi["pruned_segments_opened"] / max(lo["pruned_segments_opened"], 1), 2),
        "snapshot_load_growth":
            round(hi["snapshot_load_s"] / max(lo["snapshot_load_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
