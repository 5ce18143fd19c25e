"""Release packaging + atomic publish.

Reference analogs: the compressed release sink (tar archive,
/root/reference/src/translator_ingest/release.py:50-62) and the atomic
rename publish (`latest/` never half-written, release.py:20-48). Here a
release is an export of the current snapshot's visible state plus its
metadata, published under ``releases/`` with an atomically-swapped
``latest`` symlink-file."""

from __future__ import annotations

import json
import os
import tarfile
import tempfile
import uuid

from translator_ingests_spark.lake.table import LakeTable


def export_release(table: LakeTable, releases_root: str,
                   compression: str = "gz") -> str:
    """Export the current snapshot: one tar.{gz} of the live data files +
    snapshot manifest, then atomically publish it as ``latest``.

    Returns the release directory path. The archive is built in a temp
    location and moved into place, and the ``latest.json`` pointer swap is
    the last, atomic step — a crash mid-export never corrupts ``latest``.
    """
    snap = table.current()
    version = snap.version
    rel_dir = os.path.join(releases_root, f"v{version:08d}")
    os.makedirs(rel_dir, exist_ok=True)

    archive_path = os.path.join(rel_dir, f"state.tar.{compression}")
    tmp_archive = archive_path + f".tmp.{uuid.uuid4().hex}"
    with tarfile.open(tmp_archive, f"w:{compression}") as tf:
        for i, f in enumerate(snap.files):
            tf.add(table.localize_path(f["path"]), arcname=f"data/{i:06d}.parquet")
        manifest_bytes = json.dumps(snap.to_json()).encode()
        info = tarfile.TarInfo("snapshot.json")
        info.size = len(manifest_bytes)
        import io

        tf.addfile(info, io.BytesIO(manifest_bytes))
    os.replace(tmp_archive, archive_path)

    # atomic publish: write pointer to temp then rename over latest.json
    pointer = {"version": version, "release_dir": rel_dir, "archive": archive_path}
    tmp_ptr = os.path.join(releases_root, f".latest.tmp.{uuid.uuid4().hex}")
    with open(tmp_ptr, "w") as fh:
        json.dump(pointer, fh)
    os.replace(tmp_ptr, os.path.join(releases_root, "latest.json"))
    return rel_dir


def read_latest_release(releases_root: str) -> dict | None:
    p = os.path.join(releases_root, "latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)
