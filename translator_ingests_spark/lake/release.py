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
import shutil
import subprocess
import tarfile
import tempfile
import uuid

from translator_ingests_spark.lake.table import LakeTable


def zstd_available() -> bool:
    """True when an external ``zstd`` binary is on PATH (Python's stdlib
    has no zstd codec before 3.14)."""
    return shutil.which("zstd") is not None


def export_release(table: LakeTable, releases_root: str,
                   compression: str = "gz") -> str:
    """Export the current snapshot: one tar.{gz,zst} of the live data files
    + snapshot manifest, then atomically publish it as ``latest``.

    ``compression``: ``"zstd"`` matches the reference's release sink
    (zstd level 12, /root/reference/src/translator_ingest/release.py:50-62)
    by piping an uncompressed tar through the external ``zstd`` binary;
    ``"gz"`` (default) stays stdlib-only; ``"auto"`` picks zstd when the
    binary is present, else gz. The default is deliberately gz, NOT auto:
    the artifact format must not depend on what happens to be on the
    producing host's PATH — a consumer without the zstd binary cannot open
    a ``.zst`` release, so opting into zstd is an explicit pipeline
    decision, not an environment accident. Re-exporting the same snapshot
    under a different codec removes the stale sibling archive so directory
    scanners can never pick up the superseded one.

    Returns the release directory path. The archive is built in a temp
    location and moved into place, and the ``latest.json`` pointer swap is
    the last, atomic step — a crash mid-export never corrupts ``latest``.
    """
    if compression == "auto":
        compression = "zstd" if zstd_available() else "gz"
    if compression == "zstd" and not zstd_available():
        raise RuntimeError("compression='zstd' requires a zstd binary on "
                           "PATH; use 'auto' or 'gz'")
    snap = table.current()
    version = snap.version
    rel_dir = os.path.join(releases_root, f"v{version:08d}")
    os.makedirs(rel_dir, exist_ok=True)

    ext = "zst" if compression == "zstd" else compression
    archive_path = os.path.join(rel_dir, f"state.tar.{ext}")
    tmp_archive = archive_path + f".tmp.{uuid.uuid4().hex}"
    tar_mode = "w" if compression == "zstd" else f"w:{compression}"
    with tarfile.open(tmp_archive, tar_mode) as tf:
        for i, f in enumerate(snap.files):
            tf.add(table.localize_path(f["path"]), arcname=f"data/{i:06d}.parquet")
        manifest_bytes = json.dumps(snap.to_json()).encode()
        info = tarfile.TarInfo("snapshot.json")
        info.size = len(manifest_bytes)
        import io

        tf.addfile(info, io.BytesIO(manifest_bytes))
    if compression == "zstd":
        # level 12 = the reference sink's setting; --rm keeps the temp dir
        # single-copy. The compressed file lands at tmp_archive + ".zst".
        subprocess.run(["zstd", "-12", "--rm", "-q", tmp_archive],
                       check=True)
        tmp_archive += ".zst"
    os.replace(tmp_archive, archive_path)
    # drop a stale sibling archive from an earlier export of the SAME
    # snapshot under the other codec — latest.json points at exactly one
    for other in ("gz", "zst"):
        sibling = os.path.join(rel_dir, f"state.tar.{other}")
        if other != ext and os.path.exists(sibling):
            os.remove(sibling)

    # atomic publish: write pointer to temp then rename over latest.json
    pointer = {"version": version, "release_dir": rel_dir, "archive": archive_path}
    tmp_ptr = os.path.join(releases_root, f".latest.tmp.{uuid.uuid4().hex}")
    with open(tmp_ptr, "w") as fh:
        json.dump(pointer, fh)
    os.replace(tmp_ptr, os.path.join(releases_root, "latest.json"))
    return rel_dir


def open_release(archive_path: str) -> tarfile.TarFile:
    """Open a release archive for reading, whatever its codec: gz/bz2/xz
    go straight through ``tarfile``; ``.zst`` is decompressed through the
    external binary into an unlinked temp file first (stdlib has no zstd)."""
    if not archive_path.endswith(".zst"):
        return tarfile.open(archive_path)
    if not zstd_available():
        raise RuntimeError("reading a .zst release requires a zstd binary")
    tmp = tempfile.TemporaryFile()
    subprocess.run(["zstd", "-d", "-q", "-c", archive_path], stdout=tmp,
                   check=True)
    tmp.seek(0)
    return tarfile.open(fileobj=tmp, mode="r:")


def read_latest_release(releases_root: str) -> dict | None:
    p = os.path.join(releases_root, "latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)
