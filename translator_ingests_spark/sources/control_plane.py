"""Driver-side control plane: URL templating and version resolution.

Reference analogs (all pure driver-plane, no Spark):
- S2 URL version substitution (`{version}` placeholder rewrite,
  /root/reference/src/translator_ingest/util/download_utils.py:13-92);
- S11 per-source ``get_latest_version()`` probes with fallback to the last
  successful build when the probe fails (pipeline.py:94-122, 62-80);
- the build-version composition (metadata.py:74-83).

Network probes are injected as callables so everything is testable offline.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from collections.abc import Callable


def substitute_version(url_template: str, version: str) -> str:
    """S2: rewrite `{version}` placeholders into concrete fetch URLs."""
    return url_template.replace("{version}", version)


def substitute_all(templates: list[str], version: str) -> list[str]:
    return [substitute_version(t, version) for t in templates]


class VersionResolver:
    """S11 + fallback: resolve a source's latest version via an injected
    probe; on probe failure fall back to the last successfully recorded
    build version (the reference's resume-on-probe-failure behavior)."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _state_path(self, source: str) -> str:
        return os.path.join(self.state_dir, f"{source}.latest-build.json")

    def record_success(self, source: str, version: str, build_meta: dict | None = None):
        with open(self._state_path(source), "w") as fh:
            json.dump({"version": version, "meta": build_meta or {}}, fh)

    def last_successful(self, source: str) -> str | None:
        p = self._state_path(source)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh).get("version")

    def resolve(self, source: str, probe: Callable[[], str]) -> tuple[str, bool]:
        """Returns (version, from_fallback)."""
        try:
            v = probe()
            if not v:
                raise ValueError("empty version from probe")
            return v, False
        except Exception:
            fallback = self.last_successful(source)
            if fallback is None:
                raise
            return fallback, True


def parse_autoindex_latest(html: str, pattern: str = r'href="([0-9]{4}-[0-9]{2}-[0-9]{2})/?"') -> str:
    """The regex-scraped autoindex version probe shape (ctd.py:71-105):
    newest date-named directory in an HTML index listing."""
    dates = re.findall(pattern, html)
    if not dates:
        raise ValueError("no version directories found in index")
    return max(dates)


def build_version(components: dict[str, str]) -> str:
    """Composite build version: stable hash of sorted component versions
    (metadata.py:74-83 + merging.py:255 md5-of-sorted-builds)."""
    canon = "|".join(f"{k}={components[k]}" for k in sorted(components))
    return hashlib.md5(canon.encode()).hexdigest()[:12]


def execute_fetch_plan(
    urls: list[str],
    staging_dir: str,
    opener: Callable[[str], "object"] | None = None,
    skip_existing: bool = True,
) -> list[dict]:
    """S1: execute a substituted fetch plan into a local staging directory.

    Real download path (reference download_utils.py:13-92), driver-plane:
    each URL streams through ``urllib`` to ``staging_dir/<basename>`` with
    crash-safe atomic placement (tmp + rename), a sha256 digest recorded in
    a sidecar manifest, and idempotent re-runs (``skip_existing`` keeps a
    file whose recorded digest still matches). ``file://`` URLs exercise
    the identical code path offline — the form every test here uses, since
    this sandbox has no network; http(s) flows through the same opener.
    An injected ``opener`` substitutes for urllib in tests/probes.
    """
    import shutil
    import urllib.request

    os.makedirs(staging_dir, exist_ok=True)
    results = []
    for url in urls:
        name = os.path.basename(url.rstrip("/")) or hashlib.md5(url.encode()).hexdigest()
        dest = os.path.join(staging_dir, name)
        sidecar = dest + ".fetch.json"
        if skip_existing and os.path.exists(dest) and os.path.exists(sidecar):
            with open(sidecar) as fh:
                rec = json.load(fh)
            h = hashlib.sha256()
            with open(dest, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            if rec.get("sha256") == h.hexdigest():
                results.append({**rec, "skipped": True})
                continue
        tmp = dest + ".tmp"
        h = hashlib.sha256()
        src = opener(url) if opener is not None else urllib.request.urlopen(url)
        try:
            with open(tmp, "wb") as out:
                for chunk in iter(lambda: src.read(1 << 20), b""):
                    h.update(chunk)
                    out.write(chunk)
        finally:
            close = getattr(src, "close", None)
            if close:
                close()
        os.replace(tmp, dest)  # atomic: a crash never leaves a partial dest
        rec = {"url": url, "path": dest, "sha256": h.hexdigest(),
               "bytes": os.path.getsize(dest)}
        with open(sidecar + ".tmp", "w") as fh:
            json.dump(rec, fh)
        os.replace(sidecar + ".tmp", sidecar)
        results.append({**rec, "skipped": False})
    return results
