"""Named refs (tags) over lake snapshots — the Iceberg tag analog.

A tag pins a snapshot version under a stable name ("prod", "release-2026-08")
so readers can address state symbolically and GC knows which history is
load-bearing. Refs live in one tiny JSON (`refs.json` at the table root,
atomic replace on every mutation) — O(tags) driver metadata, nothing on the
data path.

Reference analog: the release "latest" pointer
(/root/reference/src/translator_ingest/util/storage/s3.py:220-260) — here
generalized to arbitrarily many named pins with GC integration
(:func:`translator_ingests_spark.lake.maintenance.expire_snapshots` keeps
every tagged snapshot alive regardless of ``keep_last``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from translator_ingests_spark.lake.table import LakeTable, _atomic_write_json


def _refs_path(table: LakeTable) -> str:
    return os.path.join(table.root, "refs.json")


def list_tags(table: LakeTable) -> dict[str, int]:
    """All tags as {name: version}."""
    path = _refs_path(table)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return {k: int(v) for k, v in json.load(fh)["tags"].items()}


def tag(table: LakeTable, name: str, version: int | None = None) -> int:
    """Pin ``name`` to ``version`` (default: current). Re-tagging an existing
    name moves it — tags are mutable pointers, snapshots are not."""
    v = table.current().version if version is None else version
    # existence check: a tag must point at a committed snapshot
    table.snapshot_at(v)
    tags = list_tags(table)
    tags[name] = v
    _atomic_write_json(_refs_path(table), {"tags": tags})
    return v


def drop_tag(table: LakeTable, name: str) -> None:
    tags = list_tags(table)
    if name not in tags:
        raise KeyError(f"unknown tag: {name!r}")
    del tags[name]
    _atomic_write_json(_refs_path(table), {"tags": tags})


def read_tag(table: LakeTable, name: str) -> DataFrame:
    """Visible table state as of the tagged snapshot (time-travel read)."""
    tags = list_tags(table)
    if name not in tags:
        raise KeyError(f"unknown tag: {name!r}")
    return table.read_at(tags[name])
