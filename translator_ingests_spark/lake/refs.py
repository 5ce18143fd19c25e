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
import re as _re

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


# ---------------------------------------------------------------------------
# consumer cursors — retention pins for incremental change-feed consumers
# ---------------------------------------------------------------------------
# A registered cursor is the Kafka consumer-group-offset analog for snapshot
# retention: `expire_snapshots` keeps every registered cursor's snapshot
# (manifest + its data files) alive so the consumer's NEXT incremental poll
# — `changes(cursor, head)`, an endpoint diff that reads only the two
# pinned manifests and their files — can still be served, however far the
# `keep_last` window has moved on. ChangesConsumer registers automatically
# on bootstrap/commit (`pin_retention=True`), which closes the documented
# coordination trade of `CdcEngine.auto_expire_every`: the expiry cadence
# no longer has to be hand-sized to the slowest downstream consumer's lag.
#
# Unlike tags (one shared refs.json), each cursor is its own tiny JSON under
# `<root>/cursors/` — consumers commit concurrently and a shared
# read-modify-write file would lose updates between two racing consumers;
# per-name atomic replace makes every registration independent. The
# registry key is the consumer NAME: names must be unique per table.


def _cursors_dir(table: LakeTable) -> str:
    return os.path.join(table.root, "cursors")


def _check_cursor_name(name: str) -> None:
    # the name IS the registry filename: a separator or traversal component
    # would nest (or escape) the cursors/ dir — the pin would never be seen
    # by list_cursors → expire_snapshots, and drop_cursor could remove a
    # file OUTSIDE the registry (name="../refs" targets refs.json)
    if not _re.fullmatch(r"[A-Za-z0-9._-]+", name) or name in (".", ".."):
        raise ValueError(
            f"consumer name {name!r} is not a valid registry key "
            "(allowed: letters, digits, '.', '_', '-')"
        )


def register_cursor(table: LakeTable, name: str, version: int) -> None:
    """Pin ``name``'s consumer cursor at ``version`` (must be a committed
    snapshot). Re-registering moves the pin — forward OR backward (the
    consumer owns its own regression rules; the registry just records)."""
    _check_cursor_name(name)
    table.snapshot_at(version)  # existence check, same contract as tag()
    d = _cursors_dir(table)
    os.makedirs(d, exist_ok=True)
    _atomic_write_json(os.path.join(d, f"{name}.json"), {"version": version})


def list_cursors(table: LakeTable) -> dict[str, int]:
    """All registered consumer cursors as {name: version}."""
    d = _cursors_dir(table)
    if not os.path.isdir(d):
        return {}
    out: dict[str, int] = {}
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(d, fn)) as fh:
            out[fn[: -len(".json")]] = int(json.load(fh)["version"])
    return out


def drop_cursor(table: LakeTable, name: str) -> None:
    """Remove a consumer's retention pin (decommissioning the consumer).
    Unknown names are a no-op — drop must be idempotent so a consumer
    teardown can always run it."""
    _check_cursor_name(name)
    try:
        os.remove(os.path.join(_cursors_dir(table), f"{name}.json"))
    except FileNotFoundError:
        pass
