"""Driver/test-side replay oracle: pure-Python LWW replay of an event log.

Used by the test suite to verify that the distributed engine's final table
equals a trivially-correct sequential replay under the per-row
content-sha256 invariant (the reference's validation-stage shape:
/root/reference/src/translator_ingest/util/validate_biolink_kgx.py:280-390).
Never used in the Spark plan.
"""

from __future__ import annotations

import hashlib

from translator_ingests_spark.functions.content import normalize_py


def replay_oracle(events: list[dict]) -> dict[tuple[str, str], dict]:
    """Sequential replay in LSN order. Returns key -> final visible row.

    Events: dicts with lsn, op, repo, path, commit, lang, content, extras.
    Deletes remove the key (tombstones are invisible in the final state).
    Schema-change events affect column presence, not row survival.
    """
    added_cols: list[str] = []
    dropped_base: set[str] = set()  # base columns removed by drop_column
    renames: list[tuple[str, str]] = []  # in application order, supports chains
    state: dict[tuple[str, str], dict] = {}
    tomb: dict[tuple[str, str], int] = {}

    # same-LSN conflicts (corrupt producers) resolve by the engine's
    # deterministic op rank: delete > update > insert — pre-reduce so the
    # sequential replay sees one event per (key, lsn)
    op_rank = {"schema_change": 0, "insert": 1, "update": 2, "delete": 3}
    by_key_lsn: dict = {}
    ordered = []
    for ev in events:
        if ev["op"] == "schema_change":
            ordered.append(ev)
            continue
        k = (ev["repo"], ev["path"], ev["lsn"])
        cur = by_key_lsn.get(k)
        if cur is None or op_rank[ev["op"]] > op_rank[cur["op"]]:
            by_key_lsn[k] = ev
    ordered += list(by_key_lsn.values())

    for ev in sorted(ordered, key=lambda e: e["lsn"]):
        op = ev["op"]
        if op == "schema_change":
            sc = ev["schema_change"]
            if sc["kind"] == "add_column" and sc["column"] not in added_cols:
                added_cols.append(sc["column"])
                # a re-add after a drop mints a NEW column: old rows must
                # not resurface the dropped values, and the purge below
                # already removed them — nothing more to do here
            elif sc["kind"] == "rename_column":
                renames.append((sc["column"], sc["new_name"]))
                added_cols = [sc["new_name"] if c == sc["column"] else c for c in added_cols]
            elif sc["kind"] == "drop_column":
                col = sc["column"]
                if col in added_cols:
                    added_cols.remove(col)
                else:
                    dropped_base.add(col)
                # metadata drop is immediate: the column disappears from
                # every existing row (field-id alignment in the engine)
                for row in state.values():
                    row.pop(col, None)
            continue
        key = (ev["repo"], ev["path"])
        prior_lsn = state[key]["last_lsn"] if key in state else tomb.get(key, -1)
        if ev["lsn"] <= prior_lsn:
            continue  # stale or duplicate
        if op == "delete":
            state.pop(key, None)
            tomb[key] = ev["lsn"]
            continue
        content = normalize_py(ev.get("content"))
        row = {
            "repo": ev["repo"],
            "path": ev["path"],
            "commit": ev.get("commit"),
            "lang": ev.get("lang"),
            "content": content,
            "content_sha256": hashlib.sha256(content.encode()).hexdigest()
            if content is not None
            else None,
            "last_lsn": ev["lsn"],
        }
        for c in dropped_base:
            row.pop(c, None)  # dropped base columns never re-enter via writes
        extras = ev.get("extras") or {}
        for c in added_cols:
            row[c] = extras.get(c)
        state[key] = row
        tomb.pop(key, None)

    # renames are metadata-plane: remap historical keys in final rows
    for old, new in renames:
        for row in state.values():
            if old in row:
                row[new] = row.pop(old)
    return state
