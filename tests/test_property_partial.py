"""Property test for partial-update semantics: arbitrary interleavings of
sparse patches and deletes across multiple batches must match a sequential
Python oracle implementing the column-wise contract — each value column
takes its last non-null non-delete writer above the key's last delete; the
key is visible iff the final event is not a delete chain-terminal."""

import os
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA

# soak multiplier: SPARK_GRAFT_PROP_MULT=5 scales the example budget for
# end-of-round soaks without editing this file (the settings decorator
# outranks hypothesis profiles, so an env knob is the only clean override)
_MULT = max(1, int(os.environ.get("SPARK_GRAFT_PROP_MULT", "1")))

_COLS = ["commit", "lang", "content"]


@st.composite
def partial_logs(draw):
    n = draw(st.integers(min_value=6, max_value=14))
    events = []
    for lsn in range(n):
        key = draw(st.sampled_from(["a", "b"]))
        if draw(st.integers(0, 4)) == 0:
            events.append({"lsn": lsn, "op": "delete", "repo": "r", "path": key,
                           "commit": None, "lang": None, "content": None,
                           "schema_change": None, "source_partition": 0,
                           "source_offset": lsn, "extras": None})
            continue
        row = {"commit": None, "lang": None, "content": None}
        # each patch sets a random non-empty subset of the columns
        for c in draw(st.sets(st.sampled_from(_COLS), min_size=1)):
            row[c] = f"{c}{lsn}"
        events.append({"lsn": lsn, "op": "update", "repo": "r", "path": key,
                       **row, "schema_change": None, "source_partition": 0,
                       "source_offset": lsn, "extras": None})
    return events


def _oracle(events):
    import hashlib

    state = {}
    for e in sorted(events, key=lambda e: e["lsn"]):
        k = (e["repo"], e["path"])
        if e["op"] == "delete":
            state[k] = {"__deleted": True, "last_lsn": e["lsn"]}
            continue
        row = state.get(k)
        if row is None or row.get("__deleted"):
            row = {c: None for c in _COLS}
        row.pop("__deleted", None)
        for c in _COLS:
            if e[c] is not None:
                row[c] = e[c]
        row["last_lsn"] = e["lsn"]
        state[k] = row
    out = {}
    for k, row in state.items():
        if row.get("__deleted"):
            continue
        sha = (hashlib.sha256(row["content"].encode()).hexdigest()
               if row.get("content") is not None else None)
        out[k] = {**row, "content_sha256": sha}
    return out


@settings(max_examples=6 * _MULT, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(partial_logs())
def test_partial_engine_matches_columnwise_oracle(spark, tmp_path_factory, events):
    root = tmp_path_factory.mktemp("pp")
    eng = CdcEngine(spark, str(root / "cdc"), num_buckets=4,
                    auto_compact_every=None, partial_updates=True)
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    eng.apply_log(df, events_per_batch=3)
    got = {(r["repo"], r["path"]): r.asDict() for r in eng.final_state().collect()}
    want = _oracle(events)
    assert set(got) == set(want)
    for k, wrow in want.items():
        for c in [*_COLS, "last_lsn", "content_sha256"]:
            assert got[k][c] == wrow[c], (k, c, got[k][c], wrow[c])
