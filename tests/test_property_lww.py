"""Property-based testing (hypothesis): for arbitrary small event logs —
random keys, LSN permutations, duplicates, deletes — the engine's LWW
reduction and the lake MERGE agree with the sequential Python oracle."""

import os
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from translator_ingests_spark.cdc.apply import EVENT_SCHEMA
from translator_ingests_spark.cdc.oracle import replay_oracle
from translator_ingests_spark.cdc.reduce import lww_reduce

# soak multiplier: SPARK_GRAFT_PROP_MULT=5 scales the example budget for
# end-of-round soaks without editing this file (the settings decorator
# outranks hypothesis profiles, so an env knob is the only clean override)
_MULT = max(1, int(os.environ.get("SPARK_GRAFT_PROP_MULT", "1")))

# a compact universe so collisions (same key, duplicate LSNs) are frequent
_repos = st.sampled_from(["r0", "r1"])
_paths = st.sampled_from(["a", "b", "c"])
_ops = st.sampled_from(["insert", "update", "delete"])


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    lsns = draw(
        st.lists(st.integers(min_value=0, max_value=30), min_size=n, max_size=n)
    )
    events = []
    for i, lsn in enumerate(lsns):
        op = draw(_ops)
        events.append(
            {
                "lsn": lsn,
                "op": op,
                "repo": draw(_repos),
                "path": draw(_paths),
                "commit": f"c{lsn}",
                "lang": "py",
                # content is a pure function of (lsn, op): duplicate-LSN rows
                # of the same op are byte-identical, as real redelivery is
                "content": None if op == "delete" else f"v{lsn}",
                "schema_change": None,
                "source_partition": i % 2,
                "source_offset": i,
                "extras": None,
            }
        )
    # duplicate redelivery: append a random subset again
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=n))
    events += [dict(events[i]) for i in dup_idx]
    return events


@settings(max_examples=12 * _MULT, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(event_logs())
def test_lww_reduce_matches_sequential_oracle(spark, events):
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    reduced = {
        (r["repo"], r["path"]): r
        for r in lww_reduce(df, keys=["repo", "path"]).collect()
    }
    # oracle: survivors per key = max-LSN event (with the engine's
    # deterministic tie-break, any same-LSN pick must at least match on LSN)
    want_state = replay_oracle(events)
    for key, row in reduced.items():
        max_lsn = max(e["lsn"] for e in events
                      if (e["repo"], e["path"]) == key)
        assert row["lsn"] == max_lsn, key
    # visible-state agreement: non-delete winners must reproduce the oracle
    for key, wrow in want_state.items():
        grow = reduced[key]
        assert grow["op"] != "delete"
        assert grow["lsn"] == wrow["last_lsn"]
        # oracle content is normalized; generator content has no CR/unicode
        assert grow["content"] == wrow["content"], key
    # keys absent from oracle state ended as deletes (or tombstoned)
    for key, grow in reduced.items():
        if key not in want_state:
            assert grow["op"] == "delete", key
