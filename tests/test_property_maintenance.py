"""Maintenance-composition property: random interleavings of CDC applies
with table-maintenance actions — full and incremental compaction,
bucket-count evolution (rebucket), secondary clustering, predicate DML
deletes, snapshot expiry — must leave the engine equal to a sequential
Python oracle, keep every retained snapshot time-travel-exact, and keep
the change feed COMPOSABLE:

    read_at(v)  +  changes(v, head)   ==   read()      for every retained v

The round-4 advisor bug (spurious feed deletes synthesized from a
range-overlap before side after a merge wrote a file spanning an untouched
one) lived exactly in this composition space: every single-feature test
passed while a merge x file-layout interaction broke the feed. This
property sweeps the whole interaction family — maintenance rewrites change
file layout arbitrarily between feed endpoints, DML plants tombstones
above the watermark, rebucket/compaction drop watermark-passed tombstones
inside feed windows (the vanished-delete synthesis path), and expiry
removes feed endpoints entirely.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake import dml, maintenance

_REPOS = ["r0", "r1", "r2"]
_PATHS = ["a", "b", "c"]
_OPS = st.sampled_from(["insert", "update", "delete", "update"])

# each action consumes one 100-wide LSN block, so LSNs are globally
# strictly increasing across the whole sequence (simple dict oracle) and
# apply_log(events_per_batch=100) derives one distinct batch id per chunk
# (exactly-once guard never collides across chunks)
_BLOCK = 100


@st.composite
def action_seqs(draw):
    n_actions = draw(st.integers(min_value=4, max_value=7))
    actions = []
    for i in range(n_actions):
        kind = "apply" if i == 0 else draw(st.sampled_from(
            ["apply", "apply", "compact_full", "compact_inc",
             "rebucket", "cluster", "delete_repo", "expire"]))
        if kind == "apply":
            n = draw(st.integers(min_value=3, max_value=8))
            evs = [
                (draw(_OPS), draw(st.sampled_from(_REPOS)),
                 draw(st.sampled_from(_PATHS)))
                for _ in range(n)
            ]
            actions.append(("apply", evs))
        elif kind == "delete_repo":
            actions.append(("delete_repo", draw(st.sampled_from(_REPOS))))
        elif kind == "rebucket":
            actions.append(("rebucket", draw(st.sampled_from([2, 8]))))
        else:
            actions.append((kind,))
    return actions


def _visible(df):
    return {
        (r["repo"], r["path"]): (r["last_lsn"], r["content"])
        for r in df.select("repo", "path", "last_lsn", "content").collect()
    }


def _compose(base: dict, feed_rows) -> dict:
    """Apply a NET change feed (at most one upsert/delete per key) onto a
    driver-side state dict."""
    out = dict(base)
    for r in feed_rows:
        key = (r["repo"], r["path"])
        if r["_change_type"] == "delete":
            out.pop(key, None)
        else:
            out[key] = (r["last_lsn"], r["content"])
    return out


@pytest.mark.parametrize("mode", ["cow", "mor"])
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(action_seqs())
def test_maintenance_composition(spark, tmp_path_factory, mode, actions):
    root = tmp_path_factory.mktemp("maint")
    eng = CdcEngine(spark, str(root / "cdc"), num_buckets=4,
                    auto_compact_every=None, write_mode=mode)

    oracle: dict = {}
    checkpoints: dict = {}  # version -> oracle state at that version
    block = 0
    for act in actions:
        if act[0] == "apply":
            base = block * _BLOCK
            block += 1
            evs = []
            for j, (op, repo, path) in enumerate(act[1]):
                lsn = base + j
                evs.append({
                    "lsn": lsn, "op": op, "repo": repo, "path": path,
                    "commit": f"c{lsn}", "lang": "py",
                    "content": None if op == "delete" else f"v{lsn}",
                    "schema_change": None, "source_partition": lsn % 2,
                    "source_offset": lsn, "extras": None,
                })
            eng.apply_log(spark.createDataFrame(evs, EVENT_SCHEMA),
                          events_per_batch=_BLOCK)
            for j, (op, repo, path) in enumerate(act[1]):
                key = (repo, path)
                if op == "delete":
                    oracle.pop(key, None)
                else:
                    oracle[key] = (base + j, f"v{base + j}")
        elif act[0] == "delete_repo":
            at_lsn = block * _BLOCK
            block += 1
            dml.delete_where(eng.table, F.col("repo") == act[1],
                             at_lsn=at_lsn)
            for key in [k for k in oracle if k[0] == act[1]]:
                oracle.pop(key)
        elif act[0] == "compact_full":
            maintenance.compact(eng.table, drop_tombstones=True)
        elif act[0] == "compact_inc":
            maintenance.compact_incremental(eng.table)
        elif act[0] == "rebucket":
            maintenance.rebucket(eng.table, act[1])
        elif act[0] == "cluster":
            maintenance.cluster_by(eng.table, ["lang"])
        elif act[0] == "expire":
            maintenance.expire_snapshots(eng.table, keep_last=3)
        checkpoints[eng.table.head().version] = dict(oracle)

    # 1) final state equals the sequential oracle
    head = _visible(eng.table.read())
    assert head == oracle

    retained = set(eng.table.history())
    head_v = eng.table.head().version
    for v, ostate in checkpoints.items():
        if v not in retained:
            continue  # expired endpoints are gone by design
        # 2) time travel is exact at every retained checkpoint, regardless
        #    of later rewrites/rebuckets/expiry
        assert _visible(eng.table.read_at(v)) == ostate, f"read_at({v})"
        # 3) the feed composes: checkpoint state + net changes == head,
        #    across windows containing arbitrary maintenance rewrites
        if v == head_v:
            continue
        feed = eng.table.changes(v).select(
            "repo", "path", "last_lsn", "content", "_change_type"
        ).collect()
        assert _compose(ostate, feed) == head, f"changes({v}, {head_v})"
        # 3b) maintenance-only windows are not data changes: every feed row
        #     must change the composed state (no spurious upserts/deletes)
        for r in feed:
            key = (r["repo"], r["path"])
            if r["_change_type"] == "delete":
                assert key in ostate, f"spurious delete {key} in ({v},{head_v})"
            else:
                assert ostate.get(key) != (r["last_lsn"], r["content"]), \
                    f"no-op upsert {key} in ({v},{head_v})"
