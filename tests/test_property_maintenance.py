"""Maintenance-composition property: random interleavings of CDC applies
with table-maintenance actions — full and incremental compaction,
bucket-count evolution (rebucket), linear and z-order clustering,
predicate DML deletes, snapshot expiry, and write-audit-publish cycles
(staged applies that publish or roll back) — must leave the engine equal
to a sequential Python oracle, keep every retained snapshot
time-travel-exact, and keep the change feed COMPOSABLE over EVERY retained
checkpoint pair:

    read_at(v1)  +  changes(v1, v2)   ==   read_at(v2)

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

import os
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from translator_ingests_spark.cdc import CdcEngine, EVENT_SCHEMA
from translator_ingests_spark.lake import dml, maintenance, wap

# soak multiplier: SPARK_GRAFT_PROP_MULT=5 scales the example budget for
# end-of-round soaks without editing this file (the settings decorator
# outranks hypothesis profiles, so an env knob is the only clean override)
_MULT = max(1, int(os.environ.get("SPARK_GRAFT_PROP_MULT", "1")))

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
             "rebucket", "cluster", "zorder", "delete_repo", "expire",
             "wap_publish", "wap_rollback"]))
        if kind in ("apply", "wap_publish", "wap_rollback"):
            n = draw(st.integers(min_value=3, max_value=8))
            evs = [
                (draw(_OPS), draw(st.sampled_from(_REPOS)),
                 draw(st.sampled_from(_PATHS)))
                for _ in range(n)
            ]
            actions.append((kind, evs))
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
@settings(max_examples=4 * _MULT, deadline=None,
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
        if act[0] in ("apply", "wap_publish", "wap_rollback"):
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
            # WAP actions run the SAME apply behind a staged marker, then
            # publish (events become visible: oracle applies them) or roll
            # back (readers never saw them: oracle unchanged, LSN block
            # burned) — interleaved with maintenance this sweeps the
            # staged-chain x rewrite x feed-window interaction family
            staged = act[0] != "apply"
            eng.table.staged_writes = staged
            try:
                eng.apply_log(spark.createDataFrame(evs, EVENT_SCHEMA),
                              events_per_batch=_BLOCK)
                if act[0] == "wap_rollback":
                    wap.rollback_staged(eng.table)
                elif act[0] == "wap_publish":
                    wap.publish_staged(eng.table)
            finally:
                eng.table.staged_writes = False
            if act[0] != "wap_rollback":
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
        elif act[0] == "zorder":
            maintenance.z_order_by(eng.table, ["lang", "commit"], bits=4)
        elif act[0] == "expire":
            maintenance.expire_snapshots(eng.table, keep_last=3)
        # checkpoint at the READER-visible version: for a WAP action that
        # is the published/rollback snapshot, never a staged chain link
        checkpoints[eng.table.current().version] = dict(oracle)

    # 1) final state equals the sequential oracle
    head = _visible(eng.table.read())
    assert head == oracle

    retained = set(eng.table.history())
    ck = sorted(v for v in checkpoints if v in retained)
    for v in ck:
        # 2) time travel is exact at every retained checkpoint, regardless
        #    of later rewrites/rebuckets/expiry (expired ones are gone by
        #    design and excluded above)
        assert _visible(eng.table.read_at(v)) == checkpoints[v], f"read_at({v})"
    # 3) the feed composes over EVERY retained checkpoint pair — not just
    #    v -> head — so windows that start or end inside staged/rolled-back
    #    regions, span rebuckets, or end on a maintenance rewrite are all
    #    exercised
    for i, v1 in enumerate(ck):
        for v2 in ck[i + 1:]:
            s1, s2 = checkpoints[v1], checkpoints[v2]
            feed = eng.table.changes(v1, v2).select(
                "repo", "path", "last_lsn", "content", "_change_type"
            ).collect()
            assert _compose(s1, feed) == s2, f"changes({v1}, {v2})"
            # 3b) every feed row must change the composed state (no
            #     spurious upserts/deletes — maintenance/rollback-only
            #     windows are not data changes)
            for r in feed:
                key = (r["repo"], r["path"])
                if r["_change_type"] == "delete":
                    assert key in s1, f"spurious delete {key} in ({v1},{v2})"
                else:
                    assert s1.get(key) != (r["last_lsn"], r["content"]), \
                        f"no-op upsert {key} in ({v1},{v2})"
