"""Measurement-environment health probe for scaling runs.

The N-vs-4N scaling evidence is only meaningful if the host can actually
feed 4N cores. On a multi-tenant VM two independent ceilings move under us:

1. **CPU**: other tenants / frequency policy. Probed with a cache-resident
   sha256 loop (no DRAM pressure) at 2 vs 8 pinned cores — per-core
   throughput should be flat (ratio ~1.0).
2. **DRAM bandwidth**: the hypervisor's share for this VM. Probed with a
   cache-busting 64 MB memcpy loop at 2 and 8 pinned cores. If the
   aggregate plateaus between 2 and 8 procs, memory-heavy JVM stages
   CANNOT scale on this host *right now* regardless of plan quality —
   the scaling harness stamps this into BASELINE.md so a depressed
   efficiency number is attributable to the environment, not the engine.

Both probes use multiprocessing (not threads) so the GIL is irrelevant,
and taskset pinning mirrors the scaling children's cgroup model.

Usage:  python tools/probe_membw.py            # human-readable
        python tools/probe_membw.py --json     # one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD_CPU = r"""
import hashlib, sys, time
n = int(sys.argv[1])
h = b"x" * 4096
t0 = time.time()                      # timed INSIDE: startup excluded
for _ in range(n):
    h = hashlib.sha256(h).digest() + b"y" * 4064
print(n / (time.time() - t0) / 1e6)  # Mhash/s, this proc
"""

_CHILD_BW = r"""
import sys, time
import numpy as np
n = int(sys.argv[1])
a = np.zeros(64_000_000, dtype=np.uint8)   # 64 MB >> LLC: forced DRAM
b = np.ones(64_000_000, dtype=np.uint8)
a[:] = b                                   # warm / fault pages
t0 = time.time()
for _ in range(n):
    a[:] = b
print(n * 2 * 0.064 / (time.time() - t0))  # GB/s, this proc
"""


def _run_pinned(child_src: str, n_procs: int, iters: int) -> float:
    """Run n_procs pinned children concurrently; each measures its own
    steady-state rate (startup excluded). Returns the SUM of their rates."""
    cmd = ["taskset", "-c", f"0-{max(n_procs - 1, 1)}", sys.executable,
           "-c", child_src, str(iters)]
    procs = [
        subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
        for _ in range(n_procs)
    ]
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += float(out.strip().splitlines()[-1])
    return total


def probe(quick: bool = False) -> dict:
    cpu_iters = 500_000 if quick else 1_500_000
    bw_iters = 15 if quick else 40

    out: dict = {"nproc": os.cpu_count(), "ts": round(time.time(), 1)}

    # CPU health: per-core Mhash/s at 2 vs 8 pinned cores (cache-resident —
    # flat per-core rate unless frequency/tenant pressure)
    agg2 = _run_pinned(_CHILD_CPU, 2, cpu_iters)
    agg8 = _run_pinned(_CHILD_CPU, 8, cpu_iters)
    out["cpu_percore_mhash_2p"] = round(agg2 / 2, 3)
    out["cpu_percore_mhash_8p"] = round(agg8 / 8, 3)
    out["cpu_scaling_2_to_8"] = round((agg8 / 8) / (agg2 / 2), 3)

    # DRAM bandwidth: aggregate GB/s at 2 vs 8 pinned cores
    agg2 = _run_pinned(_CHILD_BW, 2, bw_iters)
    agg8 = _run_pinned(_CHILD_BW, 8, bw_iters)
    out["membw_aggregate_gbps_2p"] = round(agg2, 1)
    out["membw_aggregate_gbps_8p"] = round(agg8, 1)
    # 1.0 = bandwidth quadruples with cores (unconstrained);
    # 0.25 = hard plateau (8 cores share the 2-core ceiling)
    out["membw_scaling_2_to_8"] = round(agg8 / agg2 / 4.0, 3)
    out["bandwidth_bound"] = out["membw_scaling_2_to_8"] < 0.6
    return out


def main() -> None:
    res = probe()
    if "--json" in sys.argv:
        print(json.dumps(res))
        return
    print(f"cpu per-core:   {res['cpu_percore_mhash_2p']} Mhash/s @2p  "
          f"{res['cpu_percore_mhash_8p']} Mhash/s @8p  "
          f"(scaling {res['cpu_scaling_2_to_8']})")
    print(f"DRAM aggregate: {res['membw_aggregate_gbps_2p']} GB/s @2p  "
          f"{res['membw_aggregate_gbps_8p']} GB/s @8p  "
          f"(scaling {res['membw_scaling_2_to_8']})")
    if res["bandwidth_bound"]:
        print("WARNING: host DRAM bandwidth plateaus below 8 cores — "
              "memory-heavy stages cannot scale on this host right now; "
              "scaling efficiency measured in this window understates "
              "the engine.")


if __name__ == "__main__":
    main()
