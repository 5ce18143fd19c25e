"""Scaling-efficiency evidence: run the SAME CDC apply job on the SAME input
at two parallelism levels (local[N] and local[4N] — the sandbox stand-in for
N vs 4N executors per the driver instruction) and report throughput at both
plus efficiency = (T_N / T_4N) / 4 ... normalized so perfect scaling = 1.0.

Each level runs in a fresh subprocess (its own JVM) so the two measurements
don't share a SparkContext. Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [sf_dir] [N] [runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, __REPO__)
from translator_ingests_spark.session import get_spark
from translator_ingests_spark.cdc.apply import CdcEngine
from translator_ingests_spark.operators.cdc_queries import events_as_cdc_log

cores = int(sys.argv[1]); sf_dir = sys.argv[2]
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
log = events_as_cdc_log(spark, sf_dir).persist()
n = log.count()
# warm-up pass (JVM/codegen) on a small slice, separate table
root_w = tempfile.mkdtemp(prefix="warm_")
eng_w = CdcEngine(spark, root_w, num_buckets=32, use_arrow_normalize=False)
eng_w.apply_log(log.limit(1000), n_batches=1, total_events=1000)
shutil.rmtree(root_w, ignore_errors=True)

root = tempfile.mkdtemp(prefix="scale_")
eng = CdcEngine(spark, root, num_buckets=32, use_arrow_normalize=False)
t0 = time.monotonic()
eng.apply_log(log, n_batches=8, total_events=n)
elapsed = time.monotonic() - t0
shutil.rmtree(root, ignore_errors=True)
print(json.dumps({"cores": cores, "n_events": n, "elapsed": elapsed,
                  "events_per_sec": n / elapsed}))
"""


def run_level(cores: int, sf_dir: str) -> dict:
    script = CHILD.replace("__REPO__", repr(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf_dir],
        capture_output=True, text=True, timeout=1200,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    levels = {}
    for cores in (n, 4 * n):
        best = None
        for _ in range(runs):
            r = run_level(cores, sf_dir)
            if best is None or r["elapsed"] < best["elapsed"]:
                best = r
        levels[cores] = best
        print(f"local[{cores}]: {best['events_per_sec']:.0f} events/sec "
              f"({best['elapsed']:.1f}s over {best['n_events']} events)")

    tn, t4n = levels[n], levels[4 * n]
    speedup = tn["elapsed"] / t4n["elapsed"]
    efficiency = speedup / 4.0
    print(f"speedup {speedup:.2f}x, scaling efficiency {efficiency:.2f}")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

Same job (full CDC apply loop: validate → salted LWW reduce → vectorized
content plane → tombstoned bucket-pruned MERGE → checkpoint manifests), same
input ({sf_dir}, {tn['n_events']} derived change events), two parallelism
levels in fresh JVMs — the sandbox stand-in for N vs 4N executors per the
driver instruction. Best of {runs} runs each.

| parallelism | wall time (s) | throughput (events/sec) |
|---|---|---|
| local[{n}] (N) | {tn['elapsed']:.1f} | {tn['events_per_sec']:.0f} |
| local[{4*n}] (4N) | {t4n['elapsed']:.1f} | {t4n['events_per_sec']:.0f} |

- speedup N→4N: **{speedup:.2f}×**
- scaling efficiency (speedup / 4): **{efficiency:.2f}** (target ≥ 0.8)

Caveats: local mode shares one JVM heap and one host's page cache; shuffle is
in-process. On a real 4N-executor cluster the same plan shuffles over the
network but also gets 4× the aggregate memory bandwidth and disk — the
partitioning strategy (hash on (repo,path), {32} lake buckets, AQE skew
splitting, salted hot-key reduce) is what carries the efficiency there.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
