"""Minimal repro probes for the map-leg CPU inflation at 8 vs 2 pinned cores.

Each probe is a self-contained child process (fresh JVM, taskset-pinned)
running ONE plan shape over the same parquet input; we report thread-CPU
(per-tree /proc accounting) at both levels. Discriminates:

  scanhash   — parquet scan + sha2 + count            (no shuffle)
  shuffle    — scan + repartition(64) + noop sink     (shuffle write+read)
  shufhash   — scan + sha2 + repartition(64) + noop   (the apply map leg)
  reduce     — scan + LWW max_by groupBy + noop       (the apply reduce leg)

Usage: python tools/probe_map_leg.py [n_events] [probe ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys, tempfile
sys.path.insert(0, __REPO__)
from translator_ingests_spark.session import get_spark
from translator_ingests_spark.cdc.generator import generate_event_log

n_ev = int(sys.argv[1]); out = sys.argv[2]
spark = get_spark("gen", cores=16, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
log = generate_event_log(
    spark, n_ev, seed=42, n_repos=500, n_mega_repos=2,
    hot_fraction=0.3, paths_per_repo=200, n_spark_partitions=64,
    content_repeat=2,
)
log.write.mode("overwrite").parquet(out)
"""

CHILD = r"""
import glob, json, os, sys, time
sys.path.insert(0, __REPO__)
from translator_ingests_spark.session import get_spark
from pyspark.sql import functions as F

def tree_cpu():
    me = os.getpid(); ppid = {}
    for st in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(st).read().rsplit(")", 1)[1].split()
            ppid[int(st.split("/")[2])] = (int(parts[1]), int(parts[11]) + int(parts[12]))
        except Exception:
            pass
    def mine(pid):
        seen = set()
        while pid > 1 and pid not in seen:
            if pid == me:
                return True
            seen.add(pid); pid = ppid.get(pid, (0, 0))[0]
        return False
    return sum(t for pid, (pp, t) in ppid.items() if mine(pid)) / 100.0

cores = int(sys.argv[1]); probe = sys.argv[2]; src = sys.argv[3]
GC = "-XX:+UnlockExperimentalVMOptions -XX:G1NewSizePercent=50 -XX:G1MaxNewSizePercent=70"
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
extra = {"spark.driver.extraJavaOptions": GC}
if os.environ.get("PROF_LOCAL_DIR"):
    extra["spark.local.dir"] = os.environ["PROF_LOCAL_DIR"]
spark = get_spark("probe", cores=cores, shuffle_partitions=64, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(src)

def run():
    d = spark.read.parquet(src)
    if probe == "scanhash":
        d.select(F.sha2(F.col("content"), 256).alias("h")).select(
            F.count(F.col("h"))).collect()
    elif probe == "shuffle":
        d.repartition(64, "repo", "path").write.format("noop").mode(
            "overwrite").save()
    elif probe == "shufhash":
        d.withColumn("h", F.sha2(F.col("content"), 256)).repartition(
            64, "repo", "path").write.format("noop").mode("overwrite").save()
    elif probe == "reduce":
        d.groupBy("repo", "path").agg(
            F.max_by(F.struct("lsn", "content"), "lsn").alias("s")
        ).write.format("noop").mode("overwrite").save()
    else:
        raise SystemExit(f"unknown probe {probe}")

run()  # warm-up (codegen, parquet footer cache)
c0 = tree_cpu(); t0 = time.monotonic()
run()
el = time.monotonic() - t0; c1 = tree_cpu()
print(json.dumps({"probe": probe, "cores": cores, "elapsed": round(el, 2),
                  "cpu": round(c1 - c0, 1)}))
spark.stop()
"""


def main():
    n_ev = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    probes = sys.argv[2:] or ["scanhash", "shuffle", "shufhash", "reduce"]

    src = tempfile.mkdtemp(prefix="probelog_") + "/log.parquet"
    gen = GEN.replace("__REPO__", repr(REPO))
    subprocess.run([sys.executable, "-c", gen, str(n_ev), src], check=True,
                   capture_output=True, text=True, timeout=1200)

    child = CHILD.replace("__REPO__", repr(REPO))
    for probe in probes:
        res = {}
        for cores in (2, 8):
            cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
                   child, str(cores), probe, src]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1800)
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                sys.stderr.write(out.stderr[-2000:])
                raise RuntimeError(f"probe {probe} cores {cores} failed")
            res[cores] = json.loads(lines[-1])
        r2, r8 = res[2], res[8]
        sp = r2["elapsed"] / r8["elapsed"]
        infl = r8["cpu"] / max(r2["cpu"], 0.1)
        print(f"{probe:>9}: local[2] {r2['elapsed']:6.1f}s cpu {r2['cpu']:6.1f} | "
              f"local[8] {r8['elapsed']:6.1f}s cpu {r8['cpu']:6.1f} | "
              f"speedup {sp:4.2f}x eff {sp / 4:4.2f} cpu-inflation {infl:4.2f}x")


if __name__ == "__main__":
    main()
