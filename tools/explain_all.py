"""Dump ``explain("formatted")`` for declared queries to a directory.

    python tools/explain_all.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt per query (all registry queries when
none are named). Used to produce the plans/r06 before/after evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]

    import __spark_entry__ as entrymod
    from translator_ingests_spark.session import get_spark

    spark = get_spark("explain_all", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)

    qs = entrymod.queries()
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going: one broken query != no evidence
            plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")


if __name__ == "__main__":
    main()
