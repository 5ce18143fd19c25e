"""Package the engine for spark-submit --py-files: one zip of the package.

Usage: python tools/make_pyfiles.py [out.zip]
Then:  spark-submit --py-files translator_ingests_spark.zip jobs/apply_log_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "translator_ingests_spark.zip")
    pkg = os.path.join(REPO, "translator_ingests_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
