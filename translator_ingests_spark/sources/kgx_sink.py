"""S12: the KGX-shaped JSONL sink — nodes + edges tables written as
line-delimited JSON under the reference's canonical file names
(normalized_nodes.jsonl etc., /root/reference/src/translator_ingest/util/storage/local.py:30-46),
published atomically (release.py:20-48).

Spark writes JSONL as a distributed directory; ``single_file=True``
coalesces to the reference's one-file layout (test scale / final export
only — at 100 TB you keep the sharded directory and publish the manifest)."""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame

CANONICAL_NAMES = {
    "nodes": "{stage}_nodes.jsonl",
    "edges": "{stage}_edges.jsonl",
}


def write_kgx(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    stage: str = "normalized",
    single_file: bool = False,
) -> dict:
    """Write the two KGX tables; returns {'nodes': path, 'edges': path}.

    The write lands in a temp directory and is moved into place with an
    atomic rename per table — readers of ``out_dir`` never observe a
    half-written stage."""
    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for name, df in (("nodes", nodes), ("edges", edges)):
        fname = CANONICAL_NAMES[name].format(stage=stage)
        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
        writer = df.coalesce(1) if single_file else df
        writer.write.mode("overwrite").json(tmp)
        target = os.path.join(out_dir, fname)
        if single_file:
            part = glob.glob(os.path.join(tmp, "part-*.json"))[0]
            os.replace(part, target)  # atomic swap of the single file
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            if os.path.isdir(target):
                shutil.rmtree(target)
            os.replace(tmp, target)  # atomic dir rename
        out[name] = target
    return out
