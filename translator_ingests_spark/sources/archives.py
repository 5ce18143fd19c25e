"""S7: tar.gz member streaming scan (reference: ubergraph.py:120-187 and
panther_orthologs_utils.py:156-167 stream TSV members out of tarballs
without full extraction).

Spark-side: ``binaryFile`` scan distributes the archives across executors;
``mapInPandas`` unpacks members and emits parsed rows per Arrow batch — the
archive bytes never land on the driver, and each executor streams members
through ``tarfile`` in memory. Typed columns are cast after parse (same
declared-schema rule as every other source)."""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
}


def read_targz_members(
    spark: SparkSession,
    path: str,
    columns: list[tuple[str, str]],
    member_suffix: str = ".tsv",
    delimiter: str = "\t",
    skip_header: bool = False,
) -> DataFrame:
    """Stream delimited members of tar.gz archives into a typed DataFrame."""
    names = [n for n, _t in columns]
    parse_schema = T.StructType(
        [T.StructField("_member", T.StringType(), True)]
        + [T.StructField(n, T.StringType(), True) for n in names]
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: list[list] = []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
                    for member in tf.getmembers():
                        if not member.isfile() or not member.name.endswith(member_suffix):
                            continue
                        fh = tf.extractfile(member)
                        if fh is None:
                            continue
                        text = fh.read().decode("utf-8", errors="replace")
                        lines = text.splitlines()
                        if skip_header and lines:
                            lines = lines[1:]
                        for line in lines:
                            if not line:
                                continue
                            parts = line.split(delimiter)
                            parts = (parts + [None] * len(names))[: len(names)]
                            out_rows.append([member.name, *parts])
            yield pd.DataFrame(out_rows, columns=["_member"] + names)

    raw = spark.read.format("binaryFile").load(path).select("content")
    parsed = raw.mapInPandas(unpack, parse_schema)
    return parsed.select(
        "_member", *[F.col(n).cast(_TYPES[t]).alias(n) for n, t in columns]
    )
