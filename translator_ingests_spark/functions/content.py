"""Vectorized content plane: normalization + digesting.

Per the target invariant, every row of the lake table carries
``content_sha256 = sha2(normalize(content), 256)`` and replay equality is
checked per row on that digest. Two rules:

- **Zero per-row Python.** Normalization is a pandas UDF over Arrow batches
  using vectorized ``pd.Series.str`` ops (the reference streams dict-per-row
  Python at /root/reference/src/translator_ingest/_ingest_template/_ingest_template.py:99-123 —
  the one pattern we deliberately do not reproduce).
- **Digesting stays JVM-side** (``F.sha2`` inside whole-stage codegen) — no
  Python round-trip at all for the hash.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# returnType passed as a DataType object (not a DDL string) so importing this
# module does not require an active SparkContext
@pandas_udf(T.StringType())
def normalize_content_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched content normalization: unicode NFC + \\r\\n|\\r → \\n.

    All ops are vectorized pandas string kernels over the Arrow batch;
    nulls pass through.
    """
    out = s.str.normalize("NFC")
    out = out.str.replace("\r\n", "\n", regex=False).str.replace("\r", "\n", regex=False)
    return out


def normalize_content(col: Column, use_arrow_udf: bool = True) -> Column:
    """Normalized content column.

    ``use_arrow_udf=False`` gives a pure-JVM fallback (line endings only — no
    NFC; correct when the corpus is known-ASCII, e.g. the synthetic log) that
    keeps the whole plan inside codegen.
    """
    if use_arrow_udf:
        return normalize_content_udf(col)
    return F.regexp_replace(F.regexp_replace(col, "\r\n", "\n"), "\r", "\n")


def content_digest(col: Column) -> Column:
    """Per-row invariant digest: lowercase-hex sha256 (JVM-side)."""
    return F.sha2(col, 256)


def normalize_py(text: str | None) -> str | None:
    """Driver/oracle-side reference implementation of the same normalization
    (used by the pandas/duckdb test oracles, never in the Spark plan)."""
    if text is None:
        return None
    t = unicodedata.normalize("NFC", text)
    return t.replace("\r\n", "\n").replace("\r", "\n")
