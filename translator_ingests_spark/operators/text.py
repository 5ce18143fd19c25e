"""Text-analysis operators over the ``documents`` table — the text plane a
large-scale training-data pipeline needs: token counting, quality scoring,
n-gram/stopword language ID, and document fingerprinting.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen — zero Python in the hot path); each has an equivalent
DuckDB oracle so the driver's value-hash gate covers them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from translator_ingests_spark.operators.scan_util import load_documents

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
STOP_DE = ["der", "die", "das", "und", "ist", "zu", "den", "mit", "von", "ein"]
STOP_FR = ["le", "la", "les", "et", "est", "un", "une", "des", "du", "pour"]

_TOKEN_RE = "[^a-zA-Z0-9]+"  # BPE-ish word splitter (shared with oracles)


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_RE), lambda x: x != "")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/regex token counting per document."""
    docs = load_documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
            F.length("text").alias("n_chars_computed"),
        )
        .orderBy("doc_id")
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
                       x -> x <> '')) AS n_tokens,
       len(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
           x -> x <> ''))) AS n_unique_tokens,
       length(text) AS n_chars_computed
FROM documents
ORDER BY doc_id
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio, mean
    token length — the gates a pretraining pipeline filters on."""
    docs = load_documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOP_EN)))
    punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            n_tok.alias("n_tokens"),
            F.round(punct / F.length("text"), 4).alias("punct_ratio"),
            F.round(stop_hits / n_tok, 4).alias("stopword_ratio"),
            F.round(
                (F.length(F.regexp_replace(F.col("text"), _TOKEN_RE, "")) / n_tok), 4
            ).alias("mean_token_len"),
            (
                (F.length("text") >= 100)
                & (n_tok >= 20)
                & ((stop_hits / n_tok) >= 0.02)
            ).alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


_STOP_EN_SQL = "['" + "','".join(STOP_EN) + "']"
_STOP_DE_SQL = "['" + "','".join(STOP_DE) + "']"
_STOP_FR_SQL = "['" + "','".join(STOP_FR) + "']"

TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_tokens,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
             / length(text), 4) AS punct_ratio,
       round(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) * 1.0
             / len(toks), 4) AS stopword_ratio,
       round(length(regexp_replace(text, '[^a-zA-Z0-9]+', '', 'g')) * 1.0
             / len(toks), 4) AS mean_token_len,
       (length(text) >= 100 AND len(toks) >= 20
        AND len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) * 1.0
            / len(toks) >= 0.02) AS passes_quality
FROM t
ORDER BY doc_id
"""


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score each language by distinct-stopword
    hits, argmax with deterministic tie order (en > de > fr > unknown)."""
    docs = load_documents(spark, sf_dir)
    toks = F.array_distinct(_tokens(F.col("text")))
    s_en = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOP_EN])))
    s_de = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOP_DE])))
    s_fr = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOP_FR])))
    pred = (
        F.when((s_en == 0) & (s_de == 0) & (s_fr == 0), F.lit("unknown"))
        .when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        docs.select(
            "doc_id",
            s_en.alias("score_en"),
            s_de.alias("score_de"),
            s_fr.alias("score_fr"),
            pred.alias("lang_pred"),
            "lang",
        )
        .orderBy("doc_id")
    )


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
             x -> x <> '')) AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang,
         len(list_intersect(toks, {_STOP_EN_SQL})) AS score_en,
         len(list_intersect(toks, {_STOP_DE_SQL})) AS score_de,
         len(list_intersect(toks, {_STOP_FR_SQL})) AS score_fr
  FROM t
)
SELECT doc_id, score_en, score_de, score_fr,
       CASE WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 THEN 'unknown'
            WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_fr THEN 'de'
            ELSE 'fr' END AS lang_pred,
       lang
FROM s
ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: md5 each distinct token, keep the 4
    smallest hashes (the sketch), fingerprint = md5 of their join — a
    deterministic rolling-hash-style document signature."""
    docs = load_documents(spark, sf_dir)
    tok_hashes = F.sort_array(
        F.transform(F.array_distinct(_tokens(F.col("text"))), lambda x: F.md5(x))
    )
    sketch = F.slice(tok_hashes, 1, 4)
    return (
        docs.select(
            "doc_id",
            F.md5(F.concat_ws("|", sketch)).alias("fingerprint"),
            F.element_at(sketch, 1).alias("min_hash"),
        )
        .orderBy("doc_id")
    )


DOC_FINGERPRINT_SQL = """
WITH t AS (
  SELECT doc_id,
         list_sort(list_transform(
             list_distinct(list_filter(
                 regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
                 x -> x <> '')),
             x -> md5(x)))[1:4] AS sketch
  FROM documents
)
SELECT doc_id,
       md5(array_to_string(sketch, '|')) AS fingerprint,
       sketch[1] AS min_hash
FROM t
ORDER BY doc_id
"""


def content_sha256_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row content digest invariant over documents (JVM sha2 —
    matches DuckDB sha256 byte-for-byte)."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
    ).orderBy("doc_id")


CONTENT_SHA256_SQL = """
SELECT doc_id, sha256(text) AS content_sha256
FROM documents ORDER BY doc_id
"""


def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite per-document text analysis — token counting, quality
    heuristics and stopword-profile language ID in ONE scan of the
    documents table (the production shape: a pretraining pipeline computes
    every per-doc metric in a single pass). Registered as the driver-gated
    composite for the token_count / text_quality_score / lang_id_ngram
    operators, all of which stay individually exported for bench/pytest."""
    docs = load_documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    dtoks = F.array_distinct(toks)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOP_EN)))
    punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    s_en = F.size(F.array_intersect(dtoks, F.array(*[F.lit(w) for w in STOP_EN])))
    s_de = F.size(F.array_intersect(dtoks, F.array(*[F.lit(w) for w in STOP_DE])))
    s_fr = F.size(F.array_intersect(dtoks, F.array(*[F.lit(w) for w in STOP_FR])))
    pred = (
        F.when((s_en == 0) & (s_de == 0) & (s_fr == 0), F.lit("unknown"))
        .when((s_en >= s_de) & (s_en >= s_fr), F.lit("en"))
        .when(s_de >= s_fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        docs.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            F.size(dtoks).alias("n_unique_tokens"),
            F.round(punct / F.length("text"), 4).alias("punct_ratio"),
            F.round(stop_hits / n_tok, 4).alias("stopword_ratio"),
            (
                (F.length("text") >= 100)
                & (n_tok >= 20)
                & ((stop_hits / n_tok) >= 0.02)
            ).alias("passes_quality"),
            pred.alias("lang_pred"),
        )
        .orderBy("doc_id")
    )


TEXT_METRICS_SQL = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), d AS (
  SELECT doc_id, text, toks, list_distinct(toks) AS dtoks FROM t
), s AS (
  SELECT doc_id, text, toks, dtoks,
         len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) AS stop_hits,
         len(list_intersect(dtoks, {_STOP_EN_SQL})) AS score_en,
         len(list_intersect(dtoks, {_STOP_DE_SQL})) AS score_de,
         len(list_intersect(dtoks, {_STOP_FR_SQL})) AS score_fr
  FROM d
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(dtoks) AS n_unique_tokens,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
             / length(text), 4) AS punct_ratio,
       round(stop_hits * 1.0 / len(toks), 4) AS stopword_ratio,
       (length(text) >= 100 AND len(toks) >= 20
        AND stop_hits * 1.0 / len(toks) >= 0.02) AS passes_quality,
       CASE WHEN score_en = 0 AND score_de = 0 AND score_fr = 0 THEN 'unknown'
            WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_fr THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM s
ORDER BY doc_id
"""


# token_count / text_quality_score / lang_id_ngram are driver-gated through
# the text_metrics composite (one scan, all per-doc metrics) so every
# oracle-able operator fits the driver's 50-entry cap; the individual
# queries remain exported for bench and pytest.
QUERIES = {
    "text_metrics": (text_metrics, TEXT_METRICS_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "content_sha256_invariant": (content_sha256_invariant, CONTENT_SHA256_SQL),
}
