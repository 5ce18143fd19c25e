"""Similarity search over the ``embeddings`` table (array<float> column):
brute-force cosine top-k as the exact baseline, and a sign-bucket LSH
variant as the scale path (candidate generation by bucket equality join
instead of a full cross join).

Cosine is computed with an explicit index-order fold (cast each float to
double, multiply, left-fold sum) so Spark and the DuckDB oracle produce
bit-identical doubles — no reliance on engine-internal cosine functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# DuckDB equivalents with identical fold order (index order, double math)
_DOT_SQL = (
    "list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE "
    "FOR i IN range(1, len(a.embedding) + 1)])"
)


def _norm_sql(alias: str) -> str:
    return (
        f"sqrt(list_sum([{alias}.embedding[i]::DOUBLE * {alias}.embedding[i]::DOUBLE "
        f"FOR i IN range(1, len({alias}.embedding) + 1)]))"
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-5 cosine neighbors for the first 10 vectors.

    The query side is tiny → broadcast it; the corpus side streams. At 100 TB
    this is the per-partition scan pattern: broadcast queries, map-side
    score, per-query top-k via partial aggregation (window over small key
    space), no corpus shuffle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
            ).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "rank", "c_id", F.round("cos", 6).alias("cosine"))
        .orderBy("q_id", "rank")
    )


ANN_COSINE_TOPK_SQL = f"""
WITH scored AS (
  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         {_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('b')}) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < {_N_QUERIES}
   AND a.vec_id <> b.vec_id
), ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, rank, c_id, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {_TOP_K}
ORDER BY q_id, rank
"""


_N_PLANES = 6  # sign bits of the first 6 dims → 64 buckets


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed LSH ANN: bucket = sign pattern of the first 6 dimensions
    (orthant prefix); candidates = same-bucket pairs; exact cosine re-rank
    within the bucket. Returns each query's top-3 same-bucket neighbors.

    The scale property: candidate generation is an equality join on the
    bucket key — shuffle ∝ bucket collisions, never docs². (An IVF variant
    swaps the sign pattern for a nearest-centroid id; same join shape.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bucket = F.concat(
        *[
            F.when(F.element_at(F.col("embedding"), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(_N_PLANES)
        ]
    )
    e = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("q_bucket") == F.col("c_bucket")) & (F.col("q_id") != F.col("c_id")),
        )
        .select(
            "q_id",
            "c_id",
            (
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
            ).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "rank", "c_id", F.round("cos", 6).alias("cosine"))
        .orderBy("q_id", "rank")
    )


_BUCKET_SQL = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(_N_PLANES)
) + ")"

ANN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
), scored AS (
  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         {_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('b')}) AS cos
  FROM e a JOIN e b
    ON a.bucket = b.bucket AND a.vec_id < {_N_QUERIES} AND a.vec_id <> b.vec_id
), ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, rank, c_id, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 3
ORDER BY q_id, rank
"""


def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4) within LSH
    buckets — the near-dup variant of the bucketed join (pairs outside a
    shared bucket are not compared, by design)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bucket = F.concat(
        *[
            F.when(F.element_at(F.col("embedding"), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(4)
        ]
    )
    e = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    a = e.select(*[F.col(c).alias(f"a_{c}") for c in e.columns])
    b = e.select(*[F.col(c).alias(f"b_{c}") for c in e.columns])
    return (
        a.join(b, (F.col("a_bucket") == F.col("b_bucket"))
               & (F.col("a_vec_id") < F.col("b_vec_id")))
        .select(
            F.col("a_vec_id").alias("vec_a"),
            F.col("b_vec_id").alias("vec_b"),
            (
                _dot(F.col("a_embedding"), F.col("b_embedding"))
                / (_norm(F.col("a_embedding")) * _norm(F.col("b_embedding")))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


_BUCKET4_SQL = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(4)
) + ")"

EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, {_BUCKET4_SQL} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('b')}), 6) AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('b')}) >= 0.4
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "ann_lsh_bucketed": (ann_lsh_bucketed, ANN_LSH_SQL),
    "embedding_cosine_neardup": (embedding_cosine_neardup, EMBEDDING_NEARDUP_SQL),
}
