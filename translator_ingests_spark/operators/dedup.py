"""Deduplication operators over ``documents`` — the dedup family a
large-scale training-data pipeline needs: exact (hash groupBy), n-gram
Jaccard, MinHash+LSH banding, SimHash, and embedding-cosine near-dup.

Scale notes (the point of each design):
- exact dedup is one hash aggregate — map-side combinable, one shuffle;
- n-gram Jaccard avoids the O(n²) cross join by exploding shingles and
  self-joining on the shingle (candidate pairs only share ≥1 shingle);
- MinHash+LSH reduces that further: only pairs sharing an LSH *band bucket*
  are candidates — the shuffle key is the band, so cost scales with
  collisions, not documents²;
- SimHash buckets by a single 16-bit signature (equality join);
- embedding near-dup shown as bucketed-LSH in similarity.py.

All hashing is md5/sha2 (identical in DuckDB) so each operator has a full
value-hash oracle — no engine-specific hash functions in results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from translator_ingests_spark.operators.scan_util import load_documents

_TOKEN_RE = "[^a-zA-Z0-9]+"

# Persisted intermediates, keyed by operator tag. A dedup operator persists
# its shared subtree (multiple consumers branch from it) but cannot
# unpersist before returning — the returned DataFrame depends on the
# cached plan. Left alone, each invocation leaks one MEMORY_AND_DISK copy
# per call (bench.py alone calls each query 4× in one session). The swap
# registry bounds that to ONE live copy per operator: the next call of the
# same operator releases the previous call's handle (the old returned DF
# stays correct — it just recomputes if re-evaluated), and callers that
# want a clean session call :func:`release_cached`.
_CACHED: dict[str, DataFrame] = {}


def _register_cached(tag: str, df: DataFrame) -> DataFrame:
    """Record an already-persisted ``df`` under ``tag``, releasing the
    previous holder of the tag — UNLESS the two share an analyzed plan:
    Spark's CacheManager dedupes cache entries on plan equality, so a
    same-plan re-invocation shares one entry and unpersisting the old
    handle would drop the new one's data too (no leak in that case — one
    entry serves both)."""
    prev = _CACHED.pop(tag, None)
    if prev is not None:
        try:
            same = (
                prev._jdf.queryExecution().analyzed()
                .sameResult(df._jdf.queryExecution().analyzed())
            )
        except Exception:
            same = False
        if not same:
            try:
                prev.unpersist()
            except Exception:
                pass
    _CACHED[tag] = df
    return df


def _persist_swap(tag: str, df: DataFrame, storage_level=None) -> DataFrame:
    from pyspark import StorageLevel

    return _register_cached(
        tag, df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    )


def release_cached() -> None:
    """Unpersist every intermediate the dedup operators have cached."""
    for df in list(_CACHED.values()):
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHED.clear()

_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-zA-Z0-9]+'), x -> x <> '')"
)


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_RE), lambda x: x != "")


def _shingles(toks, k: int = 3):
    """Distinct k-word shingles as strings from a BOUND token-array column.

    ``toks`` must be a column *reference* (a projected attribute), never the
    tokenization expression tree itself: higher-order-function lambdas are
    interpreted, and an expression subtree referenced inside the lambda is
    re-evaluated per element — inlining ``_tokens(text)`` here re-ran the
    regex split ~3×len(toks) times per row (measured 25× slower at sf1).
    Callers go through :func:`_shingle_rows`, which projects the tokens
    first so ``element_at`` binds to a materialized array."""
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingle_rows(docs) -> DataFrame:
    """(doc_id, shingle) rows, serving jaccard AND minhash candidate
    generation. Served by the Arrow kernel: the shingle construction
    (sequence + transform + 3×element_at + array_distinct) is interpreted
    HOF territory — measured 266µs/doc at sf1 even with the token array
    bound once — while the batch-vectorized form is a plain set
    comprehension per doc. :func:`_shingle_rows_expr` is kept as the
    parity reference with a pytest asserting identical rows."""
    return _shingle_rows_arrow(docs)


def _shingle_rows_arrow(docs) -> DataFrame:
    """Arrow implementation: per batch, tokenize with the same
    [^a-z0-9]+ split on lower() and emit each doc's DISTINCT 3-gram
    shingles — bit-identical rows to :func:`_shingle_rows_expr`."""

    def gen(batches):
        import re

        import pandas as pd

        tok_re = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            ids, shingles = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"].astype(object)):
                if text is None or not isinstance(text, str):
                    continue
                toks = [t for t in tok_re.split(text.lower()) if t]
                if len(toks) < 3:
                    continue
                seen = {
                    f"{toks[i]} {toks[i + 1]} {toks[i + 2]}"
                    for i in range(len(toks) - 2)
                }
                ids.extend([doc_id] * len(seen))
                shingles.extend(seen)
            yield pd.DataFrame({"doc_id": ids, "shingle": shingles})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, shingle string"
    )


def _shingle_rows_expr(docs) -> DataFrame:
    """Pure-expression shingle rows (the oracle-parity reference) — tokens
    projected as a real attribute first (see :func:`_shingles` for why the
    two-step projection is load-bearing; CollapseProject keeps it because
    the token array is referenced more than once and is not a cheap
    expression)."""
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("__toks"))
    return toks.select(
        "doc_id", F.explode(_shingles(F.col("__toks"))).alias("shingle")
    )


# shingles in DuckDB (1-indexed lists)
_SHINGLES_SQL = f"""
  CASE WHEN len({_TOKS_SQL}) >= 3 THEN
    list_distinct([concat_ws(' ', {_TOKS_SQL}[i], {_TOKS_SQL}[i+1], {_TOKS_SQL}[i+2])
                   FOR i IN range(1, len({_TOKS_SQL}) - 1)])
  ELSE [] END
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: groups of byte-identical documents,
    deterministic survivor = min doc_id (A7/A8 analog at content scale —
    one hash aggregate, no join)."""
    docs = load_documents(spark, sf_dir)
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("content_sha256"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("survivor_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS content_sha256,
       min(doc_id) AS survivor_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY sha256(text)
ORDER BY survivor_doc_id
"""


# document-frequency cap: shingles occurring in more than this many documents
# are "stop shingles" — excluded from the similarity computation entirely
# (intersections AND sizes, so Jaccard stays well-defined and oracle-matched).
# One stop-shingle shared by 10^6 docs would otherwise explode the self-join
# quadratically; with the cap, candidate pairs per shingle are bounded by
# DF_CAP², so total candidates ≤ n_kept_shingles × DF_CAP².
_DF_CAP = 64


def _capped_shingles(docs) -> DataFrame:
    """(doc_id, shingle) pairs with stop-shingles (document frequency >
    _DF_CAP) removed. The stop list is tiny (≤ total_occurrences / DF_CAP
    entries), so it broadcasts — the exclusion join is map-side."""
    sh = _shingle_rows(docs)
    stop = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _DF_CAP)
        .select("shingle")
    )
    return sh.join(F.broadcast(stop), "shingle", "left_anti")


# the same cap in DuckDB: inner-join to the kept-shingle list
_CAPPED_SH_CTE = f"""
sh0 AS (
  SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle
  FROM documents
), kept AS (
  SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {_DF_CAP}
), sh AS (
  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN kept USING (shingle)
)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram shingle Jaccard ≥ 0.5 over the DF-capped
    shingle set.

    Candidate generation by shingle co-occurrence — never a doc×doc cross
    join: co-occurring docs are grouped per shingle and candidate pairs are
    generated in-array per group, so there is no second scan of the shingle
    stream and no join shuffle; the document-frequency cap (``_DF_CAP``)
    bounds the per-shingle blowup to DF_CAP² pairs.

    The DF cap MUST be applied before ``collect_list`` (via
    :func:`_capped_shingles`'s broadcast stop-list anti-join): filtering on
    the collected group's size would first materialize a universal
    stop-shingle's FULL doc list in one aggregation buffer — O(corpus) on a
    single executor at web scale. The pre-filter's own count aggregation is
    map-side combinable (no arrays), so every array that reaches a buffer
    holds ≤ DF_CAP ids by construction."""
    docs = load_documents(spark, sf_dir)
    sh = _capped_shingles(docs)
    # persisted because BOTH consumers below (sizes, pairs) branch from it
    # and Spark materializes shared DataFrame subtrees once per consumer —
    # without it the tokenize + stop-list + group pipeline runs twice
    # (ReusedExchange does not fire across the differing projections).
    # MEMORY_AND_DISK: at scale this is ~the group shuffle's output, so the
    # spill cost is bounded by one extra shuffle write, strictly cheaper
    # than recomputing the upstream.
    groups = _persist_swap(
        "ngram_jaccard_groups",
        sh.groupBy("shingle").agg(
            F.sort_array(F.collect_list("doc_id")).alias("ds")
        ),
    )
    # per-doc kept-shingle counts: one row per doc — AQE broadcasts this
    # side when it fits (it always does relative to the pair stream)
    sizes = (
        groups.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # candidate pairs generated IN-ARRAY per group (sorted ds ⇒ doc_a <
    # doc_b for free) — replaces the shingle self-join: no second scan of
    # the shingle stream, no join shuffle, and the per-group blowup is
    # bounded by DF_CAP² by construction. ds is a bound attribute here, so
    # the nested lambdas index a materialized array (see _shingles note).
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_inter"))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    out = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )
    return out


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {_CAPPED_SH_CTE}, sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
ORDER BY doc_a, doc_b
"""


_N_HASHES = 8  # minhash signature length
_N_BANDS = 4   # bands of 2 rows each


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding: signature = min over shingles of
    md5(seed‖shingle) for 8 seeds; 4 bands of 2 → candidate pairs share a
    band bucket. Returns candidate pairs (doc_a, doc_b, n_shared_bands).

    The expensive join keys on the *band value* — at scale the shuffle is
    O(docs × bands) and pair blowup is bounded by bucket collisions, which
    is the whole point of LSH vs the Jaccard self-join above."""
    docs = load_documents(spark, sf_dir)
    # explode shingles ONCE (stop-shingles DF-capped like the Jaccard path —
    # a universal shingle would otherwise drag every signature toward the
    # same minima and pile all docs into the same band buckets), then compute
    # all 8 min-hashes in one map-side-combinable aggregation — never
    # re-evaluate the tokenization per seed (a nested array-transform
    # formulation re-evaluates the shingle expression per signature row and
    # is ~50× slower)
    sh = _capped_shingles(docs)
    minh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(str(s)), F.lit("|"), F.col("shingle")))).alias(f"h{s}")
            for s in range(_N_HASHES)
        ]
    )
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("|", F.lit(str(j)), F.col(f"h{2 * j}"), F.col(f"h{2 * j + 1}")))
            for j in range(_N_BANDS)
        ]
    )
    sigs = minh.select("doc_id", F.explode(band_arr).alias("band"))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


_SIG_SQL = ", ".join(
    f"list_aggregate(list_transform(sh, x -> md5(concat('{s}', '|', x))), 'min')"
    for s in range(_N_HASHES)
)
_BANDS_SQL = ", ".join(
    f"md5(concat_ws('|', '{j}', sig[{2*j+1}], sig[{2*j+2}]))" for j in range(_N_BANDS)
)

DEDUP_MINHASH_SQL = f"""
WITH {_CAPPED_SH_CTE}, d AS (
  SELECT doc_id, list(shingle) AS sh FROM sh GROUP BY doc_id
), s AS (
  SELECT doc_id, [{_SIG_SQL}] AS sig FROM d WHERE len(sh) > 0
), bands AS (
  SELECT doc_id, unnest([{_BANDS_SQL}]) AS band FROM s
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash from token md5s: bit b votes +1/-1 by bit (b % 4) of
    hex digit (b // 4) of each distinct token's md5; signature groups are
    dup candidates (single equality-join key — the cheapest LSH)."""
    docs = load_documents(spark, sf_dir)
    return _simhash_df(docs, "simhash64").orderBy("doc_id")


_SIM_BITS = 64
# hex chars whose nibble has bit k set — drives the per-bit vote in BOTH the
# Spark expression and the DuckDB oracle (identical substring+membership shape)
_HEX_BIT = {
    0: ("1", "3", "5", "7", "9", "b", "d", "f"),
    1: ("2", "3", "6", "7", "a", "b", "e", "f"),
    2: ("4", "5", "6", "7", "c", "d", "e", "f"),
    3: ("8", "9", "a", "b", "c", "d", "e", "f"),
}


def _bit_list_sql(b: int) -> str:
    chars = ", ".join(f"'{c}'" for c in _HEX_BIT[b % 4])
    return (
        f"CASE WHEN list_contains([{chars}], substring(h, {b // 4 + 1}, 1)) "
        "THEN 1 ELSE -1 END"
    )


_BIT_SQL = ", ".join(
    f"""CASE WHEN list_aggregate(list_transform(hs,
        h -> {_bit_list_sql(b)}), 'sum') > 0 THEN '1' ELSE '0' END"""
    for b in range(_SIM_BITS)
)

DEDUP_SIMHASH_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct({_TOKS_SQL}), x -> md5(x)) AS hs
  FROM documents
)
SELECT doc_id, concat({_BIT_SQL}) AS simhash64
FROM t
ORDER BY doc_id
"""


_HAMMING_K = 3  # max Hamming distance for a near-dup pair
# 64 bits / 4 bands of 16 — pigeonhole: ham≤3 ⇒ ≥1 equal band. 16-bit bands
# give 65,536 distinct values per band, so band buckets stay ~n/65k and the
# candidate join never goes quadratic at corpus scale (the round-2 16-bit
# signature had only 16 values per band — quadratic past ~10^5 docs).
_N_SIM_BANDS = 4
_BAND_WIDTH = _SIM_BITS // _N_SIM_BANDS


def _simhash_df(docs, out_col: str) -> DataFrame:
    """(doc_id, <out_col>) with the 64-char '0'/'1' SimHash signature
    (shared by dedup_simhash and dedup_simhash_pairs).

    Served by the Arrow kernel (:func:`_simhash_arrow_df`): the vote fold
    is fundamentally outside whole-stage codegen (higher-order functions
    evaluate interpreted — ~190µs/doc even with the accumulator bound once,
    see :func:`_simhash_expr_df`), so this is one of the repo's few
    justified mapInPandas paths — batch-vectorized numpy bit votes with a
    per-batch token memo, never per-row Python in a F.udf. The expression
    formulation is kept as the parity reference; a pytest asserts the two
    produce identical signatures."""
    return _simhash_arrow_df(docs, out_col)


def _simhash_arrow_df(docs, out_col: str) -> DataFrame:
    """Arrow implementation of the SimHash signature: per batch, distinct
    tokens hash once (md5 prefix → 64 LSB-first nibble bits → ±1 vote row,
    memoized), per doc the vote rows sum vectorized. Semantics match
    :func:`_simhash_expr_df` bit-for-bit: token = non-empty run of
    [a-z0-9] after lower(), bit b reads hex digit b//4 of md5, bit b%4
    (LSB first), sign = (sum > 0)."""

    def gen(batches):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        tok_re = re.compile(r"[^a-z0-9]+")
        shifts = np.tile(np.arange(4, dtype=np.uint8), 16)
        memo: dict = {}

        def vote_row(tok):
            v = memo.get(tok)
            if v is None:
                by = np.frombuffer(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], dtype=np.uint8
                )
                digits = np.empty(16, np.uint8)
                digits[0::2] = by >> 4
                digits[1::2] = by & 0x0F
                bits = (np.repeat(digits, 4) >> shifts) & 1
                v = bits.astype(np.int32) * 2 - 1
                memo[tok] = v
            return v

        bit_chars = np.array(["0", "1"])
        for pdf in batches:
            sigs = []
            for text in pdf["text"].astype(object):
                if text is None or not isinstance(text, str):
                    sigs.append(None)
                    continue
                toks = {t for t in tok_re.split(text.lower()) if t}
                if toks:
                    acc = np.add.reduce([vote_row(t) for t in toks])
                else:
                    acc = np.zeros(64, np.int32)
                sigs.append("".join(bit_chars[(acc > 0).astype(np.int8)]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], out_col: sigs})

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema=f"doc_id long, {out_col} string"
    )


def _simhash_expr_df(docs, out_col: str) -> DataFrame:
    """Pure-expression SimHash (the oracle-parity reference). ONE pass over
    the token-hash array: the fold accumulates all 64 bit-votes in an int
    array via zip_with — not 64 separate array scans. The accumulator is
    projected as a real attribute BEFORE bit extraction: the fold is an
    interpreted higher-order function, and the 64 ``element_at(acc, b)``
    references in the bit-concat would otherwise re-run the whole fold 64×
    per row (the same lambda-recompute trap as :func:`_shingles` — measured
    GC collapse at sf1)."""
    toks = F.array_distinct(_tokens(F.col("text")))
    hashes = F.transform(toks, lambda x: F.md5(x))

    def _votes(h):
        return F.array(
            *[
                F.when(
                    F.substring(h, b // 4 + 1, 1).isin(*_HEX_BIT[b % 4]), F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(_SIM_BITS)
            ]
        )

    acc_df = docs.select(
        "doc_id",
        F.aggregate(
            hashes,
            F.array_repeat(F.lit(0), _SIM_BITS),
            lambda a, h: F.zip_with(a, _votes(h), lambda x, v: x + v),
        ).alias("__acc"),
    )
    sig = F.concat(
        *[
            F.when(F.element_at(F.col("__acc"), b + 1) > 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for b in range(_SIM_BITS)
        ]
    )
    return acc_df.select("doc_id", sig.alias(out_col))


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate PAIRS from SimHash: 64-bit signatures split into 4
    bands of 16 bits; by pigeonhole any pair with Hamming distance ≤ 3 shares
    at least one identical band, so the candidate join keys on (band_idx,
    band_value) — shuffle ∝ band-bucket collisions (~n/65,536 docs per
    bucket), never docs². Candidates are then exact-filtered to Hamming ≤ 3.

    Completes the dedup-set semantics of the reference's seen-pair dedup
    (/root/reference/src/translator_ingest/ingests/string/string.py:126-139):
    signatures alone (dedup_simhash) don't give a consumer dup groups.

    Banding runs over DISTINCT signatures, not docs: duplicate-heavy corpora
    collapse to few signatures (sf1: 50k docs → 3,866 sigs), and banding
    docs makes every identical-sig group collide in all 4 bands — a 4×
    pre-distinct blowup plus a per-DOC-pair Hamming refine (measured 434s at
    sf1). Instead: (a) identical-sig doc pairs come from ONE self-join keyed
    on the full signature (no band duplication, Hamming is 0 by definition;
    AQE skew-split handles mega-groups — the quadratic OUTPUT within a dup
    group is the contract, not an intermediate); (b) cross-sig candidates
    band the distinct-sig table, refine Hamming ONCE per signature pair,
    then broadcast the surviving sig pairs against the doc→sig map to expand
    into doc pairs. Shuffle volume ∝ distinct signatures + true output."""
    docs = load_documents(spark, sf_dir)
    # persisted: the signature fold is the expensive stage and FOUR
    # consumers branch from it (dsig, both sides of the identical-sig
    # self-join, and the cross expansion) — Spark materializes shared
    # subtrees once per consumer, so without the persist the fold runs 4×.
    sigs = _persist_swap("simhash_sigs", _simhash_df(docs, "sig"))
    # the Hamming refine compares PACKED signature halves (string → two
    # 32-bit ints, converted once per distinct sig): hamming = popcount of
    # the xor. The naive formulation — 64 chained CASE WHEN substring(a,i,1)
    # != substring(b,i,1) terms — exceeds the whole-stage-codegen expression
    # budget and falls back to interpreted eval per candidate pair (measured
    # 28s over 507k sf1 candidates vs <1s packed).
    def _half(col, j):
        return F.conv(F.substring(col, 32 * j + 1, 32), 2, 10).cast("long")

    dsig = sigs.select("sig").distinct().select(
        "sig", _half(F.col("sig"), 0).alias("h0"), _half(F.col("sig"), 1).alias("h1")
    )
    bands = dsig.select(
        "sig",
        "h0",
        "h1",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.substring("sig", _BAND_WIDTH * j + 1, _BAND_WIDTH).alias(
                            "band_val"
                        ),
                    )
                    for j in range(_N_SIM_BANDS)
                ]
            )
        ).alias("band"),
    ).select("sig", "h0", "h1", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(
        F.col("a.h0").bitwiseXOR(F.col("b.h0"))
    ) + F.bit_count(F.col("a.h1").bitwiseXOR(F.col("b.h1")))
    sig_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.sig") < F.col("b.sig")),
        )
        .select(
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
            hamming.cast("int").alias("hamming"),
        )
        .dropDuplicates(["sig_a", "sig_b"])  # a pair may share several bands
        .filter(F.col("hamming") <= _HAMMING_K)
    )
    # (a) identical signatures: hamming 0, pairs within the sig group.
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    same = sa.join(
        sb,
        (F.col("sa.sig") == F.col("sb.sig"))
        & (F.col("sa.doc_id") < F.col("sb.doc_id")),
    ).select(
        F.col("sa.doc_id").alias("doc_a"),
        F.col("sb.doc_id").alias("doc_b"),
        F.lit(0).alias("hamming"),
    )
    # (b) near signatures: expand sig pairs (tiny — broadcast) to doc pairs.
    cross = (
        sig_pairs.hint("broadcast")
        .join(sa, F.col("sig_a") == F.col("sa.sig"))
        .join(sb, F.col("sig_b") == F.col("sb.sig"))
        .select(
            F.least("sa.doc_id", "sb.doc_id").alias("doc_a"),
            F.greatest("sa.doc_id", "sb.doc_id").alias("doc_b"),
            "hamming",
        )
    )
    return same.unionByName(cross).orderBy("doc_a", "doc_b")


_HAMMING_SQL = " + ".join(
    f"(CASE WHEN substring(a.sig, {i + 1}, 1) <> substring(b.sig, {i + 1}, 1) "
    "THEN 1 ELSE 0 END)"
    for i in range(_SIM_BITS)
)
_BAND_VALS_SQL = ", ".join(
    f"struct_pack(band_idx := {j}, "
    f"band_val := substring(sig, {_BAND_WIDTH * j + 1}, {_BAND_WIDTH}))"
    for j in range(_N_SIM_BANDS)
)

DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct({_TOKS_SQL}), x -> md5(x)) AS hs
  FROM documents
), sigs AS (
  SELECT doc_id, concat({_BIT_SQL}) AS sig FROM t
), bands AS (
  SELECT doc_id, sig, unnest([{_BAND_VALS_SQL}], recursive := true) FROM sigs
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS a_sig, b.sig AS b_sig
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({_HAMMING_SQL.replace('a.sig', 'a_sig').replace('b.sig', 'b_sig')} AS INT) AS hamming
FROM cand
WHERE {_HAMMING_SQL.replace('a.sig', 'a_sig').replace('b.sig', 'b_sig')} <= {_HAMMING_K}
ORDER BY doc_a, doc_b
"""



def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the n-gram
    Jaccard near-dup pair graph, cluster id = the minimum doc_id reachable
    (canonical representative). The missing half of pair-emitting dedup —
    a pipeline drops all but one doc per cluster, so it needs the cluster
    assignment, not just pairs.

    Algorithm: iterative min-label propagation to a fixpoint — per round,
    every node takes min(own label, neighbors' labels); rounds needed =
    graph diameter (near-dup clusters are shallow; the bound guards
    pathology). Each round is one equi-join + one primitive min
    aggregation — shuffle keys are node ids, never doc×doc. At 10^10 docs
    the same loop runs with the large-star/small-star transform halving
    the diameter per round (log rounds); the per-round plan is identical.
    The convergence check rides the SAME job that materializes the round's
    labels (count of changed labels), so each round is exactly one job.
    """
    docs = load_documents(spark, sf_dir).select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.selectExpr("doc_a AS u", "doc_b AS v")
        .unionByName(pairs.selectExpr("doc_b AS u", "doc_a AS v"))
        .persist()
    )
    labels = docs.select(F.col("doc_id"), F.col("doc_id").alias("cluster_id"))
    for _ in range(24):  # diameter bound; asserts below if ever hit
        nbr = (
            edges.join(labels, edges["v"] == labels["doc_id"])
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["doc_id"] == nbr["u"], "left")
            .select(
                labels["doc_id"],
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.coalesce("nbr_min", F.col("cluster_id")) < F.col("cluster_id"))
                .cast("long")
                .alias("__changed"),
            )
            .persist()
        )
        changed = new_labels.agg(F.sum("__changed")).collect()[0][0]  # bounded-collect: one scalar
        labels.unpersist()  # no-op on the first (uncached) round
        final_cached = new_labels
        labels = new_labels.drop("__changed")
        if not changed:
            break
    else:
        raise RuntimeError("component propagation did not converge in 24 rounds")
    edges.unpersist()
    # the returned DF depends on the last round's persisted labels; hand
    # that handle to the swap registry so the next invocation (or
    # release_cached) frees it instead of leaking one copy per call
    _register_cached("components_labels", final_cached)
    return labels.orderBy("doc_id")


DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE {_CAPPED_SH_CTE}, sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
)
SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
FROM documents d LEFT JOIN reach r ON d.doc_id = r.u
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_components": (dedup_components, DEDUP_COMPONENTS_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, DEDUP_SIMHASH_PAIRS_SQL),
}
