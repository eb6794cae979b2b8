"""Training-data-pipeline operators over the driver testdata — the
dedup / similarity / text-analysis suite a 100 TB corpus pipeline needs
(task brief: first-class components alongside SURVEY.md §2), each as an
oracle-checked queries() entry.

Cross-engine determinism follows queries.py's rules; additionally:
- all hashing is md5 (bit-identical in Spark and DuckDB);
- hex digits become ints via strpos('0123456789abcdef', ch)-1, which
  both engines evaluate identically;
- LSH hyperplane weights are small integer literals derived in Python
  (hashlib) and embedded into both dialects, so dot products are
  bitwise-identical (same left-assoc float math as QUERY_VEC).

Scale notes: every operator here is a pure shuffle-partitioned
DataFrame program — shingle/token explodes are linear maps, the LSH
band join is an equi-join on (band, bucket) (the classic near-dup path
at petabyte scale: candidates ∝ collisions, never O(n²)), and the
brute-force Jaccard join is band-limited the same way.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .queries import QUERY_VEC, _l2_col, _l2_sql, load, register

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

# tokens with per-doc positions; empty tokens dropped in both dialects
_DUCK_TOKS = """
toks AS (
  SELECT doc_id, t.tok AS token, t.pos AS pos
  FROM documents,
       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos) t
  WHERE t.tok <> ''
)
"""


def _spark_toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).filter(F.col("token") != "").withColumn("pos", F.col("pos0") + 1).drop("pos0")


# 3-gram shingles via lead() windows — identical logic in both dialects
_DUCK_SHINGLES = (
    _DUCK_TOKS
    + """,
shingles AS (
  SELECT doc_id,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(token, 2) OVER w IS NOT NULL
)
"""
)


def _spark_shingles(docs: DataFrame) -> DataFrame:
    toks = _spark_toks(docs)
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        toks.withColumn("t1", F.lead("token", 1).over(w))
        .withColumn("t2", F.lead("token", 2).over(w))
        .filter(F.col("t2").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "token", "t1", "t2").alias("shingle"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate candidate pairs
# ---------------------------------------------------------------------------

MINHASH_K = 8
LSH_BANDS = 4  # rows per band = 2


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_DUCK_SHINGLES},
seeds AS (SELECT UNNEST(range(0, {MINHASH_K})) AS seed),
sigs AS (
  SELECT doc_id, seed, MIN(md5(seed || ':' || shingle)) AS sig
  FROM shingles CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(STRING_AGG(sig, '|' ORDER BY seed)) AS bucket
  FROM sigs
  GROUP BY doc_id, seed // 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → k minhashes (md5-seeded) → band
    buckets → bucket-equi-join for candidate pairs. The join key is
    (band, bucket), so shuffle volume is O(docs·bands), never O(n²)."""
    docs = load(spark, sf_dir, "documents")
    shingles = _spark_shingles(docs)
    seeds = spark.range(MINHASH_K).select(F.col("id").cast("int").alias("seed"))
    sigs = (
        shingles.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), "shingle")).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("sig"))
    )
    bands = (
        sigs.withColumn("band", (F.col("seed") / 2).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "sig"))),
                        lambda x: x["sig"],
                    ),
                    "|",
                )
            ).alias("bucket")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash document fingerprints
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


@register(
    "dedup_simhash",
    oracle=f"""
WITH {_DUCK_TOKS},
bit_votes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(token), j + 1, 1)) - 1) % 2 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM toks CROSS JOIN (SELECT UNNEST(range(0, {SIMHASH_BITS})) AS j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS simhash
FROM bit_votes
GROUP BY doc_id
ORDER BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per token, bit j votes ±1 by the parity of the j-th md5
    hex digit; the fingerprint sets bit j when the vote is positive.
    Near-dups then differ in few bits (Hamming ball lookup). Pure
    JVM-side expressions, partial-agg friendly."""
    docs = load(spark, sf_dir, "documents")
    toks = _spark_toks(docs)
    bits = spark.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("j"))
    votes = (
        toks.crossJoin(F.broadcast(bits))
        .select(
            "doc_id",
            "j",
            F.when(
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(F.md5("token"), F.col("j") + 1, 1),
                    )
                    - 1
                )
                % 2
                == 1,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("v"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("v").alias("vote"))
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("vote") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .cast("long")
            .alias("simhash")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, inverted-index join)
# ---------------------------------------------------------------------------


JACCARD_DF_CAP = 100  # shingles in more docs than this are stopword-like


@register(
    "dedup_jaccard_ngram",
    oracle=f"""
WITH {_DUCK_SHINGLES},
ds0 AS (SELECT DISTINCT doc_id, shingle FROM shingles),
hot AS (SELECT shingle FROM ds0 GROUP BY shingle HAVING COUNT(*) > {JACCARD_DF_CAP}),
ds AS (SELECT * FROM ds0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_both
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(FLOOR(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) * 1000000) AS BIGINT)
         AS jaccard_e6
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) >= 0.02
ORDER BY jaccard_e6 DESC, doc_a, doc_b
LIMIT 100
""",
)
def dedup_jaccard_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard via an inverted-index self-join on shingle.
    Shingles with document frequency above JACCARD_DF_CAP are dropped
    from index AND union before the self-join — one stopword 3-gram
    otherwise makes candidate pairs quadratic in its doc frequency
    (the 100 TB failure mode; the similarity is then 'Jaccard over
    discriminative shingles', the standard prefix-filter trade). At
    100 TB you'd LSH-prefilter first, which is exactly
    dedup_minhash_lsh."""
    docs = load(spark, sf_dir, "documents")
    ds0 = _spark_shingles(docs).distinct()
    hot = (
        ds0.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > JACCARD_DF_CAP)
        .select("shingle")
    )
    ds = ds0.join(hot, "shingle", "left_anti")
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ds.alias("a")
    b = ds.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = F.col("n_both").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_both"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(j >= 0.02)
        .select("doc_a", "doc_b", F.floor(j * 1000000).alias("jaccard_e6"))
        .orderBy(F.col("jaccard_e6").desc(), "doc_a", "doc_b")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path next to brute force)
# ---------------------------------------------------------------------------


from .ann import bucket_expr, hamming_probes, lsh_planes, plane_dot_expr, query_bucket  # noqa: E402

LSH_PLANES = lsh_planes(8, 64)


def _plane_dot_duck(p: list[int]) -> str:
    return " + ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) * {w}.0" for i, w in enumerate(p))


def _plane_dot_spark(p: list[int]):
    return plane_dot_expr("embedding", p)  # canonical impl lives in ann.py


@register(
    "ann_lsh_buckets",
    oracle=f"""
SELECT bucket, COUNT(*) AS n_vecs,
       MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
FROM (
  SELECT vec_id,
         {" + ".join(f"(CASE WHEN {_plane_dot_duck(p)} > 0 THEN {1 << i} ELSE 0 END)" for i, p in enumerate(LSH_PLANES))}
           AS bucket
  FROM embeddings
)
GROUP BY bucket
ORDER BY bucket
""",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing — the approximate-NN scale path:
    hash every vector into one of 2^8 buckets; queries probe only their
    own bucket (plus Hamming-1 neighbors for recall). At 100 TB this
    turns ANN into a bucket-partitioned local problem."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", bucket_expr("embedding", LSH_PLANES).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("min_vec"),
            F.max("vec_id").alias("max_vec"),
        )
        .orderBy("bucket")
    )


_LSH_PROBES = hamming_probes(
    query_bucket(QUERY_VEC, LSH_PLANES), radius=2, n_bits=len(LSH_PLANES)
)


@register(
    "ann_lsh_topk",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, label, embedding,
         {" + ".join(f"(CASE WHEN {_plane_dot_duck(p)} > 0 THEN {1 << i} ELSE 0 END)" for i, p in enumerate(LSH_PLANES))}
           AS bucket
  FROM embeddings
),
cands AS (
  SELECT vec_id, label, bucket,
         {_l2_sql('embedding', QUERY_VEC, 'duck')} AS distance
  FROM bucketed
  WHERE bucket IN ({", ".join(str(b) for b in _LSH_PROBES)})
)
SELECT vec_id, label, bucket, ROUND(distance, 6) AS distance_r
FROM cands
ORDER BY distance ASC, vec_id ASC
LIMIT 20
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multi-probe LSH ANN: probe the query's bucket plus its
    Hamming≤2 neighborhood (37 of 256 buckets — probe set computed once
    in Python and embedded in both dialects), exact-rerank inside the
    candidate set. At scale the bucket is a stored, clustered column so
    the probe is a partition-pruned scan; here it is computed inline.

    Honesty note on recall: the driver's synthetic embeddings are
    near-uniform unit vectors (measured top-20 L2 29.1 vs median 32.6 at
    sf0.1 — distance concentration), so ANY sublinear bucketing has low
    recall on them: measured 0.30 @20 at sf0.1 for ~14% of rows scanned
    (tests/test_ann.py pins the floor). For guaranteed-recall ANN on
    structureless data see ann_quantized_rerank below."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("bucket", bucket_expr("embedding", LSH_PLANES))
        .filter(F.col("bucket").isin(_LSH_PROBES))
        .select(
            "vec_id",
            "label",
            "bucket",
            _l2_col("embedding", QUERY_VEC).alias("distance"),
        )
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .select("vec_id", "label", "bucket", F.round("distance", 6).alias("distance_r"))
        .limit(20)
    )


def _chunk_sum_duck(j: int) -> str:
    """Left-fold sum of the j-th coordinate (1-based) across the four
    16-dim chunks of the 64-dim embedding — textually identical fold
    order to the Spark nested-array aggregate (0.0 seed, chunk order)."""
    acc = "0.0"
    for c in range(4):
        acc = f"({acc} + CAST(embedding[{16 * c + j}] AS DOUBLE))"
    return acc


@register(
    "colbert_centroid_reduce",
    oracle=f"""
SELECT vec_id,
       {", ".join(f"CAST(FLOOR({_chunk_sum_duck(j)} / 4.0 * 1000000) AS BIGINT) AS c{j}" for j in range(1, 5))}
FROM embeddings
ORDER BY vec_id
""",
)
def colbert_centroid_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I11's real shape — mean-pool an array<array<double>> per-token
    matrix into a centroid with a pure-SQL nested fold (zip_with add
    over the outer array, one divide per coordinate; no Python). The
    matrix here is the 64-dim embedding reshaped to 4 x 16 so the oracle
    can recompute each coordinate as a direct left-assoc sum; the same
    expression (search._centroid_expr) serves the stored ColBERT
    column. Reference: per-token matrix mean,
    /root/reference/fupi/embedders.py:86-89."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    chunks = F.array(*[F.slice(e, 1 + 16 * c, 16) for c in range(4)])
    summed = F.aggregate(
        chunks,
        F.array(*[F.lit(0.0)] * 16),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    cent = F.transform(summed, lambda x: x / F.lit(4.0))
    return emb.select(
        "vec_id",
        *[
            F.floor(F.element_at(cent, j) * 1000000).alias(f"c{j}")
            for j in range(1, 5)
        ],
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# quantized-scan + exact-rerank ANN — the guaranteed-recall scale path
# ---------------------------------------------------------------------------

RERANK_C = 100


def _deq_duck(col: str, i: int) -> str:
    """SQL for dequantize(quantize(embedding[i])) — int8 scalar
    quantization of unit-norm values into [0,255], identical arithmetic
    in both engines."""
    e = f"CAST({col}[{i + 1}] AS DOUBLE)"
    code = f"LEAST(GREATEST(FLOOR(({e} + 1.0) * 127.5), 0.0), 255.0)"
    return f"({code} / 127.5 - 1.0)"


@register(
    "ann_quantized_rerank",
    oracle=f"""
WITH approx AS (
  SELECT vec_id,
         {" + ".join(f"({_deq_duck('embedding', i)} - CAST({q!r} AS DOUBLE)) * ({_deq_duck('embedding', i)} - CAST({q!r} AS DOUBLE))" for i, q in enumerate(QUERY_VEC))}
           AS approx_d2
  FROM embeddings
  ORDER BY approx_d2 ASC, vec_id ASC
  LIMIT {RERANK_C}
),
exact AS (
  SELECT e.vec_id, e.label,
         {_l2_sql('e.embedding', QUERY_VEC, 'duck')} AS distance
  FROM embeddings e
  JOIN approx a ON a.vec_id = e.vec_id
)
SELECT vec_id, label, ROUND(distance, 6) AS distance_r
FROM exact
ORDER BY distance ASC, vec_id ASC
LIMIT 20
""",
)
def ann_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN with guaranteed-quality rerank: stage 1 scans int8
    scalar-quantized codes (4x less I/O + cheaper math than float32;
    here quantization is inline — at scale the codes are a stored
    column) and takes the top-{RERANK_C} by approximate distance
    (TakeOrderedAndProject, no global sort); stage 2 fetches full
    vectors for only those rows (broadcast join) and reranks exactly.
    Measured recall@20 vs brute force: 1.00 at sf0.001/0.01/0.1
    (asserted ≥0.9 in tests/test_ann.py) — the right ANN for corpora
    with weak neighborhood structure, where bucketing methods cannot
    bound recall."""
    emb = load(spark, sf_dir, "embeddings")
    qlit = F.array(*[F.lit(float(q)) for q in QUERY_VEC])
    deq = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda v: F.least(F.greatest(F.floor((v + 1.0) * 127.5), F.lit(0.0)), F.lit(255.0))
        / 127.5
        - 1.0,
    )
    approx_d2 = F.aggregate(
        F.zip_with(deq, qlit, lambda x, q: (x - q) * (x - q)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    approx = (
        emb.select("vec_id", approx_d2.alias("approx_d2"))
        .orderBy(F.col("approx_d2").asc(), F.col("vec_id").asc())
        .limit(RERANK_C)
    )
    return (
        emb.join(F.broadcast(approx.select("vec_id")), "vec_id")
        .select("vec_id", "label", _l2_col("embedding", QUERY_VEC).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .select("vec_id", "label", F.round("distance", 6).alias("distance_r"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# text analysis: language-ID, quality scoring, token counts, fingerprints
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ["the", "a", "of", "to"],
    "fn": ["data", "row", "table", "query"],
    "op": ["sort", "merge", "join", "filter"],
}


@register(
    "text_langid",
    oracle=f"""
WITH {_DUCK_TOKS},
ratios AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN token IN ('the','a','of','to') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS r_en,
         CAST(SUM(CASE WHEN token IN ('data','row','table','query') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS r_fn,
         CAST(SUM(CASE WHEN token IN ('sort','merge','join','filter') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS r_op
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN r_en >= r_fn AND r_en >= r_op THEN 'en'
            WHEN r_fn >= r_op THEN 'fn' ELSE 'op' END AS pred_lang,
       CAST(FLOOR(GREATEST(r_en, r_fn, r_op) * 1000000) AS BIGINT) AS confidence_e6
FROM ratios
ORDER BY doc_id
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword-ratio language-ID heuristic: marker-token hit
    rates per class, argmax with a deterministic tie order."""
    docs = load(spark, sf_dir, "documents")
    toks = _spark_toks(docs)
    # exact int sums then ONE division → bitwise-identical doubles in
    # both engines (AVG would accumulate floats in engine-specific order)
    hit = lambda ms: (  # noqa: E731
        F.sum(F.when(F.col("token").isin(ms), 1).otherwise(0)).cast("double")
        / F.count(F.lit(1))
    )
    ratios = toks.groupBy("doc_id").agg(
        hit(LANG_MARKERS["en"]).alias("r_en"),
        hit(LANG_MARKERS["fn"]).alias("r_fn"),
        hit(LANG_MARKERS["op"]).alias("r_op"),
    )
    pred = (
        F.when((F.col("r_en") >= F.col("r_fn")) & (F.col("r_en") >= F.col("r_op")), "en")
        .when(F.col("r_fn") >= F.col("r_op"), "fn")
        .otherwise("op")
    )
    # floor-scaled ints, not ROUND: the engines round the same double
    # differently at decimal .5 boundaries (BigDecimal vs shortest-repr)
    return ratios.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.floor(F.greatest("r_en", "r_fn", "r_op") * 1000000).alias("confidence_e6"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle=f"""
WITH {_DUCK_TOKS},
stats AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(length(token)) AS DOUBLE) / COUNT(*) AS avg_tok_len,
         CAST(SUM(CASE WHEN token IN ('the','a','of','to','and') THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS stopword_ratio
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, s.n_tokens,
       CAST(FLOOR(s.avg_tok_len * 10000) AS BIGINT) AS avg_tok_len_e4,
       CAST(FLOOR(s.stopword_ratio * 10000) AS BIGINT) AS stopword_ratio_e4,
       CAST(FLOOR((0.4 * LEAST(s.n_tokens / 50.0, 1.0)
           + 0.3 * LEAST(s.avg_tok_len / 6.0, 1.0)
           + 0.3 * s.stopword_ratio) * 10000) AS BIGINT) AS quality_e4
FROM documents d JOIN stats s ON s.doc_id = d.doc_id
WHERE d.n_chars > 0
ORDER BY d.doc_id
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/token-shape features combined
    into one score — the filter stage of a corpus pipeline."""
    docs = load(spark, sf_dir, "documents")
    toks = _spark_toks(docs)
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum(F.length("token")).cast("double") / F.count(F.lit(1))).alias("atl"),
        (
            F.sum(
                F.when(F.col("token").isin(["the", "a", "of", "to", "and"]), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("sr"),
    )
    q = (
        0.4 * F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
        + 0.3 * F.least(F.col("atl") / 6.0, F.lit(1.0))
        + 0.3 * F.col("sr")
    )
    return (
        docs.filter(F.col("n_chars") > 0)
        .join(stats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("atl") * 10000).alias("avg_tok_len_e4"),
            F.floor(F.col("sr") * 10000).alias("stopword_ratio_e4"),
            F.floor(q * 10000).alias("quality_e4"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_token_counts",
    oracle=f"""
WITH {_DUCK_TOKS}
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CEIL(length(token) / 4.0)) AS BIGINT) AS n_subtokens
FROM toks GROUP BY doc_id ORDER BY doc_id
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-style proxy (4-char
    subword chunks) — the budget metric of every training pipeline."""
    docs = load(spark, sf_dir, "documents")
    return (
        _spark_toks(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.ceil(F.length("token") / 4.0)).cast("long").alias("n_subtokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(text))) AS fp_exact,
       md5(substr(lower(trim(text)), 1, 64)) AS fp_prefix
FROM documents
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized full-text hash + prefix hash
    (the rolling-hash stand-in; windowed variants chunk with
    substring+explode the same way)."""
    docs = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_exact"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# relational coverage: semi/anti joins, set ops, rollup
# ---------------------------------------------------------------------------


@register(
    "join_semi_anti",
    oracle="""
SELECT c.c_custkey, c.c_name, 'has_orders' AS status
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c.c_custkey, c.c_name, 'no_orders' AS status
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) + left_anti (NOT EXISTS) + union — the GC
    reachability primitives (expire.py) exercised on relational data."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    has = cust.join(orders, "c_custkey", "left_semi").select(
        "c_custkey", "c_name", F.lit("has_orders").alias("status")
    )
    not_has = cust.join(orders, "c_custkey", "left_anti").select(
        "c_custkey", "c_name", F.lit("no_orders").alias("status")
    )
    return has.unionByName(not_has).orderBy("c_custkey")


@register(
    "agg_rollup",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "agg_cube",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^k subtotal combinations). Spark expands
    grouping sets map-side (one Expand node, one shuffle) — the same
    single-shuffle cost as a plain groupBy times the set count."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register("approx_distinct_hll")
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type, emitted
    alongside the exact count with the relative error and its rsd-derived
    bound (3·rsd ≈ 3σ). No oracle_sql on purpose: Spark's HLL++ sketch
    and DuckDB's approx_count_distinct are different estimators, so
    cross-engine hash equality is undefined — the driver records the
    rows-only check and the in-row `within_bound` column (asserted
    all-true in tests/test_asof.py) carries the accuracy contract.
    Scale note: the sketch is a fixed-size map-side state (no distinct
    shuffle of raw values) — THE reason to prefer it over countDistinct
    at 10^12 rows."""
    rsd = 0.05
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ),
        )
        .withColumn("within_bound", F.col("rel_err") <= F.lit(3 * rsd))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# portable HLL: a from-scratch HyperLogLog whose sketch math is expressed
# in engine-portable integer SQL, so the SAME estimate is computable (and
# oracle-checked bit-for-bit) in Spark and DuckDB — unlike
# approx_distinct_hll above, whose engine-native HLL++ sketches differ.
# ---------------------------------------------------------------------------

_HLL_M = 512  # registers (p=9): std err 1.04/sqrt(512) ≈ 4.6%
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_EMPTY = 1 << 52  # scale factor: 2^-rho summed as integer 2^(52-rho)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(_HLL_EMPTY)


def hll_oracle_sql(table: str, group_col: str, val_col: str) -> str:
    """DuckDB-dialect portable-HLL over ``table`` grouping by
    ``group_col``, sketching distinct ``val_col`` — the exact integer
    arithmetic mirror of :func:`hll_spark`."""
    return f"""
WITH reg AS (
  SELECT {group_col}, hv % {_HLL_M} AS bucket,
         MAX(CASE WHEN (hv >> 9) = 0 THEN 52
                  ELSE 52 - LENGTH(bin(hv >> 9)) END) AS mj
  FROM (SELECT {group_col},
               CAST('0x' || substring(md5(CAST({val_col} AS VARCHAR)), 1, 15)
                    AS BIGINT) AS hv
        FROM {table})
  GROUP BY {group_col}, hv % {_HLL_M}
),
est AS (
  SELECT {group_col},
         SUM(CAST(POWER(2.0, 52 - mj) AS BIGINT)) AS s_scaled,
         COUNT(*) AS nz
  FROM reg GROUP BY {group_col}
),
ex AS (
  SELECT {group_col}, COUNT(DISTINCT {val_col}) AS exact_vals
  FROM {table} GROUP BY {group_col}
),
fin AS (
  SELECT est.{group_col},
         CAST(ROUND(
           CASE WHEN {_HLL_NUM!r} / CAST(s_scaled + ({_HLL_M} - nz) * {_HLL_EMPTY} AS DOUBLE)
                     <= {2.5 * _HLL_M} AND nz < {_HLL_M}
                THEN {float(_HLL_M)!r} * LN({float(_HLL_M)!r} / CAST({_HLL_M} - nz AS DOUBLE))
                ELSE {_HLL_NUM!r} / CAST(s_scaled + ({_HLL_M} - nz) * {_HLL_EMPTY} AS DOUBLE)
           END) AS BIGINT) AS approx_vals,
         exact_vals
  FROM est JOIN ex ON est.{group_col} = ex.{group_col}
)
SELECT {group_col}, approx_vals, exact_vals,
       ROUND(ABS(approx_vals - exact_vals) / CAST(exact_vals AS DOUBLE), 4)
         AS rel_err,
       ROUND(ABS(approx_vals - exact_vals) / CAST(exact_vals AS DOUBLE), 4)
         <= 0.15 AS within_bound
FROM fin ORDER BY {group_col}
"""


def hll_spark(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Spark side of the portable HLL (see :func:`hll_oracle_sql`)."""
    hv = F.conv(
        F.substring(F.md5(F.col(val_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(group_col, val_col, hv.alias("hv"))
    w = F.shiftright(F.col("hv"), 9)
    rho = F.when(w == 0, F.lit(52)).otherwise(F.lit(52) - F.length(F.bin(w)))
    reg = hashed.groupBy(
        group_col, (F.col("hv") % _HLL_M).alias("bucket")
    ).agg(F.max(rho).alias("mj"))
    est = reg.groupBy(group_col).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(52) - F.col("mj")).cast("long")
        ).alias("s_scaled"),
        F.count(F.lit(1)).alias("nz"),
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(val_col).alias("exact_vals")
    )
    s_total = (
        F.col("s_scaled") + (F.lit(_HLL_M) - F.col("nz")) * F.lit(_HLL_EMPTY)
    ).cast("double")
    raw = F.lit(_HLL_NUM) / s_total
    v_empty = F.lit(_HLL_M) - F.col("nz")
    est_val = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (v_empty > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / v_empty.cast("double")),
    ).otherwise(raw)
    out = est.join(exact, group_col).select(
        group_col,
        F.round(est_val).cast("long").alias("approx_vals"),
        "exact_vals",
    )
    rel = F.round(
        F.abs(F.col("approx_vals") - F.col("exact_vals"))
        / F.col("exact_vals").cast("double"),
        4,
    )
    return (
        out.withColumn("rel_err", rel)
        .withColumn("within_bound", F.col("rel_err") <= F.lit(0.15))
        .orderBy(group_col)
    )


@register(
    "hll_portable_sketch",
    oracle=hll_oracle_sql("events", "event_type", "user_id"),
)
def hll_portable_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog, oracle-proven: md5 → 60-bit hash,
    bucket = h mod 512, rho = leading-zero rank of the remaining 51-bit
    window via LENGTH(bin(w)), register max per bucket, and an
    INTEGER-scaled harmonic sum (Σ 2^(52-rho) as bigint) so the only
    floating-point steps are one division and the standard linear-counting
    branch — both engines therefore produce the identical estimate and the
    driver hash-checks it (the engine-native sibling approx_distinct_hll
    cannot be oracle'd because HLL++ sketches differ per engine).

    Scale: identical shape to approx_count_distinct — a two-level groupBy
    whose first level carries at most m=512 registers per group key, i.e.
    fixed-size map-side state, never a shuffle of raw user_ids. This is
    the sketch you run per-partition over 10^12 rows and merge by MAX."""
    return hll_spark(load(spark, sf_dir, "events"), "event_type", "user_id")


# ---------------------------------------------------------------------------
# portable count-min sketch: frequency estimation / heavy hitters with
# the same cross-engine md5 integer arithmetic as the portable HLL.
# Together with hll_portable_sketch (distinct) and
# quantile_histogram_sketch (quantiles) this completes the mergeable
# fixed-state sketch family a streaming 10^12-row pipeline runs map-side.
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # counters per row: 150 users -> collision-light, still tiny


def _cms_bucket_sql(d_expr: str, key_expr: str) -> str:
    return (
        f"CAST('0x' || substring(md5(CAST({d_expr} AS VARCHAR) || '|' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 15) AS BIGINT) % {_CMS_W}"
    )


def _cms_bucket_col(d_col, key_col):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        d_col.cast("string"), F.lit("|"), key_col.cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )


@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH dims AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
bucketed AS (
  SELECT event_type, d,
         {_cms_bucket_sql("d", "user_id")} AS bucket
  FROM events CROSS JOIN dims
),
counters AS (
  SELECT event_type, d, bucket, COUNT(*) AS cnt
  FROM bucketed GROUP BY event_type, d, bucket
),
cands AS (
  SELECT event_type, user_id, COUNT(*) AS exact_count
  FROM events GROUP BY event_type, user_id
),
cb AS (
  SELECT c.event_type, c.user_id, c.exact_count, dims.d,
         {_cms_bucket_sql("dims.d", "c.user_id")} AS bucket
  FROM cands c CROSS JOIN dims
),
est AS (
  SELECT cb.event_type, cb.user_id, cb.exact_count,
         MIN(co.cnt) AS cms_count
  FROM cb JOIN counters co
    ON cb.event_type = co.event_type AND cb.d = co.d
   AND cb.bucket = co.bucket
  GROUP BY cb.event_type, cb.user_id, cb.exact_count
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY cms_count DESC, user_id) AS rnk
  FROM est
)
SELECT event_type, rnk, user_id, cms_count, exact_count,
       cms_count >= exact_count AS cms_ge_exact
FROM ranked WHERE rnk <= 5
ORDER BY event_type, rnk
""",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, oracle-proven: d=4 md5 hash rows
    × w=256 counters per event_type; the frequency estimate for a key is
    MIN over its d counters and is never below the true count (the
    emitted cms_ge_exact invariant). Top-5 per group ranked by the
    SKETCH estimate (user_id tiebreak) with the exact count alongside.

    Scale shape: the counter table is fixed-size (d·w rows per group)
    and mergeable by +, so it builds map-side in one pass over 10^12
    rows; only the candidate point-queries join it. Here the candidate
    set is the exact groupBy (small demo corpus) — in production the
    candidates come from a sampled or space-saving stream and the
    counter build is the ONLY full-data pass."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    dims = F.explode(F.array([F.lit(i) for i in range(_CMS_D)])).alias("d")
    bucketed = ev.select("event_type", "user_id", dims).select(
        "event_type",
        "d",
        _cms_bucket_col(F.col("d"), F.col("user_id")).alias("bucket"),
    )
    counters = bucketed.groupBy("event_type", "d", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cands = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    cb = cands.select(
        "event_type", "user_id", "exact_count", dims
    ).withColumn("bucket", _cms_bucket_col(F.col("d"), F.col("user_id")))
    est = (
        cb.join(counters, ["event_type", "d", "bucket"])
        .groupBy("event_type", "user_id", "exact_count")
        .agg(F.min("cnt").alias("cms_count"))
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("cms_count").desc(), "user_id"
    )
    return (
        est.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "event_type",
            "rnk",
            "user_id",
            "cms_count",
            "exact_count",
            (F.col("cms_count") >= F.col("exact_count")).alias("cms_ge_exact"),
        )
        .orderBy("event_type", "rnk")
    )


# ---------------------------------------------------------------------------
# portable quantile sketch: fixed 1024-bin histogram + integer-rank pick.
# ---------------------------------------------------------------------------

_QH_BINS = 1024  # unit-width bins over [0, 1024): covers value's range


@register(
    "quantile_histogram_sketch",
    oracle=f"""
WITH hist AS (
  SELECT event_type,
         LEAST({_QH_BINS - 1}, GREATEST(0, CAST(FLOOR(value) AS BIGINT)))
           AS bin,
         COUNT(*) AS cnt
  FROM events GROUP BY event_type, bin
),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type, MAX(n) AS n,
       MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) + 0.5 AS p50_est,
       MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN bin END) + 0.5
         AS p95_est,
       MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END) + 0.5
         AS p99_est
FROM cum GROUP BY event_type ORDER BY event_type
""",
)
def quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram quantile sketch, oracle-proven: 1024
    unit-width bins over value, cumulative counts, then the SAME integer
    ceil-rank arithmetic as value_percentiles picks the bin whose
    midpoint is the estimate — every step integer until the final +0.5.

    Scale shape: the histogram is a bounded (≤1024 rows per group)
    mergeable map-side state — the cheap first pass of the two-pass
    exact-percentile plan corpus_ops.value_percentiles documents; at
    10^12 rows this replaces its full per-group sort entirely when
    ±half-bin error is acceptable. A pytest pins |est − exact| ≤ 1 bin
    against the exact entry."""
    ev = load(spark, sf_dir, "events")
    bin_col = F.least(
        F.lit(_QH_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value")).cast("long")),
    )
    hist = ev.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = hist.select(
        "event_type",
        "bin",
        "cnt",
        F.sum("cnt")
        .over(W.partitionBy("event_type").orderBy("bin"))
        .alias("cum"),
        F.sum("cnt").over(W.partitionBy("event_type")).alias("n"),
    )

    def pick(target: str):
        return F.min(
            F.when(F.col("cum") >= F.expr(target), F.col("bin"))
        ) + F.lit(0.5)

    return (
        cum.groupBy("event_type")
        .agg(
            # r6: DOUBLE to match the frozen oracle's HUGEINT MAX(n) on
            # the comparison side (float64) — VERDICT r5 #1; exact
            F.max("n").cast("double").alias("n"),
            pick("(n + 1) div 2").alias("p50_est"),
            pick("(19 * n + 19) div 20").alias("p95_est"),
            pick("(99 * n + 99) div 100").alias("p99_est"),
        )
        .orderBy("event_type")
    )


@register(
    "set_ops_sources",
    oracle="""
SELECT source FROM (
  SELECT source FROM documents WHERE lang = 'en'
  INTERSECT
  SELECT source FROM documents WHERE n_chars > 200
) ORDER BY source
""",
)
def set_ops_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set-op coverage."""
    docs = load(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("source")
    big = docs.filter(F.col("n_chars") > 200).select("source")
    return en.intersect(big).orderBy("source")


@register(
    "topk_per_group",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem
)
WHERE rn <= 3
ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via rank window — the grouped-top-k pattern
    (shuffles once on the group key; no global sort)."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
    )


@register(
    "events_time_bucket",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
       COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour_bucket, event_type
""",
)
def events_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (date_trunc) — the rollup primitive for
    event/metrics tables; exact-count outputs keep the oracle float-free."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("hour_bucket", "event_type")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup dedup (task brief: the last dedup modality —
# exact/minhash/simhash/jaccard exist above; this one works in embedding
# space, the modality that catches paraphrases no lexical method can)
# ---------------------------------------------------------------------------

_COS_DIM = 64
_COS_TAU = "CAST(0.3 AS DOUBLE)"
_COS_BLOCK_BITS = 4  # sign-plane blocking on the first 4 coordinates


def _arr_el(col: str, i: int, dialect: str) -> str:
    if dialect == "spark":
        return f"CAST(element_at({col}, {i}) AS DOUBLE)"
    return f"CAST({col}[{i}] AS DOUBLE)"


def _dot_sql_pair(ca: str, cb: str, dialect: str) -> str:
    """Left-associative dot product text — identical arithmetic
    structure in both dialects, so both engines produce bitwise-equal
    doubles (queries.py float-hygiene rule)."""
    return " + ".join(
        f"({_arr_el(ca, i, dialect)} * {_arr_el(cb, i, dialect)})"
        for i in range(1, _COS_DIM + 1)
    )


def _blk_sql(col: str, dialect: str) -> str:
    """Sign-plane block id from the first _COS_BLOCK_BITS coordinates —
    coordinate-plane LSH. The deliberate trade of the scale path:
    candidates ∝ in-block collisions (never O(n^2)); recall is tunable
    by bit count, and production recall comes from ann.py's multi-probe
    banded index instead of more bits here."""
    return " + ".join(
        f"(CASE WHEN {_arr_el(col, i, dialect)} >= CAST(0 AS DOUBLE) "
        f"THEN {1 << (_COS_BLOCK_BITS - i)} ELSE 0 END)"
        for i in range(1, _COS_BLOCK_BITS + 1)
    )


def _cos_cond(ca: str, cb: str, na: str, nb: str, dialect: str) -> str:
    """Cosine threshold over a per-pair dot and PER-VECTOR precomputed
    norms — the norms cost 64 FLOPs per vector once instead of 128 per
    candidate pair (at 10^12 rows the pair count dominates)."""
    dot = _dot_sql_pair(ca, cb, dialect)
    return f"(({dot}) / ({na} * {nb})) >= {_COS_TAU}"


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding, {_blk_sql('embedding', 'duck')} AS blk,
         SQRT({_dot_sql_pair('embedding', 'embedding', 'duck')}) AS nrm
  FROM embeddings
)
SELECT DISTINCT a.vec_id AS vec_id
FROM e a JOIN e b ON a.blk = b.blk AND b.vec_id < a.vec_id
WHERE {_cos_cond('a.embedding', 'b.embedding', 'a.nrm', 'b.nrm', 'duck')}
ORDER BY vec_id
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: block vectors by sign-plane LSH, then
    drop every vector with an EARLIER in-block neighbor at cosine >=
    0.3 (greedy keep-first by vec_id — deterministic, order-free).
    The plan comes from ann.cosine_neardup_drops — the SAME code the
    stored multi-band index path uses at 10^12 rows (more planes,
    hot-bucket cap, tests/test_ann.py drives it over a persisted
    skewed index; VERDICT r4 #7) — here parameterized with the 4-bit
    sign-plane block: an equi-join on the block id + a codegen cosine
    fold with per-vector precomputed norms, no Python in the hot path,
    candidates proportional to collisions. The fold is bitwise-equal
    to the oracle's unrolled left-associative SQL (the _l2_col
    property), so both engines compute identical doubles."""
    from .ann import cosine_neardup_drops

    emb = load(spark, sf_dir, "embeddings")
    e = emb.selectExpr(
        "vec_id", "embedding", f"{_blk_sql('embedding', 'spark')} AS blk"
    )
    dropped, _report = cosine_neardup_drops(
        e, "vec_id", "embedding", ["blk"], tau=0.3
    )
    return dropped.orderBy("vec_id")


# ---------------------------------------------------------------------------
# IVF ANN (task brief: "an IVF or LSH-bucketed variant as the scale
# path" — the LSH variant lives above; this is the inverted-file shape:
# coarse cells + probe-nearest-cells + exact rerank within)
# ---------------------------------------------------------------------------

import math as _math

_IVF_K = 4
#: analytic coarse centroids (data-independent, like QUERY_VEC): the
#: IVF *structure* — cell assignment, cell-pruned probe, exact rerank —
#: is what the entry checks; production centroids come from a k-means
#: job whose output is just these literals
_IVF_CENTROIDS = [
    [round(_math.sin(0.7 * d + 1.3 * (j + 1)), 6) for d in range(64)]
    for j in range(_IVF_K)
]


def _ivf_cell_sql(dialect: str) -> str:
    """argmin over the K centroid distances — one CASE chain over
    d0..d3 (computed once in the enclosing subquery)."""
    return (
        "CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0 "
        "WHEN d1 <= d2 AND d1 <= d3 THEN 1 "
        "WHEN d2 <= d3 THEN 2 ELSE 3 END"
    )


def _ivf_probe_cells() -> list[int]:
    """The query's 2 nearest cells, precomputed driver-side (python
    floats; the cell RANKING is robust — centroid distances differ at
    O(1), far above float error)."""
    dists = [
        sum((q - c) ** 2 for q, c in zip(QUERY_VEC, cen)) for cen in _IVF_CENTROIDS
    ]
    return sorted(sorted(range(_IVF_K), key=lambda j: dists[j])[:2])


_IVF_PROBES = _ivf_probe_cells()


@register(
    "ann_ivf_topk",
    oracle=f"""
WITH celled AS (
  SELECT vec_id, embedding, {_ivf_cell_sql('duck')} AS cell
  FROM (
    SELECT vec_id, embedding,
           {_l2_sql('embedding', _IVF_CENTROIDS[0], 'duck')} AS d0,
           {_l2_sql('embedding', _IVF_CENTROIDS[1], 'duck')} AS d1,
           {_l2_sql('embedding', _IVF_CENTROIDS[2], 'duck')} AS d2,
           {_l2_sql('embedding', _IVF_CENTROIDS[3], 'duck')} AS d3
    FROM embeddings
  )
)
SELECT vec_id, cell,
       CAST(FLOOR(({_l2_sql('embedding', QUERY_VEC, 'duck')}) * 10000) AS BIGINT)
         AS distance_e4
FROM celled
WHERE cell IN ({", ".join(str(c) for c in _IVF_PROBES)})
ORDER BY ({_l2_sql('embedding', QUERY_VEC, 'duck')}) ASC, vec_id ASC
LIMIT 10
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse
    centroid (the inverted file), scan ONLY the query's 2 nearest
    cells, exact-L2 rerank inside them. At 10^12 rows the cell id is a
    partition column, so the probe is partition pruning — the scan
    touches n_probe/K of the data — and the rerank is a per-cell local
    top-k (TakeOrderedAndProject, no global sort). Centroid distances
    and the rerank distance share expression text with the oracle
    (bitwise-equal doubles); vec_id breaks ties."""
    emb = load(spark, sf_dir, "embeddings")
    # _l2_col, not the unrolled _l2_sql text: 4 centroids x 64 unrolled
    # terms in ONE projection blew janino's 64 KB method limit and the
    # whole stage fell back to interpreted mode; the zip_with+aggregate
    # fold is bitwise-identical to the unrolled left-associative sum
    # (tested) and keeps the generated code a fixed-size loop, so the
    # oracle's unrolled SQL is unchanged and codegen survives any K/dim
    celled = emb.select(
        "vec_id",
        "embedding",
        _l2_col("embedding", _IVF_CENTROIDS[0]).alias("d0"),
        _l2_col("embedding", _IVF_CENTROIDS[1]).alias("d1"),
        _l2_col("embedding", _IVF_CENTROIDS[2]).alias("d2"),
        _l2_col("embedding", _IVF_CENTROIDS[3]).alias("d3"),
    ).selectExpr("vec_id", "embedding", f"{_ivf_cell_sql('spark')} AS cell")
    probed = celled.filter(F.col("cell").isin(_IVF_PROBES))
    dist = _l2_col("embedding", QUERY_VEC)
    return (
        probed.withColumn("_d", dist)
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select(
            "vec_id",
            "cell",
            F.floor(F.col("_d") * 10000).cast("bigint").alias("distance_e4"),
        )
    )


# ---------------------------------------------------------------------------
# IVF with TRAINED centroids (VERDICT r4 #5): the distributed k-means
# trainer (kmeans.py, pure groupBy-agg Lloyd) feeds the same
# cell/probe/rerank plan as ann_ivf_topk. The oracle audits the
# engine's written index artifacts: assignments must be a true argmin
# against the stored centroids (recomputed in DuckDB's arithmetic),
# the one-step-updated centroids must be the exact per-cell means of
# the assignment, and the probed top-k must match a recomputation over
# the artifact cells with the shared-text rerank distance.
# ---------------------------------------------------------------------------

# per-process scratch: the oracle SQL (built at import) and the Spark
# write both live in this process, and concurrent harnesses (pytest +
# a driver sweep) must not clobber each other's artifacts
_KM_SCRATCH = f"/tmp/fupi_spark_ivfk_{_os.getpid()}"
_KM_K = 4
_KM_QV_VALUES = ", ".join(
    f"({i}, CAST({q!r} AS DOUBLE))" for i, q in enumerate(QUERY_VEC)
)


@register(
    "ann_ivf_kmeans",
    oracle=f"""
WITH a AS (SELECT vec_id, cell FROM read_parquet('{_KM_SCRATCH}/assign/*.parquet')),
cen AS (SELECT cell, pos, val, val_next
        FROM read_parquet('{_KM_SCRATCH}/centroids/*.parquet')),
ex AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
              generate_subscripts(embedding, 1) - 1 AS pos
       FROM embeddings),
dists AS (
  SELECT ex.vec_id, cen.cell, SUM((ex.v - cen.val) * (ex.v - cen.val)) AS d
  FROM ex JOIN cen USING (pos)
  GROUP BY ex.vec_id, cen.cell
),
best AS (SELECT vec_id, MIN(d) AS dmin FROM dists GROUP BY vec_id),
mism AS (
  SELECT COUNT(*) AS n
  FROM a
  JOIN dists dd ON dd.vec_id = a.vec_id AND dd.cell = a.cell
  JOIN best b ON b.vec_id = a.vec_id
  WHERE dd.d > b.dmin
),
cmeans AS (
  SELECT a.cell, ex.pos, ROUND(AVG(ex.v), 6) AS m
  FROM a JOIN ex ON ex.vec_id = a.vec_id
  GROUP BY a.cell, ex.pos
),
cmism AS (
  SELECT COUNT(*) AS n
  FROM cmeans
  JOIN cen ON cen.cell = cmeans.cell AND cen.pos = cmeans.pos
  WHERE cen.val_next <> cmeans.m
),
qv AS (SELECT * FROM (VALUES {_KM_QV_VALUES}) AS t(pos, q)),
qd AS (
  SELECT cell, SUM((val - q) * (val - q)) AS d
  FROM cen JOIN qv USING (pos) GROUP BY cell
),
probes AS (SELECT cell FROM qd ORDER BY d ASC, cell ASC LIMIT 2),
topk AS (
  SELECT e.vec_id, {_l2_sql('embedding', QUERY_VEC, 'duck')} AS dist
  FROM embeddings e JOIN a ON a.vec_id = e.vec_id
  WHERE a.cell IN (SELECT cell FROM probes)
  ORDER BY dist ASC, e.vec_id ASC LIMIT 10
)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_vecs,
       CAST((SELECT COUNT(DISTINCT cell) FROM a) AS BIGINT) AS n_cells_used,
       CAST((SELECT n FROM mism) AS BIGINT) AS assign_mismatch,
       CAST((SELECT n FROM cmism) AS BIGINT) AS centroid_mismatch,
       (SELECT STRING_AGG(CAST(vec_id AS VARCHAR), ',' ORDER BY dist ASC, vec_id ASC)
        FROM topk) AS topk_ids,
       CAST((SELECT SUM(CAST(FLOOR(dist * 10000) AS BIGINT)) FROM topk) AS BIGINT)
         AS topk_dist_sum_e4
""",
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over TRAINED coarse centroids: 3 Lloyd iterations (lowest-id
    init, groupBy-agg updates, 6-decimal rounding for cross-engine
    determinism), then the standard probe-2-cells + exact-rerank plan.
    The engine writes its index artifacts — (vec_id, cell) assignments
    and (cell, pos, val=assignment centroid, val_next=one-step-updated
    mean) — and reports zeros for the two audit columns; the oracle
    recomputes the argmin and the means FROM THE ARTIFACTS in DuckDB
    and must agree, and independently re-derives the probed top-k. At
    10^12 rows: train on a sample, final assign is one scan, cell is a
    partition column (see ann_ivf_topk for the probe plan notes)."""
    import shutil as _sh

    from .kmeans import assign_cells, kmeans_fit, update_centroids

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans_fit(emb, "embedding", "vec_id", _KM_K, iters=3)
    assigned = assign_cells(emb, "embedding", cents)
    cents_next = update_centroids(assigned, "embedding", cents)

    _sh.rmtree(_KM_SCRATCH, ignore_errors=True)
    assigned.select("vec_id", "cell").write.mode("overwrite").parquet(
        f"{_KM_SCRATCH}/assign"
    )
    cen_rows = [
        (cell, pos, cents[cell][pos], cents_next[cell][pos])
        for cell in range(_KM_K)
        for pos in range(len(cents[cell]))
    ]
    spark.createDataFrame(
        cen_rows, "cell int, pos int, val double, val_next double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{_KM_SCRATCH}/centroids")

    qdist = [
        sum((q - c) ** 2 for q, c in zip(QUERY_VEC, cen)) for cen in cents
    ]
    probes = sorted(sorted(range(_KM_K), key=lambda j: (qdist[j], j))[:2])
    top = (
        assigned.filter(F.col("cell").isin(probes))
        .withColumn("_d", _l2_col("embedding", QUERY_VEC))
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "_d")
        .collect()
    )
    import math as _m

    n_vecs = emb.count()
    n_cells = assigned.select("cell").distinct().count()
    row = (
        n_vecs,
        n_cells,
        0,
        0,
        ",".join(str(r["vec_id"]) for r in top),
        sum(int(_m.floor(r["_d"] * 10000)) for r in top),
    )
    return spark.createDataFrame(
        [row],
        "n_vecs long, n_cells_used long, assign_mismatch long, "
        "centroid_mismatch long, topk_ids string, topk_dist_sum_e4 long",
    )


# ---------------------------------------------------------------------------
# Q12 oracle: the batch translation map (previously pytest-only — the
# deterministic token-map stub is SQL-expressible, so DuckDB can audit
# the mapInPandas pipeline end-to-end; a real CTranslate2 kernel drops
# into the same seam via FUPI_CT2_MODEL)
# ---------------------------------------------------------------------------

from .search import _TRANSLATION_TABLE  # noqa: E402

_TR_CASE = (
    "CASE t "
    + " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(_TRANSLATION_TABLE.items())
    )
    + " ELSE t END"
)


@register(
    "translate_batch_map",
    oracle=f"""
SELECT doc_id,
       array_to_string(
         list_transform(string_split(text, ' '), t -> {_TR_CASE}), ' ')
         AS text_translated
FROM documents
ORDER BY doc_id
LIMIT 100
""",
)
def translate_batch_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (searcher.py:42-80 reference parity): the Arrow-batched
    mapInPandas translation pipeline over the first 100 documents,
    audited token-for-token by DuckDB replaying the same map (split on
    single spaces — empties preserved — per-token CASE, single-space
    rejoin). The production CTranslate2 kernel swaps in behind the
    same per-worker-model seam without touching this plan."""
    from .search import translate_results

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(100)
    )
    out = translate_results(docs, cols=("text",))
    return out.select("doc_id", "text_translated").orderBy("doc_id")


# ---------------------------------------------------------------------------
# near-dup connected components — pairs → canonical document groups
# ---------------------------------------------------------------------------

# the recursive closure below reuses the EXACT pair SQL of
# dedup_minhash_lsh (same shingle/sig/band CTEs), so the two entries are
# audited against one another: the component labeling is over the very
# pair set the LSH entry proved correct.
_DUCK_PAIRS_CTE = f"""
seeds AS (SELECT UNNEST(range(0, {MINHASH_K})) AS seed),
sigs AS (
  SELECT doc_id, seed, MIN(md5(seed || ':' || shingle)) AS sig
  FROM shingles CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(STRING_AGG(sig, '|' ORDER BY seed)) AS bucket
  FROM sigs
  GROUP BY doc_id, seed // 2
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
)
"""


@register(
    "dedup_components",
    oracle=f"""
WITH RECURSIVE {_DUCK_SHINGLES.strip()},
{_DUCK_PAIRS_CTE.strip()},
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id,
       MIN(lbl) AS component_id,
       COUNT(*) OVER (PARTITION BY MIN(lbl)) AS component_size
FROM reach
GROUP BY node
ORDER BY doc_id
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup pair graph:
    every document labeled with the smallest doc_id reachable through
    near-dup edges (its canonical representative), plus the component
    size. This is the step that turns pairwise dedup into an actionable
    keep/drop list — keep ``doc_id == component_id``, drop the rest —
    and transitively merges chains A~B~C that no pairwise threshold
    sees as one group.

    Algorithm: iterative min-label propagation — each round joins the
    current labels across the symmetric edge list and takes the min.
    Converges in O(graph diameter) rounds (near-dup components are
    shallow; the round cap asserts convergence rather than truncating).
    Each round is ONE shuffle keyed on doc_id over a labels frame of
    |V| rows plus an edges frame of 2|E| rows — never materializing
    reachability pairs, which is why this scales where the oracle's
    transitive closure (fine at sf0.01) cannot; for adversarial
    high-diameter graphs the same loop upgrades to the alternating
    large-star/small-star rounds of Kiveris et al. (MapReduce CC),
    which this structure is already shaped for. ``localCheckpoint``
    truncates the growing lineage each round; convergence is detected
    by a monotone label-sum (one scalar job per round).

    The DuckDB oracle recomputes the SAME pair set (identical CTEs as
    dedup_minhash_lsh) and closes it with a recursive CTE, so the
    component labeling is verified end-to-end, not against a replayed
    Spark result.
    """
    docs = load(spark, sf_dir, "documents")
    # pair generation identical to dedup_minhash_lsh (shared helpers)
    pairs = dedup_minhash_lsh(spark, sf_dir)  # (doc_a, doc_b)
    edges = (
        pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionAll(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
        .persist()
    )
    try:
        labels = docs.select(
            F.col("doc_id"), F.col("doc_id").alias("lbl")
        ).localCheckpoint()
        prev_sum = labels.agg(F.sum("lbl")).first()[0]
        for _ in range(50):
            nbr = edges.join(
                labels, edges["src"] == labels["doc_id"], "inner"
            ).select(F.col("dst").alias("doc_id"), "lbl")
            labels = (
                labels.unionAll(nbr)
                .groupBy("doc_id")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint()
            )
            cur_sum = labels.agg(F.sum("lbl")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError("dedup_components: no convergence in 50 rounds")
    finally:
        edges.unpersist()
    sizes = W.partitionBy("lbl")
    return (
        labels.select(
            "doc_id",
            F.col("lbl").alias("component_id"),
            F.count(F.lit(1)).over(sizes).alias("component_size"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# train/eval contamination detection: the pre-training hygiene check —
# which training documents share discriminative n-grams with the
# held-out evaluation set (benchmark leakage)
# ---------------------------------------------------------------------------

_CONTAM_MIN_SHARED = 3  # shared 3-grams below this are coincidence

from .corpus_ops import _SPLIT_PREFIX_LT as _CONTAM_SPLIT_LT


@register(
    "contamination_check",
    oracle=f"""
WITH {_DUCK_SHINGLES},
ds0 AS (SELECT DISTINCT doc_id, shingle FROM shingles),
hot AS (SELECT shingle FROM ds0 GROUP BY shingle HAVING COUNT(*) > {JACCARD_DF_CAP}),
ds AS (SELECT * FROM ds0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
lab AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_CONTAM_SPLIT_LT}'
              THEN 'holdout' ELSE 'train' END AS split
  FROM documents
),
tr AS (SELECT ds.doc_id, ds.shingle FROM ds JOIN lab ON ds.doc_id = lab.doc_id
       WHERE lab.split = 'train'),
ho AS (SELECT ds.doc_id, ds.shingle FROM ds JOIN lab ON ds.doc_id = lab.doc_id
       WHERE lab.split = 'holdout'),
pairs AS (
  SELECT tr.doc_id AS train_doc, ho.doc_id AS eval_doc, COUNT(*) AS n_shared
  FROM tr JOIN ho ON tr.shingle = ho.shingle
  GROUP BY tr.doc_id, ho.doc_id
)
SELECT train_doc,
       CAST(COUNT(*) AS BIGINT) AS n_eval_partners,
       CAST(SUM(n_shared) AS BIGINT) AS shared_total,
       CAST(MAX(n_shared) AS BIGINT) AS max_shared
FROM pairs WHERE n_shared >= {_CONTAM_MIN_SHARED}
GROUP BY train_doc
ORDER BY shared_total DESC, train_doc
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep: training documents that share
    >= {mins} discriminative 3-gram shingles with any held-out
    evaluation document (the split is corpus_ops' reproducible md5
    carve-out, so train/eval membership is engine-independent).

    Scale shape: the SAME inverted-index join as dedup_jaccard_ngram —
    hot shingles are capped BEFORE the join so a stopword 3-gram can't
    go quadratic, and the join is train-side x eval-side (the eval set
    is typically ~1% of the corpus, so the build side is small and
    broadcastable at any corpus size — contamination against a fixed
    benchmark suite is a broadcast join even at 100 TB). Integer
    outputs only (counts), so the oracle hashes bit-for-bit."""
    from .corpus_ops import _SPLIT_PREFIX_LT

    docs = load(spark, sf_dir, "documents")
    ds0 = _spark_shingles(docs).distinct()
    hot = (
        ds0.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > JACCARD_DF_CAP)
        .select("shingle")
    )
    ds = ds0.join(hot, "shingle", "left_anti")
    lab = docs.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < _SPLIT_PREFIX_LT,
            F.lit("holdout"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    labeled = ds.join(lab, "doc_id")
    tr = labeled.filter(F.col("split") == "train").select("doc_id", "shingle")
    ho = labeled.filter(F.col("split") == "holdout").select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    pairs = (
        tr.join(F.broadcast(ho), "shingle")
        .groupBy(F.col("doc_id").alias("train_doc"), "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _CONTAM_MIN_SHARED)
    )
    return (
        pairs.groupBy("train_doc")
        .agg(
            F.count(F.lit(1)).alias("n_eval_partners"),
            F.sum("n_shared").alias("shared_total"),
            F.max("n_shared").alias("max_shared"),
        )
        .orderBy(F.desc("shared_total"), "train_doc")
    )


contamination_check.__doc__ = contamination_check.__doc__.format(
    mins=_CONTAM_MIN_SHARED
)


# ---------------------------------------------------------------------------
# vocabulary construction: top-k tokens with cumulative corpus coverage
# (the tokenizer-vocab sizing curve — how much of the corpus the first
# k vocabulary entries explain)
# ---------------------------------------------------------------------------

_VOCAB_K = 50


@register(
    "vocab_topk_coverage",
    oracle=f"""
WITH {_DUCK_TOKS},
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token),
tot AS (SELECT SUM(n) AS t FROM c),
top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT {_VOCAB_K})
SELECT token, n,
       CAST((SUM(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING)
             * 1000000) // t AS BIGINT) AS coverage_e6
FROM top, tot
ORDER BY n DESC, token
""",
)
def vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary sizing curve: the {k} most frequent whitespace tokens
    with each prefix's cumulative corpus coverage (scaled-integer parts
    per million — ``cum*1e6 div total`` stays in BIGINT arithmetic, so
    both engines hash identically).

    Scale shape: token counting is a map-side-combined groupBy (the
    heavy pass — shuffle volume is the distinct vocabulary, not the
    corpus); the top-k is TakeOrderedAndProject; the running-coverage
    window runs over only k rows AFTER the limit, so the
    single-partition window is k-bounded at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        _spark_toks(docs)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    top = counts.orderBy(F.desc("n"), "token").limit(_VOCAB_K)
    w = W.orderBy(F.desc("n"), "token").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n",
            (F.sum("n").over(w) * 1000000).alias("_cum"),
            "t",
        )
        .select(
            "token",
            "n",
            F.expr("_cum div t").cast("bigint").alias("coverage_e6"),
        )
        .orderBy(F.desc("n"), "token")
    )


vocab_topk_coverage.__doc__ = vocab_topk_coverage.__doc__.format(k=_VOCAB_K)


# ---------------------------------------------------------------------------
# product-quantization ANN: trained codebooks -> 16-bit codes -> ADC
# scan -> exact rerank (pq.py; the PQ half of Lance's IVF_PQ)
# ---------------------------------------------------------------------------

_PQ_SCRATCH = f"/tmp/fupi_spark_pq_{_os.getpid()}"


@register(
    "ann_pq_topk",
    oracle=f"""
WITH lut AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/lut/*.parquet')),
codes AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/codes/*.parquet')),
adc AS (
  -- correlated scalar lookups (see ann_ivf_pq_residual_topk: an 8-way
  -- join invites the optimizer to cross-join the LUT relations)
  SELECT codes.vec_id,
         ((((((((SELECT v FROM lut WHERE lut.s = 0 AND lut.k = codes.c0) + (SELECT v FROM lut WHERE lut.s = 1 AND lut.k = codes.c1)) + (SELECT v FROM lut WHERE lut.s = 2 AND lut.k = codes.c2)) + (SELECT v FROM lut WHERE lut.s = 3 AND lut.k = codes.c3)) + (SELECT v FROM lut WHERE lut.s = 4 AND lut.k = codes.c4)) + (SELECT v FROM lut WHERE lut.s = 5 AND lut.k = codes.c5)) + (SELECT v FROM lut WHERE lut.s = 6 AND lut.k = codes.c6)) + (SELECT v FROM lut WHERE lut.s = 7 AND lut.k = codes.c7)) AS adc
  FROM codes
),
cand AS (SELECT vec_id, adc FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 50)
SELECT e.vec_id,
       CAST(FLOOR(cand.adc * 10000) AS BIGINT) AS adc_e4,
       CAST(FLOOR(({_l2_sql('e.embedding', QUERY_VEC, 'duck')}) * 10000) AS BIGINT)
         AS distance_e4
FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
ORDER BY ({_l2_sql('e.embedding', QUERY_VEC, 'duck')}) ASC, e.vec_id ASC
LIMIT 10
""",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN end to end (pq.py): train one
    16-centroid codebook per 8-dim subspace with the deterministic
    Lloyd job, encode every vector as 8 codes (32 bits — 64x
    compression of the 256-byte vector; recall@10 = 0.8 measured with
    the 50-candidate rerank, gated by pytest), scan ONLY the codes with the
    query's ADC lookup tables (a codegen expression, no vector math),
    exact-rerank the top-50 ADC candidates, return the top-10 by exact
    distance. Codes and LUT go to sidecars; the oracle re-runs the ADC
    join + candidate selection from those artifacts and recomputes the
    FINAL exact distances independently from the embeddings table
    (unrolled left-associative SQL — the _l2_col bitwise contract), so
    mis-encoded codes, a wrong lookup, a broken sum order, or a bad
    rerank all break rows. Completes the from-scratch IVF_PQ story the
    reference delegates to Lance."""
    import shutil as _sh

    from .pq import pq_encode, pq_lut, pq_topk, pq_train

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = pq_train(emb, "embedding", "vec_id", dim=64, subs=8, iters=2)
    codes = pq_encode(emb, "embedding", "vec_id", books, dim=64)

    _sh.rmtree(_PQ_SCRATCH, ignore_errors=True)
    codes.coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/codes")
    lut = pq_lut(QUERY_VEC, books)
    spark.createDataFrame(
        [
            (s, k, float(v))
            for s, row in enumerate(lut)
            for k, v in enumerate(row)
        ],
        "s int, k int, v double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/lut")

    codes_back = spark.read.parquet(f"{_PQ_SCRATCH}/codes")
    top = pq_topk(emb, codes_back, "embedding", "vec_id", lut, QUERY_VEC)
    # order by the FULL-PRECISION exact distance (the oracle's ORDER
    # BY), not the floored e4 projection: two candidates sharing an e4
    # floor but differing in exact distance would otherwise order
    # differently than the oracle (advice r6; the sibling ivf_pq
    # queries already order by _d before the projection)
    return top.orderBy(F.col("_exact").asc(), F.col("vec_id").asc()).select(
        "vec_id",
        F.floor(F.col("_adc") * 10000).cast("bigint").alias("adc_e4"),
        F.floor(F.col("_exact") * 10000).cast("bigint").alias("distance_e4"),
    )


# ---------------------------------------------------------------------------
# the FULL IVF_PQ layout: coarse cells (trained) prune the scan, PQ
# codes carry the in-cell distance estimate, exact rerank finishes —
# the complete from-scratch rebuild of the index the reference creates
# via Lance (utils.py:149-161)
# ---------------------------------------------------------------------------


@register(
    "ann_ivf_pq_topk",
    oracle=f"""
WITH cen AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/ivf_cents/*.parquet')),
qv(pos, q) AS (VALUES {_KM_QV_VALUES}),
probes AS (
  SELECT cell FROM (
    SELECT cen.cell, SUM((cen.val - qv.q) * (cen.val - qv.q)) AS d
    FROM cen JOIN qv ON cen.pos = qv.pos
    GROUP BY cen.cell ORDER BY d ASC, cen.cell ASC LIMIT 2
  )
),
assign AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/ivf_assign/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/lut/*.parquet')),
codes AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/codes/*.parquet')),
adc AS (
  -- correlated scalar lookups (see ann_ivf_pq_residual_topk)
  SELECT codes.vec_id, assign.cell,
         ((((((((SELECT v FROM lut WHERE lut.s = 0 AND lut.k = codes.c0) + (SELECT v FROM lut WHERE lut.s = 1 AND lut.k = codes.c1)) + (SELECT v FROM lut WHERE lut.s = 2 AND lut.k = codes.c2)) + (SELECT v FROM lut WHERE lut.s = 3 AND lut.k = codes.c3)) + (SELECT v FROM lut WHERE lut.s = 4 AND lut.k = codes.c4)) + (SELECT v FROM lut WHERE lut.s = 5 AND lut.k = codes.c5)) + (SELECT v FROM lut WHERE lut.s = 6 AND lut.k = codes.c6)) + (SELECT v FROM lut WHERE lut.s = 7 AND lut.k = codes.c7)) AS adc
  FROM codes
  JOIN assign ON assign.vec_id = codes.vec_id
  WHERE assign.cell IN (SELECT cell FROM probes)
),
cand AS (SELECT vec_id, cell, adc FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 50)
SELECT e.vec_id, cand.cell,
       CAST(FLOOR(({_l2_sql('e.embedding', QUERY_VEC, 'duck')}) * 10000) AS BIGINT)
         AS distance_e4
FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
ORDER BY ({_l2_sql('e.embedding', QUERY_VEC, 'duck')}) ASC, e.vec_id ASC
LIMIT 10
""",
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete IVF_PQ plan: trained coarse cells prune the scan to
    2 of 4 cells, the PQ codes of surviving vectors carry the ADC
    distance estimate (no full-vector math until rerank), the top-50
    ADC candidates get one exact-distance pass, top-10 out. Every
    index artifact (cell assignments, coarse centroids, codes, LUT)
    goes to sidecars; the oracle re-derives the probe set from the
    centroids + query (ranking-robust: cell distances differ at O(1)),
    re-runs the cell-filtered ADC join and candidate cut, and
    recomputes the final exact distances independently. At 10^12
    vectors: cell is a partition column (scan reads 2/K of the codes),
    codes are 32 bits/vector, rerank reads 50 full vectors — the
    trillion-vector plan end to end, from-scratch."""
    import shutil as _sh

    from .kmeans import assign_cells, kmeans_fit
    from .pq import pq_encode, pq_lut, pq_topk, pq_train

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans_fit(emb, "embedding", "vec_id", _KM_K, iters=2)
    assigned = assign_cells(emb, "embedding", cents).select("vec_id", "cell")
    books = pq_train(emb, "embedding", "vec_id", dim=64, subs=8, iters=2)
    codes = pq_encode(emb, "embedding", "vec_id", books, dim=64)
    lut = pq_lut(QUERY_VEC, books)

    _sh.rmtree(f"{_PQ_SCRATCH}/ivf_cents", ignore_errors=True)
    _sh.rmtree(f"{_PQ_SCRATCH}/ivf_assign", ignore_errors=True)
    spark.createDataFrame(
        [
            (cell, pos, float(v))
            for cell, cen in enumerate(cents)
            for pos, v in enumerate(cen)
        ],
        "cell int, pos int, val double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/ivf_cents")
    assigned.coalesce(1).write.mode("overwrite").parquet(
        f"{_PQ_SCRATCH}/ivf_assign"
    )
    codes.coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/codes")
    spark.createDataFrame(
        [
            (s, k, float(v))
            for s, row in enumerate(lut)
            for k, v in enumerate(row)
        ],
        "s int, k int, v double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/lut")

    qdist = [
        sum((q - c) ** 2 for q, c in zip(QUERY_VEC, cen)) for cen in cents
    ]
    probes = sorted(sorted(range(_KM_K), key=lambda j: (qdist[j], j))[:2])

    from .pq import adc_distance
    from .queries import _l2_col as _l2c

    cand = (
        codes.join(assigned, "vec_id")
        .filter(F.col("cell").isin(probes))
        .withColumn("_adc", adc_distance(lut))
        .orderBy(F.col("_adc").asc(), F.col("vec_id").asc())
        .limit(50)
        .select("vec_id", "cell")
    )
    return (
        cand.join(emb, "vec_id")
        .withColumn("_d", _l2c("embedding", QUERY_VEC))
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select(
            "vec_id",
            "cell",
            F.floor(F.col("_d") * 10000).cast("bigint").alias("distance_e4"),
        )
    )


# ---------------------------------------------------------------------------
# residual-encoded IVF_PQ: PQ trained on (vec - cell centroid), the
# query LUT built per probed cell — the refinement real IVF_PQ
# implementations (Lance/FAISS) use, because residuals are much
# smaller than raw vectors and the same codebook budget buys finer
# resolution near every cell center
# ---------------------------------------------------------------------------


@register(
    "ann_ivf_pq_residual_topk",
    oracle=f"""
WITH cen AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/r_cents/*.parquet')),
qv(pos, q) AS (VALUES {_KM_QV_VALUES}),
probes AS (
  SELECT cell FROM (
    SELECT cen.cell, SUM((cen.val - qv.q) * (cen.val - qv.q)) AS d
    FROM cen JOIN qv ON cen.pos = qv.pos
    GROUP BY cen.cell ORDER BY d ASC, cen.cell ASC LIMIT 2
  )
),
assign AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/r_assign/*.parquet')),
lut AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/r_lut/*.parquet')),
codes AS (SELECT * FROM read_parquet('{_PQ_SCRATCH}/r_codes/*.parquet')),
adc AS (
  -- correlated scalar lookups, not an 8-way join: the join-order
  -- optimizer cross-joined the LUT relations before applying the
  -- codes predicates (256^8 blowup); scalar subqueries pin one lookup
  -- per term and keep the left-associative add order
  SELECT codes.vec_id, assign.cell,
         ((((((((SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 0 AND lut.k = codes.c0) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 1 AND lut.k = codes.c1)) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 2 AND lut.k = codes.c2)) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 3 AND lut.k = codes.c3)) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 4 AND lut.k = codes.c4)) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 5 AND lut.k = codes.c5)) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 6 AND lut.k = codes.c6)) + (SELECT v FROM lut WHERE lut.cell = assign.cell AND lut.s = 7 AND lut.k = codes.c7)) AS adc
  FROM codes
  JOIN assign ON assign.vec_id = codes.vec_id
  WHERE assign.cell IN (SELECT cell FROM probes)
),
cand AS (SELECT vec_id, cell, adc FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 50)
SELECT e.vec_id, cand.cell,
       CAST(FLOOR(({_l2_sql('e.embedding', QUERY_VEC, 'duck')}) * 10000) AS BIGINT)
         AS distance_e4
FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
ORDER BY ({_l2_sql('e.embedding', QUERY_VEC, 'duck')}) ASC, e.vec_id ASC
LIMIT 10
""",
)
def ann_ivf_pq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF_PQ with residual encoding: vectors are quantized as
    (vec − cell centroid) — a codegen zip_with against the literal
    centroid matrix — and the query's ADC lookup tables are built PER
    PROBED CELL from (query − centroid_cell). Same artifacts-to-sidecar
    audit as ann_ivf_pq_topk, with the LUT keyed by (cell, s, k); the
    oracle re-derives the probes, re-runs the per-cell ADC join and
    cut, and recomputes the final exact distances independently. The
    residual refinement is why production IVF_PQ beats flat PQ at the
    same code budget on clustered data; this synthetic corpus is
    near-isotropic (cells explain little variance), so the pytest gates
    a recall floor rather than superiority — the hard contract is the
    sidecar-audited oracle equality."""
    import shutil as _sh

    from .kmeans import assign_cells, kmeans_fit
    from .pq import (
        adc_distance,
        pq_encode,
        pq_lut,
        pq_train,
        query_residual,
        residual_col,
    )
    from .queries import _l2_col as _l2c

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = kmeans_fit(emb, "embedding", "vec_id", _KM_K, iters=2)
    assigned = assign_cells(emb, "embedding", cents)
    # materialize the residual projection ONCE: the argmin-fold cell +
    # zip_with residual expression re-planned under every one of the 8
    # subspace trainers makes Catalyst analysis itself the bottleneck;
    # at 10^12 rows you materialize this projection anyway (it is the
    # training set) — one write, flat plans everywhere downstream
    _sh.rmtree(f"{_PQ_SCRATCH}/r_resid", ignore_errors=True)
    assigned.withColumn(
        "_resid", residual_col("embedding", "cell", cents)
    ).select("vec_id", "cell", "_resid").write.mode("overwrite").parquet(
        f"{_PQ_SCRATCH}/r_resid"
    )
    resid = spark.read.parquet(f"{_PQ_SCRATCH}/r_resid")
    books = pq_train(resid, "_resid", "vec_id", dim=64, subs=8, iters=2)
    codes = pq_encode(resid, "_resid", "vec_id", books, dim=64)

    qdist = [
        sum((q - c) ** 2 for q, c in zip(QUERY_VEC, cen)) for cen in cents
    ]
    probes = sorted(sorted(range(_KM_K), key=lambda j: (qdist[j], j))[:2])
    luts = {
        cell: pq_lut(query_residual(QUERY_VEC, cents[cell]), books)
        for cell in probes
    }

    for d in ("r_cents", "r_assign", "r_codes", "r_lut"):
        _sh.rmtree(f"{_PQ_SCRATCH}/{d}", ignore_errors=True)
    spark.createDataFrame(
        [
            (cell, pos, float(v))
            for cell, cen in enumerate(cents)
            for pos, v in enumerate(cen)
        ],
        "cell int, pos int, val double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/r_cents")
    resid.select("vec_id", "cell").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{_PQ_SCRATCH}/r_assign")
    codes.coalesce(1).write.mode("overwrite").parquet(
        f"{_PQ_SCRATCH}/r_codes"
    )
    spark.createDataFrame(
        [
            (cell, s, k, float(v))
            for cell, lut in luts.items()
            for s, row in enumerate(lut)
            for k, v in enumerate(row)
        ],
        "cell int, s int, k int, v double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_PQ_SCRATCH}/r_lut")

    # read the just-written artifacts back: the codes frame carries
    # 8x16 fold expressions whose re-analysis under two union branches
    # dwarfs the actual compute — the flat sidecar read is the plan
    # the oracle audits anyway
    cells_codes = spark.read.parquet(f"{_PQ_SCRATCH}/r_codes").join(
        spark.read.parquet(f"{_PQ_SCRATCH}/r_assign"), "vec_id"
    )
    per_cell = [
        cells_codes.filter(F.col("cell") == cell).withColumn(
            "_adc", adc_distance(luts[cell])
        )
        for cell in probes
    ]
    cand = (
        per_cell[0].unionByName(per_cell[1])
        .orderBy(F.col("_adc").asc(), F.col("vec_id").asc())
        .limit(50)
        .select("vec_id", "cell")
    )
    return (
        cand.join(emb, "vec_id")
        .withColumn("_d", _l2c("embedding", QUERY_VEC))
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select(
            "vec_id",
            "cell",
            F.floor(F.col("_d") * 10000).cast("bigint").alias("distance_e4"),
        )
    )
