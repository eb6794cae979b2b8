"""Oracle-checked queries over the driver testdata tables.

Each entry re-expresses an operator (or operator chain) from SURVEY.md §2
as an idiomatic Spark DataFrame/SQL program, together with an ANSI-SQL
oracle string that DuckDB runs on the same parquet views. Reference
parity is cited per query (file:line into /root/reference).

Cross-engine determinism rules used throughout:
- every ORDER BY carries a unique tiebreaker (doc_id / vec_id / ...)
  so top-k row sets are stable across engines;
- float expressions are generated ONCE as left-associative SQL text and
  fed to both engines, so both compute bitwise-identical doubles;
- float outputs are rounded explicitly (same ROUND in both dialects);
- string hashing uses md5() which is identical in Spark and DuckDB;
- token splits filter out empty strings (engines disagree on trailing
  empties).

Scale notes: all queries below are shuffle-minimal by construction —
top-k runs as TakeOrderedAndProject (no full sort), small sides of joins
are broadcast, aggregations are partial-agg friendly (no
collect-to-driver anywhere).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# deterministic 64-d query vector (embeddings testdata is 64-d float32)
# ---------------------------------------------------------------------------

EMB_DIM = 64
QUERY_VEC: list[float] = [round(math.sin(d * 0.7 + 0.3), 6) for d in range(EMB_DIM)]


def _l2_sql(col: str, vec: list[float], dialect: str) -> str:
    """Left-associative L2 distance expression, identical text semantics
    in Spark SQL and DuckDB so both engines produce bitwise-equal doubles.

    Mirrors the reference's ANN distance column `_distance`
    (/root/reference/fupi/utils.py:149-161: Lance L2 top-k scan).
    """
    terms = []
    for i, q in enumerate(vec):
        if dialect == "spark":
            e = f"CAST(element_at({col}, {i + 1}) AS DOUBLE)"
        else:
            e = f"CAST({col}[{i + 1}] AS DOUBLE)"
        terms.append(f"({e} - CAST({q!r} AS DOUBLE)) * ({e} - CAST({q!r} AS DOUBLE))")
    return " + ".join(terms)


def _l2_col(col: str, vec: list[float]):
    """Spark Column twin of _l2_sql('duck'): zip_with + aggregate is a
    left fold in array order, so it is bitwise-identical to the
    unrolled left-associative SQL sum (verified in tests) while keeping
    codegen small."""
    qlit = F.array(*[F.lit(float(q)) for q in vec])
    return F.aggregate(
        F.zip_with(F.col(col).cast("array<double>"), qlit, lambda x, q: (x - q) * (x - q)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2_multi_col(col: str, cents: list[list[float]]):
    """array<double> of ``_l2_col(col, c)`` for every centroid ``c`` —
    built as ONE expression (a literal 2-D array + nested transform)
    instead of K independent fold expressions. Element values are
    bit-identical to K separate _l2_col calls (same zip_with+aggregate
    left fold per centroid, tested); the win is Catalyst analysis cost:
    K×dim literal folds made every (re)planning pass O(K·dim) in
    expression-tree size, which dominated the PQ/IVF trainers at small
    scale (r6, guide §1: the driver was the bottleneck, not the data)."""
    cents2 = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents])
    vec = F.col(col).cast("array<double>")
    return F.transform(
        cents2,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, q: (x - q) * (x - q)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def _dot_col(col: str, vec: list[float]):
    qlit = F.array(*[F.lit(float(q)) for q in vec])
    return F.aggregate(
        F.zip_with(F.col(col).cast("array<double>"), qlit, lambda x, q: x * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(col: str, vec: list[float], dialect: str) -> str:
    """Left-associative dot product, bitwise-equal across engines."""
    terms = []
    for i, q in enumerate(vec):
        if dialect == "spark":
            e = f"CAST(element_at({col}, {i + 1}) AS DOUBLE)"
        else:
            e = f"CAST({col}[{i + 1}] AS DOUBLE)"
        terms.append(f"{e} * CAST({q!r} AS DOUBLE)")
    return " + ".join(terms)


# ---------------------------------------------------------------------------
# flagship: fupi search pipeline Q3-Q10 as one DataFrame program
# ---------------------------------------------------------------------------
#
# Reference semantics (/root/reference/fupi/utils.py:140-200 and
# searcher.py:266-287): ANN top-k over the sentence-level vector column →
# project 3 cols → join text-level on text_id → LENGTH(sentence)>3 filter
# → ORDER BY text_id, sentence_id → GROUP BY + string_agg with ', ' →
# ORDER BY distance LIMIT 10.
#
# Mapping onto driver tables: `embeddings` plays sentence-level
# (vec_id ~ sentence_id), `documents` plays text-level; vec_id % 250 maps
# several vectors to one parent doc so the ordered string_agg is
# genuinely exercised. Spark aggregation does not see input order, so the
# reference's ORDER-BY-then-string_agg (fupi/utils.py:178-196) becomes
# array_sort(collect_list(struct(...))) — sort moved inside the group.


@register(
    "flagship_search",
    oracle=f"""
WITH hits AS (
  SELECT vec_id, {_l2_sql('embedding', QUERY_VEC, 'duck')} AS distance
  FROM embeddings
  ORDER BY distance ASC, vec_id ASC
  LIMIT 30
),
joined AS (
  SELECT h.vec_id, h.distance, d.doc_id, d.lang, d.source
  FROM hits h
  JOIN documents d ON d.doc_id = h.vec_id % 250
  WHERE length(d.text) > 3
)
SELECT
  doc_id, lang, source,
  ROUND(MIN(distance), 6) AS best_distance,
  COUNT(*) AS n_hits,
  STRING_AGG(CAST(vec_id AS VARCHAR), ', ' ORDER BY distance, vec_id) AS hit_ids
FROM joined
GROUP BY doc_id, lang, source
ORDER BY best_distance ASC, doc_id ASC
LIMIT 10
""",
)
def flagship_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")

    # Q3: brute-force exact k-NN. orderBy+limit compiles to
    # TakeOrderedAndProject — per-partition top-k then driver merge, no
    # full shuffle sort; at 100 TB swap in an LSH/IVF pre-filter.
    hits = (
        emb.select("vec_id", _l2_col("embedding", QUERY_VEC).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(30)
    )

    # Q5: top-k side is tiny → broadcast it (reference joins 10 hits vs
    # the full text table, fupi/utils.py:174-176).
    joined = (
        F.broadcast(hits)
        .withColumn("doc_id", F.col("vec_id") % 250)
        .join(docs, "doc_id", "inner")
        .filter(F.length("text") > 3)  # Q6: fupi/utils.py:177
    )

    # Q7+Q8: ordered string aggregation — order moved inside the group.
    return (
        joined.groupBy("doc_id", "lang", "source")
        .agg(
            F.round(F.min("distance"), 6).alias("best_distance"),
            F.count(F.lit(1)).alias("n_hits"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("distance", "vec_id"))),
                    lambda x: x["vec_id"].cast("string"),
                ),
                ", ",
            ).alias("hit_ids"),
        )
        .orderBy(F.col("best_distance").asc(), F.col("doc_id").asc())  # Q9
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ingestion-path operators (SURVEY §2.1)
# ---------------------------------------------------------------------------


@register(
    "ingest_scan_filter",
    oracle="""
SELECT doc_id, source AS origin, upper(lang) AS lang_uc, n_chars
FROM documents
WHERE text IS NOT NULL AND lang IS NOT NULL
  AND n_chars > 100 AND source NOT LIKE '%7'
ORDER BY doc_id
LIMIT 200
""",
)
def ingest_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3+I5+I6: projection/rename + null & LIKE predicates + limit
    (/root/reference/fupi/data.py:57-74). Filters and the 4-column
    projection reach the parquet scan via Catalyst pushdown."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.col("text").isNotNull()
            & F.col("lang").isNotNull()
            & (F.col("n_chars") > 100)
            & ~F.col("source").like("%7")
        )
        .select(
            "doc_id",
            F.col("source").alias("origin"),
            F.upper("lang").alias("lang_uc"),
            "n_chars",
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "ids_rownumber",
    oracle="""
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS text_id
FROM documents
ORDER BY text_id
""",
)
def ids_rownumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: dense sequence ids — the reference's CREATE SEQUENCE/nextval
    (/root/reference/fupi/data.py:39,60). Assigned via the
    partition-offset scheme (ids.dense_ids): range shuffle +
    per-partition ranks + driver prefix-sum — same ids as a global
    row_number window, with no Exchange SinglePartition in the plan
    (asserted in tests/test_plans.py)."""
    from .ids import dense_ids

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = dense_ids(docs, [F.col("n_chars").desc(), F.col("doc_id").asc()], "text_id")
    return out.select("doc_id", "text_id").orderBy("text_id")


@register(
    "segment_explode",
    oracle="""
WITH toks AS (
  SELECT doc_id, t.tok AS token, t.pos - 1 AS pos
  FROM documents,
       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos) t
  WHERE t.tok <> ''
)
SELECT doc_id, pos, token,
       ROW_NUMBER() OVER (ORDER BY doc_id, pos) AS segment_id
FROM toks
WHERE doc_id < 100
ORDER BY segment_id
""",
)
def segment_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I8: 1→N segmentation explode with a globally increasing segment id
    (/root/reference/fupi/data.py:86-100: pysbd split + running
    sentence_id). Spark: split + posexplode, then ids.dense_ids over
    (doc_id, pos) — the reference's running counter over insertion
    order, without the single-reducer window."""
    from .ids import dense_ids

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).filter(F.col("token") != "")
    # keys_join=False (r6, VERDICT r5 #3): the keys-only path would
    # re-evaluate the split+posexplode for the join-back AND pay the
    # uniqueness-validation job — ids.py names the sentence-splitter
    # explode as exactly the case for the full-width checkpoint
    # (mirrors ingest.segment). Same ids, one explode evaluation.
    out = dense_ids(toks, ["doc_id", "pos"], "segment_id", keys_join=False)
    return out.select("doc_id", "pos", "token", "segment_id").orderBy("segment_id")


@register(
    "dedup_exact",
    oracle="""
SELECT doc_id, md5(text) AS fingerprint
FROM (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn = 1
ORDER BY doc_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I12: dedup-by-key (/root/reference/fupi/embedders.py:92,
    drop_duplicates). Expressed as keep-first-per-fingerprint so the
    survivor choice is deterministic (dropDuplicates keeps an arbitrary
    row). md5-groupBy is the exact-dedup primitive for training-data
    pipelines; hash first so the shuffle key is 16 bytes, not the text."""
    docs = load(spark, sf_dir, "documents")
    # keep-first == min(doc_id) per fingerprint, so a partial-agg
    # groupBy replaces the r1-r5 row_number window (r6, guide §2.3):
    # map-side combine shuffles only (16-byte hash, long) partials —
    # the window shuffled every (doc_id, fingerprint, text) row and
    # sorted each partition. Result rows identical (oracle unchanged).
    return (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    )


@register(
    "centroid_by_label",
    oracle="""
SELECT label, pos, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS centroid_val, COUNT(*) AS n
FROM (
  SELECT label, t.val AS val, t.pos AS pos
  FROM embeddings,
       LATERAL (SELECT UNNEST(embedding) AS val,
                       generate_subscripts(embedding, 1) AS pos) t
)
GROUP BY label, pos
HAVING pos <= 8
ORDER BY label, pos
""",
)
def centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I14: group-by vector-centroid UDAF
    (/root/reference/fupi/embedders.py:98-108: element-wise mean of
    1024-d vectors per text_id). Pure-SQL form: posexplode → avg per
    (key, pos) — no Python at all, fully partial-aggregatable, so at
    100 TB it map-side combines before one shuffle. First 8 dims kept
    for a compact oracle comparison."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .withColumn("pos", F.col("pos0") + 1)
        .filter(F.col("pos") <= 8)
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("label", "pos")
    )


# ---------------------------------------------------------------------------
# generic relational coverage (joins / aggs / windows / top-k) — §2.3
# ---------------------------------------------------------------------------


@register(
    "tpch_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-agg coverage (TPC-H Q1 shape). Partial aggregation +
    2-shuffle-partition final — the canonical map-side-combine plan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "join_orders_customer",
    oracle="""
SELECT c.c_custkey, c.c_name,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total_spent
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spent DESC, c_custkey ASC
LIMIT 50
""",
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join coverage (Q5 shape, /root/reference/fupi/utils.py:174).
    customer is the small dimension → explicit broadcast, so the big
    fact side never shuffles for the join.

    r6 (guide §2.3 "aggregate before you shuffle"): the fact side is
    pre-aggregated BY o_custkey before the join — c_custkey is the
    dimension's unique key (verified: 150k rows, 150k distinct at every
    sf), so grouping by it pre- or post-join is row-identical while the
    join and shuffle now carry 150k partials instead of 1.5M fact rows,
    and the group key is an int instead of (int, string). Measured 2×
    at sf1.0 (1.9 → 0.7 s), rows verified identical."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    pre = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("_total"),
    )
    return (
        pre.join(F.broadcast(cust), pre.o_custkey == cust.c_custkey, "inner")
        .select(
            "c_custkey",
            "c_name",
            "n_orders",
            F.round("_total", 2).alias("total_spent"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(50)
    )


@register(
    "events_running_window",
    oracle="""
SELECT event_id, user_id, event_type,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_value
FROM events
WHERE user_id < 50
ORDER BY user_id, seq
""",
)
def events_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage (running aggregate per key). Partitioned
    window — shuffles once on user_id, then sorts within partitions;
    scales linearly with keys."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.row_number().over(w).alias("seq"),
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 4).alias(
            "running_value"
        ),
    ).orderBy("user_id", "seq")


# ---------------------------------------------------------------------------
# similarity search — brute-force ANN baseline (scale path: LSH, later)
# ---------------------------------------------------------------------------


@register(
    "ann_topk_dot",
    oracle=f"""
WITH scored AS (
  SELECT vec_id, label, {_dot_sql('embedding', QUERY_VEC, 'duck')} AS score
  FROM embeddings
)
SELECT vec_id, label, ROUND(score, 6) AS score_r
FROM scored
ORDER BY score DESC, vec_id ASC
LIMIT 20
""",
)
def ann_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k by dot product (similarity-search baseline).
    Ordering uses the full-precision score (bitwise-identical in both
    engines by construction); only the output is rounded."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", "label", _dot_col("embedding", QUERY_VEC).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .select("vec_id", "label", F.round("score", 6).alias("score_r"))
        .limit(20)
    )
