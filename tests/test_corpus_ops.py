"""Corpus-lifecycle operators (splits / sessionize / packing /
streaming windows): oracle parity at sf0.001, the properties each
operator guarantees, and partitioning-invariance (the result may not
depend on how the input happens to be partitioned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fupi_spark import corpus_ops as C
from tests.oracle_check import compare

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# oracle parity at the small SF (driver runs sf0.01; this pins both)
# ---------------------------------------------------------------------------


def test_oracle_parity_small_sf(spark):
    from fupi_spark.queries import ORACLE, QUERIES

    for name in (
        "split_train_holdout",
        "split_stratified",
        "events_sessionize",
        "pack_sequences",
    ):
        compare(QUERIES[name](spark, SF), ORACLE[name], SF)


# ---------------------------------------------------------------------------
# split properties
# ---------------------------------------------------------------------------


def test_hash_split_is_stable_under_append(spark):
    """Membership depends only on doc_id: computing the split on a
    half corpus and on the full corpus must agree on the shared docs —
    the reproducibility property that makes the carve-out safe to
    recompute after every ingest."""
    full = C.split_train_holdout(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half_ids = [r.doc_id for r in docs.limit(20).collect()]
    full_map = {r.doc_id: r.split for r in full.collect()}
    # recompute over a pruned frame (simulates the earlier corpus)
    pruned = docs.filter(F.col("doc_id").isin(half_ids))
    again = {
        r.doc_id: r.split
        for r in pruned.select(
            "doc_id",
            F.when(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
                < C._SPLIT_PREFIX_LT,
                F.lit("holdout"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        ).collect()
    }
    assert again == {k: full_map[k] for k in again}
    # and the holdout fraction is in the right ballpark (~10%)
    n = len(full_map)
    hold = sum(1 for v in full_map.values() if v == "holdout")
    assert 0.02 <= hold / n <= 0.25


def test_stratified_split_exact_quota(spark):
    df = C.split_stratified(spark, SF)
    per = (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("split") == "holdout", 1).otherwise(0)).alias(
                "h"
            ),
        )
        .collect()
    )
    assert per  # non-empty strata
    for r in per:
        assert r.h == r.n // 10, f"lang {r.lang}: {r.h} != {r.n}//10"


# ---------------------------------------------------------------------------
# sessionize properties
# ---------------------------------------------------------------------------


def test_sessionize_gap_property(spark):
    """Within a session no inter-event gap exceeds 5 min; consecutive
    sessions of the same user are separated by MORE than 5 min."""
    sess = C.events_sessionize(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    gap = 5 * 60
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.session_seq)
        # session_seq is dense from 1
        assert [r.session_seq for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (b.start_ts - a.end_ts).total_seconds() > gap
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    ev.sort(key=lambda r: (r.user_id, r.ts, r.event_id))
    # event counts reconcile
    assert sum(r.n_events for r in sess) == len(ev)


def test_sessionize_partitioning_invariant(spark):
    a = _rows(C.events_sessionize(spark, SF))
    shuffled = (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(13, "event_type")
    )
    tmp = "/tmp/fupi_corpus_ops_events_repart"
    shuffled.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    b = _rows(C.events_sessionize(spark, tmp))
    assert a == b


# ---------------------------------------------------------------------------
# packing properties
# ---------------------------------------------------------------------------


def test_pack_sequences_layout(spark):
    rows = C.pack_sequences(spark, SF).collect()
    cap = C._PACK_CAPACITY
    by_src: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.bin_offset < cap
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            # first token of each doc lands exactly at the running total
            assert r.bin_id == cum // cap and r.bin_offset == cum % cap
            cum += r.n_tokens
        # bins are contiguous from 0
        assert rs[0].bin_id == 0


# ---------------------------------------------------------------------------
# streaming windows: watermark-withheld tail is exactly the batch tail
# ---------------------------------------------------------------------------


def test_stream_windows_match_batch_with_watermark_cutoff(spark):
    out = C.stream_windowed_counts(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    mx = ev.agg(F.max("ts")).first()[0]
    batch = ev.groupBy(
        F.date_trunc("hour", "ts").alias("wstart"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    kept = batch.filter(
        F.col("wstart") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(mx) - F.expr("INTERVAL 30 MINUTES")
    )
    assert _rows(out) == _rows(kept)
    # the stream genuinely withheld the un-finalized tail
    assert kept.count() < batch.count()


# ---------------------------------------------------------------------------
# connected components / percentiles / bm25
# ---------------------------------------------------------------------------


def test_components_oracle_and_structure(spark):
    from fupi_spark.pipeline_queries import dedup_components, dedup_minhash_lsh
    from fupi_spark.queries import ORACLE

    comp = dedup_components(spark, SF)
    compare(comp, ORACLE["dedup_components"], SF)
    rows = comp.collect()
    label = {r.doc_id: r.component_id for r in rows}
    # canonical representative is a member of its own component
    for doc, c in label.items():
        assert label[c] == c
    # every near-dup pair ended up in the same component
    for p in dedup_minhash_lsh(spark, SF).collect():
        assert label[p.doc_a] == label[p.doc_b]
    # sizes consistent
    from collections import Counter

    sizes = Counter(label.values())
    for r in rows:
        assert r.component_size == sizes[r.component_id]


def test_percentiles_rank_contract(spark):
    from fupi_spark.corpus_ops import value_percentiles

    per = {r.event_type: r for r in value_percentiles(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        r = per[et]
        assert r.n == n
        assert r.p50 == vals[(n + 1) // 2 - 1]
        assert r.p95 == vals[(19 * n + 19) // 20 - 1]
        assert r.p99 == vals[(99 * n + 99) // 100 - 1]
        assert r.p50 <= r.p95 <= r.p99


def test_bm25_scores_track_term_presence(spark):
    from fupi_spark.corpus_ops import _BM25_TERMS, bm25_topk

    top = bm25_topk(spark, SF).collect()
    assert len(top) == 20
    assert all(top[i].score >= top[i + 1].score for i in range(19))
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    # every positively-scored hit actually contains a query term
    for r in top:
        if r.score > 0:
            assert any(t in docs[r.doc_id].split() for t in _BM25_TERMS)
