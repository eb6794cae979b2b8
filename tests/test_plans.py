"""Physical-plan audits (.explain discipline): filters reach the
parquet scan, projections prune columns, small joins broadcast, top-k
avoids global sorts, and maintenance jobs contain no surprise shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from fupi_spark import queries as Q


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = Q.QUERIES["ingest_scan_filter"](spark, sf_dir)
    s = formatted(df)
    assert "PushedFilters:" in s
    # the numeric predicate must be pushed into the parquet reader
    assert "GreaterThan(n_chars,100)" in s, s


def test_projection_pruning_reaches_scan(spark, sf_dir):
    df = Q.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    s = formatted(df)
    assert "ReadSchema" in s
    read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_flagship_join_is_broadcast(spark, sf_dir):
    df = Q.QUERIES["flagship_search"](spark, sf_dir)
    assert "BroadcastHashJoin" in plan_of(df)


def test_pricing_summary_has_partial_aggregation(spark, sf_dir):
    df = Q.QUERIES["tpch_pricing_summary"](spark, sf_dir)
    p = plan_of(df)
    # partial (map-side) + final agg around one exchange
    assert p.count("HashAggregate") >= 2, p


def test_compact_plan_has_no_shuffle(spark, tmp_table_dir):
    """The compaction rewrite must be shuffle-free: one task per bin,
    sequential read → sequential write."""
    from fupi_spark import meta
    from fupi_spark.compact import ffd_pack
    from fupi_spark.synth import synth_clips

    t = meta.create_table(spark, tmp_table_dir)
    meta.append(t, synth_clips(spark, 120, dur_range_ms=(50, 80)), job_id="seed", parts=12)
    entries = t.manifest_entries().to_pylist()
    bins = ffd_pack(entries, 1 << 30)
    # mirror compact's rewrite: one scan + broadcast file→bin map — the
    # payload must cross NO shuffle (broadcast of the tiny map is the
    # only exchange) and the plan is O(1) in bin count
    bin_map = [
        (f"{t.root}/{e['file_path']}", b.bin_id) for b in bins for e in b.files
    ]
    map_df = spark.createDataFrame(bin_map, "_abs string, _bin int")
    df = (
        spark.read.parquet(*[p_ for p_, _ in bin_map])
        .withColumn(
            "_abs", F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
        )
        .join(F.broadcast(map_df), "_abs")
        .drop("_abs")
    )
    p = plan_of(df)
    assert "Exchange hashpartitioning" not in p, p
    assert "SinglePartition" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_merge_prune_join_is_metadata_only(spark, tmp_table_dir):
    """MERGE file pruning joins the manifest (file entries), not data."""
    from fupi_spark import meta
    from fupi_spark.merge import plan_touched_files
    from fupi_spark.synth import synth_clips

    t = meta.create_table(spark, tmp_table_dir)
    meta.append(t, synth_clips(spark, 200, dur_range_ms=(50, 80)), job_id="seed", parts=10)
    src = t.scan().select("clip_id").limit(5)
    touched = plan_touched_files(t, src, t.current_snapshot())
    assert 0 < len(touched) <= 10
    # every touched entry is a manifest row (stats present), no payload
    assert all("min_clip_id" in e and "bytes" not in e for e in touched)


def test_dense_ids_no_single_reducer(spark, sf_dir):
    """Sequence-id assignment must not compile to Exchange
    SinglePartition (the round-1 global-window plan)."""
    for name in ("ids_rownumber", "segment_explode"):
        p = plan_of(Q.QUERIES[name](spark, sf_dir))
        assert "SinglePartition" not in p, f"{name} funnels through one reducer"


def test_segment_explode_single_generate(spark, sf_dir):
    """r6: keys_join=False — the split+posexplode is evaluated exactly
    once, upstream of the dense_ids checkpoint (the keys-only path
    re-evaluated it for a join-back and ran an extra uniqueness job).
    The final plan therefore reads the checkpointed rows and contains
    NO join and at most the checkpoint's own Generate."""
    p = plan_of(Q.QUERIES["segment_explode"](spark, sf_dir))
    assert "Join" not in p, p
    assert p.count("Generate") <= 1, p


def test_dedup_exact_is_partial_agg_not_window(spark, sf_dir):
    """r6: keep-first == min(doc_id) per fingerprint — a map-side
    combinable groupBy, not a row_number window (which shuffled and
    sorted every (doc_id, fingerprint, text) row)."""
    p = plan_of(Q.QUERIES["dedup_exact"](spark, sf_dir))
    assert "Window" not in p, p
    assert p.count("HashAggregate") >= 2, p


def test_dense_ids_matches_global_window(spark, sf_dir):
    """dense_ids == ROW_NUMBER() OVER (ORDER BY ...) row for row."""
    from pyspark.sql.window import Window as W

    from fupi_spark.ids import dense_ids

    docs = Q.load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    got = {
        r.doc_id: r.text_id
        for r in dense_ids(docs, order, "text_id").collect()
    }
    w = W.orderBy(*order)
    want = {
        r.doc_id: r.text_id
        for r in docs.select(
            "doc_id", F.row_number().over(w).cast("long").alias("text_id")
        ).collect()
    }
    assert got == want


def test_join_orders_customer_preaggregates_fact_side(spark, sf_dir):
    """r6: the fact side is aggregated BELOW the broadcast join (the
    join and shuffle carry per-custkey partials, not raw order rows)."""
    p = plan_of(Q.QUERIES["join_orders_customer"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert p.index("BroadcastHashJoin") < p.index("HashAggregate"), p
