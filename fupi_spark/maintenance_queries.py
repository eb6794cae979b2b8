"""Rows-only queries() entries that drive the maintenance engine
end-to-end for the driver's correctness harness. These have no DuckDB
oracle (the engine's tables live outside the pre-registered views), so
the driver records the weaker rows-only check — pytest carries the
strong equivalence tests (tests/test_meta_compact.py etc.).

Each entry synthesizes its own deterministic clip table under a scratch
dir, runs the op(s), and returns a small, fully deterministic result
DataFrame (counts, ids, lineage) — stable across runs and parallelism.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register

SCRATCH = "/tmp/fupi_spark_mq"


def _fresh(spark: SparkSession, name: str, n: int, parts: int):
    from . import meta
    from .synth import synth_clips

    root = f"{SCRATCH}/{name}"
    shutil.rmtree(root, ignore_errors=True)
    t = meta.create_table(spark, root)
    meta.append(t, synth_clips(spark, n, dur_range_ms=(50, 150), parts=parts), job_id="seed")
    return t


@register("lakehouse_compact_roundtrip")
def lakehouse_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create → append (30 small files) → FFD compact; returns content
    invariants + the snapshot lineage."""
    from .compact import compact

    t = _fresh(spark, "compact", 1200, parts=30)
    files_before = len(t.live_files())
    compact(t, target_bytes=1 << 30, job_id="q-compact")
    ops = ">".join(s["operation"] for s in t.lineage_chain())
    return (
        t.scan()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("clip_id").alias("n_clips"),
            F.sum("dur_ms").alias("sum_dur_ms"),
            F.sum(F.length("bytes")).alias("sum_payload_bytes"),
        )
        .withColumn("files_before", F.lit(files_before))
        .withColumn("files_after", F.lit(len(t.live_files())))
        .withColumn("lineage", F.lit(ops))
    )


@register("lakehouse_cluster_zorder_order")
def lakehouse_cluster_zorder_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order rewrite; returns the first 40 clip_ids in physical scan
    order — deterministic because curve order is total."""
    from .cluster import cluster

    t = _fresh(spark, "cluster", 800, parts=16)
    cluster(t, curve="zorder", target_bytes=1 << 18, job_id="q-cluster")
    ordered = t.scan_in_manifest_order().orderBy("_file_ord").select("clip_id")
    w_rows = ordered.limit(40).collect()
    return spark.createDataFrame(
        [(i, r.clip_id) for i, r in enumerate(w_rows)], "ordinal int, clip_id string"
    )


@register("lakehouse_merge_upsert")
def lakehouse_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CoW): 60 updates + 25 inserts; returns post-merge
    invariants."""
    from .merge import merge_into
    from .synth import synth_clips

    t = _fresh(spark, "merge", 1000, parts=20)
    upd = (
        t.scan()
        .orderBy("clip_id")
        .limit(60)
        .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
    ).cache()
    upd.count()
    ins = synth_clips(spark, 25, seed=9, dur_range_ms=(50, 100)).withColumn(
        "clip_id", F.concat(F.lit("clip_zz_"), F.col("clip_id"))
    )
    merge_into(t, upd.unionByName(ins.select(*upd.columns)), job_id="q-merge")
    return t.scan().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("transcript").like("% v2"), 1).otherwise(0)).alias("n_updated"),
        F.sum(F.when(F.col("clip_id").like("clip_zz_%"), 1).otherwise(0)).alias("n_inserted"),
    )


@register("lakehouse_expire_gc")
def lakehouse_expire_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact → cluster → expire(retain 2) + orphan GC; returns the
    retained lineage and content integrity."""
    import os

    from .cluster import cluster
    from .compact import compact
    from .expire import expire_snapshots

    t = _fresh(spark, "expire", 600, parts=12)
    compact(t, target_bytes=1 << 30, job_id="q-compact")
    cluster(t, curve="hilbert", target_bytes=1 << 19, job_id="q-cluster")
    report = expire_snapshots(t, retain_last=2)
    all_live_exist = all(
        os.path.exists(f"{t.root}/{p}") for p in t.live_files()
    )
    return (
        t.scan()
        .agg(F.count(F.lit(1)).alias("n_rows"), F.countDistinct("clip_id").alias("n_clips"))
        .withColumn("expired", F.lit(len(report["expired_snapshots"])))
        .withColumn("deleted_files", F.lit(len(report["deleted_files"])))
        .withColumn("all_live_exist", F.lit(all_live_exist))
    )


@register("lakehouse_resume_lineage")
def lakehouse_resume_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run compaction twice with the same job id — the second run must
    find every unit checkpointed and rewrite nothing (resume semantics);
    returns per-unit lineage metrics."""
    from .compact import compact
    from .lineage import LineageLog

    t = _fresh(spark, "resume", 900, parts=18)
    compact(t, target_bytes=1 << 20, job_id="q-resume")
    log = LineageLog(t, "q-resume")
    recs = log.records()
    return spark.createDataFrame(
        [
            (r["unit_id"], len(r["files_in"]), len(r["files_out"]), r["rows"], r["committed"])
            for r in recs
        ],
        "unit_id int, files_in int, files_out int, rows long, committed boolean",
    ).orderBy("unit_id")


@register("audio_verify_snr")
def audio_verify_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized PCM decode + SNR gate over every codec branch
    (BASELINE.json correctness invariant: SNR≥30dB, transcript equality)."""
    from .audio import verify_clips
    from .synth import synth_clips

    clips = synth_clips(spark, 200, dur_range_ms=(50, 120), parts=8)
    v = verify_clips(clips)
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pcm_ok"), 1).otherwise(0)).alias("n_ok"),
        F.floor(F.min("snr_db")).alias("min_snr_floor"),
    )


@register("audio_features")
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (rms/peak/zero-cross/tokens) via
    mapInPandas; deterministic aggregate fingerprint."""
    from .audio import extract_features
    from .synth import synth_clips

    clips = synth_clips(spark, 150, dur_range_ms=(50, 120), parts=6)
    f = extract_features(clips)
    return f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_samples").alias("sum_samples"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.floor(F.sum("rms")).alias("sum_rms_floor"),
        F.max("peak").alias("max_peak"),
    )


@register("fupi_ingest_search_e2e")
def fupi_ingest_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference lifecycle: JSONL → ingest (segment, embed,
    centroid, two tables, compact) → dense search → result shape."""
    from . import ingest
    from .search import search

    root = f"{SCRATCH}/fupi_e2e"
    shutil.rmtree(root, ignore_errors=True)
    import os

    os.makedirs(root, exist_ok=True)
    jsonl = f"{root}/docs.jsonl.gz"
    ingest.write_raw_docs_jsonl(jsonl, 80)
    t_text, t_sent = ingest.ingest_corpus(spark, jsonl, f"{root}/wh", num_samples=50)
    res = search(t_text, t_sent, "quick brown fox", k=10)
    return res.select(
        "text_id",
        "sentence_ids",
        F.floor(F.col("distance") * 10000).alias("distance_e4"),
    )
