"""Structured-Streaming incremental ingest: micro-batch appends through
the metadata layer, idempotent re-delivery, resume after new arrivals."""

from __future__ import annotations

from fupi_spark import meta
from fupi_spark.streaming import stream_clips_into_table
from fupi_spark.synth import synth_clips


def test_streaming_incremental_append(spark, tmp_path):
    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "table")

    synth_clips(spark, 100, dur_range_ms=(50, 100), parts=4).write.parquet(src)
    t = meta.create_table(spark, root)
    stream_clips_into_table(spark, src, t, ckpt, max_files_per_trigger=2)

    assert t.scan().count() == 100
    ops = [s["operation"] for s in t.lineage_chain()]
    assert ops[0] == "create"
    assert ops.count("append") >= 2  # several micro-batches

    # second availableNow run with no new files: no new snapshots
    v = t.current_snapshot().snapshot_id
    stream_clips_into_table(spark, src, t, ckpt, max_files_per_trigger=2)
    assert t.current_snapshot().snapshot_id == v

    # new files arrive → stream resumes from checkpoint, appends only new
    synth_clips(spark, 30, seed=77, dur_range_ms=(50, 100), parts=1).write.mode(
        "append"
    ).parquet(src)
    stream_clips_into_table(spark, src, t, ckpt, max_files_per_trigger=2)
    assert t.scan().count() == 130


def test_stateful_quality_monitor(spark, tmp_path):
    """applyInPandasWithState: per-codec running quality totals across
    micro-batches must equal the batch-computed ground truth."""
    from fupi_spark.streaming import stream_quality_monitor

    src = str(tmp_path / "landing2")
    synth_clips(spark, 120, dur_range_ms=(50, 90), parts=6).write.parquet(src)
    stream_quality_monitor(
        spark, src, str(tmp_path / "ckpt2"), query_name="qmon_test"
    )
    # memory sink in update mode: the LAST row per codec is the final state
    rows = spark.sql("SELECT * FROM qmon_test").collect()
    final = {}
    for r in rows:  # updates arrive in batch order; later overwrites earlier
        prev = final.get(r.codec)
        if prev is None or r.n_clips >= prev.n_clips:
            final[r.codec] = r

    truth = (
        synth_clips(spark, 120, dur_range_ms=(50, 90), parts=6)
        .groupBy("codec")
        .count()
        .collect()
    )
    want = {r["codec"]: r["count"] for r in truth}
    assert {c: r.n_clips for c, r in final.items()} == want
    assert all(r.n_bad == 0 for r in final.values())
    assert all(r.min_snr_db >= 30.0 for r in final.values())
