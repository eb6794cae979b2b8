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
