"""Bloom-filter file index: no-false-negative invariant, pruning
power on unclustered tables, incremental refresh, unindexed-file
fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from fupi_spark import meta
from fupi_spark.bloom import point_lookup, refresh_bloom_index
from fupi_spark.synth import synth_clips

from .test_meta_compact import make_table


def test_lookup_every_key_no_false_negatives(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=120, parts=6)
    rep = refresh_bloom_index(t, "clip_id")
    assert rep == {"indexed": 6, "kept": 0, "files": 6}
    expected = {
        r.clip_id: r.dur_ms for r in t.scan().select("clip_id", "dur_ms").collect()
    }
    reads = []
    for k, dur in list(expected.items())[:25]:
        df, files_read, total = point_lookup(t, "clip_id", k)
        rows = df.collect()
        assert len(rows) == 1 and rows[0].dur_ms == dur
        assert total == 6
        reads.append(files_read)
    # unclustered append: min/max stats can't prune, the bloom must —
    # nearly every lookup should touch exactly one file
    assert sum(reads) <= len(reads) + 2


def test_absent_key_reads_nothing(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=80, parts=4)
    refresh_bloom_index(t, "clip_id")
    df, files_read, total = point_lookup(t, "clip_id", "no_such_key")
    assert df.count() == 0
    assert files_read <= 1  # deterministic false positives only
    assert total == 4


def test_incremental_refresh_and_unindexed_fallback(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=60, parts=3)
    refresh_bloom_index(t, "clip_id")
    extra = synth_clips(spark, 20, seed=3, dur_range_ms=(50, 80)).withColumn(
        "clip_id", F.concat(F.lit("nx_"), F.col("clip_id"))
    )
    meta.append(t, extra, job_id="a2", parts=2)
    new_key = extra.select("clip_id").orderBy("clip_id").first().clip_id

    # before refresh: the new files carry no index row -> cannot be
    # pruned, lookup still finds the key (no false negatives)
    df, files_read, total = point_lookup(t, "clip_id", new_key)
    assert df.count() == 1 and total == 5
    assert files_read == 2  # the 2 unindexed files; 3 old ones pruned

    rep = refresh_bloom_index(t, "clip_id")
    assert rep == {"indexed": 2, "kept": 3, "files": 5}
    df, files_read, _ = point_lookup(t, "clip_id", new_key)
    assert df.count() == 1 and files_read == 1


def test_index_survives_compaction_refresh(spark, tmp_path):
    from fupi_spark.compact import compact

    t = make_table(spark, str(tmp_path / "t"), n=90, parts=3)
    refresh_bloom_index(t, "clip_id")
    compact(t, target_bytes=1 << 30, job_id="c1")
    rep = refresh_bloom_index(t, "clip_id")
    # compaction replaced all files: old rows dropped, new file indexed
    assert rep["kept"] == 0 and rep["indexed"] == rep["files"]
    k = t.scan().select("clip_id").orderBy("clip_id").first().clip_id
    df, files_read, total = point_lookup(t, "clip_id", k)
    assert df.count() == 1 and files_read == 1
