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


def test_refresh_after_column_rename(spark, tmp_path):
    """ADVICE r6: the refresh read must replay schema ops — after a
    rename, every pre-rename file stores the PHYSICAL old column name,
    and the raw read used to raise AnalysisException resolving the
    renamed index column."""
    from fupi_spark.evolve import rename_column

    t = make_table(spark, str(tmp_path / "t"), n=60, parts=3)
    rename_column(t, "clip_id", "cid")
    rep = refresh_bloom_index(t, "cid")
    assert rep == {"indexed": 3, "kept": 0, "files": 3}
    k = t.scan().select("cid").orderBy("cid").first().cid
    df, files_read, total = point_lookup(t, "cid", k)
    assert df.count() == 1 and total == 3 and files_read == 1

    # mixed generations: post-rename files physically carry the NEW
    # name; an incremental refresh hashes both generations coherently
    extra = (
        synth_clips(spark, 20, seed=5, dur_range_ms=(50, 80))
        .withColumn("clip_id", F.concat(F.lit("nx_"), F.col("clip_id")))
        .withColumnRenamed("clip_id", "cid")
    )
    meta.append(t, extra, job_id="a2", parts=1)
    rep = refresh_bloom_index(t, "cid")
    assert rep["kept"] == 3 and rep["indexed"] == 1
    nk = extra.select("cid").orderBy("cid").first().cid
    df, files_read, total = point_lookup(t, "cid", nk)
    assert df.count() == 1 and total == 4 and files_read == 1


def test_refresh_with_null_keys_stays_sound(spark, tmp_path):
    """ADVICE r6: NULL keys have no probe positions (their NaN
    positions used to crash the bitset scatter) — they stay unindexed;
    a file whose keys are ALL null simply gets no index row, which
    point_lookup already treats as unprunable (no false negatives)."""
    from fupi_spark.evolve import add_column

    t = make_table(spark, str(tmp_path / "t"), n=40, parts=2)
    add_column(t, "lang", "string")  # no default: old rows read as NULL
    rep = refresh_bloom_index(t, "lang")  # must not raise
    assert rep["files"] == 2

    extra = (
        synth_clips(spark, 20, seed=9, dur_range_ms=(50, 80))
        .withColumn("clip_id", F.concat(F.lit("nx_"), F.col("clip_id")))
        .withColumn("lang", F.lit("bg"))
    )
    meta.append(t, extra, job_id="a2", parts=1)
    refresh_bloom_index(t, "lang")
    df, files_read, total = point_lookup(t, "lang", "bg")
    assert df.count() == 20 and total == 3
    # the all-null files carry no index row and are read unpruned; the
    # indexed file holds every 'bg' row — lookup is complete either way
    assert files_read >= 1
