"""Round-5 verdict/advice fixes:

1. delete-resurrection guard — delete-applying rewrites (cluster,
   merge, delete_where) conflict when a delete-mor lands mid-rewrite
   (ADVICE r4 high / Iceberg RewriteFiles semantics);
2. mixed-key delete files are readable (one anti-join per key set);
3. the delete-key broadcast is byte-gated with an identical-result
   shuffle fallback (VERDICT r4 #2b);
4. consolidate_deletes folds N delete files -> 1 per key set with
   per-key sequences preserved (VERDICT r4 #2a);
5. WAP rejection removes only the candidate's files — a concurrent
   commit during the audit survives (ADVICE r4 low / VERDICT r4 #3);
6. delete_where / merge summaries don't attribute MOR-deleted rows to
   themselves (ADVICE r4 low);
7. dense_ids keys-only path rejects non-unique order keys loudly
   (ADVICE r4 medium);
8. delete_keys_mor bounds its write parts by key count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fupi_spark import meta
from fupi_spark.meta import CommitConflict, Table
from fupi_spark.merge import (
    consolidate_deletes,
    delete_keys_mor,
    delete_where,
    merge_into,
)
from fupi_spark.synth import synth_clips

from .test_meta_compact import make_table


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "clip_id string")


def _ids(t):
    return sorted(r.clip_id for r in t.scan().select("clip_id").collect())


def _scan_multiset(t):
    return sorted(
        (r.clip_id, r.sr_hz, r.dur_ms, r.codec, r.transcript)
        for r in t.scan().drop("bytes").collect()
    )


# -- 1. delete-resurrection guard --------------------------------------------


def test_commit_conflicts_on_concurrent_mor_delete(spark, tmp_path):
    """A rewrite that planned against delete set D must raise
    CommitConflict if the outstanding delete set is no longer D at
    commit time (delete-mor landed mid-rewrite)."""
    t = make_table(spark, str(tmp_path / "t"), n=120, parts=3)
    stale_base = t.current_snapshot()
    stale_dels = {e["file_path"] for e in t.delete_entries(stale_base)}
    delete_keys_mor(t, _keys_df(spark, _ids(t)[:10]), job_id="race")
    with pytest.raises(CommitConflict, match="MOR delete"):
        t.commit(
            "cluster",
            meta._empty_manifest(t.stats_spec),
            base=stale_base,
            expected_delete_paths=stale_dels,
        )


def test_merge_conflicts_when_delete_lands_mid_rewrite(spark, tmp_path, monkeypatch):
    """End-to-end: a delete-mor sneaking in between MERGE's read and its
    commit must make the MERGE raise, not resurrect the deleted keys."""
    t = make_table(spark, str(tmp_path / "t"), n=120, parts=3)
    victims = _ids(t)[:10]

    real_write = Table.write_datafiles
    fired = {"n": 0}

    def write_then_delete(self, df, job_id, sort_within=None):
        added = real_write(self, df, job_id, sort_within=sort_within)
        if job_id == "m-race" and fired["n"] == 0:
            fired["n"] = 1  # the racing delete commits before merge does
            delete_keys_mor(t, _keys_df(spark, victims), job_id="sneak")
        return added

    monkeypatch.setattr(Table, "write_datafiles", write_then_delete)
    upd = (
        t.scan()
        .orderBy("clip_id")
        .limit(5)
        .withColumn("transcript", F.concat("transcript", F.lit(" v2")))
        .cache()
    )
    upd.count()
    with pytest.raises(CommitConflict, match="MOR delete"):
        merge_into(t, upd, job_id="m-race")
    monkeypatch.undo()
    # the delete won: its keys stay dead
    assert t.scan().filter(F.col("clip_id").isin(victims)).count() == 0


# -- 2. mixed-key delete files -----------------------------------------------


def test_mixed_key_delete_files_apply_independently(spark, tmp_path):
    """Outstanding deletes on DIFFERENT key columns (clip_id + codec)
    each apply; round 4 raised AnalysisException on the second scan."""
    t = make_table(spark, str(tmp_path / "t"), n=150, parts=3)
    ids = _ids(t)
    codecs = sorted(
        r.codec for r in t.scan().select("codec").distinct().collect()
    )
    n_codec0 = t.scan().filter(F.col("codec") == codecs[0]).count()
    n_id_not_codec0 = (
        t.scan()
        .filter(F.col("clip_id").isin(ids[:20]) & (F.col("codec") != codecs[0]))
        .count()
    )
    delete_keys_mor(t, _keys_df(spark, ids[:20]), job_id="d-id")
    delete_keys_mor(
        t,
        spark.createDataFrame([(codecs[0],)], "codec string"),
        job_id="d-codec",
        key="codec",
    )
    assert t.scan().count() == 150 - n_codec0 - n_id_not_codec0
    assert t.scan().filter(F.col("clip_id").isin(ids[:20])).count() == 0
    assert t.scan().filter(F.col("codec") == codecs[0]).count() == 0


# -- 3. byte-gated broadcast with identical shuffle fallback ------------------


def test_delete_broadcast_gate_and_shuffle_fallback(spark, tmp_path, monkeypatch):
    t = make_table(spark, str(tmp_path / "t"), n=150, parts=3)
    victims = _ids(t)[:25]
    delete_keys_mor(t, _keys_df(spark, victims), job_id="d")
    broadcast_rows = _scan_multiset(t)
    plan_b = t.scan()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    monkeypatch.setattr(Table, "DELETE_BROADCAST_MAX_BYTES", 0)
    shuffle_rows = _scan_multiset(t)
    assert shuffle_rows == broadcast_rows
    monkeypatch.undo()


# -- 4. consolidate_deletes ---------------------------------------------------


def test_consolidate_deletes_preserves_per_key_sequences(spark, tmp_path):
    """Churn: delete b1 -> re-insert some -> delete b2 -> re-delete a
    few re-inserts. Consolidation folds 3 delete files into 1 and the
    scan is bit-identical — in particular the re-inserted-but-not-
    re-deleted keys stay VISIBLE (a single collapsed max sequence would
    kill them)."""
    t = make_table(spark, str(tmp_path / "t"), n=200, parts=4)
    ids = _ids(t)
    b1, b2 = ids[:30], ids[40:70]
    delete_keys_mor(t, _keys_df(spark, b1), job_id="d1")
    reins = t.scan(snapshot_id=2).filter(F.col("clip_id").isin(b1[:10]))
    meta.append(t, reins, job_id="re", parts=2)
    delete_keys_mor(t, _keys_df(spark, b2), job_id="d2")
    redel = b1[:4]  # re-delete 4 of the 10 re-inserted keys
    delete_keys_mor(t, _keys_df(spark, redel), job_id="d3")
    assert len(t.delete_entries()) == 3

    before = _scan_multiset(t)
    snap = consolidate_deletes(t, job_id="consol")
    assert snap is not None and snap.operation == "consolidate-deletes"
    assert len(t.delete_entries()) == 1
    assert t.delete_key_specs()[0]["keyed_seq"] is True
    assert _scan_multiset(t) == before
    # semantics spot-checks: re-inserted-not-re-deleted keys visible...
    assert (
        t.scan().filter(F.col("clip_id").isin(b1[4:10])).count() == 6
    )
    # ...re-deleted and never-re-inserted keys dead
    assert t.scan().filter(F.col("clip_id").isin(redel + b1[10:] + b2)).count() == 0
    # idempotent re-submission
    assert consolidate_deletes(t, job_id="consol").snapshot_id == snap.snapshot_id
    # a second fold has nothing to do
    assert consolidate_deletes(t) is None


def test_compact_after_consolidation_keeps_semantics(spark, tmp_path):
    """Data files with DIFFERENT sequences covered by one consolidated
    delete file must not be packed into one bin (min-inheritance would
    over-delete the higher-sequence rows)."""
    from fupi_spark.compact import compact

    t = make_table(spark, str(tmp_path / "t"), n=200, parts=4)
    ids = _ids(t)
    delete_keys_mor(t, _keys_df(spark, ids[:30]), job_id="d1")
    reins = t.scan(snapshot_id=2).filter(F.col("clip_id").isin(ids[:10]))
    meta.append(t, reins, job_id="re", parts=2)  # higher-seq re-inserts
    delete_keys_mor(t, _keys_df(spark, ids[40:60]), job_id="d2")
    consolidate_deletes(t, job_id="consol")
    before = _scan_multiset(t)

    snap = compact(t, target_bytes=1 << 30, job_id="c")
    assert snap is not None
    assert _scan_multiset(t) == before
    # the re-inserted keys survived the byte-stream rewrite
    assert t.scan().filter(F.col("clip_id").isin(ids[:10])).count() == 10


def test_delete_count_trigger_consolidates(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=100, parts=2)
    ids = _ids(t)
    delete_keys_mor(t, _keys_df(spark, ids[:5]), job_id="a")
    delete_keys_mor(t, _keys_df(spark, ids[5:10]), job_id="b")
    delete_keys_mor(
        t, _keys_df(spark, ids[10:15]), job_id="c", consolidate_after=2
    )
    assert len(t.delete_entries()) == 1
    assert t.scan().count() == 85


# -- 5. WAP surgical rejection ------------------------------------------------


def test_wap_reject_preserves_concurrent_commit(spark, tmp_path):
    """An append landing while the audit runs must survive the batch
    rejection (round 4 rolled the whole head back and wiped it)."""
    from fupi_spark.synth import with_clip_prefix
    from fupi_spark.wap import audited_append, publish_init, published_scan

    t = make_table(spark, str(tmp_path / "t"), n=100, parts=2)
    publish_init(t)

    stranger = with_clip_prefix(
        synth_clips(spark, 20, seed=5, dur_range_ms=(50, 100)), "s_"
    )

    def failing_audit_with_interleaved_commit(new_rows):
        meta.append(t, stranger, job_id="stranger", parts=1)
        raise ValueError("batch rejected")

    bad = with_clip_prefix(
        synth_clips(spark, 15, seed=6, dur_range_ms=(50, 100)), "b_"
    )
    r = audited_append(
        t, bad, failing_audit_with_interleaved_commit, job_id="wap-b", parts=1
    )
    assert r["published"] is False
    # the stranger's append survived the rejection...
    assert t.scan().filter(F.col("clip_id").like("s_%")).count() == 20
    # ...the rejected batch is gone from the head...
    assert t.scan().filter(F.col("clip_id").like("b_%")).count() == 0
    # ...and consumers (publish tag) still see only the seed batch
    assert published_scan(t).count() == 100


def test_wap_reject_conflicts_when_candidate_was_rewritten(spark, tmp_path):
    """If a concurrent rewrite consumed the candidate's files, surgical
    removal is impossible — the rejection must raise, not silently
    leave rejected rows live."""
    from fupi_spark.compact import compact
    from fupi_spark.synth import with_clip_prefix
    from fupi_spark.wap import audited_append, publish_init

    t = make_table(spark, str(tmp_path / "t"), n=100, parts=4)
    publish_init(t)

    def audit_with_compaction(new_rows):
        compact(t, target_bytes=1 << 30, job_id="sneaky-compact")
        raise ValueError("batch rejected")

    bad = with_clip_prefix(
        synth_clips(spark, 15, seed=6, dur_range_ms=(50, 100)), "b_"
    )
    with pytest.raises(CommitConflict, match="WAP reject"):
        audited_append(t, bad, audit_with_compaction, job_id="wap-b", parts=1)


# -- 6. MOR-aware summary counts ---------------------------------------------


def test_delete_where_count_excludes_mor_rows(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=200, parts=4)
    ids = _ids(t)
    mor_victims = ids[:20]
    delete_keys_mor(t, _keys_df(spark, mor_victims), job_id="dm")
    # predicate victims among the still-visible rows only
    cond_victims = (
        t.scan().filter(F.expr("dur_ms % 7 = 0")).count()
    )
    snap = delete_where(t, "dur_ms % 7 = 0", job_id="dw")
    assert snap.summary["deleted_rows"] == cond_victims


def test_merge_summary_excludes_mor_rows(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=150, parts=3)
    ids = _ids(t)
    delete_keys_mor(t, _keys_df(spark, ids[:20]), job_id="dm")
    upd = (
        t.scan()
        .orderBy("clip_id")
        .limit(10)
        .withColumn("transcript", F.concat("transcript", F.lit(" v2")))
        .cache()
    )
    upd.count()
    snap = merge_into(t, upd, job_id="m")
    assert snap.summary["matched_rows"] == 10
    assert snap.summary["inserted_rows"] == 0


# -- 7. dense_ids uniqueness guard -------------------------------------------


def test_dense_ids_rejects_duplicate_keys_on_keys_only_path(spark):
    from fupi_spark.ids import dense_ids

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, payload int"
    )
    with pytest.raises(ValueError, match="not unique"):
        dense_ids(df, ["k"], "id")
    # unique keys still work
    out = dense_ids(df.filter("payload != 2"), ["k"], "id")
    assert sorted((r.k, r.id) for r in out.collect()) == [("a", 1), ("b", 2)]


# -- 8. delete-file write parts bounded by key count -------------------------


def test_delete_keys_mor_bounds_parts(spark, tmp_path, monkeypatch):
    import fupi_spark.merge as M

    t = make_table(spark, str(tmp_path / "t"), n=100, parts=2)
    monkeypatch.setattr(M, "KEYS_PER_DELETE_FILE", 10)
    delete_keys_mor(t, _keys_df(spark, _ids(t)[:25]), job_id="big")
    dels = t.delete_entries()
    assert len(dels) == 3  # ceil(25/10)
    assert sum(e["row_count"] for e in dels) == 25
    assert t.scan().count() == 75


# -- 9. footer-derived manifest stats (VERDICT r4 #6) -------------------------


def test_footer_stats_match_spark_agg(spark, tmp_path):
    """The footer path and the Spark-agg fallback must produce
    identical manifest entries (stats exactness is what scan_pruned
    and MERGE pruning rely on); the distributed footer path (forced
    via FOOTER_DRIVER_MAX=0) must agree too."""
    from fupi_spark.synth import synth_clips

    t1 = meta.create_table(spark, str(tmp_path / "t1"))
    t2 = meta.create_table(spark, str(tmp_path / "t2"))
    t3 = meta.create_table(spark, str(tmp_path / "t3"))
    clips = synth_clips(spark, 150, dur_range_ms=(50, 150), parts=5)

    meta.append(t1, clips, job_id="seed")  # footer path (default)

    orig = Table.footer_file_stats
    try:
        Table.footer_file_stats = lambda self, paths: None  # force fallback
        meta.append(t2, clips, job_id="seed")
    finally:
        Table.footer_file_stats = orig
    try:
        Table.FOOTER_DRIVER_MAX = 0  # force the distributed footer path
        meta.append(t3, clips, job_id="seed")
    finally:
        Table.FOOTER_DRIVER_MAX = 4096

    def canon(t):
        return sorted(
            tuple(
                e[k]
                for k in sorted(e)
                if k not in ("file_path",)  # names differ by nonce
            )
            for e in t.manifest_entries().to_pylist()
        )

    assert canon(t1) == canon(t2) == canon(t3)
    # and the stats actually work: pruned scan agrees with full scan
    lo = sorted(r.clip_id for r in t1.scan().select("clip_id").collect())[10]
    df, _read, _tot = t1.scan_pruned("clip_id", lo, "zzzz")
    assert df.count() == t1.scan().filter(F.col("clip_id") >= lo).count()


def test_reconsolidation_after_more_churn(spark, tmp_path):
    """Fold → more deletes land → fold again: the second consolidation
    must merge the keyed file with the new plain files, still one
    outstanding file, semantics intact."""
    t = make_table(spark, str(tmp_path / "t"), n=150, parts=3)
    ids = _ids(t)
    delete_keys_mor(t, _keys_df(spark, ids[:10]), job_id="a")
    delete_keys_mor(t, _keys_df(spark, ids[10:20]), job_id="b")
    consolidate_deletes(t, job_id="c1")
    # churn continues: re-insert two victims, then delete more keys
    reins = t.scan(snapshot_id=2).filter(F.col("clip_id").isin(ids[:2]))
    meta.append(t, reins, job_id="re", parts=1)
    delete_keys_mor(t, _keys_df(spark, ids[20:30]), job_id="d")
    before = _scan_multiset(t)
    assert len(t.delete_entries()) == 2
    consolidate_deletes(t, job_id="c2")
    assert len(t.delete_entries()) == 1
    assert _scan_multiset(t) == before
    assert t.scan().filter(F.col("clip_id").isin(ids[:2])).count() == 2
    assert t.scan().filter(F.col("clip_id").isin(ids[2:30])).count() == 0


def test_ivf_cell_is_partition_prunable(spark, tmp_path):
    """The IVF scale claim (pipeline_queries.ann_ivf_kmeans docstring):
    'cell is a partition column, the probe is partition pruning'.
    Prove it on the engine's own table format: commit vectors with a
    cell stats column, cluster so files are cell-pure, and scan_pruned
    on the probe cell must read a strict subset of files."""
    import numpy as np
    import pyarrow as pa

    from fupi_spark.kmeans import assign_cells, kmeans_fit

    rng = np.random.default_rng(5)
    centers = rng.normal(scale=4.0, size=(4, 16))
    rows = [
        (i, (centers[i % 4] + rng.normal(size=16)).tolist()) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, "embedding", "vec_id", 4, iters=2)
    celled = assign_cells(df, "embedding", cents).withColumn(
        "cell", F.col("cell").cast("long")
    )

    t = meta.create_table(
        spark,
        str(tmp_path / "ivf"),
        stats_spec=[("cell", pa.int64()), ("vec_id", pa.int64())],
    )
    # hash-partition BY CELL before the append: each cell's rows land in
    # one task → one file, so per-file [min_cell, max_cell] is tight
    meta.append(
        t,
        celled.repartition(8, "cell"),
        job_id="seed",
        sort_within=["cell", "vec_id"],
    )
    probe_df, files_read, files_total = t.scan_pruned("cell", 2, 2)
    assert files_total >= 2
    assert files_read < files_total, "cell probe must skip files"
    assert probe_df.count() == celled.filter("cell = 2").count()


def test_incremental_scan_crosses_metadata_only_delete_ops(spark, tmp_path):
    """delete-mor / consolidate-deletes never move rows between data
    files, so the incremental append scan stays valid across them —
    emitting appended rows AS VISIBLE at `to` (a row appended then
    MOR-deleted inside the range is not emitted). Replacing ops still
    raise."""
    from fupi_spark.compact import compact

    t = make_table(spark, str(tmp_path / "t"), n=100, parts=2)
    base = t.current_snapshot().snapshot_id
    ids = _ids(t)
    batch = synth_clips(spark, 30, seed=8, dur_range_ms=(50, 100))
    from fupi_spark.synth import with_clip_prefix

    batch = with_clip_prefix(batch, "n_")
    meta.append(t, batch, job_id="b", parts=1)
    new_ids = sorted(
        r.clip_id for r in t.scan().filter(F.col("clip_id").like("n_%")).select("clip_id").collect()
    )
    # MOR-delete 5 old keys + 3 of the NEW batch inside the range
    delete_keys_mor(t, _keys_df(spark, ids[:5] + new_ids[:3]), job_id="dm")
    consolidate_deletes(t, job_id="c")  # no-op (1 file) or fold — either way metadata-only
    delete_keys_mor(t, _keys_df(spark, new_ids[3:5]), job_id="dm2")
    consolidate_deletes(t, job_id="c2")

    inc = t.incremental_scan(base)
    got = sorted(r.clip_id for r in inc.select("clip_id").collect())
    assert got == new_ids[5:]  # appended minus the range's deletes
    # a replacing op still invalidates the changelog
    compact(t, target_bytes=1 << 30, job_id="cp")
    with pytest.raises(ValueError, match="compact"):
        t.incremental_scan(base)


def test_consolidation_racing_new_delete_keeps_it_outstanding(
    spark, tmp_path, monkeypatch
):
    """A delete-mor landing while consolidation runs must survive the
    fold: consolidation removes only the files it consumed, and the
    stranger delete still applies afterwards."""
    t = make_table(spark, str(tmp_path / "t"), n=120, parts=3)
    ids = _ids(t)
    delete_keys_mor(t, _keys_df(spark, ids[:10]), job_id="a")
    delete_keys_mor(t, _keys_df(spark, ids[10:20]), job_id="b")

    real_write = Table.write_datafiles
    fired = {"n": 0}

    def write_then_sneak(self, df, job_id, sort_within=None):
        added = real_write(self, df, job_id, sort_within=sort_within)
        if job_id == "consol-race" and fired["n"] == 0:
            fired["n"] = 1
            delete_keys_mor(t, _keys_df(spark, ids[20:25]), job_id="sneak")
        return added

    monkeypatch.setattr(Table, "write_datafiles", write_then_sneak)
    snap = consolidate_deletes(t, job_id="consol-race")
    monkeypatch.undo()
    assert snap is not None
    # the consolidated file AND the stranger's delete file are live
    assert len(t.delete_entries()) == 2
    assert t.scan().count() == 120 - 25
    assert t.scan().filter(F.col("clip_id").isin(ids[:25])).count() == 0


def test_wap_audit_scope_excludes_commit_during_write(spark, tmp_path, monkeypatch):
    """A commit landing WHILE the candidate's files are being written
    (the append rebases onto it) must stay out of the audit scope and
    survive the rejection — the candidate diffs against its actual
    parent, not the pre-append head (r5 review fix)."""
    from fupi_spark.synth import with_clip_prefix
    from fupi_spark.wap import audited_append, publish_init, published_scan

    t = make_table(spark, str(tmp_path / "t"), n=80, parts=2)
    publish_init(t)
    stranger = with_clip_prefix(
        synth_clips(spark, 20, seed=5, dur_range_ms=(50, 100)), "s_"
    )

    real_write = Table.write_datafiles
    fired = {"n": 0}

    def write_then_stranger(self, df, job_id, sort_within=None):
        added = real_write(self, df, job_id, sort_within=sort_within)
        if job_id == "wap-b" and fired["n"] == 0:
            fired["n"] = 1  # stranger commits before the candidate does
            meta.append(t, stranger, job_id="stranger", parts=1)
        return added

    monkeypatch.setattr(Table, "write_datafiles", write_then_stranger)
    seen_rows = {}

    def failing_audit(new_rows):
        seen_rows["n"] = new_rows.count()
        seen_rows["strangers"] = new_rows.filter(
            F.col("clip_id").like("s_%")
        ).count()
        raise ValueError("reject")

    bad = with_clip_prefix(
        synth_clips(spark, 15, seed=6, dur_range_ms=(50, 100)), "b_"
    )
    r = audited_append(t, bad, failing_audit, job_id="wap-b", parts=1)
    monkeypatch.undo()
    assert r["published"] is False
    # the audit saw ONLY the candidate's rows...
    assert seen_rows == {"n": 15, "strangers": 0}
    # ...and the stranger's commit survived the rejection
    assert t.scan().filter(F.col("clip_id").like("s_%")).count() == 20
    assert t.scan().filter(F.col("clip_id").like("b_%")).count() == 0
    from fupi_spark.wap import published_scan as _ps

    assert _ps(t).count() == 80


def test_streaming_wap_resumes_unaudited_batch(spark, tmp_path):
    """Crash between a streaming batch's append commit and its audit:
    the redelivery must RESOLVE the batch (re-audit → reject here), not
    skip it — a plain job-id skip would let the next publish expose the
    never-audited rows through the tag (r5 review fix)."""
    import numpy as np

    from fupi_spark.streaming import stream_clips_into_table
    from fupi_spark.synth import with_clip_prefix
    from fupi_spark.wap import publish_init, published_scan, snr_audit

    t = make_table(spark, str(tmp_path / "t"), n=60, parts=2)
    publish_init(t)
    tag_before = t.resolve_tag("published")

    bad_src = with_clip_prefix(
        synth_clips(spark, 15, seed=3, dur_range_ms=(50, 90)), "bb_"
    )

    def corrupt_all(it):
        for pdf in it:
            bufs = []
            for b in pdf["bytes"]:
                arr = bytearray(b)
                body = np.frombuffer(arr, dtype=np.uint8, offset=44).copy()
                arr[44:] = (body ^ 0x55).tobytes()
                bufs.append(bytes(arr))
            pdf = pdf.copy()
            pdf["bytes"] = bufs
            yield pdf

    bad = bad_src.mapInPandas(corrupt_all, schema=bad_src.schema).cache()
    bad.count()
    # simulate the crash: the batch-0 append committed, audit never ran
    meta.append(t, bad, job_id="stream-b00000000", parts=1)
    assert t.scan().filter(F.col("clip_id").like("bb_%")).count() == 15

    # the same rows land in the stream source; a fresh checkpoint
    # redelivers them as batch 0
    src = str(tmp_path / "landing")
    bad.coalesce(1).write.parquet(src)
    stream_clips_into_table(
        spark, src, t, str(tmp_path / "ckpt"), audit_fn=snr_audit()
    )
    # resolved: rejected, files removed, tag never advanced
    assert t.scan().filter(F.col("clip_id").like("bb_%")).count() == 0
    assert t.resolve_tag("published") == tag_before
    assert published_scan(t).count() == 60
    assert any(
        s["summary"].get("wap_rejected_snapshot") is not None
        for s in t.lineage_chain()
    )


class TestPortableHLL:
    """hll_portable_sketch: both estimator branches agree with DuckDB."""

    def test_raw_branch_high_cardinality(self, spark):
        # event_id is unique per row: ~6.8k distinct per event_type at
        # sf0.01 >> 2.5*m = 1280, so the raw harmonic-mean branch runs
        # (the registered entry's user_id cardinality exercises the
        # linear-counting branch; together they cover both paths).
        from fupi_spark.pipeline_queries import hll_oracle_sql, hll_spark
        from fupi_spark.queries import load

        from .oracle_check import compare

        sf = "/root/testdata/sf0.01"
        ev = load(spark, sf, "events")
        df = hll_spark(ev, "event_type", "event_id")
        rows = df.collect()
        assert rows, "no groups"
        exacts = [r.exact_vals for r in rows]
        assert max(exacts) > 2.5 * 512, "cardinality too low for raw branch"
        assert all(r.within_bound for r in rows), rows
        compare(df, hll_oracle_sql("events", "event_type", "event_id"), sf)

    def test_lc_branch_registered_entry(self, spark, sf_dir):
        import __spark_entry__ as entry

        from .oracle_check import compare

        qs, osql = entry.queries(), entry.oracle_sql()
        df = qs["hll_portable_sketch"](spark, sf_dir)
        rows = df.collect()
        assert rows and all(r.within_bound for r in rows), rows
        compare(df, osql["hll_portable_sketch"], sf_dir)


# -- AS-OF-timestamp time travel ---------------------------------------------


def test_scan_as_of_timestamp(spark, tmp_path):
    import time as _t

    from fupi_spark.synth import synth_clips

    t = make_table(spark, str(tmp_path / "t"), n=40, parts=2)
    after_v2 = int(_t.time() * 1000)
    _t.sleep(0.01)
    extra = synth_clips(spark, 10, seed=4, dur_range_ms=(50, 80)).withColumn(
        "clip_id", F.concat(F.lit("y_"), F.col("clip_id"))
    )
    meta.append(t, extra, job_id="a2", parts=1)

    assert t.snapshot_as_of(after_v2) == 2
    assert t.scan(as_of_ms=after_v2).count() == 40
    assert t.scan(as_of_ms=int(_t.time() * 1000)).count() == 50
    import pytest as _pt

    with _pt.raises(ValueError):
        t.snapshot_as_of(0)
