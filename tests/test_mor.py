"""Merge-on-read equality deletes (delete files + sequence numbers):
visibility, re-insert semantics, and the interplay with every rewrite
op (compaction applicability grouping, cluster materialization,
incremental cluster, MERGE, GC)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fupi_spark import meta
from fupi_spark.merge import delete_keys_mor
from fupi_spark.synth import synth_clips

from .test_meta_compact import make_table


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "clip_id string")


def test_mor_delete_reinsert_and_gc(spark, tmp_path):
    """Deleted keys disappear with NO data file rewritten; re-inserting
    a deleted key (higher sequence) is visible while old copies stay
    dead; the delete file is GC-protected while referenced."""
    from fupi_spark.expire import expire_snapshots

    t = make_table(spark, str(tmp_path / "t"), n=200, parts=4)
    data_before = set(e["file_path"] for e in t.data_entries())
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    victims = ids[:30]

    snap = delete_keys_mor(t, _keys_df(spark, victims), job_id="dm")
    assert snap.operation == "delete-mor"
    assert snap.summary["deleted_keys"] == 30
    # zero write amplification: every data file untouched
    assert set(e["file_path"] for e in t.data_entries()) == data_before
    assert t.scan().count() == 170
    assert t.scan().filter(F.col("clip_id").isin(victims)).count() == 0
    # idempotent re-submission
    assert delete_keys_mor(t, _keys_df(spark, victims), job_id="dm").snapshot_id == snap.snapshot_id

    # re-insert 5 victims: new sequence -> visible again
    reins = t.scan(snapshot_id=2).filter(F.col("clip_id").isin(victims[:5]))
    meta.append(t, reins, job_id="re")
    assert t.scan().count() == 175
    assert t.scan().filter(F.col("clip_id").isin(victims[:5])).count() == 5

    # the delete file is reachable -> survives GC
    report = expire_snapshots(t, retain_last=1)
    assert len(t.delete_entries()) == 1
    del_path = t.delete_entries()[0]["file_path"]
    assert os.path.exists(f"{t.root}/{del_path}")
    assert t.scan().count() == 175


def test_mor_compact_applicability_grouping(spark, tmp_path):
    """Compaction never packs files with different delete-applicability
    sets: batch A (pre-delete) and batch B (post-delete, re-inserting
    victim keys) stay in separate bins, so A's victims remain dead and
    B's re-inserts remain alive through the byte-stream rewrite."""
    from fupi_spark.compact import compact

    t = make_table(spark, str(tmp_path / "t"), n=200, parts=4)  # batch A
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    victims = ids[:40]
    delete_keys_mor(t, _keys_df(spark, victims), job_id="dm")
    # batch B re-inserts 10 victims AFTER the delete (higher sequence)
    reins = t.scan(snapshot_id=2).filter(F.col("clip_id").isin(victims[:10]))
    meta.append(t, reins, job_id="re", parts=2)
    before = t.scan().count()
    assert before == 170

    snap = compact(t, target_bytes=1 << 30, job_id="c1")
    assert snap is not None
    # A-files and B-files cannot share a bin -> at least 2 outputs
    assert len(t.data_entries()) >= 2
    assert t.scan().count() == before
    assert t.scan().filter(F.col("clip_id").isin(victims[10:])).count() == 0
    assert t.scan().filter(F.col("clip_id").isin(victims[:10])).count() == 10
    # outputs inherited input sequences (not the compact snapshot's)
    assert all(
        (e.get("sequence") or 0) < snap.snapshot_id for e in t.data_entries()
    )


def test_mor_cluster_materializes_deletes(spark, tmp_path):
    """A full cluster() rewrite reads through the delete filter and
    removes the delete files: post-cluster the table has zero
    outstanding deletes and identical content."""
    import importlib

    C = importlib.import_module("fupi_spark.cluster")

    t = make_table(spark, str(tmp_path / "t"), n=300, parts=6)
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    victims = ids[100:150]
    delete_keys_mor(t, _keys_df(spark, victims), job_id="dm")
    expected = sorted(set(ids) - set(victims))

    snap = C.cluster(t, curve="linear", target_bytes=1 << 18, job_id="cl")
    assert snap.summary["deletes_materialized"] == 1
    assert t.delete_entries() == []
    got = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    assert got == expected


def test_mor_incremental_cluster_and_merge(spark, tmp_path):
    """Incremental cluster rewrites only churn (deletes applied to the
    rewritten files; the delete file stays outstanding for the bulk);
    MERGE's touched-file read also applies deletes."""
    import importlib

    C = importlib.import_module("fupi_spark.cluster")
    from fupi_spark.merge import merge_into

    t = make_table(spark, str(tmp_path / "t"), n=300, parts=6)
    C.cluster(t, curve="linear", target_bytes=1 << 18, job_id="full")
    bulk = set(t.live_files())

    churn = synth_clips(spark, 80, seed=7, dur_range_ms=(50, 100)).withColumn(
        "clip_id", F.concat(F.lit("zz_"), F.col("clip_id"))
    )
    meta.append(t, churn, job_id="churn", parts=2)
    churn_ids = sorted(
        r.clip_id
        for r in t.scan().filter(F.col("clip_id").startswith("zz_")).select("clip_id").collect()
    )
    delete_keys_mor(t, _keys_df(spark, churn_ids[:20]), job_id="dmc")

    snap = C.cluster_incremental(t, curve="linear", target_bytes=1 << 18, job_id="inc")
    assert snap.summary["mode"] == "incremental"
    assert bulk <= set(t.live_files())  # bulk untouched
    assert len(t.delete_entries()) == 1  # still outstanding (for the bulk)
    assert t.scan().count() == 300 + 80 - 20
    assert t.scan().filter(F.col("clip_id").isin(churn_ids[:20])).count() == 0

    # MERGE on surviving churn rows: touched-file reads apply deletes
    upd = (
        t.scan()
        .filter(F.col("clip_id").isin(churn_ids[20:25]))
        .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
        .cache()
    )
    upd.count()
    m = merge_into(t, upd, job_id="m1")
    assert m.summary["matched_rows"] == 5
    assert t.scan().count() == 360
    assert t.scan().filter(F.col("transcript").endswith(" v2")).count() == 5
    assert t.scan().filter(F.col("clip_id").isin(churn_ids[:20])).count() == 0


def test_mor_lifecycle_on_object_store_without_rename(spark, tmp_path, monkeypatch):
    """The whole MOR lifecycle (delete file write → sequence-aware scan
    → cluster materialization) runs on the S3-semantics storage with
    os.rename forbidden — nothing in the path assumes POSIX rename."""
    from fupi_spark.storage import ObjectStoreStorage

    root = str(tmp_path / "obj")
    st = ObjectStoreStorage(root)
    t = meta.create_table(spark, root, storage=st)
    meta.append(t, synth_clips(spark, 120, dur_range_ms=(50, 90), parts=3), job_id="s")
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())

    real_rename = os.rename

    def forbidden(*a, **kw):
        raise AssertionError(f"os.rename called on object-store table: {a}")

    try:
        monkeypatch.setattr(os, "rename", forbidden)
        delete_keys_mor(t, _keys_df(spark, ids[:25]), job_id="dm")
        assert t.scan().count() == 95
        import importlib

        C = importlib.import_module("fupi_spark.cluster")
        C.cluster(t, curve="linear", target_bytes=1 << 18, job_id="cl")
    finally:
        monkeypatch.setattr(os, "rename", real_rename)
    assert t.delete_entries() == []
    assert t.scan().count() == 95
    assert t.scan().filter(F.col("clip_id").isin(ids[:25])).count() == 0


def test_mor_scan_plan_stays_map_side(spark, tmp_path):
    """Delete application must never shuffle the payload: the key set
    and the basename→sequence map both broadcast (two
    BroadcastHashJoins, no SortMergeJoin); the only exchange in the
    plan is the tiny delete-key max-sequence aggregation."""
    t = make_table(spark, str(tmp_path / "t"), n=150, parts=3)
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    delete_keys_mor(t, _keys_df(spark, ids[:20]), job_id="dm")
    plan = t.scan()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_mor_delete_racing_compaction_stays_applied(spark, tmp_path, monkeypatch):
    """A delete-mor that commits BETWEEN compaction's write and its
    commit must still apply to the compacted output: compaction rebases
    (no input overlap) and its outputs inherit the minimum input
    sequence, which is strictly below the concurrent delete's — so the
    deleted keys stay dead in the merged file."""
    from fupi_spark.compact import compact

    t = make_table(spark, str(tmp_path / "t"), n=200, parts=4)
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    victims = ids[:25]
    t2 = meta.load_table(spark, t.root)  # the concurrent writer's handle

    orig_commit = meta.Table.commit
    state = {"injected": False}

    def inject(self, operation, *a, **k):
        if operation == "compact" and not state["injected"]:
            state["injected"] = True
            delete_keys_mor(t2, _keys_df(spark, victims), job_id="race-dm")
        return orig_commit(self, operation, *a, **k)

    monkeypatch.setattr(meta.Table, "commit", inject)
    snap = compact(t, target_bytes=1 << 30, job_id="race-c")
    monkeypatch.setattr(meta.Table, "commit", orig_commit)
    assert state["injected"] and snap is not None

    # the compact rebased over the delete; the delete still applies
    del_seq = t.delete_entries()[0]["sequence"]
    assert all((e.get("sequence") or 0) <= del_seq for e in t.data_entries())
    assert t.scan().count() == 175
    assert t.scan().filter(F.col("clip_id").isin(victims)).count() == 0


def test_mor_scan_plan_one_read_per_delete_group(spark, tmp_path):
    """r5: N outstanding same-key delete files are read in ONE parquet
    scan (r4 built one plan node per file — plan bloat at thousands of
    delete files). Plan shape: exactly 2 parquet scans total (data +
    the grouped delete read)."""
    t = make_table(spark, str(tmp_path / "t"), n=150, parts=3)
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    for i in range(3):
        delete_keys_mor(
            t, _keys_df(spark, ids[i * 10 : (i + 1) * 10]), job_id=f"d{i}"
        )
    assert len(t.delete_entries()) == 3
    plan = t.scan()._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans == 2, f"expected 2 parquet scans (data + deletes), got {n_scans}"
    assert t.scan().count() == 120


def test_consolidation_on_object_store_without_rename(spark, tmp_path, monkeypatch):
    """Delete-file consolidation + GC of the folded files on the
    S3-semantics storage with os.rename forbidden."""
    from fupi_spark.expire import expire_snapshots
    from fupi_spark.merge import consolidate_deletes
    from fupi_spark.storage import ObjectStoreStorage

    root = str(tmp_path / "obj")
    st = ObjectStoreStorage(root)
    t = meta.create_table(spark, root, storage=st)
    meta.append(t, synth_clips(spark, 120, dur_range_ms=(50, 90), parts=3), job_id="s")
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())

    real_rename = os.rename

    def forbidden(*a, **kw):
        raise AssertionError(f"os.rename called on object-store table: {a}")

    try:
        monkeypatch.setattr(os, "rename", forbidden)
        delete_keys_mor(t, _keys_df(spark, ids[:10]), job_id="a")
        delete_keys_mor(t, _keys_df(spark, ids[10:20]), job_id="b")
        old_delete_paths = [e["file_path"] for e in t.delete_entries()]
        consolidate_deletes(t, job_id="c")
        assert len(t.delete_entries()) == 1
        assert t.scan().count() == 100
        expire_snapshots(t, retain_last=1)
    finally:
        monkeypatch.setattr(os, "rename", real_rename)
    # the folded delete files are orphans -> GC'd; the survivor lives
    for p in old_delete_paths:
        assert not os.path.exists(f"{root}/{p}")
    assert os.path.exists(f"{root}/{t.delete_entries()[0]['file_path']}")
    assert t.scan().count() == 100
