"""The commit protocol must run where the reference's data lives: on
object stores with NO atomic rename and no open-exclusive. These tests
run the maintenance ops against the S3-semantics emulation
(ObjectStoreStorage: promote = copy+delete, commit = conditional PUT)
— with os.rename forbidden outright to prove nothing python-side
depends on POSIX rename."""

from __future__ import annotations

import os

import pytest

from fupi_spark import meta
from fupi_spark.compact import compact
from fupi_spark.expire import expire_snapshots, gc_orphans
from fupi_spark.merge import merge_into
from fupi_spark.storage import LocalStorage, ObjectStoreStorage
from fupi_spark.synth import synth_clips

from .test_meta_compact import clip_multiset


def _obj_table(spark, root, n=200, parts=10):
    t = meta.create_table(spark, root, storage=ObjectStoreStorage(root))
    clips = synth_clips(spark, n, dur_range_ms=(50, 120), parts=parts)
    meta.append(t, clips, job_id="seed", parts=parts)
    return t


def test_put_if_absent_semantics(tmp_path):
    for st in (LocalStorage(str(tmp_path / "a")), ObjectStoreStorage(str(tmp_path / "b"))):
        assert st.put_if_absent("metadata/v1.json", b"first") is True
        assert st.put_if_absent("metadata/v1.json", b"second") is False
        assert st.read("metadata/v1.json") == b"first"  # loser never tears the winner
        st.put("metadata/v1.json", b"third")  # unconditional PUT replaces atomically
        assert st.read("metadata/v1.json") == b"third"


def test_full_maintenance_cycle_without_rename(spark, tmp_table_dir, monkeypatch):
    """append → compact → cluster → merge → expire on the
    no-atomic-rename storage, with os.rename raising if anything
    python-side still depends on it."""
    from pyspark.sql import functions as F

    from fupi_spark.cluster import cluster

    t = _obj_table(spark, tmp_table_dir, n=200, parts=10)
    before = clip_multiset(t.scan())

    real_rename = os.rename

    def forbidden(*a, **kw):
        raise AssertionError(f"os.rename called on object-store table: {a}")

    monkeypatch.setattr(os, "rename", forbidden)
    try:
        compact(t, target_bytes=1 << 30, job_id="c-1")
        cluster(t, curve="zorder", target_bytes=1 << 19, job_id="z-1")
        upd = (
            t.scan()
            .orderBy("clip_id")
            .limit(20)
            .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
            .cache()
        )
        upd.count()
        merge_into(t, upd, job_id="m-1")
        report = expire_snapshots(t, retain_last=1)
    finally:
        monkeypatch.setattr(os, "rename", real_rename)

    assert [s["operation"] for s in t.lineage_chain()] == ["merge"]
    rows = t.scan()
    assert rows.count() == 200
    assert rows.filter(F.col("transcript").like("% v2")).count() == 20
    assert report["deleted_files"]
    # multiset equality modulo the 20 updated transcripts
    after_ids = sorted(r.clip_id for r in rows.select("clip_id").collect())
    assert after_ids == sorted(x[0] for x in before)


def test_commit_race_on_object_store(spark, tmp_table_dir):
    """The conditional-PUT claim arbitrates concurrent committers: the
    loser rebases (disjoint inputs) or conflicts (overlapping inputs)."""
    t = _obj_table(spark, tmp_table_dir, n=60, parts=3)
    base = t.current_snapshot()
    victim = t.live_files()[0]

    # winner removes `victim`
    t.commit("merge", meta._empty_manifest(t.stats_spec), removed_paths={victim})

    # loser planned against the stale base with victim as input
    with pytest.raises(meta.CommitConflict):
        t.commit(
            "compact",
            meta._empty_manifest(t.stats_spec),
            removed_paths={victim},
            base=base,
            input_paths={victim},
        )

    # disjoint-input loser rebases and lands
    other = t.live_files()[0]
    snap = t.commit(
        "compact",
        meta._empty_manifest(t.stats_spec),
        removed_paths={other},
        base=base,
        input_paths={other},
    )
    assert snap.parent_id == base.snapshot_id + 1


def test_gc_on_object_store(spark, tmp_table_dir):
    import shutil

    t = _obj_table(spark, tmp_table_dir, n=80, parts=4)
    stray = f"{t.data_dir}/crashed-00000.parquet"
    shutil.copy(f"{t.root}/{t.live_files()[0]}", stray)
    assert gc_orphans(t) == ["data/crashed-00000.parquet"]
    for p in t.live_files():
        assert os.path.exists(f"{t.root}/{p}")
