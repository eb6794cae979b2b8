"""Metadata layer + compaction: the reference's create→add→compact arc
(/root/reference/fupi/embedders.py:119-128) as snapshot lineage
v1(create) → v2(append) → v3(compact), plus FFD invariants and resume."""

from __future__ import annotations

import os

import pytest

from fupi_spark import meta
from fupi_spark.compact import Bin, compact, ffd_pack
from fupi_spark.synth import synth_clips


def make_table(spark, root, n=400, parts=40, **synth_kw):
    t = meta.create_table(spark, root)
    clips = synth_clips(spark, n, dur_range_ms=(50, 150), **synth_kw)
    meta.append(t, clips, job_id="seed", parts=parts)
    return t


def clip_multiset(df):
    return sorted((r.clip_id, r.transcript, bytes(r.bytes)) for r in df.collect())


# -- FFD packer unit/property tests ------------------------------------------


def test_ffd_invariants():
    import random

    rng = random.Random(7)
    entries = [
        {"file_path": f"data/f{i:03d}.parquet", "byte_size": rng.randint(1, 120), "row_count": 1}
        for i in range(200)
    ]
    target = 128
    bins = ffd_pack(entries, target)
    # every candidate in exactly one bin
    packed = [e["file_path"] for b in bins for e in b.files]
    assert sorted(packed) == sorted(e["file_path"] for e in entries)
    # no bin exceeds target (all candidates < target here)
    assert all(b.byte_size <= target for b in bins)
    # deterministic
    bins2 = ffd_pack(list(reversed(entries)), target)
    assert [(b.bin_id, [f["file_path"] for f in b.files]) for b in bins] == [
        (b.bin_id, [f["file_path"] for f in b.files]) for b in bins2
    ]


def test_ffd_oversized_files_left_alone():
    entries = [
        {"file_path": "data/big.parquet", "byte_size": 1000, "row_count": 1},
        {"file_path": "data/s1.parquet", "byte_size": 10, "row_count": 1},
        {"file_path": "data/s2.parquet", "byte_size": 10, "row_count": 1},
    ]
    bins = ffd_pack(entries, target_bytes=100)
    assert all("big" not in e["file_path"] for b in bins for e in b.files)


def test_ffd_hypothesis_property():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=0, max_size=60),
        target=st.integers(min_value=10, max_value=600),
    )
    def prop(sizes, target):
        entries = [
            {"file_path": f"data/f{i:03d}", "byte_size": s, "row_count": 1}
            for i, s in enumerate(sizes)
        ]
        bins = ffd_pack(entries, target)
        packed = sorted(e["file_path"] for b in bins for e in b.files)
        assert packed == sorted(e["file_path"] for e in entries if e["byte_size"] < target)
        for b in bins:
            assert b.byte_size <= target or len(b.files) == 1

    prop()


# -- snapshot lineage + compaction ------------------------------------------


def test_create_append_compact_lineage(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n=300, parts=30)
    before = clip_multiset(t.scan())
    n_files_before = len(t.live_files())
    assert n_files_before == 30

    snap = compact(t, target_bytes=1 << 30)  # everything into as few bins as possible
    assert snap is not None
    after = clip_multiset(t.scan())
    assert after == before  # row-multiset preservation (FIXTURES.md §4.3)
    assert len(t.live_files()) < n_files_before

    ops = [s["operation"] for s in t.lineage_chain()]
    assert ops == ["create", "append", "compact"]
    parents = [s["parent_id"] for s in t.lineage_chain()]
    assert parents == [None, 1, 2]

    # time travel still sees the pre-compact state
    assert clip_multiset(t.scan(snapshot_id=2)) == before


def test_compact_respects_target_size(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n=400, parts=40)
    entries = t.manifest_entries().to_pylist()
    sizes = [e["byte_size"] for e in entries]
    target = int(sum(sizes) / 4)
    compact(t, target_bytes=target)
    new_entries = t.manifest_entries().to_pylist()
    tol = max(s for s in sizes)  # parquet re-encoding can shift sizes a bit
    assert all(e["byte_size"] <= target + tol for e in new_entries)
    assert len(new_entries) < len(entries)


def test_compact_noop_when_already_packed(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n=100, parts=2)
    compact(t, target_bytes=1 << 30)
    v = t.current_snapshot().snapshot_id
    # second run: every candidate already in a single-file bin → no-op
    assert compact(t, target_bytes=1) is None
    assert t.current_snapshot().snapshot_id == v


def test_compact_resume_skips_completed_bins(spark, tmp_table_dir, monkeypatch):
    t = make_table(spark, tmp_table_dir, n=300, parts=30)
    before = clip_multiset(t.scan())
    entries = t.manifest_entries().to_pylist()
    target = int(sum(e["byte_size"] for e in entries) / 3)

    # run 1: crash after unit checkpointing, before commit
    from fupi_spark.lineage import LineageLog

    real_commit = meta.Table.commit

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(meta.Table, "commit", boom)
    with pytest.raises(RuntimeError):
        compact(t, target_bytes=target, job_id="job-x")
    monkeypatch.setattr(meta.Table, "commit", real_commit)

    # table unchanged (manifest-driven visibility)
    assert clip_multiset(t.scan()) == before
    lineage_dir = f"{t.root}/_lineage/job-x"
    n_units = len(os.listdir(lineage_dir))
    assert n_units > 0

    # run 2 (resume): must not rewrite any completed unit
    calls = {"n": 0}
    orig_write = LineageLog.complete_unit

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig_write(self, *a, **kw)

    monkeypatch.setattr(LineageLog, "complete_unit", counting)
    snap = compact(t, target_bytes=target, job_id="job-x")
    assert snap is not None
    assert calls["n"] == 0  # all units were already checkpointed
    assert clip_multiset(t.scan()) == before
    assert [s["operation"] for s in t.lineage_chain()][-1] == "compact"


def test_stats_recomputed_after_compact(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n=200, parts=20)
    compact(t, target_bytes=1 << 30)
    rows = t.scan().collect()
    for e in t.manifest_entries().to_pylist():
        in_file = [r for r in rows]  # stats are per file; check global bounds hold
        assert e["min_clip_id"] >= min(r.clip_id for r in in_file)
        assert e["max_clip_id"] <= max(r.clip_id for r in in_file)
        assert e["row_count"] > 0 and e["byte_size"] > 0
    total = sum(e["row_count"] for e in t.manifest_entries().to_pylist())
    assert total == 200


def test_scan_pruned_skips_files_after_clustering(spark, tmp_table_dir):
    """Stats-based file skipping: clustering tightens per-file clip_id
    ranges, so a narrow range scan reads a small fraction of files and
    returns exactly the right rows."""
    from fupi_spark.cluster import cluster

    t = make_table(spark, tmp_table_dir, n=600, parts=12)
    all_ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    lo, hi = all_ids[50], all_ids[99]
    expected = {c for c in all_ids if lo <= c <= hi}

    # random layout: nearly every file intersects the range
    _, read_before, total_before = t.scan_pruned("clip_id", lo, hi)

    cluster(t, curve="zorder", target_bytes=1 << 18)
    df, read_after, total_after = t.scan_pruned("clip_id", lo, hi)
    got = {r.clip_id for r in df.select("clip_id").collect()}
    assert got == expected  # correctness regardless of skipping
    assert read_before == total_before  # random layout: no skipping possible
    assert read_after < total_after  # clustered layout: files skipped


def test_group_aware_compaction_preserves_ranges(spark, tmp_table_dir):
    """group_fn compaction: bins never mix groups, per-file stat ranges
    stay within their group, and content survives."""
    from fupi_spark.synth import synth_clips

    t = meta.create_table(spark, tmp_table_dir)
    # two disjoint sr_hz groups, several small files each
    a = synth_clips(spark, 120, dur_range_ms=(50, 80)).withColumn(
        "sr_hz", F_lit_int(8000)
    )
    b = synth_clips(spark, 120, seed=9, dur_range_ms=(50, 80)).withColumn(
        "sr_hz", F_lit_int(48000)
    )
    meta.append(t, a, job_id="a", parts=6)
    meta.append(t, b, job_id="b", parts=6)
    before = clip_multiset(t.scan())
    assert len(t.live_files()) == 12

    snap = compact(
        t, target_bytes=1 << 30, job_id="c-grp", group_fn=lambda e: e["min_sr_hz"]
    )
    assert snap is not None
    entries = t.manifest_entries().to_pylist()
    assert len(entries) == 2  # one bin per group, never merged across
    for e in entries:
        assert e["min_sr_hz"] == e["max_sr_hz"]  # ranges stay group-pure
    assert clip_multiset(t.scan()) == before


def F_lit_int(v):
    from pyspark.sql import functions as F

    return F.lit(v).cast("int")


def test_incremental_scan_append_only(spark, tmp_table_dir):
    from fupi_spark.synth import synth_clips

    t = meta.create_table(spark, tmp_table_dir)
    meta.append(t, synth_clips(spark, 100, seed=1, dur_range_ms=(50, 70)), job_id="b1", parts=2)
    base = t.current_snapshot().snapshot_id
    meta.append(t, synth_clips(spark, 60, seed=2, dur_range_ms=(50, 70)), job_id="b2", parts=2)
    inc = t.incremental_scan(base)
    assert inc.count() == 60
    # exactly the second batch
    got = {r.clip_id for r in inc.select("clip_id").collect()}
    want = {r.clip_id for r in synth_clips(spark, 60, seed=2, dur_range_ms=(50, 70)).select("clip_id").collect()}
    assert got == want
    # empty window
    head = t.current_snapshot().snapshot_id
    assert t.incremental_scan(head).count() == 0
    # a replacing snapshot in the range is refused
    compact(t, target_bytes=1 << 30, job_id="c-x")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="re-baseline"):
        t.incremental_scan(base)
