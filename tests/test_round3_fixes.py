"""Regression tests for the round-3 ADVICE.md fixes:

1. abandoned-job reclamation: a crashed job's lineage marker ages out
   (``abandoned_after_s``) and its promoted files become collectable —
   no manual lineage rmtree needed (the round-2 leak);
2. ``_row_chunks`` respects its payload budget (off-by-one let a chunk
   overshoot by one full clip);
3. MERGE broadcast decision is byte-gated, not just row-gated — an
   over-budget payload falls through to the shuffle join and still
   produces the right table;
4. manifest temps are staged under ``_staging`` and crash leftovers are
   swept by the age-gated '.tmp-*' sweep.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fupi_spark.audio import _row_chunks
from fupi_spark.expire import expire_snapshots, gc_orphans
from fupi_spark.merge import merge_into

from .test_meta_compact import clip_multiset, make_table


def _backdate(path: str, seconds: float) -> None:
    t = time.time() - seconds
    os.utime(path, (t, t))


def test_abandoned_job_ages_out_and_is_reclaimed(spark, tmp_table_dir):
    """A job that registered lineage, promoted a file, then crashed:
    protected while fresh, reclaimed (files + lineage + staging) once
    its newest lineage mtime exceeds abandoned_after_s."""
    t = make_table(spark, tmp_table_dir, n=40, parts=2)
    t.mark_job_active("crashed")
    os.makedirs(f"{t.root}/_staging/crashed", exist_ok=True)
    with open(f"{t.root}/_staging/crashed/part-0.parquet", "wb") as f:
        f.write(b"x")
    promoted = f"{t.data_dir}/crashed-00000.parquet"
    shutil.copy(f"{t.root}/{t.live_files()[0]}", promoted)

    # fresh marker → still treated as in flight, nothing reclaimed
    assert gc_orphans(t, abandoned_after_s=3600) == []
    assert os.path.exists(promoted)

    # marker ages past the threshold → job is dead: file collected,
    # lineage and staging pruned, all through the public API
    for rel in t.storage.list("_lineage/crashed"):
        _backdate(f"{t.root}/{rel}", 7200)
    report = expire_snapshots(
        t, retain_last=len(t.snapshot_ids()), abandoned_after_s=3600
    )
    assert report["abandoned_jobs"] == ["crashed"]
    assert "data/crashed-00000.parquet" in report["deleted_files"]
    assert not os.path.exists(promoted)
    assert not os.path.isdir(f"{t.root}/_lineage/crashed")
    assert not os.path.isdir(f"{t.root}/_staging/crashed")


def test_abandoned_gate_spares_recently_checkpointing_jobs(spark, tmp_table_dir):
    """A job whose *newest* checkpoint is fresh stays protected even if
    its oldest marker is ancient (live jobs refresh mtimes per unit)."""
    t = make_table(spark, tmp_table_dir, n=40, parts=2)
    t.mark_job_active("alive")
    t.storage.put("_lineage/alive/unit-000000.json", b"{}")
    _backdate(f"{t.root}/_lineage/alive/.job", 7200)  # old marker
    promoted = f"{t.data_dir}/alive-00000.parquet"
    shutil.copy(f"{t.root}/{t.live_files()[0]}", promoted)
    assert gc_orphans(t, abandoned_after_s=3600) == []
    assert os.path.exists(promoted)


def test_row_chunks_respect_payload_budget():
    """Summed payload per chunk stays ≤ budget unless a chunk is a
    single oversized row (the documented bound)."""
    rng = np.random.default_rng(7)
    sizes = rng.integers(10, 100, size=200).tolist() + [5000]
    pdf = pd.DataFrame({"bytes": [b"x" * s for s in sizes]})
    budget = 250
    seen = 0
    for chunk in _row_chunks(pdf, budget):
        total = sum(len(b) for b in chunk["bytes"])
        assert total <= budget or len(chunk) == 1
        seen += len(chunk)
    assert seen == len(pdf)


def test_merge_over_byte_budget_falls_back_to_shuffle(spark, tmp_table_dir):
    """broadcast_max_bytes below the source payload → explicit broadcast
    skipped; the merge must still produce the exact upsert result."""
    t = make_table(spark, tmp_table_dir, n=60, parts=3)
    upd = (
        t.scan()
        .orderBy("clip_id")
        .limit(8)
        .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" vB")))
    ).cache()
    upd.count()
    snap = merge_into(t, upd, job_id="m-bytegate", broadcast_max_bytes=1)
    assert snap.summary["matched_rows"] == 8
    got = t.scan()
    assert got.count() == 60
    assert got.filter(F.col("transcript").like("% vB")).count() == 8
    # payload untouched by the upsert: byte multiset identical pre/post
    pre = sorted(
        (r.clip_id, bytes(r.bytes)) for r in t.scan(snap.parent_id).collect()
    )
    post = sorted((r.clip_id, bytes(r.bytes)) for r in got.collect())
    assert pre == post


def test_merge_multi_clause_cascade(spark, tmp_table_dir):
    """Ordered WHEN MATCHED clauses: first matching clause wins —
    short-duration matches are deleted, long ones updated, mids carried;
    verified against a row-by-row pandas model."""
    t = make_table(spark, tmp_table_dir, n=80, parts=4)
    before = {
        r.clip_id: (r.dur_ms, r.transcript)
        for r in t.scan().select("clip_id", "dur_ms", "transcript").collect()
    }
    src = (
        t.scan()
        .orderBy("clip_id")
        .limit(20)
        .withColumn("transcript", F.lit("UPDATED"))
    ).cache()
    src.count()
    src_ids = {r.clip_id for r in src.select("clip_id").collect()}
    merge_into(
        t,
        src,
        job_id="m-multi",
        matched_clauses=[
            ("dur_ms < 80", "delete"),
            ("dur_ms >= 120", "update"),
        ],
        when_not_matched="ignore",
    )
    got = {
        r.clip_id: r.transcript
        for r in t.scan().select("clip_id", "transcript").collect()
    }
    for cid, (dur, tr) in before.items():
        if cid in src_ids and dur < 80:
            assert cid not in got  # deleted by clause 1
        elif cid in src_ids and dur >= 120:
            assert got[cid] == "UPDATED"  # clause 2
        else:
            assert got[cid] == tr  # carried (mid-range or unmatched)


def test_merge_conditional_insert(spark, tmp_table_dir):
    """WHEN NOT MATCHED AND <cond> THEN INSERT: only source rows
    passing the condition are inserted; the rest are dropped."""
    from fupi_spark.synth import synth_clips

    t = make_table(spark, tmp_table_dir, n=50, parts=2)
    ins = synth_clips(spark, 30, seed=5, dur_range_ms=(50, 150)).withColumn(
        "clip_id", F.concat(F.lit("new_"), F.col("clip_id"))
    ).cache()
    ins.count()
    want = ins.filter(F.col("dur_ms") % 2 == 0).count()
    assert 0 < want < 30
    merge_into(
        t, ins, job_id="m-condins", not_matched_condition="dur_ms % 2 = 0"
    )
    got = t.scan()
    assert got.count() == 50 + want
    assert got.filter(F.col("clip_id").like("new_%")).count() == want
    assert (
        got.filter(F.col("clip_id").like("new_%") & (F.col("dur_ms") % 2 != 0)).count()
        == 0
    )


def test_dense_ids_broadcast_offsets_path(spark, monkeypatch):
    """Beyond MAP_LITERAL_MAX partitions the offset map becomes a
    broadcast join: identical ids to the literal-map path, and the plan
    shows a BroadcastHashJoin instead of a plan-embedded literal map."""
    from fupi_spark import ids as ids_mod

    df = spark.range(0, 500, 1, 8).selectExpr("id as k", "id % 7 as v")
    lit_ids = {
        r.k: r.rid
        for r in ids_mod.dense_ids(df, ["k"], "rid", num_parts=6).collect()
    }
    monkeypatch.setattr(ids_mod, "MAP_LITERAL_MAX", 0)
    bc = ids_mod.dense_ids(df, ["k"], "rid", num_parts=6)
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" not in plan
    bc_ids = {r.k: r.rid for r in bc.collect()}
    assert bc_ids == lit_ids
    assert sorted(bc_ids.values()) == list(range(1, 501))


def test_manifest_tmp_leftovers_swept_by_age_gate(spark, tmp_table_dir):
    """A crash between manifest write and promote leaves a '.tmp-*' file
    under _staging/.manifest-tmp; the age-gated sweep reclaims it, but
    never a fresh one (a concurrent writer mid-publish)."""
    t = make_table(spark, tmp_table_dir, n=40, parts=2)
    tmp_dir = f"{t.root}/_staging/.manifest-tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    fresh = f"{tmp_dir}/.tmp-fresh.parquet"
    stale = f"{tmp_dir}/.tmp-stale.parquet"
    for p in (fresh, stale):
        with open(p, "wb") as f:
            f.write(b"x")
    _backdate(stale, 7200)

    report = expire_snapshots(t, retain_last=len(t.snapshot_ids()))
    assert "_staging/.manifest-tmp/.tmp-stale.parquet" in report["swept_tmp"]
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
