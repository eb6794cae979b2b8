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
