"""Degenerate-hot-key clustering: auto-salt on quantile collapse.

SURVEY §4 promises salted skew handling; round-2 shipped it opt-in and
untested (VERDICT r2 "What's missing" #3). These tests drive a table
where 90% of rows share ONE curve key (identical clip_id prefix, sr,
dur, codec — range splitting cannot divide them) and assert that
clustering detects the collapse, salts automatically, bounds the output
file sizes, and preserves content; and that unskewed tables never salt.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from fupi_spark import meta
from fupi_spark.audio import encode_clip
from fupi_spark.cluster import cluster
from fupi_spark.schema import CLIPS_SCHEMA

from .test_meta_compact import make_table


def _degenerate_clips(spark, n_hot=900, n_cold=100):
    rows = []
    for i in range(n_hot):
        # identical curve key: same 8-char clip_id prefix ("clip_hot"),
        # same sr/dur/codec → same _zval for every hot row
        cid = f"clip_hot_{i:05d}"
        rows.append((cid, encode_clip(cid, 8000, 50, "pcm_s16le"), 8000, 50,
                     "pcm_s16le", f"hot {i}"))
    for i in range(n_cold):
        cid = f"clip_{i % 16:x}_{i:05d}"
        sr = [8000, 16000, 44100][i % 3]
        dur = 50 + (i % 7) * 10
        rows.append((cid, encode_clip(cid, sr, dur, "pcm_s16le"), sr, dur,
                     "pcm_s16le", f"cold {i}"))
    pdf = pd.DataFrame(rows, columns=[f.name for f in CLIPS_SCHEMA.fields])
    return spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)


def test_auto_salt_bounds_hot_key_partitions(spark, tmp_table_dir):
    t = meta.create_table(spark, tmp_table_dir)
    meta.append(t, _degenerate_clips(spark), job_id="seed", parts=8)
    before = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    table_bytes = sum(e["byte_size"] for e in t.manifest_entries().to_pylist())

    snap = cluster(t, curve="zorder", target_bytes=max(table_bytes // 8, 1))
    assert snap.summary["salt_buckets"] >= 2, "collapse must trigger auto-salt"
    entries = t.manifest_entries().to_pylist()
    # the hot key (900 rows) must be spread: no single file owns it
    assert max(e["row_count"] for e in entries) <= 900 // 2
    # content preserved exactly
    after = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    assert after == before
    # every file is still internally consistent for pruning: min ≤ max
    for e in entries:
        assert e["min_clip_id"] <= e["max_clip_id"]


def test_unskewed_table_never_salts(spark, tmp_table_dir):
    t = make_table(spark, tmp_table_dir, n=400, parts=8)
    table_bytes = sum(e["byte_size"] for e in t.manifest_entries().to_pylist())
    snap = cluster(t, curve="zorder", target_bytes=max(table_bytes // 8, 1))
    assert snap.summary["salt_buckets"] == 0


def test_forced_salt_zero_disables_auto(spark, tmp_table_dir):
    """salt_buckets=0 forces salting OFF even under a degenerate key
    (operator escape hatch) — the hot key then lands in one bucket."""
    t = meta.create_table(spark, tmp_table_dir)
    meta.append(t, _degenerate_clips(spark, n_hot=300, n_cold=50), job_id="s", parts=4)
    table_bytes = sum(e["byte_size"] for e in t.manifest_entries().to_pylist())
    snap = cluster(
        t, curve="zorder", target_bytes=max(table_bytes // 4, 1), salt_buckets=0
    )
    assert snap.summary["salt_buckets"] == 0
    entries = t.manifest_entries().to_pylist()
    assert max(e["row_count"] for e in entries) >= 300  # hot key undivided
