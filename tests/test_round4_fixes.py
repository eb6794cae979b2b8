"""Round-4 regression tests (VERDICT.md r3 'Next round' + ADVICE.md):
compaction path-canonicalization / row-conservation, metadata-only
cluster planning, cluster-marker survival across snapshot expiry,
composite MERGE keys, keys-only dense_ids checkpoint, ONNX feed dict,
S3 error classification, evolve rebase race."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fupi_spark import meta
from fupi_spark.synth import synth_clips

from .test_meta_compact import make_table


# ---------------------------------------------------------------------------
# ADVICE (medium): compact must survive a symlinked/aliased table root
# ---------------------------------------------------------------------------


def test_compact_via_symlinked_root_preserves_rows(spark, tmp_path):
    """The file→bin attach keys on _metadata.file_name, not on a
    reconstructed absolute path — under a symlinked table root a
    full-path string join silently drops every row of a candidate file
    while still removing the file at commit (data loss)."""
    from fupi_spark.compact import compact

    real = tmp_path / "real_tbl"
    make_table(spark, str(real), n=300, parts=10)
    link = tmp_path / "link_tbl"
    os.symlink(real, link)

    t2 = meta.load_table(spark, str(link))
    before = t2.scan().count()
    sum_dur = t2.scan().agg(F.sum("dur_ms")).collect()[0][0]
    snap = compact(t2, target_bytes=1 << 30, job_id="c-symlink")
    assert snap is not None
    assert t2.scan().count() == before
    assert t2.scan().agg(F.sum("dur_ms")).collect()[0][0] == sum_dur


def test_compact_conf_restored_on_failure(spark, tmp_path):
    """Session conf mutations (maxPartitionBytes etc.) are restored even
    when the rewrite loop raises mid-flight (ADVICE low #2)."""
    from fupi_spark import compact as C

    t = make_table(spark, str(tmp_path / "t"), n=200, parts=8)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")

    # break the write mid-loop by removing a candidate file from disk
    victim = t.live_files()[0]
    os.remove(f"{t.root}/{victim}")
    with pytest.raises(Exception):
        C.compact(t, target_bytes=1 << 30, job_id="c-fail")
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == old_mpb
    assert spark.conf.get("spark.sql.files.openCostInBytes") == old_oc
