"""Maintenance advisor: each trigger fires on the state it measures
and clears after the recommended op runs."""

from __future__ import annotations

from fupi_spark.advisor import advise
from fupi_spark.bloom import refresh_bloom_index
from fupi_spark.cluster import cluster
from fupi_spark.compact import compact
from fupi_spark.expire import expire_snapshots
from fupi_spark.merge import consolidate_deletes, delete_keys_mor

from .test_meta_compact import make_table


def _ops(recs):
    return [r["op"] for r in recs]


def test_advisor_full_cycle(spark, tmp_path):
    t = make_table(spark, str(tmp_path / "t"), n=200, parts=10)
    ids = sorted(r.clip_id for r in t.scan().select("clip_id").collect())
    delete_keys_mor(t, spark.createDataFrame([(k,) for k in ids[:3]], "clip_id string"), job_id="d1")
    delete_keys_mor(t, spark.createDataFrame([(k,) for k in ids[3:5]], "clip_id string"), job_id="d2")

    recs = advise(t, bloom_col="clip_id", max_snapshots=30)
    ops = _ops(recs)
    # unclustered 10-file append: small files, full range overlap, two
    # delete files, no bloom rows
    assert "compact" in ops
    assert "cluster" in ops
    assert "consolidate-deletes" in ops
    assert "bloom-refresh" in ops
    assert "expire" not in ops
    for r in recs:
        assert r["reason"]

    consolidate_deletes(t, job_id="cd")
    compact(t, target_bytes=1 << 30, job_id="c1")
    cluster(t, curve="linear", target_bytes=1 << 18, job_id="z1")
    refresh_bloom_index(t, "clip_id")
    recs2 = advise(t, target_bytes=1 << 18, bloom_col="clip_id", max_snapshots=30)
    assert _ops(recs2) == []  # every trigger cleared

    # snapshot-log trigger
    recs3 = advise(t, target_bytes=1 << 18, bloom_col="clip_id", max_snapshots=3)
    assert _ops(recs3) == ["expire"]
    expire_snapshots(t, retain_last=1)
    # expiry only shrinks the log: the live cluster outputs (and their
    # bloom rows) survive, so no other trigger re-fires
    assert _ops(advise(t, target_bytes=1 << 18, bloom_col="clip_id", max_snapshots=3)) == []


def test_advisor_overlap_sweep_matches_bruteforce(spark, tmp_path):
    """The O(m log m) overlap count equals the brute-force pair scan on
    the real manifest."""
    t = make_table(spark, str(tmp_path / "t"), n=120, parts=6)
    entries = t.data_entries()
    lo_k, hi_k = "min_clip_id", "max_clip_id"
    ranges = [(e[lo_k], e[hi_k]) for e in entries]
    m = len(ranges)
    brute = sum(
        1
        for i in range(m)
        for j in range(m)
        if i != j
        and ranges[i][0] <= ranges[j][1]
        and ranges[j][0] <= ranges[i][1]
    )
    recs = advise(t, max_overlap_ratio=0.0)
    clus = [r for r in recs if r["op"] == "cluster"]
    if brute:
        assert clus and abs(clus[0]["overlap_ratio"] - brute / (m * (m - 1))) < 1e-9
    else:
        assert not clus
