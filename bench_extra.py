"""Round-6 optimization harness (guide §1): per-query noop-sink timing,
plan capture, and maintenance-stage decomposition.

This file is NOT the driver contract — bench.py stays frozen. Numbers
from here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py headline [reps]     # per-query timings + plans
  python bench_extra.py maint               # maintenance stage decomposition
  python bench_extra.py plans <outdir>      # explain("formatted") for all headline queries
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO_DIR, os.environ.get("PYTHONPATH", "")) if p
)

SCRATCH = "/dev/shm/fupi_spark_bench_x" if os.path.isdir("/dev/shm") else "/tmp/fupi_spark_bench_x"

HEADLINE = [
    "flagship_search",
    "ann_topk_dot",
    "dedup_exact",
    "centroid_by_label",
    "segment_explode",
    "tpch_pricing_summary",
    "join_orders_customer",
    "events_running_window",
]


def build_spark():
    from bench import build_spark as bs

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return bs(cores)


def warmup(spark):
    from bench import warmup as w

    w(spark)


def headline(reps: int = 3):
    """Each query: timed exactly like bench.py (build df + count), reps
    times in one session, plus one noop-sink run (full materialization)."""
    from fupi_spark import queries as Q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark()
    warmup(spark)
    out: dict[str, dict] = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"headline:{name}")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = Q.QUERIES[name](spark, sf_dir)
            df.count()
            times.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        df = Q.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        noop = round(time.perf_counter() - t0, 3)
        out[name] = {"count_times": times, "noop": noop}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"headline_detail": out}))


def plans(outdir: str, suffix: str = "before"):
    from fupi_spark import queries as Q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark()
    os.makedirs(outdir, exist_ok=True)
    for name in HEADLINE:
        df = Q.QUERIES[name](spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(p)
        print(f"wrote {name}_{suffix}.txt")


def maint():
    """Maintenance pipeline with finer-grained decomposition: isolates
    synth compute (noop), synth+crc (noop), write-only, and each stage."""
    from pyspark.sql import functions as F

    from fupi_spark import meta
    from fupi_spark.cluster import cluster
    from fupi_spark.compact import compact
    from fupi_spark.expire import expire_snapshots
    from fupi_spark.integrity import verify_table, with_crc
    from fupi_spark.merge import merge_into
    from fupi_spark.synth import synth_clips

    n_clips = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "20000"))
    workdir = f"{SCRATCH}/table"
    shutil.rmtree(workdir, ignore_errors=True)
    spark = build_spark()
    warmup(spark)
    t: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(f"maint:{name}")
        t0 = time.perf_counter()
        r = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        print(json.dumps({name: t[name]}), flush=True)
        return r

    clips = synth_clips(spark, n_clips, dur_range_ms=(100, 500), parts=256)

    # decomposition: synth alone, synth+crc, synth+crc+parquet-write
    timed("synth_noop", lambda: clips.write.format("noop").mode("overwrite").save())
    timed("synth_noop2", lambda: clips.write.format("noop").mode("overwrite").save())
    timed(
        "synth_crc_noop",
        lambda: with_crc(clips).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "synth_crc_write",
        lambda: with_crc(clips)
        .write.mode("overwrite")
        .parquet(f"{SCRATCH}/raw_write"),
    )

    tb = meta.create_table(spark, workdir)
    timed("ingest_append", lambda: meta.append(tb, clips, job_id="seed"))
    table_bytes = sum(e["byte_size"] for e in tb.manifest_entries().to_pylist())
    timed(
        "compact",
        lambda: compact(tb, target_bytes=max(table_bytes // 64, 4 << 20)),
    )
    timed(
        "cluster_zorder",
        lambda: cluster(tb, curve="zorder", target_bytes=max(table_bytes // 64, 4 << 20)),
    )

    def do_merge():
        upd = (
            tb.scan()
            .limit(max(n_clips // 100, 10))
            .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
        )
        upd = upd.cache()
        upd.count()
        merge_into(tb, upd, job_id="bench-merge")

    timed("merge_upsert", do_merge)
    timed("verify_snr", lambda: verify_table(tb, sample_mod=20).filter(
        ~F.col("pcm_ok") | ~F.col("crc_ok")
    ).count())
    timed("expire_gc", lambda: expire_snapshots(tb, retain_last=2))
    print(json.dumps({"maint_detail": t, "table_gb": round(table_bytes / 1e9, 3)}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if cmd == "headline":
        headline(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif cmd == "plans":
        plans(sys.argv[2] if len(sys.argv) > 2 else "plans/r06",
              sys.argv[3] if len(sys.argv) > 3 else "before")
    elif cmd == "maint":
        maint()
    else:
        raise SystemExit(f"unknown command {cmd}")
