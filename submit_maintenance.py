"""spark-submit entry point for the maintenance engine.

The north rule ships jobs via ``spark-submit --py-files`` to
multi-executor clusters. Package and run:

    zip -r fupi_spark.zip fupi_spark
    spark-submit --master <cluster> --py-files fupi_spark.zip \
        submit_maintenance.py --table s3://bucket/clips --op pipeline

Ops:
    pipeline  synth(--clips) → append small files → compact → cluster →
              merge 1% upsert → verify → expire   (the bench workload)
    compact | cluster | cluster-incremental | merge-demo | expire |
    verify | delete --where <pred> | set-tag/delete-tag --tag <name> |
    delete-mor --keys k1,k2,... | consolidate-deletes |
    wap-append --clips N | bloom-refresh | changelog --from-snapshot N |
    trim-silence | advise
              individual maintenance jobs against an existing table;
              --job-id makes retries of a committed job no-ops

The script takes its SparkSession from spark-submit (master/conf come
from the submit command; fupi_spark.session only fills in local
defaults when none was provided). Exit code 0 = job committed and the
post-op scan validated.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True, help="table root path")
    p.add_argument(
        "--op",
        default="pipeline",
        choices=[
            "pipeline", "compact", "cluster", "cluster-incremental",
            "merge-demo", "expire", "verify", "delete", "set-tag",
            "delete-tag", "delete-mor", "consolidate-deletes", "wap-append",
            "bloom-refresh", "changelog", "trim-silence", "advise",
        ],
    )
    p.add_argument("--clips", type=int, default=2000)
    p.add_argument("--target-mb", type=int, default=128)
    p.add_argument(
        "--curve", default="zorder", choices=["zorder", "hilbert", "linear"]
    )
    p.add_argument("--retain-last", type=int, default=2)
    p.add_argument("--where", help="SQL predicate for --op delete")
    p.add_argument("--tag", help="tag name for --op set-tag / delete-tag")
    p.add_argument("--job-id", help="idempotent job id (retries become no-ops)")
    p.add_argument("--keys", help="comma-separated key values for --op delete-mor")
    p.add_argument(
        "--key-column", default="clip_id", help="key column for --op delete-mor"
    )
    p.add_argument(
        "--from-snapshot", type=int, help="base snapshot for --op changelog"
    )
    p.add_argument(
        "--consolidate-after",
        type=int,
        help="delete-mor: fold delete files when more than N are outstanding",
    )
    args = p.parse_args()

    from pyspark.sql import functions as F

    from fupi_spark import meta
    from fupi_spark.audio import verify_clips
    from fupi_spark.cluster import cluster, cluster_incremental
    from fupi_spark.compact import compact
    from fupi_spark.expire import expire_snapshots
    from fupi_spark.merge import merge_into
    from fupi_spark.session import get_spark
    from fupi_spark.synth import synth_clips

    spark = get_spark("fupi_spark_maintenance")
    target = args.target_mb << 20
    report: dict = {"op": args.op, "table": args.table}

    if args.op == "pipeline":
        t = meta.create_table(spark, args.table)
        meta.append(
            t,
            synth_clips(spark, args.clips, dur_range_ms=(100, 500), parts=max(8, args.clips // 200)),
            job_id="seed",
        )
        compact(t, target_bytes=target)
        cluster(t, curve=args.curve, target_bytes=target)
        upd = (
            t.scan()
            .limit(max(args.clips // 100, 5))
            .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
            .cache()
        )
        upd.count()
        merge_into(t, upd)
        bad = verify_clips(t.scan()).filter(~F.col("pcm_ok")).count()
        expire_snapshots(t, retain_last=args.retain_last)
        n = t.scan().count()
        report.update({"rows": n, "bad_snr": bad, "snapshots": t.snapshot_ids()})
        ok = n == args.clips and bad == 0
    else:
        t = meta.load_table(spark, args.table)
        if args.op == "compact":
            snap = compact(t, target_bytes=target, job_id=args.job_id)
            report["snapshot"] = snap.snapshot_id if snap else None
        elif args.op == "cluster":
            report["snapshot"] = cluster(
                t, curve=args.curve, target_bytes=target, job_id=args.job_id
            ).snapshot_id
        elif args.op == "cluster-incremental":
            snap = cluster_incremental(
                t, curve=args.curve, target_bytes=target, job_id=args.job_id
            )
            report["snapshot"] = snap.snapshot_id
            report["mode"] = snap.summary.get("mode", "full")
        elif args.op == "merge-demo":
            upd = (
                t.scan()
                .limit(10)
                .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
                .cache()
            )
            upd.count()
            report["snapshot"] = merge_into(t, upd, job_id=args.job_id).snapshot_id
        elif args.op == "delete":
            assert args.where, "--op delete requires --where"
            from fupi_spark.merge import delete_where

            snap = delete_where(t, args.where, job_id=args.job_id)
            report["snapshot"] = snap.snapshot_id
            report["deleted_rows"] = snap.summary.get("deleted_rows")
        elif args.op == "set-tag":
            assert args.tag, "--op set-tag requires --tag"
            t.set_tag(args.tag)
            report["tags"] = t.tags()
        elif args.op == "delete-tag":
            assert args.tag, "--op delete-tag requires --tag"
            t.delete_tag(args.tag)
            report["tags"] = t.tags()
        elif args.op == "delete-mor":
            assert args.keys, "--op delete-mor requires --keys"
            from fupi_spark.merge import delete_keys_mor

            kdf = spark.createDataFrame(
                [(k,) for k in args.keys.split(",")], f"{args.key_column} string"
            )
            snap = delete_keys_mor(
                t,
                kdf,
                job_id=args.job_id,
                key=args.key_column,
                consolidate_after=args.consolidate_after,
            )
            report["snapshot"] = snap.snapshot_id
            report["deleted_keys"] = snap.summary.get("deleted_keys")
            report["outstanding_delete_files"] = len(t.delete_entries())
        elif args.op == "consolidate-deletes":
            from fupi_spark.merge import consolidate_deletes

            snap = consolidate_deletes(t, job_id=args.job_id)
            report["snapshot"] = snap.snapshot_id if snap else None
            report["outstanding_delete_files"] = len(t.delete_entries())
        elif args.op == "wap-append":
            from fupi_spark.wap import (
                PUBLISHED_TAG,
                audited_append,
                publish_init,
                snr_audit,
            )

            if PUBLISHED_TAG not in t.tags():
                publish_init(t)
            batch = synth_clips(spark, args.clips, dur_range_ms=(100, 500))
            r = audited_append(t, batch, snr_audit(), job_id=args.job_id)
            report["wap"] = r
        elif args.op == "bloom-refresh":
            from fupi_spark.bloom import refresh_bloom_index

            report["bloom"] = refresh_bloom_index(t, args.key_column)
        elif args.op == "changelog":
            assert args.from_snapshot, "--op changelog requires --from-snapshot"
            from fupi_spark.cdc import CHANGE_TYPE_COL, changelog_scan

            log = changelog_scan(t, args.from_snapshot)
            counts = {
                r[CHANGE_TYPE_COL]: r["n"]
                for r in log.groupBy(CHANGE_TYPE_COL)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            report["changelog"] = {
                "inserts": counts.get("insert", 0),
                "deletes": counts.get("delete", 0),
            }
        elif args.op == "advise":
            from fupi_spark.advisor import advise

            report["recommendations"] = advise(
                t, target_bytes=target, bloom_col=args.key_column
            )
        elif args.op == "trim-silence":
            from fupi_spark.audio import trim_silence
            from fupi_spark.transform import transform_payloads

            snap = transform_payloads(
                t,
                lambda df: trim_silence(df),
                job_id=args.job_id,
                operation="trim",
            )
            report["snapshot"] = snap.snapshot_id
            report["output_files"] = snap.summary.get("output_files")
        elif args.op == "expire":
            report["report"] = expire_snapshots(t, retain_last=args.retain_last)
        elif args.op == "verify":
            report["bad_snr"] = verify_clips(t.scan()).filter(~F.col("pcm_ok")).count()
        ok = t.scan().count() >= 0

    print(json.dumps(report, default=str))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
