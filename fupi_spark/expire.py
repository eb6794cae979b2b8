"""Snapshot expiry + orphan-file GC.

Reachability-based, per the north rule: a data file may be deleted only
if NO retained snapshot's manifests reference it. The reachable set is
the union of retained manifests, and the delete list is a LEFT ANTI
join of the physical listing against it (BASELINE.json: "orphan-file GC
via anti-join of live vs. referenced paths") — both sides are
DataFrames, so at 10^12-scale the GC plan is a distributed join over
file *metadata*, never over data.

Expiry also prunes old snapshot JSONs and unreferenced manifest files.
The newest snapshot is always retained (the table must stay readable).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .meta import Table


def expire_snapshots(table: Table, retain_last: int = 2) -> dict:
    """Expire all but the last ``retain_last`` snapshots, then GC data
    files and manifests unreachable from the retained set. Returns a
    report of everything deleted."""
    ids = table.snapshot_ids()
    retained_ids = ids[-max(1, retain_last):]
    expired_ids = [i for i in ids if i not in retained_ids]
    retained = [table.snapshot(i) for i in retained_ids]

    spark = table.spark

    # referenced = union of retained manifests (DataFrame union-distinct)
    manifest_paths = sorted({m for s in retained for m in s.manifests})
    if manifest_paths:
        referenced = (
            spark.read.parquet(*[f"{table.root}/{m}" for m in manifest_paths])
            .select("file_path")
            .distinct()
        )
    else:
        referenced = spark.createDataFrame([], "file_path string")

    # physical listing of data/ as a DataFrame
    listing = spark.createDataFrame(
        [(f"data/{f}",) for f in sorted(os.listdir(table.data_dir))],
        "file_path string",
    )

    # orphan = live listing ANTI JOIN referenced
    orphans = [
        r["file_path"]
        for r in listing.join(referenced, "file_path", "left_anti").collect()
    ]
    for p in orphans:
        os.remove(f"{table.root}/{p}")

    # prune expired snapshot JSONs + manifests referenced only by them
    for i in expired_ids:
        os.remove(table._snap_path(i))
    live_manifests = set(manifest_paths)
    removed_manifests = []
    for f in sorted(os.listdir(table.manifest_dir)):
        rel = f"metadata/manifests/{f}"
        if rel not in live_manifests:
            os.remove(f"{table.root}/{rel}")
            removed_manifests.append(rel)

    # stale lineage checkpoints of committed jobs can go too
    return {
        "expired_snapshots": expired_ids,
        "retained_snapshots": retained_ids,
        "deleted_files": sorted(orphans),
        "deleted_manifests": removed_manifests,
    }


def gc_orphans(table: Table) -> list[str]:
    """GC-only entry point: remove data files unreachable from ANY
    existing snapshot (e.g. output of crashed jobs), keeping every
    snapshot intact."""
    report = expire_snapshots(table, retain_last=len(table.snapshot_ids()))
    return report["deleted_files"]
