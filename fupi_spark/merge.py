"""MERGE INTO with copy-on-write — the north rule's upsert path.

The reference never updates rows (append-only + overwrite,
/root/reference/fupi/utils.py:42,48); MERGE is the lakehouse operation
that replaces that wholesale-overwrite habit with surgical rewrites:

1. prune   — semi-join the source key set against per-file
             [min_clip_id, max_clip_id] ranges from the manifest
             (a DataFrame join on metadata, not data);
2. join    — full-outer hash-shuffle join of source vs rows of the
             *touched files only*:
               matched        → source row (update) or drop (delete)
               source-only    → insert
               target-only    → carry forward;
3. rewrite — write the join result as new files (copy-on-write:
             untouched files carry into the new snapshot unchanged);
4. commit  — optimistic; conflicts with a concurrent commit that
             removed any touched file raise CommitConflict and the
             caller re-runs against the new snapshot (snapshot
             isolation, tested under concurrent MERGE + compaction).

Scale notes: the join shuffles only touched-file rows + source rows —
with clustering in place, pruning keeps 'touched' proportional to the
source, not the table; AQE's skew-join splitting covers hot clip_id
prefixes. When the source is small, Spark's AQE converts the shuffle
join to broadcast automatically.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import LineageLog
from .meta import Snapshot, Table

MERGE_KEY = "clip_id"


def plan_touched_files(table: Table, source_keys: DataFrame, base: Snapshot) -> list[dict]:
    """File pruning by key-range stats: a file is touched iff some
    source key falls inside its [min, max] key range. Runs as a
    DataFrame semi-join over the manifest."""
    entries = table.manifest_df(base)
    k = source_keys.select(F.col(MERGE_KEY).alias("_k")).distinct()
    touched = entries.join(
        k,
        (F.col("_k") >= F.col(f"min_{MERGE_KEY}")) & (F.col("_k") <= F.col(f"max_{MERGE_KEY}")),
        "left_semi",
    )
    return [r.asDict() for r in touched.collect()]


def merge_into(
    table: Table,
    source: DataFrame,
    job_id: str | None = None,
    when_matched: str = "update",
    target_file_rows: int | None = None,
) -> Snapshot:
    """Upsert (or delete-on-match) ``source`` into the table, CoW-style.

    ``source`` must carry the full clip schema for update/insert rows.
    """
    assert when_matched in ("update", "delete")
    spark = table.spark
    base = table.current_snapshot()
    job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"

    touched = plan_touched_files(table, source, base)
    touched_paths = [e["file_path"] for e in touched]
    data_cols = source.columns

    if touched_paths:
        target = spark.read.parquet(*[f"{table.root}/{p}" for p in touched_paths])
    else:
        target = spark.createDataFrame([], source.schema)

    # full-outer hash-shuffle join on the merge key (BASELINE.json:
    # "MERGE INTO implemented as a hash-shuffle full-outer join")
    s = source.select(
        F.col(MERGE_KEY).alias("_sk"), F.struct(*data_cols).alias("_srow")
    )
    t = target.select(
        F.col(MERGE_KEY).alias("_tk"), F.struct(*data_cols).alias("_trow")
    )
    joined = t.join(s, t["_tk"] == s["_sk"], "full_outer")

    if when_matched == "update":
        # matched → source; source-only → insert; target-only → carry
        picked = joined.select(
            F.when(F.col("_sk").isNotNull(), F.col("_srow"))
            .otherwise(F.col("_trow"))
            .alias("_row")
        )
    else:  # delete on match
        picked = joined.filter(
            F.col("_sk").isNull() | F.col("_tk").isNull()
        ).select(
            F.when(F.col("_sk").isNotNull(), F.col("_srow"))
            .otherwise(F.col("_trow"))
            .alias("_row")
        )
    result = picked.select(*[F.col(f"_row.{c}").alias(c) for c in data_cols])

    # size the rewrite: keep roughly the touched files' granularity
    n_rows_est = sum(e["row_count"] for e in touched) or 1
    rows_per_file = target_file_rows or max(
        1, n_rows_est // max(1, len(touched_paths) or 1)
    )
    n_files = max(1, -(-n_rows_est // rows_per_file))
    # hash repartition, NOT repartitionByRange: range partitioning runs a
    # hidden sampling job that would re-evaluate the full-outer join a
    # second time; merge output needs no global order (per-file stats
    # stay tight via the in-file sort below)
    result = result.repartition(n_files, MERGE_KEY)

    added = table.write_datafiles(result, job_id, sort_within=[MERGE_KEY])

    log = LineageLog(table, job_id)
    for i, e in enumerate(added.to_pylist()):
        log.complete_unit(
            i,
            files_in=touched_paths if i == 0 else [],
            files_out=[e["file_path"]],
            bytes_in=sum(x["byte_size"] for x in touched) if i == 0 else 0,
            bytes_out=e["byte_size"],
            rows=e["row_count"],
        )

    return table.commit(
        "merge",
        added,
        removed_paths=set(touched_paths),
        base=base,
        summary={
            "job_id": job_id,
            "when_matched": when_matched,
            "touched_files": len(touched_paths),
        },
    )
