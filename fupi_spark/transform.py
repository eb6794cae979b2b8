"""Payload-transforming full-table rewrite — the maintenance class
that MUTATES row payloads instead of moving them: codec migration,
loudness normalization, silence trimming, PII scrubbing.

compact() moves bytes, cluster() reorders rows, MERGE/DELETE change
membership; none of them can change the bytes INSIDE surviving rows.
``transform_payloads`` closes that gap with the same engine contract
as the other rewrites: read every visible row through the delete-aware
scan, apply an Arrow-batched transformation, rewrite the data files,
and commit one replacing snapshot with per-partition lineage,
idempotent job ids, and the delete-set rebase guard (outputs carry a
fresh sequence, so outstanding MOR deletes are applied and retired —
exactly cluster()'s semantics).

Scale shape: one linear pass — scan → mapInPandas transform →
write — with parallelism equal to the output partition count; no
shuffle unless the caller's transform itself needs one. CRCs are
recomputed inline by write_datafiles (the transform changed the
payload, so the old checksums are void by definition).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame

from .lineage import LineageLog
from .meta import Snapshot, Table


def transform_payloads(
    table: Table,
    transform: Callable[[DataFrame], DataFrame],
    job_id: str | None = None,
    operation: str = "transform",
    parts: int | None = None,
    summary: dict | None = None,
) -> Snapshot:
    """Rewrite every visible row through ``transform`` (a DataFrame →
    DataFrame function that must preserve the table's user-facing
    schema) and commit the result as a replacing snapshot."""
    job_id = job_id or f"{operation}-{uuid.uuid4().hex[:8]}"
    done = table.committed_snapshot_for_job(job_id)
    if done is not None:
        return done

    base = table.current_snapshot()
    entries = table.data_entries(base)
    dels = {e["file_path"] for e in table.delete_entries(base)}
    removed = {e["file_path"] for e in entries} | dels
    bytes_in = sum(e["byte_size"] for e in entries)

    table.mark_job_active(job_id)
    src = table.scan(base.snapshot_id)
    out = transform(src)
    # the docstring contract ("must preserve the table's user-facing
    # schema") was unenforced: a callback that drops, adds, or retypes
    # a column would commit a replacing snapshot with a silently
    # divergent schema (advice r6). Enforce it before any write.
    got = [(f.name, f.dataType.simpleString()) for f in out.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in src.schema.fields]
    if got != want:
        raise ValueError(
            f"transform changed the user-facing schema: expected {want}, got {got}"
        )
    n_parts = parts or max(1, len(entries))
    added = table.write_datafiles(out.repartition(n_parts), job_id)

    log = LineageLog(table, job_id)
    in_paths = sorted(removed)
    for i, e in enumerate(added.to_pylist()):
        log.complete_unit(
            i,
            files_in=in_paths if i == 0 else [],
            files_out=[e["file_path"]],
            bytes_in=bytes_in if i == 0 else 0,
            bytes_out=e["byte_size"],
            rows=e["row_count"],
        )

    return table.commit(
        operation,
        added,
        removed_paths=removed,
        base=base,
        expected_delete_paths=dels,
        summary={
            "job_id": job_id,
            "input_files": len(entries),
            "output_files": added.num_rows,
            **(summary or {}),
        },
    )
