"""Write-Audit-Publish (WAP) on a linear snapshot log.

The lakehouse ingestion-quality pattern (Iceberg ships it via branch
writes + cherry-pick; Netflix popularized the name): new data must
pass an audit BEFORE any consumer can read it. This engine's snapshot
log is linear, so WAP is expressed with the two primitives the
metadata layer already has:

- consumers read through the ``published`` TAG (``scan(tag=...)``),
  never the head — the tag is the publish pointer;
- ``audited_append`` appends (the candidate snapshot exists at the
  head but is unpublished), runs the audit against exactly the
  candidate rows (incremental scan — the audit cost is O(batch), not
  O(table)), then either advances the tag (publish) or rolls the head
  back (history-preserving rollback; the rejected files become
  orphans for GC).

Crash safety: every step is one of the engine's existing atomic
commits or tag PUTs. A crash between append and publish leaves the
tag on the last published snapshot — consumers never see unaudited
rows; re-running the job re-appends and re-audits.

The reference has no audit gate (it trusts its ingest end-to-end);
this is north-rule operational surface for a 10^12-row table where a
bad batch must never reach readers.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from . import meta

#: the default publish pointer
PUBLISHED_TAG = "published"


def publish_init(table: meta.Table, tag: str = PUBLISHED_TAG) -> int:
    """Point the publish tag at the current head (bootstrap)."""
    sid = table.current_snapshot().snapshot_id
    table.set_tag(tag, sid)
    return sid


def published_scan(table: meta.Table, tag: str = PUBLISHED_TAG) -> DataFrame:
    """What consumers read: the table at the publish pointer."""
    return table.scan(tag=tag)


def audited_append(
    table: meta.Table,
    df: DataFrame,
    audit_fn,
    job_id: str | None = None,
    tag: str = PUBLISHED_TAG,
    parts: int | None = None,
) -> dict:
    """Append ``df`` as a candidate snapshot, audit ONLY the new rows,
    publish on success / roll back on failure.

    ``audit_fn(new_rows_df) -> None`` raises (any exception) to reject
    the batch. Returns a report dict: {snapshot_id, published,
    audit_error, rows_in_batch}.
    """
    job_id = job_id or f"wap-{uuid.uuid4().hex[:8]}"
    base = table.current_snapshot()
    snap = meta.append(table, df, job_id=job_id, parts=parts)
    new_rows = table.incremental_scan(base.snapshot_id, snap.snapshot_id)
    try:
        audit_fn(new_rows)
    except Exception as e:  # noqa: BLE001 — ANY audit failure rejects
        meta.rollback(table, base.snapshot_id)
        return {
            "snapshot_id": snap.snapshot_id,
            "published": False,
            "audit_error": str(e),
            "rows_in_batch": None,
        }
    table.set_tag(tag, snap.snapshot_id)
    return {
        "snapshot_id": snap.snapshot_id,
        "published": True,
        "audit_error": None,
        "rows_in_batch": new_rows.count(),
    }


def snr_audit(min_snr_db: float = 30.0):
    """The standard audio audit: every clip in the batch must decode
    with SNR >= the gate (the north rule's per-row invariant) — a
    vectorized decode over ONLY the candidate rows."""
    from pyspark.sql import functions as F

    from .audio import verify_clips

    def audit(new_rows: DataFrame) -> None:
        bad = (
            verify_clips(new_rows)
            .filter(~F.col("pcm_ok") | (F.col("snr_db") < min_snr_db))
            .count()
        )
        if bad:
            raise ValueError(f"audit failed: {bad} clips below {min_snr_db} dB SNR")

    return audit
