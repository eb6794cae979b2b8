"""Multi-dimensional clustering rewrite: Z-order or Hilbert over
(clip_id, sr_hz, dur_ms, codec), per the north rule — plus ``linear``
(plain Iceberg sort order by clip_id), the layout that trades
multi-dimensional scan locality for sharp MERGE file pruning.

Physical plan (idiomatic Spark, no RDDs):

1. bounds from manifest stats (min/max per dimension aggregated over
   file entries — zero extra data passes) + codec dictionary ranks;
2. curve key via a vectorized numpy pandas UDF (zorder.morton4 /
   zorder.hilbert4);
3. explicit range buckets: approxQuantile over the curve key computed
   from the *pruned* key columns only (parquet column pruning keeps the
   audio payload out of this pass — repartitionByRange would instead
   trigger a hidden sampling job that re-evaluates the full plan,
   payload included, which we measured at ~2x the whole rewrite);
4. bucket id assigned JVM-side (binary-search fold over the boundary
   array), ONE hash shuffle on it, ``sortWithinPartitions(_zval,
   clip_id)``, ``write.partitionBy(_bucket)`` — bucket directories are
   renamed to range-ordered file names, so file-name order IS curve
   order and concatenating files reproduces the global clustering order
   (tested against the pandas oracle). A hash collision that co-locates
   two buckets in one task still emits one file per bucket, each
   internally sorted, so the property survives;
5. manifest rewrite + per-file stats recomputation, snapshot commit
   (operation='cluster'), per-partition lineage.

Skew: quantile boundaries adapt to key density, so hot key regions
(e.g. the synthetic 'hot' clip_id prefix) split across buckets — this
is salting-by-quantile. For degenerate keys (one value dominating),
``salt_buckets`` appends a deterministic pmod(hash(clip_id), S) term to
the bucket id, the classic salting pattern.

Scale notes: two passes total — a key-column-only quantile pass and the
rewrite shuffle. Both distribute across all executors; the boundary
array (n_buckets-1 longs) is the only driver-side state.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import zorder
from .lineage import LineageLog
from .meta import Snapshot, Table
from .compact import promote_partition_dirs

CLUSTER_DIMS = ["clip_id", "sr_hz", "dur_ms", "codec"]


def dimension_bounds(table: Table) -> dict:
    """Global per-dimension bounds + codec rank dictionary, from the
    manifest (file-level min/max) — no scan of the data itself."""
    entries = table.manifest_entries().to_pylist()
    if not entries:
        raise ValueError("cannot cluster an empty table")
    b = {
        "clip_id_lo": int(zorder.string_to_u64([min(e["min_clip_id"] for e in entries)])[0]),
        "clip_id_hi": int(zorder.string_to_u64([max(e["max_clip_id"] for e in entries)])[0]),
        "sr_lo": min(e["min_sr_hz"] for e in entries),
        "sr_hi": max(e["max_sr_hz"] for e in entries),
        "dur_lo": min(e["min_dur_ms"] for e in entries),
        "dur_hi": max(e["max_dur_ms"] for e in entries),
    }
    # codec dictionary: low cardinality by design (manifest min/max only
    # bound the set) — one tiny distinct agg
    codecs = sorted(r["codec"] for r in table.scan().select("codec").distinct().collect())
    b["codec_rank"] = {c: i for i, c in enumerate(codecs)}
    b["codec_hi"] = max(len(codecs) - 1, 1)
    return b


def curve_key_udf(bounds: dict, curve: str = "zorder"):
    """Vectorized pandas UDF (clip_id, sr_hz, dur_ms, codec) → int64
    curve key."""
    rank = bounds["codec_rank"]
    chi = bounds["codec_hi"]

    @F.pandas_udf(T.LongType())
    def key(it: Iterator[tuple[pd.Series, ...]]) -> Iterator[pd.Series]:
        for cid, sr, dur, codec in it:
            d0 = zorder.normalize_to_grid(
                zorder.string_to_u64(cid.to_numpy()),
                bounds["clip_id_lo"],
                bounds["clip_id_hi"],
            )
            d1 = zorder.normalize_to_grid(sr.to_numpy(), bounds["sr_lo"], bounds["sr_hi"])
            d2 = zorder.normalize_to_grid(dur.to_numpy(), bounds["dur_lo"], bounds["dur_hi"])
            d3 = zorder.normalize_to_grid(codec.map(rank).fillna(0).to_numpy(), 0, chi)
            if curve == "hilbert":
                z = zorder.hilbert4(np.stack([d0, d1, d2, d3], axis=1))
            else:
                z = zorder.morton4(d0, d1, d2, d3)
            yield pd.Series(z)

    return key


def _bucket_expr(boundaries: list, key_col: str = "_zval"):
    """bucket = #boundaries strictly below the key — a JVM-side fold
    over a literal array; O(log n) would need a UDF, O(n_boundaries)
    stays in codegen and n is small (≤ thousands). Works for int curve
    keys and for raw string keys (linear layout) alike — Spark's
    comparison semantics order both."""
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(key_col) > b, F.lit(1)).otherwise(F.lit(0)),
    )


def _linear_boundaries(keys_df, n_out: int, rows_total: int) -> list[str]:
    """Range boundaries for the linear (plain sort-order) layout,
    directly on the clip_id STRING: a fixed-width u64 prefix is
    degenerate when ids share a long common prefix (the synthetic ids
    differ only past byte 8), and approxQuantile is numeric-only — so
    sample the pruned key column (payload never read), sort the sample
    on the driver, take every n-th value. ~200 samples per bucket keeps
    bucket skew within a few percent. Driver state is O(n_out · 200)
    strings; beyond ~10^5 output files use hierarchical two-level
    bucketing (same caveat as dense_ids' literal map)."""
    if n_out <= 1:
        return []
    frac = min(1.0, (n_out * 200) / max(rows_total, 1))
    sample = sorted(
        r[0]
        for r in keys_df.select("clip_id").sample(fraction=frac, seed=7).collect()
    )
    if not sample:
        return []
    return [sample[(len(sample) * i) // n_out] for i in range(1, n_out)]


def cluster(
    table: Table,
    curve: str = "zorder",
    target_bytes: int = 128 * 1024 * 1024,
    job_id: str | None = None,
    salt_buckets: int | None = None,
) -> Snapshot:
    """Full clustering rewrite of the current snapshot.

    ``salt_buckets``: None = AUTO — salting engages when the quantile
    boundaries collapse (duplicate boundary values are the signature of
    a degenerate hot key: one curve value holds more than a bucket's
    worth of rows, and no range split can divide it). 0 = off, N>1 =
    forced salt factor."""
    assert curve in ("zorder", "hilbert", "linear")
    spark = table.spark
    base = table.current_snapshot()
    entries = table.manifest_entries(base).to_pylist()
    if not entries:
        raise ValueError("cannot cluster an empty table")
    total_bytes = sum(e["byte_size"] for e in entries)
    n_out = max(1, -(-total_bytes // target_bytes))
    job_id = job_id or f"cluster-{curve}-{uuid.uuid4().hex[:8]}"

    # pass 1: range boundaries from the key columns only (payload never
    # read — column pruning). linear buckets directly on the clip_id
    # string (no curve key, no dimension_bounds codec job); the curves
    # bucket on approxQuantile of the int64 curve key.
    if curve == "linear":
        rows_total = sum(e["row_count"] for e in entries)
        raw_q = _linear_boundaries(table.scan(), n_out, rows_total)
        boundaries = sorted(set(raw_q))
    else:
        bounds = dimension_bounds(table)
        key_udf = curve_key_udf(bounds, curve)
        keys_only = table.scan().select(*CLUSTER_DIMS).withColumn(
            "_zval", key_udf(*[F.col(c) for c in CLUSTER_DIMS])
        )
        if n_out > 1:
            qs = [i / n_out for i in range(1, n_out)]
            raw_q = keys_only.approxQuantile("_zval", qs, 0.001)
            boundaries = sorted(set(int(b) for b in raw_q))
        else:
            raw_q = []
            boundaries = []

    # AUTO skew salting: duplicate quantile boundaries mean one curve
    # value owns more than a bucket's worth of rows — range splitting
    # cannot divide it, so that bucket (and its single write task)
    # would absorb the whole hot key. Salt by the collapse factor: the
    # hot bucket fans out over `salt` hash sub-buckets of clip_id,
    # restoring bounded task/file sizes at the cost of curve-order
    # granularity within the salted bucket.
    effective_salt = 0 if salt_buckets is None else salt_buckets
    if salt_buckets is None and n_out > 1:
        collapsed = len(raw_q) - len(boundaries)
        if collapsed > max(1, n_out // 10):
            effective_salt = max(2, -(-(len(raw_q) + 1) // (len(boundaries) + 1)))

    # pass 2: the rewrite shuffle (internal columns — the per-row _crc —
    # must ride the rewrite so the clustered files keep their integrity
    # column without touching the payload)
    df = table.scan(include_internal=True)
    if curve == "linear":
        sort_cols = ["_bucket", "clip_id"]
        bucket = _bucket_expr(boundaries, "clip_id") if boundaries else F.lit(0)
    else:
        df = df.withColumn("_zval", key_udf(*[F.col(c) for c in CLUSTER_DIMS]))
        sort_cols = ["_bucket", "_zval", "clip_id"]
        bucket = _bucket_expr(boundaries) if boundaries else F.lit(0)
    if effective_salt > 1:
        # spread each range bucket over hash sub-buckets of clip_id
        bucket = bucket * effective_salt + F.pmod(
            F.hash("clip_id"), F.lit(effective_salt)
        )
    df = df.withColumn("_bucket", bucket)

    n_parts = (len(boundaries) + 1) * max(effective_salt, 1)
    return _write_clustered(
        table, df, n_parts, sort_cols, job_id, entries, total_bytes, base,
        summary={
            "job_id": job_id,
            "curve": curve,
            "salt_buckets": effective_salt,
        },
    )


def _write_clustered(
    table, df, n_parts, sort_cols, job_id, removed_entries, bytes_in, base, summary
) -> Snapshot:
    """Shared rewrite tail: bucket-shuffled sorted write → atomic
    promote → per-partition lineage → snapshot commit."""
    staging = table.stage_dir(job_id)
    (
        # _bucket leads the sort so the partitionBy writer's required
        # ordering is already satisfied — otherwise it inserts its own
        # (unstable) sort by _bucket and destroys the curve order
        df.repartition(n_parts, F.col("_bucket"))
        .sortWithinPartitions(*sort_cols)
        .drop("_zval")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staging)
    )
    added = promote_partition_dirs(table, staging, job_id, "_bucket")

    # per-partition lineage: one unit per output file
    log = LineageLog(table, job_id)
    removed = [e["file_path"] for e in removed_entries]
    for i, e in enumerate(added.to_pylist()):
        log.complete_unit(
            i,
            files_in=removed if i == 0 else [],
            files_out=[e["file_path"]],
            bytes_in=bytes_in if i == 0 else 0,
            bytes_out=e["byte_size"],
            rows=e["row_count"],
        )

    return table.commit(
        "cluster",
        added,
        removed_paths=set(removed),
        base=base,
        summary={**summary, "output_files": added.num_rows},
    )


def cluster_incremental(
    table: Table,
    curve: str = "zorder",
    target_bytes: int = 128 * 1024 * 1024,
    job_id: str | None = None,
) -> Snapshot:
    """Cluster ONLY the files added since the last cluster snapshot —
    the 100 TB maintenance cadence: a full-table recluster rewrites
    everything on every run, while steady-state churn is appends and
    merges touching a small fraction. Iceberg's rewrite-data-files
    "sort" strategy with a dirty-file filter is the same idea.

    Semantics: every OUTPUT file of this job is internally curve-sorted
    with tight key ranges (restoring manifest-stats pruning quality for
    the new data); files already clustered by the previous cluster job
    are not touched, so the rewrite cost is O(churn), not O(table).
    The global file-name order == curve order invariant of a FULL
    cluster() holds per clustering generation, not across them — the
    trade that makes the incremental cadence affordable.

    Falls back to a full cluster() when the table has never been
    clustered. No-op (returns the current snapshot) when no files were
    added since the last cluster."""
    assert curve in ("zorder", "hilbert", "linear")
    base = table.current_snapshot()
    last_cluster = next(
        (
            s
            for s in reversed(table.lineage_chain())
            if s["operation"] == "cluster"
        ),
        None,
    )
    if last_cluster is None:
        return cluster(table, curve=curve, target_bytes=target_bytes, job_id=job_id)

    prev_live = set(table.live_files(table.snapshot(last_cluster["snapshot_id"])))
    entries = [
        e
        for e in table.manifest_entries(base).to_pylist()
        if e["file_path"] not in prev_live
    ]
    if not entries:
        return base
    job_id = job_id or f"cluster-inc-{curve}-{uuid.uuid4().hex[:8]}"
    new_bytes = sum(e["byte_size"] for e in entries)
    n_out = max(1, -(-new_bytes // target_bytes))

    # keys-only boundary pass over the NEW files only; normalization
    # bounds still come from the full manifest (metadata-only) so curve
    # keys stay comparable across generations
    paths = [f"{table.root}/{e['file_path']}" for e in entries]
    new_df = table._read_files(paths, base)
    if curve == "linear":
        rows_total = sum(e["row_count"] for e in entries)
        boundaries = sorted(set(_linear_boundaries(new_df, n_out, rows_total)))
        df = new_df.withColumn(
            "_bucket", _bucket_expr(boundaries, "clip_id") if boundaries else F.lit(0)
        )
        sort_cols = ["_bucket", "clip_id"]
    else:
        key_udf = curve_key_udf(dimension_bounds(table), curve)
        keyed = new_df.withColumn("_zval", key_udf(*[F.col(c) for c in CLUSTER_DIMS]))
        if n_out > 1:
            # approxQuantile on the keyed frame still prunes to the 4
            # dim columns (the UDF projection is the only dependency)
            qs = [i / n_out for i in range(1, n_out)]
            raw_q = keyed.approxQuantile("_zval", qs, 0.001)
            boundaries = sorted(set(int(b) for b in raw_q))
        else:
            boundaries = []
        df = keyed.withColumn(
            "_bucket", _bucket_expr(boundaries) if boundaries else F.lit(0)
        )
        sort_cols = ["_bucket", "_zval", "clip_id"]

    return _write_clustered(
        table, df, len(boundaries) + 1, sort_cols, job_id, entries, new_bytes, base,
        summary={
            "job_id": job_id,
            "curve": curve,
            "mode": "incremental",
            "rewritten_bytes": new_bytes,
            "untouched_files": len(prev_live & set(table.live_files(base))),
        },
    )
