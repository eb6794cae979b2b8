"""Multi-dimensional clustering rewrite: Z-order or Hilbert over
(clip_id, sr_hz, dur_ms, codec), per the north rule.

Physical plan (idiomatic Spark, no RDDs):

1. bounds from manifest stats (min/max per dimension aggregated over
   file entries — zero extra data passes) + codec dictionary ranks;
2. curve key via a vectorized numpy pandas UDF (zorder.morton4 /
   zorder.hilbert4);
3. ``repartitionByRange(n, zval, clip_id [, _salt])`` — range
   partitioning gives *disjoint, ordered* key ranges per output file,
   so concatenating files in name order reproduces the global
   clustering order (tested against the pandas oracle);
4. ``sortWithinPartitions(zval, clip_id)`` then project the key away —
   data files keep the exact input_hint schema;
5. manifest rewrite + per-file stats recomputation, snapshot commit
   (operation='cluster'), per-partition lineage.

Skew: the (zval, clip_id) range key is unique per row, so the range
partitioner's sampling already balances hot regions. When clustering on
low-cardinality dims only (unique=False), a deterministic salt column is
appended to the range key — the classic salting pattern the north rule
asks for — to split a dominant key across partitions.

Scale notes: exactly one shuffle (the range repartition — clustering IS
a data move); the pandas UDF is Arrow-batched and O(1) memory per
batch; at 1000 executors the same plan holds because range boundaries
come from distributed sampling, not the driver.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import zorder
from .lineage import LineageLog
from .meta import Snapshot, Table, entries_to_arrow

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
    # codec dictionary: low cardinality by design; min/max per file only
    # bound the set, so collect distincts with one tiny agg
    codecs = sorted(
        r["codec"] for r in table.scan().select("codec").distinct().collect()
    )
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
            d3 = zorder.normalize_to_grid(
                codec.map(rank).fillna(0).to_numpy(), 0, chi
            )
            if curve == "hilbert":
                z = zorder.hilbert4(np.stack([d0, d1, d2, d3], axis=1))
            else:
                z = zorder.morton4(d0, d1, d2, d3)
            yield pd.Series(z)

    return key


def cluster(
    table: Table,
    curve: str = "zorder",
    target_bytes: int = 128 * 1024 * 1024,
    job_id: str | None = None,
    unique_key: bool = True,
    salt_buckets: int = 8,
) -> Snapshot:
    """Full clustering rewrite of the current snapshot."""
    assert curve in ("zorder", "hilbert")
    base = table.current_snapshot()
    entries = table.manifest_entries(base).to_pylist()
    total_bytes = sum(e["byte_size"] for e in entries)
    n_out = max(1, -(-total_bytes // target_bytes))
    job_id = job_id or f"cluster-{curve}-{uuid.uuid4().hex[:8]}"

    bounds = dimension_bounds(table)
    df = table.scan().withColumn(
        "_zval", curve_key_udf(bounds, curve)(*[F.col(c) for c in CLUSTER_DIMS])
    )
    range_keys = [F.col("_zval"), F.col("clip_id")]
    if not unique_key:
        # low-cardinality cluster key → salt so one hot key can't pin a
        # whole range partition to a single task
        df = df.withColumn("_salt", F.pmod(F.hash("clip_id"), F.lit(salt_buckets)))
        range_keys.append(F.col("_salt"))

    out = (
        df.repartitionByRange(n_out, *range_keys)
        .sortWithinPartitions("_zval", "clip_id")
        .drop("_zval", "_salt")
    )
    added = table.write_datafiles(out, job_id)

    # per-partition lineage: one unit per output file
    log = LineageLog(table, job_id)
    removed = [e["file_path"] for e in entries]
    for i, e in enumerate(added.to_pylist()):
        log.complete_unit(
            i,
            files_in=removed if i == 0 else [],
            files_out=[e["file_path"]],
            bytes_in=total_bytes if i == 0 else 0,
            bytes_out=e["byte_size"],
            rows=e["row_count"],
        )

    return table.commit(
        "cluster",
        added,
        removed_paths=set(removed),
        base=base,
        summary={"job_id": job_id, "curve": curve, "output_files": added.num_rows},
    )
