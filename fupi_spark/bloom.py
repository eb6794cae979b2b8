"""Per-file bloom-filter index for point lookups on columns min/max
stats can't prune.

After a plain append the key column is spread ~uniformly across every
data file, so each file's (min, max) range covers nearly the whole key
space and stats pruning (meta.scan_pruned) degenerates to a full scan —
the exact case Iceberg solves with parquet bloom filters / Puffin blobs.
This module builds the same structure engine-side: one fixed-size bloom
bitset per data file, stored as a parquet sidecar under the table's
metadata directory.

Scale properties:

- the build is one distributed pass: each file's rows hash inside a
  per-file ``applyInPandas`` group (k=4 md5-derived probes into an
  m-bit set, packed with ``np.packbits``), so the index job shuffles
  only (file, key-hash) pairs and emits O(files) rows of m/8 bytes;
- data files are IMMUTABLE, so bloom rows are too: a refresh after new
  commits hashes ONLY files without an index row (incremental by
  construction — compaction outputs get fresh rows, their inputs' rows
  are dropped with the listing);
- a lookup reads the O(files) index (a few MB per million files at
  m=2^15), tests k bits per candidate file DRIVER-side, and scans only
  the surviving files with the key predicate pushed down — a point
  lookup on a 10^12-row unclustered table touches ~the one file that
  holds the key (+ deterministic false positives at ~(1-e^{-kn/m})^k);
- false positives only ever cost an extra file read; misses are
  impossible (bits are set for every present key — the pytest asserts
  the no-false-negative invariant exhaustively).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bits per file bitset (2^15 = 4 KiB packed); with k=4 probes this
#: holds ~2.3k keys/file at <1% false-positive rate
BLOOM_BITS = 1 << 15
BLOOM_K = 4

INDEX_REL = "metadata/bloom"


def _positions(keys: np.ndarray) -> np.ndarray:
    """k deterministic bit positions per key: md5(key|i) low 60 bits
    mod m — the same engine-portable hash family the portable sketches
    use (pipeline_queries), so index and probe can never drift."""
    import hashlib

    out = np.empty((len(keys), BLOOM_K), np.int64)
    for r, key in enumerate(keys):
        for i in range(BLOOM_K):
            h = hashlib.md5(f"{key}|{i}".encode()).hexdigest()[:15]
            out[r, i] = int(h, 16) % BLOOM_BITS
    return out


def probe_positions(key: str) -> list[int]:
    return _positions(np.array([key], dtype=object))[0].tolist()


_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), False),
        T.StructField("bitset", T.BinaryType(), False),
        # set-bit count: fill ratio (n_bits/m) gives the file's
        # false-positive rate estimate ((n_bits/m)^k) for free
        T.StructField("n_bits", T.LongType(), False),
    ]
)


def refresh_bloom_index(table, col: str) -> dict:
    """Build/refresh the bloom sidecar for ``col`` at the CURRENT
    snapshot: hash only live data files that have no index row yet
    (immutability makes old rows permanently valid), drop rows for
    files no longer live. Returns {'indexed': new, 'kept': reused,
    'files': total_live}."""
    spark = table.spark
    live = set(e["file_path"] for e in table.data_entries())
    existing: dict[str, tuple] = {}
    idx_dir = f"{table.root}/{INDEX_REL}"
    try:
        old = spark.read.parquet(idx_dir).collect()
        existing = {
            r.file_path: (r.file_path, bytes(r.bitset), int(r.n_bits))
            for r in old
            if r.file_path in live
        }
    except Exception:
        existing = {}
    todo = sorted(p for p in live if p not in existing)

    rows: list[tuple] = list(existing.values())
    if todo:
        # evolution-aware read of the todo files: old files store the
        # PHYSICAL pre-rename column names, so a raw read would fail to
        # resolve a renamed index column (AnalysisException). Replay
        # the snapshot's schema ops like every other consumer — but on
        # the raw per-file read, NOT through _read_files: MOR delete
        # application joins away input_file_name(), and indexing
        # to-be-deleted keys is harmless anyway (false positives only,
        # never false negatives).
        ops = table.schema_ops()
        reader = spark.read
        if ops:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[f"{table.root}/{p}" for p in todo])
        if ops:
            from .evolve import apply_schema_ops

            df = apply_schema_ops(df, ops)
        # NULL keys carry no probe positions (md5(NULL) is NULL; the
        # NaN positions crashed the bitset scatter) and a point lookup
        # is by definition on a concrete key — leave them unindexed.
        # A file of ONLY null keys then has no index row, which
        # point_lookup already treats as unprunable (read it), so the
        # no-false-negative invariant holds.
        df = df.select(
            F.col(col).cast("string").alias("_key"),
            F.input_file_name().alias("_file"),
        ).filter(F.col("_key").isNotNull())
        # hash to bit positions JVM-side (md5 inside codegen — the
        # same bytes hashlib computes in probe_positions), then
        # distinct: the shuffle carries at most m=BLOOM_BITS
        # (file, position) pairs per file, and each applyInPandas
        # group is bounded by the bitset size — never by the file's
        # row count
        probe = F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.col("_key"), F.lit(f"|{i}"))),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % BLOOM_BITS
                    )
                    for i in range(BLOOM_K)
                ]
            )
        )
        pos_df = (
            df.select("_file", probe.alias("_pos")).distinct()
        )

        root = table.root

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(BLOOM_BITS, bool)
            bits[pdf["_pos"].to_numpy()] = True
            # normalize the absolute input_file_name URI back to the
            # manifest-relative path ("file:///.../table/data/x.parquet"
            # -> "data/x.parquet")
            f = pdf["_file"].iloc[0].split("://", 1)[-1]
            rel = f.split(root.rstrip("/") + "/", 1)[-1]
            return pd.DataFrame(
                {
                    "file_path": [rel],
                    "bitset": [np.packbits(bits).tobytes()],
                    "n_bits": [int(bits.sum())],
                }
            )

        rows.extend(
            (r.file_path, bytes(r.bitset), int(r.n_bits))
            for r in pos_df.groupBy("_file")
            .applyInPandas(build, schema=_INDEX_SCHEMA)
            .collect()
        )

    if rows:
        spark.createDataFrame(rows, _INDEX_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(idx_dir)
    return {"indexed": len(todo), "kept": len(existing), "files": len(live)}


def point_lookup(table, col: str, key: str) -> tuple[DataFrame, int, int]:
    """Bloom-pruned point lookup: returns (rows DataFrame, files_read,
    files_total). Reads the O(files) index, tests the key's k bits per
    file driver-side, scans only surviving files with the equality
    predicate pushed to parquet. No index row for a live file (e.g.
    refresh not yet run after a commit) means the file cannot be
    pruned — it is read unconditionally (no false negatives ever)."""
    spark = table.spark
    live = [e["file_path"] for e in table.data_entries()]
    pos = probe_positions(key)
    try:
        idx = spark.read.parquet(f"{table.root}/{INDEX_REL}").collect()
    except Exception:
        idx = []
    bitsets = {r.file_path: np.unpackbits(np.frombuffer(r.bitset, np.uint8)) for r in idx}
    keep = [
        p
        for p in live
        if p not in bitsets or all(bitsets[p][i] for i in pos)
    ]
    if not keep:
        empty = table.scan().limit(0)
        return empty.filter(F.col(col) == key), 0, len(live)
    df = table._drop_internal(
        table._read_files(
            [f"{table.root}/{p}" for p in keep], table.current_snapshot()
        )
    ).filter(F.col(col).cast("string") == key)
    return df, len(keep), len(live)
