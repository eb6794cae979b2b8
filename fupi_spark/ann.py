"""Shared LSH machinery for vector indexing.

Random-hyperplane LSH with deterministic integer plane weights derived
from md5 — computed in Python once and embedded as literals, so the
Spark expression, any SQL oracle, and the driver-side query bucketing
all share bitwise-identical arithmetic (cross-engine rules,
queries.py). Used two ways:

- as a *stored index*: ingest writes an ``lsh_bucket`` column and
  bucket-partitions the sentence table, so a search probes its query
  bucket (+ Hamming neighbors) with manifest-level file skipping +
  parquet predicate pushdown — the engine analogue of the reference's
  index-backed Lance search (/root/reference/fupi/utils.py:149-161);
- as an inline bucketing for the driver-testdata queries
  (pipeline_queries.ann_lsh_buckets / ann_lsh_topk).
"""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import Column
from pyspark.sql import functions as F

LSH_N_PLANES = 8  # 2^8 buckets


def lsh_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic integer hyperplane weights in [-7, 8] from md5."""
    planes = []
    for p in range(n_planes):
        w = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            w.append(int(h[:2], 16) % 16 - 7)
        planes.append(w)
    return planes


def plane_dot_expr(col: str, plane: list[int]) -> Column:
    wlit = F.array(*[F.lit(float(w)) for w in plane])
    return F.aggregate(
        F.zip_with(F.col(col).cast("array<double>"), wlit, lambda x, q: x * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def bucket_expr(col: str, planes: list[list[int]]) -> Column:
    """JVM-side bucket id: bit i set when the vector is on the positive
    side of plane i."""
    b = F.lit(0)
    for i, p in enumerate(planes):
        b = b + F.when(plane_dot_expr(col, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def query_bucket(qvec: list[float], planes: list[list[int]]) -> int:
    b = 0
    for i, p in enumerate(planes):
        dot = 0.0
        for x, w in zip(qvec, p):
            dot += x * float(w)
        if dot > 0:
            b |= 1 << i
    return b


def hamming_probes(bucket: int, radius: int, n_bits: int) -> list[int]:
    """The bucket plus every bucket within Hamming distance ``radius``."""
    probes = {bucket}
    for r in range(1, radius + 1):
        for combo in itertools.combinations(range(n_bits), r):
            b = bucket
            for i in combo:
                b ^= 1 << i
            probes.add(b)
    return sorted(probes)
