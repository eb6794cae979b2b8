"""Dense sequence-id assignment without a single-reducer window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
``Exchange SinglePartition`` — every row funnels through one reducer,
the single worst plan shape at 10^12 rows. This module assigns the
exact same dense 1-based ids with a fully parallel plan:

1. range-partition on the order key (one shuffle, boundaries from
   Spark's range sampler) — KEY COLUMNS ONLY when the ordering is
   plain column names (the payload joins back afterwards and never
   rides this shuffle or the checkpoint below);
2. localCheckpoint the partitioned keys — the sampler's boundaries are
   not reproducible across re-evaluations, so the partitioning must be
   computed exactly once (and never silently recomputed);
3. per-partition physical position from monotonically_increasing_id
   (partition id in the upper 31 bits, row position in the lower 33 —
   no window, no second shuffle) after an in-partition sort;
4. per-partition counts (one tiny aggregation: n_partitions rows to
   the driver), prefix-summed into offsets;
5. id = offset[partition] + position + 1. Offsets are applied via a
   literal map when small; beyond ``MAP_LITERAL_MAX`` partitions the
   map becomes a broadcast-joined offsets DataFrame (a 10^12-row run
   wants ≥10^5 partitions — a plan-embedded literal of that size blows
   up analysis/codegen, while a broadcast of n_partitions (int,long)
   rows is a few MB).

Requires the order key to be unique (use a tiebreaker column, as every
query in this repo already does); equal keys could otherwise straddle
a range boundary in arbitrary order.

Replaces the round-1 global windows flagged in VERDICT.md ("What's
wrong" #1); reference parity: CREATE SEQUENCE/nextval ids,
/root/reference/fupi/data.py:39,60.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS_MASK = (1 << 33) - 1

#: above this many partitions the literal offset map becomes a
#: broadcast-joined DataFrame (overridable for tests)
MAP_LITERAL_MAX = 4096


def dense_ids(
    df: DataFrame,
    order_cols: list,
    id_col: str,
    num_parts: int | None = None,
    keys_join: bool | None = None,
) -> DataFrame:
    """Append ``id_col`` = dense 1-based rank of the row in global
    ``order_cols`` order. Exact twin of an unpartitioned row_number
    window, with a parallel plan (range shuffle + map-side ranks).

    Materialization cost (VERDICT r3 #6): when every order col is a
    plain column NAME, only the key columns ride the range shuffle and
    the checkpoint spill — the (key → id) frame is then hash-joined
    back onto ``df``, so the payload moves exactly once (the join)
    instead of twice (payload range-shuffle + payload-width spill).
    Orderings given as Column EXPRESSIONS (e.g. ``desc()``) cannot be
    join keys, so they keep the full-width checkpoint.

    ``keys_join``: None = auto (keys-only when all order cols are
    names); False forces the full-width checkpoint — the right trade
    when ``df`` is narrow but EXPENSIVE to re-evaluate (the join-back
    path evaluates ``df`` a second time; e.g. the sentence-splitter
    explode in ingest.segment). The keys-only path additionally
    requires ``df`` to be deterministic across evaluations (file scans,
    deterministic UDFs — not sample()); a nondeterministic source must
    be pinned (checkpoint) or use keys_join=False. Either way the order
    key must be unique (the join-back also relies on it) — every caller
    in this repo appends a tiebreaker column.
    """
    spark = df.sparkSession
    num_parts = num_parts or spark.sparkContext.defaultParallelism
    key_names = [c for c in order_cols if isinstance(c, str)]
    keys_only = len(key_names) == len(order_cols) and keys_join is not False
    base = df.select(*key_names) if keys_only else df
    # localCheckpoint (not persist): the range sampler's boundaries are
    # not reproducible, so a cache-eviction recompute would silently
    # reshuffle rows while the offsets below stay frozen — truncating
    # the lineage makes block loss a loud failure instead, and the
    # materialized blocks are reclaimed by ContextCleaner once the
    # returned DataFrame is dropped (a plain persist leaks the same way
    # but adds the silent-recompute hazard).
    d = (
        base.repartitionByRange(num_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    if keys_only:
        # the join-back multiplies rows k×k for any key appearing k
        # times (duplicate ids + duplicated payload rows — silent
        # corruption; ADVICE r4). Fail loudly instead: ONE aggregation
        # job over the already-checkpointed key frame (count +
        # countDistinct together — merge.py's source validation shape).
        # countDistinct skips null-key rows, which also cannot survive
        # the join-back — so they fail here too, loudly.
        v = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(*key_names).alias("u"),
        ).collect()[0]
        if v["n"] != v["u"]:
            raise ValueError(
                f"dense_ids: order key {key_names} is not unique "
                f"({v['n']} rows, {v['u']} distinct non-null keys) — "
                "append a tiebreaker column or pass keys_join=False"
            )
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy(F.shiftright("_mid", 33).alias("_pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    acc = 0
    offsets: list[tuple[int, int]] = []
    for pid in sorted(counts):
        offsets.append((int(pid), acc))
        acc += counts[pid]
    pos = F.col("_mid").bitwiseAND(F.lit(_POS_MASK))
    if len(offsets) <= MAP_LITERAL_MAX:
        entries = [F.lit(v) for pair in offsets for v in pair]
        omap = F.create_map(*entries) if entries else F.create_map()
        ids = d.withColumn(
            id_col,
            (omap[F.shiftright("_mid", 33)] + pos + 1).cast("long"),
        ).drop("_mid")
    else:
        # large-partition-count path: broadcast-join the offsets (the
        # plan stays O(1) in n_partitions; the join key is the
        # partition id)
        off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
        ids = (
            d.withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
            .join(F.broadcast(off_df), "_pid")
            .withColumn(id_col, (F.col("_offset") + pos + 1).cast("long"))
            .drop("_mid", "_pid", "_offset")
        )
    if not keys_only:
        return ids
    # keys-only path: attach ids back by the (unique) key columns —
    # the payload never entered the shuffle/spill above
    return df.join(ids, key_names)
