"""Bin-packing small-file compaction — the north-rule centerpiece.

The reference's one-call ``table.compact_files()``
(/root/reference/fupi/embedders.py:127-128, Lance fragment merge)
becomes an explicit, resumable Spark job:

1. plan   — read per-file stats from the manifest; first-fit-decreasing
            pack undersized files into target-size bins (driver-side:
            the packer sees *files*, not rows — thousands of entries at
            10^12-row scale, safely driver-sized);
2. rewrite— ZERO-shuffle job: compaction is pure concatenation, so no
            row ever needs to change tasks. ONE single-branch scan of
            all candidate files; each row's bin id attaches via a
            BroadcastHashJoin on ``_metadata.file_path`` (map-side);
            ``write.partitionBy(_bin)`` streams each bin into its own
            file(s). The plan is O(1) in bin count — the round-2
            union-of-branches design paid ~10 s of driver
            analysis/codegen per 64-bin job, a constant that didn't
            parallelize and capped the stage at every core count;
3. record — per-bin lineage (files-in/out, bytes, rows) checkpointed
            before commit; a resumed job re-uses completed bins;
4. commit — optimistic snapshot commit replacing packed files.

Scale notes: no collect() of row data anywhere and NO shuffle at all —
each task does sequential reads + one sequential write, which is the
I/O floor for compaction; parallelism = scan partitions (small files
packed to maxPartitionBytes), so a 1000-executor cluster saturates
whenever candidate bytes ≫ 1000 × maxPartitionBytes.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import functions as F

from .lineage import LineageLog
from .meta import Snapshot, Table, entries_to_arrow


@dataclass
class Bin:
    bin_id: int
    files: list[dict]  # manifest entries

    @property
    def byte_size(self) -> int:
        return sum(e["byte_size"] for e in self.files)

    @property
    def row_count(self) -> int:
        return sum(e["row_count"] for e in self.files)


def ffd_pack(entries: list[dict], target_bytes: int, min_file_bytes: int | None = None) -> list[Bin]:
    """First-fit-decreasing: pack files smaller than ``min_file_bytes``
    (default: target) into bins of ≤ ``target_bytes``.

    Invariants (property-tested): every bin ≤ target unless it holds a
    single oversized file; deterministic for a given entry list; every
    candidate appears in exactly one bin.
    """
    min_file_bytes = min_file_bytes if min_file_bytes is not None else target_bytes
    candidates = [e for e in entries if e["byte_size"] < min_file_bytes]
    candidates.sort(key=lambda e: (-e["byte_size"], e["file_path"]))
    bins: list[Bin] = []
    for e in candidates:
        placed = False
        for b in bins:
            if b.byte_size + e["byte_size"] <= target_bytes:
                b.files.append(e)
                placed = True
                break
        if not placed:
            bins.append(Bin(len(bins), [e]))
    return bins


def promote_partition_dirs(table: Table, staging: str, job_id: str, part_col: str):
    """Promote a ``partitionBy(part_col)`` staging layout into data/ with
    file names ordered by the partition value (zero-padded), so
    file-name order reproduces bucket order. Returns manifest entries
    with stats recomputed as one DataFrame aggregation."""
    import pyarrow as pa  # noqa: F401

    import uuid as _uuid

    dirs = sorted(
        (int(d.split("=")[1]), d)
        for d in os.listdir(staging)
        if d.startswith(f"{part_col}=")
    )
    table.mark_job_active(job_id)
    # per-attempt nonce (constant within the run, so name order still
    # follows the partition value): promotion can never overwrite a
    # live file of an earlier run that reused the job id
    nonce = _uuid.uuid4().hex[:6]
    pairs = []
    for k, d in dirs:
        parts = sorted(f for f in os.listdir(f"{staging}/{d}") if f.endswith(".parquet"))
        for j, p in enumerate(parts):
            pairs.append(
                (f"{staging}/{d}/{p}", f"data/{job_id}-{nonce}-{k:06d}-{j:02d}.parquet")
            )
    table.storage.promote_many(pairs)
    promoted = [rel for _src, rel in pairs]
    shutil.rmtree(staging, ignore_errors=True)

    # footer-derived stats + _crc-only checksum agg with Spark-agg
    # fallback — one shared implementation (meta._stats_for_files).
    # Keyed by basename, not reconstructed absolute path: Spark reports
    # its own canonical _metadata form, which need not string-match
    # f"{table.root}/..." under symlinks/relative roots
    full_paths = [f"{table.root}/{p}" for p in promoted]
    stats = table._stats_for_files(
        full_paths, table.spark.read.parquet(*full_paths)
    )
    added_entries = []
    for p in promoted:
        r = stats[p.rsplit("/", 1)[-1]]
        e = {
            "file_path": p,
            "row_count": r["row_count"],
            "byte_size": table.storage.size(p),
            "checksum_bytes": r["checksum_bytes"],
            "schema_id": table.current_schema_id(),
        }
        for c in table.stats_cols:
            e[f"min_{c}"] = r[f"min_{c}"]
            e[f"max_{c}"] = r[f"max_{c}"]
        added_entries.append(e)
    return entries_to_arrow(added_entries, table.stats_spec)


def compact(
    table: Table,
    target_bytes: int = 128 * 1024 * 1024,
    min_file_bytes: int | None = None,
    job_id: str | None = None,
    sort_within: list[str] | None = None,
    group_fn=None,
) -> Snapshot | None:
    """Run (or resume) a compaction job. Returns the new snapshot, or
    None when nothing needs compacting.

    ``group_fn(entry) -> hashable``: clustering-aware packing — bins
    never mix files from different groups, so a table laid out by a
    clustered column (e.g. the LSH bucket-group index) keeps its
    per-file stat ranges tight through compaction. Size-blind FFD
    would merge arbitrary files and widen every range back out."""
    spark = table.spark
    base = table.current_snapshot()
    # idempotent re-submission: a job that already COMMITTED must be a
    # no-op (its own output would otherwise re-qualify as candidates —
    # and a multi-file bin's halves would genuinely re-pack, so the
    # planner cannot distinguish "already done" from "new work" by
    # looking at files alone). Mid-crash resume (no commit yet) still
    # goes through the unit-lineage path below.
    if job_id is not None:
        for sid_done in table.snapshot_ids():
            if table.snapshot(sid_done).summary.get("job_id") == job_id:
                return None
    entries = table.data_entries(base)
    dels = table.delete_key_specs(base)
    # bins NEVER mix schema generations (evolve.py): compaction streams
    # files byte-for-byte, so a bin must be physically homogeneous —
    # pre-evolution files (NULL schema_id == gen 0) pack together,
    # post-evolution files pack together. Composes with the caller's
    # clustering-aware group_fn.
    #
    # MOR interplay: compaction applies NO deletes (pure byte
    # concatenation), so an output file must be subject to exactly the
    # deletes its inputs were. An equality delete with sequence s
    # applies to files with sequence <= s, so two inputs with different
    # applicable-delete sets can never share a bin (one merged output
    # sequence cannot represent both); outputs inherit their inputs'
    # (common-applicability) minimum sequence instead of the committing
    # snapshot's.
    # A CONSOLIDATED delete file (per-key _del_seq, consolidate_deletes)
    # straddles data sequences: whether it applies to a given row
    # depends on that key's own sequence, not the file's single manifest
    # sequence. Exact applicability is therefore row-level, so any file
    # a consolidated delete may cover (manifest max-seq >= file seq)
    # only packs with files of the SAME sequence — min-inheritance then
    # changes nothing and per-key semantics survive the byte stream.
    def _applicability(e):
        fseq = e.get("sequence") or 0
        plain = frozenset(
            (d.get("sequence") or 0)
            for d in dels
            if not d["keyed_seq"] and (d.get("sequence") or 0) >= fseq
        )
        keyed_covers = any(
            d["keyed_seq"] and (d.get("sequence") or 0) >= fseq for d in dels
        )
        return (plain, fseq if keyed_covers else None)

    groups: dict = {}
    for e in entries:
        sid = e.get("schema_id") or 0
        key = (sid, _applicability(e))
        if group_fn is not None:
            key = key + (group_fn(e),)
        groups.setdefault(key, []).append(e)
    bins = []
    for g in sorted(groups, key=repr):
        for b in ffd_pack(groups[g], target_bytes, min_file_bytes):
            if len(b.files) > 1:
                bins.append(Bin(len(bins), b.files))
    if not bins:
        return None

    job_id = job_id or f"compact-{uuid.uuid4().hex[:8]}"
    log = LineageLog(table, job_id)
    # a unit counts as done only if it covered the same input files —
    # guards against a stale lineage dir from a different table state
    done = {
        uid: rec
        for uid, rec in log.completed_units().items()
        if uid < len(bins)
        and sorted(rec["files_in"]) == sorted(e["file_path"] for e in bins[uid].files)
    }
    todo = [b for b in bins if b.bin_id not in done]

    if todo:
        # Zero-shuffle rewrite: compaction is pure concatenation, so no
        # data needs to move between tasks. ONE single-branch job per
        # schema generation: scan all candidate files, attach each
        # row's bin id via a BroadcastHashJoin on _metadata.file_path
        # (map-side, no shuffle), write.partitionBy(_bin). Round 2
        # built a union of one branch PER BIN instead — at 64 bins the
        # driver spent ~10 s per compaction analyzing/codegen-ing the
        # 64-branch plan, a constant that didn't parallelize and
        # dominated the stage at every core count (measured: compact
        # ~12 s at local[2] AND local[8] on a 0.35 GB table). The plan
        # here is O(1) in bin count; the file→bin map is a broadcast of
        # O(files) tiny rows, fine at 10^5 bins.
        #
        # Scan partitioning packs small files to maxPartitionBytes, so
        # a bin's rows can span tasks → a bin may emit several files
        # (promotion + lineage already handle multi-file bins); setting
        # maxPartitionBytes ≈ target keeps it to ~1-2 per bin.
        #
        # Crash-resume hygiene: a previous attempt may have died between
        # the write and the promote loop, leaving staged part files
        # that mode('append') would keep and the promote loop would then
        # rename alongside this attempt's output (duplicate rows). Done
        # bins' files were already renamed out of staging, so wiping the
        # whole staging dir before rewriting is always safe.
        shutil.rmtree(table.stage_dir(job_id), ignore_errors=True)
        staging = table.stage_dir(job_id)
        table.mark_job_active(job_id)
        # one write pass per schema generation (mixing would pad old
        # files into the new physical schema); bins are generation-pure
        entry_sid = {e["file_path"]: (e.get("schema_id") or 0) for e in entries}
        by_sid: dict = {}
        for b in todo:
            by_sid.setdefault(entry_sid[b.files[0]["file_path"]], []).append(b)
        # the file→bin join below keys on _metadata.file_name (the
        # basename) — immune to path-representation drift (symlinked or
        # relative table roots, non-file:/ schemes) that a full-path
        # string match would silently miss, dropping every row of a
        # candidate while still removing the file at commit. Basenames
        # are unique by construction (data/<job>-<nonce>-... in one
        # namespace); assert it anyway.
        all_names = [e["file_path"].rsplit("/", 1)[-1] for b in todo for e in b.files]
        assert len(set(all_names)) == len(all_names), "duplicate data-file basenames"
        # pack scan partitions to ~the bin target so a bin's rows land
        # in one task → (mostly) one output file per bin. minPartitionNum
        # must drop to 1: its default (defaultParallelism) would split
        # the packed read back into core-count slices regardless of
        # bytes — compaction's parallelism is total bytes / target by
        # design, which exceeds any cluster's core count at real scale.
        conf = spark.conf
        old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
        old_mpn = conf.get("spark.sql.files.minPartitionNum", None)
        old_oc = conf.get("spark.sql.files.openCostInBytes")
        try:
            conf.set("spark.sql.files.maxPartitionBytes", str(max(target_bytes, 4 << 20)))
            conf.set("spark.sql.files.minPartitionNum", "1")
            # openCost (default 4 MB) padding would force one small file
            # per partition — here packing must be purely byte-bounded
            conf.set("spark.sql.files.openCostInBytes", "0")
            for sid in sorted(by_sid):
                sid_bins = by_sid[sid]
                bin_map = [
                    (e["file_path"].rsplit("/", 1)[-1], b.bin_id)
                    for b in sid_bins
                    for e in b.files
                ]
                map_df = spark.createDataFrame(bin_map, "_fname string, _bin int")
                df = spark.read.parquet(
                    *[f"{table.root}/{e['file_path']}" for b in sid_bins for e in b.files]
                )
                df = df.withColumn("_fname", F.col("_metadata.file_name")).join(
                    F.broadcast(map_df), "_fname"
                ).drop("_fname")
                # _bin leads the in-task sort so the partitionBy writer's
                # required ordering is already satisfied (it would
                # otherwise insert its own unstable sort)
                df = df.sortWithinPartitions("_bin", *(sort_within or []))
                df.write.mode("append").partitionBy("_bin").parquet(staging)
        finally:
            # restore on EVERY path — leaked compaction tuning would
            # skew every later job in the shared session
            conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
            conf.set("spark.sql.files.openCostInBytes", old_oc)
            if old_mpn is None:
                conf.unset("spark.sql.files.minPartitionNum")
            else:
                conf.set("spark.sql.files.minPartitionNum", old_mpn)

        # promote each bin's output into data/ and checkpoint lineage.
        # A per-ATTEMPT nonce in the name makes promotion collision-free:
        # without it, a job-id reuse (or the pre-idempotence re-run bug)
        # could os.rename over a LIVE data file of the earlier run.
        nonce = uuid.uuid4().hex[:6]
        bin_outs: dict[int, list[str]] = {}
        pairs = []
        import pyarrow.parquet as _pq

        for b in todo:
            bin_dir = f"{staging}/_bin={b.bin_id}"
            parts = sorted(
                f for f in os.listdir(bin_dir) if f.endswith(".parquet")
            )
            # every input row must have reached the staged output — a
            # partially-matched file→bin attach (or any writer fault)
            # must fail HERE, before the inputs are removed at commit
            # (cheap: O(outputs-per-bin) parquet footer reads)
            staged_rows = sum(
                _pq.ParquetFile(f"{bin_dir}/{p}").metadata.num_rows for p in parts
            )
            assert staged_rows == b.row_count, (
                f"bin {b.bin_id}: staged {staged_rows} rows != "
                f"{b.row_count} input rows — aborting before commit"
            )
            outs = []
            for i, p in enumerate(parts):
                rel = f"data/{job_id}-{nonce}-b{b.bin_id:05d}-{i:03d}.parquet"
                pairs.append((f"{bin_dir}/{p}", rel))
                outs.append(rel)
            bin_outs[b.bin_id] = outs
        # concurrent promotion first, THEN per-bin checkpoints — a unit
        # record must never precede its files (crash between them would
        # resume a bin whose output is missing)
        table.storage.promote_many(pairs)
        for b in todo:
            files_out = bin_outs[b.bin_id]
            log.complete_unit(
                b.bin_id,
                files_in=[e["file_path"] for e in b.files],
                files_out=files_out,
                bytes_in=b.byte_size,
                bytes_out=sum(table.storage.size(p) for p in files_out),
                rows=b.row_count,
            )
        shutil.rmtree(staging, ignore_errors=True)

    # assemble commit from lineage (covers resumed + fresh units)
    expected = {b.bin_id: sorted(e["file_path"] for e in b.files) for b in bins}
    recs = [
        r
        for r in log.records()
        if r["unit_id"] in expected and sorted(r["files_in"]) == expected[r["unit_id"]]
    ]
    assert len(recs) == len(bins), f"lineage incomplete: {len(recs)}/{len(bins)}"
    removed = {p for r in recs for p in r["files_in"]}
    # Stats fold instead of re-scan: compaction never changes rows, so a
    # bin's min/max is the min/max over its input files' manifest stats
    # and row_count is their sum — the manifest rewrite needs NO extra
    # pass over the data (at 10^12 rows that pass is the single largest
    # avoidable cost of the job).
    by_path = {e["file_path"]: e for e in entries}
    added_entries = []
    for r in recs:
        ins = [by_path[p] for p in r["files_in"]]
        outs = r["files_out"]
        in_sums = [x["checksum_bytes"] for x in ins]
        folded_sum = (
            None if any(v is None for v in in_sums) else sum(in_sums)
        )
        for j, p in enumerate(outs):
            e = {
                "file_path": p,
                "byte_size": table.storage.size(p),
                # multi-file bins are rare (hash-collision split); rows
                # per out-file are only exact when the bin is one file
                "row_count": r["rows"] if len(outs) == 1 else None,
                # checksum folds like row_count: compaction preserves
                # rows exactly, so the bin sum is the input sum; a
                # multi-file split leaves per-file sums unknown (NULL →
                # verify_table treats the file normally, per-row _crc
                # still covers every row)
                "checksum_bytes": folded_sum if len(outs) == 1 else None,
                # output keeps the INPUT generation's physical schema
                # (streamed bytes, never padded) — bins are sid-pure
                "schema_id": ins[0].get("schema_id") or 0,
                "content": "data",
                # inherit the (common-applicability) minimum input
                # sequence so outstanding MOR deletes keep applying
                "sequence": min((x.get("sequence") or 0) for x in ins),
            }
            for c in table.stats_cols:
                lo = [x[f"min_{c}"] for x in ins]
                hi = [x[f"max_{c}"] for x in ins]
                # a NULL input stat means that file's range is unknown →
                # the folded range is unknown too (scan_pruned treats
                # NULL as unbounded, so this stays conservative)
                e[f"min_{c}"] = None if any(v is None for v in lo) else min(lo)
                e[f"max_{c}"] = None if any(v is None for v in hi) else max(hi)
            added_entries.append(e)
    # exact per-file row counts for any multi-file bins (cheap metadata
    # read of just those files)
    missing = [e for e in added_entries if e["row_count"] is None]
    if missing:
        import pyarrow.parquet as pq

        for e in missing:
            e["row_count"] = pq.ParquetFile(f"{table.root}/{e['file_path']}").metadata.num_rows

    return table.commit(
        "compact",
        entries_to_arrow(added_entries, table.stats_spec),
        removed_paths=removed,
        base=base,
        summary={"job_id": job_id, **log.metrics()},
    )
