"""Iceberg-style table metadata layer, built from scratch (SURVEY.md §7:
the Iceberg *model* — snapshot → manifest → data files with per-file
column stats — without binding to Iceberg runtime jars; BASELINE.json
"from scratch, NOT a port").

On-disk layout (object-store friendly: immutable objects + one
conditional PUT per commit):

    <root>/
      data/<job>-<k>.parquet            immutable data files
      metadata/v00001.json ...          snapshot log (conditional-PUT claims)
      metadata/manifests/<id>.parquet   manifest files (file entries + stats)
      _staging/<job>/                   transient local write area
      _lineage/<job>/unit-<k>.json      per-partition lineage checkpoints

Every metadata mutation, promotion, and GC delete goes through the
``storage.py`` interface — primitives every object store offers (the
reference's tables live on S3/MinIO/R2, /root/reference/fupi/utils.py:16,
searcher.py:378-399): atomic whole-object PUT, conditional PUT (the
commit claim; S3 If-None-Match:*), LIST/HEAD/DELETE, and a
copy-or-rename promote. Spark reads/writes data file *content* directly
(on a cluster, via its own s3a layer). The test suite runs the
maintenance ops against both the POSIX fast path and the
no-atomic-rename object-store emulation.

Visibility is manifest-driven: a data file not referenced by the
current snapshot does not exist to readers — which makes failed jobs
harmless: their staging/data output becomes orphan files collected by
expire.gc_orphans once the job ages past ``abandoned_after_s``
(in-flight jobs are protected by their lineage marker; a crashed job's
marker ages out, see expire.py).

Concurrency: optimistic. A committer computes (removed, added) against
its base snapshot, then claims metadata/v{n+1}.json with a conditional
PUT of the fully-written snapshot (no torn reads, no rename needed).
If another writer won, the committer rebases: reload current live set,
verify none of its input files were removed (no overlap → its rewrite
is still valid), recompute live = current − removed + added, retry.
Overlap → CommitConflict, the job re-runs against the new snapshot.
This serializes concurrent MERGE + compaction exactly like Iceberg's
validation (north rule: "identical snapshot lineage and isolation under
concurrent MERGE + compaction").

The reference's Lance table versioning (every create/add/compact makes
a new version, /root/reference/fupi/utils.py:42,48 +
fupi/embedders.py:124-128) is the seed of this snapshot chain.

Scale notes: manifests are parquet and consumed as DataFrames (not
driver JSON), so planning scales with Spark, not driver memory; per-file
stats are computed as distributed DataFrame aggregations over
``_metadata.file_path`` (manifest "rewrite + stats recomputation as
DataFrame aggregations", BASELINE.json north_star); the snapshot JSON
itself holds only manifest *paths* (O(commits), not O(files)).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import LocalStorage, Storage


def local_path(uri: str) -> str:
    """'file:/p', 'file:///p' or '/p' → '/p'."""
    if uri.startswith("file:"):
        uri = uri[5:]
        while uri.startswith("//"):
            uri = uri[1:]
    return uri


class CommitConflict(Exception):
    """Another writer invalidated this commit's inputs; re-run the job."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str
    manifests: list[str]
    summary: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "snapshot_id": self.snapshot_id,
                "parent_id": self.parent_id,
                "operation": self.operation,
                "manifests": self.manifests,
                "summary": self.summary,
            },
            indent=1,
        )

    @staticmethod
    def from_bytes(data: bytes) -> "Snapshot":
        d = json.loads(data)
        return Snapshot(
            d["snapshot_id"], d["parent_id"], d["operation"], d["manifests"], d["summary"]
        )


# stats tracked per data file: (column, arrow type of its min/max).
# min/max pruning works for strings and ints alike.
CLIPS_STATS: list[tuple[str, pa.DataType]] = [
    ("clip_id", pa.string()),
    ("sr_hz", pa.int64()),
    ("dur_ms", pa.int64()),
    ("codec", pa.string()),
]


class Table:
    """Handle to one lakehouse table rooted at a directory."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        stats_spec: list[tuple[str, pa.DataType]],
        storage: Storage | None = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        # every metadata/promotion/GC mutation goes through the storage
        # interface (object-store compatible primitives, storage.py);
        # Spark itself reads/writes data file CONTENT directly
        self.storage = storage or LocalStorage(self.root)
        self.stats_spec = stats_spec
        self.stats_cols = [c for c, _ in stats_spec]
        self.manifest_schema = pa.schema(_manifest_arrow_fields(stats_spec))
        # delete-file footer schemas, keyed by immutable file path
        self._delete_schema_cache: dict[str, list[str]] = {}

    # -- paths ------------------------------------------------------------
    @property
    def data_dir(self) -> str:
        return f"{self.root}/data"

    @property
    def meta_dir(self) -> str:
        return f"{self.root}/metadata"

    @property
    def manifest_dir(self) -> str:
        return f"{self.meta_dir}/manifests"

    def _snap_path(self, snapshot_id: int) -> str:
        return f"{self.meta_dir}/v{snapshot_id:05d}.json"

    # -- snapshot log ------------------------------------------------------
    def snapshot_ids(self) -> list[int]:
        out = []
        for p in self.storage.list("metadata"):
            name = p[len("metadata/"):]
            if "/" not in name and name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def current_snapshot(self) -> Snapshot | None:
        ids = self.snapshot_ids()
        if not ids:
            return None
        return self.snapshot(ids[-1])

    def snapshot(self, snapshot_id: int) -> Snapshot:
        return Snapshot.from_bytes(
            self.storage.read(f"metadata/v{snapshot_id:05d}.json")
        )

    def schema_ops(self, snapshot: Snapshot | None = None) -> list[dict]:
        """Ordered schema-evolution ops in force at a snapshot
        (evolve.py); inherited commit-to-commit, so time travel replays
        exactly the ops that snapshot knew."""
        snap = snapshot or self.current_snapshot()
        if snap is None:
            return []
        return snap.summary.get("schema_ops") or []

    def current_schema_id(self) -> int:
        """Monotone schema generation: number of evolution ops applied.
        Stamped per file into the manifest so compaction never packs
        files of different physical schemas into one bin."""
        return len(self.schema_ops())

    def scan_schema_names(self) -> list[str]:
        return self.scan().columns

    def scan_schema_types(self) -> dict[str, str]:
        return {f.name: f.dataType.simpleString() for f in self.scan().schema.fields}

    def committed_snapshot_for_job(self, job_id: str) -> Snapshot | None:
        """The snapshot a job id already committed, if any — the
        idempotent re-submission guard every maintenance op shares: an
        orchestrator retrying a job whose commit actually landed (e.g.
        after a timeout) must be a no-op, not a second full rewrite."""
        for sid in self.snapshot_ids():
            s = self.snapshot(sid)
            if s.summary.get("job_id") == job_id:
                return s
        return None

    # -- tags (Iceberg refs parity) ---------------------------------------
    def set_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Name a snapshot (Iceberg tag): expire_snapshots retains every
        tagged snapshot (and so its files), giving durable named
        baselines — audit points, WAP audit states, model-training
        dataset pins — independent of retain_last. Overwrites an
        existing tag of the same name (atomic whole-object PUT)."""
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad tag name {name!r}")
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot().snapshot_id
        if sid not in self.snapshot_ids():
            raise ValueError(f"no snapshot v{sid}")
        self.storage.put(
            f"metadata/refs/{name}.json", json.dumps({"snapshot_id": sid}).encode()
        )

    def tags(self) -> dict[str, int]:
        out = {}
        for p in self.storage.list("metadata/refs"):
            n = p.rsplit("/", 1)[-1]
            if n.endswith(".json") and not n.startswith("."):
                out[n[:-5]] = json.loads(self.storage.read(p))["snapshot_id"]
        return out

    def delete_tag(self, name: str) -> None:
        self.storage.delete(f"metadata/refs/{name}.json")

    def resolve_tag(self, name: str) -> int:
        t = self.tags()
        if name not in t:
            raise KeyError(f"no tag {name!r}")
        return t[name]

    def snapshot_as_of(self, ts_ms: int) -> int:
        """AS-OF-timestamp time travel (Iceberg ``FOR TIMESTAMP AS OF``):
        the LATEST snapshot whose commit stamp is <= ts_ms. Pre-stamp
        snapshots (written before committed_at_ms existed) are treated
        as infinitely old, so they resolve for any ts."""
        best = None
        for sid in self.snapshot_ids():
            at = self.snapshot(sid).summary.get("committed_at_ms", 0)
            if at <= ts_ms:
                best = sid
        if best is None:
            raise ValueError(f"no snapshot committed at or before {ts_ms}")
        return best

    def lineage_chain(self) -> list[dict]:
        """Snapshot lineage: (id, parent, operation, summary) per commit."""
        return [
            {
                "snapshot_id": s.snapshot_id,
                "parent_id": s.parent_id,
                "operation": s.operation,
                "summary": s.summary,
            }
            for s in (self.snapshot(i) for i in self.snapshot_ids())
        ]

    # -- manifests ---------------------------------------------------------
    def manifest_entries(self, snapshot: Snapshot | None = None) -> pa.Table:
        """All live file entries of a snapshot as one Arrow table."""
        snap = snapshot or self.current_snapshot()
        if snap is None or not snap.manifests:
            return _empty_manifest(self.stats_spec)
        tables = [
            pad_cast_manifest(pq.read_table(f"{self.root}/{m}"), self.manifest_schema)
            for m in snap.manifests
        ]
        return pa.concat_tables(tables)

    def manifest_df(self, snapshot: Snapshot | None = None) -> DataFrame:
        """Manifest entries as a Spark DataFrame (scale path: planning
        joins/aggregations over file metadata run distributed)."""
        snap = snapshot or self.current_snapshot()
        if snap is None or not snap.manifests:
            return self.spark.createDataFrame([], schema=_manifest_spark_schema(self.stats_spec))
        paths = [f"{self.root}/{m}" for m in snap.manifests]
        return self.spark.read.parquet(*paths)

    def live_files(self, snapshot: Snapshot | None = None) -> list[str]:
        return self.manifest_entries(snapshot).column("file_path").to_pylist()

    def data_entries(self, snapshot: Snapshot | None = None) -> list[dict]:
        """Row-data file entries (excludes MOR equality-delete files;
        NULL content == 'data' for pre-MOR manifests)."""
        return [
            e
            for e in self.manifest_entries(snapshot).to_pylist()
            if (e.get("content") or "data") == "data"
        ]

    def delete_entries(self, snapshot: Snapshot | None = None) -> list[dict]:
        """Outstanding MOR equality-delete file entries."""
        return [
            e
            for e in self.manifest_entries(snapshot).to_pylist()
            if e.get("content") == "deletes"
        ]

    def delete_key_specs(self, snapshot: Snapshot | None = None) -> list[dict]:
        """Outstanding delete entries annotated with their key-column
        set and whether they carry PER-KEY sequences (``_del_seq``
        column — written by consolidate_deletes; plain delete files
        apply at their single manifest sequence). Key columns come from
        a parquet footer read, cached per path (delete files are
        immutable), so repeated scans cost O(new delete files) footer
        reads — and consolidation keeps the outstanding count at ~1 per
        key set."""
        out = []
        for e in self.delete_entries(snapshot):
            path = e["file_path"]
            names = self._delete_schema_cache.get(path)
            if names is None:
                names = pq.read_schema(local_path(f"{self.root}/{path}")).names
                self._delete_schema_cache[path] = names
            out.append(
                {
                    **e,
                    "key_cols": tuple(c for c in names if not c.startswith("_")),
                    "keyed_seq": "_del_seq" in names,
                }
            )
        return out

    def write_manifest(self, entries: pa.Table) -> str:
        # staged under _staging/ so a crash between write and promote
        # leaves the temp where expire's committed-job sweep and the
        # age-gated '.tmp-*' sweep can reclaim it (a root-level temp
        # would leak forever — no GC path lists the table root)
        rel = f"metadata/manifests/{uuid.uuid4().hex}.parquet"
        tmp_dir = f"{self.root}/_staging/.manifest-tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = f"{tmp_dir}/.tmp-{uuid.uuid4().hex}.parquet"
        pq.write_table(entries, tmp)
        self.storage.promote(tmp, rel)
        return rel

    # -- reads --------------------------------------------------------------
    @staticmethod
    def _drop_internal(df: DataFrame) -> DataFrame:
        """Strip engine-internal physical columns (today: the per-row
        payload checksum ``_crc``) from user-facing reads."""
        from .integrity import CRC_COL

        return df.drop(CRC_COL) if CRC_COL in df.columns else df

    def scan(
        self,
        snapshot_id: int | None = None,
        include_internal: bool = False,
        tag: str | None = None,
        as_of_ms: int | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot (time travel when id given, or
        by name via ``tag``). ``include_internal`` keeps physical
        columns like ``_crc`` — engine rewrites must carry them;
        queries should not see them.

        Schema evolution (evolve.py): when the snapshot carries
        schema_ops, the read merges parquet footers and replays the
        ops, so the result always has the snapshot's declared schema
        regardless of each file's physical one."""
        if tag is not None:
            snapshot_id = self.resolve_tag(tag)
        if as_of_ms is not None:
            snapshot_id = self.snapshot_as_of(as_of_ms)
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current_snapshot()
        files = [e["file_path"] for e in self.data_entries(snap)]
        if not files:
            raise ValueError("empty table: no committed snapshot with files")
        df = self._read_files([f"{self.root}/{p}" for p in files], snap)
        return df if include_internal else self._drop_internal(df)

    def _read_files(self, paths: list[str], snap: Snapshot | None) -> DataFrame:
        """Evolution-aware, delete-aware file read: merge parquet
        footers, replay the snapshot's schema ops, and apply the
        snapshot's outstanding MOR equality deletes (no-op for tables
        without either). Every consumer — scan, pruned scans, MERGE's
        touched-file read, cluster rewrites — reads through here, so
        merge-on-read semantics hold engine-wide; compaction
        deliberately bypasses it (it streams bytes and partitions bins
        by delete applicability instead)."""
        ops = self.schema_ops(snap)
        reader = self.spark.read
        if ops:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*paths)
        if ops:
            from .evolve import apply_schema_ops

            df = apply_schema_ops(df, ops)
        return self._apply_deletes(df, snap)

    #: delete-key sets whose files total more than this many bytes
    #: (manifest byte_size — a MEASURED gate, mirroring merge.py's
    #: payload-broadcast gate) fall back to a shuffle join: an un-gated
    #: broadcast of a 10^8-key GDPR sweep would blow the driver and
    #: Spark's broadcast limit on EVERY read (VERDICT r4 #2)
    DELETE_BROADCAST_MAX_BYTES = 64 << 20

    def _apply_deletes(self, df: DataFrame, snap: Snapshot | None) -> DataFrame:
        """Anti-join the MOR equality-delete keys, sequence-aware: a
        row from data file f is removed iff its key appears in a delete
        file d with sequence(f) <= sequence(d). Re-inserted keys (newer
        data sequence) survive — Iceberg v2 equality-delete semantics.

        Plan shape: ONE parquet read per (key-column set × plain/keyed)
        group — never a per-file driver loop — then a tiny union+agg to
        (key, max_sequence); delete files on DIFFERENT key columns get
        one anti-join each (two outstanding key specs used to make the
        table unreadable). The basename→sequence map always broadcasts
        (O(files) tiny rows); the key set broadcasts only under the
        measured DELETE_BROADCAST_MAX_BYTES gate, else the join
        shuffles (keys + payload once — the correct plan at that size).
        Consolidated delete files carry per-key ``_del_seq`` in the
        file itself; plain files apply at their manifest sequence."""
        snap = snap or self.current_snapshot()
        dels = self.delete_key_specs(snap)
        if not dels:
            return df
        from functools import reduce

        spark = self.spark
        seq_rows = [
            (e["file_path"].rsplit("/", 1)[-1], int(e.get("sequence") or 0))
            for e in self.data_entries(snap)
        ]
        seq_df = spark.createDataFrame(seq_rows, "_fname string, _fseq long")
        out = df.withColumn("_fname", F.col("_metadata.file_name")).join(
            F.broadcast(seq_df), "_fname", "left"
        )
        groups: dict[tuple, list[dict]] = {}
        for e in dels:
            groups.setdefault(e["key_cols"], []).append(e)
        for key_cols, entries in sorted(groups.items()):
            del_df = self._delete_keys_df(list(key_cols), entries)
            if (
                sum(e["byte_size"] or 0 for e in entries)
                <= self.DELETE_BROADCAST_MAX_BYTES
            ):
                del_df = F.broadcast(del_df)
            out = (
                out.join(del_df, list(key_cols), "left")
                .filter(
                    F.col("_del_seq").isNull()
                    | (F.coalesce(F.col("_fseq"), F.lit(0)) > F.col("_del_seq"))
                )
                .drop("_del_seq")
            )
        return out.drop("_fname", "_fseq")

    def _delete_keys_df(self, key_cols: list[str], entries: list[dict]) -> DataFrame:
        """(key → max applicable sequence) frame for one key-column
        group of delete entries (delete_key_specs rows). Plain files
        read in one batch with their manifest sequence attached via a
        broadcast basename map; keyed (consolidated) files read their
        in-file per-key ``_del_seq``."""
        from functools import reduce

        spark = self.spark
        parts = []
        for keyed in (False, True):
            sub = [e for e in entries if e["keyed_seq"] == keyed]
            if not sub:
                continue
            d = spark.read.parquet(
                *[f"{self.root}/{e['file_path']}" for e in sub]
            )
            if keyed:
                parts.append(d.select(*key_cols, "_del_seq"))
                continue
            seqs = {int(e.get("sequence") or 0) for e in sub}
            if len(seqs) == 1:
                # uniform sequence (single file, or one consolidation
                # cohort): a literal keeps the scan plan at exactly two
                # broadcast joins (plan-shape pinned in test_mor.py)
                parts.append(
                    d.select(
                        *key_cols,
                        F.lit(seqs.pop()).cast("long").alias("_del_seq"),
                    )
                )
            else:
                dseq = spark.createDataFrame(
                    [
                        (
                            e["file_path"].rsplit("/", 1)[-1],
                            int(e.get("sequence") or 0),
                        )
                        for e in sub
                    ],
                    "_dfname string, _del_seq long",
                )
                parts.append(
                    d.withColumn("_dfname", F.col("_metadata.file_name"))
                    .join(F.broadcast(dseq), "_dfname")
                    .select(*key_cols, "_del_seq")
                )
        return (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy(*key_cols)
            .agg(F.max("_del_seq").alias("_del_seq"))
        )

    #: manifest sizes above this run the file-skip decision as a
    #: distributed filter over manifest_df instead of a driver loop
    PRUNE_DRIVER_MAX = 100_000

    def scan_pruned(
        self, col: str, lo, hi, snapshot_id: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Range scan with manifest-stats file skipping — the query-side
        payoff of clustering: a file is read only if its [min, max]
        range for ``col`` intersects [lo, hi]. Returns (df, files_read,
        files_total). The residual row filter still reaches the parquet
        reader (row-group pruning), so skipping composes with pushdown.

        Two-path skip decision (same design as expire's anti-join):
        small manifests filter on the driver (zero Spark jobs); past
        PRUNE_DRIVER_MAX entries the same predicate runs as a
        distributed filter over manifest_df — only the SURVIVING file
        paths reach the driver, which on a clustered table is
        O(selectivity), not O(files)."""
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current_snapshot()
        total = (snap.summary or {}).get("total_files") if snap else None
        # NULL stats (column absent at write time) are unbounded — the
        # file can never be skipped on that column.
        _is_data = F.col("content").isNull() | (F.col("content") == "data")
        if total is not None and total > self.PRUNE_DRIVER_MAX:
            mdf = self.manifest_df(snap)
            keep_paths = [
                r["file_path"]
                for r in mdf.filter(_is_data)
                .filter(
                    F.col(f"max_{col}").isNull()
                    | F.col(f"min_{col}").isNull()
                    | ~(
                        (F.col(f"max_{col}") < F.lit(lo))
                        | (F.col(f"min_{col}") > F.lit(hi))
                    )
                )
                .select("file_path")
                .collect()
            ]
            files_total = total
        else:
            entries = self.data_entries(snap)
            keep_paths = [
                e["file_path"]
                for e in entries
                if e[f"max_{col}"] is None
                or e[f"min_{col}"] is None
                or not (e[f"max_{col}"] < lo or e[f"min_{col}"] > hi)
            ]
            files_total = len(entries)
        if not keep_paths:
            df = self.spark.createDataFrame([], self.scan(snapshot_id).schema)
            return df, 0, files_total
        df = self._read_files([f"{self.root}/{p}" for p in keep_paths], snap)
        df = self._drop_internal(df).filter((F.col(col) >= lo) & (F.col(col) <= hi))
        return df, len(keep_paths), files_total

    def incremental_scan(
        self, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> DataFrame:
        """Rows appended between two snapshots (Iceberg-style
        incremental APPEND scan — the changelog-consumption primitive
        for downstream pipelines): the scan covers exactly the data
        files added in (from, to]. Valid across append snapshots and
        metadata-only delete ops (delete-mor / consolidate-deletes
        never move a row between data files): the changelog emits the
        appended rows as visible at ``to`` — the read goes through the
        delete-aware reader, so a row appended then MOR-deleted inside
        the range is not emitted. A replacing operation
        (compact/cluster/merge/delete/rollback) carries old rows into
        new files, so a file-level changelog would double-count —
        raises ValueError, callers re-baseline."""
        to_id = to_snapshot_id or self.current_snapshot().snapshot_id
        for i in self.snapshot_ids():
            if from_snapshot_id < i <= to_id:
                op = self.snapshot(i).operation
                if op not in ("append", "create", "delete-mor", "consolidate-deletes"):
                    raise ValueError(
                        f"incremental scan crosses a '{op}' snapshot (v{i}); "
                        "file-level changelog is append-only — re-baseline"
                    )
        before = set(self.live_files(self.snapshot(from_snapshot_id)))
        added = [
            e["file_path"]
            for e in self.manifest_entries(self.snapshot(to_id)).to_pylist()
            if e["file_path"] not in before
            and (e.get("content") or "data") == "data"
        ]
        if not added:
            return self.spark.createDataFrame([], self.scan(to_id).schema)
        return self._drop_internal(
            self._read_files(
                [f"{self.root}/{p}" for p in added], self.snapshot(to_id)
            )
        )

    def scan_pruned_in(
        self, col: str, values: list, snapshot_id: int | None = None
    ) -> tuple[DataFrame, int, int]:
        """Point-set file skipping: read only files whose [min, max]
        range for ``col`` contains at least one of ``values`` (the
        probe-set analogue of scan_pruned; used by LSH bucket probes).
        The residual isin filter is pushed to the parquet reader, so
        row-group pruning composes with the manifest skip.

        Same two-path decision as scan_pruned: past PRUNE_DRIVER_MAX
        manifest entries the probe runs as a broadcast left-semi range
        join of the values onto manifest_df."""
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current_snapshot()
        total = (snap.summary or {}).get("total_files") if snap else None
        if total is not None and total > self.PRUNE_DRIVER_MAX and values:
            vdf = self.spark.createDataFrame([(v,) for v in values], ["_v"])
            keep_paths = [
                r["file_path"]
                for r in self.manifest_df(snap)
                .filter(F.col("content").isNull() | (F.col("content") == "data"))
                .join(
                    F.broadcast(vdf),
                    F.col(f"min_{col}").isNull()
                    | F.col(f"max_{col}").isNull()
                    | (
                        (F.col("_v") >= F.col(f"min_{col}"))
                        & (F.col("_v") <= F.col(f"max_{col}"))
                    ),
                    "left_semi",
                )
                .select("file_path")
                .collect()
            ]
            files_total = total
        else:
            entries = self.data_entries(snap)
            keep_paths = [
                e["file_path"]
                for e in entries
                if e[f"min_{col}"] is None
                or e[f"max_{col}"] is None
                or any(e[f"min_{col}"] <= v <= e[f"max_{col}"] for v in values)
            ]
            files_total = len(entries)
        if not keep_paths:
            df = self.spark.createDataFrame([], self.scan(snapshot_id).schema)
            return df, 0, files_total
        df = self._read_files([f"{self.root}/{p}" for p in keep_paths], snap)
        df = self._drop_internal(df)
        return df.filter(F.col(col).isin(list(values))), len(keep_paths), files_total

    def scan_in_manifest_order(self, snapshot_id: int | None = None) -> DataFrame:
        """Scan with a per-file ordinal so tests can reconstruct the
        exact physical order (file order from the manifest, row order
        within a parquet file is preserved by the reader).

        One scan + a broadcast join of (file → ordinal) on
        ``_metadata.file_path`` — NOT a union of per-file branches,
        whose plan grows O(files) and whose per-branch footer reads
        serialize on the driver."""
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current_snapshot()
        entries = sorted(self.data_entries(snap), key=lambda e: e["file_path"])
        if not entries:
            raise ValueError("empty table: no files in snapshot")
        ord_df = self.spark.createDataFrame(
            [(e["file_path"].rsplit("/", 1)[-1], i) for i, e in enumerate(entries)],
            "_fname string, _file_ord int",
        )
        df = self._drop_internal(
            self._read_files(
                [f"{self.root}/{e['file_path']}" for e in entries], snap
            )
        )
        # join on the basename (unique in data/) — robust to whatever
        # canonical path form Spark reports in _metadata.file_path
        df = df.withColumn("_fname", F.col("_metadata.file_name"))
        return df.join(F.broadcast(ord_df), "_fname").drop("_fname")

    # -- writes --------------------------------------------------------------
    def stage_dir(self, job_id: str) -> str:
        d = f"{self.root}/_staging/{job_id}"
        os.makedirs(d, exist_ok=True)
        return d

    def write_datafiles(
        self,
        df: DataFrame,
        job_id: str,
        sort_within: list[str] | None = None,
    ) -> pa.Table:
        """Write df into immutable data files and return their manifest
        entries (stats computed as a distributed DataFrame aggregation).

        The caller controls physical partitioning (repartition /
        repartitionByRange) before calling; this preserves it 1 task →
        1 file (maxRecordsPerFile intentionally unset).
        """
        from .integrity import with_crc

        staging = self.stage_dir(job_id)
        # payload checksum computed inline with the write (JVM crc32 —
        # no extra pass); rides every later rewrite of the row
        w = with_crc(df)
        w = w.sortWithinPartitions(*sort_within) if sort_within else w
        w.write.mode("overwrite").parquet(staging)
        return self._promote_staging(staging, job_id)

    def mark_job_active(self, job_id: str) -> None:
        """Register the job's lineage marker before any file lands in
        data/ — orphan GC treats files of a job with a live lineage
        entry and no committing snapshot as in-flight, never orphans
        (the promoted-but-uncommitted window is otherwise a GC race)."""
        if not self.storage.list(f"_lineage/{job_id}"):
            self.storage.put(f"_lineage/{job_id}/.job", b"")

    #: past this many files the footer-stat reads fan out over the
    #: cluster (mapInPandas over the path list) instead of a driver loop
    FOOTER_DRIVER_MAX = 4096

    def footer_file_stats(self, paths: list[str]) -> list[dict] | None:
        """Per-file (row_count, min/max) manifest stats folded from the
        parquet FOOTERS — no data pass (VERDICT r4 #6 / the builder's
        own BENCH/BASELINE.md §5 idea: the staged stats job was ~2-4 s
        of every append's fixed cost; footers already hold exact
        row-group min/max for the stats columns). Returns one dict per
        path (same order), or None when any footer lacks a usable
        statistic — callers fall back to the Spark aggregation, so this
        is purely an optimization, never a correctness dependence.

        Scale: a driver loop up to FOOTER_DRIVER_MAX files; past that
        the footer reads run as a mapInPandas over the path list, so a
        10^5-file append reads footers executor-parallel and ships only
        the tiny stat records back."""
        if len(paths) <= self.FOOTER_DRIVER_MAX:
            out = [_footer_stats_one(local_path(p), self.stats_cols) for p in paths]
        else:
            cols = list(self.stats_cols)
            pdf = self.spark.createDataFrame([(p,) for p in paths], "p string")

            def run(it):
                import pandas as pd

                for chunk in it:
                    recs = []
                    for p in chunk["p"]:
                        s = _footer_stats_one(local_path(p), cols)
                        recs.append(json.dumps({"p": p, "s": s}))
                    yield pd.DataFrame({"rec": recs})

            by_path = {}
            for r in pdf.mapInPandas(run, schema="rec string").collect():
                d = json.loads(r["rec"])
                by_path[d["p"]] = d["s"]
            out = [by_path.get(p) for p in paths]
        if any(o is None for o in out):
            return None
        return out

    def _crc_sums(self, df: DataFrame) -> dict[str, int] | None:
        """Per-file payload checksum sums, reading ONLY the 8-byte
        ``_crc`` column (parquet column pruning) — the one stat footers
        cannot provide. None when the table has no payload column."""
        from .integrity import CRC_COL

        if CRC_COL not in df.columns:
            return None
        rows = (
            df.select(F.col("_metadata.file_name").alias("f"), F.col(CRC_COL))
            .groupBy("f")
            .agg(F.sum(CRC_COL).alias("s"))
            .collect()
        )
        return {r["f"]: r["s"] for r in rows}

    #: staged writes up to this many total rows (known exactly from the
    #: footer fold) read the 8-byte ``_crc`` column driver-side with
    #: pyarrow instead of launching a Spark aggregation job — the job
    #: costs a fixed ~0.3-0.4 s per maintenance stage (measured r6,
    #: guide §1/§5: the driver may do O(small) work, never O(table));
    #: larger stages keep the distributed aggregation
    CRC_DRIVER_MAX_ROWS = 2_000_000

    def _crc_sums_driver(self, paths: list[str]) -> dict[str, int]:
        """Per-file ``_crc`` sums via driver-side pyarrow column reads
        (only the 8-byte checksum column is materialized). Caller gates
        on CRC_DRIVER_MAX_ROWS/FOOTER_DRIVER_MAX."""
        import pyarrow.compute as pc

        from .integrity import CRC_COL

        out: dict[str, int] = {}
        for p in paths:
            lp = local_path(p)
            if CRC_COL not in pq.read_schema(lp).names:
                out[p.rsplit("/", 1)[-1]] = None
                continue
            s = pc.sum(pq.read_table(lp, columns=[CRC_COL]).column(CRC_COL))
            out[p.rsplit("/", 1)[-1]] = s.as_py()
        return out

    def _stats_for_files(self, paths: list[str], df: DataFrame) -> dict[str, dict]:
        """Per-file stats entries keyed by BASENAME: footer fold +
        _crc-only checksum agg, Spark-aggregation fallback when any
        footer lacks a usable statistic. One implementation shared by
        append promotion and partition-dir promotion (compact.py) so
        the two paths can't drift."""
        from .integrity import CRC_COL

        fstats = self.footer_file_stats(paths)
        if fstats is not None:
            total_rows = sum(s["row_count"] for s in fstats)
            if (
                CRC_COL in df.columns
                and total_rows <= self.CRC_DRIVER_MAX_ROWS
                and len(paths) <= self.FOOTER_DRIVER_MAX
            ):
                crc = self._crc_sums_driver(paths)
            else:
                crc = self._crc_sums(df) or {}
            return {
                p.rsplit("/", 1)[-1]: {
                    **st,
                    "checksum_bytes": crc.get(p.rsplit("/", 1)[-1]),
                }
                for p, st in zip(paths, fstats)
            }
        return {
            r["file_path"].rsplit("/", 1)[-1]: r.asDict()
            for r in self._file_stats_df(df).collect()
        }

    def _promote_staging(self, staging: str, job_id: str) -> pa.Table:
        # per-file stats from the staged parquet FOOTERS (+ one
        # _crc-column-only agg for the checksum); full-scan fallback if
        # any footer lacks stats
        staged = sorted(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        stats = self._stats_for_files(
            [f"{staging}/{f}" for f in staged], self.spark.read.parquet(staging)
        )
        ordered = [
            {**stats[f], "file_path": f"{staging}/{f}"} for f in staged
        ]
        self.mark_job_active(job_id)
        self.storage.ensure_dir("data")
        entries = []
        # per-attempt nonce: a job-id reuse must never rename over a
        # live data file of an earlier run
        nonce = uuid.uuid4().hex[:6]
        pairs = [
            (r["file_path"], f"data/{job_id}-{nonce}-{i:05d}.parquet")
            for i, r in enumerate(ordered)
        ]
        self.storage.promote_many(pairs)
        for (_src, rel), r in zip(pairs, ordered):
            e = {
                "file_path": rel,
                "row_count": r["row_count"],
                "byte_size": self.storage.size(rel),
                "checksum_bytes": r["checksum_bytes"],
                "schema_id": self.current_schema_id(),
            }
            for c in self.stats_cols:
                e[f"min_{c}"] = r[f"min_{c}"]
                e[f"max_{c}"] = r[f"max_{c}"]
            entries.append(e)
        shutil.rmtree(staging, ignore_errors=True)
        return entries_to_arrow(entries, self.stats_spec)

    def _file_stats_df(self, df: DataFrame) -> DataFrame:
        """Per-file min/max/count stats as one groupBy aggregation —
        the manifest 'stats recomputation' required by the north rule.
        Partial-agg friendly: combines map-side, shuffles only
        (file, stats) partials."""
        from .integrity import CRC_COL

        aggs = [F.count(F.lit(1)).alias("row_count")]
        present = set(df.columns)
        # per-file payload checksum: reads only the 8-byte _crc column
        if CRC_COL in present:
            aggs.append(F.sum(CRC_COL).alias("checksum_bytes"))
        else:
            aggs.append(F.lit(None).cast("long").alias("checksum_bytes"))
        for c in self.stats_cols:
            if c in present:
                aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
            else:
                aggs += [
                    F.lit(None).alias(f"min_{c}"),
                    F.lit(None).alias(f"max_{c}"),
                ]
        return (
            df.withColumn("file_path", F.col("_metadata.file_path"))
            .groupBy("file_path")
            .agg(*aggs)
        )

    # -- commits -------------------------------------------------------------
    def commit(
        self,
        operation: str,
        added: pa.Table,
        removed_paths: set[str] | None = None,
        base: Snapshot | None = None,
        summary: dict | None = None,
        input_paths: set[str] | None = None,
        max_retries: int = 20,
        expected_schema_ops: list[dict] | None = None,
        expected_delete_paths: set[str] | None = None,
    ) -> Snapshot:
        """Optimistic snapshot commit with rebase-on-race.

        ``removed_paths``: files this op replaces (compact/merge/cluster).
        ``input_paths``: files whose *content* the op depends on
        (defaults to removed_paths) — if a concurrent commit removed any
        of them, the op's output is stale → CommitConflict.
        ``expected_schema_ops``: the schema_ops list this commit's
        summary was PLANNED against (evolve.py sets it) — a rebase onto
        a base whose schema_ops changed means a concurrent evolution
        won; silently committing the precomputed list would overwrite
        the winner's op (a lost update the file validation cannot see),
        so it raises CommitConflict instead.
        ``expected_delete_paths``: the MOR delete-file set this op
        APPLIED while rewriting (delete-applying rewrites — cluster,
        merge, delete_where — set it). A delete_keys_mor that lands
        between the rewrite's plan and its commit passes the file
        validation (it removes nothing), but the rewrite's outputs get
        sequence > the delete's, silently resurrecting the deleted keys
        while the delete file lingers inert — Iceberg's RewriteFiles
        raises on new delete files for exactly this reason, and so do
        we (CommitConflict; the job re-runs against the new deletes).
        """
        removed_paths = removed_paths or set()
        input_paths = input_paths if input_paths is not None else set(removed_paths)
        base = base or self.current_snapshot()
        self.storage.ensure_dir("metadata")

        for _ in range(max_retries):
            current = self.current_snapshot()
            if current is not None and (
                base is None or current.snapshot_id != base.snapshot_id
            ):
                # someone committed since we planned: validate inputs survive
                cur_files = set(self.live_files(current))
                if input_paths - cur_files:
                    raise CommitConflict(
                        f"{operation}: concurrent commit removed input files "
                        f"{sorted(input_paths - cur_files)[:3]}..."
                    )
                if expected_schema_ops is not None and (
                    (current.summary.get("schema_ops") or []) != expected_schema_ops
                ):
                    raise CommitConflict(
                        f"{operation}: concurrent schema evolution — "
                        "replan against the current snapshot"
                    )
                if expected_delete_paths is not None and (
                    {e["file_path"] for e in self.delete_entries(current)}
                    != expected_delete_paths
                ):
                    raise CommitConflict(
                        f"{operation}: concurrent MOR delete commit — this "
                        "rewrite applied a stale delete set and would "
                        "resurrect deleted keys; re-run against the "
                        "current snapshot"
                    )
                base = current
            live = self.manifest_entries(base) if base else _empty_manifest(self.stats_spec)
            if removed_paths:
                keep_mask = [p not in removed_paths for p in live.column("file_path").to_pylist()]
                live = live.filter(pa.array(keep_mask))
            next_id = (base.snapshot_id if base else 0) + 1
            # MOR bookkeeping: added entries default to content='data'
            # and sequence=<this snapshot id> unless the op set them
            # explicitly (compaction inherits its inputs' sequence;
            # delete files carry content='deletes'). Stamped inside the
            # retry loop because a rebase changes next_id.
            stamped = _stamp_added(
                added.cast(self.manifest_schema), self.manifest_schema, next_id
            )
            merged = pa.concat_tables([live.cast(self.manifest_schema), stamped])
            manifest_rel = self.write_manifest(merged)
            # schema evolution ops are table-level state: inherit them
            # from the base snapshot unless this commit sets them
            # explicitly (evolve.py does; everything else inherits)
            inherited_ops = (base.summary.get("schema_ops") if base else None) or []
            extra = dict(summary or {})
            if "schema_ops" not in extra and inherited_ops:
                extra["schema_ops"] = inherited_ops
            # last-cluster marker: carried forward by EVERY commit (like
            # schema_ops) so it survives snapshot expiry — without it,
            # expire's retain_last would routinely prune the cluster
            # snapshot and cluster_incremental would silently degrade to
            # a full-table recluster (losing its O(churn) guarantee).
            # expire_snapshots pins the marked snapshot as retained.
            if operation == "cluster":
                extra["last_cluster_snapshot_id"] = next_id
            else:
                inherited_lc = (
                    base.summary.get("last_cluster_snapshot_id") if base else None
                )
                if "last_cluster_snapshot_id" not in extra and inherited_lc is not None:
                    extra["last_cluster_snapshot_id"] = inherited_lc
            # the cluster codec-rank dictionary is table-level state the
            # same way (r6): once a codec value is ranked, later
            # rewrites must not forget it — a re-packed layout can hide
            # an interior value from every file's min/max stats, which
            # would silently shift the curve order of already-clustered
            # data (cluster.dimension_bounds)
            inherited_cr = (
                base.summary.get("cluster_codec_ranks") if base else None
            )
            if "cluster_codec_ranks" not in extra and inherited_cr is not None:
                extra["cluster_codec_ranks"] = inherited_cr
            # wall-clock commit stamp (ms): enables AS-OF-timestamp time
            # travel (snapshot_as_of) — informational, never used for
            # ordering (snapshot ids are the total order)
            extra.setdefault("committed_at_ms", int(time.time() * 1000))
            snap = Snapshot(
                snapshot_id=next_id,
                parent_id=base.snapshot_id if base else None,
                operation=operation,
                manifests=[manifest_rel],
                summary={
                    **extra,
                    "added_files": added.num_rows,
                    "removed_files": len(removed_paths),
                    "total_files": merged.num_rows,
                    "total_rows": sum(merged.column("row_count").to_pylist()),
                    "total_bytes": sum(merged.column("byte_size").to_pylist()),
                },
            )
            # Conditional PUT of the fully-written snapshot (atomic
            # create WITH content — on S3: If-None-Match:*). On a lost
            # race, do NOT fast-forward base: the next iteration must
            # see current != base so the input_paths validation runs
            # against the winner's live set (a compaction losing to a
            # merge that removed its inputs must raise CommitConflict,
            # not commit stale rows).
            if self.storage.put_if_absent(
                f"metadata/v{next_id:05d}.json", snap.to_json().encode()
            ):
                return snap
        raise CommitConflict(f"{operation}: gave up after {max_retries} rebase attempts")


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _footer_stats_one(path: str, stats_cols: list[str]) -> dict | None:
    """(row_count, min/max per stats column) from ONE parquet footer.
    None when a needed statistic is absent/unusable (caller falls back
    to the Spark aggregation). A stats column missing from the file's
    schema (schema evolution) folds to NULL min/max — unbounded, the
    same contract the Spark agg produces; all-null chunks are skipped.
    Exactness note: parquet-mr/arrow write full (untruncated) row-group
    chunk statistics for these short string/int columns by default; and
    even when a writer truncates long binary stats, parquet's contract
    keeps them SOUND bounds (truncated max is rounded up), so pruning
    never over-skips — only value-parity with a full aggregation could
    differ, which the fallback covers for exotic specs."""
    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(i).path: i for i in range(md.num_columns)}
    rec: dict = {"row_count": md.num_rows}
    for c in stats_cols:
        if c not in names:
            rec[f"min_{c}"] = None
            rec[f"max_{c}"] = None
            continue
        mins: list = []
        maxs: list = []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(names[c])
            st = col.statistics
            if st is None:
                return None
            if not st.has_min_max:
                if st.null_count == md.row_group(rg).num_rows:
                    continue  # all-null chunk contributes no bound
                return None
            if not isinstance(st.min, (str, int)) or not isinstance(
                st.max, (str, int)
            ):
                return None  # exotic stat type (binary/date spec) → fallback
            mins.append(st.min)
            maxs.append(st.max)
        rec[f"min_{c}"] = min(mins) if mins else None
        rec[f"max_{c}"] = max(maxs) if maxs else None
    return rec


def _manifest_arrow_fields(stats_spec: list[tuple[str, pa.DataType]]) -> list[pa.Field]:
    fields = [
        pa.field("file_path", pa.string()),
        pa.field("row_count", pa.int64()),
        pa.field("byte_size", pa.int64()),
        # per-file payload checksum: sum of per-row _crc (integrity.py);
        # NULL for tables without a payload column or unknown files
        pa.field("checksum_bytes", pa.int64()),
        # schema generation the file was written under (evolve.py);
        # compaction packs bins per generation so one bin never mixes
        # physical schemas. NULL (pre-evolution manifests) == gen 0.
        pa.field("schema_id", pa.int64()),
        # merge-on-read support (Iceberg v2 shape): 'content' marks a
        # file as row data or an equality-DELETE key file (NULL ==
        # 'data' for pre-MOR manifests); 'sequence' is the committing
        # snapshot id — an equality delete applies to a data file iff
        # file.sequence <= delete.sequence, so re-inserting a deleted
        # key (new, higher sequence) is visible while old copies stay
        # deleted. Rewrites that APPLY deletes stamp the new sequence;
        # compaction (streams bytes, applies nothing) inherits its
        # inputs' sequence and never mixes applicability sets.
        pa.field("content", pa.string()),
        pa.field("sequence", pa.int64()),
    ]
    for c, typ in stats_spec:
        fields.append(pa.field(f"min_{c}", typ))
        fields.append(pa.field(f"max_{c}", typ))
    return fields


def _stamp_added(tbl: pa.Table, schema: pa.Schema, seq: int) -> pa.Table:
    """Fill NULL content/sequence on entries being added by a commit
    (content → 'data', sequence → the committing snapshot id). Entries
    with explicit values pass through untouched."""
    cols = []
    for f in schema:
        col = tbl.column(f.name)
        if f.name == "sequence":
            col = pa.array(
                [seq if v is None else v for v in col.to_pylist()], type=f.type
            )
        elif f.name == "content":
            col = pa.array(
                ["data" if v is None else v for v in col.to_pylist()], type=f.type
            )
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def pad_cast_manifest(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a manifest to ``schema``, padding columns the file predates
    with NULLs (manifest-schema evolution: older manifests stay
    readable after new stats/checksum columns are introduced)."""
    cols = []
    for f in schema:
        if f.name in tbl.column_names:
            cols.append(tbl.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def _empty_manifest(stats_spec: list[tuple[str, pa.DataType]]) -> pa.Table:
    schema = pa.schema(_manifest_arrow_fields(stats_spec))
    return pa.table({f.name: pa.array([], type=f.type) for f in schema})


def _manifest_spark_schema(stats_spec: list[tuple[str, pa.DataType]]):
    from pyspark.sql import types as T

    _map = {pa.string(): T.StringType(), pa.int64(): T.LongType()}
    fields = [
        T.StructField("file_path", T.StringType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("checksum_bytes", T.LongType()),
        T.StructField("schema_id", T.LongType()),
        T.StructField("content", T.StringType()),
        T.StructField("sequence", T.LongType()),
    ]
    for c, typ in stats_spec:
        fields.append(T.StructField(f"min_{c}", _map.get(typ, T.StringType())))
        fields.append(T.StructField(f"max_{c}", _map.get(typ, T.StringType())))
    return T.StructType(fields)


def entries_to_arrow(
    entries: list[dict], stats_spec: list[tuple[str, pa.DataType]]
) -> pa.Table:
    schema = pa.schema(_manifest_arrow_fields(stats_spec))
    if not entries:
        return _empty_manifest(stats_spec)
    cols = {f.name: pa.array([e.get(f.name) for e in entries], type=f.type) for f in schema}
    return pa.table(cols).cast(schema)


# ---------------------------------------------------------------------------
# table-level API (reference parity: create/overwrite I16, append I17 —
# /root/reference/fupi/utils.py:39-49, fupi/embedders.py:119-125)
# ---------------------------------------------------------------------------


def create_table(spark: SparkSession, root: str, stats_spec=None, storage=None) -> Table:
    t = Table(spark, root, stats_spec or CLIPS_STATS, storage=storage)
    t.storage.ensure_dir("metadata")
    t.storage.ensure_dir("data")
    if t.current_snapshot() is None:
        t.commit("create", _empty_manifest(t.stats_spec))
    return t


def load_table(spark: SparkSession, root: str, stats_spec=None, storage=None) -> Table:
    t = Table(spark, root, stats_spec or CLIPS_STATS, storage=storage)
    if t.current_snapshot() is None:
        raise FileNotFoundError(f"no table at {root}")
    return t


def rollback(table: Table, snapshot_id: int) -> Snapshot:
    """Roll the table head back to an earlier snapshot's state (Iceberg
    rollback parity): a NEW snapshot whose live set is the target's —
    history is never rewritten, so time travel and concurrent readers
    stay consistent, and the optimistic claim arbitrates races like any
    other commit."""
    target = table.snapshot(snapshot_id)
    entries = table.manifest_entries(target)
    current = table.current_snapshot()
    removed = set(table.live_files(current))
    return table.commit(
        "rollback",
        entries,
        removed_paths=removed,
        base=current,
        input_paths=set(),  # depends on no current file's content
        summary={"rolled_back_to": snapshot_id},
    )


def append(
    table: Table,
    df: DataFrame,
    job_id: str | None = None,
    parts: int | None = None,
    sort_within: list[str] | None = None,
) -> Snapshot:
    """Append write: new data files + new snapshot referencing old ∪ new.
    The caller controls physical layout: pre-repartition (or pass
    ``parts`` for a blind hash repartition) and ``sort_within`` to keep
    per-file/row-group stats tight on index columns."""
    job_id = job_id or f"append-{uuid.uuid4().hex[:8]}"
    if parts:
        df = df.repartition(parts)
    added = table.write_datafiles(df, job_id, sort_within=sort_within)
    return table.commit("append", added, summary={"job_id": job_id})
