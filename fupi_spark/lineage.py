"""Checkpointed per-partition lineage — every maintenance job records,
per work unit (bin / partition / file-group), the files it consumed and
produced plus bytes/rows metrics, *before* the snapshot commit. A
re-run of the same job_id skips completed units (resume = anti-join of
planned vs completed units), and the final commit assembles its
manifest from unit lineage (BASELINE.json north_star: "resumable from a
checkpointed per-partition lineage manifest carrying
files-in/files-out/bytes/rows metrics").

Unit records are single JSON files written via tmp+rename (atomic on
POSIX), so a crash mid-write never yields a half-valid checkpoint. The
data files a completed unit produced live in ``data/`` but stay
invisible until the job's final snapshot commit (manifest-driven
visibility) — so resume is idempotent and an abandoned job's output is
reclaimed by orphan GC.
"""

from __future__ import annotations

import json
import os

from .meta import Table


class LineageLog:
    def __init__(self, table: Table, job_id: str):
        self.table = table
        self.job_id = job_id
        self.dir = f"{table.root}/_lineage/{job_id}"
        os.makedirs(self.dir, exist_ok=True)

    def _unit_path(self, unit_id: int) -> str:
        return f"{self.dir}/unit-{unit_id:06d}.json"

    def complete_unit(
        self,
        unit_id: int,
        files_in: list[str],
        files_out: list[str],
        bytes_in: int,
        bytes_out: int,
        rows: int,
        extra: dict | None = None,
    ) -> None:
        rec = {
            "job_id": self.job_id,
            "unit_id": unit_id,
            "files_in": files_in,
            "files_out": files_out,
            "bytes_in": bytes_in,
            "bytes_out": bytes_out,
            "rows": rows,
            "committed": True,
            **(extra or {}),
        }
        tmp = self._unit_path(unit_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._unit_path(unit_id))

    def completed_units(self) -> dict[int, dict]:
        out = {}
        for fn in os.listdir(self.dir):
            if fn.startswith("unit-") and fn.endswith(".json"):
                with open(f"{self.dir}/{fn}") as f:
                    rec = json.load(f)
                if rec.get("committed"):
                    out[rec["unit_id"]] = rec
        return out

    def metrics(self) -> dict:
        units = self.completed_units().values()
        return {
            "units": len(list(units)),
            "bytes_in": sum(u["bytes_in"] for u in units),
            "bytes_out": sum(u["bytes_out"] for u in units),
            "rows": sum(u["rows"] for u in units),
        }

    def records(self) -> list[dict]:
        return sorted(self.completed_units().values(), key=lambda r: r["unit_id"])
