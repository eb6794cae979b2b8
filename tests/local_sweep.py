"""Local driver-mirror all-entry oracle sweep (VERDICT r5 #2).

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on local[8]
and compares rows + schema + order-insensitive normalized values
against its DuckDB oracle (tests/oracle_check semantics), writing the
per-entry status/timing artifact ``CORRECTNESS_LOCAL_r{N}.json``.

Usage:  python tests/local_sweep.py [round_number]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH", "")) if p
)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    t_all = time.perf_counter()
    entries: dict[str, dict] = {}
    n_ok = n_rows_only = n_fail = 0
    for name, fn in sorted(E.queries().items()):
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            sql = E.oracle_sql().get(name)
            if not sql:
                status = "rows_only" if len(srows) >= 0 else "FAIL"
                n_rows_only += 1
            else:
                res = con.execute(sql)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                o = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
                o2 = sorted(range(len(dcols)), key=lambda i: dcols[i])
                s = sorted(tuple(norm(r[i]) for i in o) for r in srows)
                d = sorted(tuple(norm(r[i]) for i in o2) for r in drows)
                if s == d and sorted(sdf.columns) == sorted(dcols):
                    status = "OK"
                    n_ok += 1
                else:
                    status = "FAIL"
                    n_fail += 1
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            status = f"ERROR: {exc}"[:200]
            n_fail += 1
        sec = round(time.perf_counter() - t0, 2)
        entries[name] = {"status": status, "sec": sec}
        print(f"{name:42s} {status:10s} {sec:7.2f}s", flush=True)

    total = round(time.perf_counter() - t_all, 1)
    out = {
        "round": rnd,
        "harness": (
            "local driver-mirror sweep (tests/oracle_check semantics): "
            "rows + schema + order-insensitive normalized values vs "
            "DuckDB at sf0.01, local[8], one process"
        ),
        "n_entries": len(entries),
        "n_ok": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "total_sec": total,
        "entries": entries,
    }
    path = os.path.join(_REPO, f"CORRECTNESS_LOCAL_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\n{n_ok} OK / {n_rows_only} rows-only / {n_fail} FAIL "
          f"in {total}s -> {path}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
