"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fupi_spark/`` (see SURVEY.md §7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fupi_spark import queries as Q
from fupi_spark import pipeline_queries  # noqa: F401  (registers entries)
from fupi_spark import maintenance_queries  # noqa: F401  (rows-only entries)
from fupi_spark import asof  # noqa: F401  (as-of / range join entries)
from fupi_spark import corpus_ops  # noqa: F401  (splits / sessionize / packing)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (fupi search pipeline Q3-Q10, SURVEY.md §2.2) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return dict(Q.ORACLE)
