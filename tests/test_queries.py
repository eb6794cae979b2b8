"""Every queries() entry with an oracle is checked against DuckDB at
sf0.001 (fast) — the same comparison shape the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from fupi_spark import pipeline_queries  # noqa: F401  (registers entries)
from fupi_spark import queries as Q

from .oracle_check import compare

ORACLE_KEYS = sorted(Q.ORACLE)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    compare(df, Q.ORACLE[name], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(E.queries()) >= set(E.oracle_sql())


def test_flagship_topk_is_take_ordered(spark, sf_dir):
    """The top-k must compile to TakeOrderedAndProject (per-partition
    top-k + driver merge), not a full global sort."""
    from pyspark.sql import functions as F

    emb = Q.load(spark, sf_dir, "embeddings")
    hits = (
        emb.select("vec_id", Q._l2_col("embedding", Q.QUERY_VEC).alias("d"))
        .orderBy("d", "vec_id")
        .limit(30)
    )
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
