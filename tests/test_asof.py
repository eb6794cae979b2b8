"""As-of join and banded range join: semantics (ties, unmatched rows,
window containment) and plan shape (no nested-loop range join — the
whole point of the composition)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from fupi_spark.asof import asof_join, range_join_banded
from tests.test_plans import formatted


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _sides(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, k="a", ts=_ts(10)),
            Row(lid=2, k="a", ts=_ts(20)),
            Row(lid=3, k="a", ts=_ts(5)),   # before any right row
            Row(lid=4, k="b", ts=_ts(30)),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), val=1.5),  # exact tie with lid=1
            Row(k="a", ts=_ts(15), val=2.5),
            Row(k="a", ts=_ts(25), val=9.0),  # after every left row
        ]
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["val"]
    )
    got = {r["lid"]: r["r_val"] for r in out.collect()}
    assert got == {
        1: 1.5,  # tie at equal ts matches (ASOF >= semantics)
        2: 2.5,  # most recent prior, not just any prior
        3: None,  # no right row at-or-before
        4: None,  # key absent from right side
    }


def test_asof_plan_single_shuffle_no_nested_loop(spark):
    left, right = _sides(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["val"]
    )
    plan = formatted(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # one window over the union: exactly one exchange below it
    # (detail section lists each node once as "(n) Exchange")
    n_exchanges = sum(
        1
        for ln in plan.splitlines()
        if ln.startswith("(") and "Exchange" in ln
    )
    assert n_exchanges == 1, plan


def test_range_join_banded_matches_exact_filter(spark):
    left, right = _sides(spark)
    # window of 10 minutes, band exactly the window width
    pairs = range_join_banded(
        left.withColumnRenamed("ts", "l_ts"),
        right.withColumnRenamed("ts", "r_ts"),
        on=["k"],
        left_ts="l_ts",
        right_ts="r_ts",
        window_expr=F.expr("INTERVAL 10 MINUTES"),
        band_seconds=600,
    )
    got = sorted((r["lid"], r["val"]) for r in pairs.collect())
    # lid=1 @10: rights @10 (tie in window); lid=2 @20: rights @10,@15;
    # lid=3 @5: none; lid=4: key b, none
    assert got == [(1, 1.5), (2, 1.5), (2, 2.5)]
    plan = formatted(pairs)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_band_boundary_straddle(spark):
    # right row 1 second before a band boundary, left row 1 second after:
    # different bands, must still pair (the predecessor-band probe)
    left = spark.createDataFrame([Row(lid=1, k="a", l_ts=_ts(10, 1))])
    right = spark.createDataFrame([Row(k="a", r_ts=_ts(9, 59), val=7.0)])
    pairs = range_join_banded(
        left,
        right,
        on=["k"],
        left_ts="l_ts",
        right_ts="r_ts",
        window_expr=F.expr("INTERVAL 600 SECONDS"),
        band_seconds=600,
    )
    assert [(r["lid"], r["val"]) for r in pairs.collect()] == [(1, 7.0)]


def test_approx_distinct_within_bound(spark):
    from fupi_spark.pipeline_queries import approx_distinct_hll

    rows = approx_distinct_hll(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["within_bound"] for r in rows), rows


def test_agg_cube_oracle(spark):
    from fupi_spark.queries import ORACLE, QUERIES
    from tests.oracle_check import compare

    sf = "/root/testdata/sf0.001"
    compare(QUERIES["agg_cube"](spark, sf), ORACLE["agg_cube"], sf)


def test_asof_bucketed_semantics_and_equivalence(spark):
    from fupi_spark.asof import asof_join_bucketed

    left, right = _sides(spark)
    # 7-minute buckets: lid=2 @20 matches @15 (previous bucket → carry),
    # lid=1 @10 ties in its own bucket, lid=3/4 unmatched
    out = asof_join_bucketed(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        payload=["val"], bucket_seconds=420,
    )
    got = {r["lid"]: r["r_val"] for r in out.collect()}
    assert got == {1: 1.5, 2: 2.5, 3: None, 4: None}
    plan = formatted(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_bucketed_equals_plain_on_events(spark, sf_dir):
    from fupi_spark.queries import QUERIES

    a = sorted(map(tuple, QUERIES["events_asof_join"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["events_asof_join_salted"](spark, sf_dir).collect()))
    assert a == b
