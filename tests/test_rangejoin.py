"""Interval join operator — boundary inclusivity, multi-bin intervals,
no-duplicate guarantee, degenerate intervals, and the plan shape (hash
join, not BroadcastNestedLoopJoin). Oracle-level check runs as query
`range_join_attribution` against DuckDB's exact inequality join."""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_connect_fs_spark.operators.rangejoin import interval_join


def ts(minute: int):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def make(spark, points, intervals):
    l = spark.createDataFrame(
        [("k", ts(m), f"p{m}") for m in points], "k string, ts timestamp, pid string"
    )
    r = spark.createDataFrame(
        [("k", ts(a), ts(b), f"i{a}_{b}") for a, b in intervals],
        "k string, s timestamp, e timestamp, iid string",
    )
    return l, r


def pairs(df):
    return sorted((r.pid, r.iid) for r in df.collect())


def test_inclusive_bounds_and_multibin(spark):
    # 60s bins; interval [10, 130] spans 3 bins — each in-range point
    # matches exactly once, boundary points INCLUDED on both ends
    l, r = make(spark, [5, 10, 70, 130, 131], [(10, 130)])
    out = interval_join(l, r, ["k"], "ts", "s", "e", bin_seconds=60)
    assert pairs(out) == [("p10", "i10_130"), ("p130", "i10_130"), ("p70", "i10_130")]


def test_overlapping_intervals_and_degenerate(spark):
    l, r = make(spark, [20], [(0, 30), (10, 20), (20, 20), (25, 40), (30, 10)])
    out = interval_join(l, r, ["k"], "ts", "s", "e", bin_seconds=60)
    # point 20 hits three intervals incl. the zero-length [20,20];
    # [25,40] starts after it; inverted [30,10] can never match
    assert pairs(out) == [("p20", "i0_30"), ("p20", "i10_20"), ("p20", "i20_20")]


def test_keys_partition_matches(spark):
    l = spark.createDataFrame(
        [("a", ts(5), "pa"), ("b", ts(5), "pb")], "k string, ts timestamp, pid string"
    )
    r = spark.createDataFrame(
        [("a", ts(0), ts(10), "ia")], "k string, s timestamp, e timestamp, iid string"
    )
    out = interval_join(l, r, ["k"], "ts", "s", "e", bin_seconds=600)
    assert pairs(out) == [("pa", "ia")]  # key b has no interval


def test_plan_is_hash_join_not_nested_loop(spark):
    l, r = make(spark, [5], [(0, 10)])
    plan = (
        interval_join(l, r, ["k"], "ts", "s", "e", bin_seconds=60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # an equi hash/sort-merge join IS present


def test_bad_bin_raises(spark):
    l, r = make(spark, [5], [(0, 10)])
    with pytest.raises(ValueError, match="positive"):
        interval_join(l, r, ["k"], "ts", "s", "e", bin_seconds=0)


def test_shared_column_names_rejected(spark):
    """Both sides carrying a same-named non-key column would be an
    ambiguous reference after the join — fail fast instead."""
    l = spark.createDataFrame([("k", ts(5), "x")], "k string, ts timestamp, note string")
    r = spark.createDataFrame(
        [("k", ts(0), ts(10), "y")], "k string, s timestamp, e timestamp, note string"
    )
    with pytest.raises(ValueError, match="both sides"):
        interval_join(l, r, ["k"], "ts", "s", "e", bin_seconds=60)
