"""As-of join operator — backward/forward semantics, tie handling, the
struct-payload chimera guard, and null behavior. The oracle-level check
against DuckDB's native ASOF JOIN runs as query `asof_click_purchase`."""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_connect_fs_spark.operators.asof import asof_join


def ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


def test_backward_basic_and_ties(spark):
    left = spark.createDataFrame(
        [("u1", ts(5), "e1"), ("u1", ts(10), "e2"), ("u2", ts(5), "e3")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("u1", ts(4), 100), ("u1", ts(10), 200), ("u3", ts(1), 999)],
        "k string, ts timestamp, v int",
    )
    out = {
        r.ev: r.asof_v
        for r in asof_join(left, right, on=["k"]).collect()
    }
    # e1: only the ts(4) state qualifies; e2: the SAME-INSTANT ts(10)
    # update is visible (inclusive, DuckDB ASOF parity); e3: no match
    assert out == {"e1": 100, "e2": 200, "e3": None}


def test_forward_direction(spark):
    left = spark.createDataFrame(
        [("u1", ts(5), "e1"), ("u1", ts(11), "e2")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("u1", ts(7), 1), ("u1", ts(20), 2)], "k string, ts timestamp, v int"
    )
    out = {
        r.ev: r.asof_v
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert out == {"e1": 1, "e2": 2}  # nearest ts >= left.ts


def test_no_chimera_rows_across_partial_nulls(spark):
    """A newer right row with nulls in some columns must NOT merge with
    older rows' values — the whole latest row wins, nulls included."""
    left = spark.createDataFrame([("k", ts(9), "e")], "k string, ts timestamp, ev string")
    right = spark.createDataFrame(
        [("k", ts(1), 1, "old"), ("k", ts(5), 2, None)],
        "k string, ts timestamp, a int, b string",
    )
    r = asof_join(left, right, on=["k"]).collect()[0]
    assert r.asof_a == 2 and r.asof_b is None  # not ('old' from ts(1))


def test_null_timestamps_match_nothing(spark):
    """DuckDB-oracle null semantics: a null ts satisfies no inequality —
    null-ts RIGHT rows never attach (they'd otherwise sort first and
    masquerade as earliest state), and null-ts LEFT rows get null (under
    forward's desc order they'd otherwise see every right row)."""
    left = spark.createDataFrame(
        [("k", ts(5), "e1"), ("k", None, "enull")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("k", None, 666), ("k", ts(3), 1), ("k", ts(9), 2)],
        "k string, ts timestamp, v int",
    )
    for direction, expect in (("backward", 1), ("forward", 2)):
        out = {
            r.ev: r.asof_v
            for r in asof_join(left, right, on=["k"], direction=direction).collect()
        }
        assert out["enull"] is None, direction
        assert out["e1"] == expect, direction  # never 666


def test_reserved_internal_names_rejected(spark):
    left = spark.createDataFrame([("k", ts(1), 5)], "k string, ts timestamp, _asof_side int")
    right = spark.createDataFrame([("k", ts(1), 6)], "k string, ts timestamp, v int")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on=["k"])


def test_collision_and_direction_validation(spark):
    left = spark.createDataFrame([("k", ts(1), 5)], "k string, ts timestamp, asof_v int")
    right = spark.createDataFrame([("k", ts(1), 6)], "k string, ts timestamp, v int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"])
    with pytest.raises(ValueError, match="backward"):
        asof_join(left.withColumnRenamed("asof_v", "x"), right, on=["k"], direction="sideways")


def test_plan_is_single_shuffle_window_not_join(spark):
    """Scale shape: the physical plan must contain a window over ONE key
    exchange and NO join operator (a range/nested-loop join is the
    anti-pattern this operator exists to avoid)."""
    left = spark.createDataFrame([("k", ts(1), "e")], "k string, ts timestamp, ev string")
    right = spark.createDataFrame([("k", ts(1), 1)], "k string, ts timestamp, v int")
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Join" not in plan and "NestedLoop" not in plan
