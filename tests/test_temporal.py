"""Temporal joins: as-of (union + window fill) and range join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.extensions.temporal import as_of_join, range_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)),
         (4, "u3", _ts(30))],
        ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("u1", _ts(10), 100.0), ("u1", _ts(15), 150.0),
         ("u2", _ts(7), 70.0)],
        ["k", "ts", "v"])
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    got = {r.id: (r.asof_v, r.asof_ts) for r in
           as_of_join(left, right, on="k", right_cols=["v"]).collect()}
    assert got[1] == (100.0, _ts(10))   # inclusive: equal ts matches
    assert got[2] == (150.0, _ts(15))   # latest prior, not first
    assert got[3] == (None, None)       # right row is later -> no match
    assert got[4] == (None, None)       # key absent from right
    assert len(got) == 4                # exactly one output row per left row


def test_asof_plan_is_single_window_no_nested_loop(sides):
    left, right = sides
    plan = (as_of_join(left, right, on="k", right_cols=["v"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_multi_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(40))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("u1", _ts(0), _ts(15), "a"), ("u1", _ts(5), _ts(12), "b")],
        ["k", "lo", "hi", "tag"])
    got = sorted((r.id, r.tag) for r in
                 range_join(left, right, on="k", lower="lo", upper="hi")
                 .collect())
    assert got == [(1, "a"), (1, "b")]  # row 1 in both intervals; row 2 in none
