"""Incremental projection replay: run_batch_incremental over (checkpoint
state + tail) must equal run_batch over the full log — for both the
general applyInPandas fold and the natively-merged when_agg path.

This is the 100 TB materialization contract: updating a projection costs
O(tail), never a full-history replay.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.projections.batch import run_batch, run_batch_incremental
from eventstorm_spark.projections.dsl import AggSpec, projection

from tests.fixtures import multi_stream_100x1, typed_100


def _states(df):
    return {r["partition"]: json.loads(r["state"]) for r in df.collect()}


def _general_spec():
    def handle(state, e):
        state = state or {"n": 0, "last": None}
        state["n"] += 1
        state["last"] = e.eventType
        return state
    return (projection("inc").from_all().foreach_stream()
            .when({"$any": handle}))


def _agg_spec():
    return (projection("inc-agg").from_all().foreach_stream()
            .when_agg({
                "n": AggSpec.count(),
                "i_sum": AggSpec.sum_of("i"),
                "i_min": AggSpec.min_of("i"),
                "i_max": AggSpec.max_of("i"),
                "i_first": AggSpec.first_of("i"),
                "i_last": AggSpec.last_of("i"),
            }))


@pytest.mark.parametrize("cut", [0, 37, 50, 99, 100])
def test_incremental_equals_full_general(spark, cut):
    events = typed_100(spark)
    positions = sorted(r.position for r in events.select("position").collect())
    cut_pos = positions[cut - 1] if cut > 0 else 0
    prefix = events.where(F.col("position") <= cut_pos)
    full = _states(run_batch(_general_spec(), events))
    ckpt = run_batch(_general_spec(), prefix)
    inc = _states(run_batch_incremental(_general_spec(), events, ckpt, cut_pos))
    assert inc == full


@pytest.mark.parametrize("cut", [0, 37, 100])
def test_incremental_equals_full_lowered(spark, cut):
    events = typed_100(spark)
    positions = sorted(r.position for r in events.select("position").collect())
    cut_pos = positions[cut - 1] if cut > 0 else 0
    prefix = events.where(F.col("position") <= cut_pos)
    full = _states(run_batch(_agg_spec(), events))
    ckpt = run_batch(_agg_spec(), prefix)
    inc = _states(run_batch_incremental(_agg_spec(), events, ckpt, cut_pos))
    assert inc == full


def test_incremental_new_partition_and_untouched_partition(spark):
    # 100 streams x 1 event: checkpoint after half; streams in the first
    # half must pass through unchanged, streams only in the tail must
    # fold from $init.
    events = multi_stream_100x1(spark)
    mid = 50
    prefix = events.where(F.col("position") <= mid)
    ckpt = run_batch(_general_spec(), prefix)
    inc = _states(run_batch_incremental(_general_spec(), events, ckpt, mid))
    full = _states(run_batch(_general_spec(), events))
    assert inc == full
    assert len(inc) == 100


def test_lowered_incremental_has_no_python_stage(spark):
    events = typed_100(spark)
    ckpt = run_batch(_agg_spec(), events.where(F.col("position") <= 50))
    inc = run_batch_incremental(_agg_spec(), events, ckpt, 50)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
