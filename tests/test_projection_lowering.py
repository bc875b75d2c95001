"""when_agg declarative folds and their native groupBy().agg() lowering.

The contract: a pure when_agg chain lowers to native aggregation in
run_batch; the lowered result must be indistinguishable from the general
applyInPandas fold (which is what streaming and the unit harness run),
and the lowered plan must contain no Python stage at all.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from eventstorm_spark.projections.batch import run_batch
from eventstorm_spark.projections.dsl import AggSpec, projection

from tests.fixtures import typed_100


def _spec(name="agg"):
    return (
        projection(name).from_all().foreach_stream()
        .when_agg({
            "n": AggSpec.count(),
            "i_sum": AggSpec.sum_of("i"),
            "i_min": AggSpec.min_of("i"),
            "i_max": AggSpec.max_of("i"),
            "n_type0": AggSpec.count(where_type="type-0"),
        })
    )


def _collect_states(df):
    return {
        r["partition"]: json.loads(r["state"])
        for r in df.collect()
    }


def test_lowered_equals_general_fold(spark):
    events = typed_100(spark)
    lowered = run_batch(_spec(), events)
    # identity transform_by disables lowering -> general applyInPandas path
    general = run_batch(_spec().transform_by(lambda s: s), events)
    assert _collect_states(lowered) == _collect_states(general)
    st = _collect_states(lowered)["test-stream"]
    assert st == {"n": 100, "i_sum": sum(range(100)), "i_min": 0,
                  "i_max": 99, "n_type0": 1}


def test_lowered_plan_has_no_python_stage(spark):
    events = typed_100(spark)
    plan = run_batch(_spec(), events)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan and "EvalPython" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_chained_combinator_falls_back(spark):
    events = typed_100(spark)
    spec = _spec().filter_by(lambda s: s["n"] > 0)
    assert spec.lowered_aggs is not None and len(spec.chain) == 2
    plan = run_batch(spec, events)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_when_agg_unit_fold_semantics(spark):
    """Driver-side FoldState path (the streaming/unit runtime) agrees."""
    from eventstorm_spark.projections.dsl import ProjEvent

    spec = (
        projection("u").from_all()
        .when_agg({"n": AggSpec.count(), "s": AggSpec.sum_of("v")})
    )
    fold = spec.new_state()
    for i, v in enumerate([3, None, 4]):
        body = json.dumps({"v": v} if v is not None else {})
        st = fold.update(ProjEvent(isJson=True, bodyRaw=body, eventType="t", streamId="s1"))
    assert st == {"n": 3, "s": 7}


def test_null_only_min_is_null_both_paths(spark):
    events = typed_100(spark)
    spec = (
        projection("m").from_all().foreach_stream()
        .when_agg({"missing_min": AggSpec.min_of("does_not_exist")})
    )
    lowered = _collect_states(run_batch(spec, events))
    general = _collect_states(run_batch(
        projection("m2").from_all().foreach_stream()
        .when_agg({"missing_min": AggSpec.min_of("does_not_exist")})
        .transform_by(lambda s: s), events))
    assert lowered == general == {"test-stream": {"missing_min": None}}


def test_category_selector_end_to_end(spark):
    """from_category + when_agg: selector prunes the scan, fold lowers."""
    import json as _json

    from eventstorm_spark.model import EVENT_SCHEMA
    from tests.fixtures import envelope_rows

    rows = []
    pos = 1
    for s in ["user-1", "user-2", "acct-1"]:
        rows.extend(envelope_rows(s, 5, first_position=pos))
        pos += 5
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    spec = (
        projection("cat").from_category("user").foreach_stream()
        .when_agg({"n": AggSpec.count()})
    )
    states = {r["partition"]: _json.loads(r["state"])
              for r in run_batch(spec, events).collect()}
    assert states == {"user-1": {"n": 5}, "user-2": {"n": 5}}


def test_first_last_lowered_equals_general(spark):
    events = typed_100(spark)
    spec = (projection("fl").from_all().foreach_stream()
            .when_agg({
                "first_i": AggSpec.first_of("i"),
                "last_i": AggSpec.last_of("i"),
                "first_t5": AggSpec.first_of("i", where_type="type-5"),
            }))
    lowered = _collect_states(run_batch(spec, events))
    general = _collect_states(run_batch(
        (projection("fl2").from_all().foreach_stream()
         .when_agg({
             "first_i": AggSpec.first_of("i"),
             "last_i": AggSpec.last_of("i"),
             "first_t5": AggSpec.first_of("i", where_type="type-5"),
         })).transform_by(lambda s: s), events))
    assert lowered == general
    assert len(lowered) > 0
