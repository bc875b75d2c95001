"""Property sweep of when_agg lowering: for random event sets and agg
specs, the native groupBy().agg() lowering, the general applyInPandas
fold, AND the incremental merge must all agree — including negative
values, missing fields, sparse types, and empty tails."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from eventstorm_spark.model import EVENT_SCHEMA
from eventstorm_spark.projections.batch import run_batch, run_batch_incremental
from eventstorm_spark.projections.dsl import AggSpec, projection
from tests.fixtures import envelope_rows

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from eventstorm_spark.session import get_spark
        _spark = get_spark("lowering_property")
    return _spark


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # stream idx
        st.integers(min_value=0, max_value=2),          # type idx
        st.one_of(st.none(),                            # body value (None = absent)
                  st.integers(min_value=-1000, max_value=1000)),
    ),
    min_size=0, max_size=25,
)

kinds = st.sampled_from(["count", "sum", "min", "max", "first", "last"])


def _mk_events(spark, rows):
    data = []
    pos = 0
    revs = {}
    for s_idx, t_idx, val in rows:
        stream = f"s-{s_idx}"
        pos += 1
        revs[stream] = revs.get(stream, -1) + 1
        body = "{}" if val is None else json.dumps({"v": val})
        data.append((stream, f"u-{pos}", body, {"type": f"t-{t_idx}"}, None,
                     revs[stream], pos, f"t-{t_idx}", "application/json",
                     pos * 10))
    return spark.createDataFrame(data, EVENT_SCHEMA)


def _spec(name, kind, where_type):
    if kind == "count":
        agg = AggSpec.count(where_type=where_type)
    else:
        agg = AggSpec(kind, "v", where_type, "long")
    return (projection(name).from_all().foreach_stream()
            .when_agg({"x": agg}))


def _states(df):
    return {r["partition"]: json.loads(r["state"]) for r in df.collect()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=events_strategy, kind=kinds,
       wt=st.sampled_from([None, "t-0", "t-9"]),
       cut_frac=st.sampled_from([0.0, 0.5, 1.0]))
def test_lowered_general_and_incremental_agree(rows, kind, wt, cut_frac):
    spark = _get_spark()
    events = _mk_events(spark, rows)
    lowered = _states(run_batch(_spec("a", kind, wt), events))
    general = _states(run_batch(
        _spec("b", kind, wt).transform_by(lambda s: s), events))
    assert lowered == general
    cut = int(len(rows) * cut_frac)
    ckpt = run_batch(_spec("c", kind, wt),
                     events.where(F.col("position") <= cut))
    inc = _states(run_batch_incremental(
        _spec("d", kind, wt), events, ckpt, cut))
    assert inc == lowered
