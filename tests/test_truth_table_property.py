"""Property-based check of the read-plan truth table (SURVEY §3.1).

Hypothesis generates arbitrary ReadOptions (direction x boundary x
revision/position x count x filter); `compile_read` runs on Spark and
its SQL twin `compile_read_sql` on DuckDB over the same rows. The ordered
row sequences must agree exactly — this sweeps the whole option lattice
instead of the handful of golden combos ported from streams_test.go
(the reference has no property tests at all; SURVEY §5).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eventstorm_spark.log.plan import compile_read, compile_read_sql
from eventstorm_spark.model import (
    AllOptions,
    BoundaryKind,
    Direction,
    FilterKind,
    ReadOptions,
    StreamOptions,
    SubscriptionFilter,
)

from tests.fixtures import envelope_rows
from eventstorm_spark.model import EVENT_SCHEMA

_COMPARE = ["stream", "uuid", "revision", "position", "event_type"]


@pytest.fixture(scope="module")
def fixture(spark):
    # three streams interleaved in the global order, typed round-robin
    rows = []
    pos = 1
    for i in range(120):
        s = f"stream-{i % 3}"
        rows.extend(envelope_rows(
            s, 1, first_position=pos, first_revision=i // 3,
            type_fn=lambda _i, i=i: f"type-{i % 7}"))
        pos += 1
    sdf = spark.createDataFrame(rows, EVENT_SCHEMA).cache()
    pdf = sdf.select(*_COMPARE).toPandas()
    con = duckdb.connect()
    con.register("es_events", pdf)
    return sdf, con


_filters = st.one_of(
    st.none(),
    st.builds(
        SubscriptionFilter,
        kind=st.sampled_from([FilterKind.STREAM_ID, FilterKind.EVENT_TYPE]),
        regex=st.sampled_from(["^(type-1|type-2)$", "type-[03]", "^stream-1$"]),
    ),
    st.builds(
        SubscriptionFilter,
        kind=st.sampled_from([FilterKind.STREAM_ID, FilterKind.EVENT_TYPE]),
        prefixes=st.lists(
            st.sampled_from(["stream-1", "stream-2", "type-1", "type-3"]),
            min_size=1, max_size=3, unique=True),
    ),
)

_options = st.one_of(
    # stream target
    st.builds(
        lambda d, k, rev, cnt: ReadOptions(
            direction=d, count=cnt,
            stream=StreamOptions(f"stream-{rev % 4}", k, rev)),
        st.sampled_from(list(Direction)),
        st.sampled_from(list(BoundaryKind)),
        st.integers(min_value=0, max_value=45),
        st.integers(min_value=0, max_value=20),
    ),
    # $all target
    st.builds(
        lambda d, k, posn, cnt, flt: ReadOptions(
            direction=d, count=cnt, all=AllOptions(k, posn, flt)),
        st.sampled_from(list(Direction)),
        st.sampled_from(list(BoundaryKind)),
        st.integers(min_value=0, max_value=130),
        st.integers(min_value=0, max_value=20),
        _filters,
    ),
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(opts=_options)
def test_compile_read_matches_sql_twin(fixture, opts):
    sdf, con = fixture
    got = [tuple(r) for r in compile_read(sdf, opts).select(*_COMPARE).collect()]
    want = con.execute(
        compile_read_sql(opts).replace("SELECT *", f"SELECT {', '.join(_COMPARE)}")
    ).fetchall()
    assert got == want, f"opts={opts}"
