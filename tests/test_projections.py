"""Projection DSL unit tests — semantics ported from
/root/reference/internal/projections/projection_test.go (driver-side fold
via FoldState.update, the analogue of Projection.Update)."""

from __future__ import annotations

import json

import pytest

from eventstorm_spark.errors import ProjectionExistsError
from eventstorm_spark.projections.dsl import ProjEvent, projection
from eventstorm_spark.projections.registry import ProjectionRegistry


def make_event(event_type="testEvent", stream="test-stream", body=None):
    return ProjEvent.from_envelope(
        stream=stream,
        event_type=event_type,
        data=json.dumps(body or {}),
        metadata={"type": event_type, "content-type": "application/json"},
        content_type="application/json",
    )


# projection_test.go:19-56 — options parsing + default result stream
def test_options_parsing():
    p = (
        projection("test")
        .options({"resultStreamName": "rs", "$includeLinks": True,
                  "reorderEvents": True, "processingLag": 500})
        .from_all()
    )
    assert p.opts.result_stream == "rs"
    assert p.opts.include_links is True
    assert p.opts.reorder_events is True
    assert p.opts.processing_lag == 500
    assert p.result_stream() == "rs"


def test_default_result_stream():
    p = projection("myproj").from_all()
    assert p.result_stream() == "$projections-myproj-result"


# projection_test.go:58-74 — selector matching
def test_selector_matching():
    p = projection("t").from_streams("a", "b")
    assert p.selector.matches("a")
    assert p.selector.matches("b")
    assert not p.selector.matches("c")
    assert projection("t2").from_all().selector.matches("anything")


# projection_test.go:76-84 — outputState flag
def test_output_state_flag():
    p = projection("t").from_all()
    assert p.output is False
    p.output_state()
    assert p.output is True


# projection_test.go:86-115 — $init lazy + typed handler fold;
# unknown type leaves state unchanged but still emits
def test_count_fold():
    def init():
        return {"count": 0}

    def on_test(state, e):
        state["count"] += 1

    p = projection("t").from_all().when({"$init": init, "testEvent": on_test})
    fold = p.new_state()
    for _ in range(100):
        out = fold.update(make_event("testEvent"))
        assert out is not None
    assert fold.default_state == {"count": 100}

    out = fold.update(make_event("otherEvent"))
    assert out == {"count": 100}  # unchanged, still emitted


# projection_test.go:117-143 — transformBy maps (and stores) the state
def test_transform_by():
    p = (
        projection("t").from_all()
        .when({"$init": lambda: {"count": 0},
               "testEvent": lambda s, e: s.__setitem__("count", s["count"] + 1)})
        .transform_by(lambda s: {**s, "extraField": "extra-field"})
    )
    fold = p.new_state()
    out = None
    for _ in range(100):
        out = fold.update(make_event("testEvent"))
    assert out == {"count": 100, "extraField": "extra-field"}


# projection_test.go:145-181 — filterBy gates emission; state advances
def test_filter_by_suppression():
    p = (
        projection("t").from_all()
        .when({"$init": lambda: {"count": 0},
               "testEvent": lambda s, e: s.__setitem__("count", s["count"] + 1)})
        .filter_by(lambda s: s["count"] > 50)
    )
    fold = p.new_state()
    outs = [fold.update(make_event("testEvent")) for _ in range(100)]
    assert all(o is None for o in outs[:50])
    assert all(o is not None for o in outs[50:])
    assert fold.default_state == {"count": 100}


# projection_test.go:183-216 — partitionBy independent states + event.partition
def test_partition_by():
    def handler(state, e):
        state["count"] += 1
        state["partition"] = e.partition

    p = (
        projection("t").from_all()
        .partition_by(lambda e: e.eventType)
        .when({"$init": lambda: {"count": 0, "partition": None}, "$any": handler})
    )
    fold = p.new_state()
    for i in range(100):
        fold.update(make_event(f"p-{i // 10}"))
    assert len(fold.partitions) == 10
    for k, st in fold.partitions.items():
        assert st == {"count": 10, "partition": k}


# projection_test.go:218-251 — typed handler beats $any
def test_any_vs_specific_precedence():
    def on_any(state, e):
        state["any"] += 1

    def on_test(state, e):
        state["typed"] += 1

    p = projection("t").from_all().when(
        {"$init": lambda: {"any": 0, "typed": 0}, "$any": on_any, "testEvent": on_test}
    )
    fold = p.new_state()
    for _ in range(5):
        fold.update(make_event("testEvent"))
    for _ in range(3):
        fold.update(make_event("somethingElse"))
    assert fold.default_state == {"any": 3, "typed": 5}


def test_foreach_stream_partitions_by_stream():
    p = (
        projection("t").from_all().foreach_stream()
        .when({"$init": lambda: {"count": 0},
               "$any": lambda s, e: s.__setitem__("count", s["count"] + 1)})
    )
    fold = p.new_state()
    for i in range(10):
        fold.update(make_event("x", stream=f"s-{i % 2}"))
    assert fold.partitions["s-0"] == {"count": 5}
    assert fold.partitions["s-1"] == {"count": 5}


# projection.go:29-33 — duplicate registration error
def test_registry_duplicate():
    reg = ProjectionRegistry()
    reg.register(projection("p1").from_all())
    with pytest.raises(ProjectionExistsError):
        reg.register(projection("p1").from_all())


def test_from_category_selector():
    from eventstorm_spark.projections.dsl import projection

    spec = projection("c").from_category("user")
    assert spec.selector.matches("user-1")
    assert spec.selector.matches("user-22")
    assert not spec.selector.matches("users-1")
    assert not spec.selector.matches("account-1")


def test_from_streams_matching_selector():
    from eventstorm_spark.projections.dsl import projection

    spec = projection("m").from_streams_matching("^(user|order)-[0-9]$")
    assert spec.selector.matches("user-1")
    assert spec.selector.matches("order-9")
    assert not spec.selector.matches("user-10")
