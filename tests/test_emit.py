"""emit()/linkTo() — EventStore's handler emit surface (absent from the
reference: its goja VM binds only options/fromAll/fromStream/fromStreams/log,
/root/reference/internal/projections/projection.go:435-450). Semantics
follow EventStoreDB: emit(stream, type, body) appends a JSON event;
linkTo(stream, event) appends a `$>` link whose body is
`revision@stream`; both require the emitEnabled creation flag."""

from __future__ import annotations

import json

import pytest

from eventstorm_spark.projections.batch import run_batch, run_batch_emitted, write_emitted
from eventstorm_spark.projections.dsl import ProjEvent, emit, link_to, projection

from tests.fixtures import envelope_rows, new_events
from eventstorm_spark.model import EVENT_SCHEMA


def make_event(event_type, stream="s", body=None, revision=0):
    return ProjEvent.from_envelope(
        stream=stream, event_type=event_type,
        data=json.dumps(body or {}),
        metadata={"type": event_type, "content-type": "application/json"},
        content_type="application/json", revision=revision,
    )


def test_emit_collects_in_fold_order():
    spec = (
        projection("p").from_all().enable_emit()
        .when({"$init": lambda: {"n": 0},
               "a": lambda st, e: emit("out", "copied", {"i": (e.body or {}).get("i")}),
               "$any": lambda st, e: None})
    )
    fold = spec.new_state()
    fold.update(make_event("a", body={"i": 1}))
    fold.update(make_event("b", body={"i": 2}))
    fold.update(make_event("a", body={"i": 3}))
    assert [em.stream for em in fold.emitted] == ["out", "out"]
    assert [json.loads(em.data)["i"] for em in fold.emitted] == [1, 3]
    assert fold.emitted[0].event_type == "copied"
    assert fold.emitted[0].content_type == "application/json"


def test_link_to_body_format():
    spec = (
        projection("p").from_all().enable_emit()
        .when({"$any": lambda st, e: link_to("$idx", e)})
    )
    fold = spec.new_state()
    fold.update(make_event("a", stream="orders-1", revision=7))
    (em,) = fold.emitted
    assert em.stream == "$idx"
    assert em.event_type == "$>"
    assert em.data == "7@orders-1"
    assert em.content_type == "application/octet-stream"


def test_emit_requires_enable_emit():
    spec = (
        projection("p").from_all()
        .when({"$any": lambda st, e: emit("out", "t", {})})
    )
    fold = spec.new_state()
    with pytest.raises(RuntimeError, match="emit"):
        fold.update(make_event("a"))


def test_link_to_requires_revision():
    spec = (
        projection("p").from_all().enable_emit()
        .when({"$any": lambda st, e: link_to("$idx", e)})
    )
    e = make_event("a")
    e.sequenceNumber = -1
    with pytest.raises(RuntimeError, match="revision"):
        spec.new_state().update(e)


def test_run_batch_emitted_matches_driver_fold(spark):
    # 3 streams x 10 events; link every event with even body-i into $even
    rows = []
    for s in range(3):
        rows.extend(envelope_rows(f"st-{s}", 10, first_position=1 + 10 * s))
    df = spark.createDataFrame(rows, EVENT_SCHEMA)

    def handler(st, e):
        if (e.body or {}).get("i", 0) % 2 == 0:
            link_to("$even", e, {"src": e.streamId})

    def make_spec():
        return (projection("evens").from_all().foreach_stream().enable_emit()
                .when({"$any": handler}))

    out = run_batch_emitted(make_spec(), df).orderBy("source_position").collect()
    assert len(out) == 15  # 5 even per stream x 3
    assert all(r["event_type"] == "$>" for r in out)
    assert out[0]["data"] == "0@st-0"
    assert out[0]["metadata"]["src"] == "st-0"
    # source positions strictly increasing => deterministic global order
    pos = [r["source_position"] for r in out]
    assert pos == sorted(pos)

    # driver-side fold (FoldState) agrees event-for-event within a stream
    fold = make_spec().new_state()
    for r in sorted(rows, key=lambda t: t[6]):  # by position
        fold.update(ProjEvent.from_envelope(
            stream=r[0], event_type=r[7], data=r[2], metadata=r[3],
            content_type=r[8], revision=r[5]))
    assert sorted(em.data for em in fold.emitted) == sorted(r["data"] for r in out)


def test_run_batch_emitted_requires_flag(spark):
    df = spark.createDataFrame(envelope_rows("s", 3), EVENT_SCHEMA)
    spec = projection("p").from_all().when({"$any": lambda st, e: None})
    with pytest.raises(RuntimeError, match="emit-enabled"):
        run_batch_emitted(spec, df)


def test_write_emitted_appends_and_resolves(spark, tmp_path):
    from eventstorm_spark.log.store import EventLog

    log = EventLog(spark, str(tmp_path / "log"))
    log.append("orders-1", new_events(5, prefix="o1"))
    spec = (
        projection("idx").from_all().enable_emit()
        .when({"$any": lambda st, e: link_to("$by-order", e)})
    )
    n = write_emitted(spec, run_batch_emitted(spec, log.df()), log)
    assert n == 5
    links = log.read_stream("$by-order").orderBy("revision").collect()
    assert [r["data"] for r in links] == [f"{i}@orders-1" for i in range(5)]
    resolved = EventLog.resolve_links(
        log.read_stream("$by-order"), log.df()
    ).orderBy("revision").collect()
    assert [json.loads(r["data"])["i"] for r in resolved] == [0, 1, 2, 3, 4]


def test_state_fold_ignores_but_permits_emit(spark):
    # run_batch (state mode) must not fail when handlers emit
    df = spark.createDataFrame(envelope_rows("s", 4), EVENT_SCHEMA)

    def handler(st, e):
        st["n"] += 1
        emit("out", "t", {"n": st["n"]})

    spec = (projection("p").from_all().enable_emit()
            .when({"$init": lambda: {"n": 0}, "$any": handler}))
    (row,) = run_batch(spec, df).collect()
    assert json.loads(row["state"]) == {"n": 4}
