"""Shared golden fixtures replicating the reference test generators.

``genEvents`` (/root/reference/internal/streams/streams_test.go:109-123)
appends n typed JSON events to a stream; the scenarios in FIXTURES.md §A
build on it. These helpers build envelope DataFrames directly (positions
and revisions pre-assigned) for read-path tests, and NewEvent lists for
append-path tests.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from eventstorm_spark.model import EVENT_SCHEMA, NewEvent


def envelope_rows(stream: str, n: int, *, first_position: int = 1,
                  first_revision: int = 0, type_fn=lambda i: "event-type"):
    rows = []
    for i in range(n):
        et = type_fn(i)
        rows.append(
            (
                stream,
                f"{stream}-uuid-{i}",
                json.dumps({"i": i}),
                {"type": et, "content-type": "application/json", "created": "0"},
                None,
                first_revision + i,
                first_position + i,
                et,
                "application/json",
                0,
            )
        )
    return rows


def single_stream_100(spark: SparkSession):
    """FIXTURES.md §A.1 — stream `test-stream`, 100 events, rev 0..99,
    pos 1..100, type `event-type`."""
    return spark.createDataFrame(envelope_rows("test-stream", 100), EVENT_SCHEMA)


def multi_stream_100x1(spark: SparkSession):
    """FIXTURES.md §A.2 — 100 streams `stream-<i>`, 1 event each,
    positions 1..100, revision 0."""
    rows = []
    for i in range(100):
        rows.extend(
            envelope_rows(f"stream-{i}", 1, first_position=i + 1)
        )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def typed_100(spark: SparkSession):
    """FIXTURES.md §A.3 — one stream, types `type-0..99`."""
    return spark.createDataFrame(
        envelope_rows("test-stream", 100, type_fn=lambda i: f"type-{i}"),
        EVENT_SCHEMA,
    )


def new_events(n: int, *, event_type="event-type", prefix="uuid") -> list[NewEvent]:
    return [
        NewEvent(uuid=f"{prefix}-{i}", event_type=event_type, data=json.dumps({"i": i}))
        for i in range(n)
    ]
