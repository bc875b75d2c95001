"""eventstorm_spark — a PySpark-native event-sourcing analytics engine.

Re-implements the query and data-processing capabilities of
``ostafen/eventstorm`` (an EventStoreDB-wire-compatible event store over
PostgreSQL; see /root/reference) as an idiomatic Apache Spark engine:

- the append-only event log is a Parquet-backed table with the reference's
  envelope schema (stream, uuid, data, metadata, custom_metadata, revision,
  position) — reference: ``internal/backend/backend.go:39-53``;
- reads (per-stream and ``$all``) are declarative DataFrame plans derived
  from the reference's direction x boundary truth table
  (``internal/backend/backend.go:118-194``);
- subscriptions are Structured Streaming queries;
- projections (EventStore's JS fold DSL,
  ``internal/projections/projection.go``) are a Python fluent DSL compiled
  to per-key ordered folds via ``applyInPandas`` (batch replay) and
  ``applyInPandasWithState`` (continuous);
- beyond the reference: large-scale training-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns).

Everything is DataFrame-first: Catalyst handles pushdown, pruning,
join strategy and codegen; Python UDFs appear only where semantics require
per-group imperative folds, and then always as Arrow-batched pandas UDFs.
"""

from eventstorm_spark.session import get_spark
from eventstorm_spark.model import (
    EVENT_SCHEMA,
    Direction,
    ReadOptions,
    StreamOptions,
    AllOptions,
    ExpectedRevision,
    SubscriptionFilter,
)
from eventstorm_spark.errors import (
    ConflictError,
    EventStormError,
    InvalidEventError,
    StreamDeletedError,
    StreamNotFoundError,
    WrongExpectedRevisionError,
)
from eventstorm_spark.log.store import EventLog
from eventstorm_spark.log.normalize import normalize_events
from eventstorm_spark.model import BoundaryKind, FilterKind, NewEvent
from eventstorm_spark.projections.dsl import AggSpec, Projection, projection
from eventstorm_spark.projections.registry import ProjectionRegistry
from eventstorm_spark.projections.materialize import Materializer
from eventstorm_spark import sinks

__all__ = [
    "Materializer",
    "sinks",
    "get_spark",
    "EVENT_SCHEMA",
    "Direction",
    "BoundaryKind",
    "FilterKind",
    "NewEvent",
    "ReadOptions",
    "StreamOptions",
    "AllOptions",
    "ExpectedRevision",
    "SubscriptionFilter",
    "EventLog",
    "normalize_events",
    "AggSpec",
    "Projection",
    "projection",
    "ProjectionRegistry",
    "EventStormError",
    "ConflictError",
    "InvalidEventError",
    "StreamDeletedError",
    "StreamNotFoundError",
    "WrongExpectedRevisionError",
]

__version__ = "0.1.0"
