"""Projection DSL — EventStore's stateful-fold query language, in Python.

The reference compiles a JavaScript source in a goja VM with host bindings
``options/fromAll/fromStream/fromStreams/log``
(``internal/projections/projection.go:426-450``); the fluent combinators
build one chained ``ProjectionFunc(state, event) -> (state, forward)``
(``projection.go:82-92``). We keep the exact combinator algebra and fold
semantics but take Python callables where EventStore takes JS — an
intentional idiom swap (SURVEY §7.4 risk 3); the parity target is the
semantics pinned by ``projection_test.go``:

- ``when({...})``: lazily ``$init`` state on first event; a typed handler
  takes precedence over ``$any``; no matching handler leaves state
  untouched but still forwards (projection.go:164-196);
- handlers mutate state in place (JS object semantics — dicts here);
- ``transformBy``: replaces state with f(state), stored AND forwarded
  (projection.go:209-221);
- ``filterBy``: boolean on state; false suppresses emission, state still
  advances (projection.go:234-246);
- ``partitionBy`` / ``foreachStream``: independent state per key; the key
  is visible to handlers as ``event.partition`` (projection.go:263-290,
  386-414).

A Projection object is a pure *spec* (picklable, cloudpickle-safe): the
fold state lives in the executor during batch replay
(``projections.batch``) or in the Spark state store during streaming
(``projections.streaming``). ``Projection.update`` runs the fold
driver-side for unit tests — the literal analogue of
``Projection.Update`` (projection.go:399-414).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

INIT_FUNC = "$init"
ANY_HANDLER = "$any"

# EventStoreDB's link-event type (`$>`; body `revision@stream`). Mirrors
# log.store.LINK_EVENT — duplicated here so the DSL module has no Spark
# imports and stays cloudpickle-light for executor shipping.
LINK_EVENT = "$>"


@dataclass(frozen=True)
class EmittedEvent:
    """One event produced by ``emit()``/``linkTo()`` inside a handler."""

    stream: str
    event_type: str
    data: str
    metadata: tuple  # sorted (k, v) pairs — hashable/picklable
    content_type: str

    def metadata_dict(self) -> dict:
        return dict(self.metadata)


# Collector stack for emit()/linkTo(). EventStore exposes emit/linkTo as
# globals in the projection VM (absent from the reference — goja binds only
# options/fromAll/fromStream/fromStreams/log, projection.go:435-450); the
# Python analogue is module-level functions that append to the collector
# the fold pushes around each handler invocation. Spark Python workers are
# single-threaded per process, so a plain list-of-lists is safe; the stack
# shape keeps nested driver-side folds (unit tests) correct.
_EMIT_STACK: list = []


def emit(stream_id: str, event_type: str, body: Any, metadata: Optional[dict] = None) -> None:
    """EventStore's ``emit(streamId, eventType, eventBody, metadata)``:
    append a new JSON event to an arbitrary stream from inside a handler.
    Only legal in a projection that called ``enable_emit()`` (EventStore's
    ``emitEnabled`` creation flag)."""
    if not _EMIT_STACK:
        raise RuntimeError(
            "emit() called outside a handler of an emit-enabled projection; "
            "call .enable_emit() on the projection spec")
    data = body if isinstance(body, str) else json.dumps(body, sort_keys=True)
    _EMIT_STACK[-1].append(EmittedEvent(
        stream=stream_id, event_type=event_type, data=data,
        metadata=tuple(sorted((metadata or {}).items())),
        content_type="application/json"))


def link_to(stream_id: str, event: "ProjEvent", metadata: Optional[dict] = None) -> None:
    """EventStore's ``linkTo(streamId, event, metadata)``: append a ``$>``
    link event whose body points at the handled event
    (``revision@stream``, resolvable by ``EventLog.resolve_links``)."""
    if not _EMIT_STACK:
        raise RuntimeError(
            "linkTo() called outside a handler of an emit-enabled projection; "
            "call .enable_emit() on the projection spec")
    if event.sequenceNumber < 0:
        raise RuntimeError("linkTo() target has no revision (sequenceNumber < 0)")
    _EMIT_STACK[-1].append(EmittedEvent(
        stream=stream_id, event_type=LINK_EVENT,
        data=f"{event.sequenceNumber}@{event.streamId}",
        metadata=tuple(sorted((metadata or {}).items())),
        content_type="application/octet-stream"))


@dataclass(frozen=True)
class AggSpec:
    """One declarative state field for ``when_agg``: an aggregate over the
    selected events, optionally restricted to one event type.

    kind: 'count' | 'sum' | 'min' | 'max'; ``field`` is a JSON body path
    (without the leading ``$.``) for sum/min/max. Declarative handlers
    describe the fold well enough for the batch engine to LOWER it to a
    native ``groupBy().agg()`` (map-side partial aggregation, no Python
    in the hot path) while staying runnable as an ordinary per-event fold
    everywhere else (streaming state, unit harness).
    """

    kind: str
    field: Optional[str] = None
    where_type: Optional[str] = None
    cast: str = "long"  # SQL cast for the JSON-extracted field

    @classmethod
    def count(cls, *, where_type: Optional[str] = None) -> "AggSpec":
        return cls("count", None, where_type)

    @classmethod
    def sum_of(cls, field: str, *, where_type: Optional[str] = None,
               cast: str = "long") -> "AggSpec":
        return cls("sum", field, where_type, cast)

    @classmethod
    def min_of(cls, field: str, *, where_type: Optional[str] = None,
               cast: str = "long") -> "AggSpec":
        return cls("min", field, where_type, cast)

    @classmethod
    def max_of(cls, field: str, *, where_type: Optional[str] = None,
               cast: str = "long") -> "AggSpec":
        return cls("max", field, where_type, cast)

    @classmethod
    def first_of(cls, field: str, *, where_type: Optional[str] = None,
                 cast: str = "long") -> "AggSpec":
        """Value at the FIRST matching event (position order); lowers to
        ``min_by(value, position)``."""
        return cls("first", field, where_type, cast)

    @classmethod
    def last_of(cls, field: str, *, where_type: Optional[str] = None,
                cast: str = "long") -> "AggSpec":
        """Value at the LAST matching event (position order); lowers to
        ``max_by(value, position)``."""
        return cls("last", field, where_type, cast)

    def _body_value(self, body):
        """Walk the JSON-path field (dots = nesting) — the lowering
        extracts ``$.a.b`` with get_json_object, so a flat
        ``body.get("a.b")`` would silently read None for nested
        specs."""
        v = body
        for part in self.field.split("."):
            if not isinstance(v, dict):
                return None
            v = v.get(part)
            if v is None:
                return None
        return v

    def _coerce(self, v):
        """Mirror of the lowering's ``cast('double').cast(cast)``: a
        non-numeric value becomes null and is SKIPPED (never a crash),
        "5.5" under a long cast truncates to 5, and large ints pass
        through double exactly like the lowered path — same projection,
        same answer, either engine."""
        if isinstance(v, bool):
            return None  # lowered: "true" -> cast double -> null
        try:
            d = float(v)
        except (TypeError, ValueError):
            return None
        if self.cast in ("long", "int", "bigint"):
            return int(d)
        return d

    def update(self, acc, e: "ProjEvent"):
        """The per-event fold semantics of this aggregate (the non-lowered
        path; must agree exactly with the native lowering in batch.py)."""
        if self.where_type is not None and e.eventType != self.where_type:
            return acc
        if self.kind == "count":
            return (acc or 0) + 1
        body = e.body or {}
        v = self._body_value(body)
        if v is None:
            return acc
        v = self._coerce(v)
        if v is None:
            return acc
        if self.kind == "sum":
            return (acc or 0) + v
        if self.kind == "min":
            return v if acc is None else min(acc, v)
        if self.kind == "max":
            return v if acc is None else max(acc, v)
        if self.kind == "first":
            return acc if acc is not None else v
        if self.kind == "last":
            return v
        raise ValueError(f"unknown agg kind: {self.kind}")


@dataclass
class ProjectionOptions:
    """options({...}) — projection.go:48-53."""

    result_stream: str = ""
    include_links: bool = False
    reorder_events: bool = False
    processing_lag: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "ProjectionOptions":
        return cls(
            result_stream=d.get("resultStreamName", ""),
            include_links=bool(d.get("$includeLinks", False)),
            reorder_events=bool(d.get("reorderEvents", False)),
            processing_lag=int(d.get("processingLag", 0)),
        )


class ProjEvent:
    """The event envelope handed to handlers — projection.go:55-80.

    Field names mirror the reference's JSON-tag names so handler bodies
    read the same as their JS counterparts (``event.body``,
    ``event.eventType``, ``event.partition`` ...). ``data`` and
    ``sequenceNumber`` are unfinished in the reference (nil / -1,
    projection.go:71-74); ``data`` keeps that default, but
    ``sequenceNumber`` carries the per-stream revision when the envelope
    provides one (EventStoreDB's actual semantics — ``linkTo`` needs it).

    ``body`` is parsed lazily from ``bodyRaw`` on first access — folds
    that never read the JSON body (counters, routers) skip the per-event
    ``json.loads`` entirely, which matters in tight applyInPandas loops.
    """

    __slots__ = ("isJson", "data", "_body", "_body_parsed", "bodyRaw",
                 "sequenceNumber", "metadataRaw", "linkMetadataRaw",
                 "partition", "eventType", "streamId")

    def __init__(self, isJson: bool = False, data: Optional[dict] = None,
                 body: Optional[dict] = None, bodyRaw: str = "",
                 sequenceNumber: int = -1, metadataRaw: Optional[dict] = None,
                 linkMetadataRaw: str = "", partition: str = "",
                 eventType: str = "", streamId: str = ""):
        self.isJson = isJson
        self.data = data
        self._body = body
        self._body_parsed = body is not None
        self.bodyRaw = bodyRaw
        self.sequenceNumber = sequenceNumber
        self.metadataRaw = metadataRaw if metadataRaw is not None else {}
        self.linkMetadataRaw = linkMetadataRaw
        self.partition = partition
        self.eventType = eventType
        self.streamId = streamId

    @property
    def body(self) -> Optional[dict]:
        if not self._body_parsed:
            self._body_parsed = True
            if self.isJson and self.bodyRaw:
                try:
                    self._body = json.loads(self.bodyRaw)
                except (ValueError, TypeError):
                    self._body = None
        return self._body

    @body.setter
    def body(self, value: Optional[dict]) -> None:
        self._body = value
        self._body_parsed = True

    @classmethod
    def from_envelope(cls, *, stream: str, event_type: str, data: Optional[str],
                      metadata: Optional[dict], content_type: Optional[str],
                      revision: Optional[int] = None) -> "ProjEvent":
        is_json = (content_type or (metadata or {}).get("content-type")) == "application/json"
        return cls(
            isJson=is_json,
            bodyRaw=data or "",
            sequenceNumber=-1 if revision is None else int(revision),
            metadataRaw=metadata if isinstance(metadata, dict) else {},
            eventType=event_type or "",
            streamId=stream,
        )


# A chain step: (state, event) -> (state, forward) — projection.go:82.
ChainFunc = Callable[[Any, ProjEvent], tuple]


@dataclass(frozen=True)
class Selector:
    """fromStream/fromStreams/fromAll — projection.go:96-119 — plus the
    EventStore selectors the reference only stubs (`fromStreamsMatching`
    is a result type with no binding, projection.go:305-307, and
    `fromCategory` is absent): a category selects streams named
    ``<category>-...``, a pattern is an unanchored regex over stream ids."""

    streams: Optional[tuple] = None  # None => $all
    category: Optional[str] = None
    pattern: Optional[str] = None

    def matches(self, stream: str) -> bool:
        import re

        if self.streams is not None:
            return stream in self.streams
        if self.category is not None:
            return stream.startswith(self.category + "-")
        if self.pattern is not None:
            return re.search(self.pattern, stream) is not None
        return True


class Projection:
    """Fluent projection spec. All combinators return self (the reference's
    result-struct choreography only constrains call order; we keep it
    unconstrained like EventStore's actual JS API)."""

    def __init__(self, name: str):
        self.name = name
        self.opts = ProjectionOptions()
        self.selector: Selector = Selector(None)
        self.partition_fn: Optional[Callable[[ProjEvent], str]] = None
        self.partition_column: Optional[str] = None  # fast-path key expr (SQL string)
        self.chain: list[ChainFunc] = []
        self.output = False
        self.emit_enabled = False
        # declarative when_agg spec — set => batch replay may lower the
        # fold to a native groupBy().agg() (map-side combine, no Python)
        self.lowered_aggs: Optional[dict[str, AggSpec]] = None

    # -- source selectors (projection.go:337-361) -------------------------

    def options(self, opts: dict) -> "Projection":
        self.opts = ProjectionOptions.from_dict(opts)
        return self

    def from_all(self) -> "Projection":
        self.selector = Selector(None)
        return self

    def from_stream(self, stream: str) -> "Projection":
        return self.from_streams(stream)

    def from_streams(self, *streams: str) -> "Projection":
        self.selector = Selector(tuple(streams))
        return self

    def from_category(self, category: str) -> "Projection":
        """EventStore ``fromCategory`` (absent in the reference): all
        streams named ``<category>-...`` — the `$by_category` convention."""
        self.selector = Selector(category=category)
        return self

    def from_streams_matching(self, pattern: str) -> "Projection":
        """EventStore ``fromStreamsMatching`` (type stub only in the
        reference, projection.go:305-307): unanchored regex over stream
        ids, same dialect as the F4 read filter."""
        self.selector = Selector(pattern=pattern)
        return self

    # -- partitioning (projection.go:263-290) -----------------------------

    def partition_by(self, fn: Callable[[ProjEvent], str], *,
                     column: Optional[str] = None) -> "Projection":
        """``column`` (a SQL expression over the envelope) is an optional
        JVM-side fast path for the shuffle key; it MUST agree with ``fn``.
        Without it, batch replay computes the key by applying ``fn``
        row-wise inside an Arrow batch (slow path)."""
        self.partition_fn = fn
        self.partition_column = column
        return self

    def foreach_stream(self) -> "Projection":
        self.partition_fn = lambda e: e.streamId
        self.partition_column = "stream"
        return self

    @property
    def is_partitioned(self) -> bool:
        return self.partition_fn is not None

    # -- fold combinators --------------------------------------------------

    def when(self, handlers: dict) -> "Projection":
        """projection.go:176-196. Handlers mutate state in place; ``$init``
        runs lazily when state is None; typed handler beats ``$any``."""
        handlers = dict(handlers)

        def step(state: Any, e: ProjEvent):
            if state is None:
                init = handlers.get(INIT_FUNC)
                state = init() if init is not None else None
            h = handlers.get(e.eventType) or handlers.get(ANY_HANDLER)
            if h is not None:
                h(state, e)
            return state, True

        self.chain.append(step)
        return self

    def when_agg(self, aggs: dict) -> "Projection":
        """Declarative ``when``: state = named aggregates (AggSpec) over
        the selected events.

        Runs as an ordinary per-event fold (same chain contract as
        ``when``), but because the handler semantics are declared rather
        than opaque Python, batch replay lowers it to a native
        ``groupBy().agg()`` — partial aggregation map-side, one shuffle
        of pre-combined rows instead of every event crossing the wire
        into an applyInPandas sort+loop. Any combinator chained AFTER
        this (transform_by/filter_by) disables the lowering; batch falls
        back to the general fold.
        """
        aggs = dict(aggs)

        def step(state: Any, e: ProjEvent):
            if state is None:
                state = {k: (0 if a.kind in ("count", "sum") else None)
                         for k, a in aggs.items()}
            for k, a in aggs.items():
                state[k] = a.update(state[k], e)
            return state, True

        if not self.chain:
            self.lowered_aggs = aggs
        self.chain.append(step)
        return self

    def transform_by(self, fn: Callable[[Any], Any]) -> "Projection":
        """projection.go:209-221 — the transformed state is stored."""
        self.chain.append(lambda state, e: (fn(state), True))
        return self

    def filter_by(self, fn: Callable[[Any], bool]) -> "Projection":
        """projection.go:234-246 — false suppresses emission only."""
        self.chain.append(lambda state, e: (state, bool(fn(state))))
        return self

    def output_state(self) -> "Projection":
        """projection.go:320-328."""
        self.output = True
        return self

    def enable_emit(self) -> "Projection":
        """EventStore's ``emitEnabled`` creation flag: permits handlers to
        call ``emit()``/``link_to()``. Off by default — a handler calling
        them without this flag raises, matching EventStoreDB's faulted-
        projection behavior."""
        self.emit_enabled = True
        return self

    def output_to(self, stream: str) -> "Projection":
        """No-op in the reference (projection.go:334-335) — kept for parity."""
        return self

    def result_stream(self) -> str:
        """projection.go:136-141."""
        return self.opts.result_stream or f"$projections-{self.name}-result"

    # -- the fold ----------------------------------------------------------

    def run_chain(self, state: Any, e: ProjEvent) -> tuple:
        """Chained ProjectionFunc — projection.go:84-92."""
        forward = True
        for step in self.chain:
            state, forward = step(state, e)
            if not forward:
                return state, False
        return state, forward

    def run_chain_collect(self, state: Any, e: ProjEvent) -> tuple:
        """``run_chain`` plus the events the handlers emitted — the fold
        loops use this so ``emit()``/``link_to()`` calls are captured per
        input event (and stay illegal outside emit-enabled projections)."""
        if not self.emit_enabled:
            state, forward = self.run_chain(state, e)
            return state, forward, []
        _EMIT_STACK.append([])
        try:
            state, forward = self.run_chain(state, e)
        finally:
            emitted = _EMIT_STACK.pop()
        return state, forward, emitted

    # Driver-side single-fold runtime for unit tests (Update,
    # projection.go:399-414). Distributed execution keeps state
    # executor-side instead (batch.py / streaming.py).

    def new_state(self) -> "FoldState":
        return FoldState(self)

    def update(self, e: ProjEvent, fold: "FoldState") -> Any:
        return fold.update(e)


class FoldState:
    """Mutable fold state for one projection instance — the runtime half
    of the reference Projection struct (defaultState / partitionsState,
    projection.go:124-125)."""

    def __init__(self, spec: Projection):
        self.spec = spec
        self.default_state: Any = None
        self.partitions: dict[str, Any] = {}
        self.emitted: list[EmittedEvent] = []  # emit()/linkTo() output, in fold order

    def set_state(self, state: Any) -> None:
        self.default_state = state

    def set_partition_state(self, partition: str, state: Any) -> None:
        self.partitions[partition] = state

    def update(self, e: ProjEvent) -> Any:
        """projection.go:399-414: route to partition state, run chain,
        store, return state-or-None."""
        spec = self.spec
        if spec.is_partitioned:
            partition = spec.partition_fn(e)
            state = self.partitions.get(partition)
        else:
            partition, state = "", self.default_state
        e.partition = partition
        new_state, forward, emitted = spec.run_chain_collect(state, e)
        self.emitted.extend(emitted)
        if spec.is_partitioned:
            self.partitions[partition] = new_state
        else:
            self.default_state = new_state
        return new_state if forward else None


def projection(name: str) -> Projection:
    """Entry point: ``projection('p').from_stream('s').when({...})``."""
    return Projection(name)
