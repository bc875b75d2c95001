"""Event model + read/append option types (the engine's logical "IR").

Mirrors the reference's model layer (``internal/model/model.go:26-154``):
the Event envelope, per-stream revision vs global position coordinates,
ReadOptions (direction, count, stream-vs-all target, boundary kinds) and
the subscription filter expressions. The reference compiles these options
into one SQL template (``internal/backend/backend.go:97-226``); we compile
them into a DataFrame plan (see ``eventstorm_spark.log.plan``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Envelope schema — reference storage table, backend.go:39-53.
# `data` is kept as string (JSON or opaque text) rather than binary: parity
# with the reference's BYTEA that is parsed as JSON on demand
# (model.go:47-58), while staying oracle-comparable. System metadata keys
# `type`/`content-type`/`created` (streams.go:205-209) are ALSO denormalized
# to top-level columns `event_type`/`content_type`/`created` so filters push
# down to the Parquet scan (map-access would defeat pushdown — SURVEY §4).
# ---------------------------------------------------------------------------

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("uuid", T.StringType(), False),
        T.StructField("data", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("custom_metadata", T.BinaryType(), True),
        T.StructField("revision", T.LongType(), False),
        T.StructField("position", T.LongType(), False),
        # denormalized system metadata (engine extension for pushdown)
        T.StructField("event_type", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("created", T.LongType(), True),  # 100-ns ticks since epoch
    ]
)

ENVELOPE_COLUMNS = [f.name for f in EVENT_SCHEMA.fields]

# System metadata keys — streams.go:205-209.
META_TYPE = "type"
META_CONTENT_TYPE = "content-type"
META_CREATED = "created"

ALL_STREAM = "$all"


class Direction(enum.Enum):
    """Read direction — model.go:86-95."""

    FORWARDS = "forwards"
    BACKWARDS = "backwards"


class BoundaryKind(enum.Enum):
    """Where a read starts: stream revisionKind (model.go:127-139) and
    $all positionKind (model.go:141-154) collapse to the same three kinds."""

    START = "start"
    END = "end"
    AT = "at"  # explicit revision / position


class FilterKind(enum.Enum):
    """Subscription/$all filter target — model.go:109-120."""

    STREAM_ID = "stream"
    EVENT_TYPE = "event_type"


@dataclass(frozen=True)
class SubscriptionFilter:
    """Regex OR prefix-list filter, applied to stream id or event type.

    Reference: model.go:117-125 (Filter{Kind, Expr{Regex, Prefixes}}),
    compiled at backend.go:228-246. Exactly one of ``regex``/``prefixes``
    should be set.
    """

    kind: FilterKind
    regex: Optional[str] = None
    prefixes: Sequence[str] = ()

    def __post_init__(self) -> None:
        if bool(self.regex) == bool(self.prefixes):
            raise ValueError("exactly one of regex / prefixes must be provided")


@dataclass(frozen=True)
class StreamOptions:
    """Per-stream read target — model.go:127-131."""

    identifier: str
    kind: BoundaryKind = BoundaryKind.START
    revision: int = 0


@dataclass(frozen=True)
class AllOptions:
    """$all read target — model.go:141-146."""

    kind: BoundaryKind = BoundaryKind.START
    position: int = 0
    filter: Optional[SubscriptionFilter] = None


@dataclass(frozen=True)
class ReadOptions:
    """The read IR — model.go:97-107. ``count < 0`` means subscription
    (model.go:105-107); batch reads use count==0 for "no limit"."""

    direction: Direction = Direction.FORWARDS
    count: int = 0
    stream: Optional[StreamOptions] = None
    all: Optional[AllOptions] = None
    resolve_links: bool = False

    def __post_init__(self) -> None:
        if (self.stream is None) == (self.all is None):
            raise ValueError("exactly one of stream / all must be provided")

    @property
    def is_subscription(self) -> bool:
        return self.count < 0


class ExpectedRevisionKind(enum.Enum):
    """Append precondition kinds — model.go:72-84."""

    ANY = "any"
    NO_STREAM = "no_stream"
    STREAM_EXISTS = "stream_exists"
    REVISION = "revision"


@dataclass(frozen=True)
class ExpectedRevision:
    kind: ExpectedRevisionKind = ExpectedRevisionKind.ANY
    revision: int = 0

    @classmethod
    def any(cls) -> "ExpectedRevision":
        return cls(ExpectedRevisionKind.ANY)

    @classmethod
    def no_stream(cls) -> "ExpectedRevision":
        return cls(ExpectedRevisionKind.NO_STREAM)

    @classmethod
    def stream_exists(cls) -> "ExpectedRevision":
        return cls(ExpectedRevisionKind.STREAM_EXISTS)

    @classmethod
    def at(cls, revision: int) -> "ExpectedRevision":
        return cls(ExpectedRevisionKind.REVISION, revision)


@dataclass
class NewEvent:
    """An event to append — the client-supplied subset of the envelope
    (model.go:26-34 minus server-assigned revision/position/created)."""

    uuid: str
    event_type: str
    data: Optional[str] = None
    content_type: str = "application/json"
    metadata: dict = field(default_factory=dict)
    custom_metadata: Optional[bytes] = None


@dataclass(frozen=True)
class AppendResult:
    """First inserted position + last revision — streams.go:139-161."""

    stream: str
    first_position: int
    last_revision: int
    count: int
