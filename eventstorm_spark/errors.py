"""Engine error types, mirroring the reference's error surface.

Reference: ``internal/streams/streams.go:17-23`` (ErrStreamNotExist,
ErrRevisionMismatch, validation errors) and
``internal/backend/backend.go:311-329`` (unique-violation -> ErrConflict).
"""

from __future__ import annotations


class EventStormError(Exception):
    """Base class for engine errors."""


class StreamNotFoundError(EventStormError):
    """Read of a stream with no events — streams.go:211-222."""

    def __init__(self, stream: str):
        super().__init__(f"stream does not exist: {stream!r}")
        self.stream = stream


class WrongExpectedRevisionError(EventStormError):
    """Append precondition failed — streams.go:93-115, grpc_server.go:222-250."""

    def __init__(self, stream: str, expected: str, current: int | None):
        super().__init__(
            f"wrong expected revision on {stream!r}: expected {expected}, "
            f"current {'<no stream>' if current is None else current}"
        )
        self.stream = stream
        self.expected = expected
        self.current = current


class ConflictError(EventStormError):
    """Duplicate (stream, uuid) or (stream, revision) — backend.go:311-329."""


class InvalidEventError(EventStormError):
    """Missing required metadata (`type` / `content-type`) — streams.go:191-203."""


class ProjectionExistsError(EventStormError):
    """Duplicate projection name — projection.go:29-33."""


class StreamDeletedError(EventStormError):
    """Append/read of a tombstoned (hard-deleted) stream — the error the
    reference's stubbed Tombstone RPC (grpc_server.go:275-277) would
    surface; semantics follow the EventStoreDB API the proto declares
    (streams.proto:14-16)."""

    def __init__(self, stream: str):
        super().__init__(f"stream is tombstoned: {stream!r}")
        self.stream = stream


class ProjectionEmitOverflowError(EventStormError):
    """A continuous projection produced more state updates in one
    micro-batch than ``max_updates_per_batch`` allows — the driver-side
    collect that routes updates through the single-writer append would
    otherwise grow unbounded (SCALE.md §5). Raise the cap or
    materialize to a table sink instead of a result stream."""
