"""EventLog — the append-only event table + its read/append protocol.

The storage equivalent of the reference's single Postgres ``events`` table
(``internal/backend/backend.go:37-61``): a Parquet-backed directory with
the envelope schema. The protocol invariants the reference gets from
Postgres (BIGSERIAL positions, UNIQUE(stream, revision),
PRIMARY KEY(stream, uuid), transactional multi-event append with an
expected-revision guard — ``internal/streams/streams.go:93-189``) are
re-established here as a *single-writer commit discipline*:

- appends are serialized through a per-log lock; position is assigned as
  ``tail + row_number-within-batch`` so the global log stays gapless and
  monotonic without any global recomputation;
- per-stream head revisions are memoized in a read-through cache
  (streams.go:61-91) whose source of truth is always the table;
- the expected-revision CAS (streams.go:93-115) and event validation
  (streams.go:191-203) run before anything is written, so a failed append
  writes nothing (the reference's tx-rollback equivalent).

Scale story: one Parquet append per commit is exactly the Delta-Lake
commit pattern minus the transaction log; on a cluster this class fronts a
Delta table, the lock becomes the Delta optimistic-commit conflict check,
and readers prune on (stream, position) file statistics. Reads are pure
DataFrame plans (see ``plan.compile_read``) — nothing here ever collects
the log to the driver.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstorm_spark.errors import (
    ConflictError,
    InvalidEventError,
    StreamNotFoundError,
    WrongExpectedRevisionError,
)
from eventstorm_spark.log.plan import compile_read
from eventstorm_spark.model import (
    ALL_STREAM,
    AllOptions,
    AppendResult,
    BoundaryKind,
    Direction,
    EVENT_SCHEMA,
    ExpectedRevision,
    ExpectedRevisionKind,
    META_CONTENT_TYPE,
    META_CREATED,
    META_TYPE,
    NewEvent,
    ReadOptions,
    StreamOptions,
    SubscriptionFilter,
)


def _now_ticks() -> int:
    """100-ns ticks since epoch — streams.go:151 (UnixNano()/100)."""
    return time.time_ns() // 100


class EventLog:
    """A named event log over a Parquet directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._lock = threading.Lock()
        self._tail_position: Optional[int] = None  # lazily discovered
        self._revisions: dict[str, int] = {}  # stream -> head revision cache

    # -- table access -----------------------------------------------------

    def df(self) -> DataFrame:
        """The envelope table as a DataFrame (schema-stable even if empty)."""
        if self.path.startswith("/") or "://" not in self.path:
            import glob
            if not glob.glob(os.path.join(self.path, "*.parquet")):
                return self.spark.createDataFrame([], EVENT_SCHEMA)
        try:
            return self.spark.read.schema(EVENT_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], EVENT_SCHEMA)

    @classmethod
    def from_dataframe(cls, spark: SparkSession, path: str, df: DataFrame,
                       mode: str = "overwrite") -> "EventLog":
        """Bootstrap a log from an already-normalized envelope DataFrame."""
        df.select([f.name for f in EVENT_SCHEMA.fields]).write.mode(mode).parquet(path)
        return cls(spark, path)

    # -- revision / position bookkeeping ----------------------------------

    def head_revision(self, stream: str) -> Optional[int]:
        """Read-through head-revision lookup — streams.go:61-91 +
        backend.go:82-95 (max revision query). None = stream absent."""
        if stream in self._revisions:
            return self._revisions[stream]
        row = (
            self.df().where(F.col("stream") == stream)
            .agg(F.max("revision").alias("r")).collect()[0]
        )
        if row["r"] is None:
            return None
        self._revisions[stream] = int(row["r"])
        return self._revisions[stream]

    def tail_position(self) -> int:
        """Highest assigned global position (0 = empty log)."""
        if self._tail_position is None:
            row = self.df().agg(F.max("position").alias("p")).collect()[0]
            self._tail_position = int(row["p"]) if row["p"] is not None else 0
        return self._tail_position

    # -- append path ------------------------------------------------------

    @staticmethod
    def _validate(event: NewEvent) -> None:
        """Require `type` + `content-type` — streams.go:191-203."""
        if not event.content_type:
            raise InvalidEventError("missing content-type metadata")
        if not event.event_type:
            raise InvalidEventError("missing event type metadata")

    @staticmethod
    def _check_revision(expected: ExpectedRevision, current: Optional[int],
                        stream: str) -> None:
        """Expected-revision CAS — streams.go:93-115."""
        kind = expected.kind
        if kind == ExpectedRevisionKind.ANY:
            return
        if kind == ExpectedRevisionKind.NO_STREAM and current is not None:
            raise WrongExpectedRevisionError(stream, "no stream", current)
        if kind == ExpectedRevisionKind.STREAM_EXISTS and current is None:
            raise WrongExpectedRevisionError(stream, "stream exists", current)
        if kind == ExpectedRevisionKind.REVISION and current != expected.revision:
            raise WrongExpectedRevisionError(stream, str(expected.revision), current)

    def append(self, stream: str, events: Sequence[NewEvent],
               expected: ExpectedRevision = ExpectedRevision.any(),
               *, check_duplicates: bool = True) -> AppendResult:
        """Transactional multi-event append — streams.go:125-189.

        Serialized through the log lock (the single-writer section, SURVEY
        §7.4): validates every event, runs the CAS, assigns dense per-stream
        revisions and gapless global positions, stamps ``created`` ticks,
        and commits one Parquet append. Returns first position + last
        revision (streams.go:139-161).
        """
        if not events:
            raise ValueError("append requires at least one event")
        for ev in events:
            self._validate(ev)
        with self._lock:
            current = self.head_revision(stream)
            self._check_revision(expected, current, stream)
            if check_duplicates and current is not None:
                uuids = [e.uuid for e in events]
                dup = (
                    self.df().where((F.col("stream") == stream) & F.col("uuid").isin(uuids))
                    .limit(1).count()
                )
                if dup:
                    raise ConflictError(f"duplicate uuid in stream {stream!r}")
            seen: set[str] = set()
            for ev in events:
                if ev.uuid in seen:
                    raise ConflictError(f"duplicate uuid in batch: {ev.uuid}")
                seen.add(ev.uuid)

            base_rev = -1 if current is None else current
            base_pos = self.tail_position()
            ticks = _now_ticks()
            rows = []
            for i, ev in enumerate(events):
                meta = dict(ev.metadata)
                meta[META_TYPE] = ev.event_type
                meta[META_CONTENT_TYPE] = ev.content_type
                meta[META_CREATED] = str(ticks)
                rows.append(
                    (
                        stream, ev.uuid, ev.data, meta, ev.custom_metadata,
                        base_rev + 1 + i, base_pos + 1 + i,
                        ev.event_type, ev.content_type, ticks,
                    )
                )
            batch = self.spark.createDataFrame(rows, EVENT_SCHEMA)
            batch.write.mode("append").parquet(self.path)
            self._revisions[stream] = base_rev + len(events)
            self._tail_position = base_pos + len(events)
            return AppendResult(
                stream=stream,
                first_position=base_pos + 1,
                last_revision=base_rev + len(events),
                count=len(events),
            )

    # -- read path --------------------------------------------------------

    def read(self, opts: ReadOptions) -> DataFrame:
        """Execute a read plan. Missing stream -> StreamNotFoundError
        (streams.go:211-222)."""
        if opts.stream is not None and self.head_revision(opts.stream.identifier) is None:
            raise StreamNotFoundError(opts.stream.identifier)
        return compile_read(self.df(), opts)

    def read_stream(self, stream: str, *, direction: Direction = Direction.FORWARDS,
                    from_revision: Optional[int] = None,
                    boundary: Optional[BoundaryKind] = None,
                    count: int = 0) -> DataFrame:
        # Convenience default: a backwards read with no explicit boundary
        # starts at END (the client-intuitive "read latest first"); START
        # + backwards is the degenerate first-event shortcut and must be
        # requested explicitly (backend.go:135-138).
        if boundary is None and from_revision is None:
            kind = BoundaryKind.START if direction == Direction.FORWARDS else BoundaryKind.END
        else:
            kind = boundary or BoundaryKind.AT
        opts = ReadOptions(
            direction=direction, count=count,
            stream=StreamOptions(stream, kind, from_revision or 0),
        )
        return self.read(opts)

    def read_all(self, *, direction: Direction = Direction.FORWARDS,
                 from_position: Optional[int] = None,
                 boundary: Optional[BoundaryKind] = None,
                 filter: Optional[SubscriptionFilter] = None,
                 count: int = 0) -> DataFrame:
        if boundary is None and from_position is None:
            kind = BoundaryKind.START if direction == Direction.FORWARDS else BoundaryKind.END
        else:
            kind = boundary or BoundaryKind.AT
        opts = ReadOptions(
            direction=direction, count=count,
            all=AllOptions(kind, from_position or 0, filter),
        )
        return self.read(opts)

    # -- maintenance ------------------------------------------------------

    def compact(self, num_files: int = 8) -> None:
        """Rewrite the log into ``num_files`` position-sorted files.

        Small-file hygiene for the many-small-appends pattern; the cluster
        equivalent is Delta OPTIMIZE / file compaction with Z-order on
        (stream, position).
        """
        df = self.df().repartitionByRange(num_files, "position").sortWithinPartitions("position")
        tmp = self.path.rstrip("/") + ".compact"
        df.write.mode("overwrite").parquet(tmp)
        back = self.spark.read.schema(EVENT_SCHEMA).parquet(tmp)
        back.write.mode("overwrite").parquet(self.path)
        self._tail_position = None
