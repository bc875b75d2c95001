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
    StreamDeletedError,
    StreamNotFoundError,
    WrongExpectedRevisionError,
)
from eventstorm_spark.log.plan import compile_read
from eventstorm_spark.localframe import local_frame
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


# System stream holding deletion markers (S9). The reference's Delete /
# Tombstone RPCs are stubs (grpc_server.go:271-281); we implement the
# semantics the proto declares (streams.proto:14-16, EventStoreDB API):
# soft delete hides the stream's past and allows recreation (revision
# numbering continues); tombstone makes the stream permanently dead.
# Markers are ordinary events, so they replicate/subscribe like any
# other write; `scavenge()` is the physical reclamation job.
DELETED_STREAMS = "$deleted-streams"
DELETE_EVENT = "$stream-deleted"
TOMBSTONE_EVENT = "$stream-tombstoned"

# Link events (EventStoreDB `$>` convention). The reference parses the
# ResolveLinks read option (model.go:100, extensions.go:24) but never
# implements links — linkTo is absent and ReadResp.link is never
# populated (grpc_server.go:157-174). We implement the declared
# semantics: a link's body is "revision@stream"; resolved reads replace
# the link's payload with the target's while keeping the link's
# coordinates for ordering/resume.
LINK_EVENT = "$>"
METADATA_EVENT = "$metadata"  # EventStoreDB stream-metadata event type

# Sentinel "hide every position" bound for tombstoned streams in the
# broadcast deletion frame (any real position is far below 2^62).
_TOMBSTONE_BEFORE = 1 << 62

# Distinguishes "caller did not pass a retention frame" from "caller
# computed the frame and it was None (no metadata streams)".
_UNSET = object()


class EventLog:
    """A named event log over a Parquet directory.

    Commit protocol: in-process appends serialize on a lock; ACROSS
    processes the append is an optimistic commit — before writing, the
    writer atomically reserves the batch's first position by creating
    ``_commits/<position>`` (``open(..., 'x')``, the filesystem's
    compare-and-swap). A second writer that raced to the same tail
    loses the create, refreshes its tail/revision caches, re-runs the
    expected-revision check against the new head, and retries at the
    advanced position — exactly Delta Lake's optimistic-commit conflict
    check re-expressed on a plain directory (with delta-spark installed,
    ``format="delta"`` replaces ``_commits/`` with the Delta transaction
    log — see ``delta.py``; the protocol below targets a real
    rename-atomic filesystem, HDFS/POSIX).

    The commit is FENCED (not a bare grace-period lease):

    - each marker carries a unique owner token; the batch is written to
      ``_staging/<token>`` first, a heartbeat thread refreshes the
      marker mtime during the (possibly slow) write, and ownership is
      re-verified — token compared — *after* the write, immediately
      before the staged files are renamed into the log. A writer whose
      claim was stolen during a pause longer than ``commit_grace_secs``
      aborts cleanly (staging discarded, retried at the advanced tail)
      instead of publishing duplicate positions.
    - reclaiming a stale marker is an atomic ``rename`` to a unique
      trash name: only one contender can win the steal, closing the
      stat→unlink race where two contenders could otherwise reclaim the
      same marker twice and delete a freshly re-created claim.
    - committed markers are garbage-collected behind a monotonic
      high-watermark file (``_commits/_watermark``, flock-guarded
      read-modify-write, always published *before* markers at or below
      it are removed). A claimer whose position is at or below the
      watermark had a stale tail cache and releases its ghost claim.
      On the first marker-mode append to a pre-existing log with no
      watermark the current tail is backfilled, so stale caches are
      fenced even for logs created before this protocol.

    ``commit_protocol="none"`` turns the marker exchange off for
    single-writer jobs where the extra file create per append is
    measurable.
    """

    def __init__(self, spark: SparkSession, path: str, *,
                 format: str = "parquet",
                 commit_protocol: str = "marker",
                 commit_grace_secs: float = 60.0):
        if format not in ("parquet", "delta"):
            raise ValueError(f"unsupported log format: {format!r}")
        if format == "delta":
            from eventstorm_spark.log.delta import require_delta
            require_delta()
            # the Delta transaction log replaces the marker exchange
            # wholesale (see delta.py); no watermark/marker bookkeeping
            commit_protocol = "delta"
        self.spark = spark
        self.path = path
        self.format = format
        self._lock = threading.Lock()
        self._commit_protocol = commit_protocol
        self._commit_grace = commit_grace_secs
        self._tail_position: Optional[int] = None  # lazily discovered
        self._revisions: dict[str, int] = {}  # stream -> head revision cache
        # stream -> (kind, before_position, last_revision); None = not loaded
        self._deletions: Optional[dict[str, tuple]] = None
        # memoized local (stream, __del_before) frame derived from
        # _deletions — one createDataFrame per deletions epoch instead
        # of one per resolve/scavenge call; invalidated everywhere the
        # dict cache is (watermark fence, marker append)
        self._deletions_df: Optional[DataFrame] = None
        self._watermark_checked = False
        # stream -> metadata body (read-through; {} = no metadata)
        self._stream_meta: dict[str, dict] = {}
        # lazily discovered: does this log hold ANY $$-metadata stream?
        # (False short-circuits the per-read retention lookup entirely)
        self._has_meta_streams: Optional[bool] = None
        # watermark snapshot the metadata caches were populated under;
        # a moved watermark = another writer committed = caches stale
        self._meta_cache_watermark: Optional[int] = None
        # same fence for the head-revision/tail caches on the append
        # path (see _refresh_log_caches)
        self._log_cache_watermark: Optional[int] = None
        # ... and for the deletion-marker cache (read through
        # _load_deletions): a moved watermark may carry another
        # process's delete/tombstone marker
        self._deletions_watermark: Optional[int] = None
        # fixed clock for $maxAge retention (tests/replays); None = now
        self.retention_clock = None

    # -- optimistic commit markers ---------------------------------------

    def _commits_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def _watermark_path(self) -> str:
        return os.path.join(self._commits_dir(), "_watermark")

    def _read_watermark(self) -> int:
        """Highest position known committed (lower bound — monotonic)."""
        try:
            with open(self._watermark_path()) as f:
                return int(f.read().strip() or 0)
        except (OSError, ValueError):
            return 0

    def _advance_watermark(self, position: int) -> int:
        """Monotonically raise the watermark to >= ``position``.

        flock-guarded read-modify-write + atomic rename publish: two
        writers can never regress it, and a reader sees either the old
        or the new value — both valid lower bounds. Callers MUST publish
        the new watermark before deleting any marker at or below it.
        """
        import fcntl

        os.makedirs(self._commits_dir(), exist_ok=True)
        lock_path = os.path.join(self._commits_dir(), "_watermark.lock")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            cur = self._read_watermark()
            new = max(cur, position)
            if new > cur:
                tmp = self._watermark_path() + ".tmp"
                with open(tmp, "w") as f:
                    f.write(str(new))
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, self._watermark_path())
            return new

    def _ensure_watermark(self) -> None:
        """Backfill the watermark on a pre-existing markerless log.

        A log created before marker mode (or with protocol "none") has
        no commit evidence at all; without this, a writer with a stale
        cached tail could reserve a mid-log position unopposed. One
        fresh tail read on the first marker-mode append closes it.
        """
        if self._watermark_checked or self._commit_protocol != "marker":
            return
        if not os.path.exists(self._watermark_path()):
            self._tail_position = None
            tail = self.tail_position()
            if tail > 0:
                self._advance_watermark(tail)
        self._watermark_checked = True

    def _gc_markers(self, watermark: int) -> None:
        """Remove committed markers at or below the published watermark
        (bounded ``_commits/`` growth; the watermark file itself carries
        the commit evidence from here on)."""
        try:
            names = os.listdir(self._commits_dir())
        except OSError:
            return
        for name in names:
            if not name.isdigit():
                continue
            if int(name) <= watermark:
                try:
                    os.unlink(os.path.join(self._commits_dir(), name))
                except OSError:
                    pass

    def _marker_owned(self, marker: str, token: str) -> bool:
        """Fence check: does the marker at this path still carry our
        token? False means the claim was stolen (grace expired during a
        pause) and the commit must abort."""
        import json as _json

        try:
            with open(marker) as f:
                return _json.load(f).get("token") == token
        except (OSError, ValueError):
            return False

    def _reserve(self, position: int, stream: str, count: int,
                 token: str) -> Optional[str]:
        """Atomically claim ``position`` as the next append's first
        position. Returns the marker path, or None when another writer
        holds a live claim (caller refreshes and retries)."""
        if self._commit_protocol != "marker":
            return None
        import json as _json

        os.makedirs(self._commits_dir(), exist_ok=True)
        marker = os.path.join(self._commits_dir(), f"{position:020d}")
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # Claim exists. Committed (data landed) -> caller re-reads the
            # tail and moves on. Orphaned (no data, stale) -> reclaim via
            # atomic rename so only ONE contender can win the steal (a
            # bare stat+unlink lets a second contender delete a marker
            # that was already reclaimed and freshly re-created).
            try:
                age = time.time() - os.stat(marker).st_mtime
            except OSError:
                return None  # racing cleanup; retry
            self._tail_position = None  # fresh read: orphan vs committed
            if age > self._commit_grace and self.tail_position() < position:
                trash = f"{marker}.reclaimed-{token}"
                try:
                    os.rename(marker, trash)
                except OSError:
                    return None  # another contender won the steal
                try:
                    os.unlink(trash)
                except OSError:
                    pass
            return None
        with os.fdopen(fd, "w") as f:
            f.write(_json.dumps(
                {"stream": stream, "first_position": position,
                 "count": count, "token": token}))
            f.flush()
            os.fsync(f.fileno())
        # Act-then-check stale-cache fence: the watermark is published
        # BEFORE committed markers are GC'd, so a claim at or below it
        # means our cached tail was stale — release the ghost claim.
        if position <= self._read_watermark():
            try:
                os.unlink(marker)
            except OSError:
                pass
            self._tail_position = None
            return None
        return marker

    def _release(self, marker: Optional[str], token: str) -> None:
        """Release our claim — only if the marker still carries our
        token (never delete a claim stolen and re-issued to another
        writer)."""
        if marker is None:
            return
        if self._marker_owned(marker, token):
            try:
                os.unlink(marker)
            except OSError:
                pass

    def _heartbeat(self, marker: str, stop: threading.Event) -> None:
        """Refresh the marker mtime while the data write runs, so a
        healthy-but-slow writer's lease never goes stale under
        contenders' ``commit_grace_secs`` clocks."""
        interval = min(max(self._commit_grace / 4.0, 0.05), 15.0)
        while not stop.wait(interval):
            try:
                os.utime(marker, None)
            except OSError:
                return  # marker gone (stolen); the fence check will abort

    def _fenced_write(self, batch: DataFrame, marker: str, token: str,
                      *, single_file: bool = True) -> bool:
        """Fenced publish of a batch under an owned marker: stage the
        (possibly slow) parquet write outside the log, heartbeat the
        lease meanwhile, re-verify ownership, then publish via fast
        same-filesystem renames. Returns False when the fence tripped
        (claim stolen mid-write — staging discarded, log untouched);
        raises after releasing the claim on a failed write.

        ``single_file`` (default, for caller-bounded appends) coalesces
        the staged batch so the publish is ONE atomic rename — a
        multi-file loop could fail or crash partway and publish a torn
        batch after the 'log untouched' promise. Bulk writers (system
        projection materialization — corpus-sized batches that must
        stay distributed) pass ``single_file=False`` and accept the
        torn-publish window; their documented recovery is uuid-dedupe
        on re-materialization."""
        import glob as _glob
        import shutil as _shutil

        staging = os.path.join(self.path, "_staging", token)
        stop = threading.Event()
        hb = threading.Thread(target=self._heartbeat,
                              args=(marker, stop), daemon=True)
        hb.start()
        try:
            staged = batch.coalesce(1) if single_file else batch
            staged.write.mode("overwrite").parquet(staging)
            if not self._marker_owned(marker, token):
                return False  # fence tripped; finally-block cleans up
            os.makedirs(self.path, exist_ok=True)
            parts = sorted(_glob.glob(os.path.join(staging, "*.parquet")))
            if single_file:
                assert len(parts) == 1, f"staged batch has {len(parts)} files"
            for part in parts:
                os.rename(part,
                          os.path.join(self.path, os.path.basename(part)))
            return True
        except BaseException:
            # failed commit releases its claim; the log is untouched in
            # single-file mode (the one rename either happened or not)
            self._release(marker, token)
            raise
        finally:
            stop.set()
            hb.join(timeout=5.0)
            _shutil.rmtree(staging, ignore_errors=True)
            try:  # remove _staging/ itself when empty
                os.rmdir(os.path.join(self.path, "_staging"))
            except OSError:
                pass

    # -- table access -----------------------------------------------------

    def df(self) -> DataFrame:
        """The envelope table as a DataFrame (schema-stable even if empty)."""
        if self.format == "delta":
            from eventstorm_spark.log.delta import read_log
            return read_log(self.spark, self.path)
        if self.path.startswith("/") or "://" not in self.path:
            import glob
            if not glob.glob(os.path.join(self.path, "*.parquet")):
                return local_frame(self.spark, [], EVENT_SCHEMA)
        try:
            return self.spark.read.schema(EVENT_SCHEMA).parquet(self.path)
        except Exception:
            return local_frame(self.spark, [], EVENT_SCHEMA)

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

    def _refresh_log_caches(self) -> None:
        """Cross-process staleness fence for the head-revision/tail
        caches on the APPEND path. The CAS head read and the
        position-reserve tail read are separate jobs; if another
        process's commit becomes visible in between (or a cached head
        outlives a fresh tail), the reserve can succeed at a fresh
        position while the CAS verdict and revision numbering were
        decided on stale data — two writers both 'win', violating the
        dense-revision/CAS invariants. A moved shared watermark means
        another writer committed: invalidate both caches. Commits not
        yet watermarked still hold their position markers, so the
        reserve itself serializes those (together with the
        tail-before-head read ordering in append/append_multi this
        closes every interleaving: a commit invisible to the tail read
        blocks the reserve; one visible to it is visible to the later
        head read too).

        Under ``format="delta"`` the same interleaving exists with a
        different clock: the position-overlap validation only rejects a
        stale TAIL — a fresh tail combined with a stale per-stream HEAD
        (this process appended elsewhere since caching it) would commit
        duplicate (stream, revision) pairs unopposed. The transaction-log
        version (one directory listing, ``delta.current_version``) is the
        watermark's twin there."""
        if self._commit_protocol == "marker":
            clock = self._read_watermark()
        elif self._commit_protocol == "delta":
            from eventstorm_spark.log.delta import current_version
            clock = current_version(self.path)
        else:
            return
        if clock != self._log_cache_watermark:
            self._log_cache_watermark = clock
            self._revisions.clear()
            self._tail_position = None

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
        kind, _, _ = self._deletion_state(stream)
        if kind == "tombstoned":
            raise StreamDeletedError(stream)
        for ev in events:
            self._validate(ev)
        seen: set[str] = set()
        for ev in events:
            if ev.uuid in seen:
                raise ConflictError(f"duplicate uuid in batch: {ev.uuid}")
            seen.add(ev.uuid)
        import uuid as _uuid

        with self._lock:
            self._ensure_watermark()
            attempts = 0
            while True:
                self._refresh_log_caches()
                # tail BEFORE head (see _refresh_log_caches): a commit
                # the tail read missed blocks our position reserve; one
                # it saw is visible to the (strictly later) head read
                base_pos = self.tail_position()
                current, kind = self._effective_head(stream)
                if kind == "tombstoned":
                    # committed by another process since the fast-fail
                    # check above (stale-cache fence in _load_deletions)
                    raise StreamDeletedError(stream)
                self._check_revision(expected, current, stream)
                if check_duplicates and current is not None:
                    uuids = [e.uuid for e in events]
                    dup = (
                        self.df().where((F.col("stream") == stream)
                                        & F.col("uuid").isin(uuids))
                        .limit(1).count()
                    )
                    if dup:
                        raise ConflictError(f"duplicate uuid in stream {stream!r}")
                base_rev = -1 if current is None else current
                token = _uuid.uuid4().hex
                marker = self._reserve(base_pos + 1, stream, len(events), token)
                if marker is None and self._commit_protocol == "marker":
                    # lost the optimistic race: another process committed
                    # (or holds a live claim). Refresh tail + head caches
                    # and re-validate the CAS against the advanced log.
                    attempts += 1
                    if attempts > 200:
                        raise ConflictError(
                            f"commit contention on {self.path!r} (position "
                            f"{base_pos + 1} claimed and not released)")
                    time.sleep(0.05)
                    self._tail_position = None
                    self._revisions.pop(stream, None)
                    continue
                result = self._commit_batch(
                    stream, events, base_pos, base_rev, marker, token)
                if result is not None:
                    return result
                # fence tripped: our claim was stolen during the data
                # write (a pause beyond commit_grace_secs). Nothing was
                # published — refresh and retry the whole CAS.
                attempts += 1
                if attempts > 200:
                    raise ConflictError(
                        f"commit contention on {self.path!r} (claim at "
                        f"position {base_pos + 1} repeatedly stolen)")
                self._tail_position = None
                self._revisions.pop(stream, None)

    def append_multi(
        self,
        requests: Sequence[tuple[str, Sequence[NewEvent], ExpectedRevision]],
        *, check_duplicates: bool = True,
    ) -> list[AppendResult]:
        """Atomic multi-stream append — the engine-level form of the
        reference's declared-but-stubbed BatchAppend RPC
        (``streams.proto:204-307``, handler stub
        ``grpc_server.go:271-281``).

        Every request is ``(stream, events, expected_revision)``. All
        validations and expected-revision checks run first against the
        current heads; if ANY fails, NOTHING is written (the whole batch
        is one transaction). On success the batch commits as ONE fenced
        parquet append covering every stream: positions are assigned
        densely across requests in order, per-stream revisions stay
        dense (a stream appearing twice in the batch continues its own
        numbering), and throughput scales with total batch size — N
        streams cost one commit, not N (SCALE.md §2).
        """
        if not requests:
            raise ValueError("append_multi requires at least one request")
        import uuid as _uuid

        for stream, events, _ in requests:
            if not events:
                raise ValueError(f"empty event list for stream {stream!r}")
            kind, _, _ = self._deletion_state(stream)
            if kind == "tombstoned":
                raise StreamDeletedError(stream)
            for ev in events:
                self._validate(ev)
        seen: set[tuple] = set()
        for stream, events, _ in requests:
            for ev in events:
                key = (stream, ev.uuid)
                if key in seen:
                    raise ConflictError(
                        f"duplicate uuid in batch for stream {stream!r}: {ev.uuid}")
                seen.add(key)

        with self._lock:
            self._ensure_watermark()
            attempts = 0
            while True:
                self._refresh_log_caches()
                # tail BEFORE the heads (see _refresh_log_caches): a
                # commit the tail read missed blocks the reserve; one
                # it saw is visible to the later head reads
                base_pos = self.tail_position()
                # CAS every stream against its live head BEFORE writing
                # anything; batch-internal continuation for repeated
                # streams (second request sees the first's revisions).
                heads: dict[str, int] = {}
                failed = None
                for stream, events, expected in requests:
                    if stream not in heads:
                        cur, kind = self._effective_head(stream)
                        if kind == "tombstoned":
                            raise StreamDeletedError(stream)
                        heads[stream] = -1 if cur is None else cur
                        cur_for_check = cur
                    else:
                        cur_for_check = heads[stream] if heads[stream] >= 0 else None
                    try:
                        self._check_revision(expected, cur_for_check, stream)
                    except WrongExpectedRevisionError as exc:
                        failed = exc
                        break
                    if check_duplicates and cur_for_check is not None:
                        uuids = [e.uuid for e in events]
                        if (self.df().where((F.col("stream") == stream)
                                            & F.col("uuid").isin(uuids))
                                .limit(1).count()):
                            raise ConflictError(
                                f"duplicate uuid in stream {stream!r}")
                    heads[stream] += len(events)
                if failed is not None:
                    raise failed  # atomic rejection: nothing written

                total = sum(len(events) for _, events, _ in requests)
                token = _uuid.uuid4().hex
                marker = self._reserve(base_pos + 1, "$multi", total, token)
                if marker is None and self._commit_protocol == "marker":
                    attempts += 1
                    if attempts > 200:
                        raise ConflictError(
                            f"commit contention on {self.path!r} (position "
                            f"{base_pos + 1} claimed and not released)")
                    time.sleep(0.05)
                    self._tail_position = None
                    self._revisions.clear()
                    continue

                ticks = _now_ticks()
                rows: list = []
                results: list[AppendResult] = []
                revs: dict[str, int] = {}
                pos = base_pos
                for stream, events, _ in requests:
                    if stream not in revs:
                        cur, _kind = self._effective_head(stream)
                        revs[stream] = -1 if cur is None else cur
                    first_position = pos + 1
                    for ev in events:
                        meta = dict(ev.metadata)
                        meta[META_TYPE] = ev.event_type
                        meta[META_CONTENT_TYPE] = ev.content_type
                        meta[META_CREATED] = str(ticks)
                        revs[stream] += 1
                        pos += 1
                        rows.append((stream, ev.uuid, ev.data, meta,
                                     ev.custom_metadata, revs[stream], pos,
                                     ev.event_type, ev.content_type, ticks))
                    results.append(AppendResult(
                        stream=stream, first_position=first_position,
                        last_revision=revs[stream], count=len(events)))

                if self._publish_rows(rows, base_pos, total, marker, token):
                    self._revisions.update(revs)
                    self._tail_position = base_pos + total
                    return results
                # lost race / fence tripped: refresh and redo the CAS
                attempts += 1
                if attempts > 200:
                    raise ConflictError(
                        f"commit contention on {self.path!r} (claim at "
                        f"position {base_pos + 1} repeatedly stolen)")
                self._tail_position = None
                self._revisions.clear()

    def _publish_rows(self, rows: list, base_pos: int, n: int,
                      marker: Optional[str], token: str) -> bool:
        """Publish assembled envelope rows through the format's commit
        path (Delta optimistic merge / direct append / fenced staged
        write + watermark). False = lost race or fence tripped; nothing
        published, caller retries its CAS."""
        batch = local_frame(self.spark, rows, EVENT_SCHEMA)
        if self.format == "delta":
            from eventstorm_spark.log import delta as _delta
            return _delta.append_batch(self.spark, self.path, batch)
        if marker is None:
            # protocol "none": single-writer fast path, direct append
            batch.write.mode("append").parquet(self.path)
            return True
        if not self._fenced_write(batch, marker, token):
            return False
        # published: advertise the watermark FIRST, then GC markers at
        # or below it (ours included — the watermark now carries the
        # commit evidence).
        prev_wm = self._read_watermark()
        wm = self._advance_watermark(base_pos + n)
        if (wm == base_pos + n and prev_wm == self._log_cache_watermark
                and base_pos == prev_wm):
            # Single-writer fast path: move the staleness fences with
            # our own commit so the head/tail caches the caller is
            # about to write survive the next _refresh_* (otherwise
            # every append pays a full-log max(position)+max(revision)
            # rescan of the caches it just set). The fence may ONLY
            # advance when our caches provably cover everything below
            # the new watermark, i.e. the only commit since they were
            # populated is ours: (a) the pre-advance watermark still
            # equals our fence (no foreign commit ADVERTISED since our
            # refresh), AND (b) our base position equals it (no foreign
            # commit PUBLISHED-but-unadvertised below us — a stalled
            # writer's rows are visible to the tail read before its
            # watermark moves, and advancing our fence past such rows
            # would freeze a stale head cache forever: duplicate
            # revisions / wrongly-passing CAS). Either condition
            # failing leaves the fence behind and the next refresh
            # invalidates, which is always safe. The meta fence
            # additionally requires this batch wrote no $$-metadata
            # stream (set_stream_metadata writes through; a raw
            # $$-append must stay invalidatable).
            self._log_cache_watermark = wm
            if not any(r[0].startswith("$$") for r in rows):
                self._meta_cache_watermark = wm
        self._gc_markers(wm)
        return True

    def _commit_batch(self, stream: str, events: Sequence[NewEvent],
                      base_pos: int, base_rev: int,
                      marker: Optional[str], token: str) -> Optional[AppendResult]:
        """Write the batch and publish it. Returns None when the fence
        tripped (claim stolen mid-write; nothing published)."""
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
        if not self._publish_rows(rows, base_pos, len(events), marker, token):
            return None  # lost race / fence tripped; nothing published
        self._revisions[stream] = base_rev + len(events)
        self._tail_position = base_pos + len(events)
        return AppendResult(
            stream=stream,
            first_position=base_pos + 1,
            last_revision=base_rev + len(events),
            count=len(events),
        )

    # -- deletion (S9 — stubs in the reference, grpc_server.go:271-281) ---

    def _load_deletions(self) -> dict[str, tuple]:
        """Deletion markers, folded to per-stream state: tombstone wins,
        else the latest (max before_position) soft delete.

        Cross-process staleness fence (marker protocol): a moved shared
        watermark means another writer committed — possibly a
        delete/tombstone marker this process's cache predates, which
        would let appends land on a tombstoned stream and reads keep
        serving soft-deleted events. The watermark read is one local
        file stat, so the check is cheap enough for every lookup."""
        if self._commit_protocol == "marker":
            wm = self._read_watermark()
            if wm != self._deletions_watermark:
                self._deletions_watermark = wm
                self._deletions = None
                self._deletions_df = None
        elif self._commit_protocol == "delta":
            # Same fence, delta clock: the transaction-log version moves
            # on every cross-process commit (delete markers included),
            # and reading it is one directory listing — without this the
            # deletions cache was sticky per instance under
            # format="delta" while marker mode re-read correctly.
            from eventstorm_spark.log.delta import current_version
            v = current_version(self.path)
            if v != self._deletions_watermark:
                self._deletions_watermark = v
                self._deletions = None
                self._deletions_df = None
        if self._deletions is not None:
            return self._deletions
        import json as _json

        rows = (
            self.df().where(F.col("stream") == DELETED_STREAMS)
            .select("event_type", "data").collect()
        )
        d: dict[str, tuple] = {}
        for r in rows:
            body = _json.loads(r["data"])
            target = body["stream"]
            kind = "tombstoned" if r["event_type"] == TOMBSTONE_EVENT else "deleted"
            entry = (kind, int(body["before_position"]), int(body["last_revision"]))
            cur = d.get(target)
            if cur is None or kind == "tombstoned" or (
                cur[0] != "tombstoned" and entry[1] > cur[1]
            ):
                d[target] = entry
        self._deletions = d
        return d

    def _deletion_state(self, stream: str) -> tuple:
        return self._load_deletions().get(stream, (None, -1, -1))

    def _deletions_frame(self) -> Optional[DataFrame]:
        """``(stream, __del_before)`` for every ever-deleted stream — the
        broadcast side of the logical deletion filter. A soft delete
        hides positions ``<= before``; a tombstone hides the whole
        stream (sentinel bound). Row count = #ever-deleted streams
        (the already-cached deletions dict, one bounded
        ``$deleted-streams`` collect), so the join side is
        broadcast-scale by construction. This REPLACES the old
        per-stream OR-chain predicate: tombstone state is permanent,
        so that expression tree grew one term per ever-deleted stream
        and Catalyst plan compile is superlinear in expression size —
        at 100× stream churn the chain degenerates long before the
        data does. The join's plan shape is constant in #deletions."""
        dels = self._load_deletions()
        if not dels:
            return None
        if self._deletions_df is not None:
            return self._deletions_df
        rows = [(s, _TOMBSTONE_BEFORE if kind == "tombstoned" else int(before))
                for s, (kind, before, _) in dels.items()]
        self._deletions_df = local_frame(self.spark, 
            rows, "stream string, __del_before long")
        return self._deletions_df

    @staticmethod
    def _apply_deletion_filter(df: DataFrame, delf: DataFrame) -> DataFrame:
        """Hide logically-deleted history: broadcast left join against
        the deletions frame, keep rows past the per-stream bound (or
        from never-deleted streams). Same shape as the retention join
        right below it in ``_resolution_envelope`` — the corpus never
        shuffles."""
        return (df.join(F.broadcast(delf), "stream", "left")
                .where(F.col("__del_before").isNull()
                       | (F.col("position") > F.col("__del_before")))
                .drop("__del_before"))

    def _effective_head(self, stream: str) -> tuple:
        """(continuation-aware head revision, deletion kind): after a
        soft delete — even one whose rows scavenge already reclaimed —
        revision numbering continues from the pre-delete head
        (EventStoreDB recreation semantics). The single home for the
        continuation rule used by append, append_multi and
        delete_stream; also re-reads deletion state through the
        watermark fence, so a tombstone committed by another process
        since a caller's fast-fail check is still seen."""
        current = self.head_revision(stream)
        kind, _, last_rev = self._deletion_state(stream)
        if kind == "deleted" and (current is None or current < last_rev):
            current = last_rev if last_rev >= 0 else None
        return current, kind

    def delete_stream(self, stream: str,
                      expected: ExpectedRevision = ExpectedRevision.any(),
                      *, tombstone: bool = False) -> AppendResult:
        """Soft delete (default) or tombstone a stream.

        Implemented as a marker event appended to the ``$deleted-streams``
        system stream — an ordinary committed write, so it flows through
        subscriptions and survives restarts; nothing is physically removed
        until ``scavenge()``. Soft delete hides all events up to the
        current tail; a later append recreates the stream with revision
        numbering continuing from the pre-delete head. Tombstone is
        permanent: further appends/reads raise StreamDeletedError.
        """
        # continuation-aware head: deleting an already-soft-deleted
        # stream (possibly after scavenge reclaimed its rows) must
        # carry the remembered pre-delete head forward, not reset the
        # marker to last_revision=-1 — a later recreation append would
        # otherwise restart revisions at 0 and re-issue numbers
        # consumers already saw
        current, kind = self._effective_head(stream)
        if kind == "tombstoned":
            raise StreamDeletedError(stream)
        if current is None and kind is None:
            raise StreamNotFoundError(stream)
        self._check_revision(expected, current, stream)
        import json as _json

        marker = NewEvent(
            uuid=f"$del-{stream}-{self.tail_position()}",
            event_type=TOMBSTONE_EVENT if tombstone else DELETE_EVENT,
            data=_json.dumps({
                "stream": stream,
                "before_position": self.tail_position(),
                "last_revision": -1 if current is None else current,
            }),
        )
        res = self.append(DELETED_STREAMS, [marker], check_duplicates=False)
        self._deletions = None
        self._deletions_df = None
        return res

    def tombstone_stream(self, stream: str,
                         expected: ExpectedRevision = ExpectedRevision.any()) -> AppendResult:
        return self.delete_stream(stream, expected, tombstone=True)

    def scavenge(self, num_files: int = 8) -> int:
        """Physically reclaim deleted rows: drop every event covered by a
        soft-delete marker and every event of a tombstoned stream
        (markers are retained), rewriting the log position-sorted. The
        cluster shape of this job is a partition-pruned anti-filter +
        compaction (Delta: DELETE + OPTIMIZE); positions of surviving
        rows are unchanged, so readers and subscriptions are unaffected.
        Returns the number of rows removed.
        """
        if self.format == "delta":
            raise NotImplementedError(
                "scavenge on a Delta-backed log maps to Delta DELETE + "
                "OPTIMIZE; use those (the parquet path's rewrite would "
                "bypass the transaction log)")
        # Both reclamation rules are broadcast anti-filters against
        # small per-stream frames (#ever-deleted streams / #metadata
        # streams rows) — the same shape the logical read filters use.
        # Tombstone state is permanent, so an expression-tree form
        # (one OR term per deleted stream) would grow the compiled
        # plan without bound; the join's plan shape is constant.
        delf = self._deletions_frame()
        rt = self._retention_frame()
        if delf is None and rt is None:
            return 0
        with self._lock:
            df = self.df()
            kept = df
            if delf is not None:
                kept = self._apply_deletion_filter(kept, delf)
            if rt is not None:
                kept = (kept.join(F.broadcast(rt), "stream", "left")
                        .where((F.col("__floor").isNull()
                                | (F.col("revision") >= F.col("__floor")))
                               & (F.col("__cutoff").isNull()
                                  | (F.col("created") >= F.col("__cutoff"))))
                        .drop("__floor", "__cutoff"))
            removed = df.count() - kept.count()
            if removed == 0:
                return 0
            tmp = self.path.rstrip("/") + ".scavenge"
            (kept.repartitionByRange(num_files, "position")
             .sortWithinPartitions("position")
             .write.mode("overwrite").parquet(tmp))
            back = self.spark.read.schema(EVENT_SCHEMA).parquet(tmp)
            back.write.mode("overwrite").parquet(self.path)
            import shutil as _shutil
            _shutil.rmtree(tmp, ignore_errors=True)  # full-size copy
            self._revisions.clear()
            self._tail_position = None
            self._restore_watermark_after_rewrite()
            return removed

    # -- stream metadata / retention (EventStoreDB $$<stream>) ------------

    def set_stream_metadata(self, stream: str, *,
                            max_count: Optional[int] = None,
                            max_age_secs: Optional[float] = None,
                            truncate_before: Optional[int] = None,
                            expected: ExpectedRevision = ExpectedRevision.any(),
                            ) -> AppendResult:
        """EventStoreDB stream metadata (absent from the reference —
        EventStoreDB's ``$$<stream>`` convention): append a
        ``$metadata`` event carrying ``$maxCount`` / ``$maxAge`` /
        ``$tb`` to the stream's metadata stream. The LAST metadata
        event wins (metadata is itself an ordered stream, so updates
        are CAS-able via ``expected``). Retention applies logically at
        read time (:meth:`read` filters out-of-retention events) and
        physically at :meth:`scavenge`."""
        import json as _json
        import uuid as _uuid

        body: dict = {}
        if max_count is not None:
            if max_count < 1:
                raise InvalidEventError("$maxCount must be >= 1")
            body["$maxCount"] = int(max_count)
        if max_age_secs is not None:
            if max_age_secs <= 0:
                raise InvalidEventError("$maxAge must be > 0")
            body["$maxAge"] = float(max_age_secs)
        if truncate_before is not None:
            body["$tb"] = int(truncate_before)
        ev = NewEvent(uuid=str(_uuid.uuid4()), event_type=METADATA_EVENT,
                      data=_json.dumps(body, sort_keys=True))
        res = self.append(f"$${stream}", [ev], expected)
        self._stream_meta[stream] = body
        self._has_meta_streams = True
        return res

    def _refresh_meta_caches(self) -> None:
        """Cross-process staleness fence for the retention caches.
        Another process's commit advances the shared watermark file —
        the same signal the append path's ``_reserve`` uses to detect a
        stale tail cache — so a moved watermark invalidates
        ``_stream_meta``/``_has_meta_streams`` before they are consulted
        (metadata set by a second writer instance becomes visible to
        this instance's reads and ``$all`` retention). Non-marker
        protocols have no shared watermark; there the caches carry
        single-writer-instance semantics by design (one cheap local
        file stat per lookup is the whole cost of the fence)."""
        if self._commit_protocol != "marker":
            return
        wm = self._read_watermark()
        if wm != self._meta_cache_watermark:
            self._meta_cache_watermark = wm
            self._stream_meta.clear()
            self._has_meta_streams = None

    def get_stream_metadata(self, stream: str) -> dict:
        """Current metadata body for ``stream`` ({} when none set) —
        the last event of ``$$<stream>``, read-through cached."""
        import json as _json

        self._refresh_meta_caches()
        if stream in self._stream_meta:
            return dict(self._stream_meta[stream])
        rows = (self.df().where(F.col("stream") == f"$${stream}")
                .orderBy(F.col("revision").desc()).limit(1).collect())
        body = _json.loads(rows[0]["data"]) if rows else {}
        self._stream_meta[stream] = body
        return dict(body)

    def _retention_cutoff(self, meta: dict):
        """(revision_floor, created_cutoff_ticks) for a metadata body —
        the two predicates retention filtering applies. ``$maxAge`` is
        evaluated against ``retention_clock`` (or now) so tests and
        replays can pin the clock; the cutoff converts to the
        envelope's ``created`` unit (ticks = UnixNano/100, U5)."""
        import datetime as _dt

        floor = None
        if "$tb" in meta:
            floor = int(meta["$tb"])
        cutoff = None
        if "$maxAge" in meta:
            now = self.retention_clock or _dt.datetime.now(_dt.timezone.utc)
            cut = now - _dt.timedelta(seconds=float(meta["$maxAge"]))
            cutoff = int(cut.timestamp() * 10_000_000)  # ticks
        return floor, cutoff

    def _apply_retention(self, df: DataFrame, sid: str) -> DataFrame:
        """Filter ``sid``'s out-of-retention events from the base frame
        BEFORE the read plan compiles, so boundaries/limits see only
        retained events (the soft-delete pattern). Cost guard: the
        metadata lookup short-circuits on a one-time has-any-``$$``
        check, so logs without metadata streams pay one bounded probe
        per EventLog instance, ever."""
        if sid.startswith("$$"):
            return df  # metadata streams are never retention-filtered
        self._refresh_meta_caches()
        if self._has_meta_streams is None:
            self._has_meta_streams = bool(
                self.df().where(F.col("stream").startswith("$$"))
                .limit(1).collect())
        if not self._has_meta_streams:
            return df
        meta = self.get_stream_metadata(sid)
        if not meta:
            return df
        floor, cutoff = self._retention_cutoff(meta)
        if "$maxCount" in meta:
            head = self.head_revision(sid)
            if head is not None:
                count_floor = head - int(meta["$maxCount"]) + 1
                floor = count_floor if floor is None else max(floor, count_floor)
        this_stream = F.col("stream") == sid
        if floor is not None and floor > 0:
            df = df.where(~(this_stream & (F.col("revision") < floor)))
        if cutoff is not None:
            df = df.where(~(this_stream & (F.col("created") < F.lit(cutoff))))
        return df

    def _retention_frame(self) -> Optional[DataFrame]:
        """(stream, __floor, __cutoff) for every stream with retention
        metadata — the broadcast side of the ``$all`` retention filter.
        Built from two bounded jobs (latest metadata body per ``$$``
        stream, then one grouped head-revision pass for the
        ``$maxCount`` streams); row count = metadata streams, so the
        join side is broadcast-scale by construction. Not cached:
        ``$maxCount`` floors move with every append, and the build cost
        is only paid when metadata streams exist at all."""
        import json as _json

        self._refresh_meta_caches()
        if self._has_meta_streams is None:
            self._has_meta_streams = bool(
                self.df().where(F.col("stream").startswith("$$"))
                .limit(1).collect())
        if not self._has_meta_streams:
            return None
        meta_rows = (self.df()
                     .where(F.col("stream").startswith("$$"))
                     .groupBy("stream")
                     .agg(F.max_by("data", "revision").alias("data"))
                     .collect())
        bodies = {}
        for r in meta_rows:
            body = _json.loads(r["data"]) if r["data"] else {}
            if body:
                bodies[r["stream"][2:]] = body
        if not bodies:
            return None
        count_streams = [s for s, b in bodies.items() if "$maxCount" in b]
        heads: dict[str, int] = {}
        if count_streams:
            for r in (self.df().where(F.col("stream").isin(count_streams))
                      .groupBy("stream")
                      .agg(F.max("revision").alias("h")).collect()):
                heads[r["stream"]] = int(r["h"])
        rows = []
        for sid, body in bodies.items():
            floor, cutoff = self._retention_cutoff(body)
            if "$maxCount" in body and sid in heads:
                cf = heads[sid] - int(body["$maxCount"]) + 1
                floor = cf if floor is None else max(floor, cf)
            rows.append((sid, floor, cutoff))
        return local_frame(self.spark, 
            rows, "stream string, __floor long, __cutoff long")

    # -- links ------------------------------------------------------------

    def link_to(self, stream: str, target_stream: str, target_revision: int,
                *, uuid: Optional[str] = None,
                expected: ExpectedRevision = ExpectedRevision.any()) -> AppendResult:
        """Append a link event pointing at (target_stream, target_revision)
        — EventStore's ``linkTo`` (absent from the reference; `$>` body
        format per the EventStoreDB convention)."""
        ev = NewEvent(
            uuid=uuid or f"$link-{stream}-{target_stream}-{target_revision}",
            event_type=LINK_EVENT,
            data=f"{target_revision}@{target_stream}",
            content_type="application/octet-stream",
        )
        return self.append(stream, [ev], expected)

    def _resolution_envelope(self, retention_frame=_UNSET) -> DataFrame:
        """The envelope link targets resolve against: per-stream LOGICAL
        visibility — soft-deleted/tombstoned history and out-of-retention
        events excluded — so resolution answers like the target stream's
        own read path and is INVARIANT across ``scavenge()``.
        EventStoreDB's resolveLinkTos reads the target through the
        stream read path, which enforces deletion/$tb/$maxCount, so a
        link into deleted or truncated history is unresolved whether or
        not the rows were physically reclaimed yet ($all itself keeps
        showing those rows until scavenge — a separate, test-pinned
        surface). Before round 15 resolution joined the RAW envelope,
        so the same link resolved pre-scavenge and dangled post-scavenge
        — scavenge was not transparent to link readers.

        Both visibility rules are broadcast joins against small
        per-stream frames (#ever-deleted / #metadata streams rows), so
        the plan shape is constant in deletion churn — see
        ``_deletions_frame``. ``retention_frame`` lets ``read`` pass
        the frame it already built for the ``$all`` branch instead of
        re-running the two bounded metadata collects."""
        df = self.df()
        delf = self._deletions_frame()
        if delf is not None:
            df = self._apply_deletion_filter(df, delf)
        rt = (self._retention_frame() if retention_frame is _UNSET
              else retention_frame)
        if rt is not None:
            df = (df.join(F.broadcast(rt), "stream", "left")
                  .where((F.col("__floor").isNull()
                          | (F.col("revision") >= F.col("__floor")))
                         & (F.col("__cutoff").isNull()
                            | (F.col("created") >= F.col("__cutoff"))))
                  .drop("__floor", "__cutoff"))
        return df

    @staticmethod
    def resolve_links(df: DataFrame, events: DataFrame) -> DataFrame:
        """Replace each `$>` link row's payload columns with its target's.

        A left join against the envelope on the parsed (stream, revision)
        pointer: non-link rows pass through; dangling links keep the link
        body (EventStoreDB surfaces unresolved links the same way). The
        link's own position/revision are preserved so ordering, limits
        and resume positions keep referring to the *link* stream — only
        payload identity changes.

        Scale shape: the probe is page/batch-bounded, but Spark cannot
        build the preserved (left) side of a LeftOuter broadcast join,
        so joining the RAW envelope would broadcast the *envelope* —
        fine at driver SFs, but past the broadcast threshold the
        planner falls back to sort-merge and shuffles the entire corpus
        by (stream, revision) for a page-sized resolved read. So the
        envelope is PRUNED first by the probe's distinct link-target
        streams (collected driver-side — bounded by the page/batch row
        count): the ``isin`` pushes through the visibility joins to the
        parquet scan, prunes it, and the filtered envelope is
        probe-scale, which AQE then broadcasts. A probe with no link
        rows skips the join entirely. Streaming probes can't be
        collected at plan time, so they keep the unpruned stream-static
        join — the wrappers (``Subscription``/``SinkSubscription``)
        resolve per micro-batch with static frames precisely so the
        pruned path engages; the in-plan streaming form is the
        driver-SF fallback for direct ``writeStream`` consumers.
        """
        is_link = F.col("event_type") == LINK_EVENT
        at = F.split(F.col("data"), "@", 2)
        probe = df.withColumns({
            "__tgt_rev": F.when(is_link, F.element_at(at, 1).cast("long")),
            "__tgt_stream": F.when(is_link, F.element_at(at, 2)),
        })
        if not df.isStreaming:
            # bounded: the probe is a page-bounded read result, a
            # replay frame, or one micro-batch — its distinct
            # link-target streams number at most its row count. The
            # limit()+1 caps the collect itself: an UNBOUNDED read over
            # a link stream fanning out to a huge target set must not
            # pull that set to the driver, nor bake it into a giant
            # In() literal (the expression-tree disease the deletions
            # frame fix removed) — past the cap, fall back to the
            # unpruned join and let the planner pick broadcast/SMJ.
            cap = 1024
            tgts = [r[0] for r in probe.select("__tgt_stream")
                    .where(F.col("__tgt_stream").isNotNull())
                    .distinct().limit(cap + 1).collect()]
            if not tgts:
                return df
            if len(tgts) <= cap:
                events = events.where(F.col("stream").isin(tgts))
        tgt = events.select(
            F.col("stream").alias("__t_stream"), F.col("revision").alias("__t_rev"),
            F.col("uuid").alias("__t_uuid"), F.col("data").alias("__t_data"),
            F.col("metadata").alias("__t_metadata"),
            F.col("custom_metadata").alias("__t_custom"),
            F.col("event_type").alias("__t_type"),
            F.col("content_type").alias("__t_ct"), F.col("created").alias("__t_created"),
        )
        joined = probe.join(
            tgt,
            (probe["__tgt_stream"] == tgt["__t_stream"])
            & (probe["__tgt_rev"] == tgt["__t_rev"]),
            "left",
        )
        resolved = F.col("__t_uuid").isNotNull()

        def pick(link_col: str, t_col: str):
            return F.when(resolved, F.col(t_col)).otherwise(F.col(link_col))

        return joined.select(
            F.col("stream"), pick("uuid", "__t_uuid").alias("uuid"),
            pick("data", "__t_data").alias("data"),
            pick("metadata", "__t_metadata").alias("metadata"),
            pick("custom_metadata", "__t_custom").alias("custom_metadata"),
            F.col("revision"), F.col("position"),
            pick("event_type", "__t_type").alias("event_type"),
            pick("content_type", "__t_ct").alias("content_type"),
            pick("created", "__t_created").alias("created"),
        )

    # -- read path --------------------------------------------------------

    def read(self, opts: ReadOptions) -> DataFrame:
        """Execute a read plan. Missing stream -> StreamNotFoundError
        (streams.go:211-222); tombstoned -> StreamDeletedError; a
        soft-deleted stream reads as recreated-or-missing (only events
        appended after the delete are visible)."""
        df = self.df()
        rt_for_resolution = _UNSET
        if opts.stream is not None:
            sid = opts.stream.identifier
            kind, before, _ = self._deletion_state(sid)
            if kind == "tombstoned":
                raise StreamDeletedError(sid)
            if kind == "deleted":
                df = df.where(~((F.col("stream") == sid)
                                & (F.col("position") <= before)))
                head = (df.where(F.col("stream") == sid)
                        .agg(F.max("revision").alias("r")).collect()[0]["r"])
                if head is None:
                    raise StreamNotFoundError(sid)
            elif self.head_revision(sid) is None:
                raise StreamNotFoundError(sid)
            df = self._apply_retention(df, sid)
        else:
            # $all reads honor retention too: one broadcast join against
            # the (metadata-stream-count)-sized retention table — the
            # corpus never shuffles, and logs without metadata skip this
            # entirely (single has-any probe per instance).
            rt = self._retention_frame()
            rt_for_resolution = rt  # reuse below; rebuilding = 2 collects
            if rt is not None:
                df = (df.join(F.broadcast(rt), "stream", "left")
                      .where((F.col("__floor").isNull()
                              | (F.col("revision") >= F.col("__floor")))
                             & (F.col("__cutoff").isNull()
                                | (F.col("created") >= F.col("__cutoff"))))
                      .drop("__floor", "__cutoff"))
        out = compile_read(df, opts)
        if opts.resolve_links:
            from eventstorm_spark.log.plan import _bounds

            out = self.resolve_links(
                out, self._resolution_envelope(rt_for_resolution))
            if opts.stream is not None:
                field, kind, at = "revision", opts.stream.kind, opts.stream.revision
            else:
                field, kind, at = "position", opts.all.kind, opts.all.position
            _, asc, _ = _bounds(kind, opts.direction, at, opts.count)
            out = out.orderBy(F.col(field).asc() if asc else F.col(field).desc())
        return out

    def read_stream(self, stream: str, *, direction: Direction = Direction.FORWARDS,
                    from_revision: Optional[int] = None,
                    boundary: Optional[BoundaryKind] = None,
                    count: int = 0, resolve_links: bool = False) -> DataFrame:
        # Convenience default: a backwards read with no explicit boundary
        # starts at END (the client-intuitive "read latest first"); START
        # + backwards is the degenerate first-event shortcut and must be
        # requested explicitly (backend.go:135-138).
        if boundary is None and from_revision is None:
            kind = BoundaryKind.START if direction == Direction.FORWARDS else BoundaryKind.END
        else:
            kind = boundary or BoundaryKind.AT
        opts = ReadOptions(
            direction=direction, count=count, resolve_links=resolve_links,
            stream=StreamOptions(stream, kind, from_revision or 0),
        )
        return self.read(opts)

    def read_all(self, *, direction: Direction = Direction.FORWARDS,
                 from_position: Optional[int] = None,
                 boundary: Optional[BoundaryKind] = None,
                 filter: Optional[SubscriptionFilter] = None,
                 count: int = 0, resolve_links: bool = False) -> DataFrame:
        if boundary is None and from_position is None:
            kind = BoundaryKind.START if direction == Direction.FORWARDS else BoundaryKind.END
        else:
            kind = boundary or BoundaryKind.AT
        opts = ReadOptions(
            direction=direction, count=count, resolve_links=resolve_links,
            all=AllOptions(kind, from_position or 0, filter),
        )
        return self.read(opts)


    def iter_pages(self, *, page_size: int = 10_000,
                   direction: Direction = Direction.FORWARDS,
                   from_position: Optional[int] = None,
                   filter: Optional[SubscriptionFilter] = None,
                   resolve_links: bool = False):
        """Cursor-paginated ``$all`` read: yields lists of Rows in global
        position order, ``page_size`` at a time.

        This is how an ordered scan of a 100 TB log is actually consumed
        (SCALE.md §3): each page is an independent *bounded* read, which
        compiles to a pushed position-range predicate + top-k
        (TakeOrderedAndProject) over the position-range-sorted files —
        file pruning does the seeking, no job ever global-sorts the
        corpus, and the client holds one page of rows at a time. The
        cursor is the last position seen; crash-resume = pass it back.
        """
        cursor = from_position
        boundary = None if cursor is not None else (
            BoundaryKind.START if direction == Direction.FORWARDS
            else BoundaryKind.END)
        while True:
            rows = self.read_all(
                direction=direction, from_position=cursor, boundary=boundary,
                filter=filter, count=page_size,
                resolve_links=resolve_links).collect()
            if not rows:
                return
            yield rows
            if len(rows) < page_size:
                return
            last = rows[-1]["position"]
            cursor = last + 1 if direction == Direction.FORWARDS else last - 1
            boundary = None
            if direction == Direction.BACKWARDS and cursor < 0:
                return

    # -- maintenance ------------------------------------------------------

    def compact(self, num_files: int = 8) -> None:
        """Rewrite the log into ``num_files`` position-sorted files.

        Small-file hygiene for the many-small-appends pattern; the cluster
        equivalent is Delta OPTIMIZE / file compaction with Z-order on
        (stream, position). ``repartitionByRange`` on position makes the
        output files position-DISJOINT — the property that lets readers
        prune whole files from (min, max) footer statistics (SCALE.md §1).

        Run under the writer lock; the directory overwrite also wipes
        ``_commits/``, so the watermark is re-backfilled from the fresh
        tail afterwards (commit evidence survives compaction). Like every
        rewrite, this assumes no concurrent writer in another process.
        """
        if self.format == "delta":
            raise NotImplementedError(
                "compact on a Delta-backed log maps to Delta OPTIMIZE; "
                "use it (the parquet path's rewrite would bypass the "
                "transaction log)")
        with self._lock:
            df = (self.df().repartitionByRange(num_files, "position")
                  .sortWithinPartitions("position"))
            tmp = self.path.rstrip("/") + ".compact"
            df.write.mode("overwrite").parquet(tmp)
            back = self.spark.read.schema(EVENT_SCHEMA).parquet(tmp)
            back.write.mode("overwrite").parquet(self.path)
            import shutil as _shutil
            _shutil.rmtree(tmp, ignore_errors=True)  # full-size copy
            self._tail_position = None
            self._restore_watermark_after_rewrite()

    def _restore_watermark_after_rewrite(self) -> None:
        """A directory-overwrite rewrite (compact/scavenge) destroys
        ``_commits/`` and with it the watermark; re-backfill it from the
        freshly-read tail so stale-cache fences keep working."""
        if self._commit_protocol != "marker":
            return
        self._watermark_checked = False
        self._ensure_watermark()
