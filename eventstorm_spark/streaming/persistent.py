"""Persistent subscriptions — competing consumers over the event log.

The reference declares the full EventStoreDB PersistentSubscriptions
service but never implements or registers it
(``internal/transport/grpc/persistent.proto:8-16``, absent from
``cmd/main.go:31-34``). This module implements the proto's declared
semantics (Create/Read/Ack/Nack with Park/Retry/Skip actions, parked
replay, RoundRobin and Pinned consumer strategies) on engine terms:

- the subscription *group* owns a durable delivery state — last
  checkpointed position, in-flight deliveries with retry counts, parked
  positions — persisted as JSON next to the log (a Delta/keyvalue table
  on a cluster; the state is O(in-flight + parked), never O(log));
- events are fetched in position order from the shared log via the
  ordinary read path (one reader per group, so the log itself needs no
  per-consumer bookkeeping — the fan-out to consumers is driver-side
  dispatch, matching the reference's single-server dispatcher role);
- Ack advances the checkpoint past contiguous completions; Nack applies
  the proto's actions: Park (dead-letter, replayable), Retry (redeliver,
  bounded by ``max_retry_count`` then parked), Skip (complete without
  processing).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import functions as F

from eventstorm_spark.errors import EventStormError

ROUND_ROBIN = "RoundRobin"
PINNED = "Pinned"  # pin by stream id hash
DISPATCH_TO_SINGLE = "DispatchToSingle"


class SubscriptionGroupExistsError(EventStormError):
    pass


def _pin_hash(stream_id: str) -> int:
    """Deterministic stream-id hash for the Pinned strategy: the first
    15 hex chars of md5 as an int — stable across processes and runs
    (Python's builtin ``hash`` is salted per process), and computable
    engine-side (``md5`` + ``conv``) so the in-memory and sink
    dispatchers pin identically."""
    import hashlib

    return int(hashlib.md5(stream_id.encode()).hexdigest()[:15], 16)


@dataclass
class _Delivery:
    position: int
    consumer: str
    retries: int = 0


@dataclass
class GroupInfo:
    """GetInfo analogue — persistent.proto GetInfoResp."""

    group: str
    stream: Optional[str]
    last_checkpoint: int
    in_flight: int
    parked: int
    consumers: list = field(default_factory=list)


class PersistentSubscription:
    """One subscription group on a stream (or $all when stream=None).

    ``filter`` (a ``SubscriptionFilter``, $all groups only — matching
    EventStoreDB, which supports filters on ``$all`` persistent
    subscriptions but not stream ones) restricts delivery server-side:
    non-matching events are never delivered, and the checkpoint WALKS
    PAST them — the filtered cursor read proves every position up to
    the scan high-watermark was examined, so a position neither
    delivered nor pending there is known non-matching and implicitly
    complete (otherwise the contiguous-position checkpoint would stall
    on the first non-matching event forever and the skip set would
    grow unboundedly)."""

    def __init__(self, log, group: str, stream: Optional[str] = None, *,
                 start_from: int = 0, max_retry_count: int = 3,
                 consumer_strategy: str = ROUND_ROBIN,
                 filter=None, resolve_links: bool = False,
                 state_dir: Optional[str] = None):
        if filter is not None and stream is not None:
            raise ValueError(
                "filters apply to $all persistent subscriptions only "
                "(EventStoreDB semantics); use a stream-scoped group "
                "without a filter instead")
        self.log = log
        self.group = group
        self.stream = stream
        self.filter = filter
        # EventStoreDB's resolveLinkTos on persistent groups: delivered
        # link rows carry their TARGET's payload identity under the
        # LINK's coordinates. Positions/revisions are untouched, so the
        # whole checkpoint/ack/park/replay state machine is oblivious
        # to resolution; filters evaluate on the ORIGINAL (link) rows
        # — both exactly EventStoreDB's contract.
        self.resolve_links = resolve_links
        # highest position the filtered cursor has provably examined
        self._scan_hwm = start_from - 1
        self.max_retry_count = max_retry_count
        self.strategy = consumer_strategy
        self._consumers: list[str] = []
        self._rr_next = 0
        # checkpoint: every position <= this is complete (acked/skipped)
        self._checkpoint = start_from - 1
        self._in_flight: dict[int, _Delivery] = {}
        self._completed: set[int] = set()  # acked > checkpoint, not yet contiguous
        self._parked: dict[int, int] = {}  # position -> retry count at park time
        self._retry_counts: dict[int, int] = {}  # pending redeliveries
        # parked positions put back in play by ReplayParked; served before
        # the cursor (they sit BEHIND the checkpoint, which treats parked
        # events as complete so they never block the live cursor)
        self._replay_queue: list[int] = []
        self._log_floor: Optional[int] = None  # cached min position/revision
        self._state_path = None
        if state_dir is not None:
            os.makedirs(state_dir, exist_ok=True)
            self._state_path = os.path.join(state_dir, f"{group}.json")
            self._load()

    # -- consumer membership ----------------------------------------------

    def connect(self, consumer: str) -> None:
        if consumer not in self._consumers:
            self._consumers.append(consumer)

    def disconnect(self, consumer: str) -> None:
        """Drop a consumer; its in-flight deliveries are redelivered."""
        self._consumers = [c for c in self._consumers if c != consumer]
        for pos, d in list(self._in_flight.items()):
            if d.consumer == consumer:
                del self._in_flight[pos]

    # -- delivery ----------------------------------------------------------

    def _assign(self, stream_id: str) -> str:
        if not self._consumers:
            raise EventStormError("no consumers connected")
        if self.strategy == PINNED:
            return self._consumers[_pin_hash(stream_id)
                                   % len(self._consumers)]
        if self.strategy == DISPATCH_TO_SINGLE:
            return self._consumers[0]
        c = self._consumers[self._rr_next % len(self._consumers)]
        self._rr_next += 1
        return c

    def _envelope(self):
        """One resolution envelope per fetch/dispatch call, shared by
        the replay frame AND the cursor read — rebuilding it per frame
        re-ran the deletions collect and both retention-metadata
        collects twice per call (the very re-collect read()'s
        rt_for_resolution reuse avoids). None when resolution is off."""
        if not self.resolve_links:
            return None
        return self.log._resolution_envelope()

    def _resolved(self, df, env=None):
        """Apply resolveLinkTos to a delivery frame when enabled (link
        coordinates preserved — see ``__init__``); identity otherwise.
        ``env`` is the per-call shared envelope from ``_envelope``."""
        if not self.resolve_links:
            return df
        from eventstorm_spark.log.store import EventLog

        return EventLog.resolve_links(
            df, env if env is not None else self.log._resolution_envelope())

    def fetch(self, max_count: int = 32) -> dict[str, list]:
        """Pull the next batch past the checkpoint and assign per the
        consumer strategy. Returns consumer -> [event Row]. Events already
        in flight, completed, or parked are excluded."""
        # Guard BEFORE any state mutation (dispatch() does the same):
        # _assign raising mid-loop used to leave the replay queue
        # already truncated, losing replayed positions until a restart
        # reloaded the persisted state.
        if not self._consumers:
            raise EventStormError("no consumers connected")
        skip = set(self._in_flight) | self._completed | set(self._parked)
        pos_field = "revision" if self.stream is not None else "position"
        env = self._envelope()  # one envelope per call (replay + cursor)
        rows = []
        replay_take: set[int] = set()
        if self._replay_queue:
            take = self._replay_queue[:max_count]
            replay_take = set(take)
            base = self.log.df()
            if self.stream is not None:
                base = base.where(F.col("stream") == self.stream)
            rows.extend(
                self._resolved(base.where(F.col(pos_field).isin(take)), env)
                .orderBy(pos_field).collect()
            )
            self._replay_queue = self._replay_queue[len(take):]
        requested = max_count + len(skip)
        # tail snapshot BEFORE the cursor read: a short page proves the
        # scan reached the tail as of read time >= this snapshot, so the
        # snapshot is a safe examined bound — events appended between
        # the snapshot and the read sit above it and stay pending
        tail_before = (self.log.tail_position()
                       if self.filter is not None else None)
        if self.stream is not None:
            # A group may be created BEFORE its stream's first append
            # (EventStoreDB allows it); a missing stream is an empty
            # page, not an error — the group just waits.
            from eventstorm_spark.errors import StreamNotFoundError
            try:
                # cursor read unresolved, then resolve against the
                # SHARED envelope (coordinates preserved, so
                # page-then-resolve == read(resolve_links=True))
                df = self.log.read_stream(self.stream,
                                          from_revision=self._checkpoint + 1,
                                          count=requested)
                df = self._resolved(df, env).orderBy(pos_field)
                cursor_rows = df.collect()
            except StreamNotFoundError:
                cursor_rows = []
        else:
            df = self.log.read_all(from_position=self._checkpoint + 1,
                                   count=requested, filter=self.filter)
            df = self._resolved(df, env).orderBy(pos_field)
            cursor_rows = df.collect()
        rows.extend(cursor_rows)
        out: dict[str, list] = {}
        undelivered: list[int] = []  # matching cursor rows cut by the
        requeue: list[int] = []      # in-flight cap — must stay pending
        seen: set[int] = set()
        for r in rows:
            p = r[pos_field]
            # `p in seen`: a replayed position the cursor page ALSO
            # returned was already handled from the replay copy earlier
            # in this loop — skip the duplicate whether the first copy
            # was delivered OR requeued at the in-flight cap (a double
            # requeue would redeliver the event after its ack)
            if p in skip or p in seen:
                continue
            seen.add(p)
            if len(self._in_flight) >= max_count:
                if p in replay_take:
                    requeue.append(p)  # back onto the replay queue
                else:
                    undelivered.append(p)
                continue
            consumer = self._assign(r["stream"])
            self._in_flight[p] = _Delivery(p, consumer,
                                           retries=self._retry_counts.get(p, 0))
            out.setdefault(consumer, []).append(r)
        if requeue:
            self._replay_queue = requeue + self._replay_queue
        if self.filter is not None:
            # scan proof for checkpoint advancement: a full page proves
            # everything below its max position was examined; a short
            # page proves the scan reached the log tail (pre-read
            # snapshot). Either way the proof is capped just below the
            # first matching row that was NOT consumed this call —
            # otherwise _advance would walk the checkpoint past a
            # delivered-to-nobody event permanently.
            if len(cursor_rows) >= requested and cursor_rows:
                bound = max(r["position"] for r in cursor_rows)
            else:
                bound = tail_before
            if bound is not None:
                if undelivered:
                    bound = min(bound, min(undelivered) - 1)
                self._scan_hwm = max(self._scan_hwm, bound)
        self._save()
        return out

    # -- ack / nack --------------------------------------------------------

    def ack(self, positions: list[int]) -> None:
        for p in positions:
            if p in self._in_flight:
                del self._in_flight[p]
                self._completed.add(p)
                self._retry_counts.pop(p, None)
        self._advance()
        self._save()

    def nack(self, positions: list[int], action: str = "Retry",
             reason: str = "") -> None:
        """persistent.proto Nack.Action: Park | Retry | Skip | Stop."""
        for p in positions:
            d = self._in_flight.pop(p, None)
            if d is None:
                continue
            if action == "Skip":
                self._completed.add(p)
                self._retry_counts.pop(p, None)
            elif action == "Park":
                self._parked[p] = d.retries
            else:  # Retry (Stop treated as Retry for delivery bookkeeping)
                retries = d.retries + 1
                if retries > self.max_retry_count:
                    self._parked[p] = retries
                    self._retry_counts.pop(p, None)
                else:
                    self._retry_counts[p] = retries
        self._advance()
        self._save()

    def replay_parked(self) -> int:
        """ReplayParked RPC: parked events re-enter delivery with a fresh
        retry budget. Returns the number replayed."""
        n = len(self._parked)
        for p in sorted(self._parked):
            self._retry_counts[p] = 0
            self._replay_queue.append(p)
        self._parked.clear()
        self._save()
        return n

    def _floor(self) -> Optional[int]:
        """Smallest existing position/revision in the group's scope
        (None while the scope is empty), cached after first success.
        Positions below it were never assigned, so they are implicitly
        complete — the origin case of gap-skipping: $all positions
        start at 1 while a fresh group's checkpoint starts at
        ``start_from - 1`` (-1 by default), and without this the
        checkpoint would wait forever for position 0, the completed
        set would grow O(history), and replayed parked events would
        sit AHEAD of the checkpoint where the live cursor re-reads
        them (the invariant the replay queue's design leans on is that
        parked positions live BEHIND the checkpoint)."""
        if self._log_floor is None:
            pos_field = "revision" if self.stream is not None else "position"
            base = self.log.df()
            if self.stream is not None:
                base = base.where(F.col("stream") == self.stream)
            row = base.agg(F.min(pos_field).alias("m")).collect()[0]
            if row["m"] is not None:
                self._log_floor = int(row["m"])
        return self._log_floor

    def _advance(self) -> None:
        # checkpoint moves past contiguous completed/parked positions;
        # parked events are "done" for ordering purposes (they live in
        # the park list, not the stream cursor). With a filter, a
        # position at or below the scan high-watermark that is neither
        # delivered nor pending is known NON-MATCHING (the filtered
        # cursor examined it and returned nothing) — implicitly
        # complete, so the checkpoint walks past it.
        while True:
            p = self._checkpoint + 1
            if p in self._completed or p in self._parked:
                self._completed.discard(p)
                self._checkpoint = p
                continue
            if (self.filter is not None and p <= self._scan_hwm
                    and p not in self._in_flight
                    and p not in self._retry_counts):
                self._checkpoint = p
                continue
            floor = self._floor()
            if floor is not None and p < floor:
                # below the first assigned position: implicitly complete
                self._checkpoint = floor - 1
                continue
            break
        # acked replays live below the checkpoint — drop them so the
        # completed set stays O(out-of-order acks), not O(history); same
        # pruning for retry counts, which otherwise pin every position
        # that was ever retried and keep the state O(history)
        self._completed = {p for p in self._completed if p > self._checkpoint}
        self._retry_counts = {p: n for p, n in self._retry_counts.items()
                              if p > self._checkpoint}

    # -- introspection / persistence --------------------------------------

    def info(self) -> GroupInfo:
        return GroupInfo(
            group=self.group, stream=self.stream,
            last_checkpoint=self._checkpoint,
            in_flight=len(self._in_flight),
            parked=len(self._parked),
            consumers=list(self._consumers),
        )

    def _save(self) -> None:
        if self._state_path is None:
            return
        doc = {
            "checkpoint": self._checkpoint,
            "scan_hwm": self._scan_hwm,
            "completed": sorted(self._completed),
            "parked": self._parked and {str(k): v for k, v in self._parked.items()},
            "retry_counts": {str(k): v for k, v in self._retry_counts.items()},
            "replay_queue": list(self._replay_queue),
        }
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._state_path)

    def _load(self) -> None:
        if self._state_path is None or not os.path.exists(self._state_path):
            return
        with open(self._state_path) as f:
            doc = json.load(f)
        self._checkpoint = doc["checkpoint"]
        self._scan_hwm = doc.get("scan_hwm", self._checkpoint)
        self._completed = set(doc.get("completed") or [])
        self._parked = {int(k): v for k, v in (doc.get("parked") or {}).items()}
        self._retry_counts = {int(k): v
                              for k, v in (doc.get("retry_counts") or {}).items()}
        self._replay_queue = list(doc.get("replay_queue") or [])


class SinkPersistentSubscription(PersistentSubscription):
    """Sink-mode dispatch — the scale path for persistent subscriptions,
    mirroring ``subscriptions.SinkSubscription``: each ``dispatch()``
    computes the batch's consumer assignment ENGINE-side and appends the
    full envelope rows to a parquet delivery table partitioned by
    consumer; event payloads never pass through the driver (the
    in-memory ``fetch()`` collects whole rows and remains the
    test-harness/client surface). The driver keeps only the group's
    O(in-flight + parked) bookkeeping, updated from an id-level metadata
    collect bounded by ``max_count``.

    Delivery contract:

    - the sink gains ``consumer`` (partition column — a consumer's
      reader is a partition-pruned scan of its own directory),
      ``attempt`` (retry count at dispatch time, so a redelivery is
      distinguishable from its first attempt), ``batch_id`` (monotonic
      per dispatch, recovered from the sink on restart) and
      ``batch_seq`` (1-based order within the batch); a consumer
      processes ``ORDER BY batch_id, batch_seq``, which replays the
      exact order the driver dispatcher would have pushed (replayed
      parked events first, then the cursor in position order);
    - assignment strategies are expressed as columns: RoundRobin is
      ``consumers[(rr_next + batch_seq - 1) % k]`` (continues the
      driver's rotation counter), Pinned hashes the stream id with the
      SAME md5-derived rule as the in-memory path (``_pin_hash`` —
      deterministic across runs and engines), DispatchToSingle is a
      literal;
    - ack/nack/park/replay/checkpoint semantics are INHERITED unchanged
      — they operate on positions, which is exactly the metadata the
      dispatch collect brings back;
    - the batch is materialized once (``localCheckpoint``) before the
      sink write and the metadata collect, so the two cannot diverge
      under concurrent appends.

    The in-batch ``row_number`` runs on a single partition — fine
    because the candidate frame is bounded by ``max_count + |skip|``
    rows by construction (the same boundedness argument as the ordinary
    sink subscription's per-batch sort).
    """

    def __init__(self, log, group: str, stream: Optional[str] = None, *,
                 sink_path: str, start_from: int = 0,
                 max_retry_count: int = 3,
                 consumer_strategy: str = ROUND_ROBIN,
                 filter=None, resolve_links: bool = False,
                 state_dir: Optional[str] = None):
        super().__init__(log, group, stream, start_from=start_from,
                         max_retry_count=max_retry_count,
                         consumer_strategy=consumer_strategy,
                         filter=filter, resolve_links=resolve_links,
                         state_dir=state_dir)
        from pyspark.errors import AnalysisException

        self.sink_path = sink_path
        self._spark = log.spark
        try:
            row = (self._spark.read.parquet(sink_path)
                   .agg(F.max("batch_id").alias("m")).collect()[0])
            self._batch_seq = int(row["m"]) if row["m"] is not None else 0
        except AnalysisException as e:
            # only a missing sink means "fresh dispatcher" — any other
            # read failure must not silently restart batch_id at 0 (the
            # sink would then carry duplicate batch ids)
            if "PATH_NOT_FOUND" not in str(e) and \
                    "Path does not exist" not in str(e):
                raise
            self._batch_seq = 0

    def dispatch(self, max_count: int = 32) -> int:
        """Assign and deliver the next batch into the sink table.
        Returns the number of events dispatched. The driver never sees
        payloads — only the (position, consumer) id pairs it needs for
        in-flight bookkeeping."""
        from pyspark.sql import Window as W

        if not self._consumers:
            raise EventStormError("no consumers connected")
        slots = max_count - len(self._in_flight)
        if slots <= 0:
            return 0
        pos_field = "revision" if self.stream is not None else "position"
        skip = set(self._in_flight) | self._completed | set(self._parked)
        env = self._envelope()  # one envelope per call (replay + cursor)

        frames = []
        take: list[int] = []
        if self._replay_queue:
            take = [int(p) for p in self._replay_queue[:max_count]]
            base = self.log.df()
            if self.stream is not None:
                base = base.where(F.col("stream") == self.stream)
            frames.append(
                self._resolved(base.where(F.col(pos_field).isin(take)), env)
                .withColumn("__prio", F.lit(0)))
        requested = max_count + len(skip)
        # tail snapshot BEFORE the cursor read — same short-page bound
        # as fetch(): appends racing the scan land above the snapshot
        # and stay pending instead of being walked past
        tail_before = (self.log.tail_position()
                       if self.filter is not None else None)
        if self.stream is not None:
            # missing stream = empty page (same contract as fetch())
            from eventstorm_spark.errors import StreamNotFoundError
            try:
                # unresolved cursor read + shared-envelope resolution —
                # same page-then-resolve equivalence as fetch()
                cur = self.log.read_stream(self.stream,
                                           from_revision=self._checkpoint + 1,
                                           count=requested)
                cur = self._resolved(cur, env)
            except StreamNotFoundError:
                cur = self.log.df().where(F.lit(False))
        else:
            cur = self.log.read_all(from_position=self._checkpoint + 1,
                                    count=requested, filter=self.filter)
            cur = self._resolved(cur, env)
        # materialize the page once (bounded: <= requested rows) so the
        # scan-proof stats and the dispatched batch see the SAME rows
        cur = cur.localCheckpoint(eager=True)
        if self.filter is not None:
            st = cur.agg(F.count(F.lit(1)).alias("n"),
                         F.max("position").alias("m")).collect()[0]
        if take:
            # a replayed position the checkpoint has not passed yet can
            # ALSO surface in the cursor page — without this exclusion
            # the union would deliver it twice in one batch (the replay
            # frame wins: fresh retry budget + replayed-first priority)
            cur = cur.where(~F.col(pos_field).isin(take))
        frames.append(cur.withColumn("__prio", F.lit(1)))
        cand = frames[0]
        for f in frames[1:]:
            cand = cand.unionByName(f)
        if skip:
            cand = cand.where(
                ~F.col(pos_field).isin([int(p) for p in sorted(skip)]))

        pre_cut = cand.withColumn(
            "batch_seq",
            F.row_number().over(W.orderBy("__prio", pos_field)))
        cand = (pre_cut.where(F.col("batch_seq") <= slots)
                .drop("__prio"))

        k = len(self._consumers)
        arr = F.array(*[F.lit(c) for c in self._consumers])
        if self.strategy == PINNED:
            pin = F.conv(F.substring(F.md5(F.col("stream")), 1, 15),
                         16, 10).cast("long")
            cons = F.element_at(
                arr, (F.pmod(pin, F.lit(k)) + 1).cast("int"))
        elif self.strategy == DISPATCH_TO_SINGLE:
            cons = F.lit(self._consumers[0])
        else:  # RoundRobin, continuing the driver's rotation counter
            cons = F.element_at(
                arr, (F.pmod(F.lit(self._rr_next) + F.col("batch_seq") - 1,
                             F.lit(k)) + 1).cast("int"))
        if self._retry_counts:
            rmap = F.create_map(*[F.lit(v) for p, n in
                                  self._retry_counts.items()
                                  for v in (int(p), int(n))])
            attempt = F.coalesce(rmap[F.col(pos_field)], F.lit(0))
        else:
            attempt = F.lit(0)

        self._batch_seq += 1
        out = (cand.withColumn("consumer", cons)
               .withColumn("attempt", attempt.cast("int"))
               .withColumn("batch_id", F.lit(self._batch_seq)))
        # one materialization feeds the sink write AND the metadata
        # collect — they cannot diverge under concurrent appends
        out = out.localCheckpoint(eager=True)
        out.write.mode("append").partitionBy("consumer").parquet(self.sink_path)

        meta = out.select(pos_field, "consumer").collect()  # bounded: <= max_count id pairs
        dispatched = set()
        for r in meta:
            p = int(r[pos_field])
            dispatched.add(p)
            self._in_flight[p] = _Delivery(
                p, r["consumer"], retries=self._retry_counts.get(p, 0))
        if self.strategy == ROUND_ROBIN:
            self._rr_next += len(meta)
        if self._replay_queue:
            keep = set(self._replay_queue) - dispatched
            if take and (set(take) - dispatched - skip):
                # Guard: only positions neither dispatched nor in the
                # skip set can be ghosts — in the common all-dispatched
                # batch the replay-frame re-scan below is pure cost.
                # A taken position that produced NO candidate row is
                # physically gone (its stream deleted AND scavenged
                # between park and replay) — drop it, or it squats at
                # the queue head forever and, once ghosts fill a
                # max_count page, blocks every later parked replay
                # (fetch() already drops these by truncating its queue
                # up-front). Detected on the PRE-slot-cut frame so a
                # merely slot-cut replay row — present but not
                # dispatched this batch — stays queued.
                present = {int(r[pos_field]) for r in
                           pre_cut.where(F.col("__prio") == 0)
                           .select(pos_field).collect()}  # bounded: <= max_count ids
                # skip-set members are absent from pre_cut without
                # being gone — never classify those as ghosts
                keep -= (set(take) - present) - skip
            self._replay_queue = [p for p in self._replay_queue
                                  if p in keep]
        if self.filter is not None:
            # scan proof, capped just below the first matching cursor
            # row the slot cut left undispatched (same rule as fetch())
            if st["n"] >= requested and st["m"] is not None:
                bound = int(st["m"])
            else:
                bound = tail_before
            if bound is not None:
                und = (pre_cut.where((F.col("__prio") == 1)
                                     & (F.col("batch_seq") > slots))
                       .agg(F.min(pos_field).alias("u")).collect()[0]["u"])
                if und is not None:
                    bound = min(bound, int(und) - 1)
                self._scan_hwm = max(self._scan_hwm, bound)
        self._save()
        return len(meta)

    def deliveries(self, consumer: Optional[str] = None):
        """The delivery table (envelope + consumer/attempt/batch_id/
        batch_seq). With ``consumer``, the scan is partition-pruned to
        that consumer's directory; process ``ORDER BY batch_id,
        batch_seq``."""
        df = self._spark.read.parquet(self.sink_path)
        if consumer is not None:
            df = df.where(F.col("consumer") == consumer)
        return df


class PersistentSubscriptions:
    """The Create/Delete/List/GetInfo service surface
    (persistent.proto:8-16) over a dict of groups."""

    def __init__(self, log, state_dir: Optional[str] = None):
        self.log = log
        self.state_dir = state_dir
        self._groups: dict[tuple, PersistentSubscription] = {}

    def create(self, group: str, stream: Optional[str] = None, *,
               sink_path: Optional[str] = None,
               **settings) -> PersistentSubscription:
        """Create a group; ``sink_path`` selects the sink-mode
        dispatcher (payloads delivered to a consumer-partitioned
        parquet table instead of driver buffers)."""
        key = (group, stream)
        if key in self._groups:
            raise SubscriptionGroupExistsError(f"group exists: {group}")
        if sink_path is not None:
            sub: PersistentSubscription = SinkPersistentSubscription(
                self.log, group, stream, sink_path=sink_path,
                state_dir=self.state_dir, **settings)
        else:
            sub = PersistentSubscription(self.log, group, stream,
                                         state_dir=self.state_dir, **settings)
        self._groups[key] = sub
        return sub

    def delete(self, group: str, stream: Optional[str] = None) -> None:
        sub = self._groups.pop((group, stream), None)
        if sub is not None and sub._state_path and os.path.exists(sub._state_path):
            os.remove(sub._state_path)

    def list(self) -> list[GroupInfo]:
        return [s.info() for s in self._groups.values()]

    def get_info(self, group: str, stream: Optional[str] = None) -> GroupInfo:
        return self._groups[(group, stream)].info()
