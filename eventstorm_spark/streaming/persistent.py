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
    """One subscription group on a stream (or $all when stream=None)."""

    def __init__(self, log, group: str, stream: Optional[str] = None, *,
                 start_from: int = 0, max_retry_count: int = 3,
                 consumer_strategy: str = ROUND_ROBIN,
                 state_dir: Optional[str] = None):
        self.log = log
        self.group = group
        self.stream = stream
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
            return self._consumers[hash(stream_id) % len(self._consumers)]
        if self.strategy == DISPATCH_TO_SINGLE:
            return self._consumers[0]
        c = self._consumers[self._rr_next % len(self._consumers)]
        self._rr_next += 1
        return c

    def fetch(self, max_count: int = 32) -> dict[str, list]:
        """Pull the next batch past the checkpoint and assign per the
        consumer strategy. Returns consumer -> [event Row]. Events already
        in flight, completed, or parked are excluded."""
        skip = set(self._in_flight) | self._completed | set(self._parked)
        pos_field = "revision" if self.stream is not None else "position"
        rows = []
        if self._replay_queue:
            take = self._replay_queue[:max_count]
            base = self.log.df()
            if self.stream is not None:
                base = base.where(F.col("stream") == self.stream)
            rows.extend(
                base.where(F.col(pos_field).isin(take))
                .orderBy(pos_field).collect()
            )
            self._replay_queue = self._replay_queue[len(take):]
        if self.stream is not None:
            df = self.log.read_stream(self.stream,
                                      from_revision=self._checkpoint + 1,
                                      count=max_count + len(skip))
        else:
            df = self.log.read_all(from_position=self._checkpoint + 1,
                                   count=max_count + len(skip))
        rows.extend(df.collect())
        out: dict[str, list] = {}
        for r in rows:
            p = r[pos_field]
            if p in skip:
                continue
            if len(self._in_flight) >= max_count:
                break
            consumer = self._assign(r["stream"])
            self._in_flight[p] = _Delivery(p, consumer,
                                           retries=self._retry_counts.get(p, 0))
            out.setdefault(consumer, []).append(r)
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

    def _advance(self) -> None:
        # checkpoint moves past contiguous completed/parked positions;
        # parked events are "done" for ordering purposes (they live in
        # the park list, not the stream cursor)
        while (self._checkpoint + 1) in self._completed or \
              (self._checkpoint + 1) in self._parked:
            p = self._checkpoint + 1
            self._completed.discard(p)
            self._checkpoint = p
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
        self._completed = set(doc.get("completed") or [])
        self._parked = {int(k): v for k, v in (doc.get("parked") or {}).items()}
        self._retry_counts = {int(k): v
                              for k, v in (doc.get("retry_counts") or {}).items()}
        self._replay_queue = list(doc.get("replay_queue") or [])


class PersistentSubscriptions:
    """The Create/Delete/List/GetInfo service surface
    (persistent.proto:8-16) over a dict of groups."""

    def __init__(self, log, state_dir: Optional[str] = None):
        self.log = log
        self.state_dir = state_dir
        self._groups: dict[tuple, PersistentSubscription] = {}

    def create(self, group: str, stream: Optional[str] = None,
               **settings) -> PersistentSubscription:
        key = (group, stream)
        if key in self._groups:
            raise SubscriptionGroupExistsError(f"group exists: {group}")
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
