"""Persistent subscriptions (T9) — competing consumers, ack/nack with
Park/Retry/Skip, parked replay, consumer strategies, durable state.

The reference declares this service in persistent.proto:8-16 but never
implements it; semantics here follow the proto's declared API.
"""

from __future__ import annotations

import pytest

from eventstorm_spark.log.store import EventLog
from eventstorm_spark.streaming.persistent import (
    PINNED,
    PersistentSubscription,
    PersistentSubscriptions,
    SubscriptionGroupExistsError,
)

from tests.fixtures import new_events


@pytest.fixture()
def log(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "log"))
    log.append("s", new_events(10))
    return log


def test_round_robin_competing_consumers(log):
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    sub.connect("c2")
    batch = sub.fetch(max_count=10)
    assert len(batch["c1"]) == 5 and len(batch["c2"]) == 5
    # disjoint delivery — competing, not broadcast
    r1 = {r["revision"] for r in batch["c1"]}
    r2 = {r["revision"] for r in batch["c2"]}
    assert r1 | r2 == set(range(10)) and not (r1 & r2)


def test_ack_advances_checkpoint_and_stops_redelivery(log):
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    batch = sub.fetch(max_count=4)
    sub.ack([r["revision"] for r in batch["c1"]])
    assert sub.info().last_checkpoint == 3
    nxt = sub.fetch(max_count=4)
    assert [r["revision"] for r in nxt["c1"]] == [4, 5, 6, 7]


def test_nack_retry_redelivers_until_parked(log):
    sub = PersistentSubscription(log, "g", "s", max_retry_count=2)
    sub.connect("c1")
    first = sub.fetch(max_count=1)["c1"][0]["revision"]
    assert first == 0
    nxt = None
    for _ in range(3):  # retries 1..2 redeliver; 3rd nack exceeds -> park
        sub.nack([first], "Retry")
        got = sub.fetch(max_count=1).get("c1", [])
        if not got:
            break
        if got[0]["revision"] != first:
            nxt = got[0]["revision"]
            break
    assert sub.info().parked == 1
    # parked event no longer blocks the cursor — delivery moved on to rev 1
    assert nxt == 1


def test_nack_skip_completes_without_processing(log):
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    batch = sub.fetch(max_count=2)["c1"]
    sub.nack([batch[0]["revision"]], "Skip")
    sub.ack([batch[1]["revision"]])
    assert sub.info().last_checkpoint == 1


def test_park_and_replay(log):
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    batch = sub.fetch(max_count=3)["c1"]
    sub.nack([batch[0]["revision"]], "Park", reason="poison")
    assert sub.info().parked == 1
    assert sub.replay_parked() == 1
    redelivered = sub.fetch(max_count=10)["c1"]
    assert batch[0]["revision"] in {r["revision"] for r in redelivered}


def test_replayed_park_ahead_of_checkpoint_delivers_once(log):
    """A parked position the checkpoint has NOT passed yet (earlier
    events still in flight) is visible to BOTH the replay queue and the
    live cursor after ReplayParked — it must deliver exactly once per
    fetch (regression: the cursor copy used to ride along as a
    duplicate)."""
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    batch = sub.fetch(max_count=10)["c1"]
    assert len(batch) == 10
    sub.nack([5], "Park")
    sub.ack([0, 1, 2])          # checkpoint = 2, still below the park
    assert sub.info().last_checkpoint == 2
    assert sub.replay_parked() == 1
    redelivered = sub.fetch(max_count=10)["c1"]
    assert [r["revision"] for r in redelivered] == [5]


def test_replay_requeued_at_cap_not_duplicated(log):
    """Cap-full twin of the replay dedup regression: when the in-flight
    cap forces the replay copy back onto the queue, the cursor copy of
    the same position must not requeue it a second time — a stale
    duplicate queue entry would redeliver the event AFTER its ack (a
    protocol violation with no nack)."""
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    sub.fetch(max_count=10)
    sub.nack([5], "Park")
    assert sub.replay_parked() == 1
    got = sub.fetch(max_count=9)   # cap already full: nothing delivers
    assert got == {}
    assert sub._replay_queue == [5]  # requeued ONCE, not [5, 5]
    sub.ack([r for r in range(10) if r != 5])
    redelivered = sub.fetch(max_count=10)["c1"]
    assert [r["revision"] for r in redelivered] == [5]
    sub.ack([5])
    assert sub.fetch(max_count=10) == {}  # acked — never comes back


def test_all_group_checkpoint_advances_past_origin(spark, tmp_path):
    """$all positions start at 1 while a fresh group's checkpoint
    starts at -1; the checkpoint must lift over the never-assigned
    origin gap instead of waiting for position 0 forever (regression:
    it stalled, the completed set grew O(history), and replayed parked
    events sat AHEAD of the stuck checkpoint where the cursor re-read
    them — double delivery through the sink dispatcher)."""
    log = EventLog(spark, str(tmp_path / "log3"))
    log.append("s1", new_events(3, prefix="a"))
    log.append("s2", new_events(3, prefix="b"))
    sub = PersistentSubscription(log, "g", None)
    sub.connect("c1")
    batch = sub.fetch(max_count=10)["c1"]
    assert len(batch) == 6
    sub.ack([r["position"] for r in batch])
    assert sub.info().last_checkpoint == log.tail_position()
    assert not sub._completed  # pruned — no O(history) growth


def test_sink_replay_ahead_of_checkpoint_single_delivery(spark, tmp_path):
    """Sink-mode twin of the fetch dedup regression: park every 3rd
    $all position while the checkpoint is behind, replay, dispatch —
    each parked position lands in the sink exactly once for the replay
    batch."""
    from pyspark.sql import functions as F

    from eventstorm_spark.streaming.persistent import \
        SinkPersistentSubscription

    log = EventLog(spark, str(tmp_path / "log4"))
    log.append("s1", new_events(6, prefix="a"))
    sub = SinkPersistentSubscription(
        log, "g", None, sink_path=str(tmp_path / "sink4"))
    sub.connect("c1")
    sub.dispatch(max_count=10)
    sub.nack([3, 6], "Park")
    sub.ack([1, 2])             # checkpoint = 3 (park folds in), 4,5 in flight
    sub.replay_parked()
    sub.dispatch(max_count=10)  # replay frame + cursor page overlap
    b2 = (sub.deliveries().where(F.col("batch_id") == 2)
          .groupBy("position").count().collect())
    assert {int(r["position"]): int(r["count"]) for r in b2} == {3: 1, 6: 1}


def test_pinned_strategy_pins_streams(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "log2"))
    for s in ["a", "b", "c", "d"]:
        log.append(s, new_events(3, prefix=s))
    sub = PersistentSubscription(log, "g", None, consumer_strategy=PINNED)
    sub.connect("c1")
    sub.connect("c2")
    batch = sub.fetch(max_count=12)
    owner = {}
    for consumer, rows in batch.items():
        for r in rows:
            assert owner.setdefault(r["stream"], consumer) == consumer


def test_disconnect_redelivers_in_flight(log):
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    sub.connect("c2")
    batch = sub.fetch(max_count=10)
    lost = {r["revision"] for r in batch["c2"]}
    sub.disconnect("c2")
    redelivered = sub.fetch(max_count=10)
    got = {r["revision"] for rows in redelivered.values() for r in rows}
    assert lost <= got
    assert all(c == "c1" for c in redelivered)


def test_durable_state_survives_restart(log, tmp_path):
    state = str(tmp_path / "groups")
    sub = PersistentSubscription(log, "g", "s", state_dir=state)
    sub.connect("c1")
    batch = sub.fetch(max_count=5)["c1"]
    sub.ack([r["revision"] for r in batch[:3]])
    sub.nack([batch[3]["revision"]], "Park")

    cold = PersistentSubscription(log, "g", "s", state_dir=state)
    cold.connect("c9")
    assert cold.info().last_checkpoint == 3  # parked rev 3 folded into cursor
    assert cold.info().parked == 1
    nxt = cold.fetch(max_count=3)["c9"]
    assert [r["revision"] for r in nxt] == [4, 5, 6]


def test_service_surface(log, tmp_path):
    svc = PersistentSubscriptions(log, state_dir=str(tmp_path / "groups"))
    svc.create("g1", "s")
    with pytest.raises(SubscriptionGroupExistsError):
        svc.create("g1", "s")
    svc.create("g2")
    infos = {i.group for i in svc.list()}
    assert infos == {"g1", "g2"}
    assert svc.get_info("g1", "s").stream == "s"
    svc.delete("g1", "s")
    assert {i.group for i in svc.list()} == {"g2"}


def test_sink_dispatch_competing_consumers(log, tmp_path):
    """Sink-mode dispatch: payloads land in a consumer-partitioned
    parquet table (never through the driver), delivery is disjoint and
    complete, replay order is (batch_id, batch_seq), and a consumer's
    read is partition-pruned to its own directory."""
    from eventstorm_spark.streaming.persistent import SinkPersistentSubscription

    sink = str(tmp_path / "sink")
    sub = SinkPersistentSubscription(log, "g", "s", sink_path=sink)
    sub.connect("c1")
    sub.connect("c2")
    assert sub.dispatch(max_count=10) == 10

    rows = sub.deliveries().collect()
    assert len(rows) == 10
    by_c = {}
    for r in rows:
        by_c.setdefault(r.consumer, set()).add(r.revision)
    assert by_c["c1"] | by_c["c2"] == set(range(10))
    assert not (by_c["c1"] & by_c["c2"])
    assert len(by_c["c1"]) == 5 and len(by_c["c2"]) == 5
    assert all(r.attempt == 0 and r.batch_id == 1 for r in rows)
    # round-robin order: revision 0 -> c1, 1 -> c2, ...
    assert by_c["c1"] == {0, 2, 4, 6, 8}

    plan = (sub.deliveries("c1")._jdf.queryExecution()
            .executedPlan().toString())
    assert "PartitionFilters" in plan and "consumer" in plan.split(
        "PartitionFilters")[1][:120]

    # in-flight caps further dispatch until acks free slots
    assert sub.dispatch(max_count=10) == 0
    sub.ack(list(range(10)))
    assert sub.info().last_checkpoint == 9


def test_sink_dispatch_retry_park_replay(log, tmp_path):
    """Ack/nack/park semantics ride unchanged over the sink: a retry
    redelivers with attempt+1 in a later batch, exceeding
    max_retry_count parks, and replay_parked redelivers through the
    sink ahead of the cursor."""
    from eventstorm_spark.streaming.persistent import SinkPersistentSubscription

    sink = str(tmp_path / "sink")
    sub = SinkPersistentSubscription(log, "g", "s", sink_path=sink,
                                     max_retry_count=1)
    sub.connect("c1")
    sub.dispatch(max_count=1)
    sub.nack([0], "Retry")
    sub.dispatch(max_count=1)           # redelivery, attempt=1
    d = (sub.deliveries("c1").orderBy("batch_id").collect())
    assert [(r.revision, r.attempt, r.batch_id) for r in d] == [
        (0, 0, 1), (0, 1, 2)]
    sub.nack([0], "Retry")              # exceeds max_retry_count -> park
    assert sub.info().parked == 1
    n = sub.dispatch(max_count=1)       # cursor moves on past parked 0
    assert n == 1
    nxt = sub.deliveries("c1").where("batch_id = 3").collect()
    assert [r.revision for r in nxt] == [1]
    sub.ack([1])

    assert sub.replay_parked() == 1
    sub.dispatch(max_count=2)           # replayed 0 first, then cursor 2
    batch4 = (sub.deliveries("c1").where("batch_id = 4")
              .orderBy("batch_seq").collect())
    assert [r.revision for r in batch4] == [0, 2]
    assert batch4[0].attempt == 0       # fresh retry budget after replay
    sub.ack([0, 2])
    assert sub.info().last_checkpoint == 2 and sub.info().parked == 0


def test_sink_dispatch_parity_with_memory_fetch(log, tmp_path):
    """The sink dispatcher and the in-memory fetch() assign identically
    under RoundRobin with the same ack/nack script — same consumer per
    revision, same checkpoint trajectory (the sink form is the same
    dispatcher with the payload path moved off the driver)."""
    from eventstorm_spark.streaming.persistent import (
        PersistentSubscription,
        SinkPersistentSubscription,
    )

    mem = PersistentSubscription(log, "gm", "s")
    snk = SinkPersistentSubscription(log, "gs", "s",
                                     sink_path=str(tmp_path / "sink"))
    for s in (mem, snk):
        s.connect("c1")
        s.connect("c2")

    mem_batch = mem.fetch(max_count=6)
    snk.dispatch(max_count=6)
    mem_assign = {r["revision"]: c for c, rows in mem_batch.items()
                  for r in rows}
    snk_assign = {r.revision: r.consumer
                  for r in snk.deliveries().where("batch_id = 1").collect()}
    assert mem_assign == snk_assign

    script = [([0, 1], "ack"), ([2], "Park"), ([3], "Retry"),
              ([4, 5], "Skip")]
    for positions, action in script:
        for s in (mem, snk):
            if action == "ack":
                s.ack(positions)
            else:
                s.nack(positions, action)
    assert mem.info().last_checkpoint == snk.info().last_checkpoint
    assert mem.info().parked == snk.info().parked

    mem2 = mem.fetch(max_count=4)
    snk.dispatch(max_count=4)
    mem_assign2 = {r["revision"]: c for c, rows in mem2.items() for r in rows}
    snk_assign2 = {r.revision: r.consumer
                   for r in snk.deliveries().where("batch_id = 2").collect()}
    assert mem_assign2 == snk_assign2  # includes the retry of 3 + cursor


def test_sink_dispatch_restart_recovers_batch_counter(log, tmp_path):
    """A restarted sink dispatcher (same state_dir + sink) continues
    batch_id monotonically and never redelivers in-flight-free acked
    events."""
    from eventstorm_spark.streaming.persistent import SinkPersistentSubscription

    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")
    sub = SinkPersistentSubscription(log, "g", "s", sink_path=sink,
                                     state_dir=state)
    sub.connect("c1")
    sub.dispatch(max_count=4)
    sub.ack([0, 1, 2, 3])

    sub2 = SinkPersistentSubscription(log, "g", "s", sink_path=sink,
                                      state_dir=state)
    sub2.connect("c1")
    sub2.dispatch(max_count=4)
    d = sub2.deliveries("c1").orderBy("batch_id", "batch_seq").collect()
    assert [r.batch_id for r in d] == [1, 1, 1, 1, 2, 2, 2, 2]
    assert [r.revision for r in d] == [0, 1, 2, 3, 4, 5, 6, 7]


def test_filtered_all_subscription_checkpoint_walks_past_nonmatching(spark, tmp_path):
    """$all persistent subscription with a server-side type filter:
    only matching events deliver, and acking them advances the
    checkpoint PAST interleaved non-matching positions (the filtered
    cursor's scan proof) — no stall, no unbounded skip set. Stream
    groups refuse filters (EventStoreDB semantics); the sink dispatcher
    honors the same filter."""
    from eventstorm_spark.model import FilterKind, SubscriptionFilter
    from eventstorm_spark.streaming.persistent import (
        PersistentSubscription, SinkPersistentSubscription,
    )
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "log"))
    # interleave matching (type eX-a) and non-matching events
    for i in range(6):
        evs = new_events(1, prefix=f"m{i}")
        evs[0] = type(evs[0])(uuid=evs[0].uuid,
                              event_type="match" if i % 2 == 0 else "other",
                              data=evs[0].data)
        log.append("s", evs)

    f = SubscriptionFilter(kind=FilterKind.EVENT_TYPE, regex="^match$")
    with pytest.raises(ValueError, match="all"):
        PersistentSubscription(log, "g0", "s", filter=f)

    sub = PersistentSubscription(log, "g", filter=f)
    sub.connect("c1")
    batch = sub.fetch(max_count=10)
    types = [r["event_type"] for r in batch["c1"]]
    assert types == ["match", "match", "match"]
    positions = [r["position"] for r in batch["c1"]]
    sub.ack(positions)
    # checkpoint passed the interleaved non-matching positions too
    assert sub.info().last_checkpoint == log.tail_position()
    assert sub.fetch(max_count=10) == {}
    assert not sub._completed  # nothing stranded

    snk = SinkPersistentSubscription(log, "gs", sink_path=str(tmp_path / "sink"),
                                     filter=f)
    snk.connect("c1")
    assert snk.dispatch(max_count=10) == 3
    d = snk.deliveries("c1").collect()
    assert sorted(r.event_type for r in d) == ["match"] * 3
    snk.ack([r.position for r in d])
    assert snk.info().last_checkpoint == log.tail_position()


def test_service_creates_sink_groups(log, tmp_path):
    """The Create RPC surface selects the sink dispatcher via
    sink_path, listed alongside buffer-mode groups."""
    from eventstorm_spark.streaming.persistent import (
        PersistentSubscriptions, SinkPersistentSubscription,
    )

    svc = PersistentSubscriptions(log, state_dir=str(tmp_path / "state"))
    g1 = svc.create("buf", "s")
    g2 = svc.create("snk", "s", sink_path=str(tmp_path / "sink"))
    assert isinstance(g2, SinkPersistentSubscription)
    g2.connect("c1")
    assert g2.dispatch(max_count=4) == 4
    assert {i.group for i in svc.list()} == {"buf", "snk"}


def test_pinned_strategy_parity_memory_vs_sink(spark, tmp_path):
    """Pinned assignment is the same md5-derived rule in the in-memory
    and sink dispatchers — each stream lands on the same consumer in
    both, deterministically across runs."""
    from eventstorm_spark.streaming.persistent import (
        PINNED, PersistentSubscription, SinkPersistentSubscription,
    )
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "log"))
    for i in range(6):
        log.append(f"st-{i}", new_events(1, prefix=f"p{i}"))

    mem = PersistentSubscription(log, "gm", consumer_strategy=PINNED)
    snk = SinkPersistentSubscription(log, "gs", consumer_strategy=PINNED,
                                     sink_path=str(tmp_path / "sink"))
    for s in (mem, snk):
        s.connect("c1")
        s.connect("c2")
        s.connect("c3")
    batch = mem.fetch(max_count=10)
    mem_assign = {r["stream"]: c for c, rows in batch.items() for r in rows}
    snk.dispatch(max_count=10)
    snk_assign = {r.stream: r.consumer for r in snk.deliveries().collect()}
    assert mem_assign == snk_assign and len(mem_assign) == 6


def _interleaved_log(spark, tmp_path, n=8):
    """n events on one stream, even ordinals typed `match`."""
    log = EventLog(spark, str(tmp_path / "log"))
    for i in range(n):
        evs = new_events(1, prefix=f"m{i}")
        evs[0] = type(evs[0])(uuid=evs[0].uuid,
                              event_type="match" if i % 2 == 0 else "other",
                              data=evs[0].data)
        log.append("s", evs)
    return log


def test_filtered_fetch_slot_cut_does_not_lose_events(spark, tmp_path):
    """ADVICE r8 (high): when the in-flight cap cuts a filtered page,
    the matching rows beyond the cap must NOT be walked past by the
    scan-proof checkpoint — the scan high-watermark is capped just
    below the first undelivered matching row, so they deliver on a
    later fetch. Regression: checkpoint walked to tail after a cut
    page, permanently losing the cut rows."""
    from eventstorm_spark.model import FilterKind, SubscriptionFilter

    log = _interleaved_log(spark, tmp_path)
    f = SubscriptionFilter(kind=FilterKind.EVENT_TYPE, regex="^match$")
    exp = {r["position"]
           for r in log.read_all(filter=f, count=100).collect()}
    assert len(exp) == 4

    sub = PersistentSubscription(log, "g", filter=f)
    sub.connect("c1")
    first = sub.fetch(max_count=2)["c1"]
    assert len(first) == 2
    # skip entries (the 2 in-flight) consume slots: page has 4 matching
    # rows, cap is 3 in-flight, so the 4th matching row is cut
    second = sub.fetch(max_count=3).get("c1", [])
    assert len(second) == 1
    sub.ack([r["position"] for r in first + second])
    # the cut row is still pending — not walked past
    third = sub.fetch(max_count=10).get("c1", [])
    assert len(third) == 1
    got = {r["position"] for r in first + second + third}
    assert got == exp
    sub.ack([r["position"] for r in third])
    assert sub.info().last_checkpoint == log.tail_position()
    assert sub.fetch(max_count=10) == {}


def test_filtered_sink_dispatch_slot_cut_does_not_lose_events(spark, tmp_path):
    """Same regression through the sink dispatcher: the slot cut drops
    rows from the dispatched batch engine-side; the scan proof must not
    advance past them."""
    from eventstorm_spark.model import FilterKind, SubscriptionFilter
    from eventstorm_spark.streaming.persistent import SinkPersistentSubscription

    log = _interleaved_log(spark, tmp_path)
    f = SubscriptionFilter(kind=FilterKind.EVENT_TYPE, regex="^match$")
    exp = {r["position"]
           for r in log.read_all(filter=f, count=100).collect()}

    snk = SinkPersistentSubscription(log, "gs", filter=f,
                                     sink_path=str(tmp_path / "sink"))
    snk.connect("c1")
    assert snk.dispatch(max_count=2) == 2
    assert snk.dispatch(max_count=3) == 1  # slot cut: 4th matching row held
    d = snk.deliveries("c1").collect()
    snk.ack([r.position for r in d])
    assert snk.dispatch(max_count=10) == 1  # the cut row delivers
    d2 = snk.deliveries("c1").collect()
    assert {r.position for r in d2} == exp
    snk.ack([r.position for r in d2 if r.position not in
             {x.position for x in d}])
    assert snk.info().last_checkpoint == log.tail_position()


def test_fetch_requeues_replay_rows_cut_by_cap(spark, tmp_path):
    """Replayed parked rows cut by the in-flight cap go back on the
    replay queue instead of being dropped."""
    log = EventLog(spark, str(tmp_path / "log"))
    log.append("s", new_events(6))
    sub = PersistentSubscription(log, "g", "s")
    sub.connect("c1")
    batch = sub.fetch(max_count=4)["c1"]
    sub.nack([r["revision"] for r in batch], "Park")
    assert sub.replay_parked() == 4
    got = sub.fetch(max_count=2).get("c1", [])
    assert [r["revision"] for r in got] == [0, 1]
    sub.ack([0, 1])
    got2 = sub.fetch(max_count=2).get("c1", [])
    assert [r["revision"] for r in got2] == [2, 3]


def test_group_created_before_stream_exists(log, tmp_path):
    """EventStoreDB allows creating a persistent group before its
    stream's first append: fetch/dispatch must return an empty page
    (the group waits), not raise StreamNotFoundError, and deliver once
    the stream appears."""
    from eventstorm_spark.streaming.persistent import (
        SinkPersistentSubscription)

    sub = PersistentSubscription(log, "early", "not-yet")
    sub.connect("c0")
    assert sub.fetch() == {}                  # waits, no error
    log.append("not-yet", new_events(2, prefix="ny"))
    got = sub.fetch()
    assert sum(len(v) for v in got.values()) == 2

    sink = SinkPersistentSubscription(
        log, "early-sink", "not-yet-2",
        sink_path=str(tmp_path / "deliv"))
    sink.connect("c0")
    assert sink.dispatch() == 0               # waits, no error
    log.append("not-yet-2", new_events(3, prefix="ny2"))
    assert sink.dispatch() == 3


def test_fetch_without_consumers_raises_before_state_mutation(log):
    """fetch() with no consumers raises up front; the replay queue must
    NOT be truncated first (regression: _assign raised mid-loop after
    the queue was already consumed, silently losing replayed parked
    events until a restart reloaded state)."""
    from eventstorm_spark.errors import EventStormError

    sub = PersistentSubscription(log, "noc", "s")
    sub.connect("c0")
    got = sub.fetch(max_count=3)
    sub.nack([r["revision"] for rows in got.values() for r in rows],
             action="Park")
    assert sub.replay_parked() == 3
    queue_before = list(sub._replay_queue)
    sub.disconnect("c0")
    with pytest.raises(EventStormError, match="no consumers"):
        sub.fetch()
    assert sub._replay_queue == queue_before  # queue intact
    sub.connect("c1")
    got2 = sub.fetch(max_count=3)
    assert sum(len(v) for v in got2.values()) == 3  # replays delivered


def test_sink_dispatch_drops_scavenged_replay_ghosts(spark, tmp_path):
    """A parked position whose stream was deleted AND scavenged between
    park and replay is physically gone: the sink dispatcher must drop
    it from the replay queue (fetch() already does, by truncating its
    queue up-front) instead of letting it squat at the queue head —
    where, once ghosts fill a max_count page, NO later parked event can
    ever replay. Proven red on the pre-round-15 dispatch (the ghost
    stayed queued forever and the final dispatch returned 0)."""
    from eventstorm_spark.streaming.persistent import (
        SinkPersistentSubscription)

    log = EventLog(spark, str(tmp_path / "log"))
    log.append("dead", new_events(2, prefix="d"))    # positions 1-2
    log.append("live", new_events(2, prefix="l"))    # positions 3-4
    snk = SinkPersistentSubscription(log, "g",
                                     sink_path=str(tmp_path / "sink"))
    snk.connect("c1")
    assert snk.dispatch(max_count=10) == 4
    snk.nack([1], "Park")
    snk.ack([2, 3, 4])
    log.delete_stream("dead")                        # marker at 5
    assert log.scavenge() == 2                       # 1-2 reclaimed
    assert snk.replay_parked() == 1                  # queues ghost 1
    # the cursor leg delivers the delete MARKER (position 5 —
    # $deleted-streams flows through $all groups); the replay leg
    # yields nothing and the ghost must be dropped, not requeued
    assert snk.dispatch(max_count=10) == 1
    snk.ack([5])
    assert snk._replay_queue == []                   # ghost dropped

    # the live-lock leg: with the ghost gone, a max_count=1 replay of a
    # REAL parked event gets the queue head and delivers
    log.append("live2", new_events(2, prefix="m"))   # positions 6-7
    assert snk.dispatch(max_count=10) == 2
    snk.nack([6], "Park")
    snk.ack([7])
    assert snk.replay_parked() == 1
    assert snk.dispatch(max_count=1) == 1            # red: 0 forever
    d = snk.deliveries("c1").orderBy("batch_id", "batch_seq").collect()
    assert int(d[-1].position) == 6


def test_resolve_links_delivery_and_parked_replay(log):
    """resolveLinkTos on a persistent group (EventStoreDB semantics,
    persistent.proto's declared option): delivered link rows carry the
    TARGET's payload identity under the LINK's coordinates, so the
    checkpoint/ack/park machinery — keyed on the link's own
    revision/position — is oblivious to resolution. Covers BOTH
    delivery paths: the cursor page and the parked-replay frame (the
    replay frame reads the raw df, so it needs its own resolution)."""
    for rev in (7, 3, 5):
        log.link_to("idx", "s", rev)
    log.link_to("idx", "s", 999)  # dangling

    sub = PersistentSubscription(log, "g", "idx", resolve_links=True)
    sub.connect("c1")
    batch = sub.fetch(max_count=10)["c1"]
    assert [(r["uuid"], r["revision"]) for r in batch] == [
        ("uuid-7", 0), ("uuid-3", 1), ("uuid-5", 2),
        ("$link-idx-s-999", 3)]
    assert batch[0]["event_type"] == "event-type"  # target identity
    assert batch[3]["event_type"] == "$>"          # dangling raw

    # park the middle link, ack the rest, replay: the replayed delivery
    # must come back RESOLVED too (replay-frame path)
    sub.nack([1], "Park")
    sub.ack([0, 2, 3])
    assert sub.replay_parked() == 1
    replayed = sub.fetch(max_count=10)["c1"]
    assert [(r["uuid"], r["revision"], r["data"])
            for r in replayed] == [("uuid-3", 1, '{"i": 3}')]


def test_resolve_links_sink_dispatch(log, tmp_path):
    """The sink dispatcher's twin: dispatched link rows land in the
    consumer-partitioned sink with target payloads under link
    coordinates; batch_seq ordering keys on the link positions."""
    from pyspark.sql import functions as F

    from eventstorm_spark.streaming.persistent import (
        SinkPersistentSubscription)

    for rev in (2, 0):
        log.link_to("idx", "s", rev)
    sub = SinkPersistentSubscription(
        log, "g", "idx", sink_path=str(tmp_path / "sink"),
        resolve_links=True)
    sub.connect("c1")
    assert sub.dispatch(max_count=10) == 2
    rows = (sub.deliveries("c1").orderBy("batch_seq")
            .select("uuid", "revision", "event_type").collect())
    assert [(r.uuid, r.revision, r.event_type) for r in rows] == [
        ("uuid-2", 0, "event-type"), ("uuid-0", 1, "event-type")]
