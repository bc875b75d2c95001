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
