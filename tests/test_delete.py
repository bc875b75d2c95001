"""S9 delete/tombstone lifecycle — the reference stubs these RPCs
(grpc_server.go:271-281); semantics here follow the EventStoreDB API the
protos declare (streams.proto:14-16): soft delete hides history and
allows recreation with continued revisions; tombstone is permanent;
scavenge physically reclaims."""

from __future__ import annotations

import pytest

from eventstorm_spark.errors import (
    StreamDeletedError,
    StreamNotFoundError,
    WrongExpectedRevisionError,
)
from eventstorm_spark.log.store import DELETED_STREAMS, EventLog
from eventstorm_spark.model import ExpectedRevision

from tests.fixtures import new_events


@pytest.fixture()
def log(spark, tmp_path):
    return EventLog(spark, str(tmp_path / "log"))


def test_soft_delete_hides_stream(log):
    log.append("s", new_events(5))
    log.delete_stream("s")
    with pytest.raises(StreamNotFoundError):
        log.read_stream("s")


def test_soft_delete_missing_stream_raises(log):
    log.append("other", new_events(1))
    with pytest.raises(StreamNotFoundError):
        log.delete_stream("nope")


def test_delete_cas_guard(log):
    log.append("s", new_events(5))  # head revision 4
    with pytest.raises(WrongExpectedRevisionError):
        log.delete_stream("s", ExpectedRevision.at(3))
    log.delete_stream("s", ExpectedRevision.at(4))


def test_recreation_continues_revisions(log):
    log.append("s", new_events(5))
    log.delete_stream("s")
    res = log.append("s", new_events(2, prefix="new"))
    assert res.last_revision == 6  # continues from pre-delete head 4
    rows = log.read_stream("s").collect()
    assert [r["revision"] for r in rows] == [5, 6]  # history stays hidden


def test_tombstone_blocks_append_and_read(log):
    log.append("s", new_events(3))
    log.tombstone_stream("s")
    with pytest.raises(StreamDeletedError):
        log.append("s", new_events(1, prefix="x"))
    with pytest.raises(StreamDeletedError):
        log.read_stream("s")
    with pytest.raises(StreamDeletedError):
        log.delete_stream("s")  # can't soft-delete a tombstone


def test_markers_visible_in_all_until_scavenge(log):
    log.append("s", new_events(3))
    log.delete_stream("s")
    streams = {r["stream"] for r in log.read_all().collect()}
    assert streams == {"s", DELETED_STREAMS}


def test_scavenge_reclaims_and_preserves_positions(log):
    log.append("keep", new_events(3))
    log.append("s", new_events(4, prefix="s"))
    log.append("t", new_events(2, prefix="t"))
    log.delete_stream("s")
    log.tombstone_stream("t")
    removed = log.scavenge()
    assert removed == 6
    rows = log.read_all().collect()
    by_stream = {}
    for r in rows:
        by_stream.setdefault(r["stream"], []).append(r["position"])
    assert sorted(by_stream) == [DELETED_STREAMS, "keep"]
    assert by_stream["keep"] == [1, 2, 3]  # positions unchanged
    # tombstone survives scavenge: appends still blocked
    with pytest.raises(StreamDeletedError):
        log.append("t", new_events(1, prefix="z"))


def test_recreated_stream_survives_scavenge_with_continuity(log):
    log.append("s", new_events(5))
    log.delete_stream("s")
    log.append("s", new_events(2, prefix="new"))
    log.scavenge()
    rows = log.read_stream("s").collect()
    assert [r["revision"] for r in rows] == [5, 6]
    # a cold log instance sees the same state (markers are the source of truth)
    cold = EventLog(log.spark, log.path)
    res = cold.append("s", new_events(1, prefix="again"))
    assert res.last_revision == 7


# -- link events (resolve_links — parsed but unimplemented in the
#    reference; EventStoreDB `$>` semantics) ------------------------------

def test_link_to_and_resolve(log):
    log.append("src", new_events(3))
    log.link_to("index", "src", 1)
    log.link_to("index", "src", 2)
    raw = log.read_stream("index").collect()
    assert [r["event_type"] for r in raw] == ["$>", "$>"]
    assert [r["data"] for r in raw] == ["1@src", "2@src"]

    resolved = log.read_stream("index", resolve_links=True).collect()
    # payload identity is the target's; coordinates stay the link's
    assert [r["event_type"] for r in resolved] == ["event-type", "event-type"]
    assert [r["data"] for r in resolved] == ['{"i": 1}', '{"i": 2}']
    assert [r["uuid"] for r in resolved] == ["uuid-1", "uuid-2"]
    assert [r["stream"] for r in resolved] == ["index", "index"]
    assert [r["revision"] for r in resolved] == [0, 1]


def test_dangling_link_passes_through(log):
    log.append("src", new_events(1))
    log.link_to("index", "src", 99)  # no such target revision
    resolved = log.read_stream("index", resolve_links=True).collect()
    assert [r["event_type"] for r in resolved] == ["$>"]
    assert [r["data"] for r in resolved] == ["99@src"]


def test_resolve_links_noop_without_links(log):
    log.append("s", new_events(4))
    plain = log.read_stream("s").collect()
    resolved = log.read_stream("s", resolve_links=True).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in resolved]
