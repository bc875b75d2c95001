"""EventLog on Delta (``format="delta"``) — the CAS + contention suite
from test_append, re-run against the Delta transaction log instead of
the ``_commits/`` marker protocol.

Backend: with delta-spark installed the suite runs on real Delta; in
this container it runs on the local transaction-log shim
(``log/deltashim.py`` — same serializable optimistic-commit semantics
over O_EXCL version files), so the ``format="delta"`` store branch
executes either way. ``delta.backend()`` reports which backend ran.
"""

from __future__ import annotations

import pytest

from eventstorm_spark.errors import WrongExpectedRevisionError
from eventstorm_spark.log.delta import DELTA_AVAILABLE, backend, is_conflict
from eventstorm_spark.log.store import EventLog
from eventstorm_spark.model import ExpectedRevision

def needs_delta(fn):  # suite runs on either backend (delta or shim)
    return fn


def test_delta_falls_back_to_shim_with_warning(spark, tmp_path):
    if DELTA_AVAILABLE:  # pragma: no cover - container has no delta
        pytest.skip("delta-spark installed; shim fallback not applicable")
    import warnings

    import eventstorm_spark.log.delta as dmod
    from tests.fixtures import new_events

    assert backend() == "shim"
    dmod._warned_shim = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        log = EventLog(spark, str(tmp_path / "dlog"), format="delta")
        log.append("s", new_events(1))
    assert any("transaction-log shim" in str(w.message) for w in caught)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported log format"):
        EventLog(spark, str(tmp_path / "xlog"), format="orc")


def test_conflict_classifier_matches_delta_exceptions():
    class ConcurrentAppendException(Exception):
        pass

    assert is_conflict(ConcurrentAppendException("files were added"))
    assert is_conflict(RuntimeError(
        "io.delta.exceptions.ConcurrentWriteException: txn conflict"))
    assert not is_conflict(RuntimeError("plain failure"))


@needs_delta
def test_delta_append_assigns_dense_revisions_and_positions(spark, tmp_path):
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "dlog"), format="delta")
    log.append("s", new_events(3))
    res = log.append("s", new_events(2, prefix="b"))
    assert res.first_position == 4 and res.last_revision == 4
    rows = log.df().orderBy("position").collect()
    assert [r.position for r in rows] == [1, 2, 3, 4, 5]
    assert [r.revision for r in rows] == [0, 1, 2, 3, 4]


@needs_delta
def test_delta_expected_revision_cas(spark, tmp_path):
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "dlog"), format="delta")
    log.append("s", new_events(1))
    with pytest.raises(WrongExpectedRevisionError):
        log.append("s", new_events(1, prefix="x"), ExpectedRevision.at(5))
    log.append("s", new_events(1, prefix="y"), ExpectedRevision.at(0))


@needs_delta
def test_delta_two_writers_never_collide_on_positions(spark, tmp_path):
    """Two EventLog instances (two-process shape: separate caches) must
    serialize through Delta's optimistic commit: the loser's merge
    conflicts or inserts nothing, it refreshes and lands after the
    winner."""
    from tests.fixtures import new_events

    path = str(tmp_path / "dlog")
    a = EventLog(spark, path, format="delta")
    b = EventLog(spark, path, format="delta")
    b.tail_position()  # cache tail=0 in B before A commits
    a.append("s-a", new_events(3, prefix="a"))
    res_b = b.append("s-b", new_events(2, prefix="b"))
    assert res_b.first_position == 4
    pos = sorted(r["position"] for r in a.df().select("position").collect())
    assert pos == [1, 2, 3, 4, 5]


@needs_delta
def test_delta_concurrent_appends_keep_positions_gapless(spark, tmp_path):
    import threading

    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "dlog"), format="delta")
    errors = []

    def worker(i):
        try:
            for j in range(3):
                log.append(f"w-{i}", new_events(4, prefix=f"w{i}-{j}"))
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    rows = log.df().select("stream", "position", "revision").collect()
    assert sorted(r.position for r in rows) == list(range(1, 49))
    for i in range(4):
        revs = sorted(r.revision for r in rows if r.stream == f"w-{i}")
        assert revs == list(range(12))


def test_own_commits_do_not_evict_warm_caches(spark, tmp_path):
    """Single-writer fast path: this instance's own commit advances the
    shared watermark, and the staleness fences must advance with it —
    otherwise every append invalidates the head/tail caches it just
    wrote and pays a full-log rescan. A raw append to a $$-metadata
    stream is the exception: the retention caches must stay
    invalidatable there (only set_stream_metadata writes through)."""
    from eventstorm_spark.log.store import EventLog
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "log"))
    log.append("s-1", new_events(2, prefix="a"))
    assert log._revisions.get("s-1") == 1 and log._tail_position == 2
    # the fence must consider its own commit fresh
    log._refresh_log_caches()
    assert log._revisions.get("s-1") == 1, "own commit evicted the cache"
    assert log._tail_position == 2
    log._refresh_meta_caches()
    meta_fence = log._meta_cache_watermark
    assert meta_fence == log._read_watermark()

    # a second instance's commit DOES evict (cross-process staleness)
    other = EventLog(spark, str(tmp_path / "log"))
    other.append("s-2", new_events(1, prefix="b"))
    log._refresh_log_caches()
    assert log._tail_position is None and not log._revisions

    # raw $$-append keeps the meta fence behind so retention re-reads
    log.append("$$s-1", new_events(1, prefix="m"))
    assert log._meta_cache_watermark != log._read_watermark()


def test_stalled_foreign_commit_keeps_fences_conservative(spark, tmp_path):
    """A foreign writer can be published-but-unadvertised (fenced data
    write done, crash/stall before the watermark advance). An own
    commit built on top of such rows must NOT advance the staleness
    fences — the foreign writer's advance is then a no-op, so a fence
    frozen past its rows would keep a stale head cache alive forever
    (duplicate revisions / wrongly-passing CAS)."""
    from eventstorm_spark.log.store import EventLog
    from tests.fixtures import new_events

    p = str(tmp_path / "log")
    a = EventLog(spark, p)
    a.append("s", new_events(3, prefix="a"))   # revs 0..2
    a.append("t", new_events(1, prefix="t"))
    assert a._log_cache_watermark == a._read_watermark()

    b = EventLog(spark, p)
    b._advance_watermark = lambda pos: b._read_watermark()  # stall model
    b.append("s", new_events(1, prefix="b"))   # rev 3, unadvertised

    # a: warm revision cache, tail cache evicted (read-through repop)
    a._tail_position = None
    assert a._revisions.get("s") == 2
    a.append("t", new_events(1, prefix="t2"))
    # base position sat above the pre-advance watermark, so the fence
    # must have stayed behind (next refresh will invalidate)
    assert a._log_cache_watermark != a._read_watermark()
    res = a.append("s", new_events(1, prefix="a2"))
    assert res.last_revision == 4  # continues after b's rev 3


def test_materialize_on_delta_log_goes_through_transaction_log(spark, tmp_path):
    """Bulk link materialization on a format='delta' log must commit
    through the transaction log. Regression: _reserve returns None for
    non-marker protocols, and the bulk writer treated None as the
    'none'-protocol DIRECT parquet append — rows written into the table
    path outside the commit protocol, invisible to the shim's snapshot
    (and corrupting under real Delta)."""
    from pyspark.sql import functions as F

    from eventstorm_spark.projections.system import materialize
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "dlog"), format="delta")
    log.append("acct-1", new_events(3, prefix="a"))
    log.append("cart-7", new_events(2, prefix="b"))

    n = materialize(log.df().where(~F.col("stream").startswith("$")),
                    log, which=["$by_category"])
    assert n == 5
    # visible through the TRANSACTION-LOG snapshot, not a directory scan
    ce = log.read_stream("$ce-acct").orderBy("revision").collect()
    assert [r["revision"] for r in ce] == [0, 1, 2]
    assert log.read_stream("$ce-cart").count() == 2
    # positions continue gapless past the source events
    links = log.df().where(F.col("stream").startswith("$ce-"))
    assert sorted(r["position"] for r in links.collect()) == [6, 7, 8, 9, 10]
    # and the table path holds no rogue parquet outside the shim's
    # data/ dir (the bug wrote part files into the table root)
    import os
    rogue = [f for f in os.listdir(str(tmp_path / "dlog"))
             if f.endswith(".parquet")]
    assert rogue == []


def test_delta_tombstone_visible_across_instances(spark, tmp_path):
    """The cross-process deletion fence, delta clock: instance B's
    populated deletion-marker cache must re-read after instance A
    commits a tombstone through the transaction log — the log VERSION
    is the staleness clock (the marker protocol uses the shared
    watermark; format='delta' had no fence at all and B's sticky cache
    let it append to, and read from, a tombstoned stream)."""
    from eventstorm_spark.errors import StreamDeletedError
    from tests.fixtures import new_events

    path = str(tmp_path / "dlog2")
    a = EventLog(spark, path, format="delta")
    b = EventLog(spark, path, format="delta")
    a.append("s", new_events(2))
    assert b.read_stream("s").count() == 2   # warms B's caches
    a.tombstone_stream("s")
    with pytest.raises(StreamDeletedError):
        b.append("s", new_events(1, prefix="x"))
    with pytest.raises(StreamDeletedError):
        b.read_stream("s")


def test_delta_head_cache_fence_blocks_duplicate_revisions(spark, tmp_path):
    """The append-path staleness fence, delta clock: a fresh TAIL plus
    a stale per-stream HEAD would pass the position-overlap validation
    and commit duplicate (stream, revision) pairs. Scenario: B caches
    s's head, A appends more to s, B appends to t (fresh tail), then B
    appends to s — without the transaction-log-version fence B mints
    revision 3 again (marker mode fences this via the shared
    watermark)."""
    from tests.fixtures import new_events

    path = str(tmp_path / "dlog3")
    a = EventLog(spark, path, format="delta")
    b = EventLog(spark, path, format="delta")
    a.append("s", new_events(3, prefix="a"))
    assert b.head_revision("s") == 2          # warms B's head cache
    a.append("s", new_events(2, prefix="a2"))  # revisions 3, 4
    b.append("t", new_events(1, prefix="t"))   # B's tail now fresh
    res = b.append("s", new_events(1, prefix="b"))
    assert res.last_revision == 5              # continues past A's 4
    revs = [r["revision"] for r in
            b.read_stream("s").orderBy("revision").collect()]
    assert revs == [0, 1, 2, 3, 4, 5]          # dense, no duplicates
