"""Cursor-paginated $all reads: page concatenation must equal the
one-shot read in both directions, resume from a crash cursor, and apply
server-side filters per page."""

from __future__ import annotations

import pytest

from eventstorm_spark.log.store import EventLog
from eventstorm_spark.model import Direction, FilterKind, SubscriptionFilter
from tests.fixtures import new_events


@pytest.fixture()
def log(spark, tmp_path):
    lg = EventLog(spark, str(tmp_path / "plog"))
    for s in range(5):
        lg.append(f"user-{s}", new_events(21, prefix=f"u{s}"))
    return lg  # 105 events


def _positions(pages):
    return [r["position"] for page in pages for r in page]


def test_pages_forward_equal_one_shot(log):
    pages = list(log.iter_pages(page_size=10))
    assert [len(p) for p in pages] == [10] * 10 + [5]
    want = [r["position"] for r in log.read_all().collect()]
    assert _positions(pages) == want


def test_pages_backward_equal_one_shot(log):
    pages = list(log.iter_pages(page_size=25, direction=Direction.BACKWARDS))
    want = [r["position"] for r in
            log.read_all(direction=Direction.BACKWARDS).collect()]
    assert _positions(pages) == want


def test_resume_from_cursor(log):
    first = next(iter(log.iter_pages(page_size=40)))
    cursor = first[-1]["position"] + 1
    rest = _positions(log.iter_pages(page_size=40, from_position=cursor))
    assert _positions([first]) + rest == [
        r["position"] for r in log.read_all().collect()]


def test_pages_with_filter(log):
    f = SubscriptionFilter(FilterKind.STREAM_ID, prefixes=["user-1", "user-3"])
    got = _positions(log.iter_pages(page_size=7, filter=f))
    want = [r["position"] for r in log.read_all(filter=f).collect()]
    assert got == want and len(got) == 42
