"""Filter goldens — prefix/regex on event type and stream id.

Ported from /root/reference/internal/streams/streams_test.go:366-480:
prefixes {type-0,type-1,type-5} over type-0..99 => 23 rows; regex
^(type-0|type-1|type-2)$ => 3 rows; same counts for stream-id filters.
"""

from __future__ import annotations

import pytest

from eventstorm_spark.log.filters import build_prefix_regex, filter_column
from eventstorm_spark.model import FilterKind, SubscriptionFilter

from tests.fixtures import multi_stream_100x1, typed_100


@pytest.fixture(scope="module")
def typed(spark):
    return typed_100(spark).cache()


@pytest.fixture(scope="module")
def streams(spark):
    return multi_stream_100x1(spark).cache()


def test_prefix_regex_compilation():
    assert build_prefix_regex(["a", "b"]) == "^(a|b)"


def test_event_type_prefix_filter_23(typed):
    flt = SubscriptionFilter(FilterKind.EVENT_TYPE, prefixes=["type-0", "type-1", "type-5"])
    # type-0, type-1, type-5 exact + type-1x (10) + type-5x (10) => 23
    assert typed.where(filter_column(flt)).count() == 23


def test_event_type_regex_filter_3(typed):
    flt = SubscriptionFilter(FilterKind.EVENT_TYPE, regex="^(type-0|type-1|type-2)$")
    assert typed.where(filter_column(flt)).count() == 3


def test_stream_prefix_filter_23(streams):
    flt = SubscriptionFilter(FilterKind.STREAM_ID, prefixes=["stream-0", "stream-1", "stream-2"])
    assert streams.where(filter_column(flt)).count() == 23


def test_stream_regex_filter_3(streams):
    flt = SubscriptionFilter(FilterKind.STREAM_ID, regex="^(stream-0|stream-1|stream-2)$")
    assert streams.where(filter_column(flt)).count() == 3


def test_unanchored_regex_matches_anywhere(typed):
    # Postgres `~` semantics: pattern matches anywhere in the string.
    flt = SubscriptionFilter(FilterKind.EVENT_TYPE, regex="pe-42")
    assert typed.where(filter_column(flt)).count() == 1


def test_filter_validation():
    with pytest.raises(ValueError):
        SubscriptionFilter(FilterKind.EVENT_TYPE)
    with pytest.raises(ValueError):
        SubscriptionFilter(FilterKind.EVENT_TYPE, regex="x", prefixes=["y"])
