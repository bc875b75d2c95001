"""Subscription/$all filters: regex and prefix-list, on stream id or type.

Reference semantics: ``internal/backend/backend.go:228-246`` — a prefix
list compiles to the unanchored POSIX regex ``^(p1|p2|...)``; a regex
filter applies unanchored (Postgres ``~``). Filters attach only to $all
reads and subscriptions (``extensions.go:62-79``).

Spark-first twist: when every prefix is regex-metacharacter-free (the only
case the reference's unescaped compilation handles correctly anyway), we
emit an OR-chain of ``startswith`` instead of ``rlike`` — ``StartsWith``
pushes down into the Parquet scan, ``RLike`` does not. Regexes run with
Java semantics; the supported dialect is the POSIX/Java intersection
(SURVEY §7.4 risk 6), which covers the reference's tested surface
(anchors, alternation, literals).
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from eventstorm_spark.model import FilterKind, SubscriptionFilter

_REGEX_META = re.compile(r"[.^$*+?()\[\]{}|\\]")


def build_prefix_regex(prefixes: Sequence[str]) -> str:
    """Prefix list -> ``^(p1|p2|...)`` — backend.go:228-238 (unescaped)."""
    return "^(" + "|".join(prefixes) + ")"


def filter_column(flt: SubscriptionFilter) -> Column:
    """Compile a SubscriptionFilter to a boolean Column over the envelope.

    Event-type filters hit the denormalized ``event_type`` column (not the
    metadata map) so the predicate participates in pushdown/pruning — the
    reference pays a JSONB ``->>`` extraction per row instead
    (backend.go:184-186).
    """
    col = F.col("stream" if flt.kind == FilterKind.STREAM_ID else "event_type")
    if flt.regex:
        # Postgres `~` is an unanchored match; Java rlike likewise searches
        # for the pattern anywhere in the string, so semantics align for
        # the supported dialect.
        return col.rlike(flt.regex)
    literal = [p for p in flt.prefixes if not _REGEX_META.search(p)]
    if len(literal) == len(flt.prefixes):
        return reduce(or_, (col.startswith(p) for p in flt.prefixes))
    return col.rlike(build_prefix_regex(flt.prefixes))


def filter_sql(flt: SubscriptionFilter) -> str:
    """DuckDB-SQL twin of ``filter_column`` for oracle queries."""
    col = "stream" if flt.kind == FilterKind.STREAM_ID else "event_type"
    if flt.regex:
        return f"regexp_matches({col}, '{flt.regex}')"
    ors = " OR ".join(f"starts_with({col}, '{p}')" for p in flt.prefixes)
    return f"({ors})"
