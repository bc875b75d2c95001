"""Compile ReadOptions into a DataFrame plan.

This is the engine's "planner": the direction x boundary truth table from
``internal/backend/backend.go:118-194`` (verified by the reference's
golden tests, ``streams_test.go:235-364``), rendered as declarative
DataFrame ops instead of a SQL template. Catalyst then applies predicate
pushdown, `TakeOrderedAndProject` for the limit-1 shortcuts, and partition
pruning — the reference relies on Postgres B-tree indexes for the same
effect (SURVEY §4).

Truth table (field = revision for stream reads, position for $all):

    kind  direction  -> predicate      order   limit
    AT    forwards      field >= n     ASC     count
    AT    backwards     field <= n     DESC    count
    START forwards      —              ASC     count
    START backwards     —              ASC     1        (first event)
    END   forwards      —              DESC    1        (last event)
    END   backwards     —              DESC    count
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventstorm_spark.log.filters import filter_column, filter_sql
from eventstorm_spark.model import BoundaryKind, Direction, ReadOptions


@dataclass(frozen=True)
class ReadPlan:
    """The compiled physical intent — mirrors backend.go:196-201 Query{}."""

    where: tuple  # tuple[Column-producing descriptions] kept for SQL twin
    order_field: str  # "revision" | "position"
    ascending: bool
    limit: Optional[int]


def _bounds(kind: BoundaryKind, direction: Direction, at_value: int,
            count: int) -> tuple[Optional[str], bool, Optional[int]]:
    """Returns (bound_op, ascending, limit). bound_op in {'>=','<=',None}."""
    limit = count if count and count > 0 else None
    if kind == BoundaryKind.AT:
        if direction == Direction.FORWARDS:
            return ">=", True, limit
        return "<=", False, limit
    if kind == BoundaryKind.START:
        if direction == Direction.FORWARDS:
            return None, True, limit
        return None, True, 1  # backwards-from-start => first event, backend.go:135-138
    # END
    if direction == Direction.FORWARDS:
        return None, False, 1  # forwards-from-end => last event, backend.go:139-143
    return None, False, limit


def compile_read(events: DataFrame, opts: ReadOptions) -> DataFrame:
    """ReadOptions -> DataFrame over the envelope table.

    The result preserves the read order via an explicit orderBy — callers
    that only need the row *set* (oracle comparisons) may drop it; callers
    that iterate (subscriptions, folds) rely on it.
    """
    df = events
    if opts.stream is not None:
        so = opts.stream
        df = df.where(F.col("stream") == so.identifier)
        field, at_value = "revision", so.revision
        kind = so.kind
    else:
        ao = opts.all
        field, at_value = "position", ao.position
        kind = ao.kind
        if ao.filter is not None:
            df = df.where(filter_column(ao.filter))

    op, asc, limit = _bounds(kind, opts.direction, at_value, opts.count)
    if op == ">=":
        df = df.where(F.col(field) >= at_value)
    elif op == "<=":
        df = df.where(F.col(field) <= at_value)

    df = df.orderBy(F.col(field).asc() if asc else F.col(field).desc())
    if limit is not None:
        df = df.limit(limit)
    return df


def compile_read_sql(opts: ReadOptions, source: str = "es_events") -> str:
    """DuckDB-SQL twin of ``compile_read`` for oracle checks.

    ``source`` is a view exposing the envelope columns.
    """
    where = []
    if opts.stream is not None:
        where.append(f"stream = '{opts.stream.identifier}'")
        field, at_value, kind = "revision", opts.stream.revision, opts.stream.kind
    else:
        field, at_value, kind = "position", opts.all.position, opts.all.kind
        if opts.all.filter is not None:
            where.append(filter_sql(opts.all.filter))

    op, asc, limit = _bounds(kind, opts.direction, at_value, opts.count)
    if op:
        where.append(f"{field} {op} {at_value}")
    sql = f"SELECT * FROM {source}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    sql += f" ORDER BY {field} {'ASC' if asc else 'DESC'}"
    if limit is not None:
        sql += f" LIMIT {limit}"
    return sql
