"""Temporal joins — as-of and range joins over event time.

Spark has no native AS OF join (DuckDB/kdb do). The scalable
formulation here is the union + ordered-window fill: tag both sides,
union them, and carry the latest right-side payload forward with
``last(..., ignoreNulls=True)`` over a (key, time)-ordered window. One
shuffle on the join key, zero row explosion — unlike the naive
inequality join, which Spark can only execute as a broadcast
nested-loop with a per-left-row scan. At 100 TB both sides stream
through the same hash exchange they'd need for any keyed join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, *, on: str,
               left_ts: str = "ts", right_ts: str = "ts",
               right_cols: Sequence[str] = (),
               prefix: str = "asof_") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same key (backward as-of, inclusive
    — DuckDB ``ASOF JOIN`` semantics). Left rows with no prior right row
    get nulls.

    ``right_cols`` are the right-side payload columns to carry; they
    appear in the output as ``{prefix}{col}``, plus ``{prefix}ts`` (the
    matched right timestamp). If several right rows share (key, ts), the
    fill is ambiguous — deduplicate the right side first.
    """
    rcols = list(right_cols)
    payload = F.struct(F.col(right_ts).alias("__t"),
                       *[F.col(c) for c in rcols])
    r = (right.select(F.col(on).alias("__k"),
                      F.col(right_ts).alias("__ts"),
                      payload.alias("__rv"))
         .withColumn("__is_l", F.lit(0)))
    l = (left.withColumn("__k", F.col(on))
         .withColumn("__ts", F.col(left_ts))
         .withColumn("__rv", F.lit(None).cast(r.schema["__rv"].dataType))
         .withColumn("__is_l", F.lit(1)))
    u = l.select(*left.columns, "__k", "__ts", "__rv", "__is_l").unionByName(
        r.select(*[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                   for c in left.columns], "__k", "__ts", "__rv", "__is_l"))
    # right rows sort before left rows at equal ts -> inclusive match
    w = (W.partitionBy("__k").orderBy("__ts", "__is_l")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = u.withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
    out = filled.where(F.col("__is_l") == 1).select(
        *left.columns,
        F.col("__last.__t").alias(f"{prefix}ts"),
        *[F.col(f"__last.{c}").alias(f"{prefix}{c}") for c in rcols])
    return out


def range_join(left: DataFrame, right: DataFrame, *, on: str,
               left_ts: str = "ts", lower: str, upper: str) -> DataFrame:
    """Equi-key + time-interval join: left rows matched to right rows
    whose [lower, upper] interval contains ``left_ts`` (inclusive). The
    equi key keeps it a hash join with the range as a post-filter —
    never a nested loop. Rows can match several intervals (a real
    product, unlike as-of)."""
    r = right.withColumnRenamed(on, f"__r_{on}")
    out = left.join(
        r, (left[on] == r[f"__r_{on}"])
        & (left[left_ts] >= r[lower]) & (left[left_ts] <= r[upper]))
    return out.drop(f"__r_{on}")


def sessionize(events: DataFrame, *, gap: str = "30 minutes",
               key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Gap-based sessions via Spark's native ``session_window``: one
    session per maximal run of events with inter-event gaps below
    ``gap``, per key. Returns (key, session_start, session_end,
    n_events) where session_end = last event time + gap (Spark's
    session_window close semantics).

    The point of the native form over the lag+cumsum formulation (the
    ``events_sessionization`` query): the SAME expression runs in
    Structured Streaming — with a watermark, sessions merge across
    micro-batches in the state store and emit on close (append mode) —
    so batch backfills and the live pipeline cannot drift. Batch plan:
    one exchange on the key, sessions assembled by the session-window
    aggregation's merging buffers.
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (events.groupBy(sw.alias("session"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(key_col,
                    F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    "n_events"))


def streaming_sessionize(events_stream: DataFrame, *, gap: str = "30 minutes",
                         key_col: str = "user_id", ts_col: str = "ts",
                         watermark_delay: str = "1 minute") -> DataFrame:
    """The streaming twin of :func:`sessionize`: watermark + native
    session_window. State is bounded by the watermark — a session's
    state is dropped once the watermark passes its close — and closed
    sessions emit exactly once in append mode."""
    wm = events_stream.withWatermark(ts_col, watermark_delay)
    return sessionize(wm, gap=gap, key_col=key_col, ts_col=ts_col)
