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


def time_bucket(events: DataFrame, *, bucket: str = "hour",
                key_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value") -> DataFrame:
    """Per-(key, bucket) mergeable aggregates — the raw material for
    :func:`gapfill`. ``bucket`` is a ``date_trunc`` unit (hour/day/...).
    Sums are decimal-exact (summation-order independent) so downstream
    fills and any external replay agree bit-for-bit; see
    ``q_hypertable_rollup`` for the rationale. One hash exchange with
    map-side partial aggregation; output cardinality is
    |keys| x |buckets|, tiny relative to the raw stream at any scale."""
    vdec = F.col(value_col).cast("decimal(18, 6)")
    return (events.groupBy(F.date_trunc(bucket, ts_col).alias("bucket_ts"),
                           F.col(key_col).alias("key"))
            .agg(F.sum(vdec).alias("sum_v"), F.count(F.lit(1)).alias("n")))


def gapfill(bucketed: DataFrame, *, bucket: str = "hour",
            method: str = "locf") -> DataFrame:
    """TimescaleDB-style ``time_bucket_gapfill``: densify a bucketed
    series to EVERY bucket between each key's first and last observation
    and fill the holes. The reference engine's hypertable rollups (and
    every monitoring UI over them) need this read-time densification;
    the raw log never stores empty buckets.

    ``method``:
      - ``"null"``  — spine only, holes stay null (``is_gap`` marks them)
      - ``"locf"``  — last observation carried forward
      - ``"linear"``— linear interpolation between the surrounding
        observations; leading/trailing holes fall back to the nearest
        observation (so the output is total on the spine)

    Scale shape: the spine is generated per key from its (min, max)
    bucket via ``sequence()`` + ``explode`` — an explosion proportional
    to |keys| x |buckets| (the *aggregate* grid, not the raw events),
    applied AFTER the rollup. The join back to the observed buckets is
    an equi-join on (key, bucket), and both fill methods are two
    key-ordered window passes over the grid — one exchange, no
    self-joins, no per-row Python. At 100 TB the grid for a year of
    hourly buckets x 1M keys is ~9B skinny rows: orders of magnitude
    under the raw stream, and still partitioned by key.

    Determinism: observed sums are decimal-exact; interpolation is
    evaluated with one fixed IEEE expression shape
    (prev + (next - prev) * frac, each operand rounded first) so an
    external engine replaying the same formula matches exactly.
    """
    if method not in ("null", "locf", "linear"):
        raise ValueError(f"unknown gapfill method: {method}")
    per_key = (bucketed.groupBy("key")
               .agg(F.min("bucket_ts").alias("__lo"),
                    F.max("bucket_ts").alias("__hi")))
    step = F.expr(f"interval 1 {bucket}")
    spine = (per_key.select(
        "key", F.explode(F.sequence("__lo", "__hi", step)).alias("bucket_ts")))
    grid = (spine.join(bucketed, ["key", "bucket_ts"], "left")
            .withColumn("is_gap", F.col("n").isNull()))
    if method == "null":
        return grid.select("key", "bucket_ts", "sum_v", "n", "is_gap")
    wb = (W.partitionBy("key").orderBy("bucket_ts")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wf = (W.partitionBy("key").orderBy("bucket_ts")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    if method == "locf":
        out = grid.withColumn("sum_v", F.last("sum_v", ignorenulls=True).over(wb))
        return out.select("key", "bucket_ts", "sum_v", "n", "is_gap")
    # linear: locate the surrounding observations and their bucket
    # timestamps, interpolate on the bucket index distance
    obs_ts = F.when(~F.col("is_gap"), F.col("bucket_ts"))
    prev_v = F.last("sum_v", ignorenulls=True).over(wb)
    prev_t = F.last(obs_ts, ignorenulls=True).over(wb)
    next_v = F.first("sum_v", ignorenulls=True).over(wf)
    next_t = F.first(obs_ts, ignorenulls=True).over(wf)
    span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    frac = ((F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t))
            / span.cast("double"))
    # decimal -> double casts (exact, summation-order independent) and
    # ONE final round on the one genuinely floating expression: an
    # external engine replaying this exact shape matches bit-for-bit
    pv = prev_v.cast("double")
    nv = next_v.cast("double")
    interp = F.round(pv + (nv - pv) * frac, 6)
    filled = (F.when(~F.col("is_gap"), F.col("sum_v").cast("double"))
              .when(prev_v.isNull(), nv)
              .when(next_v.isNull(), pv)
              .otherwise(interp))
    return (grid.withColumn("sum_v", filled)
            .select("key", "bucket_ts", "sum_v", "n", "is_gap"))


def streaming_sessionize(events_stream: DataFrame, *, gap: str = "30 minutes",
                         key_col: str = "user_id", ts_col: str = "ts",
                         watermark_delay: str = "1 minute") -> DataFrame:
    """The streaming twin of :func:`sessionize`: watermark + native
    session_window. State is bounded by the watermark — a session's
    state is dropped once the watermark passes its close — and closed
    sessions emit exactly once in append mode."""
    wm = events_stream.withWatermark(ts_col, watermark_delay)
    return sessionize(wm, gap=gap, key_col=key_col, ts_col=ts_col)


def m4_downsample(events: DataFrame, *, n_buckets: int = 100,
                  key_col: str = "event_type", ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (key, time-bucket) keep the first, last, min and max points — the
    lossless reduction for line rendering (any pixel column's drawn
    segment is determined by exactly those four points), and the
    standard "give me 100k points of a 10B-row series" read path on a
    hypertable.

    Buckets split [min(ts), max(ts)] per key into ``n_buckets`` equal
    spans (integer microsecond arithmetic — engine-exact). The whole
    reduction is ONE map-side-combinable aggregate: min/max over value
    and min_by/max_by over (ts, then value/ts) pick the four points,
    so the shuffle carries 4 points per (key, bucket) regardless of
    input size — at 100 TB this is the difference between shipping the
    series and shipping the plot. Ties (equal value at min/max, equal
    ts at ends) break on the event's timestamp then value via the
    packed struct ordering, deterministically in any engine.

    Output: (key, bucket, n, plus ts/value for first/last/min/max) —
    4 x n_buckets x |keys| rows.
    """
    # cast through TIMESTAMP: the driver parquet reads as NTZ, which
    # unix_micros rejects; the session pins UTC so the cast is identity
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bounds = (events.groupBy(F.col(key_col).alias("key"))
              .agg(F.min(us).alias("__lo"), F.max(us).alias("__hi")))
    e = (events.select(F.col(key_col).alias("key"),
                       us.alias("__us"),
                       F.col(value_col).cast("double").alias("v"))
         .join(F.broadcast(bounds), "key"))
    span = F.col("__hi") - F.col("__lo") + 1
    bucket = F.least(F.floor((F.col("__us") - F.col("__lo"))
                             * n_buckets / span).cast("int"),
                     F.lit(n_buckets - 1))
    keyed = e.select("key", bucket.alias("bucket"), "__us", "v")
    # struct ordering = lexicographic: (ts, v) for first/last,
    # (v, ts) for min/max — deterministic tie-breaks
    tv = F.struct(F.col("__us").alias("t"), F.col("v").alias("x"))
    vt = F.struct(F.col("v").alias("x"), F.col("__us").alias("t"))
    agg = (keyed.groupBy("key", "bucket")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min(tv).alias("__first"), F.max(tv).alias("__last"),
                F.min(vt).alias("__min"), F.max(vt).alias("__max")))
    out = agg.select(
        "key", "bucket", "n",
        F.timestamp_micros(F.col("__first.t")).alias("first_ts"),
        F.col("__first.x").alias("first_v"),
        F.timestamp_micros(F.col("__last.t")).alias("last_ts"),
        F.col("__last.x").alias("last_v"),
        F.col("__min.x").alias("min_v"),
        F.timestamp_micros(F.col("__min.t")).alias("min_ts"),
        F.col("__max.x").alias("max_v"),
        F.timestamp_micros(F.col("__max.t")).alias("max_ts"))
    return out


def streaming_m4(events_stream: DataFrame, *, window: str = "1 minute",
                 key_col: str = "event_type", ts_col: str = "ts",
                 value_col: str = "value",
                 watermark_delay: str = "1 minute") -> DataFrame:
    """The streaming twin of :func:`m4_downsample` on fixed time
    windows: the identical struct-packed first/last/min/max aggregate
    under a watermark — a plain streaming window aggregation, so state
    is the 4 points per open (key, window) and closed windows emit once
    in append mode. Batch backfills and the live downsampler cannot
    drift: both reduce with the same expressions (test-pinned).

    (The batch form buckets each key's [min, max] span into n equal
    parts — a read-time choice; the streaming form necessarily uses
    wall-aligned windows since the span is unbounded.)"""
    wm = events_stream.withWatermark(ts_col, watermark_delay)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    v = F.col(value_col).cast("double")
    tv = F.struct(us.alias("t"), v.alias("x"))
    vt = F.struct(v.alias("x"), us.alias("t"))
    agg = (wm.groupBy(F.window(F.col(ts_col), window).alias("win"),
                      F.col(key_col).alias("key"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.min(tv).alias("__first"), F.max(tv).alias("__last"),
                F.min(vt).alias("__min"), F.max(vt).alias("__max")))
    return agg.select(
        F.col("win.start").alias("window_start"), "key", "n",
        F.timestamp_micros(F.col("__first.t")).alias("first_ts"),
        F.col("__first.x").alias("first_v"),
        F.timestamp_micros(F.col("__last.t")).alias("last_ts"),
        F.col("__last.x").alias("last_v"),
        F.col("__min.x").alias("min_v"),
        F.col("__max.x").alias("max_v"))


def _duration_us(spec: str) -> int:
    """Parse ``"N seconds|minutes|hours|days"`` to microseconds."""
    import re
    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", spec.strip())
    if not m:
        raise ValueError(f"unsupported duration {spec!r}")
    mult = {"second": 1, "minute": 60, "hour": 3_600,
            "day": 86_400}[m.group(2)]
    return int(m.group(1)) * mult * 1_000_000


def _release_buffered(buf, hwm_us: int, lag_us: int, state) -> tuple:
    """The buffered-reorder release rule shared by the order-sensitive
    temporal folds (same semantics as the projections tier's
    ``reorderEvents``/``processingLag`` machinery,
    ``projections/streaming.py:_run_streaming_reordered``): an event is
    released once the key's event-time high-watermark has advanced
    ``lag_us`` past it, OR once Spark's global event-time watermark has
    passed it (no older row can ever arrive then — Spark drops
    late-beyond-watermark rows before the fold sees them, so releasing
    is safe and drains the tail as other keys advance the clock).
    Released events come back sorted by (event-time, payload) — a total
    order, so replay is deterministic. Returns (ready, kept)."""
    wm_us = state.getCurrentWatermarkMs() * 1_000
    horizon = max(hwm_us - lag_us, wm_us)
    ready = sorted(p for p in buf if p[0] <= horizon)
    kept = [p for p in buf if p[0] > horizon]
    return ready, kept


def streaming_event_transitions(events_stream: DataFrame, *,
                                key_col: str = "user_id",
                                type_col: str = "event_type",
                                ts_col: str = "ts",
                                watermark_delay: str = "10 minutes",
                                reorder_lag: str | None = None
                                ) -> DataFrame:
    """Streaming twin of the event-path transition extraction
    (``q_event_transitions``'s lag window): per-user state is ONE
    (last_type, last_ts) pair, each micro-batch sorts its rows per user
    by event time and emits the adjacent (from_type, to_type) pairs,
    chaining across batches through the stored last event — so the
    union of emitted pairs over any prefix of batches equals the batch
    lag-window pairs over the same rows (test-pinned). Downstream, any
    aggregation (windowed counts, the transition matrix) is a plain
    streaming groupBy over this bounded-state stream.

    Ordering contract (default, ``reorder_lag=None``): the per-batch
    sort heals disorder WITHIN a micro-batch only; ACROSS batches the
    fold chains in arrival order — it never buffers on the watermark.
    The watermark's only effect is Spark dropping rows later than
    ``watermark_delay``. So the fold-equals-batch guarantee requires
    event-time-ordered arrival across batches (single appending writer,
    atomic single-file commits — the engine's fenced append gives both).

    With ``reorder_lag="2 minutes"`` the fold additionally heals
    cross-batch disorder up to that bound: events buffer in state and
    release only once the key's event-time high-watermark has advanced
    ``reorder_lag`` past them (or the global watermark has — see
    :func:`_release_buffered`), folding in event-time order. State grows
    by lag × per-key arrival rate; the newest events are withheld until
    newer ones (or the watermark) release them — the same latency trade
    as the projections tier's ``processingLag``."""
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    # select BEFORE the watermark, keeping the event-time column: a
    # select that drops it severs the watermark from the stateful
    # operator (GroupState.getCurrentWatermarkMs would raise)
    keyed = (events_stream
             .select(F.col(key_col).alias("__k"),
                     F.col(type_col).alias("__t"),
                     F.col(ts_col).cast("timestamp").alias("__ts"))
             .withWatermark("__ts", watermark_delay)
             .withColumn("__us", F.unix_micros(F.col("__ts"))))

    lag_us = _duration_us(reorder_lag) if reorder_lag else None

    def fold(key, pdf_iter, state: GroupState):
        st = _json.loads(state.get[0]) if state.exists else None
        if lag_us is None:
            last, buf, hwm = st, None, 0
        else:
            last, buf, hwm = ((st["last"], st["buf"], st["hwm"])
                              if st is not None else (None, [], 0))
        frm, to = [], []
        # concat-then-sort the whole micro-batch: Arrow chunk order
        # within a group is unspecified and this fold is
        # order-sensitive, so in-batch ordering must be a guarantee
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks).sort_values("__us")
            rows = [(t, int(us)) for t, us in zip(pdf["__t"], pdf["__us"])]
        else:
            rows = []
        if lag_us is not None:
            for t, us in rows:
                buf.append([us, t])
                hwm = max(hwm, us)
            ready, buf = _release_buffered(buf, hwm, lag_us, state)
            rows = [(t, us) for us, t in ready]
        for t, us in rows:
            if last is not None:
                frm.append(last[0])
                to.append(t)
            last = [t, us]
        if lag_us is None:
            if last is not None:
                state.update((_json.dumps(last),))
        else:
            state.update((_json.dumps(
                {"last": last, "buf": buf, "hwm": hwm}),))
        if frm:
            yield pd.DataFrame({"user_id": [key[0]] * len(frm),
                                "from_type": frm, "to_type": to})

    return keyed.groupBy("__k").applyInPandasWithState(
        fold, f"user_id {dict(events_stream.dtypes)[key_col]}, "
        "from_type string, to_type string",
        "state string", "append", GroupStateTimeout.NoTimeout)


def ewma_anomalies(events: DataFrame, *, value_col: str = "value",
                   key_cols: Sequence[str] = ("user_id",),
                   order_cols: Sequence[str] = ("ts", "event_id"),
                   alpha: float = 0.3, lookback: int = 8) -> DataFrame:
    """Per-key EWMA deviation scores — the streaming-shaped anomaly
    read (monitoring dashboards, metric alerting) expressed as ONE
    window pass: for each event, the exponentially-weighted moving
    average of the previous ``lookback`` values in (key, time) order,
    and ``score = |value - ewma|``.

    A true infinite-history EWMA is a sequential recurrence
    (s_t = a*x_t + (1-a)*s_{t-1}) — inherently order-serial, and its
    unrolled form multiplies to 2^-1000-scale coefficients that both
    under/overflow and defeat engine-portable replay. The TRUNCATED
    normalized EWMA keeps >99% of the weight mass for
    (1-a)^lookback << 1 (0.7^8 ~ 5.8%) while unrolling into a FIXED
    expression over ``lookback`` lag() columns in one window — pure
    whole-stage codegen, one shuffle on the key, and bit-replayable by
    any SQL engine (the same portable-vs-sequential trade as the
    gapfill/LOCF tier). Early rows normalize over the lags that exist;
    each key's first row (no history) is excluded.

    Returns the input keys/order plus (value, ewma, score), score and
    ewma rounded 6. At corpus scale this is one exchange on the key —
    the same partitioning every other per-key window read reuses."""
    w = (W.partitionBy(*[F.col(c) for c in key_cols])
         .orderBy(*[F.col(c) for c in order_cols]))
    v = F.col(value_col)
    weights = [alpha * (1.0 - alpha) ** j for j in range(lookback)]
    num = None
    den = None
    for j, wt in enumerate(weights, start=1):
        lag = F.lag(v, j).over(w)
        has = lag.isNotNull()
        t_num = F.when(has, F.lit(wt) * lag).otherwise(F.lit(0.0))
        t_den = F.when(has, F.lit(wt)).otherwise(F.lit(0.0))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    out = events.select(*key_cols, *order_cols, v.alias("value"),
                        den.alias("__d"), (num / den).alias("__e"))
    # den == 0 <=> no history (the key's first row): 0.0/0.0 is NaN,
    # not NULL, so filter on the weight mass, not the ratio
    return (out.where(F.col("__d") > 0)
            .select(*key_cols, *order_cols, "value",
                    F.round("__e", 6).alias("ewma"),
                    F.round(F.abs(F.col("value") - F.col("__e")), 6)
                    .alias("score")))


def decayed_counts(events: DataFrame, key_col: str, *,
                   ref_ts_us: int, half_life: str = "7 days",
                   ts_col: str = "ts",
                   round_digits: int | None = 6) -> DataFrame:
    """Exponentially time-decayed counts per key — the
    recency-weighted popularity score (trending content, active-user
    ranking, domain freshness) computed as ONE map-side-combinable
    aggregate: ``score = sum over events of 0.5 ^ (age / half_life)``.
    A raw count ranks a key with a million stale events over one with
    ten thousand from today; the half-life discount is the standard
    fix, and because exp-decay weights are independent per event the
    whole thing stays a plain groupBy — same shuffle as `count(*)`,
    mergeable across shards/levels exactly like the hypertable ladder
    (sum of decayed sums = decayed sum of the union, for a SHARED
    reference instant).

    ``ref_ts_us`` pins "now" as an explicit epoch-microseconds
    constant: decay against a wall clock would make the result
    unreproducible (and unmergeable across shards evaluated at
    different instants). Rebasing to a later reference is one multiply
    by ``0.5^(delta/half_life)`` — no rescan. Ages are exact integer
    microsecond differences; the only float steps are one divide and
    one pow per event, and the sum is rounded 6 at output."""
    import re
    m = re.fullmatch(r"(\d+)\s*(day|hour|minute)s?", half_life.strip())
    if not m:
        raise ValueError(f"unsupported half_life {half_life!r}")
    mult = {"day": 86_400, "hour": 3_600, "minute": 60}[m.group(2)]
    hl_us = int(m.group(1)) * mult * 1_000_000
    # NTZ cast: the session pins UTC so the cast is identity (same as m4)
    age = (F.lit(ref_ts_us)
           - F.unix_micros(F.col(ts_col).cast("timestamp"))).cast("double")
    w = F.pow(F.lit(0.5), age / F.lit(float(hl_us)))
    score = F.sum(w)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (events.groupBy(F.col(key_col).alias("key"))
            .agg(F.count(F.lit(1)).alias("n"),
                 score.alias("decayed_score")))


def cusum_alerts(events: DataFrame, *, value_col: str = "value",
                 key_cols: Sequence[str] = ("event_type",),
                 order_cols: Sequence[str] = ("ts", "event_id"),
                 slack: float = 0.5, threshold: float = 5.0,
                 ref: DataFrame | None = None) -> DataFrame:
    """One-sided CUSUM changepoint detection per key — the
    upward-shift monitor (Page 1954) behind SPC dashboards and drift
    alerting: ``S_t = max(0, S_{t-1} + (x_t - ref - slack))``, alert
    while ``S_t > threshold``.

    The recurrence looks order-serial (like EWMA's), but the clamp has
    a CLOSED FORM over prefix sums: with ``C_t = sum_{j<=t} y_j``
    (``y = x - ref - slack``), ``S_t = C_t - min(0, min_{j<=t} C_j)``
    — so the whole detector is TWO window passes (a running sum and a
    running min) over one (key, time)-ordered exchange, pure
    whole-stage codegen, no recursion, no Python. Window prefix
    aggregates evaluate in frame order, so the float summation order
    is fixed and an external engine replays it bit-for-bit (quantized
    6 at the threshold compare, the boundary-flip rule every
    thresholded query here follows).

    ``ref`` defaults to each key's own mean (rounded 6, broadcast
    back) — drift-from-own-baseline; pass a (key..., ref) frame for
    fixed targets. ``slack`` desensitizes to noise below
    ``slack``/event; ``threshold`` is the alert level in value units.

    Returns per key: n_alerts (events in alert state), max_s (peak
    excursion), first_alert_* (order cols of the first alert, null if
    none) — the summary a monitoring read wants; join the per-event
    scores back yourself if you need the full trace."""
    ks = list(key_cols)
    if ref is None:
        ref = (events.groupBy(*ks)
               .agg(F.round(F.avg(value_col), 6).alias("ref")))
    w = (W.partitionBy(*ks).orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    y = F.col(value_col) - F.col("ref") - F.lit(slack)
    scored = (events.join(F.broadcast(ref), ks)
              .withColumn("__c", F.sum(y).over(w))
              .withColumn("__m", F.least(F.lit(0.0), F.min("__c").over(w)))
              .withColumn("__s", F.round(F.col("__c") - F.col("__m"), 6)))
    alert = F.col("__s") > threshold
    # struct min = lexicographic (order_cols...) min over alert rows ->
    # the genuinely FIRST alert, not independent per-column minima
    first = F.min(F.when(alert, F.struct(*[F.col(c)
                                           for c in order_cols])))
    agg = (scored.groupBy(*ks)
           .agg(F.sum(F.when(alert, 1).otherwise(0)).alias("n_alerts"),
                F.round(F.max("__s"), 6).alias("max_s"),
                first.alias("__first")))
    return agg.select(*ks, "n_alerts", "max_s",
                      *[F.col(f"__first.{c}").alias(f"first_alert_{c}")
                        for c in order_cols])


def streaming_ewma_anomalies(events_stream: DataFrame, *,
                             value_col: str = "value",
                             key_col: str = "user_id",
                             ts_col: str = "ts", alpha: float = 0.3,
                             watermark_delay: str = "10 minutes",
                             reorder_lag: str | None = None
                             ) -> DataFrame:
    """Streaming twin of :func:`ewma_anomalies` — and the place where
    the TRUE infinite-history recurrence is natural: per-key state is
    ONE float (the running EWMA), each event scores against the state
    BEFORE folding itself in (``score = |x - s|``, then
    ``s = a*x + (1-a)*s``), chaining across micro-batches through the
    state store. The batch form unrolls a truncated window because a
    full-history recurrence doesn't parallelize; here the fold is the
    execution model, so state is 8 bytes/key instead of 8 lags/row.
    A key's first event seeds the state and emits nothing (the batch
    first-row exclusion).

    Ordering contract — same as :func:`streaming_event_transitions`:
    by default the per-batch sort heals in-batch disorder only and the
    fold chains across batches in ARRIVAL order (in-order arrival is
    the caller's contract: single appending writer, atomic single-file
    commits); pass ``reorder_lag`` to buffer and heal cross-batch
    disorder up to that bound via the hwm-lag / global-watermark
    release rule (:func:`_release_buffered`)."""
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    # select BEFORE the watermark, keeping the event-time column: a
    # select that drops it severs the watermark from the stateful
    # operator (GroupState.getCurrentWatermarkMs would raise)
    keyed = (events_stream
             .select(F.col(key_col).alias("__k"),
                     F.col(value_col).alias("__v"),
                     F.col(ts_col).cast("timestamp").alias("__ts"))
             .withWatermark("__ts", watermark_delay)
             .withColumn("__us", F.unix_micros(F.col("__ts"))))

    lag_us = _duration_us(reorder_lag) if reorder_lag else None

    def fold(key, pdf_iter, state: GroupState):
        st = _json.loads(state.get[0]) if state.exists else None
        if lag_us is None:
            s, buf, hwm = st, None, 0
        else:
            s, buf, hwm = ((st["s"], st["buf"], st["hwm"])
                           if st is not None else (None, [], 0))
        us_o, v_o, e_o, sc_o = [], [], [], []
        # concat-then-sort: see streaming_event_transitions
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks).sort_values("__us")
            rows = [(float(v), int(us))
                    for v, us in zip(pdf["__v"], pdf["__us"])]
        else:
            rows = []
        if lag_us is not None:
            for v, us in rows:
                buf.append([us, v])
                hwm = max(hwm, us)
            ready, buf = _release_buffered(buf, hwm, lag_us, state)
            rows = [(v, us) for us, v in ready]
        for v, us in rows:
            if s is not None:
                us_o.append(us)
                v_o.append(v)
                e_o.append(round(s, 6))
                sc_o.append(round(abs(v - s), 6))
                s = alpha * v + (1.0 - alpha) * s
            else:
                s = v
        if lag_us is None:
            if s is not None:
                state.update((_json.dumps(s),))
        else:
            state.update((_json.dumps({"s": s, "buf": buf, "hwm": hwm}),))
        if us_o:
            yield pd.DataFrame({key_col: [key[0]] * len(us_o),
                                "us": us_o, "value": v_o,
                                "ewma": e_o, "score": sc_o})

    return keyed.groupBy("__k").applyInPandasWithState(
        fold, f"{key_col} {dict(events_stream.dtypes)[key_col]}, "
        "us long, value double, ewma double, score double",
        "state string", "append", GroupStateTimeout.NoTimeout)


def streaming_cusum_alerts(events_stream: DataFrame, ref: float, *,
                           value_col: str = "value",
                           key_col: str = "event_type",
                           ts_col: str = "ts", slack: float = 0.5,
                           threshold: float = 5.0,
                           watermark_delay: str = "10 minutes",
                           reorder_lag: str | None = None
                           ) -> DataFrame:
    """Streaming twin of :func:`cusum_alerts`: the clamp recurrence
    ``S = max(0, S + (x - ref - slack))`` run directly — per-key state
    is ONE float, alerts emit as they happen instead of at scan end.
    Batch uses the prefix-sum/running-min closed form because the
    recurrence doesn't parallelize; in a stream the fold IS the
    execution model (same duality as the EWMA pair). Emits one row per
    ALERT event (s > threshold, quantized 6 like batch): (key, us,
    value, s). ``ref`` is a fixed baseline constant — the SPC
    monitoring setup; recompute it out-of-band, not inside the
    monitor. Equality contract (test-pinned): the alert set over any
    prefix of batches equals the batch operator on the same rows —
    under the same ordering contract as
    :func:`streaming_event_transitions` (in-order arrival across
    batches by default; ``reorder_lag`` buffers and heals cross-batch
    disorder up to that bound)."""
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    # select BEFORE the watermark, keeping the event-time column: a
    # select that drops it severs the watermark from the stateful
    # operator (GroupState.getCurrentWatermarkMs would raise)
    keyed = (events_stream
             .select(F.col(key_col).alias("__k"),
                     F.col(value_col).alias("__v"),
                     F.col(ts_col).cast("timestamp").alias("__ts"))
             .withWatermark("__ts", watermark_delay)
             .withColumn("__us", F.unix_micros(F.col("__ts"))))
    ktype = dict(events_stream.dtypes)[key_col]

    lag_us = _duration_us(reorder_lag) if reorder_lag else None

    def fold(key, pdf_iter, state: GroupState):
        st = _json.loads(state.get[0]) if state.exists else None
        if lag_us is None:
            s, buf, hwm = (st if st is not None else 0.0), None, 0
        else:
            s, buf, hwm = ((st["s"], st["buf"], st["hwm"])
                           if st is not None else (0.0, [], 0))
        us_o, v_o, s_o = [], [], []
        # concat-then-sort: see streaming_event_transitions
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks).sort_values("__us")
            rows = [(float(v), int(us))
                    for v, us in zip(pdf["__v"], pdf["__us"])]
        else:
            rows = []
        if lag_us is not None:
            for v, us in rows:
                buf.append([us, v])
                hwm = max(hwm, us)
            ready, buf = _release_buffered(buf, hwm, lag_us, state)
            rows = [(v, us) for us, v in ready]
        for v, us in rows:
            s = max(0.0, s + (v - ref - slack))
            if round(s, 6) > threshold:
                us_o.append(us)
                v_o.append(v)
                s_o.append(round(s, 6))
        if lag_us is None:
            state.update((_json.dumps(s),))
        else:
            state.update((_json.dumps({"s": s, "buf": buf, "hwm": hwm}),))
        if us_o:
            yield pd.DataFrame({"key": [key[0]] * len(us_o),
                                "us": us_o, "value": v_o, "s": s_o})

    return keyed.groupBy("__k").applyInPandasWithState(
        fold, f"key {ktype}, us long, value double, s double",
        "state string", "append", GroupStateTimeout.NoTimeout)


def streaming_funnel(events_stream: DataFrame,
                     stages: tuple = ("view", "click", "purchase"), *,
                     key_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts",
                     watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming ordered-sequence funnel — the bounded-state twin of
    the batch conditional-min funnel (`q_funnel_conversion`'s shape):
    per-key state is ONE int64 micro-timestamp per stage (never the
    event history), updated by the same rule the batch form encodes as
    nested conditional mins — stage 0 latches its first timestamp,
    stage s latches the first event with ``ts > t[s-1]`` — and a key
    EMITS exactly once, in the micro-batch where its last stage
    completes: (key, <stage>_us per stage).

    Equality contract (test-pinned): under in-order arrival (the same
    per-batch-sort + watermark-bounded-lateness contract as the
    streaming EWMA/transition ops), the emitted set and timestamps
    equal the batch conditional-min funnel on the same rows — in
    ts order the first qualifying event IS the conditional min. At
    web scale the state store holds |keys| x |stages| longs where the
    batch form shuffles the event feed; completions stream out as
    they happen instead of at scan end."""
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    stages = tuple(stages)
    idx = {s: i for i, s in enumerate(stages)}
    ktype = dict(events_stream.dtypes)[key_col]
    keyed = (events_stream
             .withWatermark(ts_col, watermark_delay)
             .where(F.col(type_col).isin(list(stages)))
             .select(F.col(key_col).alias("__k"),
                     F.col(type_col).alias("__t"),
                     F.unix_micros(F.col(ts_col).cast("timestamp"))
                     .alias("__us")))
    out_cols = [f"{s}_us" for s in stages]

    def fold(key, pdf_iter, state: GroupState):
        t = _json.loads(state.get[0]) if state.exists else \
            [None] * len(stages)
        done_before = t[-1] is not None
        # concat-then-sort the WHOLE micro-batch (not per Arrow chunk):
        # chunk arrival order within a group is unspecified, and the
        # latch rule is order-sensitive — this makes in-batch ordering
        # a guarantee, so only CROSS-batch disorder is left to the
        # watermark contract
        chunks = [] if done_before else list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks).sort_values("__us")
            for et, us in zip(pdf["__t"], pdf["__us"]):
                if t[-1] is not None:
                    break
                s = idx[et]
                if s == 0:
                    if t[0] is None:
                        t[0] = int(us)
                elif t[s] is None and t[s - 1] is not None \
                        and int(us) > t[s - 1]:
                    t[s] = int(us)
        state.update((_json.dumps(t),))
        if t[-1] is not None and not done_before:
            row = {key_col: [key[0]]}
            row.update({c: [t[i]] for i, c in enumerate(out_cols)})
            yield pd.DataFrame(row)

    schema = ", ".join([f"{key_col} {ktype}"]
                       + [f"{c} long" for c in out_cols])
    return keyed.groupBy("__k").applyInPandasWithState(
        fold, schema, "state string", "append",
        GroupStateTimeout.NoTimeout)
