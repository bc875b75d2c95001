"""Temporal joins: as-of (union + window fill) and range join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.extensions.temporal import as_of_join, range_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)),
         (4, "u3", _ts(30))],
        ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("u1", _ts(10), 100.0), ("u1", _ts(15), 150.0),
         ("u2", _ts(7), 70.0)],
        ["k", "ts", "v"])
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    got = {r.id: (r.asof_v, r.asof_ts) for r in
           as_of_join(left, right, on="k", right_cols=["v"]).collect()}
    assert got[1] == (100.0, _ts(10))   # inclusive: equal ts matches
    assert got[2] == (150.0, _ts(15))   # latest prior, not first
    assert got[3] == (None, None)       # right row is later -> no match
    assert got[4] == (None, None)       # key absent from right
    assert len(got) == 4                # exactly one output row per left row


def test_asof_plan_is_single_window_no_nested_loop(sides):
    left, right = sides
    plan = (as_of_join(left, right, on="k", right_cols=["v"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_multi_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(40))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("u1", _ts(0), _ts(15), "a"), ("u1", _ts(5), _ts(12), "b")],
        ["k", "lo", "hi", "tag"])
    got = sorted((r.id, r.tag) for r in
                 range_join(left, right, on="k", lower="lo", upper="hi")
                 .collect())
    assert got == [(1, "a"), (1, "b")]  # row 1 in both intervals; row 2 in none


# ---------------------------------------------------------------------------
# gapfill (time_bucket_gapfill analogue)
# ---------------------------------------------------------------------------

from eventstorm_spark.extensions.temporal import gapfill, time_bucket


def _hours(rows, spark):
    """(key, hour_offset, sum_v_or_None) triples -> a bucketed frame."""
    base = dt.datetime(2024, 3, 1, 0, 0)
    data = [(k, base + dt.timedelta(hours=h), float(v), 1)
            for k, h, v in rows]
    df = spark.createDataFrame(data, ["key", "bucket_ts", "sum_v", "n"])
    return df.withColumn("sum_v", F.col("sum_v").cast("decimal(18,6)"))


def test_gapfill_null_spine_and_flags(spark):
    b = _hours([("a", 0, 1.0), ("a", 3, 4.0)], spark)
    got = {(r.bucket_ts.hour, r.is_gap, r.sum_v)
           for r in gapfill(b, method="null").collect()}
    assert {(h, g) for h, g, _ in got} == {
        (0, False), (1, True), (2, True), (3, False)}
    assert {v for _, g, v in got if g} == {None}


def test_gapfill_locf_carries_forward(spark):
    b = _hours([("a", 0, 1.0), ("a", 3, 4.0), ("b", 5, 9.0)], spark)
    got = {(r.key, r.bucket_ts.hour): float(r.sum_v)
           for r in gapfill(b, method="locf").collect()}
    assert got[("a", 1)] == 1.0 and got[("a", 2)] == 1.0
    assert got[("a", 3)] == 4.0
    assert got[("b", 5)] == 9.0  # single-point key: spine is one bucket


def test_gapfill_linear_interpolates_and_clamps(spark):
    # a: 1.0 at h0, 4.0 at h3 -> h1=2.0, h2=3.0 (exact thirds)
    b = _hours([("a", 0, 1.0), ("a", 3, 4.0)], spark)
    got = {r.bucket_ts.hour: r.sum_v
           for r in gapfill(b, method="linear").collect()}
    assert got[1] == pytest.approx(2.0) and got[2] == pytest.approx(3.0)
    assert got[0] == 1.0 and got[3] == 4.0


def test_gapfill_single_exchange_plan(spark):
    ev = spark.createDataFrame(
        [("t", dt.datetime(2024, 3, 1, h), 1.0) for h in (0, 5)],
        ["event_type", "ts", "value"])
    plan = (gapfill(time_bucket(ev), method="linear")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both fill windows share ONE (key)-partitioned sort/exchange chain:
    # no per-method extra shuffle beyond the spine join
    assert plan.count("Window") <= 2


def test_m4_downsample_semantics(spark):
    from eventstorm_spark.extensions.temporal import m4_downsample
    base = dt.datetime(2024, 6, 1, 0, 0)
    rows = [("k", base + dt.timedelta(minutes=m), float(v))
            for m, v in [(0, 5.0), (1, 9.0), (2, 1.0), (3, 7.0),
                         (40, 2.0), (41, 8.0)]]
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = {r.bucket: r for r in m4_downsample(ev, n_buckets=2).collect()}
    b0 = got[0]
    assert (b0.first_v, b0.last_v, b0.min_v, b0.max_v) == (5.0, 7.0, 1.0, 9.0)
    assert b0.min_ts.minute == 2 and b0.max_ts.minute == 1
    b1 = got[1]
    assert (b1.first_v, b1.last_v) == (2.0, 8.0)
    assert b1.n == 2


def test_m4_is_one_aggregate_no_python(spark):
    from eventstorm_spark.extensions.temporal import m4_downsample
    ev = spark.createDataFrame(
        [("k", dt.datetime(2024, 6, 1, 0, m), 1.0) for m in range(5)],
        ["event_type", "ts", "value"])
    plan = (m4_downsample(ev, n_buckets=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # bounds + main agg: the per-(key,bucket) reduction is ONE
    # hash aggregate pair (partial + final), not four window sorts
    assert "Window" not in plan


def test_streaming_m4_matches_batch_reduction(spark, tmp_path):
    """streaming_m4 over a file stream == the same aggregate run in
    batch on the same rows (append mode, windows closed by watermark)."""
    from eventstorm_spark.extensions.temporal import streaming_m4

    src = str(tmp_path / "m4src")
    schema = "event_type string, ts timestamp, value double"
    base = dt.datetime(2024, 6, 1, 0, 0)
    rows = [("k", base + dt.timedelta(seconds=s), float(v))
            for s, v in [(0, 5.0), (10, 9.0), (50, 1.0),
                         (70, 7.0), (80, 2.0), (200, 4.0)]]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    got = []
    q = (streaming_m4(spark.readStream.schema(schema).parquet(src),
                      window="1 minute")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(b.collect())).start())
    try:
        q.processAllAvailable()
        # late-ish tail event: advances the watermark, closes minute 1
        spark.createDataFrame(
            [("k", base + dt.timedelta(seconds=400), 0.0)], schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    byw = {r.window_start.minute: r for r in got}
    m0 = byw[0]
    assert (m0.first_v, m0.last_v, m0.min_v, m0.max_v) == (5.0, 1.0, 1.0, 9.0)
    m1 = byw[1]
    assert (m1.first_v, m1.last_v, m1.min_v, m1.max_v) == (7.0, 2.0, 2.0, 7.0)
    assert m1.n == 2


def test_streaming_event_transitions_chain_across_batches(spark, tmp_path):
    from eventstorm_spark.extensions.temporal import (
        streaming_event_transitions)

    src = str(tmp_path / "trans_src")
    schema = "user_id long, event_type string, ts timestamp"
    base = dt.datetime(2024, 7, 1, 0, 0)

    def rows(spec, sec0):
        return [(u, t, base + dt.timedelta(seconds=sec0 + i))
                for i, (u, t) in enumerate(spec)]

    spark.createDataFrame(
        rows([(1, "view"), (1, "click"), (2, "view")], 0),
        schema).coalesce(1).write.mode("append").parquet(src)

    got = []
    q = (streaming_event_transitions(
            spark.readStream.schema(schema).parquet(src))
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(
             (r.user_id, r.from_type, r.to_type) for r in b.collect()))
         .start())
    try:
        q.processAllAvailable()
        # batch 2 chains: user 1's click -> purchase crosses the batch
        spark.createDataFrame(
            rows([(1, "purchase"), (2, "click")], 60),
            schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert sorted(got) == [
        (1, "click", "purchase"), (1, "view", "click"),
        (2, "view", "click")]


def test_ewma_anomalies_matches_reference_fold(spark):
    """The unrolled lag expression equals the direct truncated-EWMA
    computed in Python, first rows are excluded, and the result is
    partitioning-independent."""
    from eventstorm_spark.extensions.temporal import ewma_anomalies
    import datetime as dt
    vals = {"u1": [1.0, 2.0, 4.0, 8.0, 16.0, 3.0, 3.0, 3.0, 3.0, 100.0],
            "u2": [5.0]}
    rows = []
    eid = 0
    for u, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, u, dt.datetime(2024, 1, 1, 0, i), v))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    got = {r.event_id: (r.ewma, r.score)
           for r in ewma_anomalies(df, key_cols=("user_id",),
                                   order_cols=("ts", "event_id")).collect()}
    # u2 has a single event (no history) and u1's first row is excluded
    assert len(got) == len(vals["u1"]) - 1
    alpha, lb = 0.3, 8
    weights = [alpha * (1.0 - alpha) ** j for j in range(lb)]
    for t in range(1, len(vals["u1"])):
        hist = vals["u1"][:t][::-1][:lb]
        num = sum(w * x for w, x in zip(weights, hist))
        den = sum(w for w, _ in zip(weights, hist))
        e = num / den
        assert got[t] == (round(e, 6), round(abs(vals["u1"][t] - e), 6))
    again = {r.event_id: (r.ewma, r.score)
             for r in ewma_anomalies(df.repartition(7),
                                     key_cols=("user_id",),
                                     order_cols=("ts", "event_id"))
             .collect()}
    assert again == got


def test_decayed_counts_recency_beats_stale_volume(spark):
    from eventstorm_spark.extensions.temporal import decayed_counts
    import datetime as dt
    ref = dt.datetime(2024, 2, 1)
    ref_us = int(ref.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    rows = (
        # "stale": 100 events 28 days old -> weight 0.0625 each = 6.25
        [("stale", ref - dt.timedelta(days=28)) for _ in range(100)]
        # "fresh": 20 events at the reference -> weight 1.0 each = 20
        + [("fresh", ref) for _ in range(20)])
    df = spark.createDataFrame(rows, ["user", "ts"])
    got = {r.key: r for r in decayed_counts(
        df, "user", ref_ts_us=ref_us, half_life="7 days").collect()}
    assert got["stale"].n == 100 and got["fresh"].n == 20
    assert got["stale"].decayed_score == 6.25   # 100 * 0.5^4
    assert got["fresh"].decayed_score == 20.0
    # recency re-ranks: fresh outranks stale despite 5x fewer events
    assert got["fresh"].decayed_score > got["stale"].decayed_score
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decayed_counts(df, "user", ref_ts_us=ref_us, half_life="1 epoch")


def test_cusum_closed_form_matches_clamped_recurrence(spark):
    """The prefix-sum/running-min form equals the textbook
    S_t = max(0, S_{t-1} + y_t) recurrence, and a planted shift is
    detected promptly while the pre-shift stream stays quiet."""
    from eventstorm_spark.extensions.temporal import cusum_alerts
    import datetime as dt
    # 50 quiet events at the baseline, then a +3/event shift
    vals = [10.0] * 50 + [13.0] * 30
    rows = [(i, "k", dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["event_id", "key", "ts", "value"])
    ref = spark.createDataFrame([("k", 10.0)], ["key", "ref"])
    r = cusum_alerts(df, key_cols=("key",), order_cols=("ts", "event_id"),
                     slack=1.0, threshold=10.0, ref=ref).collect()[0]
    # reference fold
    s, n_alerts, first, mx = 0.0, 0, None, 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - 10.0 - 1.0))
        mx = max(mx, s)
        if round(s, 6) > 10.0:
            n_alerts += 1
            first = first if first is not None else i
    assert r.n_alerts == n_alerts and n_alerts > 0
    assert r.max_s == round(mx, 6)
    assert r.first_alert_event_id == first and first >= 50  # post-shift
    # partitioning independence
    r2 = cusum_alerts(df.repartition(7), key_cols=("key",),
                      order_cols=("ts", "event_id"),
                      slack=1.0, threshold=10.0, ref=ref).collect()[0]
    assert r2 == r


def test_streaming_ewma_chains_across_batches(spark, tmp_path):
    """Streaming EWMA: state chains across micro-batches (the whole
    run equals one Python fold over the full sequence), and a key's
    first event seeds without emitting."""
    from eventstorm_spark.extensions.temporal import (
        streaming_ewma_anomalies)

    src = str(tmp_path / "ewma_src")
    schema = "user_id long, value double, ts timestamp"
    base = dt.datetime(2024, 7, 1, 0, 0)

    def rows(vals, sec0):
        return [(1, v, base + dt.timedelta(seconds=sec0 + i))
                for i, v in enumerate(vals)]

    batch1, batch2 = [1.0, 2.0, 4.0], [8.0, 100.0]
    spark.createDataFrame(rows(batch1, 0), schema) \
        .coalesce(1).write.mode("append").parquet(src)

    got = []
    q = (streaming_ewma_anomalies(
            spark.readStream.schema(schema).parquet(src))
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(
             (r.us, r.value, r.ewma, r.score) for r in b.collect()))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows(batch2, 60), schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    # reference fold over the concatenated stream
    s, want = None, []
    for i, v in enumerate(batch1 + batch2):
        if s is not None:
            want.append((v, round(s, 6), round(abs(v - s), 6)))
        s = v if s is None else 0.3 * v + 0.7 * s
    assert [(v, e, sc) for _, v, e, sc in sorted(got)] == want
    assert len(got) == len(batch1 + batch2) - 1  # first event silent


def test_streaming_cusum_matches_batch_alert_set(spark, tmp_path):
    from eventstorm_spark.extensions.temporal import (cusum_alerts,
                                                      streaming_cusum_alerts)

    src = str(tmp_path / "cusum_src")
    schema = "event_id long, event_type string, value double, ts timestamp"
    base = dt.datetime(2024, 7, 1)

    def rows(vals, sec0, eid0):
        return [(eid0 + i, "k", v, base + dt.timedelta(seconds=sec0 + i))
                for i, v in enumerate(vals)]

    batch1 = [10.0] * 20 + [14.0] * 5          # drift starts
    batch2 = [14.0] * 10 + [10.0] * 5          # keeps alerting, then decays
    spark.createDataFrame(rows(batch1, 0, 0), schema) \
        .coalesce(1).write.mode("append").parquet(src)

    got = []
    q = (streaming_cusum_alerts(
            spark.readStream.schema(schema).parquet(src), 10.0,
            slack=1.0, threshold=10.0)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(
             (r.us, r.s) for r in b.collect()))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows(batch2, 60, 100), schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    assert got  # the planted drift does alert

    # batch operator over the union of both batches: same alert count
    # per key and the same FIRST alert instant
    df = (spark.read.parquet(src))
    ref = spark.createDataFrame([("k", 10.0)], ["event_type", "ref"])
    b = cusum_alerts(df, key_cols=("event_type",),
                     order_cols=("ts", "event_id"),
                     slack=1.0, threshold=10.0, ref=ref).collect()[0]
    assert b.n_alerts == len(got)
    import calendar
    first_us = int(calendar.timegm(
        b.first_alert_ts.timetuple()) * 1_000_000)
    assert min(u for u, _ in got) == first_us


def test_streaming_ewma_reorder_lag_heals_cross_batch_disorder(
        spark, tmp_path):
    """reorder_lag buffers cross-batch disorder: an event that arrives
    a batch EARLY (higher ts first) still folds in event-time order,
    and the newest events stay withheld until the hwm-lag horizon
    passes them."""
    from eventstorm_spark.extensions.temporal import (
        streaming_ewma_anomalies)

    src = str(tmp_path / "ewma_reorder_src")
    schema = "user_id long, value double, ts timestamp"
    base = dt.datetime(2024, 7, 1)

    def write(rows):
        spark.createDataFrame(
            [(1, v, base + dt.timedelta(seconds=s)) for v, s in rows],
            schema).coalesce(1).write.mode("append").parquet(src)

    write([(100.0, 61)])                      # arrives FIRST, ts later
    got = []
    q = (streaming_ewma_anomalies(
            spark.readStream.schema(schema).parquet(src),
            reorder_lag="30 seconds")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(
             (r.us, r.value, r.ewma, r.score) for r in b.collect()))
         .start())
    try:
        q.processAllAvailable()
        assert got == []                      # withheld, not folded
        # ts 60 arrives a batch LATE; 120/125 advance the hwm so the
        # horizon (hwm - 30s = 95s) releases 60 and 61 in time order
        write([(8.0, 60), (5.0, 120), (6.0, 125)])
        q.processAllAvailable()
        # 8.0@60 seeds silently; 100.0@61 scores against ewma=8.0 —
        # the healed order. Without reorder, 100.0 would have seeded.
        assert [(v, e, sc) for _, v, e, sc in got] == [
            (100.0, 8.0, 92.0)]
        # 120/125 are inside the lag window: withheld
        write([(7.0, 300)])                   # hwm 300 -> horizon 270
        q.processAllAvailable()
    finally:
        q.stop()
    s = 0.3 * 100.0 + 0.7 * 8.0              # 35.6 after the heal
    want = [(100.0, 8.0, 92.0)]
    for v in (5.0, 6.0):
        want.append((v, round(s, 6), round(abs(v - s), 6)))
        s = 0.3 * v + 0.7 * s
    assert [(v, e, sc) for _, v, e, sc in sorted(got)] == want


def test_streaming_transitions_reorder_lag_and_watermark_drain(
        spark, tmp_path):
    """Transitions with reorder_lag: cross-batch disorder heals, and
    the GLOBAL watermark drains buffered events even when the key's
    own hwm-lag horizon never would (lag is huge here)."""
    from eventstorm_spark.extensions.temporal import (
        streaming_event_transitions)

    src = str(tmp_path / "trans_reorder_src")
    schema = "user_id long, event_type string, ts timestamp"
    base = dt.datetime(2024, 7, 1)

    def write(rows):
        spark.createDataFrame(
            [(u, t, base + dt.timedelta(seconds=s)) for u, t, s in rows],
            schema).coalesce(1).write.mode("append").parquet(src)

    write([(1, "b", 61), (1, "a", 60)])
    got = []
    q = (streaming_event_transitions(
            spark.readStream.schema(schema).parquet(src),
            watermark_delay="10 seconds", reorder_lag="1 hour")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(
             (r.from_type, r.to_type) for r in b.collect()))
         .start())
    try:
        q.processAllAvailable()
        assert got == []                      # all buffered (lag 1h)
        # watermark after batch1 = 61s - 10s = 51s; advance it far
        # past 61 with a later batch, then give key 1 one more row so
        # its fold runs and the wm horizon releases a->b
        write([(1, "c", 600)])                # wm during: 51s -> no release
        q.processAllAvailable()
        assert got == []
        write([(1, "d", 601)])                # wm during: 590s -> drain
        q.processAllAvailable()
    finally:
        q.stop()
    # horizon during batch3 = wm 590s: a(60) and b(61) drain and fold
    # in event-time order; c(600) and d(601) are above it -> buffered
    assert got == [("a", "b")]


def test_streaming_cusum_reorder_lag_heals_cross_batch_disorder(
        spark, tmp_path):
    """reorder_lag on the cusum fold (temporal.py:651 shares
    _release_buffered with ewma/transitions, but nothing drove ITS
    buffered branch before this test). A spike that arrives a batch
    EARLY is withheld (fold-on-arrival would alert immediately — the
    proven-red leg), then folds in healed event-time order: the small
    value at ts 60 clamps to 0 BEFORE the spike, so exactly one alert
    fires at the spike, not a second one after it."""
    from eventstorm_spark.extensions.temporal import (
        streaming_cusum_alerts)

    src = str(tmp_path / "cusum_reorder_src")
    schema = "event_type string, value double, ts timestamp"
    base = dt.datetime(2024, 7, 1)

    def write(rows):
        spark.createDataFrame(
            [("k", v, base + dt.timedelta(seconds=s)) for v, s in rows],
            schema).coalesce(1).write.mode("append").parquet(src)

    write([(30.0, 61)])                       # spike arrives FIRST
    got = []
    q = (streaming_cusum_alerts(
            spark.readStream.schema(schema).parquet(src),
            ref=10.0, slack=1.0, threshold=10.0,
            reorder_lag="30 seconds")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.extend(
             (r.us, r.value, r.s) for r in b.collect()))
         .start())
    try:
        q.processAllAvailable()
        # without the buffer, 30.0 folds now: s = 30-10-1 = 19 > 10
        # would ALERT here — withheld instead
        assert got == []
        # ts 60 arrives a batch LATE; 120/125 push hwm to 125 so the
        # horizon (125-30 = 95s) releases 60 then 61 in time order
        write([(5.0, 60), (12.0, 120), (12.0, 125)])
        q.processAllAvailable()
        # healed: 5.0@60 clamps s to 0 first, then the spike alerts at
        # s=19. Arrival order would also emit a phantom second alert
        # (s = 19+5-11 = 13) — its absence is the heal.
        assert [(v, s) for _, v, s in got] == [(30.0, 19.0)]
        write([(11.5, 300)])                  # hwm 300 -> horizon 270
        q.processAllAvailable()
    finally:
        q.stop()
    # 120/125 drain: s = 19+12-11 = 20, then 21 — both above threshold
    us = lambda sec: int((base + dt.timedelta(seconds=sec)
                          - dt.datetime(1970, 1, 1)).total_seconds()
                         * 1_000_000)
    assert sorted(got) == [(us(61), 30.0, 19.0),
                           (us(120), 12.0, 20.0),
                           (us(125), 12.0, 21.0)]


@pytest.mark.parametrize("rate,lag_s", [(1, 30), (10, 30), (10, 10)])
def test_reorder_buffer_state_is_lag_times_arrival_rate(
        spark, tmp_path, rate, lag_s):
    """Empirical pin of the documented state-size law
    (temporal.py:350: 'State grows by lag × per-key arrival rate'):
    after one uniform-rate batch, the withheld tail — the buffer
    content, observed as rows NOT yet emitted — is exactly
    rate × lag events, independent of how long the history is. 10×
    the arrival rate → 10× the buffer; a shorter lag shrinks it
    proportionally; total history length N never appears."""
    from eventstorm_spark.extensions.temporal import (
        streaming_ewma_anomalies)

    span_s, base = 100, dt.datetime(2024, 7, 1)
    n = rate * span_s
    src = str(tmp_path / f"law_{rate}_{lag_s}")
    schema = "user_id long, value double, ts timestamp"
    spark.createDataFrame(
        [(1, 1.0, base + dt.timedelta(seconds=i / rate))
         for i in range(n)],
        schema).coalesce(1).write.mode("append").parquet(src)

    got = []
    q = (streaming_ewma_anomalies(
            spark.readStream.schema(schema).parquet(src),
            reorder_lag=f"{lag_s} seconds")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _e: got.append(b.count()))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # horizon = hwm - lag releases everything except the trailing
    # lag-window; minus 1 for the silent first-event seed
    withheld = rate * lag_s
    assert sum(got) == n - withheld - 1


# -- _release_buffered property pin (pure function; no Spark) -----------

class _FakeState:
    def __init__(self, wm_ms=0):
        self._wm_ms = wm_ms

    def getCurrentWatermarkMs(self):
        return self._wm_ms


def _replay_release(arrivals, batches, lag_us, final_wm_us):
    """Feed `arrivals` (list of (us, val)) split into `batches` chunks
    through the shared release rule, then drain with the watermark at
    `final_wm_us`; return the concatenated released sequence."""
    from eventstorm_spark.extensions.temporal import _release_buffered

    buf, hwm, out = [], 0, []
    n = max(1, batches)
    size = max(1, (len(arrivals) + n - 1) // n)
    for i in range(0, len(arrivals), size):
        for us, v in arrivals[i:i + size]:
            buf.append([us, v])
            hwm = max(hwm, us)
        ready, buf = _release_buffered(buf, hwm, lag_us, _FakeState(0))
        out.extend(tuple(p) for p in ready)
    ready, buf = _release_buffered(
        buf, hwm, lag_us, _FakeState(final_wm_us // 1000))
    out.extend(tuple(p) for p in ready)
    assert buf == [] or final_wm_us < max(p[0] for p in buf)
    return out


from hypothesis import HealthCheck as _HC, given as _given, \
    settings as _settings, strategies as _st


@_settings(max_examples=200, deadline=None,
           suppress_health_check=[_HC.too_slow])
@_given(seq=_st.lists(_st.integers(min_value=0, max_value=500),
                      min_size=1, max_size=60),
        lag=_st.integers(min_value=1, max_value=100),
        batches=_st.integers(min_value=1, max_value=8),
        data=_st.data())
def test_release_buffered_heals_bounded_disorder(seq, lag, batches, data):
    """Property pin of the shared buffered-reorder release rule
    (temporal.py _release_buffered, backing reorder_lag on all three
    temporal folds and the projections tier): for ANY arrival order
    whose disorder is bounded by the lag (each event arrives while
    hwm <= us + lag), the released sequence is complete after a
    watermark drain (no loss, no duplication) and NON-DECREASING in
    event time — the fold sees event-time order. Equal timestamps
    carry no cross-batch order promise (ties are broken by payload
    only WITHIN one release; across releases arrival decides, as in
    any log without a per-tie sequence number)."""
    # build an arrival order with disorder bounded by lag: start from
    # time order, then swap adjacent events whose gap is < lag
    # (times in whole seconds -> microseconds, so the drain watermark
    # survives the rule's ms->us conversion)
    US = 1_000_000
    events = sorted([(us * US, i) for i, us in enumerate(seq)])
    arrivals = list(events)
    for k in range(len(arrivals) - 1):
        if data.draw(_st.booleans(), label=f"swap{k}"):
            a, b = arrivals[k], arrivals[k + 1]
            if abs(a[0] - b[0]) < lag * US:
                arrivals[k], arrivals[k + 1] = b, a
    out = _replay_release(arrivals, batches, lag * US,
                          final_wm_us=(max(seq) + 1) * US)
    assert sorted(out) == events            # complete, no dup, no loss
    ts = [us for us, _ in out]
    assert ts == sorted(ts)                 # event-time order
