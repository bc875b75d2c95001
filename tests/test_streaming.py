"""Subscription + continuous-projection goldens.

Ports /root/reference/internal/streams/streams_test.go:482-564 (per-stream
isolation; $all catch-up + live) onto Structured Streaming with
deterministic replay (processAllAvailable between append phases).
"""

from __future__ import annotations

import json

import pytest

from eventstorm_spark.log.store import EventLog
from eventstorm_spark.model import FilterKind, NewEvent, SubscriptionFilter
from eventstorm_spark.projections.dsl import projection
from eventstorm_spark.projections.batch import run_batch
from eventstorm_spark.projections.streaming import run_streaming
from eventstorm_spark.streaming.subscriptions import Subscription, subscribe_all, subscribe_stream


def _events(n, start=0, et="event-type"):
    return [NewEvent(f"u-{start + i}", et, json.dumps({"i": start + i})) for i in range(n)]


@pytest.fixture()
def log(spark, tmp_path):
    return EventLog(spark, str(tmp_path / "log"))


# streams_test.go:482-527 — per-stream subscription: 10 to test-stream,
# 90 to test-stream-1 (must NOT be delivered), 90 more to test-stream;
# subscriber sees exactly 100 in-order events.
def test_stream_subscription_isolation(spark, log):
    log.append("test-stream", _events(10))
    sub_df = subscribe_stream(spark, log.path, "test-stream")
    sub = Subscription(sub_df)
    try:
        sub.process_available()
        assert sub.revisions == list(range(10))  # catch-up phase

        log.append("test-stream-1", _events(90, start=100))  # noise stream
        sub.process_available()
        assert len(sub.delivered.events) == 10  # isolation

        log.append("test-stream", _events(90, start=10))  # live phase
        sub.process_available()
        assert sub.revisions == list(range(100))
        assert all(r["stream"] == "test-stream" for r in sub.delivered.events)
    finally:
        sub.stop()


# streams_test.go:529-564 — $all subscription: 10 streams x 10 events,
# all 100 delivered in position order; checkpoint every 32.
def test_all_subscription_catchup_live(spark, log):
    for i in range(5):
        log.append(f"s-{i}", _events(10))
    sub = Subscription(subscribe_all(spark, log.path))
    try:
        sub.process_available()
        assert sub.positions == list(range(1, 51))  # catch-up

        for i in range(5, 10):
            log.append(f"s-{i}", _events(10))
        sub.process_available()
        assert sub.positions == list(range(1, 101))  # + live
        # pre-send cadence (grpc_server.go:98-115): markers precede
        # deliveries 1, 33, 65, 97 and quote those events' positions
        assert sub.delivered.checkpoints == [1, 33, 65, 97]
    finally:
        sub.stop()


# T5 — server-side filter applies to catch-up AND live phases
def test_filtered_subscription(spark, log):
    log.append("alpha-1", _events(5))
    log.append("beta-1", _events(5, start=10))
    flt = SubscriptionFilter(FilterKind.STREAM_ID, prefixes=["alpha-"])
    sub = Subscription(subscribe_all(spark, log.path, filter=flt))
    try:
        sub.process_available()
        assert len(sub.delivered.events) == 5

        log.append("alpha-2", _events(3, start=20))
        log.append("beta-2", _events(3, start=30))
        sub.process_available()
        streams = {r["stream"] for r in sub.delivered.events}
        assert streams == {"alpha-1", "alpha-2"}
        assert len(sub.delivered.events) == 8
    finally:
        sub.stop()


# T3 — resume from a position: only events >= position delivered
def test_subscription_from_position(spark, log):
    for i in range(4):
        log.append(f"s-{i}", _events(5))
    sub = Subscription(subscribe_all(spark, log.path, from_position=11))
    try:
        sub.process_available()
        assert sub.positions == list(range(11, 21))
    finally:
        sub.stop()


# Continuous projection: streaming fold state == batch replay state
def test_streaming_projection_matches_batch(spark, log):
    for i in range(3):
        log.append(f"user-{i}", _events(10, start=i * 100))

    def count_any(state, e):
        state["n"] += 1

    def make_spec():
        return (
            projection("live-counts").from_all().foreach_stream()
            .when({"$init": lambda: {"n": 0}, "$any": count_any})
        )

    stream_df = spark.readStream.schema(log.df().schema).parquet(log.path)
    out = run_streaming(make_spec(), stream_df)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("live_counts").trigger(processingTime="200 milliseconds").start()
    )
    try:
        q.processAllAvailable()
        live1 = {r["partition"]: r["state"] for r in spark.sql(
            "SELECT * FROM live_counts").collect()}
        assert live1 == {f"user-{i}": '{"n": 10}' for i in range(3)}

        # live phase: more events fold on top of stored state
        log.append("user-0", _events(5, start=900))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM live_counts").collect()
        latest = {}
        for r in rows:  # memory sink in update mode appends; last write wins
            latest[r["partition"]] = r["state"]
        assert latest["user-0"] == '{"n": 15}'
    finally:
        q.stop()

    batch = {r["partition"]: r["state"]
             for r in run_batch(make_spec(), log.df()).collect()}
    assert batch == {"user-0": '{"n": 15}', "user-1": '{"n": 10}', "user-2": '{"n": 10}'}


def test_streaming_exact_dedup_suppresses_replayed_events(spark, log):
    """§2.8 streaming dedup: duplicate uuids arriving in later
    micro-batches are suppressed while state stays watermark-bounded."""
    from pyspark.sql import functions as F

    from eventstorm_spark.extensions.dedup import streaming_exact_dedup
    from eventstorm_spark.model import EVENT_SCHEMA

    log.append("s", _events(10))
    src = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(log.path)
        .withColumn("created_ts", F.timestamp_micros(F.expr("created div 10")))
    )
    deduped = streaming_exact_dedup(
        src, key_cols=["stream", "uuid"], event_time_col="created_ts")

    seen = []

    def on_batch(bdf, _epoch):
        seen.extend(bdf.select("uuid").collect())

    q = deduped.writeStream.outputMode("append").foreachBatch(on_batch).start()
    try:
        q.processAllAvailable()
        assert len(seen) == 10
        # replay the same uuids into the log (duplicate delivery), plus 5 new
        log.append("s", _events(10), check_duplicates=False)
        log.append("s", _events(5, start=10))
        q.processAllAvailable()
        uuids = sorted(r["uuid"] for r in seen)
        assert len(seen) == 15, f"duplicates not suppressed: {len(seen)}"
        assert uuids == sorted(f"u-{i}" for i in range(15))
    finally:
        q.stop()


def test_continuous_projection_emission_cap(spark, log):
    """SCALE.md §5 guard: the per-batch driver collect that routes
    state updates through the single-writer append is capped — a batch
    updating more partitions than max_updates_per_batch fails loudly
    (ProjectionEmitOverflowError surfaced via the streaming query)
    instead of silently flooding driver memory, and the same cap left
    at its default passes untouched."""
    import pyspark.errors

    from eventstorm_spark.projections.streaming import start_continuous

    spec = (
        projection("cap-count").from_all().foreach_stream()
        .when({"$init": lambda: {"n": 0},
               "$any": lambda s, e: s.__setitem__("n", s["n"] + 1)})
        .output_state()
    )
    # 5 distinct streams -> 5 state updates in the first micro-batch
    for i in range(5):
        log.append(f"cap-{i}", _events(1, start=100 + i))
    q = start_continuous(spec, log, max_updates_per_batch=3)
    try:
        with pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException,
                           match="ProjectionEmitOverflowError|state updates"):
            q.processAllAvailable()
    finally:
        q.stop()
    # nothing partially applied: the guard fired before any append
    with pytest.raises(Exception):
        log.read_stream(spec.result_stream()).collect()


def test_continuous_projection_emits_result_stream(spark, log):
    """S8 live: state updates append to $projections-{name}-result as
    subscribable events through the normal single-writer path."""
    from eventstorm_spark.projections.streaming import start_continuous

    spec = (
        projection("live-count").from_all().foreach_stream()
        .when({"$init": lambda: {"n": 0},
               "$any": lambda s, e: s.__setitem__("n", s["n"] + 1)})
        .output_state()
    )
    log.append("a", _events(3))
    q = start_continuous(spec, log)
    try:
        q.processAllAvailable()
        res = log.read_stream(spec.result_stream()).collect()
        assert len(res) >= 1
        states = {json.loads(r["data"])["n"] for r in res}
        assert 3 in states  # stream a reached n=3
        assert all(r["event_type"] == "$projection-state" for r in res)

        log.append("b", _events(2, start=10))
        log.append("a", _events(1, start=20))
        q.processAllAvailable()
        res = log.read_stream(spec.result_stream()).collect()
        latest = {}
        for r in res:  # revision order => last per partition wins
            latest[r["metadata"]["partition"]] = json.loads(r["data"])["n"]
        assert latest["a"] == 4 and latest["b"] == 2
    finally:
        q.stop()


def test_subscription_resumes_from_checkpoint(spark, log, tmp_path):
    """T3 durable resume: a restarted subscription on the same checkpoint
    dir continues after the last delivered offset — no redelivery."""
    ckpt = str(tmp_path / "ckpt")
    log.append("s", _events(10))
    sub = Subscription(subscribe_all(spark, log.path), checkpoint_dir=ckpt)
    try:
        sub.process_available()
        assert len(sub.delivered.events) == 10
    finally:
        sub.stop()

    log.append("s", _events(5, start=10))
    sub2 = Subscription(subscribe_all(spark, log.path), checkpoint_dir=ckpt)
    try:
        sub2.process_available()
        # only the post-restart appends are delivered
        assert sub2.revisions == list(range(10, 15))
    finally:
        sub2.stop()


# T8 — event-time tumbling-window aggregation with a watermark: the
# streaming plan (readStream -> withWatermark -> window groupBy) must
# produce exactly the batch result over the same data. Watermark state
# is bounded by the horizon, not the corpus (SCALE.md §5).
def test_streaming_windowed_agg_matches_batch(spark):
    import pyspark.sql.functions as F
    from tests.conftest import SF_DIR
    from eventstorm_spark.inventory import load

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    sdf = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(SF_DIR))
    # ts is TIMESTAMP_NTZ (tz-less parquet); watermarks require TIMESTAMP.
    # to_utc_timestamp(ts,'UTC') is an instant-identity — the NTZ wall
    # clock is assigned its instant by the implicit session-timezone
    # cast, which the test session pins to UTC (get_spark); both the
    # stream and batch sides apply the same conversion, so the
    # comparison is self-consistent either way.
    sdf = sdf.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    agg = (sdf.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 day"), "event_type")
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("memory").queryName("win_agg")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window.start, r.event_type): r.n
           for r in spark.sql("SELECT * FROM win_agg").collect()}

    ev = load(spark, SF_DIR, "events").withColumn(
        "ts", F.to_utc_timestamp("ts", "UTC"))
    want = {(r.window.start, r.event_type): r.n
            for r in ev.groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and len(got) > 0


def test_sink_subscription_full_catchup_order_and_checkpoints(spark, log, tmp_path):
    """Sink-mode delivery (no driver buffer): the results table replayed
    ORDER BY delivery_seq is byte-identical to the in-memory pump's
    order, with checkpoint flags exactly every 32 events (T4)."""
    from eventstorm_spark.streaming.subscriptions import SinkSubscription

    for i in range(4):
        log.append(f"sink-{i}", _events(20, start=20 * i))
    sink = str(tmp_path / "delivery")
    sub = SinkSubscription(subscribe_all(spark, log.path), sink,
                           checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        sub.process_available()

        # live phase continues the sequence
        log.append("sink-0", _events(20, start=100))
        sub.process_available()

        rows = sub.result().orderBy("delivery_seq").collect()
        assert [r["delivery_seq"] for r in rows] == list(range(1, 101))
        # byte-identical to the position-ordered log (the pump's order)
        expected = log.read_all().orderBy("position").collect()
        assert [(r["stream"], r["uuid"], r["data"], r["revision"], r["position"])
                for r in rows] == \
               [(r["stream"], r["uuid"], r["data"], r["revision"], r["position"])
                for r in expected]
        # pre-send checkpoint cadence: markers on deliveries 1, 33, 65, 97
        assert [r["delivery_seq"] for r in rows if r["checkpoint"]] == [1, 33, 65, 97]
    finally:
        sub.stop()


def test_sink_subscription_resumes_sequence(spark, log, tmp_path):
    """A restarted sink subscription (same Spark checkpoint) continues
    delivery_seq from the sink without redelivering."""
    from eventstorm_spark.streaming.subscriptions import SinkSubscription

    log.append("r-1", _events(10))
    sink = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    sub = SinkSubscription(subscribe_all(spark, log.path), sink, checkpoint_dir=ckpt)
    try:
        sub.process_available()
    finally:
        sub.stop()

    log.append("r-1", _events(5, start=10))
    sub2 = SinkSubscription(subscribe_all(spark, log.path), sink, checkpoint_dir=ckpt)
    try:
        sub2.process_available()
        rows = sub2.result().orderBy("delivery_seq").collect()
        assert [r["delivery_seq"] for r in rows] == list(range(1, 16))
        assert [r["revision"] for r in rows] == list(range(15))
    finally:
        sub2.stop()


def test_sink_reuse_fresh_lineage_no_epoch_collision(spark, log, tmp_path):
    """A NEW subscription (fresh/no checkpoint lineage) over an
    existing sink restarts Spark's epoch ids at 0; its epoch dirs must
    be offset past the previous run's, or the replay path would misread
    the old epoch=0 as a crash replay and overwrite/duplicate history
    (regression). The resume fence keeps delivery exactly-once and the
    sequence continues."""
    from eventstorm_spark.streaming.subscriptions import SinkSubscription

    log.append("f-1", _events(10))
    sink = str(tmp_path / "delivery")
    sub = SinkSubscription(subscribe_all(spark, log.path), sink)
    try:
        sub.process_available()
    finally:
        sub.stop()

    log.append("f-1", _events(5, start=10))
    sub2 = SinkSubscription(subscribe_all(spark, log.path), sink)
    try:
        sub2.process_available()
        rows = sub2.result().orderBy("delivery_seq").collect()
        assert [r["delivery_seq"] for r in rows] == list(range(1, 16))
        assert [r["revision"] for r in rows] == list(range(15))
        assert len({r["position"] for r in rows}) == 15  # no duplicates
    finally:
        sub2.stop()


def test_sink_subscription_replayed_epoch_is_idempotent(spark, log, tmp_path):
    """foreachBatch is at-least-once: a crash after the sink write but
    before the streaming checkpoint commit replays the epoch on restart.
    The replay must overwrite its own epoch partition with byte-identical
    rows — never append the same events again under fresh delivery_seq
    values. Simulated by deleting the last checkpoint commit file, which
    makes Spark genuinely re-run that epoch."""
    import os

    from eventstorm_spark.streaming.subscriptions import SinkSubscription

    log.append("i-1", _events(10))
    sink = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    sub = SinkSubscription(subscribe_all(spark, log.path), sink, checkpoint_dir=ckpt)
    try:
        sub.process_available()
    finally:
        sub.stop()

    # "crash" between data write and checkpoint commit: drop the last
    # commit marker so the restarted query replays that epoch
    commits = os.path.join(ckpt, "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")  # checksum-fs sidecar
    if os.path.exists(crc):
        os.unlink(crc)

    sub2 = SinkSubscription(subscribe_all(spark, log.path), sink, checkpoint_dir=ckpt)
    try:
        sub2.process_available()
        log.append("i-1", _events(5, start=10))  # live continues after replay
        sub2.process_available()
        rows = sub2.result().orderBy("delivery_seq").collect()
        assert [r["delivery_seq"] for r in rows] == list(range(1, 16))
        assert [r["revision"] for r in rows] == list(range(15))
        # no event delivered twice under different sequence numbers
        assert len({r["uuid"] for r in rows}) == 15
    finally:
        sub2.stop()


def _env_rows(positions, t0, tick_step=10_000_000, created_at=None):
    """Envelope tuples with created ticks derived from position (or
    pinned via created_at)."""
    rows = []
    for p in positions:
        created = created_at if created_at is not None else t0 + p * tick_step
        rows.append((
            "s-1", f"u-{p}", json.dumps({"p": p}), {"type": "evt"},
            None, p - 1, p, "evt", "application/json", created,
        ))
    return rows


def test_processing_lag_reorders_across_batches(spark, tmp_path):
    """T7 enforced: with reorderEvents+processingLag, disorder spanning
    two micro-batches folds in position order — identical to the batch
    replay — once the created-time high-watermark passes the lag."""
    from eventstorm_spark.model import EVENT_SCHEMA
    from eventstorm_spark.projections.dsl import projection
    from eventstorm_spark.projections.batch import run_batch
    from eventstorm_spark.projections.streaming import run_streaming

    path = str(tmp_path / "log")
    t0 = 17_000_000_000_000_000  # arbitrary tick base

    def see(state, e):
        state["seen"].append(e.body["p"])

    def make_spec():
        return (
            projection("lagged").from_all()
            .options({"reorderEvents": True, "processingLag": 60_000})
            .when({"$init": lambda: {"seen": []}, "$any": see})
        )

    # batch 1 delivers positions 4,5 BEFORE 1,2,3 ever land
    spark.createDataFrame(_env_rows([4, 5], t0), EVENT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    q = (run_streaming(make_spec(), sdf)
         .writeStream.outputMode("update").format("memory")
         .queryName("lagged").trigger(processingTime="200 milliseconds").start())
    try:
        q.processAllAvailable()
        # late batch with the EARLIER positions
        spark.createDataFrame(_env_rows([1, 2, 3], t0), EVENT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        # everything is inside the lag window: nothing folded yet
        assert spark.sql("SELECT * FROM lagged").count() == 0

        # a closer event far past the lag releases 1..5 (stays buffered
        # itself)
        spark.createDataFrame(
            _env_rows([6], t0, created_at=t0 + 864_000_000_000),
            EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM lagged").collect()
        latest = {}
        for r in rows:
            latest[r["partition"]] = r["state"]
        assert latest[""] == '{"seen": [1, 2, 3, 4, 5]}'
    finally:
        q.stop()

    # ≡ batch replay of the released prefix
    released = spark.createDataFrame(
        _env_rows([1, 2, 3, 4, 5], t0), EVENT_SCHEMA)
    spec = (projection("lagged-batch").from_all()
            .when({"$init": lambda: {"seen": []}, "$any": see}))
    batch = {r["partition"]: r["state"]
             for r in run_batch(spec, released).collect()}
    assert batch[""] == '{"seen": [1, 2, 3, 4, 5]}'


def test_processing_lag_tail_releases_on_watermark_advance(spark, tmp_path):
    """The buffered tail releases when newer events advance the
    watermark past it (the windowed-aggregation contract) — folding in
    position order even when the releasing batch itself is in-order."""
    from eventstorm_spark.model import EVENT_SCHEMA
    from eventstorm_spark.projections.dsl import projection
    from eventstorm_spark.projections.streaming import run_streaming

    path = str(tmp_path / "log")
    t0 = 17_000_000_000_000_000

    def see(state, e):
        state["seen"].append(e.body["p"])

    spec = (projection("lagged-wm").from_all()
            .options({"reorderEvents": True, "processingLag": 2_000})
            .when({"$init": lambda: {"seen": []}, "$any": see}))

    # 2,1 disordered; created 10ms apart -> inside the 2s lag together
    spark.createDataFrame(
        _env_rows([2, 1], t0, tick_step=100_000), EVENT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)
    sdf = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    q = (run_streaming(spec, sdf)
         .writeStream.outputMode("update").format("memory")
         .queryName("lagged_wm").trigger(processingTime="200 milliseconds").start())
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM lagged_wm").count() == 0  # in-window

        # position 3 created 10s later advances the watermark past 1,2
        spark.createDataFrame(
            _env_rows([3], t0, created_at=t0 + 100_000_000), EVENT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM lagged_wm").collect()
        assert rows and rows[-1]["state"] == '{"seen": [1, 2]}'
    finally:
        q.stop()


def test_streaming_near_dup_pairs_detects_and_evicts(spark, tmp_path):
    """Online MinHash-LSH dedup: a later near-duplicate pairs with docs
    seen within the retention window; arrivals past the window evict
    old state and pair with nothing."""
    from eventstorm_spark.extensions.dedup import streaming_near_dup_pairs

    path = str(tmp_path / "docs")
    schema = "doc_id long, ts double, text string"
    base = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(49)) + " zz"   # j ~= 0.88
    other = " ".join(f"x{i}" for i in range(50))

    spark.createDataFrame(
        [(1, 100.0, base), (2, 101.0, near), (3, 102.0, other)], schema
    ).coalesce(1).write.mode("append").parquet(path)

    sdf = spark.readStream.schema(schema).parquet(path)
    pairs = streaming_near_dup_pairs(sdf, threshold=0.8, retention_secs=600.0)
    q = (pairs.writeStream.outputMode("update").format("memory")
         .queryName("near_pairs").trigger(processingTime="200 milliseconds")
         .start())
    try:
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM near_pairs").collect()}
        assert got == {(1, 2)}

        # a second batch: doc 4 near-dups 1 and 2, inside retention
        spark.createDataFrame(
            [(4, 150.0, base + " tail")], schema
        ).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM near_pairs").collect()}
        assert (1, 4) in got and (2, 4) in got

        # far-future arrival: eviction means no pair despite similarity
        spark.createDataFrame(
            [(5, 10_000.0, base)], schema
        ).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM near_pairs").collect()}
        assert not any(5 in p for p in got), got
    finally:
        q.stop()


def test_sink_subscription_survives_compaction(spark, log, tmp_path):
    """Compaction rewrites the log into NEW files; a file-source
    checkpoint tracks files by path, so a restarted subscription
    re-lists the whole compacted history as unseen. The position-based
    resume fence must drop those replays: only events appended after
    the last delivered position are delivered, exactly once."""
    from eventstorm_spark.streaming.subscriptions import SinkSubscription

    log.append("c-1", _events(10))
    sink = str(tmp_path / "delivery")
    ckpt = str(tmp_path / "ckpt")
    sub = SinkSubscription(subscribe_all(spark, log.path), sink, checkpoint_dir=ckpt)
    try:
        sub.process_available()
    finally:
        sub.stop()

    log.compact(num_files=2)          # rewrites every file
    log.append("c-1", _events(5, start=10))

    sub2 = SinkSubscription(subscribe_all(spark, log.path), sink, checkpoint_dir=ckpt)
    try:
        sub2.process_available()
        rows = sub2.result().orderBy("delivery_seq").collect()
        assert [r["delivery_seq"] for r in rows] == list(range(1, 16))
        assert [r["revision"] for r in rows] == list(range(15))
        assert len({r["uuid"] for r in rows}) == 15  # no redelivery
    finally:
        sub2.stop()


def test_streaming_near_dup_state_survives_restart(spark, tmp_path):
    """Crash/restart recovery: the per-bucket signature state lives in
    the state store, so a restarted query (same checkpoint) pairs new
    arrivals against documents ingested before the restart — no missed
    pairs, no re-emitted ones. Also pins string document ids: the output
    id columns adopt the input id type (regression for the hardcoded
    'long' schema)."""
    from eventstorm_spark.extensions.dedup import streaming_near_dup_pairs

    path = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "pairs")
    schema = "doc_id string, ts double, text string"
    base = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(49)) + " zz"

    spark.createDataFrame([("doc-a", 100.0, base)], schema) \
        .coalesce(1).write.mode("append").parquet(path)

    def start():
        sdf = spark.readStream.schema(schema).parquet(path)
        pairs = streaming_near_dup_pairs(sdf, threshold=0.8,
                                         retention_secs=600.0)
        return (pairs.writeStream.outputMode("update")
                .foreachBatch(lambda b, e: b.coalesce(1).write.mode("append").parquet(sink))
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="200 milliseconds").start())

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart; the near-duplicate arrives only after the restart
    spark.createDataFrame([("doc-b", 101.0, near)], schema) \
        .coalesce(1).write.mode("append").parquet(path)
    q2 = start()
    try:
        q2.processAllAvailable()
        rows = spark.read.parquet(sink).collect()
        got = {(r.id_a, r.id_b) for r in rows}
        assert got == {("doc-a", "doc-b")}  # state recovered across restart
        # no (band-level) duplicate emissions from the restart
        banded = [(r.id_a, r.id_b, r.band) for r in rows]
        assert len(banded) == len(set(banded))
    finally:
        q2.stop()


def test_streaming_near_dup_hot_bucket_cap(spark, tmp_path):
    """Template-spam guard: a bucket never retains more than
    max_entries_per_bucket entries, so a new arrival pairs with at most
    the cap's worth of (most recent) entries instead of every identical
    doc ever seen — state stays bounded under adversarial skew."""
    from eventstorm_spark.extensions.dedup import streaming_near_dup_pairs

    path = str(tmp_path / "docs")
    schema = "doc_id long, ts double, text string"
    text = " ".join(f"w{i}" for i in range(50))

    spark.createDataFrame(
        [(i, 100.0 + i, text) for i in range(1, 5)], schema
    ).coalesce(1).write.mode("append").parquet(path)

    sdf = spark.readStream.schema(schema).parquet(path)
    pairs = streaming_near_dup_pairs(sdf, threshold=0.8, retention_secs=600.0,
                                     max_entries_per_bucket=2)
    q = (pairs.writeStream.outputMode("update").format("memory")
         .queryName("capped_pairs").trigger(processingTime="200 milliseconds")
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame([(9, 110.0, text)], schema) \
            .coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        partners = {r.id_a for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM capped_pairs WHERE id_b = 9"
        ).collect()}
        assert partners == {3, 4}  # only the cap's most recent entries
    finally:
        q.stop()


def test_streaming_c4_quality_gate_matches_batch(spark):
    """The corpus quality operators are row-local projections, so they
    compose with Structured Streaming unchanged — the streaming-ingest
    quality gate (filter at crawl time, not in a later batch pass).
    Stream-side c4_rules must equal the batch run row-for-row."""
    import pyspark.sql.functions as F
    from tests.conftest import SF_DIR
    from eventstorm_spark.extensions.text import c4_rules

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    sdf = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(SF_DIR))
    gated = c4_rules(sdf).where(F.col("kept") == 1)
    q = (gated.writeStream.format("memory").queryName("c4_gate")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["n_words"], r["n_stopwords"])
           for r in spark.sql("SELECT * FROM c4_gate").collect()}

    batch = c4_rules(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    want = {r["doc_id"]: (r["n_words"], r["n_stopwords"])
            for r in batch.where(F.col("kept") == 1).collect()}
    assert got == want and len(got) > 0


def test_streaming_winnow_hits_detects_shared_runs(spark, tmp_path):
    """Online substring-overlap: a later doc sharing a >= 6-token run
    with an in-window doc emits at least one fingerprint hit (the
    winnowing guarantee on the stream); disjoint docs emit nothing;
    arrivals past the retention window pair with nothing. The
    row-local fingerprint expression must equal the batch
    winnow_fingerprints set exactly (randomized parity)."""
    import random

    from pyspark.sql import functions as F

    from eventstorm_spark.extensions.text import (
        winnow_fingerprint_expr, winnow_fingerprints,
    )

    # --- parity: row-local HOF expression == batch two-window-pass ---
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(6)]  # small vocab -> hash ties likely
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for i in range(40)]
    bdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in bdf.select(
            "doc_id", F.explode(winnow_fingerprint_expr("text")).alias("fp")
            ).collect():
        got.setdefault(r.doc_id, set()).add((r.fp.pos, r.fp.fingerprint))
    want = {}
    for r in winnow_fingerprints(bdf).collect():
        want.setdefault(r.doc_id, set()).add((r.pos, r.fingerprint))
    assert got == want

    # --- streaming detect / evict ---
    from eventstorm_spark.extensions.text import streaming_winnow_hits

    path = str(tmp_path / "docs")
    schema = "doc_id long, ts double, text string"
    shared = "one two three four five six seven"      # 7-token run
    spark.createDataFrame(
        [(1, 100.0, f"a1 b1 {shared} c1 d1"),
         (2, 101.0, f"x1 {shared} y1 z1 q1"),
         (3, 102.0, "totally different words with no overlap at all")],
        schema).coalesce(1).write.mode("append").parquet(path)
    sdf = spark.readStream.schema(schema).parquet(path)
    hits = streaming_winnow_hits(sdf, retention_secs=600.0)
    q = (hits.writeStream.outputMode("update").format("memory")
         .queryName("winnow_hits").trigger(processingTime="200 milliseconds")
         .start())
    try:
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM winnow_hits").collect()}
        assert got == {(1, 2)}

        # in-window copy pairs with both carriers
        spark.createDataFrame(
            [(4, 150.0, f"fresh {shared} copy here")], schema
        ).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM winnow_hits").collect()}
        assert (1, 4) in got and (2, 4) in got

        # far-future arrival: eviction -> no pair despite the shared run
        spark.createDataFrame(
            [(5, 10_000.0, f"late {shared} arrival")], schema
        ).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM winnow_hits").collect()}
        assert not any(5 in (a, b) for a, b in got), got
    finally:
        q.stop()


def test_streaming_kmv_distinct_matches_batch_sketch(spark, tmp_path):
    """Streaming KMV distinct per window: cross-batch k-min state merge
    must equal the batch-built sketch estimate over the union of all
    batches (merge losslessness), with state bounded at k longs."""
    import datetime as dt

    from pyspark.sql import functions as F

    from eventstorm_spark.extensions.sketches import (kmv_estimate,
                                                      kmv_sketch,
                                                      streaming_kmv_distinct)

    src_dir = str(tmp_path / "kmv_src")
    schema = "ts timestamp, user string"
    base = dt.datetime(2024, 5, 1, 0, 0)

    def rows(lo, hi, hour):
        return [(base + dt.timedelta(hours=hour, seconds=i), f"u{i}")
                for i in range(lo, hi)]

    spark.createDataFrame(rows(0, 120, 0) + rows(0, 30, 1), schema) \
         .coalesce(1).write.mode("append").parquet(src_dir)

    est = streaming_kmv_distinct(
        spark.readStream.schema(schema).parquet(src_dir),
        "user", k=64, window="1 hour", ts_col="ts")
    latest = {}

    def on_batch(bdf, _epoch):
        for r in bdf.collect():
            latest[r.window_start] = r.n_distinct_est

    q = (est.writeStream.outputMode("update")
         .foreachBatch(on_batch).start())
    try:
        q.processAllAvailable()
        # second batch: 80 users overlap hour 0, 50 new ones in hour 1
        spark.createDataFrame(rows(40, 160, 0) + rows(20, 80, 1), schema) \
             .coalesce(1).write.mode("append").parquet(src_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    # batch twin over the union of both batches
    all_rows = (rows(0, 120, 0) + rows(0, 30, 1)
                + rows(40, 160, 0) + rows(20, 80, 1))
    batch = spark.createDataFrame(all_rows, schema).select(
        F.window("ts", "1 hour").start.alias("w"), "user")
    want = {r.w: r.n_distinct_est for r in kmv_estimate(
        kmv_sketch(batch, "user", k=64, group_cols=["w"]), k=64).collect()}
    got = {k_.replace(tzinfo=None) if k_.tzinfo else k_: v
           for k_, v in latest.items()}
    want = {k_.replace(tzinfo=None) if k_.tzinfo else k_: v
            for k_, v in want.items()}
    assert got == want
    # hour 0 has 160 distinct (> k=64): estimator branch live
    h0 = base
    assert got[h0] != 160.0 and abs(got[h0] - 160) / 160 < 0.5


def test_streaming_heavy_hitters_superset_and_bounds(spark, tmp_path):
    """MG streaming candidates: every value with true share >= theta
    survives across batches, mg_count is a lower bound within
    n/(cap+1), and state stays at <= ~cap counters."""
    import datetime as dt

    from eventstorm_spark.extensions.sketches import streaming_heavy_hitters

    src = str(tmp_path / "hh_src")
    schema = "ts timestamp, v string"
    base = dt.datetime(2024, 7, 1, 0, 0)

    def batch(vals, sec0):
        return [(base + dt.timedelta(seconds=sec0 + i), v)
                for i, v in enumerate(vals)]

    # batch 1: hot x 60 + 150 singletons; batch 2: hot x 40 + 150 more
    spark.createDataFrame(
        batch(["hot"] * 60 + [f"t{i}" for i in range(150)], 0),
        schema).coalesce(1).write.mode("append").parquet(src)

    latest = {}

    def on_batch(bdf, _e):
        rows = bdf.collect()
        if rows:
            w = rows[0].window_start
            latest[w] = {r.value: (r.mg_count, r.n_window) for r in rows}

    q = (streaming_heavy_hitters(
            spark.readStream.schema(schema).parquet(src),
            "v", threshold=0.1, window="1 hour", ts_col="ts")
         .writeStream.outputMode("update")
         .foreachBatch(on_batch).start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            batch(["hot"] * 40 + [f"u{i}" for i in range(150)], 600),
            schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    (w, summary), = latest.items()
    cap = 20  # ceil(2 / 0.1)
    true_hot, n = 100, 400
    assert "hot" in summary            # share 0.25 >= 0.1: guaranteed
    mg, n_win = summary["hot"]
    assert n_win == n
    assert mg <= true_hot
    assert mg >= true_hot - n // (cap + 1)
    assert len(summary) <= cap + 5     # ties may slightly exceed cap

    # fold equality vs the BATCH operator: exact-recounting the
    # streaming candidate set over the full data and thresholding
    # yields exactly heavy_hitters() on the same rows (streaming MG
    # = batch pass 1; the recount is batch pass 2 — so the two-pass
    # contract holds across the streaming/batch split)
    import math

    from pyspark.sql import functions as F

    from eventstorm_spark.extensions.sketches import heavy_hitters

    full = spark.read.parquet(src).select("v")
    batch_hh = {(r.value, r.n)
                for r in heavy_hitters(full, "v", threshold=0.1).collect()}
    recount = (full.where(F.col("v").isin(list(summary)))
               .groupBy(F.col("v").alias("value"))
               .agg(F.count(F.lit(1)).alias("n"))
               .where(F.col("n") >= math.ceil(0.1 * n)))
    stream_hh = {(r.value, r.n) for r in recount.collect()}
    assert stream_hh == batch_hh


def test_streaming_hdr_quantiles_fold_equals_batch(spark, tmp_path):
    """Streaming HDR: the per-window estimates after all batches equal
    the BATCH hdr_histogram -> hdr_quantiles pipeline on the same rows
    (bucket ids are engine-exact on both sides, so this is equality,
    not approximation), including exact powers of two (the libm-wobble
    case frexp/the one-step correction exist for), sub-1 values
    (negative exponents) and the non-positive underflow bin."""
    import datetime as dt

    from eventstorm_spark.extensions.sketches import (
        hdr_histogram, hdr_quantiles, streaming_hdr_quantiles)

    src = str(tmp_path / "hdrq_src")
    schema = "ts timestamp, v double"
    base = dt.datetime(2024, 7, 1, 0, 0)

    def batch(vals, sec0):
        return [(base + dt.timedelta(seconds=sec0 + i), float(v))
                for i, v in enumerate(vals)]

    b1 = [1.0, 2.0, 4.0, 8.0, 0.25, 3.7, 100.0, 64.0, -1.0]
    b2 = [5.0, 0.5, 1024.0, 7.77, 2.0, 0.0, 9.9] + [50.0] * 20
    spark.createDataFrame(batch(b1, 0), schema) \
        .coalesce(1).write.mode("append").parquet(src)

    latest = {}

    def on_batch(bdf, _e):
        for r in bdf.collect():
            latest[(r.window_start, r.q)] = r.value_est

    q = (streaming_hdr_quantiles(
            spark.readStream.schema(schema).parquet(src), "v",
            quantiles=(0.5, 0.95, 0.99), window="1 hour", ts_col="ts")
         .writeStream.outputMode("update")
         .foreachBatch(on_batch).start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch(b2, 600), schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    all_rows = spark.createDataFrame(batch(b1, 0) + batch(b2, 600), schema)
    want = {(r.q, r.value_est)
            for r in hdr_quantiles(hdr_histogram(all_rows, "v"),
                                   [0.5, 0.95, 0.99]).collect()}
    got = {(qq, v) for (_w, qq), v in latest.items()}
    assert got == want
    assert len(got) == 3


def test_streaming_funnel_matches_batch_conditional_min(spark, tmp_path):
    """Streaming funnel: under in-order arrival across micro-batches,
    the emitted (key, stage timestamps) equal the batch conditional-min
    funnel on the same rows; a key emits exactly once (the batch its
    last stage completes in) and incomplete keys never emit."""
    import datetime as dt

    from pyspark.sql import functions as F

    from eventstorm_spark.extensions.temporal import streaming_funnel

    src = str(tmp_path / "funnel_src")
    schema = "user_id long, event_type string, ts timestamp"
    base = dt.datetime(2024, 7, 1, 0, 0)

    def ev(u, et, sec):
        return (u, et, base + dt.timedelta(seconds=sec))

    # u1 completes within batch 1; u2 completes across batches; u3
    # never clicks; u4's purchase PRECEDES its click (must not count);
    # u5 re-views (later view must not move the latched t_view)
    batch1 = [ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
              ev(2, "view", 5), ev(2, "click", 15),
              ev(3, "view", 7),
              ev(4, "view", 1), ev(4, "purchase", 2), ev(4, "click", 3),
              ev(5, "view", 30), ev(5, "view", 40)]
    batch2 = [ev(2, "purchase", 100), ev(3, "error", 110),
              ev(5, "click", 120), ev(5, "purchase", 130),
              ev(1, "purchase", 140)]  # second purchase: no re-emit
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)

    emitted = []

    def on_batch(bdf, _e):
        emitted.extend((r.user_id, r.view_us, r.click_us, r.purchase_us)
                       for r in bdf.collect())

    q = (streaming_funnel(
            spark.readStream.schema(schema).parquet(src),
            ("view", "click", "purchase"), key_col="user_id",
            ts_col="ts", watermark_delay="1 hour")
         .writeStream.outputMode("append")
         .foreachBatch(on_batch).start())
    try:
        q.processAllAvailable()
        n_after_b1 = len(emitted)
        spark.createDataFrame(batch2, schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert n_after_b1 == 1  # only u1 completed in batch 1

    # batch conditional-min reference on the full data
    ev_df = spark.createDataFrame(batch1 + batch2, schema)
    tv = (ev_df.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t0")))
    tc = (ev_df.where(F.col("event_type") == "click")
          .join(tv, "user_id").where(F.col("ts") > F.col("t0"))
          .groupBy("user_id", "t0").agg(F.min("ts").alias("t1")))
    tp = (ev_df.where(F.col("event_type") == "purchase")
          .join(tc, "user_id").where(F.col("ts") > F.col("t1"))
          .groupBy("user_id", "t0", "t1").agg(F.min("ts").alias("t2")))
    want = {(r.user_id,
             int(r.t0.timestamp() * 1_000_000),
             int(r.t1.timestamp() * 1_000_000),
             int(r.t2.timestamp() * 1_000_000)) for r in tp.collect()}
    assert set(emitted) == want
    assert {u for u, *_ in emitted} == {1, 2, 5}
    assert len(emitted) == 3  # u1 emitted once despite a 2nd purchase


def test_streaming_heavy_hitters_exact_below_capacity(spark, tmp_path):
    """The windowed_heavy_hitters driver-oracle contract: with
    capacity >= the window's distinct-value count the MG decrement
    never fires, so mg_count is the EXACT count and the result is
    independent of micro-batch splits — pinned here across three
    batches with interleaved values."""
    import datetime as dt

    from eventstorm_spark.extensions.sketches import streaming_heavy_hitters

    src = str(tmp_path / "hh_exact_src")
    schema = "ts timestamp, v string"
    base = dt.datetime(2024, 7, 1, 0, 0)

    def batch(vals, sec0):
        return [(base + dt.timedelta(seconds=sec0 + i), v)
                for i, v in enumerate(vals)]

    batches = [["a"] * 5 + ["b"] * 3 + ["c"],
               ["b"] * 4 + ["a"] * 2 + ["d"] * 6,
               ["c"] * 7 + ["d"] + ["a"]]
    latest = {}

    def on_batch(bdf, _e):
        rows = bdf.collect()
        if rows:
            latest.update({r.value: (r.mg_count, r.n_window)
                           for r in rows})

    spark.createDataFrame(batch(batches[0], 0), schema) \
        .coalesce(1).write.mode("append").parquet(src)
    q = (streaming_heavy_hitters(
            spark.readStream.schema(schema).parquet(src), "v",
            threshold=0.01, window="1 hour", ts_col="ts",
            watermark_delay="1 day")   # capacity = 200 >> 4 distinct
         .writeStream.outputMode("update")
         .foreachBatch(on_batch).start())
    try:
        q.processAllAvailable()
        for i, b in enumerate(batches[1:], start=1):
            spark.createDataFrame(batch(b, i * 100), schema) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    flat = [v for b in batches for v in b]
    exact = {v: flat.count(v) for v in set(flat)}
    n = len(flat)
    assert {v: c for v, (c, _) in latest.items()} == exact
    assert all(nw == n for _, nw in latest.values())


def test_sink_epoch_offset_survives_restart(spark, log, tmp_path):
    """The epoch-id offset a lineage chose at START (over a non-empty
    sink) is persisted next to the Spark offsets and reloaded on
    resume. Regression: a resumed lineage recomputing it as 0 would
    write epoch dirs colliding with the OLDER lineage's — the replay
    path then misreads a foreign epoch dir as a crash replay and
    overwrites its history (events lost, delivery_seq corrupted)."""
    from eventstorm_spark.streaming.subscriptions import (SinkSubscription,
                                                          subscribe_all)

    sink = str(tmp_path / "delivery")
    # lineage 1: no checkpoint, writes epoch=0..
    log.append("eo-1", _events(10))
    sub = SinkSubscription(subscribe_all(spark, log.path), sink)
    try:
        sub.process_available()
    finally:
        sub.stop()

    # lineage 2: fresh checkpointed lineage over the NON-EMPTY sink —
    # picks a non-zero epoch offset and must persist it
    ckpt = str(tmp_path / "ckpt2")
    log.append("eo-1", _events(5, start=10))
    sub2 = SinkSubscription(subscribe_all(spark, log.path), sink,
                            checkpoint_dir=ckpt)
    try:
        sub2.process_available()
        off2 = sub2._epoch_offset
        assert off2 > 0
    finally:
        sub2.stop()

    # lineage 2 RESUMES (same checkpoint dir, offsets now non-empty):
    # the reloaded offset must equal the one chosen at start
    log.append("eo-1", _events(5, start=15))
    sub3 = SinkSubscription(subscribe_all(spark, log.path), sink,
                            checkpoint_dir=ckpt)
    try:
        assert sub3._epoch_offset == off2
        sub3.process_available()
        rows = sub3.result().orderBy("delivery_seq").collect()
        assert [r["delivery_seq"] for r in rows] == list(range(1, 21))
        assert [r["revision"] for r in rows] == list(range(20))
        assert len({r["uuid"] for r in rows}) == 20  # nothing lost/duped
    finally:
        sub3.stop()


def test_sink_subscription_order_guard_on_split_bootstrap(spark, tmp_path):
    """A bulk-written log whose files list out of position order (shared
    mtimes / adverse listing) must NOT be mis-sequenced: with
    maxFilesPerTrigger splitting catch-up, a later batch carrying lower
    positions raises instead of assigning delivery_seq out of global
    position order."""
    import os
    import shutil
    import time

    from eventstorm_spark.model import EVENT_SCHEMA
    from eventstorm_spark.streaming.subscriptions import (SinkSubscription,
                                                          subscribe_all)

    logdir = str(tmp_path / "rawlog")
    os.makedirs(logdir)

    def plant(positions, name, mtime):
        rows = [("s", f"u-{p}", json.dumps({"p": p}), {}, None,
                 int(p), int(p), "t", "application/json",
                 int(p) * 10_000_000)
                for p in positions]
        tmp = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1) \
            .write.parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(logdir, name)
        shutil.copyfile(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    # HIGH positions in the OLDER-mtime file -> listed/delivered first
    now = time.time()
    plant(range(10, 20), "b.parquet", now - 300)
    plant(range(0, 10), "a.parquet", now - 100)

    sink = str(tmp_path / "delivery")
    sub = SinkSubscription(
        subscribe_all(spark, logdir, max_files_per_trigger=1), sink)
    try:
        with pytest.raises(Exception, match="out of position order"):
            sub.process_available()
            sub._query.awaitTermination(10)
    finally:
        try:
            sub.stop()
        except Exception:
            pass


def test_streaming_state_must_be_json_native(spark, log):
    """The streaming-state serialization contract (module docstring of
    projections.streaming): state round-trips through the state store
    as JSON every micro-batch, so non-JSON-native state (a set here)
    raises a TypeError naming the projection instead of silently
    degrading to its str() rendering — the batch fold, which renders
    state exactly once at output, still accepts the same handler."""
    from eventstorm_spark.projections.streaming import run_streaming

    log.append("jn-1", _events(3))

    def track(state, e):
        state["seen"].add(e.eventType)

    def make_spec():
        return (
            projection("set-state").from_all().foreach_stream()
            .when({"$init": lambda: {"seen": set()}, "$any": track})
        )

    # batch: one terminal render via default=str — accepted
    batch = run_batch(make_spec(), log.df())
    assert batch.count() == 1

    sdf = spark.readStream.schema(log.df().schema).parquet(log.path)
    q = (run_streaming(make_spec(), sdf)
         .writeStream.outputMode("update").format("memory")
         .queryName("set_state").trigger(processingTime="200 milliseconds")
         .start())
    try:
        with pytest.raises(Exception, match="JSON-native"):
            q.processAllAvailable()
            q.awaitTermination(10)
    finally:
        try:
            q.stop()
        except Exception:
            pass


# EventStoreDB resolveLinkTos on catch-up subscriptions (the reference
# parses the flag for subscriptions too — model.go:100/extensions.go:24
# — and never implements it): delivered link rows carry the TARGET's
# payload identity under the LINK's coordinates; dangling links pass
# through raw; non-link rows are untouched; deliveries stay in link
# position order so resume/checkpoint semantics are unchanged.
def test_subscription_resolves_links(spark, log):
    log.append("src", _events(4))
    for rev in (2, 0):
        log.link_to("idx", "src", rev)
    log.link_to("idx", "src", 999)  # dangling
    log.append("idx", _events(1, start=50))  # non-link row in the stream

    sub = Subscription(subscribe_stream(spark, log.path, "idx",
                                        resolve_links=True))
    try:
        sub.process_available()
        got = [(r["uuid"], r["event_type"], r["revision"])
               for r in sub.delivered.events]
        assert got == [
            ("u-2", "event-type", 0),      # resolved: target payload,
            ("u-0", "event-type", 1),      # link coordinates
            ("$link-idx-src-999", "$>", 2),  # dangling passes through
            ("u-50", "event-type", 3),     # non-link untouched
        ], got
    finally:
        sub.stop()

    # the $all form: filter sees the LINK rows (prefix 'idx'), then
    # resolution swaps payloads under preserved positions
    flt = SubscriptionFilter(FilterKind.STREAM_ID, prefixes=["idx"])
    sub2 = Subscription(subscribe_all(spark, log.path, filter=flt,
                                      resolve_links=True))
    try:
        sub2.process_available()
        assert [r["uuid"] for r in sub2.delivered.events] == [
            "u-2", "u-0", "$link-idx-src-999", "u-50"]
        assert sub2.positions == sorted(sub2.positions)
    finally:
        sub2.stop()


# Resolution visibility on the subscription path matches the read path:
# a link into soft-deleted history delivers UNRESOLVED (the envelope is
# the logically-visible one, scavenge-invariant), while links to live
# targets still resolve.
def test_subscription_resolution_respects_deletion(spark, log):
    log.append("gone", _events(2))
    log.append("kept", _events(2, start=10))
    log.link_to("idx", "gone", 1)
    log.link_to("idx", "kept", 0)
    log.delete_stream("gone")

    sub = Subscription(subscribe_stream(spark, log.path, "idx",
                                        resolve_links=True))
    try:
        sub.process_available()
        got = [(r["uuid"], r["event_type"]) for r in sub.delivered.events]
        assert got == [
            ("$link-idx-gone-1", "$>"),   # deleted target: unresolved
            ("u-10", "event-type"),       # live target: resolved
        ], got
    finally:
        sub.stop()
