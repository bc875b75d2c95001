"""Table sinks: parquet round-trip with layout options, streaming file
sink with exactly-once checkpoint semantics. (JDBC is plumbing over
DataFrameWriter.jdbc — no database in this environment.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstorm_spark import sinks
from eventstorm_spark.log.store import EventLog
from eventstorm_spark.streaming.subscriptions import subscribe_all
from tests.fixtures import new_events


def test_to_parquet_roundtrip_with_layout(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket"))
    out = str(tmp_path / "t1")
    sinks.to_parquet(df, out, partition_by=["bucket"],
                     sort_within_partitions=["id"])
    back = spark.read.parquet(out)
    assert back.count() == 100
    # directory-level pruning works: one bucket reads a quarter
    assert back.where(F.col("bucket") == 2).count() == 25


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    log = EventLog(spark, str(tmp_path / "slog"))
    log.append("user-1", new_events(10))
    sdf = subscribe_all(spark, log.path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = sinks.stream_to_parquet(sdf, out, checkpoint_dir=ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 10
    # re-running against the same checkpoint must not duplicate rows
    q2 = sinks.stream_to_parquet(subscribe_all(spark, log.path), out,
                                 checkpoint_dir=ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 10
    # new events flow through on the next trigger
    log.append("user-2", new_events(5, prefix="x"))
    q3 = sinks.stream_to_parquet(subscribe_all(spark, log.path), out,
                                 checkpoint_dir=ckpt, trigger_once=True)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == 15
