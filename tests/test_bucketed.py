"""Bucketed log materialization: contents match the live log, and the
planner exploits the bucket partitioning — per-stream aggregation and a
same-bucketing self-join run with zero shuffle exchanges."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.log.bucketed import bucketed_log, materialize_bucketed
from eventstorm_spark.log.store import EventLog
from tests.fixtures import new_events


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange (hash|range|SinglePartition)", plan))


@pytest.fixture()
def bucketed(spark, tmp_path):
    log = EventLog(spark, os.path.join(str(tmp_path), "log"))
    for s in range(6):
        log.append(f"user-{s}", new_events(20, prefix=f"u{s}"))
    table = "es_bucketed_test"
    materialize_bucketed(
        log.df(), table, n_buckets=4,
        path=os.path.join(str(tmp_path), "bucketed"))
    yield log, bucketed_log(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_copy_matches_live_log(bucketed):
    log, t = bucketed
    live = {(r["stream"], r["revision"], r["position"])
            for r in log.df().select("stream", "revision", "position").collect()}
    copy = {(r["stream"], r["revision"], r["position"])
            for r in t.select("stream", "revision", "position").collect()}
    assert copy == live and len(copy) == 120


def test_per_stream_agg_has_zero_exchanges(bucketed):
    log, t = bucketed
    heads = t.groupBy("stream").agg(F.max("revision").alias("head_revision"))
    assert _shuffles(heads) == 0
    # the same aggregate over the live (unbucketed) log pays an exchange
    live = log.df().groupBy("stream").agg(
        F.max("revision").alias("head_revision"))
    assert _shuffles(live) == 1
    assert ({(r["stream"], r["head_revision"]) for r in heads.collect()}
            == {(r["stream"], r["head_revision"]) for r in live.collect()})


def test_stream_keyed_self_join_has_zero_shuffle_exchanges(spark, bucketed):
    _, t = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        firsts = t.groupBy("stream").agg(F.min("revision").alias("r0"))
        joined = t.join(firsts, "stream")
        assert _shuffles(joined) == 0
        assert joined.count() == 120
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_projection_fold_over_bucketed_log_has_zero_exchanges(spark, bucketed):
    """The batch projection fold (groupBy(stream).applyInPandas) over
    the bucketed copy needs no exchange: the bucketed scan already
    satisfies the fold's ClusteredDistribution on the stream key."""
    import pandas as pd
    from pyspark.sql import types as T

    _, t = bucketed
    out_schema = T.StructType([
        T.StructField("stream", T.StringType()),
        T.StructField("n", T.LongType()),
    ])

    def fold(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"stream": [key[0]], "n": [len(pdf)]})

    folded = t.groupBy("stream").applyInPandas(fold, out_schema)
    assert _shuffles(folded) == 0
    assert {(r["stream"], r["n"]) for r in folded.collect()} \
        == {(f"user-{s}", 20) for s in range(6)}
