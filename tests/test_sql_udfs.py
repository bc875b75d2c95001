"""SQL UDF surface: es_* functions match the Column-API scalars exactly
(the reference's users query through SQL — backend.go builds SQL over
JSONB/BIGSERIAL; this is that surface on Spark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.functions import scalars
from eventstorm_spark.functions.sql_udfs import register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _reg(spark):
    names = register_sql_functions(spark)
    assert "es_ticks_to_timestamp" in names


def test_ticks_roundtrip_matches_column_api(spark):
    df = spark.range(5).select(
        (F.lit(17_100_000_000_000_000_0) + F.col("id") * 1_234_567).alias("ticks"))
    got = df.select(
        F.expr("es_ticks_to_timestamp(ticks)").alias("sql_ts"),
        scalars.ticks_to_timestamp("ticks").alias("col_ts"),
    ).collect()
    assert all(r.sql_ts == r.col_ts for r in got)
    rt = df.select(
        F.expr("es_timestamp_to_ticks(es_ticks_to_timestamp(ticks))").alias("rt"),
        F.col("ticks")).collect()
    # round-trip floors to 10-tick (1 us) resolution
    assert all(r.rt == (r.ticks // 10) * 10 for r in rt)


def test_uuid_matches_column_api_including_negatives(spark):
    df = spark.createDataFrame(
        [(1, 2), (-1, -2), (0, 0), (2**63 - 1, -(2**63))], ["msb", "lsb"])
    got = df.select(
        F.expr("es_uuid_from_int64s(msb, lsb)").alias("sql_u"),
        scalars.uuid_from_int64s("msb", "lsb").alias("col_u")).collect()
    assert all(r.sql_u == r.col_u for r in got)


def test_body_field_and_meta(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": 7}}', {"type": "t1"})], ["data", "metadata"])
    r = df.select(
        F.expr("es_body_field(data, '$.a.b')").alias("b"),
        F.expr("es_meta_get(metadata, 'type')").alias("t"),
        F.expr("es_is_json('application/json')").alias("j")).collect()[0]
    assert (r.b, r.t, r.j) == ("7", "t1", True)


def test_stream_category(spark):
    df = spark.createDataFrame([("user-42",), ("orders-7-x",), ("plain",)], ["s"])
    got = [r.c for r in df.select(F.expr("es_stream_category(s)").alias("c")).collect()]
    assert got == ["user", "orders", "plain"]


def test_sql_udfs_inline_into_codegen(spark):
    # the UDF must be inlined by Catalyst — no BatchEvalPython stage
    df = spark.range(10).selectExpr("es_ticks_to_timestamp(id * 10000000) AS ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
