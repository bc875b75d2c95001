"""Scalar function surface (SURVEY §2.7 U1–U6) — unit tests.

Pin the reference formats exactly: `created` = UnixNano/100 decimal
string (streams.go:151), JSON-body-on-demand gated by content-type
(model.go:47-58), and the structured-UUID decode including the reference's
MSB-for-both-halves bug (grpc_server.go:46-48).
"""

from __future__ import annotations

import json
import uuid as _uuid

from pyspark.sql import functions as F

from eventstorm_spark.functions import (
    body_field,
    body_variant,
    created_now_ticks,
    is_json,
    json_body,
    meta_created,
    meta_get,
    meta_type,
    regex_match,
    ticks_to_timestamp,
    timestamp_to_ticks,
    uuid_from_int64s,
    uuid_string,
    variant_field,
)


def _one(spark, **cols):
    return spark.createDataFrame([cols])


def test_json_body_typed_and_pathed(spark):
    df = _one(spark, data=json.dumps({"k": 7, "s": "x"}))
    row = df.select(
        json_body("data", "k INT, s STRING").alias("b"),
        body_field("data", "$.k").cast("int").alias("k"),
    ).collect()[0]
    assert row["b"]["k"] == 7 and row["b"]["s"] == "x"
    assert row["k"] == 7


def test_json_body_malformed_is_null_not_panic(spark):
    df = _one(spark, data="not json {")
    row = df.select(json_body("data", "k INT").alias("b"),
                    body_field("data", "$.k").alias("k")).collect()[0]
    assert row["b"] is None or row["b"]["k"] is None
    assert row["k"] is None


def test_variant_schema_on_read(spark):
    df = _one(spark, data=json.dumps({"nested": {"n": [1, 2, 3]}}))
    row = df.select(
        variant_field(body_variant("data"), "$.nested.n[2]", "int").alias("v")
    ).collect()[0]
    assert row["v"] == 3


def test_meta_access(spark):
    df = _one(spark, metadata={"type": "clicked", "content-type": "application/json",
                               "created": "16000000000000000"})
    row = df.select(
        meta_type("metadata").alias("t"),
        meta_get("metadata", "content-type").alias("ct"),
        meta_created("metadata").alias("c"),
    ).collect()[0]
    assert row["t"] == "clicked"
    assert row["ct"] == "application/json"
    assert row["c"] == 16000000000000000


def test_is_json_gate(spark):
    df = spark.createDataFrame(
        [("application/json",), ("application/octet-stream",)], "content_type string")
    got = [r["j"] for r in df.select(is_json().alias("j")).orderBy("content_type").collect()]
    assert got == [True, False]


def test_regex_match_unanchored(spark):
    df = spark.createDataFrame([("prefix-middle-suffix",)], "s string")
    row = df.select(
        regex_match("s", "middle").alias("a"),
        regex_match("s", "^middle").alias("b"),
        regex_match("s", "^prefix").alias("c"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (True, False, True)


def test_ticks_roundtrip_and_format(spark):
    # 2020-09-13T12:26:40Z = 1_600_000_000 s → micro*10 ticks
    ticks = 1_600_000_000 * 1_000_000 * 10
    df = _one(spark, t=ticks)
    row = df.select(
        ticks_to_timestamp("t").alias("ts"),
        timestamp_to_ticks(ticks_to_timestamp("t")).alias("back"),
    ).collect()[0]
    assert row["back"] == ticks
    assert row["ts"].year == 2020

    now = spark.range(1).select(created_now_ticks().alias("n")).collect()[0]["n"]
    # sanity: ~2026 in 100-ns ticks is ~1.7e16; format is plain long
    assert 1.5e16 < now < 3e16


def test_uuid_string_shape(spark):
    val = spark.range(1).select(uuid_string().alias("u")).collect()[0]["u"]
    _uuid.UUID(val)  # parses as canonical UUID


def test_uuid_from_int64s_correct_and_reference_bug(spark):
    msb, lsb = 0x1122334455667788, 0x99AABBCCDDEEFF00 - (1 << 64)  # lsb as signed
    df = _one(spark, m=msb, l=lsb)
    row = df.select(
        uuid_from_int64s("m", "l").alias("ok"),
        uuid_from_int64s("m", "l", reference_bug=True).alias("bug"),
    ).collect()[0]
    assert row["ok"] == "11223344-5566-7788-99aa-bbccddeeff00"
    # the reference writes MSB into both halves (grpc_server.go:46-48)
    assert row["bug"] == "11223344-5566-7788-1122-334455667788"


def test_scalars_are_codegen_side(spark):
    """No BatchEvalPython / ArrowEvalPython stage: the whole surface is
    JVM expressions (SURVEY §4 — stay inside whole-stage codegen)."""
    df = _one(spark, data=json.dumps({"k": 1}), t=123456789,
              m=1, l=2, metadata={"type": "x"})
    plan = df.select(
        body_field("data", "$.k"), ticks_to_timestamp("t"),
        uuid_from_int64s("m", "l"), meta_type("metadata"),
        regex_match(F.col("data"), "k"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_wallclock_micros_ntz_session_timezone_independent(spark):
    """An NTZ wall clock must map to its literal UTC micros under ANY
    session timezone (the driver uses a plain session whose timezone we
    do not control); previously this silently shifted outside UTC."""
    from pyspark.sql import functions as F

    from eventstorm_spark.functions.scalars import wallclock_micros

    want = 1717243200000000  # 2024-06-01T12:00:00Z
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ["UTC", "America/Los_Angeles", "Asia/Tokyo"]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.sql("SELECT TIMESTAMP_NTZ '2024-06-01 12:00:00' AS ts")
            got = df.select(wallclock_micros("ts").alias("v")).collect()[0].v
            assert got == want, tz
            # and the SQL UDF twin (TIMESTAMP param -> boundary cast)
            from eventstorm_spark.functions.sql_udfs import register_sql_functions
            register_sql_functions(spark)
            got2 = spark.sql(
                "SELECT es_timestamp_to_ticks(TIMESTAMP_NTZ '2024-06-01 12:00:00') AS v"
            ).collect()[0].v
            assert got2 == want * 10, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
