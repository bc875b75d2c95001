"""SQL function surface — the engine's scalars as Spark SQL UDFs.

The reference is queried through Postgres, so its scalar surface is
plain SQL (``streams.go``/``backend.go`` build SQL over JSONB and
BIGSERIAL columns). This module gives SQL users the same surface here:
every scalar from :mod:`eventstorm_spark.functions.scalars` that has a
pure-expression body is registered as a Spark *SQL UDF*
(``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``), which
Catalyst inlines into the calling plan — zero overhead vs the Column
API, full codegen, pushdown through the function boundary.

Usage::

    register_sql_functions(spark)
    spark.sql("SELECT es_ticks_to_timestamp(created) FROM events_view")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). All deterministic expressions;
# semantics mirror functions/scalars.py exactly (shared test pins them).
_SQL_UDFS: dict[str, tuple[str, str, str]] = {
    # 100-ns ticks (reference created format: UnixNano/100)
    # decimal + floor (not DIV, which truncates toward zero) to match the
    # Column API exactly, including pre-epoch (negative) ticks
    "es_ticks_to_timestamp": (
        "(ticks BIGINT)", "TIMESTAMP",
        "timestamp_micros(CAST(floor(CAST(ticks AS DECIMAL(30, 0)) / 10) AS BIGINT))"),
    # NTZ-safe: the TIMESTAMP parameter means NTZ arguments are
    # session-tz cast at the call boundary; from_utc_timestamp with the
    # session timezone cancels that cast, so NTZ wall clocks map to
    # their literal UTC micros under any session timezone (mirrors
    # scalars.wallclock_micros)
    "es_timestamp_to_ticks": (
        "(ts TIMESTAMP)", "BIGINT",
        "unix_micros(from_utc_timestamp(ts, current_timezone())) * 10"),
    "es_now_ticks": (
        "()", "BIGINT",
        "unix_micros(current_timestamp()) * 10"),
    # JSON body access (reference: JSONB ->> operators)
    "es_body_field": (
        "(data STRING, path STRING)", "STRING",
        "get_json_object(data, path)"),
    "es_meta_get": (
        "(metadata MAP<STRING, STRING>, key STRING)", "STRING",
        "metadata[key]"),
    "es_is_json": (
        "(content_type STRING)", "BOOLEAN",
        "content_type = 'application/json'"),
    # structured 128-bit uuid from two int64 halves (reference stores
    # uuids as (msb, lsb) pairs)
    "es_uuid_from_int64s": (
        "(msb BIGINT, lsb BIGINT)", "STRING",
        "concat(substr(lpad(lower(hex(msb)), 16, '0'), 1, 8), '-', "
        "substr(lpad(lower(hex(msb)), 16, '0'), 9, 4), '-', "
        "substr(lpad(lower(hex(msb)), 16, '0'), 13, 4), '-', "
        "substr(lpad(lower(hex(lsb)), 16, '0'), 1, 4), '-', "
        "substr(lpad(lower(hex(lsb)), 16, '0'), 5, 12))"),
    # stream-id helpers (category = prefix before the first '-')
    "es_stream_category": (
        "(stream STRING)", "STRING",
        "CASE WHEN instr(stream, '-') > 0 "
        "THEN substr(stream, 1, instr(stream, '-') - 1) ELSE stream END"),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the ``es_*`` SQL function surface on this session.

    Idempotent (CREATE OR REPLACE). Returns the registered names."""
    for name, (sig, ret, body) in _SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}")
    return list(_SQL_UDFS)
