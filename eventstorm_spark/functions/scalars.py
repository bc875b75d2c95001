"""Scalar function surface — SURVEY §2.7 (U1–U6), JVM-side Columns.

The reference's scalar layer is tiny and implicit: JSON body parse on
demand (``internal/model/model.go:47-58``), JSONB metadata extraction
(``internal/backend/backend.go:185``), POSIX regex match
(``backend.go:240-246``), prefix→regex compilation (``backend.go:228-238``),
``created`` stamped as 100-ns ticks since epoch
(``internal/streams/streams.go:151``), and UUID handling on the wire
(``grpc_server.go:41-51``). Here each is an expression over the envelope
built from ``pyspark.sql.functions`` only — no Python UDFs — so every one
of them stays inside whole-stage codegen and (for the predicates)
participates in Parquet pushdown.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from eventstorm_spark.log.filters import build_prefix_regex, filter_column, filter_sql
from eventstorm_spark.model import META_CONTENT_TYPE, META_CREATED, META_TYPE

__all__ = [
    "json_body", "body_field", "body_variant", "variant_field",
    "meta_get", "meta_type", "meta_content_type", "meta_created",
    "is_json",
    "regex_match", "build_prefix_regex", "filter_column", "filter_sql",
    "created_now_ticks", "ticks_to_timestamp", "timestamp_to_ticks",
    "wallclock_micros", "created_str",
    "uuid_string", "uuid_from_int64s",
]

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- U1: JSON body access (model.go:47-58) ----------------------------------

def json_body(data: ColumnOrName, schema: str) -> Column:
    """Parse the event body against a declared schema — the typed
    equivalent of ``Event.Json()``. Malformed rows yield null structs
    (the engine-level analogue of the reference's panic-on-bad-JSON,
    model.go:53, softened to SQL semantics)."""
    return F.from_json(_col(data), schema)


def body_field(data: ColumnOrName, path: str) -> Column:
    """Schema-on-read single-path extraction (``$.field`` JSONPath)."""
    return F.get_json_object(_col(data), path)


def body_variant(data: ColumnOrName) -> Column:
    """Schema-on-read full parse into a VARIANT (Spark 4) — the closest
    engine equivalent of the reference's ``map[string]any``: one parse,
    typed extraction afterwards via ``variant_field``."""
    return F.try_parse_json(_col(data))


def variant_field(variant: Column, path: str, as_type: str) -> Column:
    return F.try_variant_get(variant, path, as_type)


# -- U2: metadata access (backend.go:185) -----------------------------------

def meta_get(metadata: ColumnOrName, key: str) -> Column:
    """``metadata->>'key'`` over the MapType column."""
    return _col(metadata).getItem(key)


def meta_type(metadata: ColumnOrName = "metadata") -> Column:
    return meta_get(metadata, META_TYPE)


def meta_content_type(metadata: ColumnOrName = "metadata") -> Column:
    return meta_get(metadata, META_CONTENT_TYPE)


def meta_created(metadata: ColumnOrName = "metadata") -> Column:
    """The `created` system key as ticks (stored as a decimal string,
    streams.go:151)."""
    return meta_get(metadata, META_CREATED).cast("long")


def is_json(content_type: ColumnOrName = "content_type") -> Column:
    """The content-type gate the reference applies before body parse
    (model.go:48-50)."""
    return _col(content_type) == F.lit("application/json")


# -- U3: regex match (backend.go:240-246) -----------------------------------

def regex_match(c: ColumnOrName, pattern: str) -> Column:
    """Unanchored regex match — Postgres ``~`` semantics via ``rlike``;
    supported dialect is the POSIX/Java intersection (SURVEY §7.4 risk 6)."""
    return _col(c).rlike(pattern)


# -- U5: created ticks (streams.go:151, 100-ns ticks since epoch) -----------

def created_now_ticks() -> Column:
    """Append-time stamp: UnixNano/100 — exactly the reference format.
    Micros×10 keeps the arithmetic in long space (no ns overflow paths)."""
    return (F.unix_micros(F.current_timestamp()) * F.lit(10)).cast("long")


def ticks_to_timestamp(ticks: ColumnOrName) -> Column:
    """100-ns ticks → TIMESTAMP (microsecond precision, floor division).

    Integer-exact: ticks beyond 2^53 (any realistic UnixNano/100 value)
    are not double-representable, so the division goes through decimal,
    never float — `floor(ticks/10.0)` would drift by ±1 µs once the
    tick count stops being a multiple of 10."""
    c = _col(ticks)
    micros = F.floor(c.cast("decimal(30, 0)") / F.lit(10)).cast("long")
    return F.timestamp_micros(micros)


def wallclock_micros(ts: ColumnOrName) -> Column:
    """Wall-clock microseconds of a timestamp column, TIMESTAMP_NTZ-safe.

    ``unix_micros`` rejects TIMESTAMP_NTZ (the type Spark infers for
    tz-less parquet timestamps, e.g. the driver testdata). The form
    ``unix_micros(from_utc_timestamp(ts, current_timezone()))`` cancels
    the implicit session-timezone cast an NTZ argument receives, so an
    NTZ wall clock yields its literal micros-as-UTC — DuckDB's
    ``epoch_us`` over naive parquet timestamps — under ANY session
    timezone (verified empirically; the earlier
    ``to_utc_timestamp(ts,'UTC')`` wrap was an instant-identity that
    only matched because sessions pin UTC). For a TIMESTAMP (instant)
    argument the result is the session-rendered wall clock, which
    equals the UTC instant micros whenever the session timezone is UTC
    (guaranteed by ``get_spark``; non-UTC sessions get wall-clock
    semantics, exact up to DST-ambiguous local times)."""
    return F.unix_micros(F.from_utc_timestamp(_col(ts), F.current_timezone()))


def timestamp_to_ticks(ts: ColumnOrName) -> Column:
    return (wallclock_micros(ts) * F.lit(10)).cast("long")


def created_str(ticks: ColumnOrName) -> Column:
    """Ticks → the decimal-string metadata representation."""
    return _col(ticks).cast("string")


# -- U6: UUIDs (grpc_server.go:41-51) ---------------------------------------

def uuid_string() -> Column:
    """A fresh random UUID per row (non-deterministic expression)."""
    return F.expr("uuid()")


def _hex16(c: Column) -> Column:
    # hex() of a negative BIGINT is already the 16-digit two's-complement
    # form; positives need the zero-pad.
    return F.lpad(F.lower(F.hex(c)), 16, "0")


def uuid_from_int64s(msb: ColumnOrName, lsb: ColumnOrName,
                     *, reference_bug: bool = False) -> Column:
    """Structured 128-bit UUID from two int64 halves → canonical string.

    The reference decodes proto ``UUID.Structured`` this way but writes
    MostSignificantBits into BOTH halves (grpc_server.go:46-48) — pass
    ``reference_bug=True`` to reproduce that byte-for-byte.
    """
    hi = _hex16(_col(msb))
    lo = _hex16(_col(msb) if reference_bug else _col(lsb))
    return F.concat_ws(
        "-",
        F.substring(hi, 1, 8), F.substring(hi, 9, 4), F.substring(hi, 13, 4),
        F.substring(lo, 1, 4), F.substring(lo, 5, 12),
    )
