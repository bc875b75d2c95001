"""Arrow-path construction of bounded driver-local DataFrames.

``spark.createDataFrame(list, schema)`` ships local rows as a pickled
RDD split into ``defaultParallelism`` slices; EVERY action that touches
the frame then pays one Python-worker round trip (~200 ms) per slice —
at ``local[32]`` a 7-row fixture frame costs ~0.8 s per evaluation, and
``.coalesce(1)`` on top serializes the 32 round trips (~6 s measured:
the single task evaluates every pickled slice sequentially). Routing
the same rows through a ``pyarrow.Table`` instead yields a
JVM-evaluated relation (guide §6 "Arrow for driver transfers"): the
same frame evaluates in ~90 ms and never spawns Python workers.

``local_frame`` is a drop-in for the ``(rows, schema)`` form:

- exact Spark schema (parsed from the same DDL string / StructType,
  converted with pyspark's own ``to_arrow_schema``), nullability
  included — the result schema is compared field-for-field and any
  mismatch falls back;
- rows may be tuples, ``Row``s or dicts; ``None``, bytes, maps and
  arrays convert exactly (validated against the classic path);
- TOP-LEVEL timestamp columns take the Arrow path only when the
  session timezone is UTC: naive datetimes then mean the same wall
  time on both paths, and aware datetimes are normalized to naive UTC
  first (pyarrow would silently IGNORE tzinfo — measured — while the
  classic path converts it). Any other timestamp shape (non-UTC
  session, TIMESTAMP_NTZ, timestamps nested in arrays/maps/structs)
  uses the classic conversion, but through an explicitly slice-capped
  ``parallelize`` — same machinery, same semantics, without the
  32-empty-slice tax;
- ANY conversion error falls back to the classic path, so the helper
  can never produce different rows than ``createDataFrame`` — only a
  cheaper physical representation of them.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Union

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

__all__ = ["local_frame"]

_UTC = _dt.timezone.utc


def _nested_has_timestamp(dt: T.DataType) -> bool:
    if isinstance(dt, T.StructType):
        return any(
            isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
            or _nested_has_timestamp(f.dataType)
            for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _nested_has_timestamp(dt.elementType) or isinstance(
            dt.elementType, (T.TimestampType, T.TimestampNTZType))
    if isinstance(dt, T.MapType):
        return any(
            isinstance(x, (T.TimestampType, T.TimestampNTZType))
            or _nested_has_timestamp(x)
            for x in (dt.keyType, dt.valueType))
    return False


def _classic_capped(
    spark: SparkSession, rows: list, st: T.StructType
) -> DataFrame:
    """The classic pickled-RDD conversion with a row-derived slice
    count instead of one (mostly empty) slice per core."""
    if not rows:
        return spark.createDataFrame([], st)
    n = max(1, min(spark.sparkContext.defaultParallelism,
                   1 + len(rows) // 4096))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), st)


def local_frame(
    spark: SparkSession,
    rows: Iterable[Union[tuple, Row, dict]],
    schema: Union[str, T.StructType],
) -> DataFrame:
    """Bounded driver-local rows -> DataFrame via Arrow when possible."""
    rows = list(rows)
    try:
        st = (
            T._parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
        if not isinstance(st, T.StructType):
            return spark.createDataFrame(rows, schema)
        ts_cols = set()
        for f in st.fields:
            if isinstance(f.dataType, T.TimestampType):
                ts_cols.add(f.name)
            elif isinstance(f.dataType, T.TimestampNTZType) or (
                _nested_has_timestamp(f.dataType)
            ):
                return _classic_capped(spark, rows, st)
        if ts_cols and spark.conf.get(
                "spark.sql.session.timeZone", "") != "UTC":
            return _classic_capped(spark, rows, st)
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        names = st.names
        dicts = []
        for r in rows:
            if isinstance(r, Row):
                d = r.asDict(recursive=True)
            elif isinstance(r, dict):
                d = dict(r)
            else:
                d = dict(zip(names, r))
            for c in ts_cols:
                v = d.get(c)
                if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                    d[c] = v.astimezone(_UTC).replace(tzinfo=None)
            dicts.append(d)
        tbl = pa.Table.from_pylist(dicts, schema=to_arrow_schema(st))
        df = spark.createDataFrame(tbl)
        if df.schema != st:  # paranoia: exact schema or classic path
            return spark.createDataFrame(rows, schema)
        return df
    except Exception:
        return spark.createDataFrame(rows, schema)
