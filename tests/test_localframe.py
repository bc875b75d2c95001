"""local_frame must be value- and schema-identical to the classic
``spark.createDataFrame(rows, schema)`` across every type shape the
engine builds driver-local frames with — the helper is a physical
optimization (Arrow relation instead of 32 pickled RDD slices), never
a semantic one."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from eventstorm_spark.localframe import local_frame
from eventstorm_spark.model import EVENT_SCHEMA

CASES = [
    # (rows, schema)
    ([("a", 1.5), ("b", -2.0), ("c", None)], "k string, v double"),
    ([], "k string, v double"),
    ([(1, "x"), (2, None)], "i long, s string"),
    # bytes, maps, arrays
    ([("s", b"\x00\xff", {"a": "1"}, [1, 2, 3]),
      ("t", None, None, [])],
     "k string, b binary, m map<string,string>, a array<long>"),
    # Row inputs
    ([Row(k="a", v=1), Row(k="b", v=None)], "k string, v long"),
    # dict inputs
    ([{"k": "a", "v": 2}], "k string, v long"),
    # int/float edge values
    ([(2**62, 1e-300), (-(2**62), float("inf"))], "i long, d double"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_matches_classic(spark, rows, schema):
    got = local_frame(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(repr, got.collect())) == sorted(
        map(repr, want.collect()))


def test_event_schema_roundtrip(spark):
    rows = [
        ("s-1", "u1", '{"v":1}', {"k": "v"}, b"\x01", 0, 0, "T",
         "application/json", 123456789),
        ("s-1", "u2", None, None, None, 1, 1, None, None, None),
    ]
    got = local_frame(spark, rows, EVENT_SCHEMA)
    want = spark.createDataFrame(rows, EVENT_SCHEMA)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_timestamps_naive_and_aware(spark):
    # naive datetimes mean session-tz wall time on the classic path;
    # aware datetimes are converted. Both must match exactly.
    st = T._parse_datatype_string("i long, ts timestamp")
    naive = dt.datetime(2031, 3, 1, 12, 30, 45, 123456)
    aware = dt.datetime(2031, 3, 1, 12, 30, 45, 123456,
                        tzinfo=dt.timezone(dt.timedelta(hours=2)))
    rows = [(1, naive), (2, aware), (3, None)]
    got = local_frame(spark, rows, st)
    want = spark.createDataFrame(rows, st)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_no_python_stage(spark):
    """The point of the helper: the Arrow path must not evaluate rows
    through pickled-RDD Python slices (LocalTableScan/Arrow relation,
    not SerializeFromObject over an RDD scan)."""
    df = local_frame(spark, [("a", 1)], "k string, v long")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
