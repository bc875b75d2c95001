"""Property test for the portable-hash contract: the Spark expression
and the DuckDB expression behind portable_hash60 must agree on
arbitrary unicode strings — the whole approximate-operator oracle
strategy (MinHash/SimHash/LSH candidate replay) rests on this
equivalence."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# printable unicode w/o surrogates; includes quotes, unicode, spaces
texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters="\x00"),
        min_size=0, max_size=40),
    min_size=1, max_size=20, unique=True)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=texts)
def test_portable_hash_agrees_across_engines(spark, vals):
    from eventstorm_spark.extensions.dedup import portable_hash60

    got_spark = [
        r.h for r in
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select(portable_hash60(F.col("s")).alias("h")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)",
            [v]).fetchone()[0]
        for v in vals
    ]
    want = [_py_hash60(v) for v in vals]
    assert got_spark == want
    assert got_duck == want
