"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same parquet, compare row count,
column names, order-insensitive values, AND declared column types.

The type check exists because the driver's value-hash serializes by
type: DuckDB `sum(BIGINT)` returns HUGEINT (int128) which hashes
differently from Spark's BIGINT even though Python fetches equal ints
(round-1 root cause of 4 hash_match failures). Comparing fetched Python
values can never catch that — both sides fetch `int` — so we compare
the *declared* relation/schema types through a canonical vocabulary.

Runs at sf0.001 for speed (the driver uses sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


_SPARK_CANON = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
    "binary": "bin", "void": "null",
}

_DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "UBIGINT": "u64", "UINTEGER": "u32",
    "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "DATE": "date",
    "BLOB": "bin", '"NULL"': "null", "NULL": "null",
}


def canon_spark_type(simple: str) -> str:
    s = simple.lower()
    if s.startswith("decimal"):
        return s.replace(" ", "")
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{canon_spark_type(s[6:-1])}>"
    return _SPARK_CANON.get(s, s)


def canon_duck_type(t) -> str:
    s = str(t).strip()
    if s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    u = s.upper()
    if u.startswith("DECIMAL"):
        return u.lower().replace(" ", "")
    return _DUCK_CANON.get(u, s.lower())


def normalize_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in idx], out


QUERY_NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    sdf = entrymod.queries()[name](spark, sf_dir)
    scols = sdf.columns
    stypes = {f.name: canon_spark_type(f.dataType.simpleString())
              for f in sdf.schema.fields}
    srows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entrymod.oracle_sql()[name])
    ocols = list(rel.columns)
    otypes = {c: canon_duck_type(t) for c, t in zip(rel.columns, rel.types)}
    orows = rel.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    mismatched = {c: (stypes[c], otypes[c]) for c in stypes
                  if c in otypes and stypes[c] != otypes[c]}
    assert not mismatched, (
        f"{name}: column type mismatch (spark, oracle): {mismatched} — "
        "the driver hashes by type; CAST the oracle (or Spark) side so "
        "both declare the same type (e.g. CAST(sum(...) AS BIGINT))")
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    _, snorm = normalize_rows(scols, srows)
    _, onorm = normalize_rows(ocols, orows)
    assert snorm == onorm, f"{name}: value mismatch\nspark: {snorm[:3]}\noracle: {onorm[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["stream", "n_events", "head_revision", "head_position"]
