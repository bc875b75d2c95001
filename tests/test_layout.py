"""Z-order layout: key correctness, locality, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.extensions.layout import (zorder_key, zorder_layout,
                                                zorder_locality_report)


def _grid(spark, n=16):
    return spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], ["x", "y"])


def test_zorder_key_is_morton_interleave(spark):
    df = _grid(spark, 16)
    got = {(r.x, r.y): r.z_key
           for r in zorder_key(df, ["x", "y"], bits=4).collect()}

    def morton(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    # values 0..15 with bits=4 bucket to themselves (span 16 -> nb 16)
    assert all(got[(x, y)] == morton(x, y) for x in range(16)
               for y in range(16))


def test_zorder_locality_beats_linear_on_second_dim(spark):
    # y is random w.r.t. x; a linear sort on x leaves y spans ~1.0,
    # the z-layout must bound BOTH dims' spans well below 1
    df = _grid(spark, 32)
    rep = zorder_locality_report(df, ["x", "y"], bits=5,
                                 n_buckets=16).collect()
    avg_x = sum(r.span_frac_x for r in rep) / len(rep)
    avg_y = sum(r.span_frac_y for r in rep) / len(rep)
    assert avg_x < 0.5 and avg_y < 0.5
    assert sum(r.n_rows for r in rep) == 32 * 32


def test_zorder_layout_plan_single_range_exchange(spark):
    df = _grid(spark, 8)
    plan = (zorder_layout(df, ["x", "y"], bits=3, n_files=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("rangepartitioning") <= 1 or \
        plan.count("RangePartitioning") <= 1
    assert "CartesianProduct" not in plan
    # the only nested-loop is the one-row broadcast stats attachment
    # (the scalar cross-join idiom used engine-wide); a data-sized one
    # would show as CartesianProduct above


def test_zorder_key_partitioning_independent(spark):
    df = _grid(spark, 8)
    a = {(r.x, r.y, r.z_key)
         for r in zorder_key(df.coalesce(1), ["x", "y"], bits=3).collect()}
    b = {(r.x, r.y, r.z_key)
         for r in zorder_key(df.repartition(9), ["x", "y"],
                             bits=3).collect()}
    assert a == b


def test_key_skew_report_flags_hot_key(spark):
    from eventstorm_spark.extensions.layout import key_skew_report
    hot = spark.createDataFrame(
        [(1,)] * 500 + [(i,) for i in range(2, 502)], ["k"])
    uniform = spark.createDataFrame(
        [(i % 100,) for i in range(1000)], ["k"])
    h = key_skew_report(hot, "k", label="hot").collect()[0]
    u = key_skew_report(uniform, "k", label="uniform").collect()[0]
    assert h.key == "hot" and h.n_rows == 1000 and h.n_keys == 501
    assert h.max_share == 0.5
    assert u.max_share == 0.01 and u.cv == 0.0
    assert h.cv > 5 * u.cv + 1  # the hot key dominates the CV
    # deterministic under repartitioning
    h2 = key_skew_report(hot.repartition(7), "k", label="hot").collect()[0]
    assert h2 == h


def test_salted_join_equals_plain_join(spark):
    from eventstorm_spark.extensions.layout import salted_join
    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)],
        ["id", "k", "v"])
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(0, 1000, 10)],
        ["k", "attr"])
    plain = {tuple(r) for r in fact.join(dim, "k").collect()}
    for salts in (1, 8):
        got = {tuple(r)
               for r in salted_join(fact, dim, "k", salts=salts).collect()}
        assert got == plain
    # partitioning independence + left join keeps unmatched fact rows
    got = {tuple(r) for r in salted_join(
        fact.repartition(13), dim, "k", salts=4).collect()}
    assert got == plain
    left = salted_join(fact, dim.where(F.col("k") == "hot"), "k",
                       salts=4, how="left")
    assert left.count() == fact.count()
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


def test_salted_join_partitions_on_salt(spark):
    """The whole point: the exchange keys include __salt, so a hot
    key's rows spread across `salts` reducers instead of one."""
    from eventstorm_spark.extensions.layout import salted_join
    fact = spark.createDataFrame([(i, "hot") for i in range(100)],
                                 ["id", "k"])
    dim = spark.createDataFrame([("hot", 1)], ["k", "attr"])
    df = salted_join(fact, dim.hint("shuffle_hash"), "k", salts=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert "hashpartitioning(k" in plan and "__salt" in plan.split(
        "hashpartitioning(k", 1)[1].split(")", 1)[0]
