"""Z-order data layout — multi-dimensional clustering for scan locality.

At 100 TB the cheapest query is the one that never reads the file:
parquet readers prune on file/row-group min-max statistics, but those
statistics only help if the WRITE order clusters each dimension. A
single `sortBy(a)` gives perfect pruning on `a` and none on `b`;
Z-ORDERING (bit-interleaving the bucketed dimensions into one sort key,
the Morton curve — the same layout `OPTIMIZE ZORDER BY` applies in
Delta/Iceberg compaction) spreads locality across ALL the interleaved
dimensions, so predicates on any subset skip most files.

Everything here is integer arithmetic in pure JVM expressions
(min-max bucketing + shift/mask bit interleave — no UDF), so the key an
external engine computes for verification is bit-identical, and the
write path is an ordinary ``repartitionByRange(z) + sortWithinPartitions``
whose cost is one range-exchange over the table — the price of any
compaction pass.

The locality REPORT (:func:`zorder_locality_report`) is the audit: cut
the z-range into ``n_buckets`` contiguous "files" and measure each
dimension's per-file value span. ``avg_span_fraction`` ~ 1/sqrt(files)
per dimension on a 2-D Z-curve vs ~1.0 for a dimension ignored by a
linear sort — the number that says "a point predicate on this column
skips (1 - span) of the files".
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(bucket_cols: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit i of dimension d lands at position
    i * n_dims + d. Pure shift/mask arithmetic — replayable anywhere."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for d, b in enumerate(bucket_cols):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long"),
                i * n + d)
    return z


def zorder_key(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
               key_name: str = "z_key") -> DataFrame:
    """Attach the Z-order key over integer-valued ``cols``: each
    dimension is min-max bucketed to ``bits`` bits (one broadcast
    scalar-stats pass — the same one-row cross-join used everywhere for
    corpus constants), then the buckets are bit-interleaved. Integer
    bucketing keeps the key exactly engine-reproducible; for float or
    categorical dimensions, bucket/encode them to ints first (e.g. a
    broadcast rank join for categories)."""
    stats = df.agg(*[f for c in cols for f in
                     (F.min(c).cast("long").alias(f"__lo_{c}"),
                      F.max(c).cast("long").alias(f"__hi_{c}"))])
    with_stats = df.crossJoin(F.broadcast(stats))
    nb = 1 << bits
    buckets = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = hi - lo + 1
        # floor((x - lo) * nb / span): the numerator stays well under
        # 2^53 for any realistic id/length dimension, so the double
        # division is exact and floor() reproduces integer division in
        # every engine; clamp handles x == hi landing on nb
        b = F.least(F.floor((F.col(c).cast("long") - lo) * nb / span),
                    F.lit(nb - 1)).cast("int")
        buckets.append(b.alias(f"__b_{c}"))
    keyed = with_stats.select(*df.columns, *buckets)
    z = _interleave([F.col(f"__b_{c}") for c in cols], bits)
    return keyed.select(*df.columns, z.alias(key_name))


def zorder_layout(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
                  n_files: int = 32) -> DataFrame:
    """The write-path form: key + range-partition by the key +
    sort-within-partition, ready for ``.write`` where each output file
    is one contiguous z-range (so parquet min-max stats on EVERY
    interleaved dimension are tight). One range exchange; no skew — the
    z-key is near-uniform when the dimensions are."""
    keyed = zorder_key(df, cols, bits=bits)
    return (keyed.repartitionByRange(n_files, "z_key")
            .sortWithinPartitions("z_key"))


def zorder_locality_report(df: DataFrame, cols: Sequence[str], *,
                           bits: int = 8,
                           n_buckets: int = 32) -> DataFrame:
    """Simulate the file layout and audit its prunability: cut the
    z-key range into ``n_buckets`` contiguous files (bucket = z *
    n_buckets / 2^(bits * n_dims), the deterministic twin of the range
    partitioner) and report, per file, the row count and each
    dimension's [min, max] span — exactly the parquet footer stats a
    reader prunes on. ``span_frac_{c}`` is the fraction of the
    dimension's global range the file covers: the expected fraction of
    files a uniform point predicate on that column must read."""
    keyed = zorder_key(df, cols, bits=bits)
    z_space = 1 << (bits * len(cols))
    bucket = F.least(F.floor(F.col("z_key") * n_buckets / z_space)
                     .cast("int"),
                     F.lit(n_buckets - 1))
    per = (keyed.groupBy(bucket.alias("file_id"))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                *[f for c in cols for f in
                  (F.min(c).cast("long").alias(f"min_{c}"),
                   F.max(c).cast("long").alias(f"max_{c}"))]))
    stats = df.agg(*[f for c in cols for f in
                     (F.min(c).cast("long").alias(f"__lo_{c}"),
                      F.max(c).cast("long").alias(f"__hi_{c}"))])
    out = per.crossJoin(F.broadcast(stats))
    spans = [F.round((F.col(f"max_{c}") - F.col(f"min_{c}") + 1)
                     / (F.col(f"__hi_{c}") - F.col(f"__lo_{c}") + 1), 6)
             .alias(f"span_frac_{c}") for c in cols]
    return out.select("file_id", "n_rows",
                      *[F.col(f"{m}_{c}") for c in cols
                        for m in ("min", "max")],
                      *spans)


def key_skew_report(df: DataFrame, key_col: str, *,
                    label: str | None = None, top_k: int = 10) -> DataFrame:
    """Pre-flight skew diagnostic for a prospective shuffle/join key —
    the number you want BEFORE launching a 100 TB join, because one
    hot key turns a 1000-task exchange into a one-straggler job. One
    map-side-combined count per key plus a tiny stats aggregate:

    - ``max_share`` / ``top{k}_share``: the hottest key's (and hottest
      k keys') fraction of all rows — direct straggler mass. Ties at
      the k-th count don't affect the SUM, so the report is
      deterministic under any partitioning.
    - ``cv``: coefficient of variation of per-key counts (stddev_pop /
      mean) — 0 for perfectly uniform keys; large values say "salt
      this key or let AQE skew-split it".

    Output is ONE row; union reports for several candidate keys to
    compare. The per-key count table is the only corpus-sized stage
    and it map-side combines; the top-k is a bounded TakeOrdered."""
    counts = (df.groupBy(F.col(key_col).alias("__k"))
              .agg(F.count(F.lit(1)).alias("__n")))
    top = (counts.orderBy(F.col("__n").desc(), F.col("__k"))
           .limit(top_k)
           .agg(F.sum("__n").alias("__top_n")))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("__max_n"),
        F.stddev_pop("__n").alias("__sd"),
        F.avg("__n").alias("__mean"))
    return (stats.crossJoin(F.broadcast(top))
            .select(
                F.lit(label or key_col).alias("key"),
                "n_rows", "n_keys",
                F.round(F.col("__max_n") / F.col("n_rows").cast("double"),
                        6).alias("max_share"),
                F.round(F.col("__top_n") / F.col("n_rows").cast("double"),
                        6).alias(f"top{top_k}_share"),
                F.round(F.col("__sd") / F.col("__mean"), 6).alias("cv")))


def salted_join(fact: DataFrame, dim: DataFrame, on, *, salts: int = 8,
                how: str = "inner", salt_col: str | None = None) -> DataFrame:
    """Skew-mitigated equi-join — the fix :func:`key_skew_report`
    points at when a hot key would serialize the exchange. A plain
    ``fact.join(dim, key)`` hashes every row of a hot key to ONE
    reducer; here each fact row is scattered to one of ``salts``
    replicas (a hash of the row, so the scatter is even and
    deterministic) while the dim side is replicated ``salts`` times,
    and the join runs on ``(key, __salt)`` — a hot key's rows now
    spread over ``salts`` tasks, trading ``salts``x replication of the
    SMALL side for parallelism on the big side's stragglers. The salt
    never leaks: output rows are exactly ``fact.join(dim, on, how)``
    under any salt count or partitioning (the equivalence the unit
    test pins).

    Use when the dim is too big to ``broadcast()`` but small enough to
    replicate, and the skew is concentrated (otherwise let AQE's
    skew-join splitting handle it — this operator is the explicit,
    plan-pinned form for engines/configs without AQE, and for
    when the skewed side's hot keys are known to dwarf the AQE
    split threshold). ``how`` is limited to inner/left: replicating
    the dim would duplicate unmatched rows under right/full outer.

    ``salt_col``: optional high-cardinality fact column to derive the
    scatter hash from (defaults to hashing all fact columns; identical
    duplicate rows then share a salt, which only affects balance, not
    results)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    scatter = (F.col(salt_col) if salt_col
               else F.concat_ws("\x1f", *[F.col(c).cast("string")
                                          for c in fact.columns]))
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(scatter), F.lit(salts)))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return f.join(d, keys + ["__salt"], how).drop("__salt")
