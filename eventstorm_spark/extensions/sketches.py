"""Distributed sketches built as plain aggregations.

Beyond the built-ins (HLL++ `approx_count_distinct`, KLL-ish
`percentile_approx`), this module hand-builds a Count-Min Sketch as an
ordinary groupBy — demonstrating the pattern for ANY mergeable sketch on
Spark: express the sketch cells as (row, bucket) keys and the update as
a map-side-combinable aggregate. The "sketch" that reaches the driver is
width x depth counters, independent of stream size.

CMS guarantees: estimate >= true count, and with width w, depth d,
estimate <= true + (e/w) * N with probability 1 - e^-d.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from eventstorm_spark.localframe import local_frame


def _cms_bucket(val, row, width: int, portable: bool):
    """Cell hash for row ``row``: xxhash64(value, row) by default; in
    portable mode the md5-slice family (value ':' row), so an external
    SQL engine rebuilds the identical sketch — same contract as
    ``portable_hash60``."""
    if portable:
        from eventstorm_spark.extensions.dedup import portable_hash60
        h = portable_hash60(F.concat_ws(":", val, row.cast("string")))
        return F.pmod(h, F.lit(width))
    return F.pmod(F.xxhash64(val, row), F.lit(width))


def cms_build(df: DataFrame, col: str, *, width: int = 1024,
              depth: int = 5, portable: bool = False) -> DataFrame:
    """Build a Count-Min Sketch over ``col``: one row per non-empty
    (row, bucket) cell. Construction is a single groupBy over d
    replicated hashes — partial aggregation combines cells map-side, so
    the shuffle carries at most width*depth rows per task regardless of
    input size. Sketches of different inputs union+sum to merge.
    ``portable=True`` switches to the md5 hash family so the sketch is
    oracle-replayable (the standard portable-mode contract)."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    cells = df.select(F.col(col).cast("string").alias("__v"), rows)
    bucket = _cms_bucket(F.col("__v"), F.col("row"), width, portable)
    return (cells.select("row", bucket.alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("count")))


def cms_estimate(sketch: DataFrame, values: list, *, width: int = 1024,
                 depth: int = 5, portable: bool = False) -> DataFrame:
    """Point-query the sketch for ``values``: min over the d cells each
    value hashes to. The probe set is tiny — broadcast it against the
    (already tiny) sketch."""
    spark = sketch.sparkSession
    probes = local_frame(spark, [(str(v),) for v in values], "value string")
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    keyed = probes.select("value", rows).withColumn(
        "bucket", _cms_bucket(F.col("value"), F.col("row"), width, portable))
    joined = keyed.join(sketch, ["row", "bucket"], "left_outer")
    return (joined.groupBy("value")
            .agg(F.min(F.coalesce(F.col("count"), F.lit(0)))
                 .alias("estimate")))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

_HASH_SPACE = float(2 ** 60)  # both hash modes land in [0, 2^60)


def _hash60(col, portable: bool):
    if portable:
        from eventstorm_spark.extensions.dedup import portable_hash60
        return portable_hash60(col)
    # xxhash64 is signed; an unsigned >>4 folds it into [0, 2^60) so the
    # estimator constant is shared with portable mode
    return F.shiftrightunsigned(F.xxhash64(col), 4)


def _bottom_k(hashed: DataFrame, group_cols: Sequence[str], *, k: int,
              n_salts: int) -> DataFrame:
    """Per-group k smallest values of ``__h`` as a sorted array — the
    two-phase bounded top-k: phase 1 keeps k per (group, salt) so no
    single sort partition ever holds a group's full distinct set, phase
    2 re-ranks the <= k * n_salts survivors per group. Output rows are
    bounded by k per group at every exchange after phase 1."""
    gs = [F.col(c) for c in group_cols]
    w1 = (W.partitionBy(*gs, F.pmod(F.col("__h"), F.lit(n_salts)))
          .orderBy("__h"))
    s1 = (hashed.withColumn("__rn", F.row_number().over(w1))
          .where(F.col("__rn") <= k).drop("__rn"))
    w2 = W.partitionBy(*gs).orderBy("__h")
    s2 = (s1.withColumn("__rn", F.row_number().over(w2))
          .where(F.col("__rn") <= k))
    return (s2.groupBy(*gs)
            .agg(F.sort_array(F.collect_list("__h")).alias("sketch")))


def kmv_sketch(df: DataFrame, col: str, *, k: int = 256,
               group_cols: Sequence[str] = (),
               n_salts: int = 64, portable: bool = False) -> DataFrame:
    """Per-group KMV distinct-count sketch: the k smallest distinct
    60-bit hashes of ``col``, as a sorted array<long>.

    Why KMV next to Spark's built-in HLL++ (`approx_count_distinct`):
    the sketch is (a) MERGEABLE with plain column ops — union two
    sketches = k smallest of the concatenation (:func:`kmv_merge`), so
    per-shard sketches can be stored at rest and combined later without
    re-scanning, exactly like the at-rest MinHash/dHash index tier; and
    (b) ENGINE-PORTABLE — with ``portable=True`` the hash is the md5
    slice any SQL engine can compute, so the whole estimate (not just a
    row count) is replayable for verification. HLL registers are neither.

    Plan shape: project + distinct (map-side partial dedup, one
    exchange on (group, hash)), then the salted two-phase bottom-k —
    after phase 1 every exchange carries <= k rows per (group, salt).
    Nothing here depends on the raw row count: at 100 TB the only
    full-data pass is the initial distinct's map side.

    Estimator (:func:`kmv_estimate`): with fewer than k distinct values
    the sketch IS the distinct set (estimate exact); otherwise
    E[distinct] = (k-1) / normalized kth minimum — standard KMV, mean
    relative error ~ 1/sqrt(k-2) (~6% at k=256).
    """
    gs = list(group_cols)
    hashed = (df.select(*gs, _hash60(F.col(col).cast("string"),
                                     portable).alias("__h"))
              .distinct())
    return _bottom_k(hashed, gs, k=k, n_salts=n_salts)


def kmv_merge(sketches: DataFrame, *, k: int = 256,
              group_cols: Sequence[str] = (),
              n_salts: int = 64) -> DataFrame:
    """Merge sketch rows that share a group (e.g. per-shard sketches
    unioned into one frame): explode all retained hashes, dedupe, keep
    the k smallest again. Lossless w.r.t. building one sketch over the
    concatenated inputs — the k global minima are always contained in
    the union of per-input k-minima."""
    gs = list(group_cols)
    hashed = (sketches.select(*gs, F.explode("sketch").alias("__h"))
              .distinct())
    return _bottom_k(hashed, gs, k=k, n_salts=n_salts)


def kmv_estimate(sketch: DataFrame, *, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group: exact when the sketch holds
    the whole distinct set, else (k-1) * 2^60 / kth_min. One fixed IEEE
    expression, replayable bit-for-bit by an external engine."""
    n = F.size("sketch")
    kth = F.element_at("sketch", k).cast("double")
    est = (F.when(n < k, n.cast("double"))
           .otherwise(F.lit((k - 1) * _HASH_SPACE) / kth))
    return sketch.withColumn("n_distinct_est", est).drop("sketch")


def kmv_pairwise_overlap(sketches: DataFrame, group_col: str, *,
                         k: int = 256) -> DataFrame:
    """Pairwise SET-OPERATION estimates from per-group KMV sketches —
    union size, intersection size and Jaccard for every group pair,
    computed entirely from the k-minima (Beyer et al., SIGMOD'07):

    - ``L`` = the k smallest hashes of ``A ∪ B`` (k-minima containment:
      always a subset of ``sketch_a ∪ sketch_b``, so no raw data is
      touched);
    - ``n_union_est`` = the standard KMV estimate over ``L``;
    - ``m`` = ``|L ∩ A ∩ B|``; since ``L`` is a uniform sample of the
      union, ``jaccard_est = m / |L|`` and
      ``n_intersect_est = jaccard_est * n_union_est``.

    This is the sketch-cost twin of :func:`dedup.source_ngram_overlap`:
    the exact matrix joins the full distinct shingle sets of every
    source pair (shuffle ∝ vocabulary), while this reads k longs per
    group from an at-rest sketch — the pair computation is O(pairs x
    k log k) array arithmetic, independent of corpus size. The join is
    a broadcast nested-loop over the (tiny, one-row-per-group) sketch
    frame; expansion is quadratic in #groups (tens), never rows. All
    array ops (union/sort/slice/intersect) are JVM built-ins, and in
    portable-hash mode the whole estimate is replayable in SQL.

    Returns (grp_a, grp_b, m, n_union_est, jaccard_est,
    n_intersect_est) for grp_a < grp_b; estimates rounded (3 / 6 / 3)
    as one fixed IEEE expression per column."""
    a = sketches.select(F.col(group_col).alias("grp_a"),
                        F.col("sketch").alias("__sa"))
    b = sketches.select(F.col(group_col).alias("grp_b"),
                        F.col("sketch").alias("__sb"))
    pairs = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
    L = F.slice(F.array_sort(F.array_union("__sa", "__sb")), 1, k)
    with_l = pairs.select("grp_a", "grp_b", "__sa", "__sb", L.alias("__l"))
    nl = F.size("__l")
    kth = F.element_at("__l", k).cast("double")
    union_est = F.round(
        F.when(nl < k, nl.cast("double"))
        .otherwise(F.lit((k - 1) * _HASH_SPACE) / kth), 3)
    m = F.size(F.array_intersect(F.array_intersect("__l", "__sa"), "__sb"))
    est = with_l.select(
        "grp_a", "grp_b", m.alias("m"), union_est.alias("n_union_est"),
        F.round(m.cast("double") / nl, 6).alias("jaccard_est"))
    return est.withColumn(
        "n_intersect_est",
        F.round(F.col("jaccard_est") * F.col("n_union_est"), 3))


# ---------------------------------------------------------------------------
# Exact heavy hitters (two-pass: Misra-Gries candidates -> exact recount)
# ---------------------------------------------------------------------------


def heavy_hitters(df: DataFrame, col: str, *, threshold: float = 0.002,
                  capacity: int | None = None) -> DataFrame:
    """EXACT frequent items with support >= ``threshold``: (value, n,
    share), share rounded to 6 places.

    The naive plan — groupBy(value) then HAVING — shuffles one row per
    DISTINCT value, which for token streams is the full Zipf tail
    (billions of singletons at corpus scale, all shuffled to be counted
    once and discarded). This two-pass shape bounds the shuffle by the
    THRESHOLD instead:

    1. Candidates: a per-partition Misra-Gries summary with
       ``capacity = ceil(2/threshold)`` counters via ``mapInPandas``
       (Arrow-batched ``value_counts`` per batch, summary merge +
       (cap+1)-th-largest decrement between batches — the mergeable-
       summaries formulation, undercount <= n_p/(capacity+1)). Any value
       with global share >= threshold has local share >= threshold on
       at least one partition (averaging argument) and survives there,
       so the union of partition summaries is a guaranteed SUPERSET of
       the answer; each partition emits <= ~capacity candidate strings.
    2. Exact recount: semi-join the stream on the broadcast candidate
       set, count, filter ``n >= ceil(threshold * N)``.

    The OUTPUT is exact and independent of partitioning (pass 2 recounts
    from the raw data; MG only affects which non-answers get recounted),
    so the oracle is the plain exact SQL — no sketch semantics leak into
    the result. Total shuffle: candidates (bounded by 2/threshold per
    partition) + one broadcast + the recount's map-side-combined counts.
    """
    cap = capacity or math.ceil(2.0 / threshold)
    vals = df.select(F.col(col).cast("string").alias("value"))

    def mg(batches):
        import pandas as pd
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["value"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                top = sorted(counters.values(), reverse=True)
                delta = top[cap]  # (cap+1)-th largest
                counters = {v: c - delta for v, c in counters.items()
                            if c - delta > 0}
        if counters:
            yield pd.DataFrame({"value": list(counters.keys())})

    cands = vals.mapInPandas(mg, "value string").distinct()
    total = vals.agg(F.count(F.lit(1)).alias("__N"))
    counts = (vals.join(F.broadcast(cands), "value")
              .groupBy("value").agg(F.count(F.lit(1)).alias("n")))
    return (counts.crossJoin(F.broadcast(total))
            .where(F.col("n") >= F.ceil(F.lit(threshold) * F.col("__N")))
            .select("value", "n",
                    F.round(F.col("n") / F.col("__N").cast("double"), 6)
                    .alias("share")))


def streaming_kmv_distinct(stream_df: DataFrame, col: str, *, k: int = 64,
                           window: str = "1 hour", ts_col: str = "ts",
                           watermark_delay: str = "10 minutes",
                           portable: bool = False) -> DataFrame:
    """Streaming distinct-count per event-time window with BOUNDED
    state: the KMV k-minimum set as ``applyInPandasWithState`` state —
    k longs per open window, regardless of stream cardinality (the
    exact-distinct streaming aggregate would hold every distinct value
    in the state store; at web-scale ingest that is the state-store
    OOM). Each micro-batch folds its hashes into the window's k-min
    set and re-emits the window's updated estimate (update mode), so
    the sink always holds the latest per-window estimate.

    The estimator is :func:`kmv_estimate`'s expression evaluated in
    Python over the same integers — exact below k, (k-1)*2^60/kth
    above — and a window's final state equals the batch-built sketch
    of the same rows (merge losslessness), which the test pins."""
    import json as _json

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    hashed = (stream_df
              .withWatermark(ts_col, watermark_delay)
              .select(F.window(F.col(ts_col), window).start
                      .alias("window_start"),
                      _hash60(F.col(col).cast("string"),
                              portable).alias("__h")))

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd
        mins = _json.loads(state.get[0]) if state.exists else []
        s = set(mins)
        for pdf in pdf_iter:
            s.update(int(h) for h in pdf["__h"])
        mins = sorted(s)[:k]
        state.update((_json.dumps(mins),))
        m = len(mins)
        est = float(m) if m < k else (k - 1) * _HASH_SPACE / float(mins[-1])
        yield pd.DataFrame({"window_start": [key[0]],
                            "n_distinct_est": [est]})

    return hashed.groupBy("window_start").applyInPandasWithState(
        fold, "window_start timestamp, n_distinct_est double",
        "state string", "update", GroupStateTimeout.NoTimeout)


# ---------------------------------------------------------------------------
# HDR-style log-histogram quantile sketch (mergeable, engine-portable)
# ---------------------------------------------------------------------------


def hdr_histogram(df: DataFrame, col: str, *, sig_digits: int = 2,
                  group_cols: Sequence[str] = ()) -> DataFrame:
    """Mergeable quantile sketch as a log-scaled histogram (the
    HdrHistogram recipe production latency monitoring runs on): bucket
    a positive value by (exponent = floor(log2(v)), mantissa quantized
    to ~``sig_digits`` decimal digits), count per bucket. Size is
    bounded by the VALUE RANGE (buckets ~ 64 * 10^sig_digits), not the
    row count, and two histograms merge by summing counts — the same
    at-rest/rollup story as :func:`kmv_sketch`, completing the sketch
    tier's third axis (distinct = KMV, frequency = MG/CMS, quantiles =
    this). Quantile error is bounded by bucket width: relative
    ~10^-sig_digits.

    Bucketing is pure integer/float arithmetic with one expression
    shape (floor(v / 2^e * 10^d) at fixed e), so an external engine
    rebuilds the same histogram bit-for-bit. One map-side-combinable
    groupBy; the shuffle carries (group, bucket) rows only.
    Non-positive values land in bucket (-2^31, 0) — a single underflow
    bin, like HdrHistogram's lowest trackable value."""
    scale = 10 ** sig_digits
    v = F.col(col).cast("double")
    # floor(log2(v)) with a one-step exactness correction: libm log2
    # is only ulp-accurate, which flips the floor at exact powers of
    # two and differs across engines; after the correction
    # 2^e <= v < 2^(e+1) holds EXACTLY (pow(2, int) and the divide by
    # it are exact IEEE operations), so the bucket id is engine-exact.
    e0 = F.floor(F.log2(v)).cast("int")
    p = F.pow(F.lit(2.0), e0.cast("double"))
    e = (e0 + F.when(p > v, -1)
         .when(p * F.lit(2.0) <= v, 1).otherwise(0)).cast("int")
    mant = F.floor(v / F.pow(F.lit(2.0), e.cast("double")) * scale)
    gs = [F.col(c) for c in group_cols]
    exp_b = F.when(v > 0, e).otherwise(F.lit(-(1 << 31)))
    man_b = F.when(v > 0, mant).otherwise(F.lit(0)).cast("long")
    return (df.select(*gs, exp_b.alias("exp"), man_b.alias("mant"))
            .groupBy(*group_cols, "exp", "mant")
            .agg(F.count(F.lit(1)).alias("n")))


def hdr_merge(histograms: DataFrame,
              group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge histogram rows sharing a group: sum counts per bucket —
    plain re-aggregation, the proof that the sketch is mergeable."""
    return (histograms.groupBy(*group_cols, "exp", "mant")
            .agg(F.sum("n").alias("n")))


def hdr_quantiles(hist: DataFrame, quantiles: Sequence[float], *,
                  sig_digits: int = 2,
                  group_cols: Sequence[str] = ()) -> DataFrame:
    """Quantile estimates from the histogram: walk the cumulative
    counts in bucket order and report each requested quantile's bucket
    LOWER BOUND (mant / scale * 2^exp) — a deterministic representative
    within the bucket's relative-error bound. One window cumsum over
    the (tiny) histogram plus a bounded explode of the quantile list;
    the raw data is never touched."""
    scale = float(10 ** sig_digits)
    gs = list(group_cols)
    w = (W.partitionBy(*[F.col(c) for c in gs]) if gs else
         W.partitionBy(F.lit(1)))
    wcum = w.orderBy("exp", "mant").rowsBetween(W.unboundedPreceding, 0)
    tot = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = (hist.withColumn("__cum", F.sum("n").over(wcum))
         .withColumn("__tot", F.sum("n").over(tot)))
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles]))
    qd = c.select(*gs, "exp", "mant", "__cum", "__tot", qs.alias("q"))
    # first bucket whose cumulative count reaches ceil(q * total)
    hit = qd.where(F.col("__cum") >= F.ceil(F.col("q") * F.col("__tot")))
    wmin = (W.partitionBy(*([F.col(c_) for c_ in gs] + [F.col("q")]))
            .orderBy("exp", "mant"))
    first = (hit.withColumn("__rn", F.row_number().over(wmin))
             .where(F.col("__rn") == 1))
    val = (F.col("mant").cast("double") / F.lit(scale)
           * F.pow(F.lit(2.0), F.col("exp").cast("double")))
    return first.select(*gs, "q", F.round(val, 6).alias("value_est"))


def streaming_heavy_hitters(stream_df: DataFrame, col: str, *,
                            threshold: float = 0.01,
                            window: str = "1 hour", ts_col: str = "ts",
                            watermark_delay: str = "10 minutes",
                            capacity: int | None = None) -> DataFrame:
    """Streaming frequent items per event-time window with BOUNDED
    state: a Misra-Gries summary (``capacity = ceil(2/threshold)``
    counters) as ``applyInPandasWithState`` state — the streaming twin
    of :func:`heavy_hitters`' pass 1. Each micro-batch folds its
    ``value_counts`` into the window's summary (sum + (cap+1)-th-
    largest decrement, the mergeable-summaries step) and re-emits the
    window's current candidates (update mode).

    Emitted ``mg_count`` is the classic MG LOWER bound: true count is
    within [mg_count, mg_count + n_window/(capacity+1)], and every
    value with true share >= threshold is guaranteed present. An exact
    recount (batch pass 2) can run offline against the closed window
    if exact counts are needed — the candidate set here is the
    expensive part at stream scale, and it is what stays bounded."""
    import json as _json
    import math as _math

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    cap = capacity or _math.ceil(2.0 / threshold)
    keyed = (stream_df
             .withWatermark(ts_col, watermark_delay)
             .select(F.window(F.col(ts_col), window).start
                     .alias("window_start"),
                     F.col(col).cast("string").alias("value")))

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd
        counters, n_total = (_json.loads(state.get[0])
                             if state.exists else ({}, 0))
        for pdf in pdf_iter:
            n_total += len(pdf)
            for v, c in pdf["value"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                top = sorted(counters.values(), reverse=True)
                delta = top[cap]
                counters = {v: c - delta for v, c in counters.items()
                            if c - delta > 0}
        state.update((_json.dumps([counters, n_total]),))
        if counters:
            vals = list(counters)
            yield pd.DataFrame({
                "window_start": [key[0]] * len(vals),
                "value": vals,
                "mg_count": [counters[v] for v in vals],
                "n_window": [n_total] * len(vals)})

    return keyed.groupBy("window_start").applyInPandasWithState(
        fold,
        "window_start timestamp, value string, mg_count long, "
        "n_window long",
        "state string", "update", GroupStateTimeout.NoTimeout)


def streaming_hdr_quantiles(stream_df: DataFrame, col: str, *,
                            quantiles: Sequence[float] = (0.5, 0.95, 0.99),
                            sig_digits: int = 2,
                            window: str = "1 hour", ts_col: str = "ts",
                            watermark_delay: str = "10 minutes"
                            ) -> DataFrame:
    """Streaming quantile estimates per event-time window with BOUNDED
    state — the third and last sketch axis's streaming form (distinct =
    :func:`streaming_kmv_distinct`, frequency =
    :func:`streaming_heavy_hitters`, quantiles = this): the HDR
    log-histogram as ``applyInPandasWithState`` state, size bounded by
    the VALUE RANGE (~64 * 10^sig_digits buckets per open window),
    never the row count — where the exact streaming percentile would
    buffer every value.

    Bucketing matches :func:`hdr_histogram` BIT-FOR-BIT: ``frexp``
    gives the floor-log2 exponent exactly (the Python twin of the
    batch expression's one-step correction — ``frexp(v) = (m, e)``
    with ``0.5 <= m < 1`` means ``floor(log2 v) = e-1`` with no libm
    wobble), and the mantissa quantization runs the identical IEEE
    divide/multiply/floor. So a window's final state IS the batch
    histogram of the same rows, and the emitted quantiles (bucket
    lower bounds at the first cumulative count reaching
    ``ceil(q * total)``) equal :func:`hdr_quantiles` on it — the
    fold-equality the test pins. Emits (window_start, q, value_est)
    per update, latest emission per window wins."""
    import json as _json
    import math as _math

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    scale = 10 ** sig_digits
    qs = [float(x) for x in quantiles]
    keyed = (stream_df
             .withWatermark(ts_col, watermark_delay)
             .select(F.window(F.col(ts_col), window).start
                     .alias("window_start"),
                     F.col(col).cast("double").alias("__v")))

    def bucket(v: float):
        if v > 0:
            _, e2 = _math.frexp(v)   # v = m * 2^e2, 0.5 <= m < 1
            e = e2 - 1               # = floor(log2(v)) exactly
            return e, _math.floor(v / (2.0 ** e) * scale)
        return -(1 << 31), 0

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd
        hist = ({tuple(_json.loads(k)): n
                 for k, n in _json.loads(state.get[0]).items()}
                if state.exists else {})
        for pdf in pdf_iter:
            for v in pdf["__v"]:
                b = bucket(float(v))
                hist[b] = hist.get(b, 0) + 1
        state.update((_json.dumps(
            {_json.dumps(k): n for k, n in hist.items()}),))
        total = sum(hist.values())
        order = sorted(hist)
        out_q, out_v = [], []
        for q in qs:
            need = _math.ceil(q * total)
            cum = 0
            for (e, mant) in order:
                cum += hist[(e, mant)]
                if cum >= need:
                    out_q.append(q)
                    out_v.append(round(mant / scale * (2.0 ** e), 6))
                    break
        yield pd.DataFrame({"window_start": [key[0]] * len(out_q),
                            "q": out_q, "value_est": out_v})

    return keyed.groupBy("window_start").applyInPandasWithState(
        fold, "window_start timestamp, q double, value_est double",
        "state string", "update", GroupStateTimeout.NoTimeout)


# ---------------------------------------------------------------------------
# Robust statistics (median / MAD outlier sweep)
# ---------------------------------------------------------------------------


def mad_outlier_report(df: DataFrame, col: str, *,
                       group_cols: Sequence[str] = (),
                       cutoff: float = 3.0,
                       approx: bool = False) -> DataFrame:
    """Robust per-group outlier sweep on median/MAD instead of
    mean/sigma: ``score = |x - median| / (1.4826 * MAD)`` (1.4826
    scales MAD to sigma under normality), flagging ``score > cutoff``.
    The z-score sweep this complements breaks down exactly when it
    matters — heavy outliers inflate mean AND sigma, masking
    themselves; the median/MAD pair has a 50% breakdown point, so one
    bad ingest batch can't hide another.

    Three passes over the data (median -> MAD -> flag/count), each a
    map-side-combinable aggregate with the tiny per-group stats
    broadcast back — the same two-pass shape as the z-score sweep plus
    one. ``approx=False`` (the audited/oracle-replayable default) uses
    exact sort-based ``percentile``; ``approx=True`` is the 100 TB
    SCALE FORM — ``percentile_approx`` (KLL-style bounded-memory
    sketch, same plan shape, no per-group sort) — or serve the medians
    from the at-rest HDR index. Intermediate median/MAD are quantized
    to 6 decimals before re-entering arithmetic so the chained
    computation replays identically in an external engine.

    Returns (group..., med, mad, n, n_outliers, outlier_frac,
    max_score); mad == 0 (majority-constant groups) yields NULL
    scores rather than infinities."""
    gs = list(group_cols)
    v = F.col(col)
    pct = "approx_percentile" if approx else "percentile"
    med = (df.groupBy(*gs)
           .agg(F.round(F.expr(f"{pct}({col}, 0.5)"), 6)
                .alias("med")))
    with_med = df.join(F.broadcast(med), gs) if gs else \
        df.crossJoin(F.broadcast(med))
    mad = (with_med.groupBy(*gs, "med")
           .agg(F.round(F.expr(
               f"{pct}(abs({col} - med), 0.5)"), 6).alias("mad")))
    with_mad = df.join(F.broadcast(mad), gs) if gs else \
        df.crossJoin(F.broadcast(mad))
    dev = F.abs(v - F.col("med"))
    score = F.when(F.col("mad") > 0,
                   F.round(dev / (F.lit(1.4826) * F.col("mad")), 6))
    return (with_mad
            .groupBy(*gs, "med", "mad")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(score > cutoff, 1).otherwise(0))
                 .alias("n_outliers"),
                 F.round(F.max(score), 4).alias("max_score"))
            .withColumn("outlier_frac",
                        F.round(F.col("n_outliers")
                                / F.col("n").cast("double"), 6)))
