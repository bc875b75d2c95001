"""Corpus-pipeline operators: deterministic splits and decontamination.

The two bookkeeping operations every training-data pipeline needs around
dedup/filtering: assigning each document to a train/val/test split
*reproducibly* (same corpus + same salt => same split, regardless of
partitioning, cluster size, or row order), and checking that no test
document leaks into train via shared n-grams (decontamination).

Both are pure JVM column expressions + joins — no UDFs, no shuffles
beyond the ones the semantics require.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventstorm_spark.extensions.dedup import shingle_rows

_U32 = float(1 << 32)


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) per id: first 8 hex chars of
    md5(id ':' salt) as a 32-bit integer, scaled. Engine-portable (md5
    hex is standard everywhere, unlike xxhash64 seeds), so the oracle
    reproduces it bit-for-bit; salt-stable so a pipeline re-run assigns
    identical splits."""
    h = F.substring(F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(salt))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(_U32)


def assign_splits(docs: DataFrame, *,
                  weights: Mapping[str, float] | None = None,
                  salt: str = "v1", id_col: str = "doc_id") -> DataFrame:
    """Add a ``split`` column by hash-bucketing each id into the weighted
    cumulative ranges. Embarrassingly parallel (a projection — zero
    shuffles, survives any repartitioning), and deterministic under the
    salt: growing the corpus never reassigns an existing id, which is
    what makes incremental pipeline re-runs safe."""
    weights = dict(weights or {"train": 0.98, "val": 0.01, "test": 0.01})
    total = sum(weights.values())
    u = _unit_hash(F.col(id_col), salt)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", expr)


def assign_splits_grouped(docs: DataFrame, clusters: DataFrame, *,
                          weights: Mapping[str, float] | None = None,
                          salt: str = "v1", id_col: str = "doc_id",
                          cluster_col: str = "cluster_id") -> DataFrame:
    """LEAKAGE-SAFE split assignment: hash the duplicate-CLUSTER label
    instead of the document id, so near-duplicate documents can never
    straddle train/test — the eval-leakage bug that per-doc hashing
    (:func:`assign_splits`) cannot prevent (a test doc's near-copy in
    train inflates every downstream metric; group-wise splitting is the
    standard fix, cf. sklearn's GroupKFold).

    ``clusters`` is ``(id_col, cluster_col)`` — e.g. the output of
    ``dedup.duplicate_clusters`` — mapping every doc to its near-dup
    component's label (singletons to themselves). Docs absent from
    ``clusters`` fall back to their own id, so a clusters frame covering
    only the paired subset works too. The split is a pure function of
    (cluster label, salt, weights): growing the corpus never reassigns
    an existing cluster, and every member of a cluster lands in the
    same split by construction.

    Scale shape: one equi-join on ``id_col`` (at 100 TB the clusters
    frame is corpus-keyed but two columns wide — co-partition or bucket
    both sides on the id; the hash bucketing itself stays a projection,
    zero extra shuffles)."""
    lab = clusters.select(
        F.col(id_col),
        F.col(cluster_col).alias("_split_group"))
    out = (docs.join(lab, id_col, "left")
           .withColumn("_split_group",
                       F.coalesce(F.col("_split_group"), F.col(id_col))))
    out = assign_splits(out, weights=weights, salt=salt,
                        id_col="_split_group")
    return out.drop("_split_group")


def split_contamination(train: DataFrame, test: DataFrame, *, n: int = 5,
                        min_common: int = 1, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(train_id, test_id, n_common) for every train/test pair sharing
    >= ``min_common`` word n-gram shingles — the decontamination report.

    The join key is the shingle and the *test* side is broadcast: test
    sets are small by construction, so the 100 TB train corpus streams
    through a map-side hash join — no shuffle of train ever happens, and
    the only exchange is the final candidate-pair-sized groupBy. Raise
    ``n`` to sharpen precision (8-grams are the common contamination
    standard); raise ``min_common`` to ignore idiomatic collisions."""
    tr = (shingle_rows(train, n, text_col, id_col)
          .select(F.col("id").alias("train_id"), "shingle"))
    te = (shingle_rows(test, n, text_col, id_col)
          .select(F.col("id").alias("test_id"), "shingle"))
    return (
        tr.join(F.broadcast(te), "shingle")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def quality_bucket_sample(docs_scored: DataFrame, rates: list[float], *,
                          score_col: str = "avg_logprob",
                          salt: str = "quality-v1",
                          id_col: str = "doc_id") -> DataFrame:
    """Quality-aware mixture sampling: cut the corpus into
    ``len(rates)`` quality buckets by score quantiles and keep each
    document with its bucket's probability — the standard move for
    upweighting high-quality text in a training mix while retaining a
    deterministic slice of the tail.

    Scale shape: bucket boundaries come from ONE tiny exact-percentile
    aggregate (map-side-combinable buffers, a 1-row broadcast back), so
    the corpus itself never shuffles or globally sorts — bucket
    assignment and the salted keep-decision are row-local expressions.
    The keep decision is the same salted unit hash as
    :func:`stratified_sample`: reproducible across engines, partitions
    and corpus growth. Cutoffs are rounded to 6 decimals so an external
    SQL oracle computes identical bucket edges.

    Returns the scored frame with ``quality_bucket`` (1 = lowest
    quality) and ``kept`` columns; filter on ``kept`` for the sample.
    """
    n = len(rates)
    if n < 2:
        raise ValueError("need at least 2 buckets")
    ps = [i / n for i in range(1, n)]
    cuts = docs_scored.agg(*[
        F.round(F.expr(f"percentile({score_col}, {p})"), 6).alias(f"__q{i}")
        for i, p in enumerate(ps)])
    bucket = F.lit(1)
    for i in range(n - 1):
        bucket = bucket + (F.col(score_col) > F.col(f"__q{i}")).cast("int")
    rate: Column = F.lit(float(rates[-1]))
    for i in range(n - 1, 0, -1):
        rate = F.when(bucket == i, float(rates[i - 1])).otherwise(rate)
    u = _unit_hash(F.col(id_col), salt)
    return (docs_scored.crossJoin(F.broadcast(cuts))
            .withColumn("quality_bucket", bucket)
            .withColumn("kept", u < rate)
            .drop(*[f"__q{i}" for i in range(n - 1)]))


def temperature_mixture(docs: DataFrame, *, alpha: float = 0.3,
                        group_col: str = "lang",
                        text_col: str = "text") -> DataFrame:
    """Temperature-scaled mixture weights (the mT5/XLM-R sampling rule):
    a group's sampling probability is its corpus token share raised to
    ``alpha`` and renormalized — ``alpha`` < 1 upweights small
    domains/languages so the head domains don't drown them, ``alpha=1``
    is natural sampling, ``alpha=0`` uniform.

    Scale shape: one map-side-combinable (group, token-count) aggregate
    over the corpus scan; the group table is bounded by group
    cardinality (languages/domains — tens, not millions), so the share
    and renormalization passes are two 1-row broadcast aggregates over
    a tiny frame. Shares and probabilities round to 6 decimals so the
    SQL oracle reproduces them exactly.
    """
    from eventstorm_spark.extensions.text import token_count

    g = (docs.select(F.col(group_col).alias("grp"),
                     token_count(F.col(text_col)).alias("__n"))
         .groupBy("grp")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("__n").alias("n_tokens")))
    # g is group-cardinality-sized; pin it so the corpus scan + group
    # aggregate run ONCE (it feeds the total, the normalizer and the
    # output — unpinned, Spark recomputes the scan per consumer).
    g = g.localCheckpoint(eager=False)
    total = g.agg(F.sum("n_tokens").alias("__t"))
    shared = (g.crossJoin(F.broadcast(total))
              .withColumn("__share", F.col("n_tokens") / F.col("__t")))
    shared = shared.localCheckpoint(eager=False)  # feeds z AND the output
    z = shared.agg(F.sum(F.pow("__share", F.lit(alpha))).alias("__z"))
    return (shared.crossJoin(F.broadcast(z))
            .select(
                F.col("grp").alias(group_col),
                "n_docs", "n_tokens",
                F.round("__share", 6).alias("corpus_share"),
                F.round(F.pow("__share", F.lit(alpha)) / F.col("__z"), 6)
                .alias("sample_prob")))


def stratified_sample(docs: DataFrame, rates: Mapping[str, float], *,
                      default_rate: float = 1.0, salt: str = "sample-v1",
                      strata_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-mixture
    operator: keep each document iff its salted unit hash falls under
    its stratum's rate. Zero shuffles (a projection + filter), exactly
    reproducible across runs/partitionings/engines, and — unlike
    ``DataFrame.sample`` — stable under corpus growth: a doc's keep
    decision never changes when other docs arrive, so mixtures can be
    re-materialized incrementally."""
    u = _unit_hash(F.col(id_col), salt)
    rate: Column = F.lit(float(default_rate))
    for name, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == name, float(r)).otherwise(rate)
    return docs.where(u < rate)


def cluster_balanced_sample(docs: DataFrame, embeddings: DataFrame, *,
                            n_clusters: int = 8,
                            target_per_cluster: int = 100,
                            centroids: list | None = None,
                            salt: str = "cluster-sample-v1",
                            id_col: str = "doc_id",
                            vec_col: str = "embedding",
                            vec_id_col: str = "vec_id") -> DataFrame:
    """Cluster-BALANCED downsampling: route documents to their nearest
    embedding centroid (the shared IVF cell router), then keep each
    document iff its salted unit hash falls under
    ``min(1, target_per_cluster / cluster_size)`` — flattening the
    semantic-cluster distribution the way :func:`stratified_sample`
    flattens source labels. This is the cluster-weighted sampling
    recipe (DoReMi/SemDeDup-style mixture design uses clusters, not
    source tags, as the strata).

    Fully declarative — no driver collect: per-cluster counts are a
    bounded aggregate broadcast-joined back, the rate is computed
    in-plan, and the keep rule is the same engine-portable md5 unit
    hash as every sampler here (growth-stable per cluster population:
    a doc's decision moves only if its CLUSTER's size changes, which
    is the point of balancing). ``centroids=None`` = deterministic
    lowest-id routing (oracle mode); pass ``kmeans_centroids(...)``
    at scale. Returns the kept docs with their ``cell``.
    """
    from eventstorm_spark.extensions.similarity import _ivf_cell_udf

    if centroids is not None:
        cents = [[float(x) for x in c] for c in centroids]
    else:
        rows = (embeddings.orderBy(vec_id_col).limit(n_clusters)
                .select(vec_col).collect())
        cents = [[float(x) for x in r[vec_col]] for r in rows]
    assign = embeddings.select(
        F.col(vec_id_col).alias(id_col),
        _ivf_cell_udf(cents)(F.col(vec_col)).alias("cell"))
    clustered = docs.join(assign, id_col)
    counts = (clustered.groupBy("cell")
              .agg(F.count(F.lit(1)).alias("__n")))
    rate = F.least(F.lit(1.0),
                   F.lit(float(target_per_cluster)) / F.col("__n"))
    return (clustered.join(F.broadcast(counts), "cell")
            .where(_unit_hash(F.col(id_col), salt) < rate)
            .drop("__n"))


def decontaminate(train: DataFrame, test: DataFrame, *, n: int = 5,
                  min_common: int = 1, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Drop every train document sharing >= ``min_common`` word n-grams
    with any test document — the removal step the
    :func:`split_contamination` report feeds. Left-anti join of train
    against the contaminated-id set; train payloads shuffle only by the
    join key of the anti join, and the contaminated set is bounded by
    the (small) test set's reach, so AQE broadcasts it in practice."""
    bad = (split_contamination(train, test, n=n, min_common=min_common,
                               text_col=text_col, id_col=id_col)
           .select(F.col("train_id").alias(id_col)).distinct())
    return train.join(bad, id_col, "left_anti")


def decontaminate_bloom(train: DataFrame, test: DataFrame, *, n: int = 5,
                        m_bits: int = 1 << 22, text_col: str = "text",
                        id_col: str = "doc_id",
                        portable: bool = False) -> DataFrame:
    """Bloom-style decontamination — the broadcast-budget scale path of
    :func:`decontaminate`. The exact form broadcasts the test side's
    shingle STRINGS; on a large benchmark suite that broadcast is tens
    of n-gram bytes per shingle. This variant broadcasts only the
    DISTINCT HASH SLOTS ``hash(shingle) mod m_bits`` — 8 bytes each,
    deduped — and drops every train doc with any shingle landing in a
    test slot. It is a single-hash (k=1) Bloom filter realized
    relationally: build = project+distinct on the test side, probe = a
    broadcast LEFT SEMI join, all JVM-side whole-stage codegen (no bit
    array in the plan, no UDF — Spark's ``bloom_filter_agg`` internals
    aren't SQL-registered, and a Python-side bitmap would put md5 on
    the corpus hot path).

    Guarantee: NO FALSE KEEPS — every doc the exact
    ``decontaminate(min_common=1)`` would drop is dropped here too
    (hashing is deterministic, so a shared shingle always collides
    into the same slot). False DROPS are slot collisions: a clean doc
    with s shingles is lost with probability <= s x |test_slots| /
    m_bits — size ``m_bits`` so that product stays small (default 4M
    slots vs a typical <=1M-shingle test set -> ~2% corpus loss at
    s = 100, linearly less with bigger m). Conservative losses are the
    right failure mode for decontamination.

    ``portable=True`` swaps xxhash64 for the md5-based
    ``portable_hash60`` so a SQL oracle replays the exact drop set."""
    from eventstorm_spark.extensions.dedup import portable_hash60

    h = (lambda c: portable_hash60(c)) if portable else \
        (lambda c: F.xxhash64(c))
    slot = lambda c: F.pmod(h(c), F.lit(int(m_bits)))  # noqa: E731
    te_slots = (shingle_rows(test, n, text_col, id_col)
                .select(slot(F.col("shingle")).alias("slot")).distinct())
    tr = (shingle_rows(train, n, text_col, id_col)
          .select(F.col("id"), slot(F.col("shingle")).alias("slot")))
    bad = (tr.join(F.broadcast(te_slots), "slot", "left_semi")
           .select(F.col("id").alias(id_col)).distinct())
    return train.join(bad, id_col, "left_anti")


def streaming_decontaminate(stream_docs: DataFrame, test: DataFrame, *,
                            n: int = 5, m_bits: int = 1 << 22,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            portable: bool = False) -> DataFrame:
    """Continuous form of :func:`decontaminate_bloom` for a live ingest
    feed: drop every streamed doc sharing an n-gram hash slot with the
    (static) benchmark suite. Per micro-batch this is a stream-static
    LEFT ANTI join of the doc's exploded shingle slots against the
    broadcast-scale distinct test-slot table — STATELESS (nothing
    accumulates in the state store, no watermark needed: the test side
    is static and the decision is per-document), so it composes before
    the stateful dedup/window stages of an ingest pipeline. The test
    side is re-read per micro-batch (stream-static semantics), so a
    benchmark suite that grows between batches is honored without
    restart. Same no-false-keep / bounded-false-drop contract as the
    batch form.

    Implementation note: the per-doc "any shingle hits a slot"
    existence test can't be a two-step (semi-join to ids, then anti
    join back) on a stream — that's a stream-stream self-join. Instead
    each doc's shingle SLOTS are collected row-locally into an array
    column and the drop test is ``arrays_overlap`` against the
    (re-read, aggregated) test slot array: one broadcast scalar array,
    zero shuffles of the stream."""
    from eventstorm_spark.extensions.dedup import portable_hash60

    h = (lambda c: portable_hash60(c)) if portable else \
        (lambda c: F.xxhash64(c))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    slots = F.array_distinct(
        F.transform(grams, lambda g: F.pmod(h(g), F.lit(int(m_bits)))))
    te_slots = (shingle_rows(test, n, text_col, id_col)
                .select(F.pmod(h(F.col("shingle")),
                               F.lit(int(m_bits))).alias("slot"))
                .agg(F.collect_set("slot").alias("__test_slots")))
    tagged = (stream_docs.withColumn("__slots", slots)
              .crossJoin(F.broadcast(te_slots)))
    return (tagged.where(~F.arrays_overlap(F.col("__slots"),
                                           F.col("__test_slots")))
            .drop("__slots", "__test_slots"))


def epoch_plan(docs: DataFrame, *, alpha: float = 0.5,
               token_budget: int = 1_000_000,
               group_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """Per-source repetition plan for a token budget: temperature-scaled
    target shares (share^alpha renormalized — the same rule as
    :func:`temperature_mixture`) times the budget give each source's
    target token count; ``epochs`` = target / available is the
    repetition factor the loader applies (>1 = repeat, <1 = subsample).
    The published-mixture-table computation (LLaMA-style) as one
    group-cardinality-bounded plan: a single corpus token aggregate,
    then 1-row broadcast normalizations.
    """
    from eventstorm_spark.extensions.text import token_count

    g = (docs.select(F.col(group_col).alias("grp"),
                     token_count(F.col(text_col)).alias("__n"))
         .groupBy("grp").agg(F.sum("__n").alias("n_tokens")))
    g = g.localCheckpoint(eager=False)
    total = g.agg(F.sum("n_tokens").alias("__t"))
    shared = (g.crossJoin(F.broadcast(total))
              .withColumn("__share", F.col("n_tokens") / F.col("__t")))
    shared = shared.localCheckpoint(eager=False)
    z = shared.agg(F.sum(F.pow("__share", F.lit(alpha))).alias("__z"))
    return (shared.crossJoin(F.broadcast(z))
            .withColumn("__p", F.pow("__share", F.lit(alpha)) / F.col("__z"))
            .select(F.col("grp").alias(group_col),
                    "n_tokens",
                    F.round(F.col("__p") * token_budget, 2)
                    .alias("target_tokens"),
                    F.round(F.col("__p") * token_budget / F.col("n_tokens"),
                            6).alias("epochs")))


def curriculum_order(docs_scored: DataFrame, *, n_stages: int = 4,
                     score_col: str = "avg_logprob",
                     salt: str = "curriculum-v1",
                     id_col: str = "doc_id") -> DataFrame:
    """Quality-curriculum ordering: cut the corpus into ``n_stages``
    score-quantile stages (1 = lowest quality, presented last when
    training easy-to-hard from stage N down — or invert at the loader),
    with a deterministic salted shuffle WITHIN each stage
    (``order_key`` = the salted unit hash). Sorting by
    (stage, order_key) is reproducible across runs, partitionings and
    engines, and growth-stable per doc. One tiny exact-percentile
    aggregate (1-row broadcast back); everything else is row-local."""
    n = n_stages
    if n < 2:
        raise ValueError("need at least 2 stages")
    ps = [i / n for i in range(1, n)]
    cuts = docs_scored.agg(*[
        F.round(F.expr(f"percentile({score_col}, {p})"), 6).alias(f"__q{i}")
        for i, p in enumerate(ps)])
    stage = F.lit(1)
    for i in range(n - 1):
        stage = stage + (F.col(score_col) > F.col(f"__q{i}")).cast("int")
    u = _unit_hash(F.col(id_col), salt)
    return (docs_scored.crossJoin(F.broadcast(cuts))
            .withColumn("stage", stage)
            .withColumn("order_key", F.round(u, 9))
            .drop(*[f"__q{i}" for i in range(n - 1)]))


def apply_epoch_plan(docs: DataFrame, plan: DataFrame, *,
                     salt: str = "epochs-v1", group_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Materialize an :func:`epoch_plan`: each document appears
    ``floor(epochs)`` times plus one more copy with probability
    ``frac(epochs)``, decided by the salted unit hash — so the
    materialized mixture hits the planned token targets in expectation
    with a deterministic, growth-stable, engine-reproducible choice of
    which docs carry the fractional epoch.

    Scale shape: the plan table is group-cardinality-sized (AQE
    broadcasts it); replication is a row-local ``explode(sequence)``
    whose output volume IS the planned corpus size — the one cost that
    cannot be avoided, paid with zero shuffles. A ``copy`` column
    (1..n) keeps replicated rows distinguishable downstream."""
    j = docs.join(plan.select(group_col, "epochs"), group_col)
    base = F.floor("epochs").cast("int")
    frac = F.col("epochs") - F.floor("epochs")
    u = _unit_hash(F.col(id_col), salt)
    n_copies = base + (u < frac).cast("int")
    return (j.withColumn("__n", n_copies)
            .where(F.col("__n") > 0)
            .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("__n"))))
            .drop("__n", "epochs"))


def token_balanced_shards(docs: DataFrame, *, n_shards: int = 16,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Token-BALANCED shard assignment — the size-aware alternative to
    the salted-hash :func:`curation.assign_shards` (which balances doc
    COUNTS; long-tailed token lengths then skew shard token loads and
    with them training-loader throughput): documents are ranked by
    (n_tokens desc, id) and dealt round-robin, so each dealing round
    gives every shard exactly one of the next-largest docs — the
    streaming-friendly cousin of LPT scheduling, with per-shard token
    loads differing by at most the sum over rounds of that round's
    max−min gap (bounded in practice by the largest document).

    The global rank is the ONLY coordination, and it is the two-phase
    distributed form (range-partition by (−n_tokens, id) → rank within
    partitions → broadcast the O(partitions) offsets back), never an
    ``Exchange SinglePartition`` — the same idiom as
    ``packing.global_token_offsets``. Deterministic: ties rank by id.
    Returns (doc_id, n_tokens, shard)."""
    from pyspark.sql import Window as _W

    from eventstorm_spark.extensions.text import token_count

    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism

    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"))
    part = (sized.withColumn("__neg", -F.col("n_tokens"))
            .repartitionByRange(n_parts, "__neg", "doc_id")
            .sortWithinPartitions("__neg", "doc_id")
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = run
        run += r["c"]
    if not offsets:
        return part.select("doc_id", "n_tokens",
                           F.lit(0).cast("int").alias("shard"))
    off_map = F.create_map(
        *[F.lit(v) for pid, off in offsets.items() for v in (pid, off)])
    w = _W.partitionBy("__pid").orderBy("__neg", "doc_id")
    rank0 = F.row_number().over(w) - 1 + off_map[F.col("__pid")]
    return part.select(
        "doc_id", "n_tokens",
        F.pmod(rank0, F.lit(n_shards)).cast("int").alias("shard"))


def weighted_sample(docs: DataFrame, *, k: int = 20,
                    weight_col: str = "n_chars",
                    group_cols: tuple = ("source",),
                    salt: str = "ws1", id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per group
    (Efraimidis-Spirakis A-ES): each row draws u = unit-hash(id, salt)
    and is ranked by key = u^(1/w) — equivalently ln(u)/w, the monotone
    form used here — and the k largest keys per group are the sample.
    Inclusion probability is proportional to weight, exactly the
    token-budget-proportional document draw a mixture builder needs,
    yet the sample is a pure function of (id, salt, weight): re-runs
    reproduce it, the oracle replays it, and growing the corpus only
    displaces rows that genuinely lose the comparison.

    Plan: a projection plus one per-group top-k window — the sample
    never materializes the full sort at the driver. Groups here are
    source-cardinality (bounded); for a single mega-group route through
    the salted two-phase bottom-k of ``sketches._bottom_k`` with the
    key negated. Rows with weight <= 0 are excluded (their inclusion
    probability is zero, and ln(u)/w would flip sign)."""
    from pyspark.sql import Window as W

    gs = [F.col(c) for c in group_cols]
    # (h+1)/2^32 keeps u in (0, 1]: ln(0) is null in Spark and an
    # error class in some engines; u=1 -> key 0 (top) at prob 2^-32
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(salt))), 1, 8), 16, 10).cast("double")
    u = (h + F.lit(1.0)) / F.lit(_U32)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = W.partitionBy(*gs).orderBy(F.desc("__key"), F.col(id_col))
    return (docs.where(F.col(weight_col) > 0)
            .withColumn("__key", key)
            .withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k)
            .drop("__key"))


def expect(df: DataFrame, checks: "dict[str, Column]") -> DataFrame:
    """Data-quality assertion gate (the Great-Expectations-shaped
    read): evaluate named boolean predicate columns over one scan and
    report, per check, row count, violation count and violation rate
    — the go/no-go table an ingest publishes before a snapshot is
    promoted. ``checks`` maps check name -> a Column that is TRUE when
    the row PASSES (NULL counts as a violation — an unevaluable check
    is a failing check).

    One map-side-combinable aggregate for ALL checks (each compiles to
    a conditional sum — no per-check scans), then an unpivot to the
    report shape; cross-table rules (referential containment) are a
    left join producing just another boolean column upstream. At any
    scale this is one pass over the fact table."""
    if not checks:
        raise ValueError("expect() needs at least one check")
    aggs = []
    for i, col in enumerate(checks.values()):
        # positional aliases: check names are labels (may contain
        # dots/spaces), not identifiers
        aggs.append(F.sum(F.when(~F.coalesce(col, F.lit(False)), 1)
                          .otherwise(0)).alias(f"__v_{i}"))
    totals = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    # check names are arbitrary labels interpolated as SQL string
    # literals — escape backslashes first (Spark's default
    # escapedStringLiterals=false treats \ as an escape, so a name
    # ending in "\" would swallow the closing quote), then quotes,
    # so names like "isn't null" or "path \" can't break or alter
    # the generated stack() expression
    def _sql_quote(name: str) -> str:
        return name.replace("\\", "\\\\").replace("'", "''")

    pairs = ", ".join(f"'{_sql_quote(n)}', __v_{i}"
                      for i, n in enumerate(checks))
    report = totals.selectExpr(
        "__n", f"stack({len(checks)}, {pairs}) AS (check, n_violations)")
    return (report.select(
        F.col("check"),
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.round(F.col("n_violations") / F.col("__n").cast("double"), 6)
        .alias("violation_rate"))
        .orderBy("check"))
