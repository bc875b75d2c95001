"""Corpus curation & reporting operators for large-scale training data.

The bookkeeping layer AROUND the transform operators (dedup/filter/
pack): sharding a corpus into balanced output files, auditing padding
efficiency of a packing configuration, deduplicating a NEW crawl
snapshot against the existing at-rest corpus, and the dataset-card
reports (vocabulary coverage, per-source composition, per-column
profile) that every 100 TB pipeline publishes next to the data.

Scale shape shared by everything here: per-document decisions are pure
JVM column expressions (salted md5 unit hashes — engine-portable, so
the DuckDB oracle replays them bit-for-bit; growth-stable, so re-runs
never reassign existing docs), and the only shuffles are aggregations
whose group cardinality is bounded (shards, buckets, sources, columns)
or vocabulary-sized — never corpus-sized joins, never driver collects.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventstorm_spark.extensions.pipeline import _unit_hash
from eventstorm_spark.extensions.text import token_count
from eventstorm_spark.localframe import local_frame


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------

def assign_shards(docs: DataFrame, *, n_shards: int = 16,
                  salt: str = "shard-v1", id_col: str = "doc_id") -> DataFrame:
    """Add a ``shard`` column: floor(unit_hash(id) * n_shards).

    The writer-side partitioner for training shards. A pure projection —
    zero shuffles — and deterministic under the salt: a document's shard
    never changes as the corpus grows, so incremental re-materialization
    only appends to shards, and any engine (the DuckDB oracle included)
    reproduces the routing bit-for-bit. Balanced to the law of large
    numbers: each shard gets ~1/n of the corpus regardless of id gaps,
    unlike ``doc_id % n`` which inherits upstream id skew.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    u = _unit_hash(F.col(id_col), salt)
    return docs.withColumn(
        "shard", F.floor(u * F.lit(float(n_shards))).cast("int"))


def shard_manifest(docs: DataFrame, *, n_shards: int = 16,
                   salt: str = "shard-v1", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-shard manifest: (shard, n_docs, n_tokens, min_id, max_id).

    The dataset-card table published next to sharded training data so
    loaders can plan epochs without scanning payloads. One map-side-
    combinable aggregate over the corpus scan; output is n_shards rows.
    """
    return (assign_shards(docs, n_shards=n_shards, salt=salt, id_col=id_col)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_count(F.col(text_col))).alias("n_tokens"),
                 F.min(id_col).alias("min_id"),
                 F.max(id_col).alias("max_id")))


def write_training_shards(docs: DataFrame, path: str, *, n_shards: int = 16,
                          salt: str = "shard-v1", id_col: str = "doc_id") -> None:
    """Materialize the corpus as ``path/shard=K/*.parquet``.

    ``partitionBy("shard")`` makes the shard a partition column, so a
    loader reading one shard is a partition-pruned scan (no file listing
    of the other shards' data). ``repartition("shard")`` first so each
    shard is written by the task that owns it — one file per shard
    instead of n_tasks x n_shards small files, the classic 100 TB
    small-files trap.
    """
    sharded = assign_shards(docs, n_shards=n_shards, salt=salt, id_col=id_col)
    (sharded.repartition(n_shards, "shard")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


# ---------------------------------------------------------------------------
# padding-efficiency audit
# ---------------------------------------------------------------------------

def length_bucket_report(docs: DataFrame, *, text_col: str = "text",
                         min_bucket: int = 16,
                         max_bucket: int = 4096) -> DataFrame:
    """Padding-efficiency report for length-bucketed batching.

    Buckets documents by whitespace-token length into power-of-two
    buckets (the dynamic-batching standard): bucket = the smallest
    power of two >= the doc's token count, clamped to
    [min_bucket, max_bucket]. For each bucket reports how many docs and
    real tokens it holds, the padded token total if every doc is padded
    to the bucket edge, and the resulting efficiency — the number a
    pipeline tunes bucket edges against before paying for a training
    run. Row-local bucket math + one bounded aggregate (<= 9 buckets
    here); the corpus never shuffles on anything wider than the bucket
    id. Bucket edges are explicit integer comparisons, not
    ``ceil(log2(n))`` — exact-power-of-two inputs make the float log
    ambiguous across engines, and the oracle must replay the bucketing
    bit-for-bit. Docs longer than ``max_bucket`` are clamped into the
    max bucket; their padded size is counted as ``greatest(bucket, n)``
    per doc (a clamped doc occupies its own length, it is truncated or
    windowed downstream, never negatively padded), so efficiency stays
    a true padding ratio in [.., 1] even for the clamp bucket.
    """
    if min_bucket < 1 or max_bucket < min_bucket:
        raise ValueError("need 1 <= min_bucket <= max_bucket")
    edges = []
    e = min_bucket
    while e < max_bucket:
        edges.append(e)
        e *= 2
    n = token_count(F.col(text_col))
    bucket: Column = F.lit(max_bucket).cast("long")
    for edge in reversed(edges):
        bucket = F.when(n <= edge, F.lit(edge).cast("long")).otherwise(bucket)
    return (docs.select(bucket.alias("bucket"), n.alias("__n"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__n").alias("n_tokens"),
                 F.sum(F.greatest(F.col("bucket"), F.col("__n")))
                 .alias("n_padded"))
            .withColumn("efficiency",
                        F.round(F.col("n_tokens") / F.col("n_padded"), 6)))


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) dedup
# ---------------------------------------------------------------------------

def dedup_against_corpus(new_docs: DataFrame, corpus: DataFrame, *,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Keep only the new-snapshot docs whose exact text digest does NOT
    already appear in the at-rest corpus, then drop intra-batch exact
    dups (keeping the min id) — the incremental-ingest dedup every
    recurring crawl needs.

    Scale shape: both sides reduce to (digest) keys before the
    left-anti join, so the join ships 16-byte digests, not payloads; the
    corpus side is pre-aggregated to distinct digests (map-side
    combine). At 100 TB the anti-join is a digest-keyed shuffle of the
    (much smaller) new batch against the corpus digest set — or, when
    the batch is small, AQE broadcasts the batch side of the join
    automatically. No hint is forced: both sides scale with data size.
    """
    new_keyed = new_docs.withColumn("__digest", F.md5(F.col(text_col)))
    corpus_digests = (corpus.select(F.md5(F.col(text_col)).alias("__digest"))
                      .distinct())
    novel = new_keyed.join(corpus_digests, "__digest", "left_anti")
    # intra-batch exact dedup: canonical = min id per digest. The join
    # is keyed on the digest ALONE (the id equality is a post-filter),
    # so every exchange in the tail — anti-join, groupBy, join-back —
    # shares the digest partitioning and Spark reuses one shuffle of
    # the batch instead of re-exchanging on a composite key.
    canon = (novel.groupBy("__digest")
             .agg(F.min(id_col).alias("__keep_id")))
    return (novel.join(canon, "__digest")
            .where(F.col(id_col) == F.col("__keep_id"))
            .drop("__digest", "__keep_id"))


def _write_index_meta(spark, path: str, meta: dict) -> None:
    """Persist an index's construction parameters as ``path/_meta`` (a
    1-row text file written through Spark, so it lands on whatever
    filesystem the index itself lives on). Probing or appending with
    different parameters than the index was built with silently yields
    wrong buckets/estimates — the meta file turns that into a hard
    error at read time."""
    import json

    (local_frame(spark, [(json.dumps(meta, sort_keys=True),)],
                           "value string")
     .coalesce(1).write.mode("overwrite")
     .text(os.path.join(path, "_meta")))


def _read_index_meta(spark, path: str) -> dict | None:
    """Load ``path/_meta``; None for a pre-meta index (validation is
    then skipped for backward compatibility). Only a missing path maps
    to None — any other read failure (permissions, corrupt file)
    propagates, because silently skipping validation there would make a
    transient filesystem error indistinguishable from a legacy index."""
    import json

    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.text(os.path.join(path, "_meta")).collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    return json.loads(rows[0][0]) if rows else None


def _check_index_meta(spark, path: str, expect: dict, kind: str) -> None:
    meta = _read_index_meta(spark, path)
    if meta is None:
        # Legacy pre-meta index, or a build that failed between the data
        # write and the meta write (the digest index writes data into
        # ``path`` itself, so its meta cannot be written first — a
        # partial build must be re-run). Warn rather than fail: the
        # caller may hold a healthy legacy index.
        import warnings

        warnings.warn(
            f"{kind} index at {path} has no _meta file; parameter "
            "validation skipped (legacy index, or a partial build — "
            "rebuild if the index writer did not complete)",
            stacklevel=3)
        return
    bad = {k: (meta.get(k), v) for k, v in expect.items()
           if meta.get(k) != v}
    if bad:
        detail = ", ".join(f"{k}: index={old!r} caller={new!r}"
                           for k, (old, new) in sorted(bad.items()))
        raise ValueError(
            f"{kind} index at {path} was built with different parameters "
            f"than the caller passed ({detail}); probe/append with the "
            "index's parameters or rebuild the index")


def write_digest_index(corpus: DataFrame, path: str, *,
                       text_col: str = "text", n_buckets: int = 64) -> None:
    """Persist the corpus's distinct content digests as a narrow at-rest
    index for incremental dedup.

    At 100 TB, re-hashing the full corpus text on every ingest is the
    dominant cost of :func:`dedup_against_corpus`; the index reduces the
    corpus side to a 16-byte-per-distinct-document parquet scan that
    never touches payloads again. Digests are hash-partitioned into
    ``bucket = pmod(xxhash64(digest), n_buckets)`` partition directories,
    so (a) appending a new snapshot's digests only writes the buckets it
    lands in and (b) a loader can co-partition both anti-join sides on
    the same bucket column. Same pattern as ``similarity.write_ivf_index``:
    the partition column does the pruning, the rows stay minimal.
    """
    digests = (corpus.select(F.md5(F.col(text_col)).alias("digest"))
               .distinct()
               .withColumn("bucket",
                           F.pmod(F.xxhash64("digest"),
                                  F.lit(n_buckets)).cast("int")))
    (digests.repartition(n_buckets, "bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(path))
    _write_index_meta(corpus.sparkSession, path,
                      {"kind": "digest", "n_buckets": n_buckets})


def dedup_against_digest_index(new_docs: DataFrame, spark, index_path: str, *,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """:func:`dedup_against_corpus` against a persisted
    :func:`write_digest_index` instead of the raw corpus: the anti-join's
    at-rest side is a digest-only scan (16 bytes/doc, no payloads), which
    is the shape a recurring ingest actually runs. Semantically identical
    to the corpus form — pinned by tests."""
    idx = spark.read.parquet(index_path).select("digest")
    new_keyed = new_docs.withColumn("__digest", F.md5(F.col(text_col)))
    novel = new_keyed.join(
        idx.withColumnRenamed("digest", "__digest"), "__digest", "left_anti")
    canon = (novel.groupBy("__digest")
             .agg(F.min(id_col).alias("__keep_id")))
    return (novel.join(canon, "__digest")
            .where(F.col(id_col) == F.col("__keep_id"))
            .drop("__digest", "__keep_id"))


def minhash_cross_pairs(new_docs: DataFrame, corpus: DataFrame, *,
                        num_hashes: int = 64, bands: int = 16, n: int = 3,
                        threshold: float = 0.8, text_col: str = "text",
                        id_col: str = "doc_id",
                        portable: bool = False) -> DataFrame:
    """Near-duplicate pairs (new_id, corpus_id, jaccard) BETWEEN two
    collections — the batch cross-snapshot near-dup check, exact-verified.

    Same two-stage shape as ``dedup.minhash_near_duplicates``, but the
    banded bucket join runs ACROSS the collections (new × corpus, never
    new × new or corpus × corpus), so the candidate volume is bounded by
    genuine cross-snapshot collisions. Verification computes the exact
    shingle Jaccard on candidate docs only, semi-join-pruned on both
    sides; ``portable=True`` switches all hashing to the md5 family so a
    SQL oracle replays the exact candidate set. For recurring ingests
    where the corpus side should not be re-shingled at all, use the
    at-rest :func:`write_minhash_index` + :func:`near_dup_against_index`
    instead (estimate-verified from stored signatures).
    """
    from eventstorm_spark.extensions.dedup import (
        band_buckets, minhash_signatures, with_shingles,
    )

    sigs_new = minhash_signatures(new_docs, num_hashes=num_hashes, n=n,
                                  text_col=text_col, id_col=id_col,
                                  portable=portable)
    sigs_old = minhash_signatures(corpus, num_hashes=num_hashes, n=n,
                                  text_col=text_col, id_col=id_col,
                                  portable=portable)
    b_new = (band_buckets(sigs_new, bands=bands, string_buckets=portable)
             .withColumnRenamed("id", "new_id"))
    b_old = (band_buckets(sigs_old, bands=bands, string_buckets=portable)
             .withColumnRenamed("id", "corpus_id"))
    cands = (b_new.join(b_old, ["band", "bucket"])
             .select("new_id", "corpus_id").distinct())
    new_cand = new_docs.join(
        cands.select(F.col("new_id").alias("cid")).distinct(),
        new_docs[id_col] == F.col("cid"), "left_semi")
    old_cand = corpus.join(
        cands.select(F.col("corpus_id").alias("cid")).distinct(),
        corpus[id_col] == F.col("cid"), "left_semi")
    sh_new = (with_shingles(new_cand, n, text_col, id_col)
              .select(F.col("id").alias("new_id"),
                      F.col("shingles").alias("sh_a")))
    sh_old = (with_shingles(old_cand, n, text_col, id_col)
              .select(F.col("id").alias("corpus_id"),
                      F.col("shingles").alias("sh_b")))
    return (cands.join(sh_new, "new_id").join(sh_old, "corpus_id")
            .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn("jaccard", F.round(
                F.col("common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("common")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("new_id", "corpus_id", "jaccard"))


def write_minhash_index(corpus: DataFrame, path: str, *,
                        num_hashes: int = 64, bands: int = 16, n: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """Persist the corpus's MinHash state as an at-rest NEAR-dup index:
    ``path/signatures`` (id + the H-long signature — H*8 bytes/doc) and
    ``path/buckets`` (banded LSH bucket keys, partitioned by band).

    The near-dup twin of :func:`write_digest_index`: a recurring ingest
    checks a new snapshot for near-duplicates by joining its banded
    buckets against the stored buckets and verifying candidates on the
    stored SIGNATURES — the corpus text is never re-shingled or even
    read. Banding uses the same ``dedup.band_buckets`` expression as the
    in-corpus candidate join, so at-rest and in-memory bucketing can
    never drift.
    """
    from eventstorm_spark.extensions.dedup import band_buckets, minhash_signatures

    # Meta first: the data lives in subdirectories, so writing the meta
    # up front can't be clobbered by the data writes — and a failure
    # mid-build leaves an index whose data reads fail loudly instead of
    # a valid-looking index that silently skips parameter validation.
    _write_index_meta(corpus.sparkSession, path,
                      {"kind": "minhash", "num_hashes": num_hashes,
                       "bands": bands, "n": n})
    sigs = minhash_signatures(corpus, num_hashes=num_hashes, n=n,
                              text_col=text_col, id_col=id_col)
    sigs = sigs.localCheckpoint(eager=False)  # feeds both writes
    sigs.write.mode("overwrite").parquet(os.path.join(path, "signatures"))
    # repartition by (band, bucket), not band alone: band cardinality is
    # the band count (16ish), which would cap the write at 16 tasks — a
    # bottleneck on a corpus-scale index. Hashing the bucket in keeps
    # full writer parallelism; each band directory gets one file per
    # task that holds rows of that band, bounded by the shuffle
    # parallelism rather than n_tasks x bands.
    (band_buckets(sigs, bands=bands)
     .repartition("band", "bucket")
     .write.mode("overwrite").partitionBy("band")
     .parquet(os.path.join(path, "buckets")))


def near_dup_against_index(new_docs: DataFrame, spark, index_path: str, *,
                           num_hashes: int = 64, bands: int = 16, n: int = 3,
                           threshold: float = 0.8, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs (new_id, corpus_id, est_jaccard) between a
    new snapshot and a :func:`write_minhash_index` corpus index.

    The new batch is shingled/hashed once; candidates come from the
    banded bucket join against the stored buckets (band+bucket keyed —
    only colliding bands ever meet), and verification is the MinHash
    estimate itself: the fraction of agreeing signature positions, read
    from the STORED corpus signatures. Scale shape: signatures are
    semi-joined down to candidate ids before the attach (the
    verify-candidates-only policy), the estimate's zip_with/filter
    higher-order functions run on candidate-sized rows only, and
    nothing here re-reads corpus text. The (num_hashes, bands, n)
    parameters are validated against the index's ``_meta`` file: a
    mismatch silently yields wrong buckets and an underestimated
    est_jaccard (position-wise agreement over signatures of different
    families reads as disagreement), so it is a hard error instead.
    """
    from eventstorm_spark.extensions.dedup import band_buckets, minhash_signatures

    _check_index_meta(spark, index_path,
                      {"kind": "minhash", "num_hashes": num_hashes,
                       "bands": bands, "n": n}, "minhash")
    sigs_new = minhash_signatures(new_docs, num_hashes=num_hashes, n=n,
                                  text_col=text_col, id_col=id_col)
    sigs_new = sigs_new.localCheckpoint(eager=False)  # banding + verify
    banded_new = band_buckets(sigs_new, bands=bands)
    buckets = spark.read.parquet(os.path.join(index_path, "buckets")) \
        .withColumnRenamed("id", "corpus_id")
    cand = (banded_new.withColumnRenamed("id", "new_id")
            .join(buckets, ["band", "bucket"])
            .select("new_id", "corpus_id").distinct())
    sigs_old = spark.read.parquet(os.path.join(index_path, "signatures"))
    # verify-candidates-only: prune both signature tables to candidate
    # ids before attaching (never join a corpus-sized build side)
    old_pruned = sigs_old.join(
        cand.select(F.col("corpus_id").alias("id")).distinct(),
        "id", "left_semi").withColumnRenamed("signature", "__sig_old")
    new_pruned = sigs_new.join(
        cand.select(F.col("new_id").alias("id")).distinct(),
        "id", "left_semi").withColumnRenamed("signature", "__sig_new")
    agree = F.size(F.filter(
        F.zip_with("__sig_new", "__sig_old",
                   lambda x, y: (x == y).cast("int")),
        lambda v: v == 1))
    return (cand
            .join(new_pruned.withColumnRenamed("id", "new_id"), "new_id")
            .join(old_pruned.withColumnRenamed("id", "corpus_id"), "corpus_id")
            .withColumn("est_jaccard",
                        F.round(agree / F.lit(float(num_hashes)), 6))
            .where(F.col("est_jaccard") >= threshold)
            .select("new_id", "corpus_id", "est_jaccard"))


def write_winnow_index(corpus: DataFrame, path: str, *,
                       n: int = 3, window: int = 4, n_buckets: int = 64,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> None:
    """Persist the corpus's winnowing fingerprints as an at-rest
    SUBSTRING-overlap index: distinct (doc_id, fingerprint) rows,
    hash-partitioned into ``bucket = pmod(xxhash64(fingerprint),
    n_buckets)`` partition directories.

    The substring-level rung of the at-rest index ladder (digest index =
    exact, MinHash index = whole-doc near-dup, this = shared-passage):
    a recurring ingest checks new documents for copied runs by joining
    their fingerprints against the stored ones —
    :func:`overlap_against_index` — without ever re-tokenizing or
    re-fingerprinting the corpus. Winnowing is per-document local
    (``text.winnow_fingerprints``), so at-rest fingerprints are
    byte-identical to what an in-memory :func:`text.winnow_matches` over
    the union would compute — which is what makes exact parity testable.
    Fingerprint density ~2/(window+1) of corpus tokens bounds the index
    size; rows are (id, 8-byte hash). The bucket partition column gives
    appends bucket-dir locality and lets a loader co-partition probe
    joins; (n, window) land in ``_meta`` because fingerprints from a
    different shingle size or window silently never collide.
    """
    from eventstorm_spark.extensions.text import winnow_fingerprints

    # Meta first — data lives in path/fingerprints, so the meta write
    # can't be clobbered; a mid-build failure fails loudly on data read.
    _write_index_meta(corpus.sparkSession, path,
                      {"kind": "winnow", "n": n, "window": window,
                       "n_buckets": n_buckets})
    fp = (winnow_fingerprints(corpus, n=n, window=window,
                              text_col=text_col, id_col=id_col)
          .select("doc_id", "fingerprint").distinct()
          .withColumn("bucket",
                      F.pmod(F.xxhash64("fingerprint"),
                             F.lit(n_buckets)).cast("int")))
    (fp.repartition(n_buckets, "bucket")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(path, "fingerprints")))


def overlap_against_index(new_docs: DataFrame, spark, index_path: str, *,
                          n: int = 3, window: int = 4, min_shared: int = 2,
                          max_fingerprint_df: int | None = None,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Substring-overlap pairs (new_id, corpus_id, n_shared) between a
    new snapshot and a :func:`write_winnow_index` corpus index — the
    cross-snapshot form of :func:`text.winnow_matches`, with the corpus
    side read as stored fingerprints (the corpus text is never
    re-tokenized).

    The new batch fingerprints once; the join is blocked on the
    fingerprint value, so disjoint documents never meet. The winnowing
    guarantee carries over verbatim: any token run of length >=
    window + n - 1 shared between a new doc and a corpus doc produces
    at least one shared fingerprint, so no qualifying overlap is ever
    missed. ``max_fingerprint_df`` is the same hot-fingerprint skew
    guard as :func:`text.winnow_matches`, applied to the COMBINED
    document frequency (stored + new) so a boilerplate passage saturated
    on either side is capped; parameters validate against ``_meta``
    (mismatched (n, window) fingerprints silently never collide, so a
    mismatch is a hard error, not an empty result)."""
    from eventstorm_spark.extensions.text import winnow_fingerprints

    _check_index_meta(spark, index_path,
                      {"kind": "winnow", "n": n, "window": window},
                      "winnow")
    fp_new = (winnow_fingerprints(new_docs, n=n, window=window,
                                  text_col=text_col, id_col=id_col)
              .select(F.col("doc_id").alias("new_id"), "fingerprint")
              .distinct())
    fp_old = (spark.read.parquet(os.path.join(index_path, "fingerprints"))
              .select(F.col("doc_id").alias("corpus_id"), "fingerprint"))
    if max_fingerprint_df is not None:
        df_all = (fp_old.select("fingerprint")
                  .unionByName(fp_new.select("fingerprint"))
                  .groupBy("fingerprint")
                  .agg(F.count(F.lit(1)).alias("__df"))
                  .where(F.col("__df") <= max_fingerprint_df)
                  .select("fingerprint"))
        fp_old = fp_old.join(df_all, "fingerprint", "left_semi")
        fp_new = fp_new.join(df_all, "fingerprint", "left_semi")
    return (fp_new.join(fp_old, "fingerprint")
            .groupBy("new_id", "corpus_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def append_winnow_index(new_docs: DataFrame, path: str, *,
                        n: int = 3, window: int = 4, n_buckets: int = 64,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """Incremental maintenance of a :func:`write_winnow_index`: append
    the new docs' distinct fingerprints into their hash-bucket partition
    dirs — typically the post-scrub survivors of an ingest, so the next
    ingest's :func:`overlap_against_index` sees them at rest. Ids must
    be new (the index stores per-id fingerprint sets); append-only, no
    read-modify-write. (n, window, n_buckets) validate against ``_meta``
    — a different family would route to wrong buckets and never
    collide with stored fingerprints."""
    from eventstorm_spark.extensions.text import winnow_fingerprints

    _check_index_meta(new_docs.sparkSession, path,
                      {"kind": "winnow", "n": n, "window": window,
                       "n_buckets": n_buckets}, "winnow")
    fp = (winnow_fingerprints(new_docs, n=n, window=window,
                              text_col=text_col, id_col=id_col)
          .select("doc_id", "fingerprint").distinct()
          .withColumn("bucket",
                      F.pmod(F.xxhash64("fingerprint"),
                             F.lit(n_buckets)).cast("int")))
    (fp.repartition(n_buckets, "bucket")
     .write.mode("append").partitionBy("bucket")
     .parquet(os.path.join(path, "fingerprints")))


def streaming_dedup_against_corpus(stream_docs: DataFrame, corpus: DataFrame, *,
                                   text_col: str = "text",
                                   event_time_col: str = "ts",
                                   watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming ingest deduped against the at-rest corpus AND itself:
    the continuous form of :func:`dedup_against_corpus` for a live crawl
    feed.

    Two layers, both state-bounded:

    1. *Stream-static left-anti join* on the text digest drops docs
       whose content is already at rest. The static side is re-read per
       micro-batch (stream-static join semantics), so a corpus that
       grows between batches is honored without restarting the query —
       and it is stateless: nothing accumulates in the state store.
    2. ``dropDuplicatesWithinWatermark`` on the digest suppresses
       intra-stream duplicates, with state bounded by the watermark —
       the only viable contract on an unbounded feed. Duplicates
       arriving later than the delay are out of contract; route them to
       the batch :func:`dedup_against_corpus` backfill.

    At 100 TB the anti-join ships 16-byte digests (the corpus side is
    pre-aggregated to distinct digests), exactly like the batch form.
    """
    digests = (corpus.select(F.md5(F.col(text_col)).alias("__digest"))
               .distinct())
    keyed = stream_docs.withColumn("__digest", F.md5(F.col(text_col)))
    novel = keyed.join(digests, "__digest", "left_anti")
    wm = novel.withWatermark(event_time_col, watermark_delay)
    return wm.dropDuplicatesWithinWatermark(["__digest"]).drop("__digest")


def corpus_diff(old: DataFrame, new: DataFrame, *,
                text_col: str = "text",
                group_col: str = "source") -> DataFrame:
    """Content-level diff between two corpus snapshots:
    (group, status, n_digests) where status ∈ added | removed | common,
    computed over DISTINCT content digests per side (one digest = one
    piece of content regardless of how many rows carry it). The
    snapshot-to-snapshot accounting a recurring ingest publishes next
    to :func:`snapshot_novelty_report` (which answers "is this crawl
    worth processing"; this answers "what changed").

    Scale shape: each side reduces to a 16-byte digest + group row
    (min(group) on the rare digest carried by two groups — a total,
    engine-portable attribution rule), the full-outer join is
    digest-keyed, payloads never shuffle. Attribution: added/common
    digests report the NEW side's group, removed the OLD side's."""
    def side(df, alias):
        return (df.select(F.md5(F.col(text_col)).alias("digest"),
                          F.col(group_col).alias("__g"))
                .groupBy("digest").agg(F.min("__g").alias(alias)))

    o = side(old, "__g_old")
    n = side(new, "__g_new")
    j = o.join(n, "digest", "full_outer")
    status = (F.when(F.col("__g_old").isNull(), "added")
              .when(F.col("__g_new").isNull(), "removed")
              .otherwise("common"))
    return (j.select(F.coalesce("__g_new", "__g_old").alias(group_col),
                     status.alias("status"))
            .groupBy(group_col, "status")
            .agg(F.count(F.lit(1)).alias("n_digests")))


def psi_drift(old: DataFrame, new: DataFrame, features: list, *,
              bins: int = 10) -> DataFrame:
    """Population Stability Index between two corpus snapshots, per
    numeric feature — the distribution-shift gate run before a recrawl
    replaces a corpus (the third member of the snapshot family:
    :func:`snapshot_novelty_report` = "is it new",
    :func:`corpus_diff` = "what changed", this = "did its SHAPE move").
    Standard reading: PSI < 0.1 stable, 0.1–0.25 modest shift, > 0.25
    investigate before training on it.

    Determinism over the usual quantile binning: bin edges are
    equal-width over the OLD snapshot's [min, max] (no percentile
    interpolation to disagree across engines), new-side out-of-range
    values clamp into the edge bins, and probabilities are Laplace
    smoothed (+0.5 per bin) so empty bins stay finite:
    ``psi = Σ_b (p_new - p_old) * ln(p_new / p_old)``.

    Scale shape: each side is ONE map-side-combined aggregate over a
    `stack()` projection (rows x features, no join against the data),
    the old side's min/max is a features-row broadcast, and everything
    after the two count aggregates is O(features x bins) — corpus-size
    independent. Returns (feature, psi, n_old, n_new), psi rounded 6."""
    def melt(df):
        pairs = ", ".join(
            f"'{c}', CAST({c} AS DOUBLE)" for c in features)
        return df.selectExpr(
            f"stack({len(features)}, {pairs}) AS (feature, value)")

    o, n = melt(old), melt(new)
    stats = o.groupBy("feature").agg(F.min("value").alias("__lo"),
                                     F.max("value").alias("__hi"))

    def binned(df, alias):
        span = F.col("__hi") - F.col("__lo")
        # constant feature: raw would divide by zero; the outer when
        # never reads raw then, but keep the expression finite
        safe = F.when(span == 0, F.lit(1.0)).otherwise(span)
        raw = F.floor((F.col("value") - F.col("__lo")) * bins / safe)
        b = (F.when(span == 0, F.lit(0))
             .otherwise(F.least(F.lit(bins - 1),
                                F.greatest(F.lit(0), raw))))
        return (df.join(F.broadcast(stats), "feature")
                .select("feature", b.cast("int").alias("bin"))
                .groupBy("feature", "bin")
                .agg(F.count(F.lit(1)).alias(alias)))

    oc, nc = binned(o, "__n_old"), binned(n, "__n_new")
    spine = stats.select("feature").crossJoin(
        F.broadcast(stats.sparkSession.range(bins)
                    .select(F.col("id").cast("int").alias("bin"))))
    cells = (spine.join(oc, ["feature", "bin"], "left")
             .join(nc, ["feature", "bin"], "left")
             .select("feature", "bin",
                     F.coalesce("__n_old", F.lit(0)).alias("c_old"),
                     F.coalesce("__n_new", F.lit(0)).alias("c_new")))
    totals = cells.groupBy("feature").agg(F.sum("c_old").alias("t_old"),
                                          F.sum("c_new").alias("t_new"))
    p_old = (F.col("c_old") + 0.5) / (F.col("t_old") + 0.5 * bins)
    p_new = (F.col("c_new") + 0.5) / (F.col("t_new") + 0.5 * bins)
    term = (p_new - p_old) * F.log(p_new / p_old)
    return (cells.join(F.broadcast(totals), "feature")
            .groupBy("feature")
            .agg(F.round(F.sum(term), 6).alias("psi"),
                 F.max("t_old").alias("n_old"),
                 F.max("t_new").alias("n_new")))


def snapshot_novelty_report(new_docs: DataFrame, corpus: DataFrame, *,
                            text_col: str = "text",
                            group_col: str = "source",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-group novelty accounting for an incremental ingest:
    (group, n_new, n_novel, novelty_rate) where n_novel counts docs
    surviving :func:`dedup_against_corpus`. The go/no-go signal for
    whether a recrawl is worth processing."""
    kept = (dedup_against_corpus(new_docs, corpus,
                                 text_col=text_col, id_col=id_col)
            .select(F.col(group_col).alias("__g"))
            .groupBy("__g").agg(F.count(F.lit(1)).alias("n_novel")))
    base = (new_docs.select(F.col(group_col).alias("__g"))
            .groupBy("__g").agg(F.count(F.lit(1)).alias("n_new")))
    return (base.join(kept, "__g", "left")
            .select(F.col("__g").alias(group_col),
                    "n_new",
                    F.coalesce("n_novel", F.lit(0)).alias("n_novel"))
            .withColumn("novelty_rate",
                        F.round(F.col("n_novel") / F.col("n_new"), 6)))


# ---------------------------------------------------------------------------
# dataset-card reports
# ---------------------------------------------------------------------------

def vocab_coverage(docs: DataFrame, ks: list[int] | None = None, *,
                   text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Cumulative corpus coverage of the top-K vocabulary terms, the
    Zipf head/tail report: for each K in ``ks``, the fraction of all
    token occurrences covered by the K most frequent terms (frequency
    ties broken by term, so ranking is total and engine-portable).

    Scale shape: one corpus-scan term-count aggregate (map-side
    combine) produces a VOCABULARY-sized table; the rank + running-sum
    then runs over that table, not the corpus — and it is the two-phase
    distributed cumsum (the ``packing.global_token_offsets`` idiom),
    NOT an unpartitioned window: range-partition the vocabulary by
    (count desc, term), rank/cumsum *within* each partition, collect
    only the O(partitions) per-partition (row count, token sum) totals
    and add the running offsets back as a broadcast literal map. No
    ``Exchange SinglePartition`` anywhere (pinned by
    ``tests/test_plans.py``), so a 100M-type web vocabulary ranks in
    parallel. ``min_count`` > 1 additionally shrinks the ranked table
    by cutting the hapax tail while leaving every head rank untouched
    (a term below min_count can never be in the top K for any K the cut
    table still covers) — the denominator stays the FULL token total,
    so coverage numbers are unchanged.

    EAGER: the two-phase cumsum collects the per-partition totals (and
    with ``min_count`` > 1, the pre-cut token total) at CALL time —
    this function runs Spark jobs when invoked and the returned frame
    is pinned to the input as of that moment. Don't compose it into a
    plan expected to stay lazy or to re-execute on fresh data; call it
    again for a new snapshot.
    """
    ks = sorted(ks or [10, 100, 1000])
    from pyspark.sql import Window

    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism

    terms = (docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                         .alias("term"))
             .groupBy("term").agg(F.count(F.lit(1)).alias("n")))
    full_total: int | None = None
    if min_count > 1:
        # the coverage denominator is the FULL token total, so take it
        # before the cut; checkpoint first so the total pass and the
        # ranking pass share one tokenize of the corpus.
        terms = terms.localCheckpoint(eager=True)
        full_total = terms.agg(F.sum("n")).collect()[0][0] or 0
        terms = terms.where(F.col("n") >= min_count)
    # Phase 1: range-partition so partition k holds ranks strictly below
    # partition k+1's; localCheckpoint pins the sampled boundaries so the
    # totals pass and the rank pass see the same partitioning.
    part = (terms.repartitionByRange(n_parts, F.desc("n"), F.asc("term"))
            .sortWithinPartitions(F.desc("n"), F.asc("term"))
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    totals = part.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("c"), F.sum("n").alias("t")).collect()
    rank_off: dict[int, int] = {}
    cum_off: dict[int, int] = {}
    rrun = crun = 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        rank_off[r["__pid"]] = rrun
        cum_off[r["__pid"]] = crun
        rrun += r["c"]
        crun += r["t"]
    if full_total is None:
        full_total = crun  # no cut: the partition sums ARE the total
    if not rank_off:
        return part.select(F.lit(0).cast("long").alias("top_k"),
                           F.lit(0).cast("long").alias("n_covered"),
                           F.lit(0.0).alias("coverage")).where(F.lit(False))
    rmap = F.create_map(
        *[F.lit(v) for pid, off in rank_off.items() for v in (pid, off)])
    cmap = F.create_map(
        *[F.lit(v) for pid, off in cum_off.items() for v in (pid, off)])
    # Phase 2: per-partition rank/cumsum + the broadcast offsets. The
    # denominator is a literal (O(partitions) driver state, like the
    # offsets), so no 1-row aggregate branch re-scans the corpus.
    w = Window.partitionBy("__pid").orderBy(F.desc("n"), F.asc("term"))
    ranked = (part
              .withColumn("rank", (F.row_number().over(w)
                                   + rmap[F.col("__pid")]).cast("long"))
              .withColumn("cum_n", (F.sum("n").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))
                  + cmap[F.col("__pid")]).cast("long"))
              .where(F.col("rank").isin([int(k) for k in ks])))
    return (ranked
            .select(F.col("rank").alias("top_k"),
                    F.col("cum_n").alias("n_covered"),
                    F.round(F.col("cum_n") / F.lit(int(full_total)), 6)
                    .alias("coverage"))
            .orderBy("top_k"))


def source_composition(docs: DataFrame, *, text_col: str = "text",
                       group_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-source dataset-card row: docs, tokens, token share, exact-dup
    rate (1 - distinct digests / docs), and mean doc length. One
    map-side-combinable aggregate over the corpus scan (distinct digest
    counting rides the same groupBy via count(distinct md5)); output is
    source-cardinality rows."""
    n_tok = token_count(F.col(text_col))
    per = (docs
           .select(F.col(group_col).alias("__g"),
                   n_tok.alias("__n"),
                   F.md5(F.col(text_col)).alias("__d"))
           .groupBy("__g")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("__n").alias("n_tokens"),
                F.countDistinct("__d").alias("__nd")))
    total = per.agg(F.sum("n_tokens").alias("__t"))
    return (per.crossJoin(F.broadcast(total))
            .select(F.col("__g").alias(group_col),
                    "n_docs", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("__t"), 6)
                    .alias("token_share"),
                    F.round(1 - F.col("__nd") / F.col("n_docs"), 6)
                    .alias("exact_dup_rate"),
                    F.round(F.col("n_tokens") / F.col("n_docs"), 4)
                    .alias("mean_tokens")))


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Generic per-column profile: (col_name, n_rows, n_nulls,
    null_frac, n_distinct, min_str, max_str) — the data-quality gate run
    before a corpus enters the training mix.

    Everything is computed in ONE aggregate pass over the scan (all
    columns' counters ride the same map-side-combinable buffer), then
    reshaped driver-free with ``stack`` into a row per column. min/max
    are cast to string so heterogeneous column types share one schema —
    the standard profile-table shape. Source column names are addressed
    with ``F.col`` and never interpolated into SQL text; the internal
    counter aliases referenced by the ``stack()`` expression are indexed
    (``__min_0``), not name-derived, so a column named ``a b``, ``x'y``
    or ``count,`` profiles fine (its display name rides through as an
    escaped string literal only).
    """
    cols = columns or df.columns
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{i}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{i}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{i}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{i}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __rows_{i}, __nulls_{i}, __nd_{i}, __min_{i}, __max_{i}"
        .format(c.replace("\\", "\\\\").replace("'", "\\'"), i=i)
        for i, c in enumerate(cols))
    return (one.select(F.expr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)"))
        .withColumn("null_frac",
                    F.round(F.col("n_nulls") / F.col("n_rows"), 6))
        .select("col_name", "n_rows", "n_nulls", "null_frac",
                "n_distinct", "min_str", "max_str"))


def cluster_cards(docs: DataFrame, embeddings: DataFrame, *,
                  n_clusters: int = 8, top_terms: int = 5,
                  centroids: list | None = None,
                  text_col: str = "text", doc_id_col: str = "doc_id",
                  vec_col: str = "embedding",
                  vec_id_col: str = "vec_id") -> DataFrame:
    """Embedding-cluster dataset cards: route every document's vector
    to its nearest centroid (the IVF cell router), then per cluster
    report document count, token mass and the top-``top_terms``
    highest-frequency terms — the corpus MAP a mixture designer reads
    before cluster-balanced sampling (the DoReMi / cluster-weighted
    recipe: sample by semantic cluster, not just source label).

    ``centroids=None`` uses the deterministic lowest-id vectors (the
    oracle-expressible contract shared with ``similarity.ivf_topk``);
    pass ``kmeans_centroids(...)`` for trained cards at scale. Scale
    shape: assignment is one Arrow GEMM scan; term counting is the
    corpus tokenize pass aggregated by (cluster, term) with map-side
    combine; the top-terms window runs over the (cluster x vocab)
    count table, never the corpus. Output is one long-format table:
    (cell, n_docs, n_tokens, rank, term, term_count).
    """
    from pyspark.sql import Window

    from eventstorm_spark.extensions.similarity import _ivf_cell_udf
    from eventstorm_spark.extensions.text import tokens

    if centroids is not None:
        cents = [[float(x) for x in c] for c in centroids]
    else:
        rows = (embeddings.orderBy(vec_id_col).limit(n_clusters)
                .select(vec_col).collect())
        cents = [[float(x) for x in r[vec_col]] for r in rows]
    assign = embeddings.select(
        F.col(vec_id_col).alias(doc_id_col),
        _ivf_cell_udf(cents)(F.col(vec_col)).alias("cell"))
    clustered = docs.join(assign, doc_id_col)
    sizes = (clustered.groupBy("cell")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(token_count(F.col(text_col))).alias("n_tokens")))
    terms = (clustered.select("cell",
                              F.explode(tokens(F.col(text_col))).alias("term"))
             .where(F.col("term") != "")
             .groupBy("cell", "term")
             .agg(F.count(F.lit(1)).alias("term_count")))
    w = Window.partitionBy("cell").orderBy(F.col("term_count").desc(), "term")
    top = (terms.withColumn("rank", F.row_number().over(w).cast("int"))
           .where(F.col("rank") <= top_terms))
    return (top.join(sizes, "cell")
            .select("cell", "n_docs", "n_tokens", "rank", "term",
                    "term_count")
            .orderBy("cell", "rank"))


def write_packed_shards(docs: DataFrame, path: str, *, seq_len: int = 512,
                        n_shards: int = 16, salt: str = "packed-v1",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """The end-to-end training-data writer: pack the corpus into
    fixed-length sequences (``packing.pack_token_spans``), route each
    SEQUENCE to a shard by salted hash of its seq_id, and materialize
    as ``path/shard=K/*.parquet`` — the layout a data loader streams.

    Sharding by sequence (not by document) keeps every shard's row
    count balanced regardless of document length skew, and a sequence's
    slices stay together because the shard is a function of seq_id.
    Same writer discipline as :func:`write_training_shards`:
    repartition BY the shard column first so each shard is written by
    its owner task — one file per shard, not n_tasks x n_shards.
    The manifest a loader plans from is one bounded aggregate away
    (`groupBy("shard")`) over the written table.
    """
    from eventstorm_spark.extensions.packing import pack_token_spans

    spans = pack_token_spans(docs, seq_len=seq_len, text_col=text_col,
                             id_col=id_col)
    u = _unit_hash(F.col("seq_id"), salt)
    sharded = spans.withColumn(
        "shard", F.floor(u * F.lit(float(n_shards))).cast("int"))
    (sharded.repartition(n_shards, "shard")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def write_dhash_index(assets: DataFrame, path: str, *,
                      hash_w: int = 8, hash_h: int = 8,
                      fingerprints: DataFrame | None = None) -> None:
    """Persist an image corpus's perceptual fingerprints as an at-rest
    NEAR-DUP IMAGE index — the multimodal twin of
    :func:`write_minhash_index`: ``path/hashes`` (asset_id + the two
    8-byte dHash halves — 16 bytes per image, ~10⁻⁶ of corpus bytes)
    and ``path/buckets`` (the four 16-bit band values, partitioned by
    band). A recurring image ingest checks new assets by joining their
    banded values against the stored buckets and verifying candidates
    with ``bit_count(xor)`` on the stored HASHES — the corpus images
    are never re-decoded, which is the entire point at 100 TB: decode
    once at ingest, serve dedup forever from 16-byte rows. Banding is
    ``multimodal.dhash_bands`` — the same expression the in-memory
    pair join uses, so at-rest and in-memory bucketing can never
    drift."""
    from eventstorm_spark.extensions.multimodal import dhash_bands, image_dhash

    # band_layout versions the bucket scheme: dhash_bands derives band
    # widths from n_bits, so an index must refuse probes from a writer
    # with a different layout instead of silently missing every pair
    _write_index_meta(assets.sparkSession, path,
                      {"kind": "dhash", "hash_w": hash_w, "hash_h": hash_h,
                       "band_layout": "quarters-v1"})
    # `fingerprints` (asset_id, dhash_hi, dhash_lo) admits non-image
    # modalities into the same index — e.g. audio_fingerprint output,
    # whose payloads image_dhash's modality filter would drop silently
    hashes = (fingerprints if fingerprints is not None
              else image_dhash(assets, hash_w=hash_w, hash_h=hash_h))
    hashes = hashes.localCheckpoint(eager=False)  # feeds both writes
    (hashes.select("asset_id", "dhash_hi", "dhash_lo")
     .write.mode("overwrite").parquet(os.path.join(path, "hashes")))
    (dhash_bands(hashes, n_bits=hash_w * hash_h)
     .repartition("band", "val")
     .write.mode("overwrite").partitionBy("band")
     .parquet(os.path.join(path, "buckets")))


def image_dedup_against_index(new_assets: DataFrame, spark,
                              index_path: str, *, max_distance: int = 3,
                              hash_w: int = 8, hash_h: int = 8,
                              fingerprints: DataFrame | None = None
                              ) -> DataFrame:
    """Near-duplicate image pairs (new_id, corpus_id, hamming) between
    a new asset batch and a :func:`write_dhash_index` corpus index.

    The new batch decodes + hashes ONCE; candidates come from the
    banded (band, val) join against the stored buckets —
    pigeonhole-exact versus the stored corpus at ``max_distance <= 3``,
    same guarantee as ``multimodal.image_hamming_pairs`` — and
    verification is ``bit_count(xor)`` against the stored hash halves,
    semi-join-pruned to candidate ids first (verify-candidates-only:
    never join a corpus-sized build side). Corpus images are never
    re-read, let alone re-decoded. The (hash_w, hash_h) parameters are
    validated against the index ``_meta``: hashes from a different
    grid pair at garbage distances, so a mismatch is a hard error."""
    from eventstorm_spark.extensions.multimodal import (dhash_bands,
                                                        hamming64,
                                                        image_dhash)

    _check_index_meta(spark, index_path,
                      {"kind": "dhash", "hash_w": hash_w,
                       "hash_h": hash_h,
                       "band_layout": "quarters-v1"}, "dhash")
    hashes_new = (fingerprints if fingerprints is not None
                  else image_dhash(new_assets, hash_w=hash_w,
                                   hash_h=hash_h))
    hashes_new = hashes_new.localCheckpoint(eager=False)  # bands + verify
    banded_new = (dhash_bands(hashes_new, n_bits=hash_w * hash_h)
                  .select(F.col("id").alias("new_id"), "band", "val"))
    buckets = (spark.read.parquet(os.path.join(index_path, "buckets"))
               .select(F.col("id").alias("corpus_id"), "band", "val"))
    cand = (banded_new.join(buckets, ["band", "val"])
            .select("new_id", "corpus_id").distinct())
    stored = spark.read.parquet(os.path.join(index_path, "hashes"))
    stored_pruned = (stored.join(
        cand.select(F.col("corpus_id").alias("asset_id")).distinct(),
        "asset_id", "left_semi")
        .select(F.col("asset_id").alias("corpus_id"),
                F.col("dhash_hi").alias("hi_b"),
                F.col("dhash_lo").alias("lo_b")))
    new_sel = hashes_new.select(F.col("asset_id").alias("new_id"),
                                F.col("dhash_hi").alias("hi_a"),
                                F.col("dhash_lo").alias("lo_a"))
    return (cand.join(new_sel, "new_id").join(stored_pruned, "corpus_id")
            .withColumn("hamming", hamming64("hi_a", "lo_a", "hi_b", "lo_b"))
            .where(F.col("hamming") <= int(max_distance))
            .select("new_id", "corpus_id", "hamming"))


def append_dhash_index(new_assets: DataFrame, path: str, *,
                       hash_w: int = 8, hash_h: int = 8,
                       fingerprints: DataFrame | None = None) -> None:
    """Incremental maintenance of a :func:`write_dhash_index`: append
    the new assets' hashes and banded buckets — called with the
    survivors of :func:`image_dedup_against_index` after an ingest so
    the next ingest sees them at rest. Append-only, no
    read-modify-write; the (hash_w, hash_h) grid is validated against
    the index ``_meta`` since mixed-grid hashes poison every future
    distance."""
    from eventstorm_spark.extensions.multimodal import dhash_bands, image_dhash

    _check_index_meta(new_assets.sparkSession, path,
                      {"kind": "dhash", "hash_w": hash_w,
                       "hash_h": hash_h,
                       "band_layout": "quarters-v1"}, "dhash")
    hashes = (fingerprints if fingerprints is not None
              else image_dhash(new_assets, hash_w=hash_w, hash_h=hash_h))
    hashes = hashes.localCheckpoint(eager=False)
    (hashes.select("asset_id", "dhash_hi", "dhash_lo")
     .write.mode("append").parquet(os.path.join(path, "hashes")))
    (dhash_bands(hashes, n_bits=hash_w * hash_h)
     .repartition("band", "val")
     .write.mode("append").partitionBy("band")
     .parquet(os.path.join(path, "buckets")))


def append_digest_index(new_docs: DataFrame, path: str, *,
                        text_col: str = "text", n_buckets: int = 64) -> None:
    """Incremental maintenance of a :func:`write_digest_index`: append
    the new snapshot's distinct digests into their hash buckets —
    typically called with the SURVIVORS of
    :func:`dedup_against_digest_index` after an ingest, so the next
    ingest sees them at rest. Parquet append into the bucket partition
    dirs; digests already present are harmless (the anti-join is
    membership, not counting), so maintenance needs no read-modify-write
    of the existing index. The bucket count is validated against the
    index's ``_meta`` — appending with a different ``n_buckets`` would
    route digests to the wrong partition dirs."""
    _check_index_meta(new_docs.sparkSession, path,
                      {"kind": "digest", "n_buckets": n_buckets}, "digest")
    digests = (new_docs.select(F.md5(F.col(text_col)).alias("digest"))
               .distinct()
               .withColumn("bucket",
                           F.pmod(F.xxhash64("digest"),
                                  F.lit(n_buckets)).cast("int")))
    (digests.repartition(n_buckets, "bucket")
     .write.mode("append").partitionBy("bucket").parquet(path))


def append_minhash_index(new_docs: DataFrame, path: str, *,
                         num_hashes: int = 64, bands: int = 16, n: int = 3,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> None:
    """Incremental maintenance of a :func:`write_minhash_index`: append
    the new docs' signatures and banded buckets. Ids must be new (the
    index stores one signature per id); call with the post-dedup
    survivors of an ingest. Append-only — no read-modify-write. The
    (num_hashes, bands, n) parameters are validated against the index's
    ``_meta``: appending signatures from a different hash family would
    silently corrupt every future estimate."""
    from eventstorm_spark.extensions.dedup import band_buckets, minhash_signatures

    _check_index_meta(new_docs.sparkSession, path,
                      {"kind": "minhash", "num_hashes": num_hashes,
                       "bands": bands, "n": n}, "minhash")
    sigs = minhash_signatures(new_docs, num_hashes=num_hashes, n=n,
                              text_col=text_col, id_col=id_col)
    sigs = sigs.localCheckpoint(eager=False)
    sigs.write.mode("append").parquet(os.path.join(path, "signatures"))
    (band_buckets(sigs, bands=bands)
     .repartition("band", "bucket")
     .write.mode("append").partitionBy("band")
     .parquet(os.path.join(path, "buckets")))


# ---------------------------------------------------------------------------
# at-rest BM25 inverted index
# ---------------------------------------------------------------------------

def _bm25_term_rows(docs: DataFrame, *, text_col: str,
                    id_col: str) -> DataFrame:
    """(id, term) rows under the SAME tokenizer as text.bm25_top_docs
    (``[a-z0-9]+`` over lowercased text) — the index and the in-memory
    scorer must tokenize identically or scores drift (test-pinned)."""
    return docs.select(
        F.col(id_col),
        F.explode(F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("term"))


def _bm25_postings(docs: DataFrame, *, text_col: str, id_col: str,
                   n_buckets: int) -> DataFrame:
    tf = (_bm25_term_rows(docs, text_col=text_col, id_col=id_col)
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")))
    return tf.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))


def _bm25_doclen(docs: DataFrame, *, text_col: str,
                 id_col: str) -> DataFrame:
    return (docs.select(
        F.col(id_col),
        F.size(F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .cast("long").alias("dl"))
        .where(F.col("dl") > 0))


def write_bm25_index(corpus: DataFrame, path: str, *, n_buckets: int = 64,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> None:
    """Persist the corpus as an at-rest BM25 INVERTED index:
    ``path/postings`` ((id, term, tf) hash-partitioned by term bucket)
    and ``path/doclen`` ((id, dl) — ~16 B/doc).

    The retrieval twin of the digest/MinHash/dHash/winnow indexes: a
    query tokenizes NOTHING at serve time — its terms hash to bucket
    partition dirs, the postings scan is partition-pruned to those
    buckets (unqueried buckets cost zero I/O), per-term df comes from
    counting the pruned postings themselves (no separate df table to
    drift after appends), and N/avgdl are one aggregate over the
    narrow doclen table. Corpus text is never re-read. Serving equals
    :func:`text.bm25_top_docs` on the same corpus exactly — both rank
    through the shared ``text.bm25_rank`` stage (test-pinned).

    At 100 TB the postings table is the standard inverted-index cost
    (one row per distinct (doc, term)); building it is ONE tokenize
    pass + one map-side-combinable (id, term) aggregate. The doclen
    table is then derived from the WRITTEN postings (``dl = sum(tf)``
    per doc — identical to the token count by construction, and a doc
    with zero tokens has no postings rows, matching the explicit
    ``dl > 0`` filter), so the corpus text is scanned and tokenized
    exactly once and the second job reads the compact columnar
    postings instead of re-running the regex over raw text.
    """
    spark = corpus.sparkSession
    postings = _bm25_postings(corpus, text_col=text_col, id_col=id_col,
                              n_buckets=n_buckets)
    # the postings schema rides in _meta so reads survive a ZERO-file
    # postings table (empty corpus / nothing matching the tokenizer —
    # parquet schema inference fails on a bare directory)
    _write_index_meta(spark, path,
                      {"kind": "bm25", "n_buckets": n_buckets,
                       "postings_schema": postings.schema.json()})
    # dir-aligned write (same discipline as the digest/positional
    # writers): repartition by the partition column so each task owns
    # whole bucket dirs — ("bucket", "term") sprayed every bucket
    # across every shuffle task, n_tasks x n_buckets small files (the
    # classic 100 TB trap; n_buckets is the file-size knob at scale)
    (postings.repartition(n_buckets, "bucket")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(path, "postings")))
    # read back with the postings' own schema: a zero-postings corpus
    # (empty, or nothing matching the tokenizer) writes no parquet
    # files and schema inference would fail on the bare directory
    (spark.read.schema(postings.schema)
     .parquet(os.path.join(path, "postings"))
     .groupBy(F.col(id_col))
     .agg(F.sum("tf").cast("long").alias("dl"))
     .write.mode("overwrite").parquet(os.path.join(path, "doclen")))


def _meta_postings_schema(spark, index_path: str):
    """The postings StructType recorded in ``_meta`` (None for a
    pre-round-13 index). Reading with it survives a ZERO-file postings
    table, where parquet schema inference fails on the bare
    directory."""
    import json

    from pyspark.sql.types import StructType

    meta = _read_index_meta(spark, index_path) or {}
    sj = meta.get("postings_schema")
    return StructType.fromJson(json.loads(sj)) if sj else None


def bm25_against_index(spark, index_path: str, query_terms: list, *,
                       k: int = 20, k1: float = 1.2, b: float = 0.75,
                       n_buckets: int = 64,
                       id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k from a :func:`write_bm25_index` — the serving path.

    The query terms' buckets are computed with the index's own bucket
    expression (a query-bounded collect), the postings read prunes to
    those partition dirs, and ranking goes through the SAME
    ``text.bm25_rank`` stage as the in-memory form, so index-vs-memory
    results are identical by construction. ``n_buckets`` is validated
    against ``_meta`` — a mismatch would prune to the wrong dirs and
    silently drop terms, so it is a hard error instead."""
    from eventstorm_spark.extensions.text import bm25_rank

    _check_index_meta(spark, index_path,
                      {"kind": "bm25", "n_buckets": n_buckets}, "bm25")
    terms = [str(t) for t in query_terms]
    tdf = local_frame(spark, [(t,) for t in terms], "term string")
    buckets = [r.bucket for r in
               tdf.select(F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                          .cast("int").alias("bucket"))
               .distinct().collect()]
    pschema = _meta_postings_schema(spark, index_path)
    preader = spark.read.schema(pschema) if pschema else spark.read
    postings = (preader.parquet(os.path.join(index_path, "postings"))
                .where(F.col("bucket").isin(buckets))
                .where(F.col("term").isin(terms)))
    if pschema is not None:
        from pyspark.sql.types import LongType, StructField, StructType
        dreader = spark.read.schema(StructType(
            [pschema[id_col], StructField("dl", LongType())]))
    else:
        dreader = spark.read
    dl = dreader.parquet(os.path.join(index_path, "doclen"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    tf = postings.select(id_col, "term", "tf")
    df_ = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return bm25_rank(tf, df_, dl, stats, k1=k1, b=b, k=k, id_col=id_col)


def write_positional_index(corpus: DataFrame, path: str, *,
                           n_buckets: int = 64, text_col: str = "text",
                           id_col: str = "doc_id") -> None:
    """Persist a POSITIONAL inverted index: ``path/postings`` holds
    (doc, pos, tok) rows hash-partitioned by token bucket — the BM25
    index (:func:`write_bm25_index`) plus the one extra int column
    that makes exact phrase queries servable. Same layout discipline:
    a phrase query's tokens hash to bucket partition dirs, the read
    prunes to those dirs, and the text is never re-tokenized at serve
    time. Tokenizer is the whitespace split of ``text.phrase_search``
    (NOT the BM25 ``[a-z0-9]+`` regex — phrase adjacency is defined on
    the raw token stream), positions 0-based."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    rows = (corpus.select(F.col(id_col).alias("doc"),
                          F.posexplode(toks).alias("pos", "tok"))
            .withColumn("bucket",
                        F.pmod(F.xxhash64("tok"),
                               F.lit(n_buckets)).cast("int")))
    _write_index_meta(corpus.sparkSession, path,
                      {"kind": "positional", "n_buckets": n_buckets,
                       "postings_schema": rows.schema.json()})
    (rows.repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(path, "postings")))


def phrase_against_index(spark, index_path: str, phrase: list, *,
                         n_buckets: int = 64) -> DataFrame:
    """Exact phrase search served from a
    :func:`write_positional_index` — (doc, n_matches, first_pos), equal
    by construction to ``text.phrase_search`` on the same corpus (both
    evaluate through the shared ``text._phrase_join`` stage;
    test-pinned). The postings read prunes to the phrase tokens'
    bucket dirs (unqueried buckets cost zero I/O); ``n_buckets`` is
    validated against ``_meta`` because a mismatch would prune to the
    wrong dirs and silently miss tokens."""
    from eventstorm_spark.extensions.text import _phrase_join

    if not phrase:
        raise ValueError("phrase must have at least one term")
    _check_index_meta(spark, index_path,
                      {"kind": "positional", "n_buckets": n_buckets},
                      "positional")
    terms = [str(t) for t in phrase]
    tdf = local_frame(spark, [(t,) for t in set(terms)], "tok string")
    buckets = [r.bucket for r in
               tdf.select(F.pmod(F.xxhash64("tok"), F.lit(n_buckets))
                          .cast("int").alias("bucket"))
               .distinct().collect()]
    pschema = _meta_postings_schema(spark, index_path)
    preader = spark.read.schema(pschema) if pschema else spark.read
    postings = (preader.parquet(os.path.join(index_path, "postings"))
                .where(F.col("bucket").isin(buckets))
                .where(F.col("tok").isin(terms)))
    return _phrase_join(postings, terms)


def append_positional_index(new_docs: DataFrame, path: str, *,
                            n_buckets: int = 64, text_col: str = "text",
                            id_col: str = "doc_id") -> None:
    """Incremental maintenance: append the new docs' (doc, pos, tok)
    rows into their bucket dirs. Ids must be NEW (re-appending an id
    would double-count its matches) — same contract as the BM25/MinHash
    indexes; no read-modify-write."""
    _check_index_meta(new_docs.sparkSession, path,
                      {"kind": "positional", "n_buckets": n_buckets},
                      "positional")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    (new_docs.select(F.col(id_col).alias("doc"),
                     F.posexplode(toks).alias("pos", "tok"))
     .withColumn("bucket", F.pmod(F.xxhash64("tok"),
                                  F.lit(n_buckets)).cast("int"))
     .repartition("bucket")
     .write.mode("append").partitionBy("bucket")
     .parquet(os.path.join(path, "postings")))


def append_bm25_index(new_docs: DataFrame, path: str, *,
                      n_buckets: int = 64, text_col: str = "text",
                      id_col: str = "doc_id") -> None:
    """Incremental maintenance of a :func:`write_bm25_index`: append
    the new docs' postings into their bucket dirs and their lengths
    into doclen. Ids must be NEW (re-appending an id double-counts its
    rows in df and N — same contract as the MinHash index); call with
    the post-dedup survivors of an ingest. df/N/avgdl need no stored
    update: probes derive them from the appended tables, so appends
    are read-modify-write-free."""
    _check_index_meta(new_docs.sparkSession, path,
                      {"kind": "bm25", "n_buckets": n_buckets}, "bm25")
    (_bm25_postings(new_docs, text_col=text_col, id_col=id_col,
                    n_buckets=n_buckets)
     .repartition("bucket", "term")
     .write.mode("append").partitionBy("bucket")
     .parquet(os.path.join(path, "postings")))
    (_bm25_doclen(new_docs, text_col=text_col, id_col=id_col)
     .write.mode("append").parquet(os.path.join(path, "doclen")))


# ---------------------------------------------------------------------------
# index compaction
# ---------------------------------------------------------------------------

def _count_data_files(path: str) -> int:
    """Parquet data files under ``path`` (local FS walk; `_`/`.`-prefixed
    bookkeeping files excluded, matching what Spark's reader sees)."""
    n = 0
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        if any(p.startswith(("_", ".")) for p in rel.split(os.sep) if p != "."):
            continue
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _swap_in_compacted(table_path: str, tmp_path: str,
                       keep_entries: tuple[str, ...] = ()) -> None:
    """Replace ``table_path`` with the freshly-written ``tmp_path`` via
    two directory renames (local/HDFS-style filesystems — object stores
    need a copy-based committer instead). Crash recovery is mechanical
    and documented rather than automatic: if ``table_path`` is missing
    and ``table_path + '.__compact_old'`` exists, rename the old one
    back; nothing is deleted until the new directory is in place.
    ``keep_entries`` names entries living INSIDE the old table dir that
    must survive the swap (the digest index keeps its ``_meta`` there)."""
    import shutil

    old = table_path + ".__compact_old"
    if os.path.exists(old):
        raise RuntimeError(
            f"{old} exists — a previous compaction died mid-swap; "
            "recover by renaming it back (if the table dir is missing) "
            "or deleting it (if the table dir is complete)")
    os.rename(table_path, old)
    os.rename(tmp_path, table_path)
    for entry in keep_entries:
        src = os.path.join(old, entry)
        if os.path.exists(src):
            shutil.move(src, os.path.join(table_path, entry))
    shutil.rmtree(old)


def compact_table(spark, table_path: str, *,
                  partition_by: tuple[str, ...] = (),
                  cluster_by: tuple[str, ...] = (),
                  n_files: int = 1, distinct: bool = True,
                  keep_entries: tuple[str, ...] = ()) -> dict:
    """Rewrite a parquet table that accumulated ``mode('append')``
    deltas into a compact layout — the maintenance step every
    append-only index eventually needs: each recurring ingest adds a
    file (or one per task) to every partition directory, and after
    thousands of ingests a probe scan is file-open-bound rather than
    byte-bound. Compaction rewrites the SAME rows (exact-duplicate rows
    collapsed when ``distinct`` — every probe here is membership/
    distinct-based, so results are unchanged; verified pre/post in
    tests) with the same partition scheme, one file per partition
    directory (``cluster_by`` = the repartition the original writer
    used) or ``n_files`` files for unpartitioned tables (choose
    ~bytes/128MB at scale). Runs as one Spark job writing a sibling
    temp dir, then swaps directories; single-maintainer, same contract
    as the append functions. Returns {files_before, files_after,
    rows}."""
    files_before = _count_data_files(table_path)
    df = spark.read.parquet(table_path)
    if distinct:
        df = df.dropDuplicates()
    if cluster_by:
        df = df.repartition(*[F.col(c) for c in cluster_by])
    else:
        df = df.coalesce(max(1, int(n_files)))
    tmp = table_path + ".__compact_tmp"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    _swap_in_compacted(table_path, tmp, keep_entries)
    return {"files_before": files_before,
            "files_after": _count_data_files(table_path), "rows": rows}


def compact_index(spark, path: str) -> dict:
    """Kind-aware compaction for the at-rest curation indexes
    (``write_digest_index`` / ``write_minhash_index`` /
    ``write_dhash_index`` / ``write_winnow_index`` /
    ``write_bm25_index``): reads the index's
    ``_meta`` to learn its kind and rewrites each sub-table with the
    exact partitioning its writer used, collapsing the per-append file
    accumulation. Membership semantics are untouched (all sub-tables
    are distinct-row sets; re-appended digests/fingerprints collapse to
    one row, which the probes — anti-joins, banded joins, distinct
    overlap counts — cannot observe), and ``_meta`` survives, so
    append/probe validation keeps working after compaction. The IVF
    family (``similarity.write_ivf_index`` etc.) is the same rewrite of
    its ``cell=...`` partitions via :func:`compact_table` with
    ``partition_by=("cell",)``. Returns {sub_table: report}."""
    meta = _read_index_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"no _meta at {path} — compact_index needs the index kind; "
            "use compact_table directly for bare parquet tables")
    kind = meta.get("kind")
    plans = {
        "digest": [("", ("bucket",), ("bucket",), ("_meta",))],
        "minhash": [("signatures", (), (), ()),
                    ("buckets", ("band",), ("band", "bucket"), ())],
        "dhash": [("hashes", (), (), ()),
                  ("buckets", ("band",), ("band", "val"), ())],
        "winnow": [("fingerprints", ("bucket",), ("bucket",), ())],
        # bm25 rows are unique per (id, term) under the new-ids-only
        # append contract, so the distinct collapse is a no-op there
        "bm25": [("postings", ("bucket",), ("bucket", "term"), ()),
                 ("doclen", (), (), ())],
    }
    if kind not in plans:
        raise ValueError(f"unknown index kind {kind!r} at {path}")
    report = {}
    for sub, part, clus, keep in plans[kind]:
        sub_path = os.path.join(path, sub) if sub else path
        report[sub or "."] = compact_table(
            spark, sub_path, partition_by=part, cluster_by=clus,
            keep_entries=keep)
    return report


# ---------------------------------------------------------------------------
# At-rest KMV sketch store (mergeable distinct-count summaries)
# ---------------------------------------------------------------------------


def write_kmv_index(df, path: str, col: str, *,
                    group_cols: tuple = ("source",), k: int = 256,
                    portable: bool = False) -> None:
    """Persist per-group KMV distinct sketches (`sketches.kmv_sketch`)
    as an at-rest summary table: one row per group, k longs each —
    the distinct-count analogue of the digest/minhash/dHash index tier.
    The raw data never needs re-scanning to answer "distinct X per
    group so far": estimates read the sketch rows, and new snapshots
    fold in via :func:`append_kmv_index` (merge is lossless — the k
    global minima live in the union of per-input k-minima)."""
    from eventstorm_spark.extensions.sketches import kmv_sketch

    sk = kmv_sketch(df, col, k=k, group_cols=list(group_cols),
                    portable=portable)
    sk.write.mode("overwrite").parquet(os.path.join(path, "sketches"))
    _write_index_meta(df.sparkSession, path,
                      {"kind": "kmv", "col": col, "k": k,
                       "group_cols": list(group_cols),
                       "portable": portable})


def kmv_index_estimate(spark, path: str):
    """Distinct-count estimates straight from the at-rest sketches —
    zero raw-data scan; validates the meta."""
    from eventstorm_spark.extensions.sketches import kmv_estimate

    meta = _read_index_meta(spark, path)
    if meta is None or meta.get("kind") != "kmv":
        raise ValueError(f"{path} is not a KMV index (meta={meta})")
    sk = spark.read.parquet(os.path.join(path, "sketches"))
    return kmv_estimate(sk, k=int(meta["k"]))


def append_kmv_index(new_df, path: str, *, col: str | None = None) -> None:
    """Fold a new snapshot into the at-rest sketches: sketch the new
    data with the INDEX's parameters (meta-guarded — appending with a
    different k or hash mode would corrupt every estimate), union with
    the stored rows, re-merge per group, atomically replace. The
    merge input is (old groups + new groups) x k longs — index-sized,
    never corpus-sized."""
    from eventstorm_spark.extensions.sketches import kmv_merge, kmv_sketch

    spark = new_df.sparkSession
    meta = _read_index_meta(spark, path)
    if meta is None or meta.get("kind") != "kmv":
        raise ValueError(f"{path} is not a KMV index (meta={meta})")
    if col is not None and col != meta["col"]:
        raise ValueError(
            f"index sketches column {meta['col']!r}, append got {col!r}")
    k = int(meta["k"])
    gcols = list(meta["group_cols"])
    fresh = kmv_sketch(new_df, meta["col"], k=k, group_cols=gcols,
                       portable=bool(meta["portable"]))
    old = spark.read.parquet(os.path.join(path, "sketches"))
    merged = kmv_merge(old.unionByName(fresh), k=k, group_cols=gcols)
    final = os.path.join(path, "sketches")
    staged = final + ".__compact_tmp"
    merged.write.mode("overwrite").parquet(staged)
    _swap_in_compacted(final, staged)


def write_hdr_index(df, path: str, col: str, *,
                    group_cols: tuple = ("source",),
                    sig_digits: int = 2) -> None:
    """Persist per-group HDR log-histograms (`sketches.hdr_histogram`)
    — the quantile leg of the at-rest sketch tier next to
    :func:`write_kmv_index`. Quantile queries over historical data then
    read (group, exp, mant, n) rows whose count is bounded by the value
    RANGE, never the row count; new snapshots fold in by summing bucket
    counts (:func:`append_hdr_index` — histograms are trivially
    mergeable)."""
    from eventstorm_spark.extensions.sketches import hdr_histogram

    hist = hdr_histogram(df, col, sig_digits=sig_digits,
                         group_cols=list(group_cols))
    hist.write.mode("overwrite").parquet(os.path.join(path, "hist"))
    _write_index_meta(df.sparkSession, path,
                      {"kind": "hdr", "col": col,
                       "sig_digits": sig_digits,
                       "group_cols": list(group_cols)})


def hdr_index_quantiles(spark, path: str, quantiles: tuple = (0.5, 0.95,
                                                              0.99)):
    """Quantile estimates straight from the at-rest histograms —
    zero raw-data scan; validates the meta."""
    from eventstorm_spark.extensions.sketches import hdr_quantiles

    meta = _read_index_meta(spark, path)
    if meta is None or meta.get("kind") != "hdr":
        raise ValueError(f"{path} is not an HDR index (meta={meta})")
    hist = spark.read.parquet(os.path.join(path, "hist"))
    return hdr_quantiles(hist, list(quantiles),
                         sig_digits=int(meta["sig_digits"]),
                         group_cols=list(meta["group_cols"]))


def append_hdr_index(new_df, path: str) -> None:
    """Fold a new snapshot in: histogram the new rows with the INDEX's
    parameters (meta-guarded), union with the stored buckets, re-sum,
    atomically replace — index-sized work throughout."""
    from eventstorm_spark.extensions.sketches import hdr_histogram, hdr_merge

    spark = new_df.sparkSession
    meta = _read_index_meta(spark, path)
    if meta is None or meta.get("kind") != "hdr":
        raise ValueError(f"{path} is not an HDR index (meta={meta})")
    gcols = list(meta["group_cols"])
    fresh = hdr_histogram(new_df, meta["col"],
                          sig_digits=int(meta["sig_digits"]),
                          group_cols=gcols)
    old = spark.read.parquet(os.path.join(path, "hist"))
    merged = hdr_merge(old.unionByName(fresh), group_cols=gcols)
    final = os.path.join(path, "hist")
    staged = final + ".__compact_tmp"
    merged.write.mode("overwrite").parquet(staged)
    _swap_in_compacted(final, staged)


# ---------------------------------------------------------------------------
# at-rest decayed-counter store
# ---------------------------------------------------------------------------

def write_decay_index(events, path: str, key_col: str, *,
                      ref_ts_us: int, half_life: str = "7 days",
                      ts_col: str = "ts") -> None:
    """Persist per-key exponentially-decayed counters
    (``temporal.decayed_counts``) as an at-rest index — the
    trending/popularity store a serving layer reads WITHOUT rescanning
    the event log. Works because decayed sums are mergeable AT A
    SHARED REFERENCE INSTANT: every append evaluates its decay against
    the ``ref_ts_us`` pinned in ``_meta`` (NOT "now"), so partial rows
    from any number of ingests sum to exactly the fresh-build counter,
    and reading "as of" a later instant is one multiply
    (:func:`decay_index_scores`) — never a rescan. Scores are stored
    UNROUNDED so append-merge equals fresh-build to the last bit of
    summation noise (~1e-13 relative; serving rounds 6)."""
    from eventstorm_spark.extensions.temporal import decayed_counts

    _write_index_meta(events.sparkSession, path,
                      {"kind": "decay", "ref_ts_us": int(ref_ts_us),
                       "half_life": half_life})
    (decayed_counts(events, key_col, ref_ts_us=ref_ts_us,
                    half_life=half_life, ts_col=ts_col,
                    round_digits=None)
     .write.mode("overwrite").parquet(os.path.join(path, "counters")))


def append_decay_index(new_events, path: str, key_col: str, *,
                       ts_col: str = "ts") -> None:
    """Fold a new ingest into the store: compute its partial counters
    against the ref/half-life pinned in ``_meta`` and append — no
    read-modify-write; serving sums partials per key."""
    from eventstorm_spark.extensions.temporal import decayed_counts

    spark = new_events.sparkSession
    meta = _read_index_meta(spark, path)
    if not meta or meta.get("kind") != "decay":
        raise ValueError(f"not a decay index: {path}")
    (decayed_counts(new_events, key_col,
                    ref_ts_us=int(meta["ref_ts_us"]),
                    half_life=meta["half_life"], ts_col=ts_col,
                    round_digits=None)
     .write.mode("append").parquet(os.path.join(path, "counters")))


def decay_index_scores(spark, path: str, *,
                       as_of_us: int | None = None):
    """Serve (key, n, decayed_score) from the store: sum the partial
    rows per key, then — if ``as_of_us`` is given — REBASE the scores
    to that instant with one multiply by ``0.5^(delta/half_life)``
    (exp-decay is time-homogeneous; this is why no rescan is ever
    needed). Scores rounded 6 at the serving edge."""
    import re as _re

    meta = _read_index_meta(spark, path)
    if not meta or meta.get("kind") != "decay":
        raise ValueError(f"not a decay index: {path}")
    df = (spark.read.parquet(os.path.join(path, "counters"))
          .groupBy("key")
          .agg(F.sum("n").alias("n"),
               F.sum("decayed_score").alias("__s")))
    if as_of_us is not None:
        m = _re.fullmatch(r"(\d+)\s*(day|hour|minute)s?",
                          str(meta["half_life"]).strip())
        if m is None:
            raise ValueError(
                f"unsupported half_life {meta['half_life']!r} in index "
                f"meta at {path} (expected '<n> day[s]/hour[s]/"
                f"minute[s]')")
        mult = {"day": 86_400, "hour": 3_600, "minute": 60}[m.group(2)]
        hl_us = int(m.group(1)) * mult * 1_000_000
        delta = float(int(as_of_us) - int(meta["ref_ts_us"]))
        df = df.withColumn(
            "__s", F.col("__s") * F.lit(0.5 ** (delta / hl_us)))
    return df.select("key", "n",
                     F.round("__s", 6).alias("decayed_score"))
