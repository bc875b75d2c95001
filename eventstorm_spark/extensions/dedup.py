"""Deduplication operators over the ``documents`` table.

All candidate generation is JVM-side (split/transform/xxhash64/explode —
whole-stage codegen, no Python in the hot path), and the quadratic step
is always confined to LSH/blocking buckets:

- exact: hash-groupBy on content digest — one shuffle on the digest;
- n-gram Jaccard: explode shingles -> self-join on shingle -> per-pair
  intersection counts (shuffle key = shingle, pairs only materialize for
  docs that share a shingle);
- MinHash-LSH: signature = min(xxhash64(shingle, seed_b)) per band ->
  candidate pairs join per band bucket -> exact-Jaccard verification of
  candidates only;
- SimHash: sign-aggregated token hashes -> 64-bit fingerprint -> bucket
  by band of bits.

At 100 TB the shuffles are the story: shingle-explode multiplies rows by
~shingle count, so near-dup ops repartition by the join key and rely on
AQE to coalesce; the verification join is candidate-pair-sized (tiny vs
corpus).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from eventstorm_spark.localframe import local_frame

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_groups(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by content digest: one row per distinct
    content with the canonical (min) id and the duplicate count."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-duplicate class.

    Window-free formulation: a groupBy + self-semi-join on (digest,
    min_id) instead of row_number over a digest window, so the heavy
    side shuffles once on the digest and Catalyst can broadcast the
    (small) representative set when the dup rate is high.
    """
    reps = exact_groups(docs, text_col, id_col).select(
        "digest", F.col("canonical_id").alias(id_col))
    # eqNullSafe: null-text docs hash to a NULL digest; exact_groups puts
    # them all in one NULL-digest class, and a plain == join would drop
    # every one of them instead of keeping the representative.
    return docs.join(
        reps.withColumnRenamed(id_col, "__keep_id"),
        F.md5(F.col(text_col)).eqNullSafe(F.col("digest"))
        & (F.col(id_col) == F.col("__keep_id")),
        "left_semi",
    )


def streaming_exact_dedup(stream_df: DataFrame, *, key_cols: Sequence[str],
                          event_time_col: str = "ts",
                          watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    bounded by a watermark.

    ``dropDuplicatesWithinWatermark`` keeps the dedup state store from
    growing without bound — a key is remembered only until the watermark
    passes its event time, which is the only viable contract on an
    unbounded 100 TB/day feed (plain ``dropDuplicates`` on a stream pins
    every key forever). Late duplicates inside the delay are suppressed;
    duplicates older than the watermark are out of contract (route them
    to the batch ``exact_groups`` backfill).
    """
    wm = stream_df.withWatermark(event_time_col, watermark_delay)
    return wm.dropDuplicatesWithinWatermark(list(key_cols))


# ---------------------------------------------------------------------------
# shingling (shared by Jaccard / MinHash)
# ---------------------------------------------------------------------------


def with_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """id + distinct word-n-gram shingle array, all JVM-side:
    split -> sequence -> transform(slice + concat_ws) -> array_distinct.

    The ``transform`` higher-order function is interpreted per element —
    fine for candidate-sized inputs, wrong for corpus scans. Hot paths
    use :func:`shingle_rows` (codegen'd window form, ~2-3x faster at
    sf0.1 and the gap grows with document length)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return docs.select(F.col(id_col).alias("id"), shingles.alias("shingles"))


def _shingle_rows_raw(docs: DataFrame, n: int, text_col: str,
                      id_col: str, keep_cols: tuple = ()) -> DataFrame:
    """NON-distinct (id, *keep_cols, shingle) rows — the single
    shingling implementation every exploded consumer shares: posexplode
    tokens, then each shingle is ``concat_ws`` over n-1 ``lead()``
    columns in one window per document (whole-stage codegen; the only
    exchange is the window's hash partition by id). Docs shorter than
    n tokens yield their single truncated shingle (concat_ws skips the
    null leads). ``keep_cols`` are carried through untouched (e.g. a
    group column for per-source rollups) so callers never fork the
    tokenize/window/short-doc rules."""
    from pyspark.sql import Window as _W

    keep = [F.col(c) for c in keep_cols]
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = docs.select(*keep, F.col(id_col).alias("id"),
                      F.posexplode(toks).alias("pos", "t0"))
    w = _W.partitionBy("id").orderBy("pos")
    leads = [F.lead("t0", i).over(w).alias(f"t{i}") for i in range(1, n)]
    full = tok.select(*keep_cols, "id", "pos", "t0", *leads)
    last = f"t{n - 1}"
    return (
        full.where(F.col(last).isNotNull() | (F.col("pos") == 0))
        .select(*keep_cols, "id",
                F.concat_ws(" ", *[f"t{i}" for i in range(n)])
                .alias("shingle"))
    )


def shingle_rows(docs: DataFrame, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, shingle) rows — the exploded twin of
    :func:`with_shingles`; see :func:`_shingle_rows_raw` for the shared
    shingling core and its short-doc rule."""
    return _shingle_rows_raw(docs, n, text_col, id_col).distinct()


def ngram_jaccard_pairs(docs: DataFrame, *, n: int = 3, threshold: float = 0.8,
                        text_col: str = "text", id_col: str = "doc_id",
                        hash_join: bool = True) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1 shingle.

    explode -> self-join on shingle -> count common shingles ->
    jaccard = common / (|A| + |B| - common). Returns pairs (id_a < id_b)
    with jaccard >= threshold. The join key is the shingle, so disjoint
    documents never meet — this is blocking, not O(n²).

    ``hash_join=True`` (default) self-joins on ``xxhash64(shingle)``
    instead of the shingle string: the exchanged rows shrink from
    id + ~n-word string to id + 8 bytes (~20% faster at sf0.1; the win
    grows with shuffle volume). Distinct shingles colliding in 64 bits
    could in principle inflate a pair's common count — expected
    collisions are ~|shingles|²/2^65, and a *false pair* additionally
    needs enough collisions on one pair to cross the threshold, so the
    result is exact for any real corpus; pass ``hash_join=False`` for
    the strict string-key join.
    """
    # Materialize the shingle rows once: they feed the size aggregate AND
    # both sides of the self-join, and without pinning, Spark recomputes
    # the tokenize/explode/window lineage three times. localCheckpoint
    # stores them on executors (never the driver) and the join reuses
    # the exchange.
    ex = shingle_rows(docs, n, text_col, id_col)
    if hash_join:
        ex = ex.select("id", F.xxhash64("shingle").alias("shingle"))
    # the checkpoint otherwise lands in the distinct's AQE-coalesced
    # partitioning (2 partitions at sf0.1 — every downstream stage of
    # the pair pipeline then runs on 2-3 of 32 cores); widen it to the
    # parallelism floor ONLY when the docs scan itself is narrow (the
    # driver-SF signature — probing the scan, not the shuffled frame,
    # is reliable pre-AQE); at scale AQE sizes the distinct output by
    # bytes and the checkpoint keeps that layout
    _floor = max(1, docs.sparkSession.sparkContext.defaultParallelism // 4)
    if docs.rdd.getNumPartitions() < _floor:
        ex = ex.repartition(_floor, "id")
    ex = ex.localCheckpoint(eager=False)
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # Length prefilter (set-similarity join): J(A,B) <= min/max of the
    # set sizes, so pairs with a size ratio below the threshold can
    # never qualify. Checking it inside the shingle join prunes the
    # quadratic expansion (63% fewer pair-rows at sf0.1) before the
    # count shuffle ever sees them. `sizes` has one row per DOCUMENT —
    # unbounded at corpus scale — so no forced broadcast: the join key
    # `id` is the partitioning the shingle window already produced, and
    # Catalyst/AQE still picks broadcast when the corpus is small
    # (size-gating policy, same as the containment twin below).
    exs = ex.join(sizes, "id")
    a = exs.alias("a")
    b = exs.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id"))
               & (F.col("a.n_sh") * threshold <= F.col("b.n_sh"))
               & (F.col("b.n_sh") * threshold <= F.col("a.n_sh")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def source_ngram_overlap(docs: DataFrame, *, n: int = 3,
                         group_col: str = "source",
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         hash_join: bool = True,
                         prehashed: DataFrame | None = None) -> DataFrame:
    """Cross-SOURCE n-gram overlap matrix — the corpus-composition
    diagnostic run before mixing sources into a training set: for every
    pair of sources, how much of their shingle vocabulary is shared?
    Two crawls of the same sites, a dataset repackaged under a new
    name, or a benchmark leaked into a crawl all show up as an
    anomalously high row here before any per-document dedup runs.

    Returns (source_a, source_b, n_common, jaccard) for source_a <
    source_b, where jaccard is over the sources' DISTINCT shingle sets
    (set semantics — document frequency within a source doesn't
    inflate the overlap).

    Shape: the shared :func:`_shingle_rows_raw` shingling core
    (posexplode + ``lead()`` window — codegen, never interpreted
    per-element HOFs, SCALE.md §8; one tokenize/short-doc rule for
    every shingle consumer) with the group column carried through,
    then a per-source distinct; the self-join key is the shingle, so
    each shingle contributes at most ``(#sources choose 2)`` pair rows
    — the expansion is quadratic in the number of SOURCES (tens),
    never in documents. ``hash_join=True`` (default) hashes BEFORE the
    distinct, so both the dedup exchange and the join move 8-byte keys
    instead of n-word strings (identical counts short of 2^-64
    collisions — same argument as :func:`ngram_jaccard_pairs`).

    ``prehashed`` serves the matrix from an already-distinct
    ``(group_col, hash)`` frame instead of re-shingling ``docs`` — the
    share path for callers that also sketch the same shingle sets
    (:func:`q_kmv_source_overlap` builds ONE distinct-hash pass and
    feeds both the KMV sketch and this exact audit; any injective-
    modulo-collision hash yields the same counts, the ``hash_join``
    argument above). Rows must be distinct per (group, hash); ``n``/
    ``text_col``/``id_col``/``hash_join`` are ignored."""
    if prehashed is not None:
        # caller already materialized the distinct frame — a plain
        # rename over its blocks needs no second checkpoint copy
        gcol, hcol = prehashed.columns[0], prehashed.columns[1]
        ex = prehashed.select(F.col(gcol).alias("grp"),
                              F.col(hcol).alias("shingle"))
    else:
        pre = docs.select(F.col(group_col).alias("grp"),
                          F.col(id_col).alias("__doc"),
                          F.col(text_col).alias("__text"))
        # driver-SF narrow-scan guard (probe the scan, reliable
        # pre-AQE): widen the shingle explode (a generator — NOT
        # pushed back below the exchange, unlike plain projections)
        # and make the explicit repartition BE the dedup exchange
        # (user repartitions are never AQE-coalesced and
        # dropDuplicates reuses their partitioning); at scale the
        # scan is already wide and the plain distinct lets AQE size
        # the dedup output by bytes
        _floor = max(
            1, docs.sparkSession.sparkContext.defaultParallelism // 4)
        narrow = docs.rdd.getNumPartitions() < _floor
        if narrow:
            pre = pre.repartition(_floor, "__doc")
        raw = _shingle_rows_raw(pre, n, "__text", "__doc",
                                keep_cols=("grp",))
        ex = raw.select("grp", (F.xxhash64("shingle") if hash_join
                                else F.col("shingle")).alias("shingle"))
        ex = (ex.repartition(_floor, "grp", "shingle").dropDuplicates()
              if narrow else ex.distinct())
        # feeds the per-source sizes AND both join sides — pin it once
        ex = ex.localCheckpoint(eager=False)
    sizes = ex.groupBy("grp").agg(F.count(F.lit(1)).alias("n_sh"))
    a = ex.select(F.col("grp").alias("source_a"), "shingle")
    b = ex.select(F.col("grp").alias("source_b"), "shingle")
    common = (a.join(b, "shingle")
              .where(F.col("source_a") < F.col("source_b"))
              .groupBy("source_a", "source_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("grp").alias("source_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("source_b"),
                      F.col("n_sh").alias("n_b"))
    return (common.join(sa, "source_a").join(sb, "source_b")
            .select("source_a", "source_b", "n_common",
                    F.round(F.col("n_common")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_common")), 6).alias("jaccard")))


def ngram_containment_pairs(docs: DataFrame, *, n: int = 3,
                            threshold: float = 0.8,
                            text_col: str = "text", id_col: str = "doc_id",
                            hash_join: bool = True,
                            max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram CONTAINMENT similarity: ``C = common / min(|A|, |B|)``
    — the fraction of the smaller document's shingles found in the
    other. This is the doc-inside-doc detector (boilerplate wrappers,
    quoted articles, page templates around real content) that Jaccard
    structurally misses: a 100-shingle doc embedded verbatim in a
    5000-shingle page has J ≈ 0.02 but C = 1.0.

    Same blocked self-join shape as :func:`ngram_jaccard_pairs` — but
    deliberately WITHOUT the size-ratio prefilter, because unequal sizes
    are exactly the pairs this metric exists for. The candidate volume
    is still bounded by shared shingles (disjoint docs never meet).
    Unlike the Jaccard path, no prefilter can prune the stop-shingle
    fan-out here; set ``max_shingle_df`` at corpus scale to drop
    shingles shared by more than that many documents before the join —
    the standard stop-shingle cut, which biases containment DOWN by at
    most (dropped shingles)/min-size and is how this stays bucketed
    rather than quadratic on boilerplate-heavy crawls. The default
    (None) is exact.
    """
    ex = shingle_rows(docs, n, text_col, id_col)
    if hash_join:
        ex = ex.select("id", F.xxhash64("shingle").alias("shingle"))
    # the checkpoint otherwise lands in the distinct's AQE-coalesced
    # partitioning (2 partitions at sf0.1 — every downstream stage of
    # the pair pipeline then runs on 2-3 of 32 cores); widen it to the
    # parallelism floor ONLY when the docs scan itself is narrow (the
    # driver-SF signature — probing the scan, not the shuffled frame,
    # is reliable pre-AQE); at scale AQE sizes the distinct output by
    # bytes and the checkpoint keeps that layout
    _floor = max(1, docs.sparkSession.sparkContext.defaultParallelism // 4)
    if docs.rdd.getNumPartitions() < _floor:
        ex = ex.repartition(_floor, "id")
    ex = ex.localCheckpoint(eager=False)
    # denominators use the FULL shingle sets even when the join is
    # stop-shingle-pruned, so pruning only ever lowers the score
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    exj = ex
    if max_shingle_df is not None:
        keep = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") <= max_shingle_df).select("shingle"))
        exj = ex.join(keep, "shingle", "left_semi")
    a = exj.alias("a")
    b = exj.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "containment",
            F.round(F.col("common") / F.least(F.col("n_a"), F.col("n_b")), 6),
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def portable_hash60(col) -> "F.Column":
    """60-bit hash computable identically by Spark and DuckDB:
    the first 15 hex chars of md5, parsed base-16.

    Spark: ``conv(substring(md5(x),1,15),16,10)::long``; DuckDB:
    ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``. Always
    non-negative (< 2^60). Used by the ``portable=True`` mode of the
    MinHash/SimHash operators so an external SQL engine can replay the
    *exact* candidate sets for verification — xxhash64 stays the default
    (md5 costs ~2-3x more per call, which matters on corpus-scale
    shingle explosions, and portability is only needed by the oracle
    gate)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame, *, num_hashes: int = 64, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       portable: bool = False) -> DataFrame:
    """id + array<long> MinHash signature.

    hash_i(shingle) = xxhash64(shingle, i); sig[i] = min over shingles.
    With ``portable=True``, the hash family is Kirsch-Mitzenmacher
    double hashing over md5 halves — h_i(s) = (h1(s) + i*h2(s)) mod
    2^60 with h1/h2 the two 60-bit hex slices of one md5 — so the full
    signature is reproducible in any engine with md5 and exact 128-bit
    integer arithmetic; same plan shape, same banding math.

    Shape matters here: explode the shingles and compute the H hashes as
    ordinary projected columns feeding H ``min()`` aggregates. That keeps
    every expression inside whole-stage codegen with map-side partial
    aggregation — the shuffle carries one H-wide row per (task, doc). The
    tempting one-liner (nested ``transform``/``array_min`` higher-order
    functions) is interpreted per element and runs ~100x slower on wide
    corpora; the input is also repartitioned first so a single-file
    corpus doesn't serialize the hashing into one task.
    """
    ex = shingle_rows(docs, n, text_col, id_col).withColumnRenamed("shingle", "s")
    if portable:
        # Kirsch-Mitzenmacher double hashing: ONE md5 per shingle,
        # h_i = (h1 + i*h2) & (2^60-1) with h1 = 60-bit and h2 = 52-bit
        # hex slices — 64x fewer md5 calls than hashing per-i, and the
        # arithmetic stays in overflow-free int64 (i < 2^7, h2 < 2^52,
        # so h1 + i*h2 < 2^61): pure codegen'd long ops both engines
        # reproduce bit-for-bit.
        dig = F.md5(F.col("s"))
        h1 = F.conv(F.substring(dig, 1, 15), 16, 10).cast("long")
        h2 = F.conv(F.substring(dig, 16, 13), 16, 10).cast("long")
        ex = ex.select("id", h1.alias("__h1"), h2.alias("__h2"))
        mask = (1 << 60) - 1
        mins = [
            F.min((F.col("__h1") + F.lit(i) * F.col("__h2"))
                  .bitwiseAND(F.lit(mask))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        mins = [F.min(F.xxhash64("s", F.lit(i))).alias(f"h{i}")
                for i in range(num_hashes)]
    agged = ex.groupBy("id").agg(*mins)
    sig = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    return agged.select("id", sig.alias("signature"))


def band_buckets(signatures: DataFrame, *, bands: int = 16,
                 string_buckets: bool = False) -> DataFrame:
    """(id, band, bucket) rows — the banded LSH bucket keys of each
    signature. Shared by the in-corpus candidate join
    (:func:`minhash_lsh_candidates`) and the at-rest MinHash index
    (``curation.write_minhash_index``), so both surfaces bucket
    identically by construction. Bucket key = xxhash64 of the band's
    comma-joined slice (8-byte rows); ``string_buckets=True`` keeps the
    raw slice for engine-portable replay."""
    slice_str = lambda b: F.concat_ws(  # noqa: E731 — band slice as csv
        ",",
        F.transform(
            F.slice(
                F.col("signature"),
                b * (F.size("signature") / bands).cast("int") + 1,
                (F.size("signature") / bands).cast("int"),
            ),
            lambda x: x.cast("string"),
        ),
    )
    bucket_expr = (
        (lambda b: slice_str(b)) if string_buckets
        else (lambda b: F.xxhash64(slice_str(b)))
    )
    return signatures.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), bucket_expr)
        ).alias("band", "bucket"),
    )


def minhash_lsh_candidates(signatures: DataFrame, *, bands: int = 16,
                           string_buckets: bool = False,
                           max_bucket_size: int | None = None) -> DataFrame:
    """Band the signature, bucket-join per band -> distinct candidate pairs.

    rows_per_band = len(signature)/bands. Pair probability ≈
    1-(1-j^r)^b — with 64 hashes / 16 bands (r=4), j=0.8 pairs are
    caught w.p. ~0.9986.

    The bucket key is xxhash64 of the band slice (8-byte shuffle rows);
    ``string_buckets=True`` keeps the raw comma-joined slice as the key
    instead — wider rows, but reproducible verbatim by any SQL engine
    (the portable verification mode).

    ``max_bucket_size`` is the skew guard for corpus scale: a hot
    bucket of k members (a stop-shingle band, template spam) expands to
    k²/2 pair rows in the self-join; buckets above the cap are dropped
    before the join (semi-join on the small under-cap bucket list),
    bounding the quadratic term. Members of a dropped bucket still pair
    through their other bands, so recall degrades gracefully rather
    than the join exploding. Off by default — the driver-verified
    queries run uncapped so the oracle replays exactly.
    """
    banded = band_buckets(signatures, bands=bands,
                          string_buckets=string_buckets)
    banded = _cap_buckets(banded, max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _cap_buckets(banded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop (band, bucket) groups larger than the cap before a bucket
    self-join (see ``minhash_lsh_candidates``). One map-side-combinable
    count + a semi-join against the under-cap key list."""
    if max_bucket_size is None:
        return banded
    ok = (banded.groupBy("band", "bucket")
          .agg(F.count(F.lit(1)).alias("__n"))
          .where(F.col("__n") <= max_bucket_size)
          .select("band", "bucket"))
    return banded.join(ok, ["band", "bucket"], "left_semi")


def minhash_near_duplicates(docs: DataFrame, *, num_hashes: int = 64, bands: int = 16,
                            n: int = 3, threshold: float = 0.8,
                            text_col: str = "text", id_col: str = "doc_id",
                            portable: bool = False) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures -> banded candidates ->
    exact-Jaccard verification of candidates only. ``portable=True``
    switches both stages to md5-derived hashing so the whole candidate
    set (not just the verified output) is replayable in plain SQL —
    the driver's oracle gate runs that replay."""
    sigs = minhash_signatures(docs, num_hashes=num_hashes, n=n,
                              text_col=text_col, id_col=id_col,
                              portable=portable)
    cands = minhash_lsh_candidates(sigs, bands=bands, string_buckets=portable)
    # Verification only touches candidate docs: semi-join the corpus down
    # to the candidate id set before building shingle arrays, so the
    # interpreted-HOF array builder runs on O(candidates) rows. No forced
    # broadcast on the id set — on duplicate-saturated crawls candidates
    # are a corpus-scale fraction; AQE still broadcasts when it is small.
    cand_ids = (cands.select(F.col("id_a").alias("cid"))
                .union(cands.select(F.col("id_b").alias("cid"))).distinct())
    cand_docs = docs.join(
        cand_ids, docs[id_col] == cand_ids.cid, "left_semi")
    sh = with_shingles(cand_docs, n, text_col, id_col)
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("common")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(embeddings: DataFrame, *, threshold: float = 0.9,
                           block_size: int = 1024, vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """Exact embedding-space near-duplicate pairs: cosine >= threshold.

    All-pairs is quadratic by design (the verification tier — use
    ``embedding_near_duplicates`` for the LSH-pruned scale path), but the
    *shape* is a block-nested-loop GEMM, not a row-pair join: vectors are
    packed into ~block_size-row blocks, blocks are cross-joined (upper
    triangle only), and each block pair computes one numpy matmul inside
    an Arrow-batched UDF. Work per executor is O(block² · dim) dense
    float64 BLAS instead of per-pair interpreted expressions — on 2k×64
    vectors this is ~50x faster than a zip_with/aggregate pair join, and
    the block grid is what you'd distribute over a cluster.
    """
    n_rows = embeddings.count()
    n_blocks = max(1, -(-n_rows // block_size))

    packed_schema = "blk long, ids array<long>, mat array<double>"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        return pd.DataFrame({
            "blk": [int(pdf["__blk"].iloc[0])],
            "ids": [pdf["__id"].tolist()],
            "mat": [m.ravel().tolist()],
        })

    blocks = (
        embeddings.select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"),
            (F.abs(F.hash(F.col(id_col))) % n_blocks).alias("__blk"),
        )
        .groupBy("__blk").applyInPandas(pack, packed_schema)
    )

    a = blocks.alias("a")
    b = blocks.alias("b")
    grid = (
        a.join(b, F.col("a.blk") <= F.col("b.blk"))
        .select(F.col("a.ids").alias("ids_a"), F.col("a.mat").alias("mat_a"),
                F.col("b.ids").alias("ids_b"), F.col("b.mat").alias("mat_b"),
                (F.col("a.blk") == F.col("b.blk")).alias("same_blk"))
    )

    def score(batches):
        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for r in pdf.itertuples(index=False):
                ids_a = np.asarray(r.ids_a, dtype=np.int64)
                ids_b = np.asarray(r.ids_b, dtype=np.int64)
                ma = np.asarray(r.mat_a, dtype=np.float64).reshape(len(ids_a), -1)
                mb = np.asarray(r.mat_b, dtype=np.float64).reshape(len(ids_b), -1)
                sims = np.round(ma @ mb.T, 6)
                ii, jj = np.nonzero(sims >= threshold)
                ia, ib = ids_a[ii], ids_b[jj]
                keep = ia < ib if r.same_blk else np.ones(len(ia), dtype=bool)
                lo = np.where(ia < ib, ia, ib)[keep]
                hi = np.where(ia < ib, ib, ia)[keep]
                out_a.extend(lo.tolist())
                out_b.extend(hi.tolist())
                out_s.extend(sims[ii, jj][keep].tolist())
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "cosine_sim": out_s})

    return grid.mapInPandas(score, "id_a long, id_b long, cosine_sim double")


def embedding_near_duplicates(embeddings: DataFrame, *, threshold: float = 0.9,
                              num_planes: int = 36, bands: int = 6, seed: int = 42,
                              planes: list[list[float]] | None = None,
                              max_bucket_size: int | None = None,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id") -> DataFrame:
    """Scale path: banded random-hyperplane LSH candidates -> exact cosine
    verification of candidates only.

    Sign-LSH bit-agreement probability is 1 - theta/pi, so with r =
    num_planes/bands bits per band and b bands, a pair at cosine 0.9
    (theta ~= 26 deg) collides in >=1 band w.p. ~1-(1-0.855^6)^6 ~= 0.93,
    while orthogonal pairs are pruned almost surely. The corpus-sized
    shuffles key on (band, bucket); the quadratic step only runs inside
    buckets, and the verification join is candidate-pair-sized.

    Both numeric kernels are Arrow-batched numpy: the signature is one
    (batch x dim) @ (dim x planes) GEMM per Arrow batch, verification a
    vectorized row-wise cosine — no per-row interpreted expressions.
    """
    from pyspark.sql.functions import pandas_udf

    from eventstorm_spark.extensions.similarity import _hyperplanes

    # dim probe BEFORE the widen below: first() on the original frame
    # reads one row from the scan; on a repartitioned frame it would
    # pay the full vector shuffle just to learn the dimension
    dim = len(embeddings.select(vec_col).first()[0])

    # widen ONLY when the vector frame is under-partitioned (a 1-split
    # driver-SF scan serializes the banding GEMM below on one core —
    # profiled as ~0.3-0.4 s single-task stages in the composed
    # triplet-mining plan); at scale the scan already carries >= floor
    # partitions and no shuffle is added. PIN the widened frame (round
    # 18, the training-mix idiom): it feeds the banding branch AND both
    # vector-attach joins, and without the pin each branch re-ran the
    # widen exchange (three identical ~530 KB single-task scan+shuffle
    # stages per run in the round-18 profile — no cross-branch exchange
    # reuse). Only reached when the widen fires, i.e. narrow driver-SF
    # scans; at scale both are the same no-op.
    floor = max(
        1, embeddings.sparkSession.sparkContext.defaultParallelism // 4)
    if embeddings.rdd.getNumPartitions() < floor:
        embeddings = (embeddings.repartition(floor, F.col(id_col))
                      .localCheckpoint(eager=False))
    if planes is None:
        planes = _hyperplanes(dim, num_planes, seed)
    num_planes = len(planes)
    planes = np.asarray(planes, dtype=np.float64)
    r = num_planes // bands
    weights = (1 << np.arange(r)).astype(np.int64)

    @pandas_udf("array<long>")
    def band_buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes.T) >= 0  # n x planes
        buckets = np.stack(
            [bits[:, b * r:(b + 1) * r] @ weights + (b << 40) for b in range(bands)],
            axis=1,
        )
        return pd.Series(list(buckets.tolist()))

    # Candidate pairs stay SLIM (two ids): the banded self-join and the
    # dedup shuffle move 16-byte rows, not embedding payloads. Vectors
    # are re-attached afterwards — but only for candidate ids: the
    # (id, vec) projection is first SEMI-JOINED down to the candidate id
    # set, so the attach joins touch O(candidates) vectors, never the
    # full corpus-sized vector table. No forced broadcast anywhere in
    # the attach: AQE chooses broadcast when the pruned table is small
    # and degrades to a shuffle join on dup-heavy corpora.
    banded = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(band_buckets(F.col(vec_col))).alias("band", "bucket"),
    )
    banded = _cap_buckets(banded, max_bucket_size)  # hot-bucket skew guard
    a = banded.alias("a")
    b = banded.alias("b")
    pair_ids = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # branch-materialization idiom (SCALE.md §8): pair_ids feeds the
    # candidate-id union (twice) AND both vector-attach joins — without
    # a checkpoint the scan+GEMM+banded-join subtree is replanned under
    # every consumer (runtime exchange reuse dedupes the EXECUTION, but
    # the optimizer/codegen still pay for a plan that repeats the
    # subtree ~40x in mine_triplets' composed query). Candidate-pair-
    # sized, never corpus vectors.
    pair_ids = pair_ids.localCheckpoint(eager=False)
    cand_ids = (pair_ids.select(F.col("id_a").alias("cid"))
                .union(pair_ids.select(F.col("id_b").alias("cid")))
                .distinct())
    vecs = (embeddings.select(F.col(id_col).alias("__vid"),
                              F.col(vec_col).alias("__v"))
            .join(cand_ids, F.col("__vid") == F.col("cid"), "left_semi"))
    cands = (
        pair_ids
        .join(vecs, F.col("id_a") == F.col("__vid"))
        .select("id_a", "id_b", F.col("__v").alias("va"))
        .join(vecs, F.col("id_b") == F.col("__vid"))
        .select("id_a", "id_b", "va", F.col("__v").alias("vb"))
    )

    def verify(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.array([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
            vb = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb, axis=1)
            denom = np.where((na == 0) | (nb == 0), 1.0, na * nb)
            sims = np.round(np.einsum("ij,ij->i", va, vb) / denom, 6)
            keep = sims >= threshold
            yield pd.DataFrame({
                "id_a": pdf["id_a"].to_numpy()[keep],
                "id_b": pdf["id_b"].to_numpy()[keep],
                "cosine_sim": sims[keep],
            })

    return cands.mapInPandas(verify, "id_a long, id_b long, cosine_sim double")


def lsh_recall_audit(docs: DataFrame, *, sample_n: int = 300,
                     num_hashes: int = 64, bands: int = 16, n: int = 3,
                     bucket_edges: tuple = (0.5, 0.6, 0.7, 0.8, 0.9),
                     text_col: str = "text", id_col: str = "doc_id",
                     portable: bool = False) -> DataFrame:
    """Empirical banding-recall audit — measure the MinHash-LSH config
    against ground truth on YOUR corpus instead of trusting the
    theoretical s-curve (P(candidate) = 1-(1-j^r)^b assumes independent
    uniform hashes; real shingle distributions skew it). The standard
    question it answers: "is (num_hashes, bands) right for my dedup
    threshold, or am I silently losing near-dup pairs?"

    Method — everything bounded by construction:

    - sample = the ``sample_n`` LOWEST-ID docs (deterministic, so a SQL
      oracle replays it; all-pairs ground truth on the sample is
      <= sample_n²/2 pairs, computed via the blocked shingle join —
      the corpus itself is never all-paired);
    - ground truth = exact n-gram Jaccard >= min(bucket_edges) on the
      sample (:func:`ngram_jaccard_pairs`);
    - candidates = :func:`minhash_lsh_candidates` over
      :func:`minhash_signatures` of the SAME sample at the audited
      (num_hashes, bands) config;
    - output: one row per Jaccard bucket that has true pairs:
      (bucket_lo, n_true_pairs, n_caught, recall, recall_theory) where
      recall is the fraction of true pairs the banding surfaced and
      recall_theory = 1-(1-j^r)^b evaluated at the bucket's lower edge
      (r = num_hashes/bands) — printed side by side so a gap between
      measured and theoretical recall is visible in one report. Low
      recall in the >= your-threshold bucket means more bands (or
      hashes); high recall far below it means wasted candidate volume.

    At 100 TB the audit cost is one bounded sample — the corpus only
    contributes the sample scan. ``portable=True`` switches both the
    truth join and the banding to the md5 portable hashes so the
    driver oracle replays the exact report."""
    # the global sort+limit is the only corpus-sized cost; it feeds
    # BOTH the ground-truth branch and the signature branch, so pin it
    # once (branch-materialization idiom — without this each branch
    # re-runs the corpus scan+sort)
    sample = docs.orderBy(id_col).limit(int(sample_n)) \
        .localCheckpoint(eager=False)
    lo = min(bucket_edges)
    truth = ngram_jaccard_pairs(sample, n=n, threshold=lo,
                                text_col=text_col, id_col=id_col,
                                hash_join=not portable)
    sigs = minhash_signatures(sample, num_hashes=num_hashes, n=n,
                              text_col=text_col, id_col=id_col,
                              portable=portable)
    cands = (minhash_lsh_candidates(sigs, bands=bands,
                                    string_buckets=portable)
             .withColumn("__caught", F.lit(1)))
    edges = sorted(bucket_edges)
    bucket = F.lit(float(edges[0]))
    for e in edges[1:]:
        bucket = F.when(F.col("jaccard") >= float(e), float(e)) \
                  .otherwise(bucket)
    r_per_band = num_hashes // bands
    theory = F.round(
        1.0 - F.pow(1.0 - F.pow(F.col("bucket_lo"), F.lit(r_per_band)),
                    F.lit(bands)), 6)
    return (truth.join(cands, ["id_a", "id_b"], "left")
            .withColumn("bucket_lo", bucket)
            .groupBy("bucket_lo")
            .agg(F.count(F.lit(1)).alias("n_true_pairs"),
                 F.sum(F.coalesce("__caught", F.lit(0)))
                 .cast("long").alias("n_caught"))
            .withColumn("recall",
                        F.round(F.col("n_caught") / F.col("n_true_pairs"), 6))
            .withColumn("recall_theory", theory)
            .orderBy("bucket_lo"))


def embedding_lsh_recall_audit(embeddings: DataFrame, *,
                               sample_n: int = 200,
                               num_planes: int = 24, bands: int = 2,
                               planes: list[list[float]] | None = None,
                               seed: int = 42,
                               cos_edges: tuple = (0.5, 0.6, 0.7,
                                                   0.8, 0.9),
                               max_bucket_size: int | None = None,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id") -> DataFrame:
    """Sign-LSH twin of :func:`lsh_recall_audit`: measure a
    (num_planes, bands, max_bucket_size) banding config against exact
    ground truth on YOUR embedding distribution — the audit that
    tunes the hard-negative sampler / near-dup blocking the triplets
    and embedding-dedup tiers run on (theory assumes isotropic
    vectors; clustered real embeddings collide MORE within clusters
    and LESS across, and a bucket cap deliberately spends recall
    inside degenerate buckets for bounded candidate mass — this
    reports what that costs, per cosine bucket).

    Method, everything bounded by construction: sample = the
    ``sample_n`` LOWEST-ID vectors (deterministic, oracle-replayable);
    ground truth = ALL sample pairs with round-6 cosine >=
    min(cos_edges), computed as ONE GEMM over the sample inside a
    single ``applyInPandas`` group (bounded: sample_n x dim — no
    crossJoin, the corpus is never all-paired); candidates = the same
    banded (and optionally capped) buckets
    :func:`embedding_near_duplicates` uses, on the same sample.
    Output per cosine bucket: (bucket_lo, n_true_pairs, n_caught,
    recall, recall_theory) with recall_theory =
    ``1 - (1 - p^r)^b`` at the bucket's lower edge, ``p = 1 -
    acos(cos)/pi`` (the sign-LSH bit-agreement probability) — measured
    vs theoretical side by side, like the MinHash report."""
    import math as _math

    sample = (embeddings.select(F.col(id_col).alias("__id"),
                                F.col(vec_col).alias("__vec"))
              .orderBy("__id").limit(int(sample_n))
              .localCheckpoint(eager=False))
    lo = float(min(cos_edges))

    def truth_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["__vec"]])
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        sims = np.round((m / nrm[:, None]) @ (m / nrm[:, None]).T, 6)
        ia, ib = np.triu_indices(len(pdf), k=1)
        keep = sims[ia, ib] >= lo
        ids = pdf["__id"].to_numpy()
        return pd.DataFrame({"id_a": ids[ia[keep]],
                             "id_b": ids[ib[keep]],
                             "cos": sims[ia, ib][keep]})

    truth = (sample.withColumn("__g", F.lit(1)).groupBy("__g")
             .applyInPandas(truth_pairs,
                            "id_a long, id_b long, cos double"))
    cands = (embedding_near_duplicates(
        sample, threshold=-1.0, num_planes=num_planes, bands=bands,
        seed=seed, planes=planes, max_bucket_size=max_bucket_size,
        vec_col="__vec", id_col="__id")
        .select("id_a", "id_b").distinct()
        .withColumn("__caught", F.lit(1)))

    edges = sorted(float(e) for e in cos_edges)
    bucket = F.lit(edges[0])
    for e in edges[1:]:
        bucket = F.when(F.col("cos") >= e, e).otherwise(bucket)
    if planes is not None:
        num_planes = len(planes)
    r_per_band = num_planes // bands
    p_agree = 1.0 - F.acos(F.least(F.col("bucket_lo"), F.lit(1.0))) \
        / F.lit(_math.pi)
    theory = F.round(
        1.0 - F.pow(1.0 - F.pow(p_agree, F.lit(r_per_band)),
                    F.lit(bands)), 6)
    return (truth.join(cands, ["id_a", "id_b"], "left")
            .withColumn("bucket_lo", bucket)
            .groupBy("bucket_lo")
            .agg(F.count(F.lit(1)).alias("n_true_pairs"),
                 F.sum(F.coalesce("__caught", F.lit(0)))
                 .cast("long").alias("n_caught"))
            .withColumn("recall",
                        F.round(F.col("n_caught")
                                / F.col("n_true_pairs"), 6))
            .withColumn("recall_theory", theory)
            .orderBy("bucket_lo"))


def semantic_dedup(embeddings: DataFrame, *, n_centroids: int = 16,
                   tau: float = 0.4, centroids: list[list[float]] | None = None,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the embedding
    space, pick one representative per cluster, and drop every other
    member whose cosine to the representative is >= ``tau`` — semantic
    near-duplicate removal that catches paraphrases exact/MinHash dedup
    misses.

    Clustering reuses the IVF routing kernel (``similarity.ivf_topk``):
    cells are argmax-cosine against ``n_centroids`` deterministic
    centroids (the lowest-id vectors by default — oracle-replayable;
    pass ``centroids=kmeans_centroids(...)`` for trained cells at
    scale). The representative is the min-id member of each cell (the
    paper keeps one low-loss exemplar; min-id is the deterministic
    stand-in).

    Scale shape: cell assignment is one Arrow-batched GEMM projection
    over the scan; the representative table is exactly ``n_centroids``
    rows (provably bounded — broadcast), so the corpus never shuffles
    except the one tiny groupBy(min). Per-row verdicts mean the output
    is corpus-sized but slim. Returns (id, cell, cos_to_rep, dropped);
    filter ``dropped = 0`` for the surviving corpus.
    """
    from pyspark.sql.functions import pandas_udf

    if centroids is not None:
        cents = [[float(x) for x in c] for c in centroids]
    else:
        cent_rows = (embeddings.orderBy(id_col).limit(n_centroids)
                     .select(id_col, vec_col).collect())
        cents = [[float(x) for x in r[vec_col]] for r in cent_rows]
    cm = np.asarray(cents, dtype=np.float64)
    cn = np.linalg.norm(cm, axis=1, keepdims=True)
    cm = cm / np.where(cn == 0, 1.0, cn)

    @pandas_udf("int")
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(n == 0, 1.0, n)
        return pd.Series(np.argmax(m @ cm.T, axis=1).astype("int32"))

    @pandas_udf("double")
    def pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype=float)
        ma = np.array([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.array([np.asarray(v, dtype=np.float64) for v in b])
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = np.where((na == 0) | (nb == 0), 1.0, na * nb)
        return pd.Series(np.round(np.einsum("ij,ij->i", ma, mb) / denom, 6))

    assigned = (embeddings
                .select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
                .withColumn("cell", cell_udf(F.col("__v"))))
    assigned = assigned.localCheckpoint(eager=False)  # feeds reps AND join
    # One min_by aggregate yields (cell, rep_id, rep_vec) directly — no
    # self-join back for the representative's vector. The table has
    # exactly one row per non-empty cell: forced broadcast is safe
    # (bounded by n_centroids).
    rep_vecs = (assigned.groupBy(F.col("cell").alias("__rc"))
                .agg(F.min("id").alias("rep_id"),
                     F.min_by("__v", "id").alias("__rv")))
    out = (assigned.join(F.broadcast(rep_vecs),
                         F.col("cell") == F.col("__rc"))
           .withColumn("cos_to_rep", pair_cos(F.col("__v"), F.col("__rv"))))
    return out.select(
        F.col("id").alias(id_col),
        F.col("cell"),
        F.col("cos_to_rep"),
        ((F.col("id") != F.col("rep_id"))
         & (F.col("cos_to_rep") >= tau)).cast("int").alias("dropped"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, *, bits: int = 64, text_col: str = "text",
            id_col: str = "doc_id", portable: bool = False) -> DataFrame:
    """64-bit SimHash fingerprint per document, fully JVM-side.

    explode tokens -> xxhash64 -> 64 vectorized ±1-vote SUM aggregates
    (one per bit, columnar, codegen'd) -> fingerprint assembled from the
    vote signs. One shuffle on the doc id; no higher-order-function
    lambdas in the hot path.

    ``portable=True`` hashes tokens with :func:`portable_hash60` (and
    callers should set ``bits=60``) so the fingerprints are replayable
    by the SQL oracle; the vote/assembly machinery is shared.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    par = docs.sparkSession.sparkContext.defaultParallelism
    # on a narrow (driver-SF) scan cap the doc-id exchange at the
    # cores/4 fan-out floor (round 18 — full-width fan-out of a small
    # frame multiplies per-task fixed costs); at scale the full
    # session width stands as the vote-aggregate exchange
    if not docs.isStreaming and \
            docs.rdd.getNumPartitions() < max(1, par // 4):
        par = max(1, par // 4)
    tok_hash = (portable_hash60(F.col("tok")) if portable
                else F.xxhash64("tok"))
    ex = (
        docs.repartition(par, id_col)
        .select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
        .select("id", tok_hash.alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = ex.groupBy("id").agg(*votes)
    fingerprint = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        fingerprint = fingerprint.bitwiseOR(bit)
    return agg.select("id", fingerprint.alias("simhash"))


def simhash_buckets(docs: DataFrame, *, band_bits: int = 16, text_col: str = "text",
                    id_col: str = "doc_id", portable: bool = False,
                    max_bucket_size: int | None = None) -> DataFrame:
    """Near-dup candidate pairs whose SimHash agrees on >=1 of the 4
    16-bit bands (classic SimHash blocking). ``portable=True`` uses the
    md5-derived 60-bit fingerprint (4 x 15-bit bands) so the oracle can
    replay the candidate set. ``max_bucket_size`` bounds hot-bucket
    quadratic blowup exactly as in ``minhash_lsh_candidates``."""
    nbits = 60 if portable else 64
    if portable and band_bits == 16:
        band_bits = 15
    fp = simhash(docs, bits=nbits, text_col=text_col, id_col=id_col,
                 portable=portable)
    bands = nbits // band_bits
    mask = (1 << band_bits) - 1
    banded = fp.select(
        "id", "simhash",
        F.posexplode(
            F.array([
                F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(F.lit(mask))
                for b in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    banded = _cap_buckets(banded, max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("simhash_a"), F.col("b.simhash").alias("simhash_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# duplicate clustering (connected components) — pair -> cluster -> keep-one
# ---------------------------------------------------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u connects its larger neighbors to
    min(Γ(u) ∪ {u}). Emitted edges (v, m) have v > u >= m, so no self
    loops; one groupBy(min) + one join, both map-side combinable."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("__mn"))
    m = F.least(F.col("a"), F.col("__mn"))
    return (sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), m.alias("b"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges high->low; every node u connects
    its smaller neighbors (and itself) to its minimum neighbor."""
    o = e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("__mn"))
    part1 = (o.join(mins, "u")
             .where(F.col("v") != F.col("__mn"))
             .select(F.col("v").alias("a"), F.col("__mn").alias("b")))
    part2 = mins.select(F.col("u").alias("a"), F.col("__mn").alias("b"))
    return part1.union(part2).where(F.col("a") != F.col("b")).distinct()


def star_components(edges: DataFrame, *, id_a: str = "id_a",
                    id_b: str = "id_b",
                    max_iter: int = 40) -> tuple[DataFrame, int]:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): provably O(log n) rounds on ANY graph — the upgrade
    over plain min-label propagation, whose round count is the graph
    diameter and degrades on adversarially long chains.

    Each round is two groupBy-min + join stages over the (shrinking)
    edge list; ``localCheckpoint`` truncates lineage per round and the
    fixpoint test is a two-scalar checksum aggregate (count + summed
    edge hash), not a driver collect. Returns ``(labels, rounds)``
    where labels is (node, comp) with comp = the component's min id and
    ``rounds`` counts the graph-mutating rounds (the final
    checksum-equal confirmation pass is not counted — it changes
    nothing; a 10k-node path converges in ~14 ≈ log2(n) rounds).
    """
    e = (edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
         .where(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    prev = None
    rounds = 0
    for i in range(1, max_iter + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        chk = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: an int64 sum of 64-bit hashes overflows ANSI
            F.sum(F.xxhash64(F.least("a", "b"), F.greatest("a", "b"))
                  .cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        cur = (chk["n"], chk["h"])
        if cur == prev:
            break
        rounds = i
        prev = cur
    # at fixpoint every edge points at its component min (star form)
    lbl = e.groupBy("a").agg(F.min("b").alias("comp"))
    centers = e.select(F.col("b").alias("a"), F.col("b").alias("comp")).distinct()
    labels = (lbl.unionByName(centers)
              .groupBy("a").agg(F.min("comp").alias("comp")))
    return labels, rounds


def duplicate_clusters(pairs: DataFrame, docs: DataFrame | None = None, *,
                       id_col: str = "doc_id", id_a: str = "id_a",
                       id_b: str = "id_b", max_iter: int = 25,
                       driver_threshold: int = 1_000_000,
                       algorithm: str = "auto") -> DataFrame:
    """Connected components over duplicate-candidate pairs: the missing
    step between pairwise near-dup detection and corpus-level dedup
    (A~B, B~C must collapse to ONE cluster, though A~C never scored).

    Iterative min-label propagation: every node starts labeled with its
    own id; each round, each node takes the min label over itself and
    its neighbors; fixpoint = each component labeled by its min member.
    Each round is exactly one shuffle of the (symmetrized) edge list
    keyed by neighbor, and one groupBy(node) min — both map-side
    combinable. ``localCheckpoint`` truncates lineage per round so the
    plan doesn't stack across iterations. Rounds needed = graph
    diameter; duplicate clusters are short-diameter by construction
    (most are cliques from a shared LSH bucket), so this converges in
    2-4 rounds in practice; ``max_iter`` caps pathological chains.

    At 100 TB the edge list is candidate-pair-scale (tiny vs corpus) and
    carries ids only; ``algorithm="star"`` switches to the
    large-star/small-star variant (:func:`star_components`) whose round
    count is O(log n) regardless of graph diameter — the pick for
    adversarially long chains. ``"auto"`` (default) keeps the tiered
    driver-union-find / min-label-propagation behavior.

    Returns ``(doc_id, cluster_id)`` — for every node of ``pairs``, or
    for every row of ``docs`` when given (non-paired docs map to
    themselves).
    """
    if algorithm == "star":
        labels, _ = star_components(pairs, id_a=id_a, id_b=id_b)
        out = labels.select(F.col("a").alias(id_col),
                            F.col("comp").alias("cluster_id"))
        if docs is None:
            return out
        return (docs.select(id_col)
                .join(out, id_col, "left_outer")
                .select(id_col,
                        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")))

    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = edges.localCheckpoint(eager=False)

    # Candidate-pair edge lists are tiny relative to the corpus (that is
    # the point of LSH/blocking), so below the threshold the components
    # are solved driver-side with union-find on the id-only edges — the
    # same data volume a broadcast would ship, replacing ~2 Spark jobs
    # per propagation round with one collect. The distributed loop below
    # remains the path for genuinely huge edge sets.
    if edges.count() <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for ea, eb in edges.collect():
            parent.setdefault(ea, ea)
            parent.setdefault(eb, eb)
            ra, rb = find(ea), find(eb)
            if ra != rb:  # min-id root keeps labels = min member
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        mapping = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        id_type = dict(pairs.dtypes)[id_a]
        out = local_frame(spark, 
            mapping or [(None, None)],
            f"{id_col} {id_type}, cluster_id {id_type}")
        if mapping == []:
            out = out.where(F.col(id_col).isNotNull())
        if docs is None:
            return out
        return (docs.select(id_col)
                .join(F.broadcast(out), id_col, "left_outer")
                .select(id_col,
                        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")))

    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=False)
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .select("node", F.col("node").alias("comp")))
    comp_type = dict(labels.dtypes)["comp"]
    for _ in range(max_iter):
        # carry the previous label ("old") through the propagation groupBy
        # so convergence is read off the just-materialized result — one
        # shuffle job per round, no separate compare join
        nbr = (sym.join(labels, sym.b == labels.node)
               .select(sym.a.alias("node"), "comp",
                       F.lit(None).cast(comp_type).alias("old")))
        new = (labels.select("node", "comp", F.col("comp").alias("old"))
               .unionByName(nbr)
               .groupBy("node").agg(F.min("comp").alias("comp"),
                                    F.min("old").alias("old"))
               .localCheckpoint(eager=True))
        changed = new.where(F.col("comp") != F.col("old")).count()
        labels = new.select("node", "comp")
        if changed == 0:
            break
    out = labels.select(F.col("node").alias(id_col), F.col("comp").alias("cluster_id"))
    if docs is None:
        return out
    return (docs.select(id_col)
            .join(out, id_col, "left_outer")
            .select(id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")))


def streaming_near_dup_pairs(docs_stream: DataFrame, *, n: int = 3,
                             num_hashes: int = 64, bands: int = 16,
                             threshold: float = 0.8,
                             retention_secs: float = 600.0,
                             max_entries_per_bucket: int = 256,
                             event_time_col: str = "ts",
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection: emits pairs
    ``(id_a, id_b, jaccard_est, band)`` where the later-arriving doc is
    a near-duplicate of one seen within the retention window — the
    online twin of ``minhash_near_duplicates`` for ingest-time dedup.

    Shape: shingles, the MinHash signature and the band buckets are
    computed per row (row-local expressions — no extra stateful
    aggregation on the stream; the per-element HOF cost is bounded by
    micro-batch volume, unlike a corpus scan); rows are exploded to one
    per band and keyed by ``(band, bucket)``. Each key's state holds
    the (id, signature, event-time) of docs seen within
    ``retention_secs``; a new arrival is scored against its bucket's
    state docs with the signature-estimated Jaccard (matching MinHash
    components / ``num_hashes`` — the standard unbiased estimator),
    emitting a pair per hit. Exact verification, when needed, is a
    downstream batch join of the emitted pairs against the document
    table — keeping full shingle sets in streaming state would make
    state rows O(document length); the signature bounds each entry at
    O(num_hashes) regardless of how long documents are.

    State is bounded on BOTH axes: entries are evicted by event time
    against the key's high-watermark (memory is retention x per-bucket
    arrival rate — never the corpus), and a hot bucket (template spam
    hashing identical bands) is capped at ``max_entries_per_bucket``
    most-recent entries, mirroring the batch path's ``_cap_buckets``
    skew guard — recall for capped buckets degrades gracefully through
    the other bands.

    Document ids pass through with their input type (long, string, ...)
    — the output id columns adopt ``id_col``'s dataType.

    A pair colliding in several bands is emitted once per band (the
    ``band`` column lets consumers ``dropDuplicates([id_a, id_b])``
    downstream); deduplicating inside would chain a second stateful
    operator onto the query, which buys nothing at candidate-pair
    volumes.
    """
    import json as _json

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    r = num_hashes // bands
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s, i))),
    )
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(",", F.transform(
                F.slice(F.col("__sig"), b * r + 1, r),
                lambda x: x.cast("string")))),
    )
    banded = (
        docs_stream
        .select(F.col(id_col).alias("__id"),
                F.col(event_time_col).cast("double").alias("__ts"),
                shingles.alias("__sh"))
        .withColumn("__sig", sig)
        .select("__id", "__ts", "__sig",
                F.posexplode(buckets).alias("__band", "__bucket"))
        .withColumn("__key", F.concat_ws(":", "__band", "__bucket"))
    )

    id_type = docs_stream.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, jaccard_est double, band int"
    state_schema = "state string"

    def fold(key, pdf_iter, state: GroupState):
        entries = _json.loads(state.get[0]) if state.exists else []
        hwm = max((e["ts"] for e in entries), default=float("-inf"))
        rows = []
        for pdf in pdf_iter:
            # itertuples renames leading-underscore columns; index by name
            for did, ts, sg, band in zip(pdf["__id"], pdf["__ts"],
                                         pdf["__sig"], pdf["__band"]):
                # numpy scalars -> plain Python so state JSON-serializes
                did = did.item() if hasattr(did, "item") else did
                rows.append((did, float(ts), [int(x) for x in sg], int(band)))
        rows.sort(key=lambda t: (t[1], str(t[0])))  # arrival = event-time order
        out_a, out_b, out_j, out_band = [], [], [], []
        for did, ts, sg, band in rows:
            hwm = max(hwm, ts)
            # evict BEFORE comparing: a doc must not pair with entries
            # its own arrival just pushed outside the retention window
            entries = [e for e in entries if e["ts"] >= hwm - retention_secs]
            for e in entries:
                if e["id"] == did:
                    continue
                match = sum(1 for a, b in zip(sg, e["sig"]) if a == b)
                j = round(match / num_hashes, 6)
                if j >= threshold:
                    lo, hi = sorted((e["id"], did))
                    out_a.append(lo)
                    out_b.append(hi)
                    out_j.append(j)
                    out_band.append(band)
            entries.append({"id": did, "ts": ts, "sig": sg})
            if len(entries) > max_entries_per_bucket:
                # hot-bucket skew cap: keep the most recent entries
                entries.sort(key=lambda e: (e["ts"], str(e["id"])))
                entries = entries[-max_entries_per_bucket:]
        entries = [e for e in entries if e["ts"] >= hwm - retention_secs]
        state.update((_json.dumps(entries, sort_keys=True),))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                "jaccard_est": out_j, "band": out_band})

    return banded.groupBy("__key").applyInPandasWithState(
        fold, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def edit_distance_pairs(docs: DataFrame, *, threshold: float = 0.8,
                        n: int = 3, max_shingle_df: int | None = None,
                        text_col: str = "text", id_col: str = "doc_id",
                        hash_join: bool = True) -> DataFrame:
    """Fuzzy near-dup pairs verified by normalized EDIT DISTANCE:
    ``edit_sim = 1 - levenshtein(a, b) / max(len(a), len(b))`` over
    every pair sharing >= 1 word n-gram shingle. The character-level
    complement of the shingle-set scores: Jaccard/containment ignore
    ORDER and miss small in-word edits (typo squatting, template slot
    fills, OCR noise); Levenshtein prices every insert/delete/
    substitute — the record-linkage verify step.

    Same blocking as :func:`ngram_jaccard_pairs` (shingle self-join —
    disjoint docs never meet), then the verify joins the two texts for
    CANDIDATE pairs only: the DP is O(len_a * len_b) per candidate,
    all JVM-side (``levenshtein`` is a codegen builtin in both Spark
    and the DuckDB oracle, identical unit-cost semantics). At corpus
    scale set ``max_shingle_df`` (the stop-shingle cut) to keep the
    candidate stage bucketed on boilerplate-heavy crawls; the default
    (None) is exact oracle-replay mode — the same contract as the rest
    of the pair family.
    """
    ex = shingle_rows(docs, n, text_col, id_col)
    if hash_join:
        ex = ex.select("id", F.xxhash64("shingle").alias("shingle"))
    if max_shingle_df is not None:
        keep = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") <= max_shingle_df).select("shingle"))
        ex = ex.join(keep, "shingle", "left_semi")
    a = ex.alias("a")
    b = ex.alias("b")
    cand = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    # Exact pre-prune on lengths BEFORE any text moves or DP runs:
    # levenshtein(a, b) >= |len(a) - len(b)|, so a pair whose length
    # gap alone exceeds (1 - threshold) * max(len) cannot reach the
    # threshold. The prune joins 8-byte lengths, and only survivors
    # shuffle their text into the O(len^2) verify — the DP is the cost
    # center here (~0.4 ms/pair at ~200 chars, measured), so cutting
    # candidates before it is worth more than any join reordering.
    lens = docs.select(F.col(id_col).alias("__lid"),
                       F.length(text_col).alias("__len"))
    la = lens.select(F.col("__lid").alias("id_a"),
                     F.col("__len").alias("__la"))
    lb = lens.select(F.col("__lid").alias("id_b"),
                     F.col("__len").alias("__lb"))
    cand = (cand.join(la, "id_a").join(lb, "id_b")
            .where(F.abs(F.col("__la") - F.col("__lb"))
                   <= (1.0 - threshold) * F.greatest("__la", "__lb"))
            .select("id_a", "id_b"))
    ta = docs.select(F.col(id_col).alias("id_a"),
                     F.col(text_col).alias("__ta"))
    tb = docs.select(F.col(id_col).alias("id_b"),
                     F.col(text_col).alias("__tb"))
    sim = (F.lit(1.0) - F.levenshtein("__ta", "__tb")
           / F.greatest(F.length("__ta"), F.length("__tb")))
    return (cand.join(ta, "id_a").join(tb, "id_b")
            .select("id_a", "id_b", F.round(sim, 6).alias("edit_sim"))
            .where(F.col("edit_sim") >= threshold))


def keep_best_near_duplicates(docs: DataFrame, pairs: DataFrame, *,
                              score_col: str, id_col: str = "doc_id",
                              id_a: str = "id_a",
                              id_b: str = "id_b") -> DataFrame:
    """Quality-aware keep-one: within each duplicate cluster keep the
    highest-``score_col`` member (ties break to the min id), instead of
    :func:`drop_near_duplicates`' arbitrary min-id representative.

    This is how production dedup actually picks survivors (keep the
    longest / highest-quality copy of boilerplate-heavy content, not
    whichever crawled first) — compose with ``text.quality_features``
    or ``text.linear_quality_score`` for a model-picked representative.

    Scale shape: the cluster-label table is corpus-sized but ~16 B/row;
    the representative choice is ONE ``max_by(id, (score, -id))``
    aggregate keyed by cluster (map-side combinable — no per-cluster
    window sort), and the corpus payloads move only through the final
    semi join against the cluster-count-sized keep set.
    """
    labels = duplicate_clusters(pairs, docs, id_col=id_col,
                                id_a=id_a, id_b=id_b)
    scored = labels.join(docs.select(id_col, score_col), id_col)
    keep = (scored.groupBy("cluster_id")
            .agg(F.max_by(
                id_col,
                F.struct(F.col(score_col).alias("s"),
                         (-F.col(id_col)).alias("t"))).alias(id_col))
            .select(id_col))
    return docs.join(keep, id_col, "left_semi")


def drop_near_duplicates(docs: DataFrame, pairs: DataFrame, *,
                         id_col: str = "doc_id", id_a: str = "id_a",
                         id_b: str = "id_b") -> DataFrame:
    """Keep one representative per duplicate cluster: the min-id member
    (== the cluster label, since labels are min-propagated ids). The
    final filter is a broadcast-friendly semi join of the corpus against
    the (cluster-count-sized) representative set."""
    labels = duplicate_clusters(pairs, docs, id_col=id_col, id_a=id_a, id_b=id_b)
    keep = labels.where(F.col(id_col) == F.col("cluster_id")).select(id_col)
    return docs.join(keep, id_col, "left_semi")
