"""Sequence packing: slice a token-ordered corpus into fixed-length
training sequences (the GPT-style "concatenate everything, cut every
``seq_len`` tokens" pass that turns filtered documents into model-ready
samples).

Each document owns the half-open global token span
``[start, start + n_tokens)`` where ``start`` is the cumulative token
count of all earlier documents (ordered by id); sequence ``s`` covers
``[s * seq_len, (s + 1) * seq_len)``. The output is the doc x sequence
overlap table — which slice of which document lands in which training
sequence, including documents that straddle a boundary and are split
across two (or more) sequences.

The global cumulative sum is the scale-sensitive step: the naive form
is a window over ``ORDER BY id`` with no partition key, which Spark
executes as an ``Exchange SinglePartition`` — one task holding the
whole corpus. This module uses the standard two-phase distributed
cumsum instead (same idiom as the system-projection position assigner,
``projections/system.py``): range-partition by id, cumsum *within* each
partition, collect only the per-partition token totals (``O(partitions)``
rows), and broadcast the running offsets back as a literal map. One
range shuffle, nothing corpus-sized on the driver, no single-partition
exchange — pinned by ``tests/test_plans.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def global_token_offsets(docs: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id",
                         num_partitions: int | None = None) -> DataFrame:
    """(id, n_tokens, start) for every document with >= 1 word token,
    where ``start`` is the exclusive cumulative token count over all
    lower-id documents — the distributed global cumsum described in the
    module docstring. Tokens are the lowercase alphanumeric runs the LM
    operators use (``[a-z0-9]+``), so packed token counts line up with
    ``unigram_logprob``/``vocab_stats`` budgets."""
    spark = docs.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism

    toks = (docs.select(
        F.col(id_col).alias("id"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .cast("long").alias("n_tokens"))
        .where(F.col("n_tokens") > 0))
    # Phase 1: range-partition by id so partition k holds an id range
    # strictly below partition k+1's; localCheckpoint pins the sampled
    # range boundaries so the totals pass and the cumsum pass see the
    # same partitioning.
    part = (toks.repartitionByRange(n_parts, "id")
            .sortWithinPartitions("id")
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    totals = part.groupBy("__pid").agg(F.sum("n_tokens").alias("t")).collect()
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = run
        run += r["t"]
    if not offsets:
        return part.select("id", "n_tokens",
                           F.lit(0).cast("long").alias("start"))
    off_map = F.create_map(
        *[F.lit(v) for pid, off in offsets.items() for v in (pid, off)])
    # Phase 2: per-partition cumsum + the broadcast partition offset.
    w = W.partitionBy("__pid").orderBy("id")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")
             + off_map[F.col("__pid")]).cast("long")
    return part.select("id", "n_tokens", start.alias("start"))


def pack_token_spans(docs: DataFrame, *, seq_len: int = 512,
                     text_col: str = "text", id_col: str = "doc_id",
                     num_partitions: int | None = None) -> DataFrame:
    """The doc x sequence overlap table: one row per (sequence, document
    slice) with the slice's offset inside the document and its token
    count. Row-local arithmetic over :func:`global_token_offsets` — the
    boundary-straddle explode is ``F.sequence`` over the (tiny) range of
    sequence ids a document touches, so a document spanning k sequences
    emits k rows and everything stays a projection after the one range
    shuffle.

    Deterministic given the corpus and ``seq_len`` (packing order is id
    order), so an external SQL engine reproduces it bit-for-bit. A
    grown corpus only appends — existing (seq_id, doc) rows never
    change — PROVIDED new documents arrive with ids greater than every
    existing id (monotone ingest ids): packing order is id order, so a
    smaller or interleaved id shifts every downstream start offset and
    rewrites rows. Key ingestion on a monotone id (or pack on an
    explicit ingest-order column) when relying on incremental
    repacking.
    """
    spans = global_token_offsets(docs, text_col=text_col, id_col=id_col,
                                 num_partitions=num_partitions)
    end = F.col("start") + F.col("n_tokens")
    # integer `div` (not floor of a double division) so offsets stay
    # exact past 2^53 total tokens
    seq_first = F.expr(f"start div {seq_len}")
    seq_last = F.expr(f"(start + n_tokens - 1) div {seq_len}")
    out = (spans
           .withColumn("seq_id", F.explode(F.sequence(seq_first, seq_last)))
           .withColumn("__s", F.greatest(F.col("start"),
                                         F.col("seq_id") * seq_len))
           .withColumn("__e", F.least(end, (F.col("seq_id") + 1) * seq_len)))
    return out.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("id").alias(id_col),
        (F.col("__s") - F.col("start")).cast("long").alias("off_in_doc"),
        (F.col("__e") - F.col("__s")).cast("long").alias("n_toks"),
    )
