"""Text-analysis operators over the ``documents`` table.

All pure JVM expressions (split/regexp/array functions) — no UDFs, so
they pipeline inside whole-stage codegen on a corpus scan. Each has an
exact SQL twin for the DuckDB oracle (see inventory).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language function-word lists for the n-gram/stopword
# language-id heuristic. Deliberately tiny and deterministic.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
}

# Scale-mode default for the substring family's hot-fingerprint cap
# (``winnow_matches`` / ``exact_substring_*`` with ``scale=True``): a
# fingerprint carried by k documents expands to k²/2 candidate pairs in
# the blocked self-join, so an uncapped run on a boilerplate-dense
# corpus goes near-all-pairs (measured: 34.5M pairs from min_shared=1
# at a 50k-doc probe — SCALE.md §8/§10). 128 sits inside the 50–500
# boilerplate knee documented there: fingerprints shared by more
# documents than this are, by construction, the license headers and
# template nav a scrubber excises from every copy anyway.
SCALE_MAX_FINGERPRINT_DF = 128


def _resolve_fingerprint_cap(max_fingerprint_df: int | None,
                             scale: bool) -> int | None:
    """``scale=True`` fills the documented corpus-scale default for
    ``max_fingerprint_df`` when the caller didn't pick one; an explicit
    cap always wins. ``scale=False`` (oracle mode) stays uncapped so a
    SQL oracle replays the exact candidate set."""
    if scale and max_fingerprint_df is None:
        return SCALE_MAX_FINGERPRINT_DF
    return max_fingerprint_df


def _widen_narrow(docs: DataFrame) -> DataFrame:
    """Fan out before a per-row tokenize/regex pass when the source
    arrives in fewer partitions than half the cores (the driver
    testdata is one parquet file — without this the map stage
    serializes into one task). Width is cores/4 — the round-17
    measured floor for small widened frames — NOT the full core count:
    the round-18 stage profile showed full-width fan-out multiplying
    per-task fixed costs (the 5,000-doc tokenize cost 7.1 task-seconds
    across 32 tasks, and every bench consumer of these widens
    anti-scaled, c8/c32 0.52-0.82 — 8 cores materially FASTER than
    32). At cluster scale the scan already yields
    maxPartitionBytes-sized splits and this branch is a no-op; on a
    streaming frame partition probing is illegal (and the widen
    meaningless), so streams pass through untouched."""
    if docs.isStreaming:
        return docs
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par // 2:
        docs = docs.repartition(max(1, par // 4))
    return docs


def tokens(text_col: Column) -> Column:
    return F.split(F.trim(text_col), r"\s+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (long, matching SQL engines' BIGINT len())."""
    return F.size(tokens(text_col)).cast("long")


def word_token_count(text_col: Column) -> Column:
    """BPE-ish word/punct token count: alpha runs, digit runs, or single
    non-space symbols — the classic pre-tokenizer regex."""
    return F.size(
        F.regexp_extract_all(text_col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("long")


def quality_features(docs: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: lengths, token stats, punct/upper ratios,
    stopword ratio (English list) — the standard corpus-filtering bundle."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    n_upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), 0))
    n_stop = F.size(F.array_intersect(toks, F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])))
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_upper / n_chars, 6).alias("upper_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_distinct_ratio"),
    )


def lang_scores(docs: DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language scores + argmax guess.

    score_lang = |distinct(tokens) ∩ stopwords_lang|; guess = argmax
    (ties broken by language code order, deterministic in both engines).
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    cols = [F.col(id_col)]
    score_cols = {}
    for lang, words in sorted(LANG_STOPWORDS.items()):
        c = F.size(F.array_intersect(toks, F.array([F.lit(w) for w in words]))).cast("long")
        score_cols[lang] = c
        cols.append(c.alias(f"score_{lang}"))
    best = None
    for lang in sorted(LANG_STOPWORDS):  # later langs win only on strictly-greater
        if best is None:
            best = F.struct(score_cols[lang].alias("s"), F.lit(lang).alias("l"))
        else:
            cand = F.struct(score_cols[lang].alias("s"), F.lit(lang).alias("l"))
            best = F.when(cand["s"] > best["s"], cand).otherwise(best)
    cols.append(best["l"].alias("lang_guess"))
    return docs.select(*cols)


def fingerprints(docs: DataFrame, *, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: lexicographic-min md5 hex over word n-gram
    shingles (winnowing's min-selection). Hex-string min is
    engine-portable, so the oracle can verify exactly. Runs on the
    codegen'd exploded-shingle path (``dedup.shingle_rows``) — a min()
    aggregate with map-side combine, no per-element higher-order
    functions."""
    from eventstorm_spark.extensions.dedup import shingle_rows

    rows = shingle_rows(docs, n, text_col, id_col)
    return (rows.groupBy(F.col("id").alias(id_col))
            .agg(F.min(F.md5("shingle")).alias("fingerprint")))


def positional_shingle_hashes(docs: DataFrame, *, n: int = 3,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              portable: bool = False) -> DataFrame:
    """(doc_id, pos, h, n_sh): the hash of the word n-gram starting at
    every token position, in document order — the positional twin of
    ``dedup.shingle_rows`` (which dedupes and drops positions). Same
    plan skeleton: posexplode + lead() window per document, everything
    codegen'd; the one exchange is the per-document window hash
    partition. Docs shorter than ``n`` tokens yield their single
    truncated shingle at pos 0. ``portable=True`` hashes with the
    md5-derived 60-bit family so a SQL oracle replays exactly."""
    from pyspark.sql import Window as _W

    from eventstorm_spark.extensions.dedup import portable_hash60

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tok = docs.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(toks).alias("pos", "t0"))
    w = _W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("t0", i).over(w).alias(f"t{i}") for i in range(1, n)]
    full = tok.select("doc_id", "pos", "t0", *leads)
    last = f"t{n - 1}"
    sh = (full.where(F.col(last).isNotNull() | (F.col("pos") == 0))
          .select("doc_id", "pos",
                  F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias("sh")))
    h = portable_hash60(F.col("sh")) if portable else F.xxhash64("sh")
    cnt = F.count(F.lit(1)).over(_W.partitionBy("doc_id"))
    return sh.select("doc_id", "pos", h.alias("h"), cnt.alias("n_sh"))


def winnow_fingerprints(docs: DataFrame, *, n: int = 3, window: int = 4,
                        text_col: str = "text", id_col: str = "doc_id",
                        portable: bool = False) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, MOSS): select each sliding
    window's minimum shingle hash as a LOCAL fingerprint —
    (doc_id, pos, fingerprint) rows. Guarantee: any shared token run of
    length >= window + n - 1 between two documents produces at least
    one shared fingerprint, which is what makes this the
    substring-level complement of global MinHash (which only sees
    whole-document similarity).

    A position p is selected iff its hash is the minimum of SOME full
    window containing p (all argmin positions on ties — deterministic
    and engine-portable, unlike rightmost-tie winnowing which needs
    argmin-over-frame semantics engines disagree on). Expressed as two
    window passes over the SAME per-document partitioning (no second
    exchange): the trailing full-window min m[e], then a forward max of
    m over the windows ending at [p, p+window-1] — since m[e] <= h[p]
    for every window containing p, ``h[p] == max(m[e])`` holds exactly
    when p is some window's argmin. Docs with fewer shingles than the
    window form one whole-doc window. Fingerprint density ~2/(window+1)
    of positions."""
    from pyspark.sql import Window as _W

    # Fan out before the shingle explode when the source arrives in
    # fewer partitions than cores (the driver testdata is one parquet
    # file — without this the tokenize + posexplode map work serializes
    # into one task). Hash-partitioning on the doc id rather than
    # round-robin makes this exchange BE the per-document window's
    # exchange (the round-17 dedup-exchange idiom): the posexplode
    # generator preserves its child's partitioning and is never pushed
    # below a user repartition, so the two window passes reuse it and
    # the exploded shingle rows are never shuffled at all — the one
    # exchange carries raw docs, ~4x fewer bytes than the shingle rows
    # it replaces. Width = cores/4, the round-17 memoized-frame floor
    # (full fan-out of a small frame multiplies per-task fixed costs —
    # the E3 sweep), not the session shuffle width; any hash partition
    # count satisfies the window's clustering, so the count is free to
    # choose. At cluster scale the scan already yields
    # maxPartitionBytes-sized splits and this branch is a no-op.
    # streaming frames can't be partition-probed (.rdd is illegal on a
    # streaming plan) and are served by winnow_fingerprint_expr anyway
    if not docs.isStreaming:
        par = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par // 2:
            docs = docs.repartition(max(1, par // 4), F.col(id_col))
    ph = positional_shingle_hashes(docs, n=n, text_col=text_col,
                                   id_col=id_col, portable=portable)
    by_pos = _W.partitionBy("doc_id").orderBy("pos")
    m = F.min("h").over(by_pos.rowsBetween(-(window - 1), 0))
    m_full = F.when(F.col("pos") >= window - 1, m)  # only full windows
    with_m = ph.withColumn("__m", m_full)
    mmax = F.max("__m").over(by_pos.rowsBetween(0, window - 1))
    gmin = F.min("h").over(_W.partitionBy("doc_id"))
    return (with_m
            .withColumn("__mmax", mmax)
            .withColumn("__gmin", gmin)
            .where(F.when(F.col("n_sh") >= window,
                          F.col("h") == F.col("__mmax"))
                   .otherwise(F.col("h") == F.col("__gmin")))
            .select("doc_id", "pos", F.col("h").alias("fingerprint"))
            .distinct())


def winnow_matches(docs: DataFrame, *, n: int = 3, window: int = 4,
                   min_shared: int = 2, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_fingerprint_df: int | None = None,
                   scale: bool = False,
                   portable: bool = False) -> DataFrame:
    """Local-overlap report: document pairs sharing >= ``min_shared``
    distinct winnowing fingerprints, with the shared count — the
    plagiarism/quotation detector. Blocked self-join on the fingerprint
    (disjoint docs never meet), distinct fingerprints per doc first so
    repeated passages inside one doc don't inflate counts.

    ``max_fingerprint_df`` is the skew guard for corpus scale, the
    winnowing twin of ``dedup.minhash_lsh_candidates(max_bucket_size=)``:
    a boilerplate fingerprint (license header, template nav) carried by
    k documents expands to k²/2 pair rows in the self-join. With a cap,
    fingerprints whose document frequency exceeds it are dropped before
    the join (map-side-combinable df count + semi-join on the under-cap
    list), bounding the quadratic term. Pairs that share ONLY dropped
    fingerprints are missed — recall degrades gracefully instead of the
    join exploding, and genuinely overlapping pairs keep pairing through
    their rarer fingerprints. Off by default so the driver-verified
    oracle replays exactly; ``scale=True`` is the documented corpus-mode
    switch — it fills :data:`SCALE_MAX_FINGERPRINT_DF` when no explicit
    cap was chosen (an explicit ``max_fingerprint_df`` always wins), so
    a 100-TB caller never runs the k²/2 foot-gun by omission."""
    max_fingerprint_df = _resolve_fingerprint_cap(max_fingerprint_df, scale)
    fp = (winnow_fingerprints(docs, n=n, window=window, text_col=text_col,
                              id_col=id_col, portable=portable)
          .select("doc_id", "fingerprint").distinct())
    if max_fingerprint_df is not None:
        ok = (fp.groupBy("fingerprint")
              .agg(F.count(F.lit(1)).alias("__df"))
              .where(F.col("__df") <= max_fingerprint_df)
              .select("fingerprint"))
        fp = fp.join(ok, "fingerprint", "left_semi")
    # fp feeds BOTH sides of the blocked self-join (and, under the df
    # cap, the df aggregate too): materialize once so the tokenize +
    # shingle + window-min fingerprint lineage doesn't recompute per
    # consumer — same branch-materialization idiom as
    # ngram_jaccard_pairs' shingle rows. (doc, fingerprint)-distinct
    # sized, never corpus text.
    fp = fp.localCheckpoint(eager=False)
    a = fp.alias("a")
    b = fp.alias("b")
    return (a.join(b, (F.col("a.fingerprint") == F.col("b.fingerprint"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def positional_shingles(docs: DataFrame, *, n: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, sh): every FULL word n-gram with its 0-based token
    position — the string-carrying twin of
    :func:`positional_shingle_hashes` for paths that must be exact (no
    hash collisions), e.g. span recovery. Built row-locally (slice over
    the token array, then posexplode) — zero shuffles, unlike the
    lead()-window form; docs shorter than ``n`` tokens yield nothing
    (they cannot contain a full shingle)."""
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"))
            .where(F.size("__t") >= n))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__t") - n + 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i, n)))
    return base.select("doc_id", F.posexplode(grams).alias("pos", "sh"))


def choose_span_strategy(sh: DataFrame, pairs: DataFrame,
                         n_cand: int) -> str:
    """The stage-2 cost model of :func:`exact_substring_spans`' auto
    mode, exposed so memoizing callers (e.g. a per-session candidate
    cache) pick the SAME strategy the operator would — one estimator,
    one basis (candidate-doc shingles, never whole-corpus stats):

    - ``est_value`` = Σ df² over the candidate shingle table — the
      value-first self-join's row count;
    - ``est_pair`` = |pairs| × avg shingles per candidate doc — the
      pair-first join's intermediate.

    One aggregate over ``sh`` plus two counts; returns ``"pair"`` or
    ``"value"``."""
    st = (sh.groupBy("sh").agg(F.count(F.lit(1)).alias("c"))
          .agg(F.sum("c").alias("n_occ"),
               F.sum(F.col("c") * F.col("c")).alias("df2"))
          .collect()[0])
    n_occ = int(st["n_occ"] or 0)
    est_value = int(st["df2"] or 0)
    n_pairs = pairs.count()
    avg_occ = (n_occ / n_cand) if n_cand else 0.0
    est_pair = int(n_pairs * avg_occ)
    return "pair" if est_pair < est_value else "value"


def exact_substring_spans(docs: DataFrame, *, n: int = 3, window: int = 4,
                          min_len_tokens: int | None = None,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_fingerprint_df: int | None = None,
                          scale: bool = False,
                          candidate_pairs: DataFrame | None = None,
                          match_strategy: str = "auto",
                          portable: bool = False) -> DataFrame:
    """ExactSubstr span recovery (the Lee et al. "Deduplicating Training
    Data Makes Language Models Better" dedup rung above winnowing):
    every maximal shared token run of length >= ``min_len_tokens``
    between two documents, as (id_a, id_b, start_a, start_b, len_tokens)
    with 0-based token offsets — :func:`winnow_matches` says *that* two
    docs overlap; this says exactly *where* and *how much*.

    Three stages, all candidate-bounded:

    1. Candidate pairs from winnowing with ``min_shared=1``. The winnow
       guarantee (any shared run >= window + n - 1 tokens produces a
       shared fingerprint) makes the result EXACT, not approximate,
       provided ``min_len_tokens >= window + n - 1`` (the default): a
       pair with a qualifying run is always a candidate, and stage 3
       verifies on real strings, so false candidates drop out.
    2. Full positional shingles for candidate DOCS only (semi-join, then
       a row-local explode — the corpus never shingles for this).
       Matching runs one of two output-identical strategies:

       - VALUE-FIRST: candidate-doc shingles self-join on the shingle
         string (cost Σ df² over candidate docs), then a semi-join
         keeps stage-1 candidate pairs. Wins when the candidate set is
         dense but shingle values are evenly spread (the r8 probe's
         uniform-vocabulary corpus: pair-first materialized 1.8B rows
         vs 225M value-first).
       - PAIR-FIRST: pairs ⋈ a-shingles ⋈ b-shingles on (id, shingle)
         — cost |pairs| × doc_len rows. Wins when the vocabulary is
         Zipf-like (real text): frequent head-word shingles give
         Σ df² a quadratic hot-value term that value-first cannot
         bound (the r9 Zipf probe OOM'd the value join at 50k docs
         while pair-first finished — SCALE.md §10).

       ``match_strategy="auto"`` (default) picks per-corpus by
       measuring both cost estimates with one aggregate over the
       candidate shingle table (Σ df², occurrence count, doc count)
       plus a count of the pair table: est_value = Σ df²,
       est_pair = |pairs| × avg_doc_shingles. ``"value"`` / ``"pair"``
       pin the strategy (skip the estimate jobs — e.g. when a memoized
       caller already chose).
    3. Diagonal islands: matched positions with equal ``pos_a - pos_b``
       and consecutive ``pos_a`` form one maximal run (gaps-and-islands:
       ``pos_a - row_number()`` per (pair, diagonal)); a run of L
       matched shingles is L + n - 1 shared tokens. Runs shorter than
       ``min_len_tokens`` are dropped.

    Repeated text yields one span per alignment (diagonal) — the
    faithful report for scrubbing. Deterministic and engine-portable
    (``portable`` only switches the candidate-stage hashing; the span
    values never depend on it), so a SQL oracle replays spans exactly
    — and needs no winnow replay at all, by the stage-1 argument.

    ``max_fingerprint_df`` threads into the stage-1 candidate join (see
    :func:`winnow_matches`); the ``min_shared=1`` candidate stage
    otherwise inherits the hot-fingerprint k²/2 blowup wholesale. With a
    cap the EXACTNESS guarantee weakens to: a pair is found iff some
    qualifying run contains an under-cap fingerprint — boilerplate runs
    shared by > cap documents stop generating pairs, which at corpus
    scale is usually the point. Off by default (oracle replays exactly);
    ``scale=True`` fills :data:`SCALE_MAX_FINGERPRINT_DF` when no
    explicit cap was chosen — the corpus-mode default the r8 sf1 probe
    showed the uncapped ``min_shared=1`` stage needs on a dense corpus.

    ``candidate_pairs`` supplies a PRECOMPUTED stage-1 candidate set
    (columns id_a, id_b, id_a < id_b) — e.g. a prior
    :func:`winnow_matches` run or an at-rest winnow index probe, which
    at 100 TB is exactly what stage 1 is: a stored artifact, not a
    per-query recompute. Output is IDENTICAL for any SUPERSET of the
    true min_shared=1 candidate set over the same (n, window): the
    winnow guarantee says every pair with a qualifying run is in the
    true set, and stage 3 verifies on real strings, so extra pairs
    only add work whose runs fall below ``min_len_tokens`` and drop.
    """
    from pyspark.sql import Window as _W

    max_fingerprint_df = _resolve_fingerprint_cap(max_fingerprint_df, scale)
    min_len = min_len_tokens if min_len_tokens is not None else window + n - 1
    if min_len < window + n - 1:
        raise ValueError(
            f"min_len_tokens must be >= window + n - 1 = {window + n - 1} "
            "(below that the winnow candidate stage can miss pairs and "
            "the result would be approximate)")
    if candidate_pairs is not None:
        pairs = candidate_pairs.select("id_a", "id_b")
        caller_pairs = True
    else:
        pairs = (winnow_matches(docs, n=n, window=window, min_shared=1,
                                text_col=text_col, id_col=id_col,
                                max_fingerprint_df=max_fingerprint_df,
                                portable=portable)
                 .select("id_a", "id_b"))
        # pairs feeds the candidate-id union AND the stage-3 semi join —
        # without materialization the whole winnow pipeline recomputes 3x
        # (branch-materialization idiom, SCALE.md section 8); the
        # checkpoint is candidate-pair-sized, never corpus text (a
        # caller-provided candidate_pairs is expected to be materialized
        # already — at-rest or checkpointed upstream)
        pairs = pairs.localCheckpoint(eager=False)
        caller_pairs = False
    if match_strategy not in ("auto", "value", "pair"):
        raise ValueError(f"unknown match_strategy {match_strategy!r} "
                         "(expected 'auto', 'value' or 'pair')")
    ids = (pairs.select(F.col("id_a").alias("cid"))
           .unionByName(pairs.select(F.col("id_b").alias("cid")))
           .distinct())
    cand = docs.join(ids, F.col(id_col) == F.col("cid"), "left_semi")
    # widen ONLY when the candidate frame is under-partitioned (small
    # inputs inherit a 1-split scan, serializing the whole tokenize +
    # slice + posexplode below on one core — measured 1.2 s of a 3 s
    # run as a single task at sf0.1): a keyed repartition to a
    # parallelism floor spreads the explode; at scale the scan already
    # carries >= floor partitions and no extra shuffle is added.
    floor = max(
        1, cand.sparkSession.sparkContext.defaultParallelism // 4)
    # probe the SCAN's split count (cand inherits it through the
    # broadcast semi-join; probing cand itself would force the
    # broadcast subquery to plan eagerly)
    if docs.rdd.getNumPartitions() < floor:
        cand = cand.repartition(floor, F.col(id_col))
    sh = positional_shingles(cand, n=n, text_col=text_col, id_col=id_col)
    # sh feeds BOTH sides of the match self-join (and the auto-mode
    # cost estimator): without materialization the candidate semi-join
    # + shingle explode recomputes per consumer (two identical
    # explode stages measured per run). Candidate-doc-shingle-sized —
    # the same rows the match join shuffles anyway (branch-
    # materialization idiom, SCALE.md section 8).
    sh = sh.localCheckpoint(eager=False)
    a_sh = sh.select(F.col("doc_id").alias("id_a"),
                     F.col("pos").alias("pos_a"), "sh")
    b_sh = sh.select(F.col("doc_id").alias("id_b"),
                     F.col("pos").alias("pos_b"), "sh")
    strategy = match_strategy
    if strategy == "auto":
        strategy = choose_span_strategy(sh, pairs, cand.count())
    if strategy == "pair":
        # dedup is CORRECTNESS for caller-provided pairs on THIS path
        # only: pair-first joins the pair table into the match rows, so
        # a duplicated pair row duplicates every match row, inflates
        # row_number() in the gaps-and-islands grouping and fragments
        # diagonal runs below min_len_tokens (a caller concatenating
        # overlapping index-probe outputs is the documented superset
        # case). Value-first is immune (left_semi), and internal winnow
        # pairs are distinct by construction — neither pays the shuffle.
        join_pairs = pairs.distinct() if caller_pairs else pairs
        m = join_pairs.join(a_sh, "id_a").join(b_sh, ["id_b", "sh"])
    else:
        m = (a_sh.join(b_sh, "sh")
             .where(F.col("id_a") < F.col("id_b"))
             .join(pairs, ["id_a", "id_b"], "left_semi"))
    diag = F.col("pos_a") - F.col("pos_b")
    runs = (m.withColumn("diag", diag)
            .withColumn("grp", F.col("pos_a") - F.row_number().over(
                _W.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")))
            .groupBy("id_a", "id_b", "diag", "grp")
            .agg(F.min("pos_a").cast("long").alias("start_a"),
                 F.min("pos_b").cast("long").alias("start_b"),
                 (F.count(F.lit(1)) + (n - 1)).cast("long")
                 .alias("len_tokens")))
    return (runs.where(F.col("len_tokens") >= min_len)
            .select("id_a", "id_b", "start_a", "start_b", "len_tokens"))


def exact_substring_scrub(docs: DataFrame, *, n: int = 3, window: int = 4,
                          min_len_tokens: int | None = None,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          max_fingerprint_df: int | None = None,
                          scale: bool = False,
                          candidate_pairs: DataFrame | None = None,
                          match_strategy: str = "auto",
                          portable: bool = False) -> DataFrame:
    """Span-level dedup accounting: merge each document's
    :func:`exact_substring_spans` intervals (keep-first rule — a span is
    removed from the LARGER-id doc of every pair, so content survives
    exactly in its lowest-id carrier) and report per document
    (doc_id, n_tokens, n_spans, n_tokens_removed, n_tokens_after) over
    the WHOLE corpus (docs with no spans report zeros) — the
    span-scrub rung that completes the dedup ladder
    (exact -> MinHash-global -> winnow-local -> span-scrub).

    Overlapping/adjacent spans merge first (gaps-and-islands over a
    per-doc running max of interval ends), so a token is never counted
    removed twice. All interval work is per-victim-doc — span-count
    sized, corpus never shuffles beyond the token-count scan."""
    from pyspark.sql import Window as _W

    spans = exact_substring_spans(docs, n=n, window=window,
                                  min_len_tokens=min_len_tokens,
                                  text_col=text_col, id_col=id_col,
                                  max_fingerprint_df=max_fingerprint_df,
                                  scale=scale,
                                  candidate_pairs=candidate_pairs,
                                  match_strategy=match_strategy,
                                  portable=portable)
    iv = spans.select(F.col("id_b").alias("doc_id"),
                      F.col("start_b").alias("s"),
                      (F.col("start_b") + F.col("len_tokens")).alias("e"))
    w = _W.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(_W.unboundedPreceding, -1))
    brk = F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    grp = F.sum(brk).over(w.rowsBetween(_W.unboundedPreceding, 0))
    merged = (iv.withColumn("grp", grp)
              .groupBy("doc_id", "grp")
              .agg(F.min("s").alias("s"), F.max("e").alias("e")))
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("n_tokens_removed"))
    all_docs = docs.select(F.col(id_col).alias("doc_id"),
                           token_count(F.col(text_col)).alias("n_tokens"))
    return (all_docs.join(per_doc, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("n_spans", F.lit(0)).cast("long")
                    .alias("n_spans"),
                    F.coalesce("n_tokens_removed", F.lit(0)).cast("long")
                    .alias("n_tokens_removed"),
                    (F.col("n_tokens")
                     - F.coalesce("n_tokens_removed", F.lit(0)))
                    .cast("long").alias("n_tokens_after")))


def tf_idf_top_terms(docs: DataFrame, *, k: int = 3, text_col: str = "text",
                     id_col: str = "doc_id",
                     terms: DataFrame | None = None) -> DataFrame:
    """Top-k TF-IDF terms per document over the whole corpus.

    Corpus-level text statistics in three codegen stages: explode
    lowercase alpha-numeric terms -> per-(doc, term) counts (one shuffle,
    map-side combinable) -> document frequency per term (second shuffle
    over the much smaller distinct (doc, term) set) -> idf = ln(N/df)
    joined back and a per-doc top-k window. N is a 1-row broadcast
    aggregate (provably bounded, hint kept). The df table is
    vocabulary-sized and therefore UNBOUNDED on a web corpus — the join
    carries no forced broadcast hint: Catalyst broadcasts it when its
    runtime/estimated size is under ``autoBroadcastJoinThreshold`` (AQE
    converts the shuffle join at runtime when small) and otherwise
    degrades to a shuffle hash join instead of an executor OOM. Ties
    break on the rounded score then term text so ranking is reproducible
    across partitionings (and vs the SQL oracle).

    ``terms`` lets a caller supply the (``id_col``, term) rows (e.g.
    derived from a shared/at-rest postings table — the ``pmi_pairs``
    pattern) instead of tokenizing ``text_col``; ``docs`` is still
    scanned for the 1-row corpus count.
    """
    from pyspark.sql import Window

    if terms is None:
        docs = _widen_narrow(docs)
        terms = (docs.select(
            F.col(id_col),
            F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
            .alias("term")))
    tf = terms.select(id_col, "term").groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    # the tf aggregate exits AQE-coalesced by BYTES (ONE partition at
    # driver SFs — round-18 profile: the df aggregate, scoring join and
    # top-k window all ran single-task on it); widen the checkpoint to
    # the parallelism floor ONLY when the docs scan itself is narrow —
    # at scale AQE's byte sizing stands and no exchange is added
    _par = docs.sparkSession.sparkContext.defaultParallelism
    _floor = max(1, _par // 4)
    if not docs.isStreaming and docs.rdd.getNumPartitions() < _floor:
        tf = tf.repartition(_floor, F.col(id_col))
    # tf feeds BOTH the df aggregation and the scoring join; without a
    # materialization Spark recomputes the whole tokenize+count branch
    # twice (no cross-branch exchange reuse) — 3-4x slower at sf0.1
    tf = tf.localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # No broadcast hint on df_: vocabulary-sized, unbounded at corpus
    # scale — size-gated by autoBroadcastJoinThreshold / AQE instead.
    scored = (tf.join(df_, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tf_idf",
                          F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("tf_idf").desc(), F.col("term")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, "term", "tf", "df", "tf_idf", "rank"))


def repetition_features(docs: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token
    ratio, most-frequent-token share, and duplicate-bigram fraction —
    the features repetition-based quality filters threshold on.

    Two codegen aggregation trees over exploded tokens (per-(doc, token)
    counts -> per-doc rollup, both map-side combinable) plus the distinct
    bigram count from ``dedup.shingle_rows`` — no per-element
    higher-order functions anywhere, so the whole thing pipelines on a
    corpus scan."""
    from eventstorm_spark.extensions.dedup import shingle_rows

    tok = docs.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
    per_tok = tok.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    f1 = per_tok.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.max("c").alias("top_freq"),
    )
    bigrams = (shingle_rows(docs, 2, text_col, id_col)
               .groupBy("id").agg(F.count(F.lit(1)).alias("n_bigrams")))
    return (
        f1.join(bigrams, "id")
        .select(
            F.col("id").alias(id_col),
            "n_tokens", "n_distinct_tokens",
            F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 6)
            .alias("distinct_token_ratio"),
            F.round(F.col("top_freq") / F.col("n_tokens"), 6)
            .alias("top_token_frac"),
            F.round(1.0 - F.col("n_bigrams")
                    / F.greatest(F.col("n_tokens") - 1, F.lit(1)), 6)
            .alias("dup_bigram_frac"),
        )
    )


# PII patterns, deliberately in the regex dialect intersection of Spark
# (Java) and DuckDB (RE2) so the oracle can verify scrubbing exactly.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "long_digits": r"[0-9]{7,}",
}


def redact_pii(docs: DataFrame, *, text_col: str = "text",
               out_col: str | None = None,
               patterns: dict[str, str] | None = None) -> DataFrame:
    """Scrub PII-shaped spans (emails, URLs, long digit runs) from the
    text column, replacing each with ``<TYPE>`` — the standard corpus
    scrubbing pass. Chained ``regexp_replace`` column expressions: pure
    codegen, no UDF, embarrassingly parallel on the corpus scan."""
    out = F.col(text_col)
    for name, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return docs.withColumn(out_col or text_col, out)


def normalize_text(docs: DataFrame, *, text_col: str = "text",
                   out_col: str | None = None,
                   form: str = "NFC") -> DataFrame:
    """Canonical text cleaning: Unicode normalization (NFC by default),
    casefold, and whitespace collapse — the pass that runs before any
    hashing/shingling so visually-identical strings dedupe together.

    Unicode normalization has no Spark built-in, so this is an
    Arrow-batched pandas UDF (stdlib ``unicodedata``); the casefold and
    whitespace steps ride in the same batch pass."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm_udf(texts: pd.Series) -> pd.Series:
        import re
        ws = re.compile(r"\s+")
        return texts.map(
            lambda t: None if t is None else
            ws.sub(" ", unicodedata.normalize(form, t).casefold()).strip())

    return docs.withColumn(out_col or text_col, norm_udf(F.col(text_col)))


HTML_STRIP_TAGS = ("script", "style", "noscript", "template", "title",
                   "nav", "header", "footer", "aside", "iframe", "svg")

HTML_BLOCK_TAGS = frozenset((
    "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "dl", "dt", "dd", "tr", "td", "th", "table",
    "thead", "tbody", "section", "article", "main", "blockquote",
    "pre", "form", "figure", "figcaption", "address", "details",
    "summary"))


from html.parser import HTMLParser as _HTMLParser


class _HtmlExtractor(_HTMLParser):
    """Stream extractor behind :func:`extract_html_text`. Strip-tag
    containers (nav/header/footer/...) are all block-level elements, so
    they emit the same whitespace boundary as ``HTML_BLOCK_TAGS`` —
    without it, visible text on either side of a stripped element fuses
    into one token (``a<nav>x</nav>b`` -> ``ab``), corrupting token
    stats downstream."""

    def __init__(self, strip: frozenset) -> None:
        super().__init__(convert_charrefs=True)
        self._strip = strip
        self.depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D401
        if tag in self._strip:
            self.depth += 1
            self.parts.append(" ")
        elif tag in HTML_BLOCK_TAGS:
            self.parts.append(" ")

    def handle_startendtag(self, tag, attrs):
        if tag in self._strip or tag in HTML_BLOCK_TAGS:
            self.parts.append(" ")

    def handle_endtag(self, tag):
        if tag in self._strip:
            self.depth = max(0, self.depth - 1)
            self.parts.append(" ")
        elif tag in HTML_BLOCK_TAGS:
            self.parts.append(" ")

    def handle_data(self, data):
        if self.depth == 0:
            self.parts.append(data)


def _extract_html_checked(html: str | None,
                          strip_tags: tuple[str, ...]) -> tuple:
    """(text, error) core: text is whatever was extracted; error is True
    when the parser raised mid-document, i.e. the text may be a
    TRUNCATED extraction rather than a complete one."""
    if html is None:
        return None, False
    import re as _re

    p = _HtmlExtractor(frozenset(strip_tags))
    err = False
    try:
        p.feed(html)
        p.close()
    except Exception:
        err = True  # keep what was extracted, but say so
    return _re.sub(r"\s+", " ", "".join(p.parts)).strip(), err


def extract_html_text(html: str | None,
                      strip_tags: tuple[str, ...] = HTML_STRIP_TAGS,
                      *, errors: str = "keep") -> str | None:
    """Extract the visible text of one HTML document (stdlib
    ``html.parser`` — no external deps): drop everything inside
    boilerplate containers (``strip_tags``: script/style/nav/header/
    footer/... — the chrome around the content), drop comments, decode
    character references (named and numeric), treat block-level tags —
    including the stripped containers themselves — as whitespace
    boundaries so ``<p>a</p><p>b</p>`` and ``a<nav>x</nav>b`` never
    fuse, and collapse all whitespace runs to single spaces. The
    plain-Python core of :func:`html_to_text`, exposed separately so
    tests and oracles can call it row-at-a-time.

    Tolerant of real-web malformation the way ``html.parser`` is:
    unclosed inline tags, attribute junk and stray ``>`` don't abort
    parsing (script/style are CDATA elements, so JS containing ``<`` or
    ``"<div>"`` strings is consumed raw until the closing tag). An
    unclosed *strip-tag container* drops the remainder of the document
    (the parser has no tree to auto-close against) — the standard
    failure mode of stream-based extraction; boilerplate tags are
    reliably closed on real pages.

    If the parser RAISES mid-document, the extraction is truncated
    rather than complete: ``errors="keep"`` (default) returns the
    partial text, ``errors="none"`` returns None so truncated docs can
    be filtered; :func:`html_to_text` can surface the flag as a column
    (``error_col=``) for auditing.
    """
    text, err = _extract_html_checked(html, strip_tags)
    if err and errors == "none":
        return None
    return text


def html_to_text(docs: DataFrame, *, text_col: str = "html",
                 out_col: str = "text",
                 strip_tags: tuple[str, ...] = HTML_STRIP_TAGS,
                 error_col: str | None = None) -> DataFrame:
    """HTML-to-text extraction — the FIRST stage of a web-crawl training
    pipeline (raw page -> clean text), upstream of everything from
    :func:`c4_rules` onward, which assumes clean text.

    Per-document and payload-local, so it runs as one Arrow-batched
    ``pandas_udf`` over the corpus scan — embarrassingly parallel, zero
    shuffles, and the scan's column pruning/pushdown is untouched (same
    plumbing as the multimodal codecs). Semantics live in
    :func:`extract_html_text`; see there for the boilerplate-strip /
    block-boundary / entity rules.

    ``error_col`` (optional) adds a boolean column that is True when the
    parser raised mid-document — the extraction is then TRUNCATED, not
    complete, and a training pipeline can filter or audit those rows
    instead of treating partial text as a full page. Still one Arrow
    stage (a struct-returning ``pandas_udf`` whose fields are split out
    by Catalyst).
    """
    from pyspark.sql.functions import pandas_udf

    tags = tuple(strip_tags)

    if error_col is None:
        @pandas_udf("string")
        def extract_udf(pages: pd.Series) -> pd.Series:
            return pages.map(lambda h: extract_html_text(h, tags))

        return docs.withColumn(out_col, extract_udf(F.col(text_col)))

    @pandas_udf("struct<text: string, error: boolean>")
    def extract_checked_udf(pages: pd.Series) -> pd.DataFrame:
        pairs = [_extract_html_checked(h, tags) for h in pages]
        return pd.DataFrame(pairs, columns=["text", "error"])

    tmp = "__html_extract"
    return (docs.withColumn(tmp, extract_checked_udf(F.col(text_col)))
            .withColumn(out_col, F.col(f"{tmp}.text"))
            .withColumn(error_col, F.col(f"{tmp}.error"))
            .drop(tmp))


def unigram_logprob(docs: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document mean token log-probability under the corpus unigram
    LM — the classic cheap quality/outlier signal for training-data
    filtering (garbage, boilerplate and wrong-language text score low).

    Two map-side-combinable aggregations over one tokenize pass: term
    frequencies (vocabulary-sized — joined back WITHOUT a forced
    broadcast hint so an unbounded 100 TB vocabulary degrades to a
    shuffle join instead of OOM; AQE still broadcasts it when small)
    and the corpus token total (1-row, provably bounded, broadcast);
    the per-doc score is then a groupBy(avg) over the exploded terms. All ratios are exact int64/int64 double
    divisions, so the score is bit-reproducible across engines (the
    DuckDB oracle recomputes it identically). Docs with no alphanumeric
    tokens drop out (no LM support).
    """
    docs = _widen_narrow(docs)
    terms = docs.select(
        F.col(id_col),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("term"))
    terms = terms.localCheckpoint(eager=False)  # feeds freq, total AND scoring
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = terms.agg(F.count(F.lit(1)).alias("n_total"))
    # freq is vocabulary-sized: no forced broadcast (size-gated by
    # Catalyst/AQE); total is 1 row — hint kept.
    return (terms.join(freq, "term")
            .crossJoin(F.broadcast(total))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.log(F.col("tf") / F.col("n_total"))), 6)
                 .alias("avg_logprob")))


def bigram_logprob(docs: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document mean bigram log-probability under the corpus MLE
    bigram LM — the step up from :func:`unigram_logprob` that scores
    word ORDER, not just word choice (scrambled or template-stitched
    text keeps its unigram score but craters here; the CCNet-style
    LM-filter signal).

    p(w2|w1) = c(w1 w2) / c(w1 ·) over raw bigram occurrences (contexts
    counted as bigram starts, so every observed bigram has support —
    pure MLE, no smoothing, bit-reproducible for the SQL oracle). One
    tokenize -> bigram explode feeds both count tables (map-side
    combinable) and the scoring join; the count tables are
    vocabulary-sized and joined back WITHOUT forced broadcast hints
    (size-gated, round-5 policy). Docs with fewer than 2 tokens drop
    out (no bigrams).
    """
    from pyspark.sql import Window as _W

    docs = _widen_narrow(docs)
    terms = docs.select(
        F.col(id_col),
        F.posexplode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("pos", "w1"))
    w = _W.partitionBy(id_col).orderBy("pos")
    big = (terms.withColumn("w2", F.lead("w1").over(w))
           .where(F.col("w2").isNotNull())
           .select(id_col, "w1", "w2"))
    big = big.localCheckpoint(eager=False)  # feeds c1, c2 AND scoring
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return (big.join(c2, ["w1", "w2"]).join(c1, "w1")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(F.log(F.col("c2") / F.col("c1"))), 6)
                 .alias("avg_bigram_logprob")))


def vocab_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary statistics: token/type counts, type-token
    ratio, and the hapax-legomena share (fraction of vocabulary seen
    exactly once — the Zipf-tail health check that collapses when a
    corpus is template spam or dedup has failed).

    One tokenize pass -> term-frequency aggregation -> a single-row
    reduction over the vocabulary table; everything map-side
    combinable, output is one row regardless of corpus size.
    """
    docs = _widen_narrow(docs)
    terms = docs.select(
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("term"))
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    return freq.agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("tf"), 6).alias("type_token_ratio"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0)).cast("long")
        .alias("hapax_count"),
        F.round(F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
                / F.count(F.lit(1)), 6).alias("hapax_fraction"),
    )


def bm25_top_docs(docs: DataFrame, query_terms: list[str], *, k: int = 20,
                  k1: float = 1.2, b: float = 0.75, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """BM25 retrieval over the corpus for a fixed term query — the
    lexical-search complement to the embedding ANN tier (and the scorer
    behind "find documents about X" corpus audits).

    score(d) = sum over query terms of
    ``idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))`` with
    the Robertson/Sparck-Jones idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``.

    Scale shape: one tokenize pass feeds document lengths and the
    query-term postings; the per-term df/idf table is bounded by the
    QUERY size (a handful of rows — broadcast), the corpus-wide N/avgdl
    aggregate is 1 row (broadcast), and the only corpus-sized exchange
    is the (doc, dl) join with the postings, co-keyed on the doc id.
    Scores round to 6 decimals and rank ties break on id, so the SQL
    oracle reproduces the ranking exactly."""
    docs = _widen_narrow(docs)
    # Document length needs no explode: it is a row-local token COUNT,
    # so the dl branch (and the corpus-wide stats reduction over it)
    # never shuffles token rows — only the query-term postings do.
    dl = docs.select(
        F.col(id_col),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .cast("long").alias("dl")).where(F.col("dl") > 0)  # match explode stats
    dl = dl.localCheckpoint(eager=False)  # feeds stats AND the postings join
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    # Scan-level prune before the explode: documents without any query
    # term contribute nothing to the postings, so a cheap rlike drops
    # them before token fan-out — for selective queries on a web corpus
    # this is the difference between exploding every document and
    # exploding only candidates. The explode+isin after it is exact.
    import re as _re

    alt = "|".join(_re.escape(t) for t in query_terms)
    candidates = docs.where(
        F.lower(F.col(text_col)).rlike(f"(^|[^a-z0-9])({alt})([^a-z0-9]|$)"))
    terms = candidates.select(
        F.col(id_col),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("term"))
    tf = (terms.where(F.col("term").isin(list(query_terms)))
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")))
    # tf feeds the score join AND the df aggregate below: without the
    # pin the candidate rlike + tokenize + explode subtree evaluates
    # twice per run (two identical heavy stages profiled). Query-term-
    # postings-sized (id, term, tf) — bounded by candidates x |query|.
    tf = tf.localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return bm25_rank(tf, df_, dl, stats, k1=k1, b=b, k=k, id_col=id_col)


def bm25_rank(tf: DataFrame, df_: DataFrame, dl: DataFrame,
              stats: DataFrame, *, k1: float = 1.2, b: float = 0.75,
              k: int = 20, id_col: str = "doc_id") -> DataFrame:
    """The BM25 scoring/ranking stage, factored so the in-memory form
    (:func:`bm25_top_docs`) and the at-rest inverted index
    (``curation.bm25_against_index``) share ONE expression — the two
    can never drift (their equality is also test-pinned). Inputs:
    ``tf`` (id, term, tf) for the query terms only, ``df_`` (term, df)
    — query-bounded, forced broadcast — ``dl`` (id, dl), ``stats``
    1-row (n_docs, avgdl)."""
    scored = (tf.join(F.broadcast(df_), "term")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats))
              .withColumn("idf", F.log(
                  (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1))
              .withColumn("part", F.col("idf") * F.col("tf") * (k1 + 1)
                          / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))))
    return (scored.groupBy(id_col)
            .agg(F.round(F.sum("part"), 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(k))


def passage_scrub(docs: DataFrame, *, seg_tokens: int = 10, min_docs: int = 2,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicated-passage REMOVAL (the scrubbing counterpart of
    :func:`repeated_passages`, which only detects): a ``seg_tokens``-token
    segment appearing in >= ``min_docs`` distinct documents is kept only
    in its first-occurrence document (min id) and removed everywhere
    else — the C4 "three-sentence span" dedup rule in segment form.
    Returns per-document scrub accounting (segments seen, segments
    removed, tokens surviving).

    Same plan skeleton as ``repeated_passages``: tokenize -> segment
    explode (row-local) -> segment-frequency aggregate joined back
    WITHOUT a forced broadcast (the repeated-segment table is unbounded
    on boilerplate-heavy crawls — size-gated by Catalyst/AQE), then one
    per-doc rollup. Deterministic keep rule => exact oracle replay."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_segs = F.ceil(F.size("__t") / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(F.col("__t"),
                                           j * seg_tokens + 1, seg_tokens)),
    )
    ex = (docs.select(F.col(id_col), toks.alias("__t"))
          .select(id_col, F.posexplode(segs).alias("seg_no", "segment")))
    ex = ex.localCheckpoint(eager=False)  # feeds the freq agg AND the join
    freq = (ex.groupBy("segment")
            .agg(F.countDistinct(id_col).alias("__n"),
                 F.min(id_col).alias("__first")))
    kept = (F.col("__n") < min_docs) | (F.col(id_col) == F.col("__first"))
    return (ex.join(freq, "segment")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_segments"),
                 F.sum((~kept).cast("long")).alias("n_removed"),
                 F.sum(F.when(kept, F.size(F.split(F.col("segment"), " ")))
                       .otherwise(0).cast("long")).alias("n_tokens_after")))


def c4_reject_reason(t: Column, *, min_words: int = 10,
                     max_words: int = 100_000,
                     min_mean_word_len: float = 2.0,
                     max_mean_word_len: float = 12.0,
                     min_stopwords: int = 2) -> Column:
    """The C4/Gopher reject-reason expression alone (NULL = kept) — a
    row-local codegen Column, so a pipeline can filter the corpus with
    ``docs.where(c4_reject_reason(col).isNull())`` in the SAME scan
    instead of computing :func:`c4_rules` (which projects away the text)
    and joining the corpus back by id — a corpus-wide shuffle the
    filter semantics never needed."""
    toks = tokens(t)
    n_words = F.size(toks).cast("long")
    mean_wl = F.round(
        F.length(F.regexp_replace(t, r"\s+", "")) / n_words, 6)
    n_stop = F.size(F.array_intersect(
        toks, F.array([F.lit(w) for w in LANG_STOPWORDS["en"]]))).cast("long")
    has_long_word = t.rlike(r"\S{21,}")
    has_brace = t.contains("{") | t.contains("}")
    low = F.lower(t)
    return (
        F.when(n_words < min_words, "too_few_words")
        .when(n_words > max_words, "too_many_words")
        .when((mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len),
              "word_length")
        .when(has_long_word, "long_word")
        .when(n_stop < min_stopwords, "stopwords")
        .when(has_brace, "brace")
        .when(low.contains("lorem ipsum"), "lorem_ipsum")
        .when(low.contains("javascript"), "javascript"))


def c4_rules(docs: DataFrame, *, min_words: int = 10, max_words: int = 100_000,
             min_mean_word_len: float = 2.0, max_mean_word_len: float = 12.0,
             min_stopwords: int = 2, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """C4/Gopher-style heuristic document filter: the rule bundle the
    public web-corpus pipelines apply before any model-based scoring
    (C4: brace / "lorem ipsum" / "javascript" rejects; Gopher: word
    count, mean word length, >= 2 stop words; plus the pathological
    unbroken-token reject).

    Emits the per-rule evidence, a ``kept`` flag and the FIRST failing
    rule as ``reject_reason`` (rules checked in the documented order),
    so the filter is auditable — pipelines log the reject histogram, not
    just the survivor set. Every rule is a row-local codegen expression
    (regex counts + a distinct stopword intersect; the mean word length
    is total non-whitespace chars / word count, avoiding a per-element
    higher-order function on the corpus path) — embarrassingly parallel,
    exact, and reproduced verbatim by the SQL oracle.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks).cast("long")
    mean_wl = F.round(
        F.length(F.regexp_replace(t, r"\s+", "")) / n_words, 6)
    n_stop = F.size(F.array_intersect(
        toks, F.array([F.lit(w) for w in LANG_STOPWORDS["en"]]))).cast("long")
    has_long_word = t.rlike(r"\S{21,}")
    has_brace = t.contains("{") | t.contains("}")
    low = F.lower(t)
    has_lorem = low.contains("lorem ipsum")
    has_js = low.contains("javascript")
    reason = c4_reject_reason(
        t, min_words=min_words, max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len, min_stopwords=min_stopwords)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        n_stop.alias("n_stopwords"),
        has_long_word.cast("int").alias("has_long_word"),
        (has_brace | has_lorem | has_js).cast("int").alias("has_blocklisted"),
        reason.isNull().cast("int").alias("kept"),
        reason.alias("reject_reason"),
    )


def dsir_weights(docs: DataFrame, *, target_lang: str = "en",
                 lang_col: str = "lang", text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its tokens are under a *target*
    unigram LM (here: the ``target_lang`` slice of the corpus) than
    under the corpus LM. Resampling the corpus proportional to
    ``exp(weight)`` shifts the mixture toward the target domain — the
    standard cheap domain-adaptation move for pretraining data.

    weight(doc) = mean over tokens of
    ``ln(p_target(w) / p_corpus(w))`` with add-1 smoothing over the
    shared corpus vocabulary (``p(w) = (tf + 1) / (N + V)``), so tokens
    unseen in the target stay finite and the score is exactly
    reproducible by the SQL oracle.

    One tokenize pass feeds the LM count table and the scoring join
    (map-side combinable aggregates). Both LMs ride ONE vocabulary
    aggregate — the target count is a conditional sum in the same
    groupBy, not a second shuffle-and-join of the term table. The
    merged frequency table is vocabulary-sized and joined back WITHOUT
    a forced broadcast hint (size-gated by Catalyst/AQE, round-5
    policy); the totals row is a provably-1-row broadcast.
    """
    docs = _widen_narrow(docs)
    terms = docs.select(
        F.col(id_col), F.col(lang_col),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("term"))
    terms = terms.localCheckpoint(eager=False)  # feeds the LM AND scoring
    freq = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf_c"),
        F.sum((F.col(lang_col) == target_lang).cast("long")).alias("tf_t"))
    totals = terms.agg(
        F.count(F.lit(1)).alias("n_c"),
        F.countDistinct("term").alias("v"),
        F.sum((F.col(lang_col) == target_lang).cast("long")).alias("n_t"))
    logratio = F.log(
        ((F.col("tf_t") + 1) / (F.col("n_t") + F.col("v")))
        / ((F.col("tf_c") + 1) / (F.col("n_c") + F.col("v"))))
    return (terms.join(freq, "term")
            .crossJoin(F.broadcast(totals))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(logratio), 6).alias("dsir_logratio")))


def repeated_passages(docs: DataFrame, *, seg_tokens: int = 10,
                      min_docs: int = 2, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Cross-document repeated-passage detection: split every document
    into consecutive ``seg_tokens``-token segments and flag segments
    appearing in >= ``min_docs`` distinct documents — the segment-level
    approximation of exact-substring dedup used to strip boilerplate
    and templated passages from training corpora.

    Plan: one tokenize -> segment explode (row-local array slicing, no
    window) -> segment-frequency aggregation (map-side combinable)
    joined back. The repeated-segment table is
    vocabulary-of-passages-sized — on the boilerplate-heavy crawls this
    operator targets it is unbounded, so the join carries no forced
    broadcast hint: Catalyst/AQE broadcast it only while it fits under
    ``autoBroadcastJoinThreshold`` and otherwise shuffle-join. Exact and
    engine-reproducible, so the oracle replays it verbatim.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_segs = F.ceil(F.size("__t") / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(F.col("__t"),
                                           j * seg_tokens + 1, seg_tokens)),
    )
    ex = (docs.select(F.col(id_col), toks.alias("__t"))
          .select(id_col, F.posexplode(segs).alias("seg_no", "segment")))
    ex = ex.localCheckpoint(eager=False)  # feeds counts AND the join back
    freq = (ex.groupBy("segment")
            .agg(F.countDistinct(id_col).alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))
    # No forced broadcast on freq (unbounded repeated-segment table).
    return (ex.join(freq, "segment")
            .select(id_col, "seg_no", "segment", "n_docs"))


def linear_quality_score(docs: DataFrame, *, weights: dict | None = None,
                         bias: float = 0.0, threshold: float = 0.5,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Model-based quality filtering: a linear classifier (the
    fasttext-style quality-filter deployment shape) over the
    :func:`quality_features` signals — score = sigmoid(w.x + b),
    keep = score >= threshold.

    The weights are a deployment input (trained offline); the operator
    is the SCORING PLAN: a pure row-local codegen expression over one
    corpus scan — no UDF, no shuffle, embarrassingly parallel, exactly
    what "run the quality model over 100 TB" compiles to when the model
    is linear. Feature values are the rounded quality_features columns,
    so the score is engine-reproducible to the rounding precision.
    Returns (doc_id, quality_score, kept).
    """
    weights = weights if weights is not None else {
        "n_tokens": 0.02, "avg_token_len": -0.3,
        "punct_ratio": -4.0, "upper_ratio": -2.0,
        "stopword_distinct_ratio": 3.0,
    }
    feats = quality_features(docs, text_col=text_col, id_col=id_col)
    z = F.lit(float(bias))
    for col, w in sorted(weights.items()):
        z = z + F.lit(float(w)) * F.col(col)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (feats.select(id_col, score.alias("quality_score"))
            .withColumn("kept", (F.col("quality_score")
                                 >= F.lit(float(threshold))).cast("int")))


DEFAULT_QUALITY_FEATURES = ["avg_token_len", "n_tokens", "punct_ratio",
                            "upper_ratio", "stopword_distinct_ratio"]

_QUALITY_SD_FLOOR = 1e-9  # constant feature -> zero stddev; keep it inert


def train_linear_quality(docs: DataFrame, labels: DataFrame, *,
                         features: list | None = None,
                         iters: int = 8, lr: float = 1.0,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         label_col: str = "label") -> tuple:
    """Train the linear quality classifier IN Spark — completing the
    model-based-quality tier the way ``kmeans_centroids`` completes
    IVF: :func:`linear_quality_score` is the deployment scoring plan
    for an offline-trained model; this trains that model on the corpus
    engine, so the whole lifecycle (featurize -> train -> score ->
    filter) needs no second system.

    Full-batch logistic-regression gradient descent over the
    :func:`quality_features` signals against 0/1 ``labels`` (weak
    labels in practice — a high-quality reference slice vs random
    crawl, the GPT-3/LLaMA quality-filter recipe). One aggregate
    standardizes the d features (mean / population stddev — raw web
    features mix O(100) token counts with O(0.01) ratios and diverge
    un-scaled); each iteration is ONE map-side-combinable aggregate
    computing the d+1 gradient components ``avg((sigmoid(w.x+b)-y) *
    x_j)`` as pure JVM column expressions — no UDF, no Python in the
    hot path; the driver holds only the (d+1)-float weight vector
    between iterations (the bounded-driver-state contract shared with
    the k-means trainer and the BPE merge loop). At 100 TB each
    iteration is one corpus pass over a narrow projection — the
    classic data-parallel logreg shape; iterations are few because
    standardized full-batch GD on a linear model converges fast.

    Returns RAW-space ``(weights, bias)`` — the standardized-space
    solution folded back through the feature stats — directly
    consumable by ``linear_quality_score(weights=..., bias=...)``.
    Feature values are exactly engine-reproducible
    (:func:`quality_features` rounds them), so the only cross-engine
    drift is float summation order, far below round-6 reporting
    precision: the DuckDB oracle replays the entire training loop
    step-by-step (``inventory._train_quality_oracle``).
    """
    features = list(features) if features is not None \
        else list(DEFAULT_QUALITY_FEATURES)
    feats = quality_features(docs, text_col=text_col, id_col=id_col)
    data = (feats.join(labels.select(id_col, label_col), id_col)
            .select(*features,
                    F.col(label_col).cast("double").alias("_y")))
    data = data.persist()
    try:
        stats = data.agg(*(
            [F.avg(c).alias(f"mu_{i}") for i, c in enumerate(features)]
            + [F.greatest(F.stddev_pop(c), F.lit(_QUALITY_SD_FLOOR))
               .alias(f"sd_{i}") for i, c in enumerate(features)])
        ).collect()[0]
        mu = [float(stats[f"mu_{i}"]) for i in range(len(features))]
        sd = [float(stats[f"sd_{i}"]) for i in range(len(features))]

        w = [0.0] * len(features)
        b = 0.0
        for _ in range(iters):
            z = F.lit(b)
            for j, c in enumerate(features):
                z = z + F.lit(w[j]) * ((F.col(c) - F.lit(mu[j]))
                                       / F.lit(sd[j]))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = (p - F.col("_y")).alias("_e")
            grad = data.select(err, *features).agg(
                F.avg("_e").alias("gb"),
                *(F.avg(F.col("_e") * ((F.col(c) - F.lit(mu[j]))
                                       / F.lit(sd[j]))).alias(f"g_{j}")
                  for j, c in enumerate(features))).collect()[0]
            b -= lr * float(grad["gb"])
            for j in range(len(features)):
                w[j] -= lr * float(grad[f"g_{j}"])
    finally:
        data.unpersist()

    raw_w = {c: w[j] / sd[j] for j, c in enumerate(features)}
    raw_b = b - sum(w[j] * mu[j] / sd[j] for j in range(len(features)))
    return raw_w, raw_b


def winnow_fingerprint_expr(text_col: str = "text", *, n: int = 3,
                            window: int = 4):
    """Row-local winnowing: the SAME (pos, fingerprint) set
    :func:`winnow_fingerprints` computes with two corpus window passes,
    as pure array higher-order functions over one row's tokens —
    array<struct<pos int, fingerprint bigint>>. This is the form a
    STREAM evaluates per arrival (no per-document corpus partitioning
    exists on a stream); on a corpus frame the window-pass form wins
    (HOFs are interpreted per element — see SCALE.md on shingling), so
    this expression exists for the streaming tier and for parity
    testing, not as a batch replacement. Hashing is xxhash64 of the
    shingle string — identical to the batch path's production mode, so
    stored :func:`curation.write_winnow_index` fingerprints and stream
    fingerprints collide correctly."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))))
    # m[j] = min over the full window STARTING at 1-indexed shingle j
    m = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt - (window - 1), F.lit(1))),
        lambda j: F.array_min(F.slice(hs, j, window)))
    cands = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda q: F.struct((q - 1).cast("int").alias("pos"),
                           F.element_at(hs, q).alias("fingerprint"),
                           q.alias("q")))
    gmin = F.array_min(hs)
    # selection rule = the batch formulation exactly: a position is a
    # fingerprint iff it is SOME full window's min (all argmins on
    # ties); docs with fewer shingles than the window use their global
    # min (whole-doc window). CASE WHEN evaluates lazily, so the
    # window-exists branch never runs for short docs.
    selected = F.filter(
        cands,
        lambda s: F.when(
            cnt >= window,
            F.exists(
                F.sequence(F.greatest(F.lit(1), s["q"] - (window - 1)),
                           F.least(s["q"], cnt - (window - 1))),
                lambda j: F.element_at(m, j) == s["fingerprint"]))
        .otherwise(s["fingerprint"] == gmin))
    return F.transform(
        selected, lambda s: F.struct(s["pos"].alias("pos"),
                                     s["fingerprint"].alias("fingerprint")))


def streaming_winnow_hits(docs_stream: DataFrame, *, n: int = 3,
                          window: int = 4, retention_secs: float = 600.0,
                          max_entries_per_fingerprint: int = 64,
                          event_time_col: str = "ts",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Online substring-overlap detection — the streaming twin of
    :func:`winnow_matches`, completing the streaming dedup ladder
    (exact digests -> ``dedup.streaming_near_dup_pairs`` MinHash ->
    this, substring-level): emits ``(id_a, id_b, fingerprint, pos_a,
    pos_b)`` whenever a new arrival shares a winnowing fingerprint
    with a document seen within ``retention_secs``. The winnowing
    guarantee carries to the stream: any >= window+n-1-token run
    shared with an in-window document produces at least one hit.
    Consumers aggregate downstream (group by pair, count distinct
    fingerprints >= min_shared) — one hit row per shared fingerprint,
    the same contract as the banded MinHash stream emitting per band.

    Fingerprints are computed row-locally
    (:func:`winnow_fingerprint_expr` — micro-batch-bounded HOF cost)
    and the stream is keyed BY FINGERPRINT, so state entries are
    (id, pos, event-time) triples per fingerprint — O(1) per entry
    regardless of document length. State is bounded on both axes:
    event-time eviction against the key's high-watermark, and a
    hot-fingerprint cap (``max_entries_per_fingerprint``, most-recent
    kept) — the SAME boilerplate skew class the batch path caps with
    ``max_fingerprint_df``, degrading recall gracefully instead of
    accumulating a license-header fingerprint's every carrier."""
    import json as _json

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = (docs_stream
             .select(F.col(id_col).alias("__id"),
                     F.col(event_time_col).cast("double").alias("__ts"),
                     F.explode(winnow_fingerprint_expr(
                         text_col, n=n, window=window)).alias("__fp"))
             .select("__id", "__ts",
                     F.col("__fp.pos").alias("__pos"),
                     F.col("__fp.fingerprint").alias("__key")))

    id_type = docs_stream.schema[id_col].dataType.simpleString()
    out_schema = (f"id_a {id_type}, id_b {id_type}, fingerprint long, "
                  "pos_a int, pos_b int")
    state_schema = "state string"

    def fold(key, pdf_iter, state: GroupState):
        entries = _json.loads(state.get[0]) if state.exists else []
        hwm = max((e["ts"] for e in entries), default=float("-inf"))
        rows = []
        for pdf in pdf_iter:
            for did, ts, pos in zip(pdf["__id"], pdf["__ts"], pdf["__pos"]):
                did = did.item() if hasattr(did, "item") else did
                rows.append((did, float(ts), int(pos)))
        rows.sort(key=lambda t: (t[1], str(t[0]), t[2]))
        out = {"id_a": [], "id_b": [], "fingerprint": [],
               "pos_a": [], "pos_b": []}
        fp = int(key[0])
        for did, ts, pos in rows:
            hwm = max(hwm, ts)
            entries = [e for e in entries
                       if e["ts"] >= hwm - retention_secs]
            for e in entries:
                if e["id"] == did:
                    continue
                out["id_a"].append(e["id"])
                out["id_b"].append(did)
                out["fingerprint"].append(fp)
                out["pos_a"].append(e["pos"])
                out["pos_b"].append(pos)
            entries.append({"id": did, "ts": ts, "pos": pos})
            if len(entries) > max_entries_per_fingerprint:
                entries.sort(key=lambda e: (e["ts"], str(e["id"]), e["pos"]))
                entries = entries[-max_entries_per_fingerprint:]
        entries = [e for e in entries if e["ts"] >= hwm - retention_secs]
        state.update((_json.dumps(entries, sort_keys=True),))
        if out["id_a"]:
            yield pd.DataFrame(out)

    return keyed.groupBy("__key").applyInPandasWithState(
        fold, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def chunk_documents(docs: DataFrame, *, chunk_tokens: int = 128,
                    overlap: int = 0, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking — the embedding/RAG prep stage
    (and the retrieval-side sibling of ``packing.pack_token_spans``,
    which packs for TRAINING): (doc_id, chunk_no, start_tok, chunk,
    n_tokens) with window starts every ``chunk_tokens - overlap``
    tokens, so consecutive chunks share ``overlap`` tokens and every
    token is covered. The final chunk may be shorter; a doc never
    yields zero chunks. Entirely row-local (one transform + explode —
    no shuffle, no UDF), so chunking pipelines into the scan; chunk
    count per doc is ceil((n − overlap) / stride), bounding row growth
    at ~n/stride."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens "
            f"(got overlap={overlap}, chunk_tokens={chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.struct(
            j.cast("int").alias("chunk_no"),
            (j * stride).cast("long").alias("start_tok"),
            F.concat_ws(" ", F.slice(toks, j * stride + 1, chunk_tokens))
            .alias("chunk")))
    out = docs.select(F.col(id_col), F.explode(chunks).alias("__c"))
    return out.select(
        id_col,
        F.col("__c.chunk_no").alias("chunk_no"),
        F.col("__c.start_tok").alias("start_tok"),
        F.col("__c.chunk").alias("chunk"),
        F.size(F.split(F.col("__c.chunk"), r"\s+")).cast("long")
        .alias("n_tokens"))


def exact_substring_scrub_text(docs: DataFrame, *, n: int = 3,
                               window: int = 4,
                               min_len_tokens: int | None = None,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               max_fingerprint_df: int | None = None,
                               scale: bool = False,
                               candidate_pairs: DataFrame | None = None,
                               match_strategy: str = "auto",
                               portable: bool = False) -> DataFrame:
    """The REWRITING form of span-level dedup: apply the keep-first rule
    of :func:`exact_substring_scrub` and return the actual scrubbed
    corpus — (doc_id, text) where every >= min_len_tokens run that
    already occurs in a lower-id document is EXCISED from this one
    (first occurrence keeps; a fully-scrubbed doc returns '').

    Shape: span intervals attach per victim doc (span-count-sized), the
    corpus tokenizes once, and the removal is a doc-co-keyed anti join
    of token positions against the victim's intervals — interval
    membership needs no merge pass (a token inside ANY interval drops).
    Reassembly sorts each doc's surviving (pos, token) structs inside a
    plain aggregate — engine-stable because positions are unique — so
    the output is deterministic and a SQL oracle rebuilds it verbatim
    with an ordered string_agg."""
    spans = exact_substring_spans(docs, n=n, window=window,
                                  min_len_tokens=min_len_tokens,
                                  text_col=text_col, id_col=id_col,
                                  max_fingerprint_df=max_fingerprint_df,
                                  scale=scale,
                                  candidate_pairs=candidate_pairs,
                                  match_strategy=match_strategy,
                                  portable=portable)
    iv = spans.select(F.col("id_b").alias("__vid"),
                      F.col("start_b").alias("__s"),
                      (F.col("start_b") + F.col("len_tokens")).alias("__e"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+"))
        .alias("pos", "tok"))
    kept = toks.join(
        iv, (toks.doc_id == iv.__vid) & (toks.pos >= iv.__s)
        & (toks.pos < iv.__e), "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                       lambda x: x["tok"]), " ").alias("__text")))
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (base.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("__text", F.lit("")).alias("text")))


def cdc_chunks(docs: DataFrame, *, window: int = 16, divisor: int = 64,
               text_col: str = "text", id_col: str = "doc_id",
               keep_cols: tuple = (), portable: bool = True) -> DataFrame:
    """Content-defined chunking (the storage-dedup primitive behind
    rsync/LBFS/FastCDC, applied to corpus text): cut each document at
    positions where the rolling ``window``-char fingerprint hits
    ``hash % divisor == 0``, yielding chunks of ~``divisor`` expected
    length whose BOUNDARIES move with the content — an insertion early
    in a document shifts byte offsets but re-synchronizes at the next
    content-defined cut, so every chunk after it still dedups against
    the unedited copy. Fixed-size blocks lose all alignment instead;
    this is the chunking a blob/document store dedups with.

    Boundary rule (stateless, so an external SQL engine replays it
    exactly): position ``i`` (1-based, ``i >= window``) cuts after char
    ``i`` iff ``portable_hash60(substr(text, i-window+1, window)) %
    divisor == 0``. Chunks are the segments between consecutive
    boundaries ``[0] + cuts + [len]``; docs shorter than ``window``
    are a single chunk; empty docs yield no chunks.

    ``portable=False`` is the PRODUCTION mode: a true rolling
    polynomial (Rabin) hash evaluated in Arrow batches
    (:func:`_cdc_chunks_rolling`) — O(window) vectorized numpy passes
    per batch instead of one md5 per POSITION through the explode, the
    standard portable-vs-production hash trade (SCALE.md §8) taken one
    step further because here even a cheap per-position hash pays the
    O(total chars) row explode. Boundaries differ from portable mode
    (different hash family; offsets are BYTES there, chars here) but
    the CDC contract — tiling, ~divisor expected length, boundary
    re-synchronization after edits — is identical and test-pinned in
    both modes.

    Plan shape (portable mode): the position explode is a flat map
    (O(total chars) rows through a projection, no shuffle), cut
    positions aggregate to one array per doc (shuffle carries
    ~len/divisor ints per doc, not the text), and chunk extraction is
    array arithmetic joined back to the one-row-per-doc text — all
    whole-stage codegen, no UDFs.
    Returns (id, *keep_cols, chunk_idx, chunk_start, chunk_len,
    chunk_hash=md5(chunk))."""
    from eventstorm_spark.extensions.dedup import portable_hash60

    if not portable:
        return _cdc_chunks_rolling(docs, window=window, divisor=divisor,
                                   text_col=text_col, id_col=id_col,
                                   keep_cols=keep_cols)

    keep = [F.col(c) for c in keep_cols]
    base = docs.select(F.col(id_col).alias("__id"), *keep,
                       F.col(text_col).alias("__t"),
                       F.length(text_col).alias("__len"))
    pos = (base.where(F.col("__len") >= window)
           .select("__id", "__t",
                   F.explode(F.sequence(F.lit(window), F.col("__len")))
                   .alias("i")))
    win = F.substring(F.col("__t"), F.col("i") - (window - 1),
                      F.lit(window))
    h = portable_hash60(win)
    cuts = (pos.where(F.pmod(h, F.lit(divisor)) == 0)
            .groupBy("__id")
            .agg(F.sort_array(F.collect_list("i")).alias("__cuts")))
    empty = F.array().cast("array<int>")
    withc = (base.where(F.col("__len") > 0)
             .join(cuts, "__id", "left")
             .withColumn("__cuts", F.coalesce("__cuts", empty)))
    last = F.coalesce(F.try_element_at("__cuts", F.lit(-1)), F.lit(0))
    bounds = F.concat(
        F.array(F.lit(0)), F.col("__cuts"),
        F.when(F.col("__len") > last,
               F.array(F.col("__len"))).otherwise(empty))
    withb = withc.withColumn("__b", bounds)
    j = F.explode(F.sequence(F.lit(1), F.size("__b") - 1)).alias("j")
    ch = withb.select("__id", *keep_cols, "__t", "__b", j)
    start = F.element_at("__b", F.col("j"))
    clen = F.element_at("__b", F.col("j") + 1) - start
    chunk = F.substring(F.col("__t"), start + 1, clen)
    return ch.select(F.col("__id").alias(id_col), *keep_cols,
                     F.col("j").alias("chunk_idx"),
                     start.alias("chunk_start"),
                     clen.alias("chunk_len"),
                     F.md5(chunk).alias("chunk_hash"))


def _cdc_chunks_rolling(docs: DataFrame, *, window: int, divisor: int,
                        text_col: str, id_col: str,
                        keep_cols: tuple) -> DataFrame:
    """Production CDC chunker: Rabin polynomial rolling hash over UTF-8
    BYTES, Arrow-batched. The per-position fingerprint is
    ``H(p) = sum_j byte[p+j] * B^(window-1-j) mod 2^64`` (B=257, the
    modulus implicit in uint64 wraparound); instead of rolling
    position-by-position it is evaluated as ``window`` shifted
    vectorized multiply-adds over the whole byte array — O(window)
    numpy passes per document, no per-position Python and no
    per-position row explode. Cut after byte ``i`` (1-based,
    ``i >= window``) iff ``H(i-window) % divisor == 0`` — the same
    window-ending-at-i rule as portable mode, over bytes.

    Stateless per document, so this is a pure flat map: no shuffle at
    all (the portable path shuffles cut arrays to rejoin the text; here
    the text is already in hand inside the batch). chunk_start /
    chunk_len are BYTE offsets; chunk_hash = md5 of the chunk's bytes,
    which for ASCII text equals portable mode's md5-of-substring."""
    import hashlib

    fields = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    # backtick-quote carried names so a non-identifier id/keep column
    # (e.g. "chunk id") parses in the DDL schema string
    out_schema = ", ".join(
        [f"`{id_col}` {fields[id_col]}"]
        + [f"`{c}` {fields[c]}" for c in keep_cols]
        + ["chunk_idx int", "chunk_start int", "chunk_len int",
           "chunk_hash string"])
    src = docs.select(id_col, *keep_cols, text_col)
    w = window
    weights = np.array([pow(257, w - 1 - j, 1 << 64) for j in range(w)],
                       dtype=np.uint64)

    n_keep = len(keep_cols)

    def chunker(batches):
        for pdf in batches:
            ids, keeps, idxs, starts, lens, hashes = \
                [], {c: [] for c in keep_cols}, [], [], [], []
            # name=None yields plain tuples in src's column order
            # (id, *keeps, text) — getattr-by-name breaks on column
            # names that aren't valid identifiers (pandas renames
            # them to _1, _2, … in named tuples)
            for row in pdf.itertuples(index=False, name=None):
                text = row[n_keep + 1]
                b = text.encode("utf-8") if text is not None else b""
                n = len(b)
                if n == 0:
                    continue
                if n < w:
                    bounds = [0, n]
                else:
                    c = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                    m = n - w + 1
                    H = np.zeros(m, dtype=np.uint64)
                    with np.errstate(over="ignore"):
                        for j in range(w):
                            H += c[j:j + m] * weights[j]
                    cuts = (np.nonzero(H % np.uint64(divisor)
                                       == 0)[0] + w).tolist()
                    bounds = [0] + cuts + ([n] if (not cuts
                                                   or cuts[-1] < n) else [])
                for j, (s, e) in enumerate(zip(bounds, bounds[1:]),
                                           start=1):
                    ids.append(row[0])
                    for ci, cc in enumerate(keep_cols, start=1):
                        keeps[cc].append(row[ci])
                    idxs.append(j)
                    starts.append(s)
                    lens.append(e - s)
                    hashes.append(hashlib.md5(b[s:e]).hexdigest())
            if ids:
                out = {id_col: ids}
                out.update(keeps)
                out.update({"chunk_idx": idxs, "chunk_start": starts,
                            "chunk_len": lens, "chunk_hash": hashes})
                yield pd.DataFrame(out)

    return src.mapInPandas(chunker, out_schema)


def phrase_search(docs: DataFrame, phrase: list[str], *,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact phrase search via positional postings — the query shape
    BM25's bag-of-words ranking can't express (:func:`bm25_top_docs`
    scores the terms anywhere; this requires them ADJACENT and in
    order). Classic positional-index evaluation: filter the token
    stream to the query terms (term-selective — the posting lists are
    tiny next to the corpus), then one equi-join per subsequent term
    on ``(doc, pos - offset)``, so a k-term phrase is k-1 joins over
    lists the size of the rarest terms, never a rescan of the text.

    Returns (doc, n_matches, first_pos) per matching document,
    positions 0-based. At corpus scale the postings come from the
    at-rest positional variant of the BM25 index (same bucketed
    layout; positions are one extra int column) and the joins key on
    the already-partitioned doc id."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (docs.select(F.col(id_col).alias("doc"),
                        F.posexplode(toks).alias("pos", "tok"))
            .where(F.col("tok").isin(list(set(phrase)))))
    return _phrase_join(base, phrase)


def _phrase_join(postings: DataFrame, phrase: list[str]) -> DataFrame:
    """Shared phrase evaluation over (doc, pos, tok) postings — used by
    both the in-memory :func:`phrase_search` and the at-rest
    ``curation.phrase_against_index`` serving path, so the two cannot
    drift (index-vs-direct equality is test-pinned)."""
    cur = (postings.where(F.col("tok") == phrase[0])
           .select("doc", F.col("pos").alias("p0")))
    for j, term in enumerate(phrase[1:], start=1):
        nxt = (postings.where(F.col("tok") == term)
               .select("doc", (F.col("pos") - j).alias("p0")))
        cur = cur.join(nxt, ["doc", "p0"])
    return (cur.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.min("p0").alias("first_pos")))


def pmi_pairs(docs: DataFrame, *, min_df_frac: float = 0.05,
              max_df_frac: float = 0.9, min_cooc: int = 5, k: int = 50,
              text_col: str = "text", id_col: str = "doc_id",
              terms: DataFrame | None = None) -> DataFrame:
    """Top-k token pairs by pointwise mutual information over
    within-document co-occurrence — collocation / market-basket mining
    (``pmi = ln(P(a,b) / (P(a)P(b)))`` with document-level events):
    the read that surfaces multiword expressions, template phrases and
    topically-bound vocabulary before a tokenizer or dedup pass eats
    them.

    Scale shape: co-occurrence pairs explode as (distinct kept terms
    per doc)^2, so the vocabulary is BANDED first — terms in fewer
    than ``min_df_frac`` of docs can't meet any support threshold and
    the near-ubiquitous head above ``max_df_frac`` is both
    uninformative (PMI ~ 0 by construction) and the quadratic
    adversary — the same df-cap discipline as ``max_shingle_df`` in
    the dedup tier. After banding: one distinct, one df aggregate, a
    broadcast-banded semi-join, and the per-doc pair self-join keyed
    on the doc id. Counts stay exact; the PMI ratio is evaluated in
    doubles with one fixed association (products exceed int64 at
    corpus scale), rounded 6.

    ``terms`` lets a caller supply the (doc, term) rows (e.g. derived
    from a shared/at-rest postings table) instead of tokenizing
    ``text_col``; ``docs`` is still scanned for the corpus size."""
    if terms is None:
        terms = docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.expr(
                f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
            .alias("term"))
    toks = terms.select("doc", "term").distinct()
    n_docs = docs.select(F.countDistinct(id_col).alias("__N"))
    df_ = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    kept = (df_.crossJoin(F.broadcast(n_docs))
            .where((F.col("__df") >= F.lit(min_df_frac) * F.col("__N"))
                   & (F.col("__df") <= F.lit(max_df_frac) * F.col("__N")))
            .select("term", "__df"))
    # `kept` feeds three joins and `t` both sides of the pair
    # self-join; without materialization each consumer re-runs the
    # distinct + df aggregate over the full postings (4 identical
    # broadcast-build stages measured). Both frames are banded-vocab
    # bounded: `kept` is the vocabulary band, `t` its postings.
    kept = kept.localCheckpoint(eager=False)
    t = toks.join(kept.select("term"), "term", "left_semi")
    t = t.localCheckpoint(eager=False)
    a = t.select("doc", F.col("term").alias("term_a"))
    b = t.select("doc", F.col("term").alias("term_b"))
    pairs = (a.join(b, "doc")
             .where(F.col("term_a") < F.col("term_b"))
             .groupBy("term_a", "term_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_cooc))
    stats = (pairs
             .join(kept.withColumnRenamed("term", "term_a")
                   .withColumnRenamed("__df", "n_a"), "term_a")
             .join(kept.withColumnRenamed("term", "term_b")
                   .withColumnRenamed("__df", "n_b"), "term_b")
             .crossJoin(F.broadcast(n_docs)))
    pmi = F.round(F.log(
        (F.col("n_ab").cast("double") * F.col("__N"))
        / (F.col("n_a").cast("double") * F.col("n_b"))), 6)
    return (stats.select("term_a", "term_b", "n_ab", "n_a", "n_b",
                         pmi.alias("pmi"))
            .orderBy(F.col("pmi").desc(), "term_a", "term_b")
            .limit(k))


def proximity_search(docs: DataFrame, terms: list[str], *, slop: int = 8,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Unordered proximity search — the middle ground between
    bag-of-words BM25 (terms anywhere) and :func:`phrase_search`
    (exact adjacency): documents where ALL ``terms`` occur within a
    window of ``slop`` tokens, reported with the tightest such window.
    Classic positional-index evaluation again: term-filtered postings,
    one equi-join per term on the doc id, window span =
    ``max(pos) - min(pos)`` filtered to ``<= slop``.

    The k-way position product is bounded by (occurrences of the
    RAREST query term per doc)^k-ish — fine for query-shaped k (2-4)
    and banded vocabularies; for stopword-frequency terms apply the
    same df-cap discipline as :func:`pmi_pairs` first. Returns (doc,
    best_span, n_windows): minimal span and the number of qualifying
    position combinations."""
    if len(terms) < 2:
        raise ValueError("proximity_search needs at least two terms")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (docs.select(F.col(id_col).alias("doc"),
                        F.posexplode(toks).alias("pos", "tok"))
            .where(F.col("tok").isin(terms)))
    return _proximity_join(base, terms, slop)


def _proximity_join(postings: DataFrame, terms: list[str],
                    slop: int) -> DataFrame:
    """Shared proximity evaluation over (doc, pos, tok) postings —
    used by the in-memory :func:`proximity_search` and by callers
    serving a shared/at-rest positional postings table (the same
    split as :func:`_phrase_join`, so the two search forms cannot
    drift from their index-served twins)."""
    cur = (postings.where(F.col("tok") == terms[0])
           .select("doc", F.col("pos").alias("p0")))
    for j, term in enumerate(terms[1:], start=1):
        nxt = (postings.where(F.col("tok") == term)
               .select("doc", F.col("pos").alias(f"p{j}")))
        cur = cur.join(nxt, "doc")
    ps = [F.col(f"p{j}") for j in range(len(terms))]
    span = F.greatest(*ps) - F.least(*ps)
    return (cur.select("doc", span.alias("__span"))
            .where(F.col("__span") <= slop)
            .groupBy("doc")
            .agg(F.min("__span").alias("best_span"),
                 F.count(F.lit(1)).alias("n_windows")))


def hashed_tfidf_rows(docs: DataFrame, *, dim: int = 256,
                      text_col: str = "text", id_col: str = "doc_id",
                      portable: bool = True,
                      terms: DataFrame | None = None) -> DataFrame:
    """Feature-hashed sparse TF-IDF vectors as (doc, slot, w) ROWS —
    text similarity with no trained model: each term hashes to one of
    ``dim`` slots (the hashing trick — collisions sum, no vocabulary
    table to build or broadcast), weighted tf * ln(N/df), rounded 6.

    Deliberately SPARSE-relational rather than dense arrays: the
    downstream cosine join (:func:`hashed_tfidf_knn`) is then an
    inverted-index equi-join on the slot — the classic scalable
    sparse-similarity plan — and every step stays in whole-stage
    codegen (a dense array would cost an interpreted per-element HOF
    per doc). One tokenize pass, two map-side-combined aggregates.

    ``terms`` lets a caller that already holds the (doc, term) rows —
    e.g. derived from a shared/at-rest postings table — skip the
    tokenize pass; alnum runs never span whitespace, so terms derived
    from whitespace postings are identical to tokenizing the text."""
    from eventstorm_spark.extensions.dedup import portable_hash60

    if terms is None:
        terms = docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.expr(
                f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
            .alias("term"))
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__N"))
    df_ = (terms.select("doc", "term").distinct()
           .groupBy("term").agg(F.count(F.lit(1)).alias("__df")))
    h = (portable_hash60(F.col("term")) if portable
         else F.shiftrightunsigned(F.xxhash64("term"), 4))
    return (tf.join(df_, "term").crossJoin(F.broadcast(n_docs))
            .select("doc", F.pmod(h, F.lit(dim)).cast("int").alias("slot"),
                    (F.col("tf")
                     * F.log(F.col("__N").cast("double") / F.col("__df")))
                    .alias("__w"))
            .groupBy("doc", "slot")
            .agg(F.round(F.sum("__w"), 6).alias("w")))


def hashed_tfidf_knn(docs: DataFrame, query_docs: DataFrame, *,
                     dim: int = 256, k: int = 3,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     terms: DataFrame | None = None) -> DataFrame:
    """Top-k cosine neighbors of each query doc over hashed-TF-IDF
    vectors, evaluated as an INVERTED-INDEX join: corpus rows keyed by
    slot, query rows (a small set) broadcast against them, partial
    products grouped per (query, candidate) — never a dense all-pairs
    product, and the slot key bounds the fanout to docs sharing a
    hash slot. The no-embedding-model twin of `ann_cosine_topk`; at
    corpus scale the (doc, slot, w) rows live at rest next to the
    BM25 postings and queries never re-tokenize the corpus.

    Cost contract (measured, SCALE.md §10.4): linear in corpus size
    for a FIXED query batch (52 queries: 2.7 s -> 9.5 s at 10x data);
    a query set that GROWS with the corpus (e.g. a corpus-fraction
    filter) makes the pair stage quadratic — batch query workloads,
    don't self-join the corpus through this (that read is the
    MinHash/SimHash dedup tier).
    Returns (q_doc, doc, cosine) with self-matches excluded."""
    from pyspark.sql import Window as W

    # rows feeds four consumers (q, dots, both norm sides): without a
    # checkpoint the tokenize+tf+df pipeline re-derives per consumer
    # (measured 4x the work at sf0.1)
    rows = hashed_tfidf_rows(docs, dim=dim, text_col=text_col,
                             id_col=id_col,
                             terms=terms).localCheckpoint(eager=False)
    norms = (rows.groupBy("doc")
             .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("__n"))
             ).localCheckpoint(eager=False)
    qids = query_docs.select(F.col(id_col).alias("doc")).distinct()
    q = (rows.join(F.broadcast(qids), "doc")
         .select(F.col("doc").alias("q_doc"), "slot",
                 F.col("w").alias("qw")))
    dots = (q.join(rows, "slot")
            .where(F.col("q_doc") != F.col("doc"))
            .groupBy("q_doc", "doc")
            .agg(F.sum(F.col("qw") * F.col("w")).alias("__dot")))
    qn = norms.select(F.col("doc").alias("q_doc"),
                      F.col("__n").alias("__qn"))
    scored = (dots.join(F.broadcast(qn), "q_doc").join(norms, "doc")
              .select("q_doc", "doc",
                      F.round(F.col("__dot")
                              / (F.col("__qn") * F.col("__n")), 6)
                      .alias("cosine")))
    w = W.partitionBy("q_doc").orderBy(F.col("cosine").desc(), "doc")
    return (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))
