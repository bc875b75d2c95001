"""Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
merge table for a byte-pair-encoding vocabulary from the corpus — the
tokenizer-fitting step of an LLM data pipeline, next to the token
*counting* the text operators already do.

Scale shape — the part worth getting right:

- BPE trains on the **word frequency table**, not the corpus: one
  corpus-sized tokenize/count shuffle up front, then every merge
  iteration touches only the vocabulary-sized (word, freq, symbols)
  frame. On a 100 TB crawl the vocab table is millions of rows — an
  aggregate per iteration, never a corpus rescan.
- Each iteration is ONE distributed pair-count aggregate (explode the
  adjacent-symbol pairs, sum word frequencies, map-side combinable)
  plus a driver-side top-1 (a 1-row collect — the argmax merge is
  inherently sequential, this is the only serialization point, same as
  every published BPE trainer).
- The merge applies as two chained single-space string replaces on the
  sentinel-spaced symbol string (`" t h e </w> "`): pass 1 merges
  left-to-right non-overlapping occurrences, pass 2 catches the
  alternating overlaps pass 1's consumed spaces skipped. NOTE: this is
  deliberately the *two-pass-replace* merge rule, NOT textbook greedy
  left-to-right BPE — for runs of >=5 identical symbols the two differ
  (``a a a a a`` -> ``aa a aa`` here vs greedy's ``aa aa a``). The rule
  is chosen because it is expressible as engine-portable string
  `replace` with no per-row Python, so the distributed path, the driver
  fast path (:func:`_train_driver` replicates the replace semantics
  token-exactly), and the SQL oracle all apply the IDENTICAL rule and
  the learned merge table is bit-for-bit reproducible across all three.

Determinism: ties in pair counts break on the pair string ascending, so
the learned merge table is unique given the corpus — reproducible
across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from eventstorm_spark.extensions.text import _widen_narrow
from eventstorm_spark.localframe import local_frame

END_MARK = "</w>"


def word_frequencies(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercase alphanumeric tokens — the ONLY
    corpus-sized pass of BPE training."""
    # cores/4 fan-out floor, shared with every text-tokenize widen
    # (round 18: full-width fan-out anti-scaled — see _widen_narrow)
    docs = _widen_narrow(docs)
    return (docs.select(
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _initial_symbols() -> F.Column:
    """Sentinel-spaced character split: 'the' -> ' t h e </w> '."""
    return F.concat(F.lit(" "),
                    F.concat_ws(" ", F.expr("regexp_extract_all(word, '.', 0)")),
                    F.lit(" " + END_MARK + " "))


def _pairs_col() -> F.Column:
    """Adjacent symbol pairs of the current symbol string, as
    'a b' strings. A higher-order transform — acceptable here because
    it runs on the vocabulary-sized frame, never the corpus."""
    arr = F.split(F.trim(F.col("syms")), " ")
    return F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda j: F.concat(F.element_at(arr, j), F.lit(" "),
                               F.element_at(arr, j + 1)))
    ).otherwise(F.array().cast("array<string>"))


def train_bpe(docs: DataFrame, *, num_merges: int = 8,
              text_col: str = "text",
              driver_max_vocab: int = 200_000) -> tuple[list[tuple], DataFrame]:
    """Learn ``num_merges`` BPE merges. Returns (merge table rows
    [(step, pair, merged, count)], the final (word, freq, syms) frame
    for downstream tokenization/fertility stats).

    Hybrid execution (the ``duplicate_clusters`` driver-fast-path
    pattern): when the vocabulary fits under ``driver_max_vocab``
    rows, the (word, freq) table is collected ONCE and the merge loop
    runs in pure Python — the iteration cost is then dict updates, not
    2 Spark jobs per merge (~10x on small corpora, and the bytes moved
    equal what one distributed iteration would shuffle anyway). Above
    the threshold the loop stays fully distributed: per iteration one
    map-side-combinable pair-count aggregate + a 1-row argmax collect.
    Both paths implement the identical two-pass-replace merge rule (see
    module docstring) and the same (count DESC, pair ASC) tie-break —
    equivalence is pinned by test (including runs of 5+ identical
    symbols, where two-pass-replace and textbook greedy diverge) and by
    the step-replay SQL oracle."""
    wf = (word_frequencies(docs, text_col=text_col)
          .withColumn("syms", _initial_symbols())
          .localCheckpoint(eager=True))  # reused every iteration
    if wf.count() <= driver_max_vocab:
        rows = [(r["word"], int(r["freq"]), r["syms"].split())
                for r in wf.collect()]
        merges = _train_driver(rows, num_merges)
        spark = docs.sparkSession
        out = local_frame(spark, 
            [(w, f, " " + " ".join(s) + " ") for w, f, s in rows],
            "word string, freq long, syms string")
        return merges, out

    merges = []
    for step in range(1, num_merges + 1):
        cnt = (wf.select("freq", F.explode(_pairs_col()).alias("pair"))
               .groupBy("pair").agg(F.sum("freq").alias("c")))
        top = cnt.orderBy(F.col("c").desc(), F.col("pair")).limit(1).collect()
        if not top:
            break
        pair, c = top[0]["pair"], int(top[0]["c"])
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, c))
        pat, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
        wf = (wf.withColumn("syms",
                            F.replace(F.replace("syms", pat, rep), pat, rep))
              .localCheckpoint(eager=True))  # don't stack replace plans
    return merges, wf


def _replace_pass(syms: list, a: str, b: str, merged: str) -> list:
    """One non-overlapping left-to-right ``replace(' a b ', ' m ')``
    pass, expressed on the token list. The string replace consumes the
    trailing space of the match — which is the *leading* space of the
    next token — so after a merge the immediately following token can
    never start a match in the same pass: emit it verbatim and resume
    scanning one past it. Token-exact twin of the engine/oracle string
    semantics (verified against str.replace, Spark ``F.replace`` and
    DuckDB ``replace`` for runs of 2..9 identical symbols)."""
    out, j, n = [], 0, len(syms)
    while j < n:
        if j + 1 < n and syms[j] == a and syms[j + 1] == b:
            out.append(merged)
            j += 2
            if j < n:  # leading space consumed: cannot start a match
                out.append(syms[j])
                j += 1
        else:
            out.append(syms[j])
            j += 1
    return out


def _train_driver(rows: list, num_merges: int) -> list[tuple]:
    """Driver-side merge loop over [(word, freq, symbol_list)] — the
    same two-pass-replace merge rule and tie-break as the distributed
    path and the SQL oracle; mutates the symbol lists in place."""
    merges: list[tuple] = []
    for step in range(1, num_merges + 1):
        counts: dict[tuple, int] = {}
        for _, freq, syms in rows:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        # tie-break on the SAME "a b" string form the distributed path
        # and the SQL oracle order by
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merged = a + b
        merges.append((step, f"{a} {b}", merged, c))
        for i, (w, freq, syms) in enumerate(rows):
            out = _replace_pass(_replace_pass(syms, a, b, merged),
                                a, b, merged)
            rows[i] = (w, freq, out)
    return merges


def bpe_merge_table(docs: DataFrame, *, num_merges: int = 8,
                    text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame (step, pair, merged,
    count) — the query/oracle surface of :func:`train_bpe`."""
    merges, _ = train_bpe(docs, num_merges=num_merges, text_col=text_col)
    spark = docs.sparkSession
    return local_frame(spark, 
        merges, "step int, pair string, merged string, count long")


def bpe_token_counts(docs: DataFrame, *, num_merges: int = 8,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Tokenize the corpus under the learned vocabulary: per-document
    BPE token counts. Serving is a JOIN — the trained (word -> symbol
    count) table IS the tokenizer for in-vocabulary text, so applying
    BPE to the corpus costs one word explode plus a vocabulary-sized
    lookup join (size-gated, no forced broadcast), not a per-row merge
    loop. Returns (id, n_words, n_bpe_tokens)."""
    _, wf = train_bpe(docs, num_merges=num_merges, text_col=text_col)
    lut = wf.select(
        "word",
        F.size(F.split(F.trim("syms"), " ")).cast("long").alias("__n"))
    words = docs.select(
        F.col(id_col),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
        .alias("word"))
    return (words.join(lut, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("__n").alias("n_bpe_tokens")))


def bpe_fertility(docs: DataFrame, *, num_merges: int = 8,
                  text_col: str = "text") -> DataFrame:
    """Tokenizer quality probe: corpus fertility (BPE tokens per word)
    under the learned vocabulary — 1 row: words, bpe tokens, fertility.
    Computed from the final symbols frame: tokens per word = symbol
    count, weighted by word frequency."""
    _, wf = train_bpe(docs, num_merges=num_merges, text_col=text_col)
    n_syms = F.size(F.split(F.trim("syms"), " ")).cast("long")
    return (wf.select("freq", n_syms.alias("n_syms"))
            .agg(F.sum("freq").alias("n_words"),
                 F.sum(F.col("freq") * F.col("n_syms")).alias("n_bpe_tokens"),
                 F.round(F.sum(F.col("freq") * F.col("n_syms"))
                         / F.sum("freq"), 6).alias("fertility")))


def wordpiece_vocab(docs: DataFrame, *, max_piece_len: int = 5,
                    num_pieces: int = 64, text_col: str = "text",
                    wf: DataFrame | None = None) -> DataFrame:
    """Frequency-initialized subword vocabulary for greedy
    longest-match segmentation (:func:`wordpiece_segment`) — the OTHER
    major tokenizer family next to the BPE trainer: every observed
    single character (coverage — segmentation can always advance) plus
    the ``num_pieces`` highest-scoring multi-char substrings, scored
    by occurrence count weighted by word frequency, ties broken by
    piece string so the vocabulary is a pure function of the corpus.

    Relational end to end: the corpus-sized pass is
    :func:`word_frequencies` (shared with BPE); candidates explode
    from the (vocabulary-sized) word table as (position, length)
    substrings — O(|words| x len x max_piece_len) rows, corpus-size
    independent — and the top-K is one window. Returns (piece, n).

    ``wf`` lets a caller that already materialized the
    (word, freq) table (e.g. to share the corpus tokenize pass with a
    segmentation usage rollup) pass it in instead of re-deriving it."""
    if wf is None:
        wf = word_frequencies(docs, text_col=text_col)
    cands = None
    for ln in range(1, max_piece_len + 1):
        c = (wf.select(
            "freq",
            F.explode(F.sequence(F.lit(1),
                                 F.length("word") - (ln - 1)))
            .alias("i"),
            F.col("word"))
            .where(F.length("word") >= ln)
            .select(F.substring(F.col("word"), F.col("i"),
                                F.lit(ln)).alias("piece"), "freq"))
        cands = c if cands is None else cands.unionByName(c)
    cnt = cands.groupBy("piece").agg(F.sum("freq").alias("n"))
    chars = cnt.where(F.length("piece") == 1)
    from pyspark.sql import Window as W
    rn = F.row_number().over(W.orderBy(F.col("n").desc(), "piece"))
    multi = (cnt.where(F.length("piece") >= 2)
             .withColumn("__rn", rn)
             .where(F.col("__rn") <= num_pieces).drop("__rn"))
    return chars.unionByName(multi)


def wordpiece_segment(words: DataFrame, vocab: DataFrame, *,
                      max_piece_len: int = 5) -> DataFrame:
    """Greedy longest-match segmentation (WordPiece inference rule):
    from each position take the longest vocabulary piece matching the
    remaining word — deterministic with no tie cases (two equal-length
    matches of the same prefix are the same string), which is what
    makes the whole tokenizer SQL-replayable (the oracle runs the same
    rule as a recursive CTE); Viterbi/unigram-LM segmentation would
    need float-score tie-breaks an external engine can't replay
    exactly.

    ``words`` is a (word, ...) frame — segment DISTINCT words, join
    results back by word (the standard vocabulary-table trick: cost
    scales with |vocabulary|, not corpus). The vocab is collected and
    broadcast (bounded: alphabet + num_pieces rows — the same
    bounded-collect contract as k-means centroids/PQ codebooks); the
    per-word loop is an Arrow-batched mapInPandas. Raises if a word
    contains a character outside the vocabulary (build the vocab on
    the same corpus, or extend it). Returns (word, idx, piece)."""
    pieces = frozenset(r.piece for r in vocab.select("piece").collect())
    bc = words.sparkSession.sparkContext.broadcast(pieces)

    def seg(batches):
        import pandas as pd
        vs = bc.value
        for pdf in batches:
            w_o, i_o, p_o = [], [], []
            for w in pdf["word"]:
                pos, idx = 0, 0
                while pos < len(w):
                    for ln in range(min(max_piece_len, len(w) - pos),
                                    0, -1):
                        cand = w[pos:pos + ln]
                        if cand in vs:
                            break
                    else:
                        raise ValueError(
                            f"no vocab piece covers {w!r} at {pos}")
                    w_o.append(w)
                    i_o.append(idx)
                    p_o.append(cand)
                    idx += 1
                    pos += len(cand)
            if w_o:
                yield pd.DataFrame({"word": w_o, "idx": i_o,
                                    "piece": p_o})

    return (words.select("word").distinct()
            .mapInPandas(seg, "word string, idx int, piece string"))


def unigram_lm_vocab(docs: DataFrame, *, max_piece_len: int = 5,
                     num_pieces: int = 64, em_iters: int = 2,
                     text_col: str = "text",
                     wf: DataFrame | None = None) -> DataFrame:
    """SentencePiece-style unigram-LM vocabulary (Kudo 2018, the hard-EM
    / Viterbi variant) — the THIRD major tokenizer family next to the
    BPE trainer and greedy WordPiece: pieces carry log-probabilities
    and segmentation maximizes total piece log-prob instead of taking
    the longest match, which is what lets the model trade one rare long
    piece against two common short ones.

    Training, deterministically:

    1. **Seed** exactly like :func:`wordpiece_vocab`: every observed
       character (coverage) + the top-``num_pieces`` multi-char
       substrings by frequency-weighted occurrence count (ties by
       piece), with initial ``logp = round(ln(n / total), 9)``.
    2. **Hard EM**, ``em_iters`` rounds: E-step Viterbi-segments the
       DISTINCT-word table under the current log-probs
       (:func:`viterbi_segment` — the vocabulary-table trick again:
       cost scales with |words|, never the corpus); M-step counts
       frequency-weighted piece usage and re-estimates
       ``logp = round(ln(usage / total), 9)``. Unused multi-char
       pieces drop out; characters always survive with a floor count
       of 1 so coverage never breaks. Classification-EM guarantees the
       joint Viterbi objective is non-decreasing (test-pinned); the
       round-9 quantization makes every score engine-portable.

    All corpus-sized work is the one :func:`word_frequencies` pass
    (share it via ``wf``); each EM round is an Arrow-batched segment
    of the distinct words + one map-side-combinable usage aggregate,
    with only the (alphabet + num_pieces)-row prob table collected —
    the same bounded-collect contract as k-means centroids.
    Returns (piece, logp, n) with n the final usage count."""
    import math as _math

    if wf is None:
        wf = word_frequencies(docs, text_col=text_col)
    wf = wf.localCheckpoint(eager=False)  # feeds seeding AND every EM round
    seed = wordpiece_vocab(docs, max_piece_len=max_piece_len,
                           num_pieces=num_pieces, text_col=text_col, wf=wf)
    rows = seed.collect()  # bounded: alphabet + num_pieces
    total = float(sum(r.n for r in rows))
    logp = {r.piece: round(_math.log(r.n / total), 9) for r in rows}
    chars = {r.piece for r in rows if len(r.piece) == 1}

    for _ in range(em_iters):
        seg = viterbi_segment(wf, _logp_df(docs.sparkSession, logp),
                              max_piece_len=max_piece_len)
        usage = (seg.join(wf, "word")
                 .groupBy("piece").agg(F.sum("freq").alias("n"))
                 .collect())  # bounded by |vocab|
        counts = {r.piece: int(r.n) for r in usage}
        for c in chars:  # coverage floor: characters never drop out
            counts[c] = max(counts.get(c, 0), 1)
        total = float(sum(counts.values()))
        logp = {p: round(_math.log(n / total), 9)
                for p, n in counts.items()}

    out = sorted(logp.items())
    sess = docs.sparkSession
    final_counts = counts if em_iters > 0 else \
        {r.piece: int(r.n) for r in rows}
    return local_frame(sess, 
        [(p, lp, int(final_counts.get(p, 0))) for p, lp in out],
        "piece string, logp double, n long")


def _logp_df(spark, logp: dict) -> DataFrame:
    return local_frame(spark, sorted(logp.items()),
                                 "piece string, logp double")


def viterbi_segment(words: DataFrame, vocab: DataFrame, *,
                    max_piece_len: int = 5) -> DataFrame:
    """Viterbi (max total log-prob) segmentation under a (piece, logp)
    vocabulary — unigram-LM inference, the score-based counterpart of
    :func:`wordpiece_segment`'s greedy longest-match. Deterministic
    everywhere floats could wobble: prefix scores quantize to 9
    decimals at every DP step, and ties break on (fewer pieces, then
    lexicographically smaller piece sequence) — so the segmentation is
    a pure function of (word, vocabulary), reproducible across
    partitionings and engines.

    Same distributed shape as the greedy form: DISTINCT words through
    an Arrow-batched ``mapInPandas`` with the bounded vocab broadcast.
    Raises if a word contains a character outside the vocabulary.
    Returns (word, idx, piece)."""
    lp = {r.piece: float(r.logp) for r in
          vocab.select("piece", "logp").collect()}
    bc = words.sparkSession.sparkContext.broadcast(lp)

    def seg(batches):
        import pandas as pd
        table = bc.value
        for pdf in batches:
            w_o, i_o, p_o = [], [], []
            for w in pdf["word"].drop_duplicates():
                n = len(w)
                # best[i] = (score, -n_pieces, pieces tuple) for w[:i];
                # tuple comparison IS the tie-break order
                best = [None] * (n + 1)
                best[0] = (0.0, 0, ())
                for i in range(1, n + 1):
                    cand = None
                    for ln in range(1, min(max_piece_len, i) + 1):
                        prev = best[i - ln]
                        if prev is None:
                            continue
                        piece = w[i - ln:i]
                        plp = table.get(piece)
                        if plp is None:
                            continue
                        state = (round(prev[0] + plp, 9),
                                 prev[1] - 1, prev[2] + (piece,))
                        # max score; tie -> fewer pieces (-n larger);
                        # tie -> lexicographically SMALLER sequence
                        if cand is None or (
                                (state[0], state[1]) > (cand[0], cand[1])
                                or ((state[0], state[1])
                                    == (cand[0], cand[1])
                                    and state[2] < cand[2])):
                            cand = state
                    best[i] = cand
                if best[n] is None:
                    raise ValueError(
                        f"vocabulary cannot segment {w!r}")
                for idx, piece in enumerate(best[n][2]):
                    w_o.append(w)
                    i_o.append(idx)
                    p_o.append(piece)
            if w_o:
                yield pd.DataFrame({"word": w_o, "idx": i_o,
                                    "piece": p_o})

    return (words.select("word").distinct()
            .mapInPandas(seg, "word string, idx int, piece string"))
