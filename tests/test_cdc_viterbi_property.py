"""Property sweeps for the two round-11 numeric kernels, each checked
against an INDEPENDENT reference implementation:

- the production CDC chunker (Arrow-batched vectorized Rabin rolling
  hash) vs a scalar big-int evaluation of the same polynomial — random
  unicode texts, random window/divisor; tiling + cut positions + chunk
  hashes must match exactly;
- Viterbi unigram-LM segmentation (DP with local tie-breaks) vs
  brute-force enumeration of ALL segmentations with the global
  (score, fewer-pieces, lexicographic) argmax — the empirical half of
  the suffix-monotonicity argument the oracle relies on.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from eventstorm_spark.session import get_spark
        _spark = get_spark("cdc_viterbi_property")
    return _spark


def _ref_chunks(text: str, w: int, divisor: int):
    """Scalar big-int reference for the rolling-hash chunker."""
    b = text.encode("utf-8")
    n = len(b)
    if n == 0:
        return []
    if n < w:
        bounds = [0, n]
    else:
        M = 1 << 64
        weights = [pow(257, w - 1 - j, M) for j in range(w)]
        cuts = []
        for p in range(n - w + 1):
            h = sum(b[p + j] * weights[j] for j in range(w)) % M
            if h % divisor == 0:
                cuts.append(p + w)
        bounds = [0] + cuts + ([n] if (not cuts or cuts[-1] < n) else [])
    return [(j, s, e - s, hashlib.md5(b[s:e]).hexdigest())
            for j, (s, e) in enumerate(zip(bounds, bounds[1:]), start=1)]


@given(texts=st.lists(st.text(max_size=50), min_size=1, max_size=5),
       w=st.integers(min_value=2, max_value=8),
       divisor=st.integers(min_value=2, max_value=16))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_cdc_rolling_matches_scalar_reference(texts, w, divisor):
    from eventstorm_spark.extensions.text import cdc_chunks

    spark = _get_spark()
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got: dict = {}
    for r in cdc_chunks(docs, window=w, divisor=divisor,
                        portable=False).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk_hash))
    for i, t in enumerate(texts):
        want = _ref_chunks(t, w, divisor)
        assert sorted(got.get(i, [])) == want, (t, w, divisor)


def _all_segs(w: str, pieces: frozenset, max_len: int):
    if not w:
        return [()]
    out = []
    for ln in range(1, min(max_len, len(w)) + 1):
        p = w[:ln]
        if p in pieces:
            out.extend((p,) + rest
                       for rest in _all_segs(w[ln:], pieces, max_len))
    return out


def _ref_viterbi(w: str, lp: dict, max_len: int):
    """Brute-force global argmax with stepwise round-9 scoring."""
    best_seg, best_key = None, None
    for seg in _all_segs(w, frozenset(lp), max_len):
        s = 0.0
        for p in seg:
            s = round(s + lp[p], 9)
        key = (s, -len(seg))
        if (best_seg is None or key > best_key
                or (key == best_key and seg < best_seg)):
            best_seg, best_key = seg, key
    return best_seg


@given(data=st.data())
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_viterbi_dp_equals_bruteforce_argmax(data):
    from eventstorm_spark.extensions.bpe import viterbi_segment

    spark = _get_spark()
    alphabet = "ab"
    words = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=1, max_size=7),
        min_size=1, max_size=4))
    multis = ["aa", "ab", "ba", "bb", "aab", "aba", "bab"]
    chosen = data.draw(st.lists(st.sampled_from(multis), max_size=5,
                                unique=True))
    # quantized log-probs; duplicates across pieces make ties likely
    lp_vals = st.sampled_from([-0.5, -1.0, -1.5, -2.0, -3.0])
    lp = {c: data.draw(lp_vals) for c in alphabet}
    for m in chosen:
        lp[m] = data.draw(lp_vals)

    vocab = spark.createDataFrame(sorted(lp.items()),
                                  "piece string, logp double")
    wdf = spark.createDataFrame([(w,) for w in words], ["word"])
    got: dict = {}
    for r in viterbi_segment(wdf, vocab, max_piece_len=3).collect():
        got.setdefault(r.word, []).append((r.idx, r.piece))
    for w in set(words):
        want = _ref_viterbi(w, lp, 3)
        pieces = tuple(p for _, p in sorted(got[w]))
        assert pieces == want, (w, lp)
