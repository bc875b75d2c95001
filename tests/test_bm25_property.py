"""Property sweep of BM25 against a transparent pure-Python reference:
for random tiny corpora (shared vocab, repeated terms, docs with and
without query terms, empty docs) the distributed scorer must reproduce
the textbook formula's scores and ranking exactly."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from eventstorm_spark.extensions.text import bm25_top_docs

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from eventstorm_spark.session import get_spark
        _spark = get_spark("bm25_property")
    return _spark


VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]
QUERY = ["alpha", "beta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1, max_size=12,
)


def _reference_bm25(corpus, query, k1=1.2, b=0.75):
    docs = {i: toks for i, toks in enumerate(corpus) if toks}
    if not docs:
        return {}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {q: sum(1 for t in docs.values() if q in t) for q in query}
    out = {}
    for i, toks in docs.items():
        score = 0.0
        for q in query:
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1)
            score += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl))
        if score > 0.0:
            out[i] = round(score, 6)
    return out


@given(corpus=corpus_strategy)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bm25_matches_reference(corpus):
    spark = _get_spark()
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_top_docs(docs, QUERY, k=100).collect()}
    want = _reference_bm25(corpus, QUERY)
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])
