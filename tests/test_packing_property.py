"""Property sweep of sequence packing: for random corpora (ragged doc
lengths, empty docs, single-token docs, docs longer than several
sequences) and random seq_len, pack_token_spans must be an exact
partition of the global token range — every token lands in exactly one
(sequence, slice), slices are contiguous within a doc, every sequence
except the last is exactly full, and the result is independent of the
input partitioning."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from eventstorm_spark.extensions.packing import pack_token_spans

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from eventstorm_spark.session import get_spark
        _spark = get_spark("packing_property")
    return _spark


corpus_strategy = st.lists(
    st.integers(min_value=0, max_value=40),   # token count per doc
    min_size=0, max_size=20,
)


@given(corpus=corpus_strategy,
       seq_len=st.integers(min_value=1, max_value=17),
       n_parts=st.integers(min_value=1, max_value=5))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_packing_partitions_tokens(corpus, seq_len, n_parts):
    spark = _get_spark()
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(corpus)]
    docs = spark.createDataFrame(rows or [(0, "")], "doc_id long, text string")
    if not rows:
        docs = docs.where("doc_id < 0")  # genuinely empty corpus
    spans = pack_token_spans(docs.repartition(n_parts), seq_len=seq_len).collect()

    expect = {i: n for i, n in enumerate(corpus) if n > 0}
    per_doc: dict[int, list] = {}
    per_seq: dict[int, int] = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(r)
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_toks"]
        assert r["n_toks"] >= 1

    assert set(per_doc) == set(expect)
    for did, slices in per_doc.items():
        slices.sort(key=lambda r: r["off_in_doc"])
        off = 0
        for s in slices:
            assert s["off_in_doc"] == off
            off += s["n_toks"]
        assert off == expect[did]

    total = sum(expect.values())
    assert sum(per_seq.values()) == total
    if per_seq:
        last = max(per_seq)
        assert set(per_seq) == set(range(last + 1))  # no gaps in seq ids
        for sid, n in per_seq.items():
            assert n == seq_len or sid == last
