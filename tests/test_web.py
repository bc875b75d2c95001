"""URL canonicalization / URL dedup / host composition (extensions.web)."""

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.extensions.web import (
    canonical_url_expr,
    canonicalize_urls,
    host_composition,
    synth_urls,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url_expr("url").alias("c"))
            .collect()]


CASES = [
    # scheme/host case, www., default https port, fragment, param sort,
    # tracking junk, trailing slash — all collapse
    ("HTTPS://WWW.Foo.Example.com:443/a/b/?b=2&utm_source=x&a=1#frag",
     "https://foo.example.com/a/b?a=1&b=2"),
    # http default port
    ("http://foo.com:80/x?id=1", "http://foo.com/x?id=1"),
    # NON-default port survives
    ("https://foo.com:8443/x", "https://foo.com:8443/x"),
    # no query at all -> no '?'
    ("https://foo.com/x", "https://foo.com/x"),
    # tracking-only query -> no '?'
    ("https://foo.com/x?utm_campaign=a&gclid=z&ref=tw&fbclid=q",
     "https://foo.com/x"),
    # bare 'ref' (no '=') is still stripped; 'reftag=1' is NOT
    ("https://foo.com/x?ref&reftag=1", "https://foo.com/x?reftag=1"),
    # bare-root trailing slash canonicalizes to empty path
    ("https://foo.com/?a=1", "https://foo.com?a=1"),
    # repeated trailing slashes
    ("https://foo.com/a///", "https://foo.com/a"),
    # empty param fragments from '&&' are dropped
    ("https://foo.com/a?b=2&&a=1", "https://foo.com/a?a=1&b=2"),
    # www stripped only as a prefix label
    ("https://wwwx.foo.com/a", "https://wwwx.foo.com/a"),
]


def test_canonical_cases(spark):
    got = _canon(spark, [raw for raw, _ in CASES])
    for (raw, want), c in zip(CASES, got):
        assert c == want, raw


def test_canonicalize_is_pure_codegen(spark):
    df = spark.createDataFrame([("https://a.com/x?b=1",)], "url string")
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_url_dedup_keeps_min_id(spark):
    rows = [(1, "https://a.com/p?x=1"), (2, "https://a.com/p?x=1"),
            (3, "https://a.com/q"), (4, "https://a.com/p?x=1")]
    df = canonicalize_urls(
        spark.createDataFrame(rows, "doc_id long, url string"))
    kept = url_dedup(df)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    # payload columns survive (semi-join back by id, not a projection)
    assert set(kept.columns) == {"doc_id", "url", "canonical_url"}


def test_host_composition_math(spark):
    rows = [(1, "https://a.com/p"), (2, "https://a.com/p"),
            (3, "https://a.com/q"), (4, "https://b.com/r")]
    df = canonicalize_urls(
        spark.createDataFrame(rows, "doc_id long, url string"))
    got = {r.host: (r.n_docs, r.n_pages, r.dup_docs)
           for r in host_composition(df).collect()}
    assert got == {"a.com": (3, 2, 1), "b.com": (1, 1, 0)}


def test_synth_urls_deterministic_and_groups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u1 = synth_urls(docs).orderBy("doc_id").limit(20).collect()
    u2 = synth_urls(docs).orderBy("doc_id").limit(20).collect()
    assert u1 == u2
    # canonical groups = (source, doc_id % 100): every synthesized
    # variant of the same (source, page) collapses to ONE canonical URL
    c = canonicalize_urls(synth_urls(docs))
    n_groups = c.select("canonical_url").distinct().count()
    n_expected = (docs.select((F.col("doc_id") % 100).alias("p"), "source")
                  .distinct().count())
    assert n_groups == n_expected
    # and dedup keeps exactly one doc per group
    assert url_dedup(c).count() == n_expected


def test_canonical_idempotent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c = canonicalize_urls(synth_urls(docs))
    twice = c.withColumn("again", canonical_url_expr("canonical_url"))
    assert twice.where(F.col("again") != F.col("canonical_url")).count() == 0


def test_streaming_url_dedup(spark, tmp_path):
    """streaming_url_dedup: (a) frontier URLs already in the at-rest
    seen set are dropped (any raw spelling); (b) within a micro-batch
    and across batches (inside the watermark) only the first arrival
    per canonical URL survives, even under different raw spellings."""
    import datetime
    import os

    from eventstorm_spark.extensions.web import streaming_url_dedup

    t0 = datetime.datetime(2024, 1, 1)
    schema = "req_id long, ts timestamp, url string"
    feed_dir = os.path.join(str(tmp_path), "frontier")
    os.makedirs(feed_dir)
    seen = spark.createDataFrame(
        [("https://old.com/a?x=1",)], "url string")

    spark.createDataFrame(
        [(0, t0, "HTTPS://WWW.Old.com:443/a/?utm_source=f&x=1"),  # at rest
         (1, t0, "https://new.com/p?b=2&a=1"),                    # kept
         (2, t0, "https://WWW.new.com/p/?a=1&b=2&fbclid=z")],     # intra dup
        schema).coalesce(1).write.mode("append").parquet(feed_dir)
    src = spark.readStream.schema(schema).parquet(feed_dir)
    out = streaming_url_dedup(src, seen)
    got = []
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _e: got.extend(
             (r.req_id, r.canonical_url) for r in bdf.collect()))
         .start())
    try:
        q.processAllAvailable()
        # which raw spelling wins within the batch is unspecified; the
        # canonical key set is the contract
        assert [c for _, c in got] == ["https://new.com/p?a=1&b=2"]
        assert got[0][0] in (1, 2)
        spark.createDataFrame(
            [(3, t0, "Https://new.com/p?a=1&b=2&ref=tw"),  # cross-batch dup
             (4, t0, "https://new.com/q")],                # novel
            schema).coalesce(1).write.mode("append").parquet(feed_dir)
        q.processAllAvailable()
        assert sorted(c for _, c in got) == ["https://new.com/p?a=1&b=2",
                                             "https://new.com/q"]
    finally:
        q.stop()


def test_url_frontier_at_rest_via_digest_index(spark, tmp_path, sf_dir):
    """The module docstring's claim, pinned: an at-rest URL frontier
    store is the generic digest index with text_col='canonical_url' —
    build from the seen set, probe a new batch (any raw spelling of a
    seen page is dropped), append survivors, re-probe."""
    import os

    from eventstorm_spark.extensions.curation import (
        append_digest_index,
        dedup_against_digest_index,
        write_digest_index,
    )

    path = os.path.join(str(tmp_path), "frontier")
    seen = canonicalize_urls(spark.createDataFrame(
        [(1, "https://a.com/p?x=1")], "doc_id long, url string"))
    write_digest_index(seen, path, text_col="canonical_url", n_buckets=4)

    batch = canonicalize_urls(spark.createDataFrame(
        [(10, "HTTPS://WWW.a.com:443/p/?utm_source=f&x=1"),  # seen page
         (11, "https://b.com/q")],                           # novel
        "doc_id long, url string"))
    kept = dedup_against_digest_index(batch, spark, path,
                                      text_col="canonical_url")
    assert [r.doc_id for r in kept.collect()] == [11]
    append_digest_index(kept, path, text_col="canonical_url", n_buckets=4)

    batch2 = canonicalize_urls(spark.createDataFrame(
        [(20, "Https://b.com/q#frag"),   # now at rest via append
         (21, "https://c.com/r")],
        "doc_id long, url string"))
    kept2 = dedup_against_digest_index(batch2, spark, path,
                                       text_col="canonical_url")
    assert [r.doc_id for r in kept2.collect()] == [21]


# ---------------------------------------------------------------------------
# link graph + PageRank
# ---------------------------------------------------------------------------


def test_page_rank_mass_conserved_and_uniform_on_cycle(spark):
    from eventstorm_spark.extensions.web import page_rank
    # 3-cycle: symmetric, so rank stays uniform at 1/3 every iteration
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    got = {r.node: r.rank for r in page_rank(edges, iters=4).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_page_rank_dangling_mass_redistributed(spark):
    from eventstorm_spark.extensions.web import page_rank
    # b is dangling; total mass must still sum to 1 (no leak), and the
    # pointed-at node outranks the pointer
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r.node: r.rank for r in page_rank(edges, iters=5).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got["b"] > got["a"]


def test_page_rank_partitioning_independent(spark):
    from eventstorm_spark.extensions.web import page_rank
    rows = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    base = spark.createDataFrame(rows, ["src", "dst"])
    a = {(r.node, r.rank) for r in page_rank(base.coalesce(1)).collect()}
    b = {(r.node, r.rank)
         for r in page_rank(base.repartition(13)).collect()}
    assert a == b  # 9-decimal quantization absorbs summation order


def test_synth_link_graph_is_deterministic_and_cross_host(spark):
    from eventstorm_spark.extensions.web import synth_link_graph
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], ["doc_id", "source"])
    e1 = {(r.src, r.dst) for r in synth_link_graph(docs).collect()}
    e2 = {(r.src, r.dst)
          for r in synth_link_graph(docs.repartition(7)).collect()}
    assert e1 == e2
    hosts = {(s.split("/")[0], d.split("/")[0]) for s, d in e1}
    assert any(a != b for a, b in hosts)  # rank mass crosses hosts


def test_label_propagation_finds_planted_communities(spark):
    from eventstorm_spark.extensions.web import label_propagation
    # two cliques bridged by one weak edge: LPA must label each clique
    # uniformly and keep the two communities distinct
    cl_a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    cl_b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(cl_a + cl_b + [("a0", "b0")],
                                  ["src", "dst"])
    got = {r.node: r.label
           for r in label_propagation(edges, iters=4).collect()}
    a_labels = {got[f"a{i}"] for i in range(4)}
    b_labels = {got[f"b{i}"] for i in range(4)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    # deterministic under partitioning
    again = {r.node: r.label
             for r in label_propagation(edges.repartition(5),
                                        iters=4).collect()}
    assert again == got
