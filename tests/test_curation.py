"""Unit tests for the corpus-curation operators (curation.py): shard
routing/writing, padding-efficiency buckets, incremental cross-snapshot
dedup, and the dataset-card reports. The driver-facing query forms are
additionally oracle-checked in test_oracle_parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eventstorm_spark.extensions.curation import (
    assign_shards,
    dedup_against_corpus,
    length_bucket_report,
    profile_table,
    shard_manifest,
    snapshot_novelty_report,
    source_composition,
    vocab_coverage,
    write_training_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_assign_shards_deterministic_and_partition_invariant(spark):
    docs = _docs(spark, [(i, f"t {i}", "s") for i in range(200)])
    a = dict(assign_shards(docs, n_shards=8).select("doc_id", "shard").collect())
    b = dict(assign_shards(docs.repartition(13), n_shards=8)
             .select("doc_id", "shard").collect())
    assert a == b
    assert set(a.values()) <= set(range(8))
    # growth stability: adding docs never reassigns existing ids
    grown = _docs(spark, [(i, f"t {i}", "s") for i in range(400)])
    g = dict(assign_shards(grown, n_shards=8).select("doc_id", "shard").collect())
    assert all(g[i] == a[i] for i in a)


def test_assign_shards_balanced(spark):
    docs = _docs(spark, [(i * 1000, "t", "s") for i in range(2000)])
    counts = (assign_shards(docs, n_shards=4).groupBy("shard").count()
              .collect())
    assert len(counts) == 4
    for r in counts:
        assert 350 < r["count"] < 650  # ~500 each under salted hashing


def test_shard_manifest_totals(spark):
    docs = _docs(spark, [(i, "a b c", "s") for i in range(100)])
    m = shard_manifest(docs, n_shards=4).collect()
    assert sum(r.n_docs for r in m) == 100
    assert sum(r.n_tokens for r in m) == 300
    assert min(r.min_id for r in m) == 0
    assert max(r.max_id for r in m) == 99


def test_write_training_shards_layout_and_pruning(spark, tmp_path):
    docs = _docs(spark, [(i, f"t {i}", "s") for i in range(100)])
    path = os.path.join(str(tmp_path), "shards")
    write_training_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 100
    one = back.where(F.col("shard") == 2)
    # partition pruning: only shard=2 files are read
    files = one.select(F.input_file_name()).distinct().collect()
    assert files and all("shard=2" in r[0] for r in files)
    # one file per shard, not n_tasks x n_shards
    part_files = [f for f in os.listdir(os.path.join(path, "shard=2"))
                  if f.endswith(".parquet")]
    assert len(part_files) == 1


def test_length_bucket_edges(spark):
    rows = [(1, " ".join(["w"] * n), "s")
            for i, n in enumerate([1, 16, 17, 32, 33, 5000])]
    docs = spark.createDataFrame(
        [(i,) + r[1:] for i, r in enumerate(rows)],
        "doc_id long, text string, source string")
    rep = {r.bucket: (r.n_docs, r.n_tokens, r.n_padded, r.efficiency)
           for r in length_bucket_report(docs).collect()}
    assert rep[16][0] == 2          # n=1 and n=16
    assert rep[32][0] == 2          # 17 and 32
    assert rep[64][0] == 1          # 33
    assert rep[16] == (2, 17, 32, round(17 / 32, 6))
    # clamped doc pads to its own length, so efficiency stays <= 1
    assert rep[4096] == (1, 5000, 5000, 1.0)


def test_dedup_against_corpus_cross_and_intra(spark):
    corpus = _docs(spark, [(0, "old text", "a"), (1, "shared text", "a")])
    new = _docs(spark, [
        (10, "brand new", "b"),
        (11, "shared text", "b"),   # already at rest -> dropped
        (12, "brand new", "b"),     # intra-batch dup of 10 -> dropped
        (13, "also new", "b"),
    ])
    kept = sorted(r.doc_id for r in dedup_against_corpus(new, corpus).collect())
    assert kept == [10, 13]
    # column set preserved (no helper columns leak)
    out = dedup_against_corpus(new, corpus)
    assert set(out.columns) == {"doc_id", "text", "source"}


def test_snapshot_novelty_report(spark):
    corpus = _docs(spark, [(0, "old a", "x"), (1, "old b", "x")])
    new = _docs(spark, [
        (10, "old a", "recrawl"), (11, "old b", "recrawl"),
        (12, "fresh 1", "fresh"), (13, "fresh 2", "fresh"),
    ])
    rep = {r.source: (r.n_new, r.n_novel, r.novelty_rate)
           for r in snapshot_novelty_report(new, corpus).collect()}
    assert rep["recrawl"] == (2, 0, 0.0)
    assert rep["fresh"] == (2, 2, 1.0)


def test_vocab_coverage_monotone(spark):
    docs = _docs(spark, [
        (0, "a a a b b c d e f g", "s"),
        (1, "a b c c d h i j k l", "s"),
    ])
    rows = vocab_coverage(docs, ks=[1, 3, 5]).orderBy("top_k").collect()
    assert [r.top_k for r in rows] == [1, 3, 5]
    cov = [r.coverage for r in rows]
    assert cov == sorted(cov)
    assert all(0 < c <= 1 for c in cov)
    # top-1 is 'a' (4 of 20 tokens)
    assert rows[0].n_covered == 4
    assert rows[0].coverage == 0.2


def test_source_composition(spark):
    docs = _docs(spark, [
        (0, "x y", "a"), (1, "x y", "a"),       # exact dup pair
        (2, "p q r s", "b"),
    ])
    rep = {r.source: r for r in source_composition(docs).collect()}
    assert rep["a"].n_docs == 2 and rep["a"].n_tokens == 4
    assert rep["a"].exact_dup_rate == 0.5
    assert rep["b"].exact_dup_rate == 0.0
    assert rep["a"].token_share == 0.5
    assert rep["b"].mean_tokens == 4.0


def test_profile_table_nulls_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, name string")
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["id"].n_rows == 3 and prof["id"].n_nulls == 0
    assert prof["name"].n_nulls == 1
    assert prof["name"].null_frac == round(1 / 3, 6)
    assert prof["name"].n_distinct == 2  # nulls excluded, like SQL
    assert prof["id"].min_str == "1" and prof["id"].max_str == "3"


def test_streaming_dedup_against_corpus(spark, tmp_path):
    """Continuous incremental dedup: docs already at rest are dropped by
    the stream-static digest anti-join; intra-stream replays are
    suppressed by the watermarked dedup; novel docs pass exactly once."""
    import datetime

    from eventstorm_spark.extensions.curation import streaming_dedup_against_corpus

    t0 = datetime.datetime(2024, 1, 1)
    corpus = spark.createDataFrame(
        [(0, "at rest a", "x"), (1, "at rest b", "x")],
        "doc_id long, text string, source string")
    schema = "doc_id long, ts timestamp, text string"
    stream_dir = os.path.join(str(tmp_path), "feed")
    os.makedirs(stream_dir)

    def feed(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(stream_dir)

    feed([(10, t0, "at rest a"),      # already in corpus -> dropped
          (11, t0, "fresh one"),      # novel
          (12, t0, "fresh one")],     # intra-batch dup -> suppressed
         "b1")
    src = spark.readStream.schema(schema).parquet(stream_dir)
    out = streaming_dedup_against_corpus(src, corpus)

    seen = []

    def on_batch(bdf, _epoch):
        seen.extend((r.doc_id, r.text) for r in bdf.collect())

    q = out.writeStream.outputMode("append").foreachBatch(on_batch).start()
    try:
        q.processAllAvailable()
        assert sorted(t for _, t in seen) == ["fresh one"]
        # later micro-batch: replay of stream content + corpus content,
        # plus one genuinely new doc
        feed([(20, t0, "fresh one"),      # cross-batch replay -> suppressed
              (21, t0, "at rest b"),      # at rest -> dropped
              (22, t0, "fresh two")],     # novel
             "b2")
        q.processAllAvailable()
        assert sorted(t for _, t in seen) == ["fresh one", "fresh two"]
    finally:
        q.stop()


def test_digest_index_parity_with_corpus_form(spark, tmp_path):
    """dedup_against_digest_index over a persisted index must return
    exactly what dedup_against_corpus returns over the raw corpus, and
    the index itself must be digest-only (no payloads at rest)."""
    from eventstorm_spark.extensions.curation import (
        dedup_against_corpus,
        dedup_against_digest_index,
        write_digest_index,
    )

    corpus = _docs(spark, [(i, f"text number {i % 7}", "a") for i in range(20)])
    new = _docs(spark, [
        (100, "text number 3", "b"),    # at rest -> dropped
        (101, "novel alpha", "b"),
        (102, "novel alpha", "b"),      # intra-batch dup -> dropped
        (103, "novel beta", "b"),
    ])
    path = os.path.join(str(tmp_path), "digests")
    write_digest_index(corpus, path, n_buckets=4)

    via_corpus = sorted(r.doc_id for r in dedup_against_corpus(new, corpus).collect())
    via_index = sorted(
        r.doc_id
        for r in dedup_against_digest_index(new, spark, path).collect())
    assert via_index == via_corpus == [101, 103]

    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"digest", "bucket"}
    # one distinct digest per distinct text, deduplicated at rest
    assert idx.count() == 7


def test_vocab_coverage_min_count_preserves_head(spark):
    """The min_count cut must leave head ranks and coverage untouched:
    the denominator is the full token total and every term above the
    cut keeps its rank."""
    docs = _docs(spark, [
        (0, "a a a a b b b c c d", "s"),
        (1, "a b c d e f g h i j", "s"),
    ])
    full = {r.top_k: (r.n_covered, r.coverage)
            for r in vocab_coverage(docs, ks=[1, 3]).collect()}
    cut = {r.top_k: (r.n_covered, r.coverage)
           for r in vocab_coverage(docs, ks=[1, 3], min_count=2).collect()}
    assert cut == full


def test_minhash_index_near_dup_detection(spark, tmp_path):
    """near_dup_against_index finds near-dups of at-rest docs from the
    persisted signatures alone: verbatim copies score est_jaccard 1.0,
    a lightly-edited copy (true jaccard ~0.71) crosses a 0.6
    threshold, novel docs
    produce no pair — and corpus text is never read back."""
    from eventstorm_spark.extensions.curation import (
        near_dup_against_index,
        write_minhash_index,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    corpus = _docs(spark, [
        (0, base, "a"),
        (1, "totally different words entirely here now okay then", "a"),
    ])
    path = os.path.join(str(tmp_path), "mh_index")
    write_minhash_index(corpus, path, num_hashes=64, bands=16)

    edited = base.replace("epsilon", "EPSILON")  # 1-token edit
    new = _docs(spark, [
        (100, base, "b"),          # verbatim near-dup of 0
        (101, edited, "b"),        # near-dup of 0
        (102, "совершенно novel content nothing shared at all", "b"),
    ])
    pairs = {(r.new_id, r.corpus_id): r.est_jaccard
             for r in near_dup_against_index(
                 new, spark, path, threshold=0.6).collect()}
    assert pairs[(100, 0)] == 1.0
    assert (101, 0) in pairs and 0.6 <= pairs[(101, 0)] < 1.0
    assert all(nid != 102 for nid, _ in pairs)

    # the index at rest is signatures + buckets only, no text column
    sigs = spark.read.parquet(os.path.join(path, "signatures"))
    assert set(sigs.columns) == {"id", "signature"}
    buckets = spark.read.parquet(os.path.join(path, "buckets"))
    assert set(buckets.columns) == {"id", "band", "bucket"}


def test_minhash_cross_pairs_between_collections(spark):
    """Cross-collection near-dup: a doc similar to a corpus doc pairs
    with it; in-collection duplicates never pair (new x new and
    corpus x corpus are excluded by construction)."""
    from eventstorm_spark.extensions.curation import minhash_cross_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    corpus = _docs(spark, [(0, base, "a"), (1, base, "a")])  # corpus-internal dup
    new = _docs(spark, [
        (100, base + " tail", "b"),
        (101, base + " tail", "b"),   # new-internal dup
        (102, "nothing shared with anything at all here folks", "b"),
    ])
    pairs = {(r.new_id, r.corpus_id): r.jaccard
             for r in minhash_cross_pairs(new, corpus, threshold=0.8).collect()}
    assert set(pairs) == {(100, 0), (100, 1), (101, 0), (101, 1)}
    assert all(0.8 <= j < 1.0 for j in pairs.values())


def test_resize_images_nearest_exact(spark):
    """Nearest-neighbor resize: exact integer index mapping, verified
    pixel-for-pixel on upsample (2x2 -> 4x4) and downsample (4x4 -> 2x2),
    through the Spark mapInPandas path, for both PPM and PNG inputs."""
    from eventstorm_spark.extensions.multimodal import (
        _ppm_rgb,
        encode_png,
        encode_ppm,
        resize_images,
        resize_rgb_nearest,
    )

    # 2x2: R G / B W
    px = {"R": b"\xff\x00\x00", "G": b"\x00\xff\x00",
          "B": b"\x00\x00\xff", "W": b"\xff\xff\xff"}
    rgb2 = px["R"] + px["G"] + px["B"] + px["W"]
    up = resize_rgb_nearest(2, 2, rgb2, 4, 4)
    rows = [up[i * 12:(i + 1) * 12] for i in range(4)]
    assert rows[0] == px["R"] * 2 + px["G"] * 2
    assert rows[3] == px["B"] * 2 + px["W"] * 2
    # downsample picks source pixels (0,0),(0,2),(2,0),(2,2)
    rgb4 = b"".join(bytes([i] * 3) for i in range(16))  # 4x4 gray ramp
    down = resize_rgb_nearest(4, 4, rgb4, 2, 2)
    assert list(down[0::3]) == [0, 2, 8, 10]

    from eventstorm_spark.extensions.multimodal import encode_bmp, encode_jpeg

    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(2, 2, rgb2)), None),
         (2, "image", bytearray(encode_png(2, 2, rgb2)), None),
         (3, "image", bytearray(encode_bmp(2, 2, rgb2)), None),
         # JPEG: flat gray at quality 100 round-trips exactly, so the
         # resized raster is exactly predictable for this input too
         (4, "image", bytearray(encode_jpeg(2, 2, b"\x40\x40\x40" * 4,
                                            quality=100)), None)],
        "asset_id long, modality string, content binary, meta map<string,string>")
    out = {r.asset_id: r for r in
           resize_images(assets, width=4, height=4).collect()}
    for aid in (1, 2, 3):
        r = out[aid]
        assert (r.src_width, r.src_height, r.width, r.height) == (2, 2, 4, 4)
        w, h, raster = _ppm_rgb(bytes(r.payload))
        assert (w, h) == (4, 4) and raster == up
        assert (r.sum_r, r.sum_g, r.sum_b) == (
            sum(up[0::3]), sum(up[1::3]), sum(up[2::3]))
    r = out[4]
    w, h, raster = _ppm_rgb(bytes(r.payload))
    assert (w, h) == (4, 4) and raster == b"\x40" * 48


def test_resize_identity_and_roundtrip_properties():
    """Pure-function properties (no Spark): resizing to the same size is
    the identity; upsampling by an integer factor then downsampling back
    returns the original raster (nearest-neighbor with the floor index
    map is exact on integer multiples)."""
    import random

    from eventstorm_spark.extensions.multimodal import resize_rgb_nearest

    rng = random.Random(42)
    for _ in range(20):
        w, h = rng.randint(1, 12), rng.randint(1, 12)
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        assert resize_rgb_nearest(w, h, rgb, w, h) == rgb
        for f in (2, 3):
            up = resize_rgb_nearest(w, h, rgb, w * f, h * f)
            back = resize_rgb_nearest(w * f, h * f, up, w, h)
            assert back == rgb, (w, h, f)


def test_winnowing_guarantee_and_locality(spark):
    """Winnowing's core guarantee: two documents sharing a token run of
    length >= window + n - 1 (= 6 here) share at least one fingerprint;
    documents with no shared 3-gram share none."""
    from eventstorm_spark.extensions.text import winnow_fingerprints, winnow_matches

    shared = "one two three four five six"   # 6-token shared run
    docs = _docs(spark, [
        (0, f"alpha beta {shared} gamma delta", "s"),
        (1, f"zeta {shared} eta theta iota kappa", "s"),
        (2, "nothing here overlaps with those at all", "s"),
    ])
    fp = winnow_fingerprints(docs, n=3, window=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared 6-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2]) and not (by_doc[1] & by_doc[2])
    pairs = {(r.id_a, r.id_b) for r in
             winnow_matches(docs, n=3, window=4, min_shared=1).collect()}
    assert pairs == {(0, 1)}


def test_winnowing_matches_reference_implementation(spark):
    """The two-window-pass SQL formulation must select EXACTLY the set
    {argmin positions of every full window} (all argmins on ties) that
    a direct per-window scan selects — randomized docs, plus the
    guarantee that every full window contains a selected position."""
    import random

    from eventstorm_spark.extensions.text import winnow_fingerprints
    from eventstorm_spark.extensions.dedup import portable_hash60  # noqa: F401

    rng = random.Random(7)
    W, N = 4, 3
    vocab = [f"w{i}" for i in range(6)]  # small vocab -> hash ties likely
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))), "s")
            for i in range(40)]
    docs = _docs(spark, rows)
    got = {}
    for r in winnow_fingerprints(docs, n=N, window=W).collect():
        got.setdefault(r.doc_id, set()).add(r.pos)

    import pyspark.sql.functions as F
    from eventstorm_spark.extensions.text import positional_shingle_hashes
    ph = positional_shingle_hashes(docs, n=N)
    by_doc = {}
    for r in ph.collect():
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.h))
    for doc_id, hs in by_doc.items():
        hs.sort()
        h = [x for _, x in hs]
        n = len(h)
        want = set()
        if n < W:
            mn = min(h)
            want = {p for p in range(n) if h[p] == mn}
        else:
            for e in range(W - 1, n):
                wnd = h[e - W + 1:e + 1]
                mn = min(wnd)
                for off, v in enumerate(wnd):
                    if v == mn:
                        want.add(e - W + 1 + off)
                # guarantee: the selected set intersects every window
                assert any(p in got.get(doc_id, set())
                           for p in range(e - W + 1, e + 1)), (doc_id, e)
        assert got.get(doc_id, set()) == want, doc_id


def test_exact_substring_spans_golden(spark):
    """Span recovery goldens: exact offsets/lengths, repeated-block
    alignments (one span per diagonal), non-overlapping docs silent,
    and sub-threshold runs (< 6 tokens) dropped."""
    from eventstorm_spark.extensions.text import exact_substring_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _docs(spark, [
        (1, "u1 u2 " + shared + " v1 v2", "s"),
        (2, "w1 " + shared + " w2 w3 w4", "s"),
        (3, "no overlap with anything here at all folks okay", "s"),
        (4, shared + " " + shared, "s"),      # doubled block
        (5, "x1 alpha beta gamma x2 x3 x4 x5 x6 x7", "s"),  # 3-token run only
    ])
    spans = {(r.id_a, r.id_b, r.start_a, r.start_b): r.len_tokens
             for r in exact_substring_spans(docs).collect()}
    assert spans == {
        (1, 2, 2, 1): 8,
        (1, 4, 2, 0): 8, (1, 4, 2, 8): 8,   # both alignments of the double
        (2, 4, 1, 0): 8, (2, 4, 1, 8): 8,
    }  # doc5's 3-token overlap is below the 6-token floor; doc3 silent


def test_exact_substring_scrub_merges_overlaps(spark):
    """Scrub accounting: keep-first (larger id loses), overlapping spans
    from different pairs merge so tokens are never double-counted, and
    span-free docs report zeros."""
    from eventstorm_spark.extensions.text import exact_substring_scrub

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [
        (1, "u1 u2 " + shared + " v1 v2", "s"),
        (2, "w1 " + shared + " w2 w3 w4", "s"),
        (3, "no overlap with anything here at all folks okay", "s"),
        (4, shared + " " + shared, "s"),
    ])
    out = {r.doc_id: (r.n_tokens, r.n_spans, r.n_tokens_removed,
                      r.n_tokens_after)
           for r in exact_substring_scrub(docs).collect()}
    assert out[1] == (12, 0, 0, 12)      # min id keeps everything
    assert out[2] == (12, 1, 8, 4)
    assert out[3] == (9, 0, 0, 9)
    # doc4: [0,8) and [8,16) from two pairs merge into ONE [0,16) span
    assert out[4] == (16, 1, 16, 0)


def test_exact_substring_scrub_parity_with_passage_scrub(spark):
    """On segment-aligned inputs (the duplicated content is exactly one
    10-token segment, at 10-token-aligned offsets, all other tokens
    globally unique) span-scrub and the segment-based passage_scrub
    remove the same tokens from the same docs."""
    from eventstorm_spark.extensions.text import (
        exact_substring_scrub,
        passage_scrub,
    )

    seg = " ".join(f"dup{i}" for i in range(10))
    docs = _docs(spark, [
        (1, " ".join(f"a{i}" for i in range(10)) + " " + seg, "s"),
        (2, seg + " " + " ".join(f"b{i}" for i in range(10)), "s"),
        (3, " ".join(f"c{i}" for i in range(20)), "s"),
    ])
    spanside = {r.doc_id: r.n_tokens_after
                for r in exact_substring_scrub(docs).collect()}
    segside = {r.doc_id: r.n_tokens_after
               for r in passage_scrub(docs, seg_tokens=10,
                                      min_docs=2, id_col="doc_id").collect()}
    assert spanside == segside == {1: 20, 2: 10, 3: 20}


def test_streaming_sessionize_emits_closed_sessions(spark, tmp_path):
    """Native session-window sessionization under Structured Streaming:
    events split across micro-batches merge into one session in the
    state store; sessions emit once closed by the watermark, with the
    same (start, end=last+gap, count) the batch form computes."""
    import datetime

    from eventstorm_spark.extensions.temporal import sessionize, streaming_sessionize

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    schema = "user_id long, ts timestamp"
    feed = os.path.join(str(tmp_path), "events")
    os.makedirs(feed)

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(feed)

    # session A: events at 0 and 10 min (split across two batches);
    # then a distant event at 120 min closes it past the watermark
    push([(1, ts(0))])
    src = spark.readStream.schema(schema).parquet(feed)
    out = streaming_sessionize(src, gap="30 minutes", key_col="user_id",
                               ts_col="ts", watermark_delay="1 minute")
    seen = []
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda b, _: seen.extend(b.collect())).start())
    try:
        q.processAllAvailable()
        push([(1, ts(10))])          # merges into the open session
        q.processAllAvailable()
        assert seen == []            # session still open — nothing emitted
        push([(1, ts(120))])         # watermark advances past the close
        q.processAllAvailable()
        assert [(r.user_id, r.session_start, r.session_end, r.n_events)
                for r in seen] == [(1, ts(0), ts(40), 2)]
    finally:
        q.stop()
    # batch twin over the full feed agrees on the closed session
    batch = {(r.user_id, r.session_start, r.session_end, r.n_events)
             for r in sessionize(spark.read.parquet(feed),
                                 gap="30 minutes").collect()}
    assert (1, ts(0), ts(40), 2) in batch


def test_decontaminate_and_epoch_plan_and_curriculum(spark):
    """Unit behavior of the three mix-planning closers: decontaminate
    drops exactly the overlapping train docs; epoch_plan conserves the
    token budget and upweights small sources; curriculum_order stages
    partition the corpus with deterministic within-stage keys."""
    from eventstorm_spark.extensions.pipeline import (
        curriculum_order,
        decontaminate,
        epoch_plan,
    )

    train = _docs(spark, [
        (0, "one two three four five six seven", "a"),
        (1, "totally clean text nothing shared at all", "a"),
    ])
    test = _docs(spark, [(100, "zz one two three four five qq", "t")])
    kept = sorted(r.doc_id for r in decontaminate(train, test, n=5).collect())
    assert kept == [1]

    docs = _docs(spark, [(0, "a " * 90, "big"), (1, "b " * 10, "small")])
    plan = {r.source: r for r in
            epoch_plan(docs, alpha=0.5, token_budget=1000).collect()}
    assert abs(plan["big"].target_tokens + plan["small"].target_tokens
               - 1000) < 0.05  # budget conserved
    assert plan["small"].epochs > plan["big"].epochs  # small upweighted

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "doc_id long, avg_logprob double")
    cur = curriculum_order(scored, n_stages=4)
    stages = {r.doc_id: r.stage for r in cur.collect()}
    assert set(stages.values()) == {1, 2, 3, 4}
    assert stages[0] == 1 and stages[39] == 4
    # deterministic: same keys on re-run
    again = {r.doc_id: r.order_key for r in
             curriculum_order(scored, n_stages=4).collect()}
    first = {r.doc_id: r.order_key for r in cur.collect()}
    assert again == first


def test_write_packed_shards_layout_and_integrity(spark, tmp_path):
    """Packed-shard writer: every (seq_id, doc) slice lands in exactly
    one shard, a sequence's slices share a shard, token totals are
    conserved, and each shard directory holds one file."""
    from eventstorm_spark.extensions.curation import write_packed_shards
    from eventstorm_spark.extensions.packing import pack_token_spans

    docs = _docs(spark, [(i, " ".join(["w"] * (5 + i % 7)), "s")
                         for i in range(60)])
    path = os.path.join(str(tmp_path), "packed")
    write_packed_shards(docs, path, seq_len=16, n_shards=4)
    back = spark.read.parquet(path)
    spans = pack_token_spans(docs, seq_len=16)
    assert back.count() == spans.count()
    assert (back.agg(F.sum("n_toks")).first()[0]
            == spans.agg(F.sum("n_toks")).first()[0])
    # a sequence never splits across shards
    assert (back.groupBy("seq_id")
            .agg(F.countDistinct("shard").alias("n"))
            .where(F.col("n") > 1).count()) == 0
    for d in os.listdir(path):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")]
            assert len(files) == 1, d


def test_index_append_lifecycle(spark, tmp_path):
    """Recurring-ingest lifecycle: build the digest index, dedup batch 1
    against it, append the survivors, and batch 2 containing batch-1
    texts is then deduped against the GROWN index. Same for the MinHash
    index: an appended doc is found as a near-dup by the next check."""
    from eventstorm_spark.extensions.curation import (
        append_digest_index,
        append_minhash_index,
        dedup_against_digest_index,
        near_dup_against_index,
        write_digest_index,
        write_minhash_index,
    )

    corpus = _docs(spark, [(0, "original at rest", "a")])
    dpath = os.path.join(str(tmp_path), "digests")
    write_digest_index(corpus, dpath, n_buckets=4)

    b1 = _docs(spark, [(10, "batch one novel", "b"), (11, "original at rest", "b")])
    kept1 = dedup_against_digest_index(b1, spark, dpath)
    assert sorted(r.doc_id for r in kept1.collect()) == [10]
    append_digest_index(kept1, dpath, n_buckets=4)

    b2 = _docs(spark, [(20, "batch one novel", "c"),   # now at rest via append
                       (21, "batch two novel", "c")])
    kept2 = dedup_against_digest_index(b2, spark, dpath)
    assert sorted(r.doc_id for r in kept2.collect()) == [21]

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    mpath = os.path.join(str(tmp_path), "mh")
    write_minhash_index(_docs(spark, [(0, "unrelated filler words here", "a")]),
                        mpath, num_hashes=64, bands=16)
    append_minhash_index(_docs(spark, [(5, base, "a")]), mpath,
                         num_hashes=64, bands=16)
    probe = _docs(spark, [(100, base + " tail", "b")])
    pairs = {(r.new_id, r.corpus_id)
             for r in near_dup_against_index(probe, spark, mpath,
                                             threshold=0.8).collect()}
    assert pairs == {(100, 5)}


def test_index_meta_rejects_mismatched_parameters(spark, tmp_path):
    """Probing or appending an at-rest index with different construction
    parameters than it was built with is a hard error (the _meta file),
    not a silent wrong-bucket / underestimated-jaccard result."""
    import pytest

    from eventstorm_spark.extensions.curation import (
        append_digest_index,
        append_minhash_index,
        near_dup_against_index,
        write_digest_index,
        write_minhash_index,
    )

    corpus = _docs(spark, [(0, "some at rest text", "a")])
    dpath = os.path.join(str(tmp_path), "digests")
    write_digest_index(corpus, dpath, n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        append_digest_index(corpus, dpath, n_buckets=8)

    mpath = os.path.join(str(tmp_path), "mh")
    write_minhash_index(corpus, mpath, num_hashes=64, bands=16)
    probe = _docs(spark, [(1, "probe text here", "b")])
    with pytest.raises(ValueError, match="num_hashes"):
        near_dup_against_index(probe, spark, mpath, num_hashes=32, bands=16)
    with pytest.raises(ValueError, match="bands"):
        append_minhash_index(probe, mpath, num_hashes=64, bands=8)
    # matching parameters still work after the failed attempts
    append_minhash_index(probe, mpath, num_hashes=64, bands=16)


def test_profile_table_special_column_names(spark):
    """Column names with spaces, quotes and commas profile fine — names
    ride through as escaped literals, the counters are indexed."""
    df = spark.createDataFrame(
        [(1, "x"), (2, None)],
        ["a b", "it's, tricky"])
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["a b"].n_nulls == 0 and prof["a b"].n_distinct == 2
    assert prof["it's, tricky"].n_nulls == 1


def test_resize_images_skips_non_image_assets(spark):
    """A mixed assets table (image + wav) resizes the images and ignores
    the rest instead of failing the job on a WAV payload."""
    from eventstorm_spark.extensions.multimodal import encode_ppm, resize_images

    rgb = b"\xff\x00\x00" * 4
    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(2, 2, rgb))),
         (2, "audio", bytearray(b"RIFFxxxxWAVE")),
         (3, "video", bytearray(b"\x00\x01\x02\x03"))],
        "asset_id long, modality string, content binary")
    out = resize_images(assets, width=4, height=4).collect()
    assert [r.asset_id for r in out] == [1]


def test_epoch_materialization_hits_budget(spark, sf_dir):
    """Semantic check on the plan -> materialize loop: the realized
    token total lands near the planned budget (deviation is only the
    fractional-copy sampling noise), and dedup_against_corpus is
    idempotent (running the survivors through again drops nothing)."""
    from eventstorm_spark.extensions.curation import dedup_against_corpus
    from eventstorm_spark.extensions.pipeline import apply_epoch_plan, epoch_plan
    from eventstorm_spark.extensions.text import token_count
    from eventstorm_spark.inventory import load

    docs = load(spark, sf_dir, "documents")
    budget = 200_000
    plan = epoch_plan(docs, alpha=0.5, token_budget=budget)
    out = apply_epoch_plan(docs, plan)
    total = out.agg(F.sum(token_count(F.col("text")))).first()[0]
    assert abs(total - budget) / budget < 0.05, total

    corpus = docs.limit(20)
    survivors = dedup_against_corpus(docs, corpus)
    again = dedup_against_corpus(survivors, corpus)
    assert again.count() == survivors.count()


def test_winnow_hot_fingerprint_cap_graceful(spark):
    """max_fingerprint_df skew guard: (a) capped pairs are a subset of
    uncapped, (b) pairs whose only shared text is a hot boilerplate
    passage (carried by every doc, df > cap) disappear, (c) pairs that
    ALSO share a rare passage survive — recall degrades gracefully to
    the under-cap fingerprints. Randomized corpora so the property
    holds beyond one golden layout; exact_substring_spans inherits the
    cap through its candidate stage."""
    import random

    from eventstorm_spark.extensions.text import (exact_substring_spans,
                                                  winnow_matches)

    rng = random.Random(11)
    boiler = "common license header text appears in every single document"
    rare = "rare shared passage only these two docs carry onward"
    rows = []
    for i in range(12):
        filler = " ".join(f"f{i}x{j}" for j in range(rng.randint(4, 9)))
        rows.append((i, f"{filler} {boiler} tail{i}", "s"))
    # docs 0 and 1 additionally share the rare run
    rows[0] = (0, rows[0][1] + " " + rare, "s")
    rows[1] = (1, rows[1][1] + " " + rare, "s")
    docs = _docs(spark, rows)

    def pairs(**kw):
        return {(r.id_a, r.id_b) for r in
                winnow_matches(docs, n=3, window=4, min_shared=1,
                               **kw).collect()}

    uncapped = pairs()
    capped = pairs(max_fingerprint_df=4)
    assert capped <= uncapped
    assert (0, 1) in uncapped and len(uncapped) == 66  # all 12C2 via boiler
    assert capped == {(0, 1)}, capped  # boiler df=12 > 4; rare df=2 survives

    spans_capped = exact_substring_spans(
        docs, n=3, window=4, max_fingerprint_df=4).collect()
    assert {(r.id_a, r.id_b) for r in spans_capped} == {(0, 1)}
    # the recovered span for the surviving pair still includes the rare
    # run at full length (span recovery is exact once a pair is a
    # candidate — the cap only prunes candidate PAIRS, never positions)
    assert any(r.len_tokens >= 9 for r in spans_capped), spans_capped


def test_substring_scale_mode_defaults_cap(spark):
    """r8 verdict task 3: the substring family's corpus-mode switch.
    ``scale=True`` with no explicit cap fills SCALE_MAX_FINGERPRINT_DF
    — on a dense corpus (a boilerplate run carried by more docs than
    the default cap) the guard trips and the near-all-pairs candidate
    set collapses to the rare-fingerprint pairs, identical to passing
    the default cap explicitly. An explicit cap wins over the scale
    default; scale=False stays uncapped (oracle mode)."""
    import random

    from eventstorm_spark.extensions.text import (
        SCALE_MAX_FINGERPRINT_DF,
        exact_substring_scrub,
        exact_substring_spans,
        winnow_matches,
    )

    rng = random.Random(23)
    boiler = "every document carries this exact boilerplate header run"
    rare = "rare shared passage only these two docs carry onward"
    rows = []
    for i in range(SCALE_MAX_FINGERPRINT_DF + 12):  # boiler df > default cap
        filler = " ".join(f"d{i}w{j}" for j in range(rng.randint(4, 8)))
        rows.append((i, f"{filler} {boiler} t{i}", "s"))
    rows[0] = (0, rows[0][1] + " " + rare, "s")
    rows[1] = (1, rows[1][1] + " " + rare, "s")
    docs = _docs(spark, rows)

    def pairs(**kw):
        return {(r.id_a, r.id_b) for r in
                winnow_matches(docs, n=3, window=4, min_shared=1,
                               **kw).collect()}

    # guard trips: scale mode == explicit default cap, and the dense
    # corpus's boiler pairs are gone while the rare pair survives
    scale_pairs = pairs(scale=True)
    assert scale_pairs == pairs(max_fingerprint_df=SCALE_MAX_FINGERPRINT_DF)
    assert scale_pairs == {(0, 1)}, sorted(scale_pairs)[:5]
    # explicit cap beats the scale default (cap=1 prunes even the rare
    # fingerprints, df=2 > 1)
    assert pairs(scale=True, max_fingerprint_df=1) == set()
    # spans/scrub inherit the switch through their candidate stage
    spans = exact_substring_spans(docs, n=3, window=4, scale=True)
    assert {(r.id_a, r.id_b) for r in spans.collect()} == {(0, 1)}
    scrub = exact_substring_scrub(docs, n=3, window=4, scale=True)
    victims = {r.doc_id for r in scrub.where(F.col("n_spans") > 0).collect()}
    assert victims == {1}  # keep-first: doc 0 keeps, doc 1 scrubbed


def test_span_match_strategies_identical_output(spark):
    """r9: the two stage-2 matching strategies (value-first shingle
    self-join vs pair-first pairs ⋈ shingles) and auto selection all
    produce byte-identical span reports — they bound different
    adversaries (hot shingle values vs dense candidate sets), never
    different answers. Also pins the candidate_pairs override: a
    precomputed (or superset) candidate table yields the same spans."""
    import random

    from eventstorm_spark.extensions.text import (exact_substring_spans,
                                                  winnow_matches)

    rng = random.Random(7)
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(30):
        filler = " ".join(f"f{i}x{j}" for j in range(rng.randint(5, 12)))
        t = filler
        if i % 3 == 0:
            w = t.split(" ")
            w[rng.randint(0, len(w)):0] = shared.split(" ")
            t = " ".join(w)
        rows.append((i, t, "s"))
    docs = _docs(spark, rows)

    def spans(**kw):
        return sorted(tuple(r) for r in
                      exact_substring_spans(docs, **kw).collect())

    value = spans(match_strategy="value")
    pair = spans(match_strategy="pair")
    auto = spans(match_strategy="auto")
    assert value == pair == auto and len(value) > 0

    # candidate_pairs override: the exact candidate set and a SUPERSET
    # (all pairs) both reproduce the same spans
    cand = (winnow_matches(docs, min_shared=1)
            .select("id_a", "id_b").localCheckpoint(eager=True))
    assert spans(candidate_pairs=cand) == value
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    superset = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long")
    assert spans(candidate_pairs=superset, match_strategy="pair") == value

    # DUPLICATED pair rows (two overlapping index-probe outputs
    # concatenated — the documented at-rest usage) must not fragment
    # runs: pair-first joins the pair table into the match rows, so
    # without the internal dedup every match row doubles and
    # row_number() breaks the diagonal islands
    doubled = cand.unionByName(cand)
    assert spans(candidate_pairs=doubled, match_strategy="pair") == value
    assert spans(candidate_pairs=doubled, match_strategy="value") == value

    import pytest as _pytest
    with _pytest.raises(ValueError, match="match_strategy"):
        spans(match_strategy="nope")


def test_winnow_index_lifecycle_and_parity(spark, tmp_path):
    """At-rest winnowing index: build -> probe -> append -> probe, with
    EXACT parity against the in-memory winnow_matches over the union
    (winnowing is per-document local, so at-rest fingerprints are
    byte-identical to freshly computed ones). Appended docs are found by
    the next probe; _meta rejects mismatched (n, window); the stored
    fingerprint rows are 8-byte hashes only (no text at rest)."""
    import pytest

    from eventstorm_spark.extensions.curation import (
        append_winnow_index,
        overlap_against_index,
        write_winnow_index,
    )
    from eventstorm_spark.extensions.text import winnow_matches

    shared = "one two three four five six seven"  # 7-token run (>= 6)
    corpus = _docs(spark, [
        (0, f"c0 filler {shared} more c0 words", "a"),
        (1, "c1 totally unrelated text content here", "a"),
    ])
    path = os.path.join(str(tmp_path), "winnow")
    write_winnow_index(corpus, path, n=3, window=4, n_buckets=4)

    probe1 = _docs(spark, [
        (100, f"p0 {shared} trailing words p0", "b"),
        (101, "nothing in common with the corpus at all", "b"),
    ])
    got = {(r.new_id, r.corpus_id, r.n_shared)
           for r in overlap_against_index(probe1, spark, path, n=3,
                                          window=4, min_shared=1).collect()}
    # exact parity: cross pairs of winnow_matches over corpus ∪ probe
    # (ids disjoint; id_a < id_b puts corpus first)
    union = corpus.unionByName(probe1)
    want = {(r.id_b, r.id_a, r.n_shared)
            for r in winnow_matches(union, n=3, window=4,
                                    min_shared=1).collect()
            if r.id_a < 100 <= r.id_b}
    assert got == want and {(a, b) for a, b, _ in got} == {(100, 0)}

    # append probe1 survivors; a doc copying probe1's text is now caught
    append_winnow_index(probe1, path, n=3, window=4, n_buckets=4)
    probe2 = _docs(spark, [(200, f"fresh {shared} copy again", "c")])
    got2 = {(r.new_id, r.corpus_id)
            for r in overlap_against_index(probe2, spark, path, n=3,
                                           window=4, min_shared=1).collect()}
    assert got2 == {(200, 0), (200, 100)}

    # at rest: only (doc_id, fingerprint, bucket-partition), never text
    stored = spark.read.parquet(os.path.join(path, "fingerprints"))
    assert sorted(stored.columns) == ["bucket", "doc_id", "fingerprint"]

    with pytest.raises(ValueError, match="window"):
        overlap_against_index(probe2, spark, path, n=3, window=8)
    with pytest.raises(ValueError, match="n_buckets"):
        append_winnow_index(probe2, path, n=3, window=4, n_buckets=8)

    # hot-fingerprint cap applies across stored+new df
    capped = overlap_against_index(probe2, spark, path, n=3, window=4,
                                   min_shared=1, max_fingerprint_df=1)
    assert capped.count() == 0  # shared run's df >= 3 > 1 -> pruned


def test_scrub_text_excises_spans_keep_first(spark):
    """The rewriting scrub: the lower-id carrier keeps its text intact,
    higher-id carriers lose exactly the shared run (both-side filler
    survives), fully-duplicated docs scrub to '', and the accounting
    form's n_tokens_after equals the rewritten token count."""
    from eventstorm_spark.extensions.text import (
        exact_substring_scrub, exact_substring_scrub_text, token_count,
    )

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7-token run
    docs = _docs(spark, [
        (1, f"k1 k2 {shared} k3", "s"),
        (2, f"x1 {shared} x2 x3", "s"),
        (3, shared, "s"),                       # whole doc = the run
        (4, "independent words with no overlap here", "s"),
    ])
    out = {r.doc_id: r.text
           for r in exact_substring_scrub_text(docs).collect()}
    assert out[1] == f"k1 k2 {shared} k3"       # first carrier intact
    assert out[2] == "x1 x2 x3"                 # run excised, filler kept
    assert out[3] == ""                         # fully scrubbed
    assert out[4] == "independent words with no overlap here"

    acct = {r.doc_id: r.n_tokens_after
            for r in exact_substring_scrub(docs).collect()}
    rebuilt = {r.doc_id: r.n
               for r in exact_substring_scrub_text(docs)
               .select("doc_id",
                       F.when(F.col("text") == "", 0)
                       .otherwise(token_count(F.col("text"))).alias("n"))
               .collect()}
    assert acct == rebuilt


def test_dhash_index_lifecycle_build_probe_append(spark, tmp_path):
    """At-rest image near-dup index: build from a base corpus, probe a
    new batch (exact copy pairs at distance 0, a tweaked copy within 3,
    unrelated images absent; equal to the direct in-memory pair join
    restricted to new x corpus), meta-guard a wrong grid, append the
    survivors and see them from the next probe — corpus payloads are
    decoded exactly once, at build/append time."""
    import pytest as _pytest
    from eventstorm_spark.extensions.curation import (
        append_dhash_index,
        image_dedup_against_index,
        write_dhash_index,
    )
    from eventstorm_spark.extensions.multimodal import (
        ASSET_SCHEMA,
        encode_ppm,
        image_dhash,
        image_hamming_pairs,
    )

    w, h = 16, 12

    def grad(seed):
        return bytes(((i // 3) * seed + i % 3) % 256
                     for i in range(w * h * 3))

    def assets(rows):
        return spark.createDataFrame(
            [(i, "image", encode_ppm(w, h, px), None) for i, px in rows],
            ASSET_SCHEMA)

    base = assets([(1, grad(7)), (2, grad(31)), (3, grad(64))])
    path = str(tmp_path / "dhash_idx")
    write_dhash_index(base, path)

    tweaked = bytearray(grad(7))
    tweaked[0:3] = [255, 255, 255]  # corner flip of image 1
    new = assets([(10, grad(7)), (11, bytes(tweaked)), (12, grad(131))])

    got = {(r["new_id"], r["corpus_id"]): r["hamming"]
           for r in image_dedup_against_index(new, spark, path).collect()}
    assert got.get((10, 1)) == 0          # exact copy
    assert (11, 1) in got and got[(11, 1)] <= 3  # near copy
    # equal to the direct in-memory join over the union, new x corpus
    both = image_dhash(base).unionByName(image_dhash(new))
    direct = {(r["id_b"], r["id_a"]): r["hamming"]
              for r in image_hamming_pairs(both, max_distance=3).collect()
              if r["id_a"] <= 3 < r["id_b"]}
    assert got == direct

    with _pytest.raises(ValueError, match="dhash"):
        image_dedup_against_index(new, spark, path, hash_w=4, hash_h=4)

    survivors = assets([(12, grad(131))])
    append_dhash_index(survivors, path)
    got2 = {(r["new_id"], r["corpus_id"]): r["hamming"]
            for r in image_dedup_against_index(
                assets([(20, grad(131))]), spark, path).collect()}
    assert got2.get((20, 12)) == 0  # appended asset is now at rest


def test_dhash_index_serves_audio_fingerprints(spark, tmp_path):
    """The at-rest index is modality-generic via the `fingerprints`
    parameter: an audio corpus indexes through audio_fingerprint rows
    (image_dhash's modality filter would silently produce an empty
    index otherwise) and a re-encoded copy of an indexed clip is found
    at distance 0."""
    from eventstorm_spark.extensions.curation import (
        image_dedup_against_index,
        write_dhash_index,
    )
    from eventstorm_spark.extensions.multimodal import (
        ASSET_SCHEMA,
        audio_fingerprint,
        encode_wav_mulaw,
        encode_wav_pcm16,
        mulaw_to_linear,
    )

    ulaw = bytes((i * 91 + 3) % 256 for i in range(120))
    lin = [mulaw_to_linear(b) for b in ulaw]
    other = [((i * 7919) % 65536) - 32768 for i in range(150)]
    corpus = spark.createDataFrame(
        [(1, "audio", encode_wav_mulaw(ulaw, 8000), None),
         (2, "audio", encode_wav_pcm16(other, 8000), None)],
        ASSET_SCHEMA)
    path = str(tmp_path / "audio_idx")
    write_dhash_index(corpus, path,
                      fingerprints=audio_fingerprint(corpus))
    # empty-index regression: the default image path would have
    # dropped every audio row silently
    n = spark.read.parquet(path + "/hashes").count()
    assert n == 2

    probe = spark.createDataFrame(
        [(10, "audio", encode_wav_pcm16(lin, 8000), None)],  # re-encoded
        ASSET_SCHEMA)
    got = {(r["new_id"], r["corpus_id"]): r["hamming"]
           for r in image_dedup_against_index(
               probe, spark, path,
               fingerprints=audio_fingerprint(probe)).collect()}
    assert got == {(10, 1): 0}


def test_compact_index_preserves_probes_and_reduces_files(spark, tmp_path):
    """Compaction lifecycle over every index kind: repeated appends
    accumulate files; compact_index rewrites each sub-table with the
    writer's own partitioning, the probe results are IDENTICAL pre/post
    (membership semantics — collapsed duplicate rows are unobservable),
    file counts drop, and _meta survives so later appends/probes still
    validate."""
    from eventstorm_spark.extensions.curation import (
        _count_data_files,
        append_digest_index,
        append_winnow_index,
        compact_index,
        dedup_against_digest_index,
        near_dup_against_index,
        append_minhash_index,
        overlap_against_index,
        write_digest_index,
        write_minhash_index,
        write_winnow_index,
    )

    # -- digest: two appends, one re-appending an already-stored digest
    dpath = str(tmp_path / "digests")
    write_digest_index(_docs(spark, [(0, "at rest text", "a")]), dpath,
                       n_buckets=4)
    append_digest_index(_docs(spark, [(1, "novel one", "b"),
                                      (2, "at rest text", "b")]), dpath,
                        n_buckets=4)
    append_digest_index(_docs(spark, [(3, "novel two", "c"),
                                      (4, "novel one", "c")]), dpath,
                        n_buckets=4)
    probe = _docs(spark, [(10, "novel one", "d"), (11, "fresh", "d"),
                          (12, "novel two", "d")])
    before = sorted(r.doc_id
                    for r in dedup_against_digest_index(probe, spark,
                                                        dpath).collect())
    files0 = _count_data_files(dpath)
    rep = compact_index(spark, dpath)
    after = sorted(r.doc_id
                   for r in dedup_against_digest_index(probe, spark,
                                                       dpath).collect())
    assert before == after == [11]
    assert rep["."]["files_after"] < files0
    # _meta survived: a mismatched append still trips the guard
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_buckets"):
        append_digest_index(probe, dpath, n_buckets=8)
    append_digest_index(_docs(spark, [(11, "fresh", "d")]), dpath,
                        n_buckets=4)  # matching append works post-compact

    # -- minhash: append then compact; near-dup probe unchanged
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    mpath = str(tmp_path / "mh")
    write_minhash_index(_docs(spark, [(0, "unrelated filler words", "a")]),
                        mpath, num_hashes=64, bands=16)
    append_minhash_index(_docs(spark, [(5, base, "a")]), mpath,
                         num_hashes=64, bands=16)
    mprobe = _docs(spark, [(100, base + " tail", "b")])
    pre = {(r.new_id, r.corpus_id)
           for r in near_dup_against_index(mprobe, spark, mpath,
                                           threshold=0.8).collect()}
    compact_index(spark, mpath)
    post = {(r.new_id, r.corpus_id)
            for r in near_dup_against_index(mprobe, spark, mpath,
                                            threshold=0.8).collect()}
    assert pre == post == {(100, 5)}

    # -- winnow: append then compact; overlap probe unchanged
    wpath = str(tmp_path / "wn")
    run = "one two three four five six seven eight nine ten"
    write_winnow_index(_docs(spark, [(0, "base corpus " + run, "a")]), wpath)
    append_winnow_index(_docs(spark, [(1, "appended doc " + run, "b")]),
                        wpath)
    wprobe = _docs(spark, [(50, "probe with " + run + " copied", "c")])
    wpre = {(r.new_id, r.corpus_id): r.n_shared
            for r in overlap_against_index(wprobe, spark, wpath).collect()}
    compact_index(spark, wpath)
    wpost = {(r.new_id, r.corpus_id): r.n_shared
             for r in overlap_against_index(wprobe, spark, wpath).collect()}
    assert wpre == wpost and (50, 0) in wpost and (50, 1) in wpost


def test_compact_index_dhash_and_midswap_guard(spark, tmp_path):
    """dHash-kind compaction keeps the image probe identical, and a
    leftover .__compact_old dir (mid-swap crash evidence) is a hard
    error with recovery instructions, never silent data loss."""
    import os as _os

    import pytest as _pytest
    from eventstorm_spark.extensions.curation import (
        append_dhash_index,
        compact_index,
        image_dedup_against_index,
        write_dhash_index,
    )
    from eventstorm_spark.extensions.multimodal import ASSET_SCHEMA, encode_ppm

    w, h = 16, 12

    def grad(seed):
        return bytes(((i // 3) * seed + i % 3) % 256
                     for i in range(w * h * 3))

    def assets(rows):
        return spark.createDataFrame(
            [(i, "image", encode_ppm(w, h, px), None) for i, px in rows],
            ASSET_SCHEMA)

    path = str(tmp_path / "dh")
    write_dhash_index(assets([(1, grad(7)), (2, grad(31))]), path)
    append_dhash_index(assets([(3, grad(64))]), path)
    probe = assets([(10, grad(7)), (11, grad(64))])
    pre = {(r.new_id, r.corpus_id): r.hamming
           for r in image_dedup_against_index(probe, spark, path).collect()}
    compact_index(spark, path)
    post = {(r.new_id, r.corpus_id): r.hamming
            for r in image_dedup_against_index(probe, spark, path).collect()}
    assert pre == post and pre.get((10, 1)) == 0 and pre.get((11, 3)) == 0

    _os.mkdir(_os.path.join(path, "hashes") + ".__compact_old")
    with _pytest.raises(RuntimeError, match="mid-swap"):
        compact_index(spark, path)


def test_bm25_index_parity_pruning_append_compact(spark, tmp_path, sf_dir):
    """The at-rest BM25 inverted index end-to-end: (a) serving equals
    text.bm25_top_docs exactly on the same corpus (shared bm25_rank
    stage + shared tokenizer); (b) the postings read is partition-
    pruned to the query terms' buckets; (c) build-on-half + append-half
    equals build-on-full (df/N/avgdl are derived at probe time, so
    appends need no stats rewrite); (d) compaction reduces files and
    leaves probe results unchanged; (e) a mismatched n_buckets probe is
    a hard error."""
    import pytest

    from eventstorm_spark.extensions.curation import (
        append_bm25_index,
        bm25_against_index,
        compact_index,
        write_bm25_index,
    )
    from eventstorm_spark.extensions.text import bm25_top_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["spark", "merge", "window"]
    want = [tuple(r) for r in bm25_top_docs(docs, terms, k=20).collect()]

    path = os.path.join(str(tmp_path), "bm25")
    write_bm25_index(docs, path, n_buckets=16)
    got = bm25_against_index(spark, path, terms, k=20, n_buckets=16)
    assert [tuple(r) for r in got.collect()] == want

    # partition pruning: the query terms' buckets land in
    # PartitionFilters (inspect a FRESH probe plan — after a collect,
    # AQE's finalized plan string formats scans differently)
    fresh = bm25_against_index(spark, path, terms, k=20, n_buckets=16)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan

    # append lifecycle: half + appended half == full
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    path2 = os.path.join(str(tmp_path), "bm25_half")
    write_bm25_index(half_a, path2, n_buckets=16)
    append_bm25_index(half_b, path2, n_buckets=16)
    got2 = bm25_against_index(spark, path2, terms, k=20, n_buckets=16)
    assert [tuple(r) for r in got2.collect()] == want

    # compaction: fewer files, identical serving
    report = compact_index(spark, path2)
    assert report["postings"]["files_after"] <= report["postings"]["files_before"]
    got3 = bm25_against_index(spark, path2, terms, k=20, n_buckets=16)
    assert [tuple(r) for r in got3.collect()] == want

    # meta guard
    with pytest.raises(ValueError):
        bm25_against_index(spark, path, terms, n_buckets=32)


def test_bm25_index_zero_postings_corpus(spark, tmp_path):
    """A corpus whose text yields no [a-z0-9]+ tokens (all punctuation)
    writes ZERO postings files; the doclen derivation must read the
    bare directory with the postings' own schema instead of crashing on
    parquet schema inference (regression from the single-tokenize
    build), and a probe against the empty index returns no rows."""
    from eventstorm_spark.extensions.curation import (bm25_against_index,
                                                      write_bm25_index)

    docs = spark.createDataFrame(
        [(1, "!!! ???"), (2, "---")], "doc_id long, text string")
    path = os.path.join(str(tmp_path), "bm25_empty")
    write_bm25_index(docs, path, n_buckets=4)
    got = bm25_against_index(spark, path, ["hash"], k=5, n_buckets=4)
    assert got.collect() == []


# ---------------------------------------------------------------------------
# at-rest KMV sketch store
# ---------------------------------------------------------------------------


def test_kmv_index_lifecycle(spark, tmp_path):
    from eventstorm_spark.extensions.curation import (append_kmv_index,
                                                      kmv_index_estimate,
                                                      write_kmv_index)
    path = str(tmp_path / "kmv_idx")
    base = spark.createDataFrame(
        [("a", f"u{i}") for i in range(40)]
        + [("b", f"v{i % 5}") for i in range(30)], ["source", "user"])
    write_kmv_index(base, path, "user", group_cols=("source",), k=16)

    est = {r.source: r.n_distinct_est
           for r in kmv_index_estimate(spark, path).collect()}
    assert est["b"] == 5.0           # below k: exact
    assert est["a"] > 16             # estimator branch live

    # append overlaps + novelty; estimate must equal a fresh build
    extra = spark.createDataFrame(
        [("b", f"v{i}") for i in range(12)]      # 5 old + 7 new
        + [("c", "w0")], ["source", "user"])
    append_kmv_index(extra, path)
    est2 = {r.source: r.n_distinct_est
            for r in kmv_index_estimate(spark, path).collect()}
    assert est2["b"] == 12.0 and est2["c"] == 1.0 and est2["a"] == est["a"]

    from eventstorm_spark.extensions.sketches import kmv_estimate, kmv_sketch
    direct = {r.source: r.n_distinct_est for r in kmv_estimate(
        kmv_sketch(base.unionByName(extra), "user", k=16,
                   group_cols=["source"]), k=16).collect()}
    assert est2 == direct            # merge == direct build, per group

    # meta guard: appending a different column errors
    import pytest as _pytest
    with _pytest.raises(ValueError):
        append_kmv_index(extra.withColumnRenamed("user", "other"),
                         path, col="other")


def test_hdr_index_lifecycle(spark, tmp_path):
    from eventstorm_spark.extensions.curation import (append_hdr_index,
                                                      hdr_index_quantiles,
                                                      write_hdr_index)
    from eventstorm_spark.extensions.sketches import (hdr_histogram,
                                                      hdr_quantiles)
    path = str(tmp_path / "hdr_idx")
    base = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 501)], ["source", "v"])
    write_hdr_index(base, path, "v", group_cols=("source",))
    got = {r.q: r.value_est
           for r in hdr_index_quantiles(spark, path, (0.5,)).collect()}
    assert abs(got[0.5] - 250) / 250 < 0.02

    extra = spark.createDataFrame(
        [("a", float(i)) for i in range(501, 1001)], ["source", "v"])
    append_hdr_index(extra, path)
    est2 = {r.q: r.value_est
            for r in hdr_index_quantiles(spark, path, (0.5,)).collect()}
    # merged index == fresh build over the union
    direct = {r.q: r.value_est for r in hdr_quantiles(
        hdr_histogram(base.unionByName(extra), "v",
                      group_cols=["source"]), [0.5],
        group_cols=["source"]).collect()}
    assert est2 == direct
    assert abs(est2[0.5] - 500) / 500 < 0.02


def test_psi_drift_flags_shift_and_stability(spark):
    from eventstorm_spark.extensions.curation import psi_drift
    old = spark.createDataFrame(
        [(i, float(i % 100), float(i % 7)) for i in range(1000)],
        ["id", "x", "stable"])
    # identical snapshot: PSI ~ 0 on every feature
    same = {r.feature: r for r in
            psi_drift(old, old, ["x", "stable"]).collect()}
    assert abs(same["x"].psi) < 1e-6 and abs(same["stable"].psi) < 1e-6
    assert same["x"].n_old == same["x"].n_new == 1000
    # shifted snapshot: x drifts (top half only), stable stays put
    new = old.where(F.col("x") >= 50)
    got = {r.feature: r for r in
           psi_drift(old, new, ["x", "stable"]).collect()}
    assert got["x"].psi > 0.25          # "investigate" band
    assert abs(got["stable"].psi) < 0.05
    assert got["x"].n_new == 500
    # deterministic under repartitioning
    again = {r.feature: r.psi for r in
             psi_drift(old.repartition(7), new.repartition(3),
                       ["x", "stable"]).collect()}
    assert again == {f: r.psi for f, r in got.items()}


def test_positional_index_lifecycle(spark, sf_dir, tmp_path):
    """Positional index: (a) serving equals text.phrase_search exactly
    (shared _phrase_join + tokenizer); (b) the postings read is
    partition-pruned to the phrase tokens' buckets; (c) build-half +
    append-half == build-full; (d) meta guard on n_buckets."""
    import pytest

    from eventstorm_spark.extensions.curation import (
        append_positional_index,
        phrase_against_index,
        write_positional_index,
    )
    from eventstorm_spark.extensions.text import phrase_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    phrase = ["merge", "window"]
    want = sorted(tuple(r) for r in phrase_search(docs, phrase).collect())
    assert want  # the corpus must actually contain the phrase

    path = os.path.join(str(tmp_path), "pos_idx")
    write_positional_index(docs, path, n_buckets=16)
    got = phrase_against_index(spark, path, phrase, n_buckets=16)
    assert sorted(tuple(r) for r in got.collect()) == want

    fresh = phrase_against_index(spark, path, phrase, n_buckets=16)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan

    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    path2 = os.path.join(str(tmp_path), "pos_idx_half")
    write_positional_index(half_a, path2, n_buckets=16)
    append_positional_index(half_b, path2, n_buckets=16)
    got2 = phrase_against_index(spark, path2, phrase, n_buckets=16)
    assert sorted(tuple(r) for r in got2.collect()) == want

    with pytest.raises(ValueError):
        phrase_against_index(spark, path, phrase, n_buckets=32)
    with pytest.raises(ValueError):
        phrase_against_index(spark, path, [], n_buckets=16)


def test_decay_index_lifecycle(spark, tmp_path):
    """Decay store: build-half + append-half == fresh build (shared
    reference instant makes partials mergeable), and as-of rebasing is
    one multiply that matches rebuilding at the later reference."""
    import datetime as dt

    from eventstorm_spark.extensions.curation import (append_decay_index,
                                                      decay_index_scores,
                                                      write_decay_index)
    from eventstorm_spark.extensions.temporal import decayed_counts

    ref = dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)
    ref_us = int(ref.timestamp() * 1e6)
    base = dt.datetime(2024, 1, 1)
    rows = [(f"u{i % 7}", base + dt.timedelta(hours=i * 3))
            for i in range(200)]
    ev = spark.createDataFrame(rows, ["user", "ts"])

    path = str(tmp_path / "decay_idx")
    write_decay_index(ev.where(F.xxhash64("ts") % 2 == 0), path, "user",
                      ref_ts_us=ref_us, half_life="7 days")
    append_decay_index(ev.where(F.xxhash64("ts") % 2 != 0), path, "user")

    got = {r.key: (r.n, r.decayed_score)
           for r in decay_index_scores(spark, path).collect()}
    want = {r.key: (r.n, r.decayed_score)
            for r in decayed_counts(ev, "user", ref_ts_us=ref_us,
                                    half_life="7 days").collect()}
    assert got == want

    # rebase to one half-life later == rebuild at the later reference
    later = ref_us + 7 * 86_400 * 1_000_000
    reb = {r.key: r.decayed_score
           for r in decay_index_scores(spark, path,
                                       as_of_us=later).collect()}
    fresh = {r.key: r.decayed_score
             for r in decayed_counts(ev, "user", ref_ts_us=later,
                                     half_life="7 days").collect()}
    assert set(reb) == set(fresh)
    for k in reb:
        assert abs(reb[k] - fresh[k]) < 1e-6
    # wrong-kind guard
    import pytest
    with pytest.raises(ValueError):
        decay_index_scores(spark, str(tmp_path / "nope"))
