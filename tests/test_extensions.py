"""Extension-operator tests: the approximate paths (MinHash-LSH, SimHash,
hyperplane LSH) are pinned against their exact oracle-checked twins; the
multimodal plumbing is exercised for batch shape and stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstorm_spark.extensions import dedup, multimodal, similarity
from eventstorm_spark.inventory import load, _query_vec

SF_DIR = "/root/testdata/sf0.01"  # documents has planted near-dups at this SF


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR, "embeddings").cache()


def test_minhash_lsh_finds_all_exact_near_dups(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert len(exact) >= 20  # the driver plants ~25 near-dup pairs
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_near_duplicates(docs, threshold=0.8).collect()
    }
    # verification step guarantees precision; banding (r=4, b=16) gives
    # ~0.999 recall at j>=0.8 — on the planted pairs it must be total
    assert lsh == exact


def test_simhash_buckets_cover_near_dups(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    cands = {
        (r["id_a"], r["id_b"]) for r in dedup.simhash_buckets(docs).collect()
    }
    missed = exact - cands
    assert len(missed) <= len(exact) * 0.2  # banding recall on j>=0.9 pairs


def test_drop_exact_duplicates_idempotent(docs):
    deduped = dedup.drop_exact_duplicates(docs)
    n1 = deduped.count()
    assert n1 == deduped.select("text").distinct().count()
    assert dedup.drop_exact_duplicates(deduped).count() == n1


def test_lsh_topk_is_subset_with_overlap(spark, emb):
    qv = _query_vec(spark, SF_DIR)
    exact = [r["vec_id"] for r in
             similarity.brute_force_topk(emb.where(F.col("vec_id") != 0), qv, k=10).collect()]
    approx = similarity.lsh_topk(emb.where(F.col("vec_id") != 0), qv, k=10)
    rows = approx.collect()
    assert len(rows) <= 10
    # all approx hits must be true rows scored identically to the exact path
    exact_all = {
        r["vec_id"]: r["cosine_sim"]
        for r in similarity.cosine_scores(emb.where(F.col("vec_id") != 0), qv).collect()
    }
    for r in rows:
        assert abs(exact_all[r["vec_id"]] - r["cosine_sim"]) < 1e-9
    # and the approximate set should overlap the exact top-k meaningfully
    assert len(set(r["vec_id"] for r in rows) & set(exact)) >= 1


def test_ivf_topk_recall(spark, emb):
    qv = _query_vec(spark, SF_DIR)
    sub = emb.where(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in similarity.brute_force_topk(sub, qv, k=10).collect()]
    ivf = [r["vec_id"] for r in similarity.ivf_topk(sub, qv, k=10).collect()]
    assert len(ivf) == 10
    assert len(set(ivf) & set(exact)) >= 3  # n_probe=4/16 cells


def test_quality_bucket_sample_deterministic_and_monotone(spark, docs):
    from eventstorm_spark.extensions.pipeline import quality_bucket_sample
    from eventstorm_spark.extensions.text import unigram_logprob

    scored = unigram_logprob(docs)
    out = quality_bucket_sample(scored, [0.0, 0.25, 0.75, 1.0])
    rows = out.collect()
    n = scored.count()
    assert len(rows) == n  # projection: every doc labeled, none dropped
    by_bucket: dict = {}
    for r in rows:
        d = by_bucket.setdefault(r["quality_bucket"], [0, 0])
        d[0] += 1
        d[1] += int(r["kept"])
    assert set(by_bucket) == {1, 2, 3, 4}
    assert by_bucket[1][1] == 0          # rate 0.0 keeps nothing
    assert by_bucket[4][1] == by_bucket[4][0]  # rate 1.0 keeps all
    # equal-frequency cut: buckets within rounding of n/4
    for b in by_bucket.values():
        assert abs(b[0] - n / 4) <= max(2, 0.1 * n)
    # deterministic: rerun produces identical keep decisions
    again = {(r["doc_id"], r["kept"]) for r in
             quality_bucket_sample(scored, [0.0, 0.25, 0.75, 1.0]).collect()}
    assert again == {(r["doc_id"], r["kept"]) for r in rows}


def test_containment_catches_doc_inside_doc(spark):
    """A small doc embedded verbatim in a much larger one: Jaccard
    misses it (ratio ~ small/big), containment flags it at 1.0."""
    small = " ".join(f"w{i}" for i in range(20))
    big = " ".join(f"x{i}" for i in range(300)) + " " + small
    other = " ".join(f"y{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string")

    cont = {(r.id_a, r.id_b): r.containment
            for r in dedup.ngram_containment_pairs(docs, threshold=0.8).collect()}
    assert cont.get((1, 2)) == 1.0
    assert (1, 3) not in cont and (2, 3) not in cont

    jac = {(r.id_a, r.id_b) for r in
           dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) not in jac  # the pair Jaccard structurally misses


def test_containment_stop_shingle_cut_biases_down_only(spark):
    """max_shingle_df drops corpus-ubiquitous shingles from the join;
    scores use full-set denominators, so pruning only lowers scores —
    a fully-embedded pair whose shingles are all ubiquitous drops out,
    a pair with rare shingles keeps its exact score."""
    boiler = "the same footer on every page repeated here"
    rare = " ".join(f"r{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, boiler), (2, boiler + " extra trailing words here now"),
         (3, boiler + " unrelated suffix tokens beyond the base"),
         (4, rare), (5, rare + " tail")],
        "doc_id long, text string")
    exact = {(r.id_a, r.id_b): r.containment for r in
             dedup.ngram_containment_pairs(docs, threshold=0.5).collect()}
    cut = {(r.id_a, r.id_b): r.containment for r in
           dedup.ngram_containment_pairs(docs, threshold=0.5,
                                         max_shingle_df=2).collect()}
    assert (4, 5) in exact and cut.get((4, 5)) == exact[(4, 5)]  # rare kept exact
    for k, v in cut.items():
        assert v <= exact.get(k, 1.0) + 1e-9  # never biased up
    # boiler shingles appear in docs 1,2,3 (df=3 > 2) -> their pairs
    # lose those shingles' contribution
    assert cut.get((1, 2), 0.0) < exact[(1, 2)]


def test_multimodal_decode_batch_shape(spark, docs):
    assets = multimodal.synth_assets(docs.limit(50))
    feats = multimodal.decode_and_featurize(assets, fake=True, batch_note_col=True)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["features"])
        assert r["rows_in_batch"] >= 1


def test_multimodal_real_decode_unknown_format_is_stubbed(spark, docs):
    # synth_assets payloads are raw utf-8 text (no RIFF/P6 magic): real
    # mode must refuse them — only formats with a stdlib codec decode
    assets = multimodal.synth_assets(docs.limit(5))
    feats = multimodal.decode_and_featurize(assets, fake=False)
    with pytest.raises(Exception) as exc_info:
        feats.collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError)


def test_wav_roundtrip_exact():
    samples = [0, 100, -100, 32767, -32768, 7]
    payload = multimodal.encode_wav_pcm16(samples, 16000)
    w = multimodal.decode_wav_pcm16(payload)
    assert w["sample_rate"] == 16000
    assert w["n_channels"] == 1
    assert w["n_samples"] == len(samples)
    assert w["sum_abs"] == sum(abs(s) for s in samples)
    assert w["max_abs"] == 32768


def test_wav_decoder_walks_chunks_with_padding():
    # a LIST chunk with odd size before fmt/data: the walker must skip
    # it honoring 2-byte alignment, and find fmt even after data
    import struct

    samples = [1, -2, 3]
    data = struct.pack("<3h", *samples)
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    odd = b"junk!"  # 5 bytes -> needs 1 pad byte
    body = (b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
            + b"data" + struct.pack("<I", len(data)) + data
            + b"fmt " + fmt)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    w = multimodal.decode_wav_pcm16(payload)
    assert (w["sample_rate"], w["n_samples"], w["sum_abs"]) == (8000, 3, 6)


def test_wav_decoder_rejects_non_riff():
    with pytest.raises(ValueError):
        multimodal.decode_wav_pcm16(b"OggS garbage")


def test_ppm_roundtrip_with_comments():
    rgb = bytes(range(12))  # 2x2 RGB
    payload = multimodal.encode_ppm(2, 2, rgb)
    # inject a comment line into the header (netpbm allows them)
    payload = payload.replace(b"P6\n", b"P6\n# synthetic\n", 1)
    p = multimodal.decode_ppm(payload)
    assert (p["width"], p["height"], p["n_pixels"]) == (2, 2, 4)
    assert p["sum_r"] == 0 + 3 + 6 + 9
    assert p["sum_g"] == 1 + 4 + 7 + 10
    assert p["sum_b"] == 2 + 5 + 8 + 11


def test_real_decode_features_wav_and_ppm(spark):
    wav = multimodal.encode_wav_pcm16([10, -20, 30, -40], 8000)
    ppm = multimodal.encode_ppm(1, 2, bytes([10, 20, 30, 40, 50, 60]))
    assets = spark.createDataFrame(
        [(1, "audio", wav, None), (2, "image", ppm, None)],
        multimodal.ASSET_SCHEMA)
    rows = {r["asset_id"]: r["features"] for r in
            multimodal.decode_and_featurize(assets, fake=False).collect()}
    assert rows[1][:4] == [8000.0, 1.0, 16.0, 4.0]
    assert rows[1][5] == (10 + 20 + 30 + 40) / 4  # mean_abs
    assert rows[2][:4] == [1.0, 2.0, 3.0, 2.0]
    assert rows[2][4:7] == [(10 + 40) / 2, (20 + 50) / 2, (30 + 60) / 2]


def test_decode_image_meta_matches_synth(spark, docs):
    out = multimodal.decode_image_meta(
        multimodal.synth_ppm_assets(docs.limit(8))).collect()
    assert len(out) == 8
    for r in out:
        did = r["asset_id"]
        w, h = 4 + did % 5, 3 + did % 3
        rgb = [(did * 7 + k * 13) % 256 for k in range(w * h * 3)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["mean_r"] == round(sum(rgb[0::3]) / (w * h), 6)
        assert r["mean_b"] == round(sum(rgb[2::3]) / (w * h), 6)


def test_decode_audio_meta_matches_synth(spark, docs):
    out = multimodal.decode_audio_meta(
        multimodal.synth_wav_assets(docs.limit(10))).collect()
    assert len(out) == 10
    for r in out:
        did = r["asset_id"]
        n = 100 + did % 50
        rate = 8000 + (did % 4) * 4000
        vals = [abs(((did * 131 + i * 997) % 65536) - 32768) for i in range(n)]
        assert r["sample_rate"] == rate and r["n_samples"] == n
        assert r["max_abs"] == max(vals)
        assert r["mean_abs"] == round(sum(vals) / n, 6)


def test_frame_sample_only_videos(spark, docs):
    assets = multimodal.synth_assets(docs)
    frames = multimodal.frame_sample(assets)
    joined = frames.join(assets, "asset_id").select("modality").distinct().collect()
    assert {r["modality"] for r in joined} == {"video"}


def test_embedding_lsh_precision_and_recall(emb):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    assert len(exact) >= 10
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_duplicates(
            emb, threshold=0.4, num_planes=24, bands=8).collect()
    }
    # exact-cosine verification => perfect precision
    assert approx <= exact
    # banded sign-LSH (r=3, b=8) at cosine>=0.4 => high (not total) recall
    assert len(approx) >= 0.6 * len(exact)


# ---------------------------------------------------------------------------
# duplicate clustering (connected components)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("thresh", [0, 1_000_000])  # distributed / driver path
def test_duplicate_clusters_transitive_chain(spark, thresh):
    # chain 1-2, 2-3, 3-4 plus isolated pair 10-11: two components,
    # labeled by their min member — A~C collapses though never scored.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    got = {r.doc_id: r.cluster_id
           for r in dedup.duplicate_clusters(
               pairs, driver_threshold=thresh).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


@pytest.mark.parametrize("thresh", [0, 1_000_000])
def test_duplicate_clusters_singletons_from_docs(spark, thresh):
    pairs = spark.createDataFrame([(2, 1)], ["id_a", "id_b"])
    docs = spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])
    got = {r.doc_id: r.cluster_id
           for r in dedup.duplicate_clusters(
               pairs, docs, driver_threshold=thresh).collect()}
    assert got == {1: 1, 2: 1, 3: 3}


def test_duplicate_clusters_long_chain_converges(spark):
    # a 12-node path is the worst case for min propagation (diameter
    # rounds); must still reach the fixpoint within max_iter.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"])
    got = dedup.duplicate_clusters(pairs, driver_threshold=0).collect()
    assert {r.cluster_id for r in got} == {0}
    assert len(got) == 13


def test_drop_near_duplicates_keeps_min_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in [1, 2, 3, 4, 10, 11, 20]],
        ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    kept = sorted(r.doc_id for r in
                  dedup.drop_near_duplicates(docs, pairs).collect())
    assert kept == [1, 10, 20]


# ---------------------------------------------------------------------------
# pipeline: deterministic splits + decontamination
# ---------------------------------------------------------------------------


def test_assign_splits_deterministic_and_covering(docs):
    from eventstorm_spark.extensions.pipeline import assign_splits
    a = {r.doc_id: r.split for r in assign_splits(docs).collect()}
    b = {r.doc_id: r.split
         for r in assign_splits(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    assert set(a.values()) <= {"train", "val", "test"}
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert frac_train > 0.9  # ~0.98 by weight


def test_assign_splits_salt_changes_assignment(docs):
    from eventstorm_spark.extensions.pipeline import assign_splits
    a = {r.doc_id: r.split for r in assign_splits(docs, salt="v1").collect()}
    b = {r.doc_id: r.split for r in assign_splits(docs, salt="v2").collect()}
    assert a != b


def test_assign_splits_grouped_cluster_coherent(spark, docs):
    """Every member of a near-dup cluster lands in the SAME split (the
    leakage invariant per-doc hashing cannot give); docs absent from the
    clusters frame fall back to their own id, i.e. they match plain
    assign_splits exactly; the helper column never leaks out."""
    from eventstorm_spark.extensions.pipeline import (assign_splits,
                                                      assign_splits_grouped)
    # even/odd ids share a cluster each; doc 20 is absent from clusters
    clusters = spark.createDataFrame(
        [(1, 1), (3, 1), (2, 2), (4, 2), (10, 10)],
        ["doc_id", "cluster_id"])
    # weights that force visible split diversity on tiny data
    w = {"train": 0.5, "val": 0.25, "test": 0.25}
    got = assign_splits_grouped(docs, clusters, weights=w).collect()
    by_id = {r.doc_id: r.split for r in got}
    assert by_id[1] == by_id[3] and by_id[2] == by_id[4]
    plain = {r.doc_id: r.split
             for r in assign_splits(docs, weights=w).collect()}
    assert by_id[20] == plain[20]  # fallback: absent id hashes itself
    assert "_split_group" not in got[0].asDict()
    assert set(by_id) == {r.doc_id for r in docs.collect()}


def test_split_contamination_finds_planted_leak(spark):
    from eventstorm_spark.extensions.pipeline import split_contamination
    leak = "alpha beta gamma delta epsilon zeta eta"
    train = spark.createDataFrame(
        [(1, f"prefix words {leak} suffix words"),
         (2, "totally unrelated text with different tokens entirely")],
        ["doc_id", "text"])
    test = spark.createDataFrame(
        [(100, f"other intro {leak} other outro"),
         (101, "clean test document nothing shared here")],
        ["doc_id", "text"])
    got = split_contamination(train, test, n=5).collect()
    assert [(r.train_id, r.test_id) for r in got] == [(1, 100)]
    # 7-token leak -> 3 shared 5-gram shingles
    assert got[0].n_common == 3


def test_approx_event_stats_accuracy(spark):
    """The query now emits bounded-error verdict columns (hll_ok,
    p50_ok) next to the exact scalars; all verdicts must hold — that is
    exactly what the driver's oracle asserts."""
    from eventstorm_spark.inventory import load, q_approx_event_stats
    from tests.conftest import SF_DIR
    ev = load(spark, SF_DIR, "events")
    exact = {r.event_type: r.users for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("users")).collect()}
    rows = q_approx_event_stats(spark, SF_DIR).collect()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.hll_ok == 1      # HLL estimate within 5% of exact
        assert r.p50_ok == 1      # approx median inside exact p45..p55


def test_stratified_sample_deterministic_and_growth_stable(docs):
    from eventstorm_spark.extensions.pipeline import stratified_sample
    rates = {"src0": 0.3}
    a = {r.doc_id for r in stratified_sample(docs, rates).collect()}
    b = {r.doc_id for r in stratified_sample(docs.repartition(5), rates).collect()}
    assert a == b
    # growth-stable: sampling a subset makes the same per-doc decisions
    half = docs.limit(200)
    c = {r.doc_id for r in stratified_sample(half, rates).collect()}
    assert c == a & {r.doc_id for r in half.collect()}


def test_normalize_embeddings_unit_norm(emb):
    import numpy as np
    got = similarity.normalize_embeddings(emb.limit(50)).collect()
    for r in got:
        n = np.linalg.norm(np.asarray(r.embedding))
        assert abs(n - 1.0) < 1e-9


def test_bloom_decontaminate_no_false_keeps(spark):
    """decontaminate_bloom (hash-slot broadcast semi-join, k=1 Bloom):
    (a) its drop set is a SUPERSET of exact decontaminate's at any
    m_bits (no false keeps — a shared shingle always collides into the
    same slot); (b) at a large m_bits it equals the exact drop set on
    this fixture (no collisions); (c) a tiny m_bits demonstrates the
    bounded false-drop direction (more drops, never fewer)."""
    import random

    from eventstorm_spark.extensions.pipeline import (decontaminate,
                                                      decontaminate_bloom)

    rng = random.Random(3)
    leak = "the quick brown fox jumps over lazy dogs today"
    train_rows, test_rows = [], []
    for i in range(60):
        filler = " ".join(f"tr{i}w{j}" for j in range(rng.randint(8, 15)))
        t = filler
        if i % 6 == 0:  # 10 contaminated docs carry the leaked passage
            w = t.split(" ")
            w[rng.randint(0, len(w)):0] = leak.split(" ")
            t = " ".join(w)
        train_rows.append((i, t))
    for i in range(5):
        test_rows.append((1000 + i,
                          f"benchmark item {i} contains {leak} verbatim"))
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string")

    def kept_ids(df):
        return {r.doc_id for r in df.select("doc_id").collect()}

    exact = kept_ids(decontaminate(train, test, n=5))
    big_m = kept_ids(decontaminate_bloom(train, test, n=5, m_bits=1 << 58))
    tiny_m = kept_ids(decontaminate_bloom(train, test, n=5, m_bits=64))
    all_train = kept_ids(train)

    assert exact < all_train  # fixture actually has contamination
    assert big_m == exact  # 2^58 slots: collision-free here
    assert tiny_m <= big_m  # false drops only, never false keeps
    assert len(tiny_m) < len(big_m)  # 64 slots: collisions demonstrably fire
    # portable twin drops the same way it hashes (md5 slots)
    port = kept_ids(decontaminate_bloom(train, test, n=5, m_bits=1 << 58,
                                        portable=True))
    assert port == exact


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """streaming_decontaminate: (a) on a static frame it keeps exactly
    the ids decontaminate_bloom keeps (same slots, same contract);
    (b) as a real micro-batched stream, contaminated docs are dropped
    per batch with zero state (stateless stream-static decision)."""
    import datetime
    import os

    from eventstorm_spark.extensions.pipeline import (decontaminate_bloom,
                                                      streaming_decontaminate)

    leak = "the quick brown fox jumps over lazy dogs today"
    train_rows = [(i, f"doc {i} body w{i}a w{i}b w{i}c w{i}d") for i in range(20)]
    for i in (3, 7):
        train_rows[i] = (i, train_rows[i][1] + " " + leak)
    test = spark.createDataFrame(
        [(900, f"benchmark row has {leak} inside")],
        "doc_id long, text string")

    static = spark.createDataFrame(train_rows, "doc_id long, text string")
    want = {r.doc_id for r in
            decontaminate_bloom(static, test, n=5).select("doc_id").collect()}
    got = {r.doc_id for r in
           streaming_decontaminate(static, test, n=5).select("doc_id").collect()}
    assert got == want and got == set(range(20)) - {3, 7}

    # true streaming run: two micro-batches through a parquet feed
    t0 = datetime.datetime(2024, 1, 1)
    schema = "doc_id long, ts timestamp, text string"
    feed_dir = os.path.join(str(tmp_path), "feed")
    os.makedirs(feed_dir)
    spark.createDataFrame(
        [(0, t0, "clean one body text here"),
         (1, t0, f"dirty {leak} body")], schema
    ).coalesce(1).write.mode("append").parquet(feed_dir)
    src = spark.readStream.schema(schema).parquet(feed_dir)
    out = streaming_decontaminate(src, test, n=5)
    seen = []
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _e: seen.extend(
             r.doc_id for r in bdf.collect()))
         .start())
    try:
        q.processAllAvailable()
        assert seen == [0]
        spark.createDataFrame(
            [(2, t0, f"later batch {leak} contaminated"),
             (3, t0, "later batch clean")], schema
        ).coalesce(1).write.mode("append").parquet(feed_dir)
        q.processAllAvailable()
        assert sorted(seen) == [0, 3]
    finally:
        q.stop()


def test_embedding_moments_empty_frame_raises(emb):
    """ADVICE r8 (low): moments of an empty (or all-null) embedding
    frame raise a clear ValueError instead of an opaque TypeError —
    pca_fit/opq_rotation inherit the guard."""
    with pytest.raises(ValueError, match="empty embedding frame"):
        similarity.embedding_moments(emb.where(F.lit(False)))
    nulls = emb.limit(3).select(
        F.lit(None).cast("array<double>").alias("embedding"))
    with pytest.raises(ValueError, match="empty embedding frame"):
        similarity.embedding_moments(nulls)


def test_quantize_roundtrip_error_bounded(emb):
    import numpy as np
    orig = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.limit(50).collect()}
    q = similarity.quantize_embeddings(emb.limit(50))
    deq = {r.vec_id: np.asarray(r.embedding)
           for r in similarity.dequantize_embeddings(q).collect()}
    assert set(deq) == set(orig)
    for vid, v in orig.items():
        scale = max(abs(v).max() / 127.0, 1e-12)
        assert np.max(np.abs(deq[vid] - v)) <= scale / 2 + 1e-12
    # top-k neighbours survive quantization (the point of the exercise)
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = [r.vec_id for r in similarity.brute_force_topk(
        emb, qv, k=10).collect()]
    deq_df = similarity.dequantize_embeddings(similarity.quantize_embeddings(emb))
    approx = [r.vec_id for r in similarity.brute_force_topk(
        deq_df, qv, k=10).collect()]
    assert len(set(exact) & set(approx)) >= 8


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------


def test_cms_bounds_and_merge(spark):
    from eventstorm_spark.extensions import sketches
    from eventstorm_spark.inventory import load
    from tests.conftest import SF_DIR

    ev = load(spark, SF_DIR, "events")
    n_total = ev.count()
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}

    sk = sketches.cms_build(ev, "event_type", width=256, depth=5)
    assert sk.count() <= 256 * 5  # sketch size independent of stream
    est = {r.value: r.estimate for r in
           sketches.cms_estimate(sk, list(exact), width=256, depth=5).collect()}
    for k, true_n in exact.items():
        assert est[k] >= true_n                       # never undercounts
        assert est[k] <= true_n + (3 / 256) * n_total  # CMS bound (e=3)
    # absent key estimates near zero (only collisions)
    miss = sketches.cms_estimate(sk, ["no-such-type"], width=256, depth=5).collect()
    assert miss[0].estimate <= (3 / 256) * n_total

    # merge = union + sum: sketch(a) + sketch(b) == sketch(a union b)
    half1 = ev.where(F.col("user_id") % 2 == 0)
    half2 = ev.where(F.col("user_id") % 2 == 1)
    merged = (sketches.cms_build(half1, "event_type", width=256, depth=5)
              .unionByName(sketches.cms_build(half2, "event_type", width=256, depth=5))
              .groupBy("row", "bucket").agg(F.sum("count").alias("count")))
    est2 = {r.value: r.estimate for r in
            sketches.cms_estimate(merged, list(exact), width=256, depth=5).collect()}
    assert est2 == est


def test_normalize_text_unicode_semantics(spark):
    from eventstorm_spark.extensions.text import normalize_text
    # é composed vs decomposed, ligature case, whitespace runs
    rows = [(1, "Café  DELUXE"), (2, "Café\tdeluxe"),
            (3, "STRASSE ß"), (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.text for r in normalize_text(df).collect()}
    assert got[1] == got[2] == "café deluxe"  # NFC unifies, ws collapses
    assert got[3] == "strasse ss"                   # casefold, not lower
    assert got[4] is None


def test_star_components_path_graph_converges_logarithmically(spark):
    """10k-node path graph — the adversarial case for min-label
    propagation (diameter = n). Large-star/small-star must converge in
    O(log n) rounds (< 15 for n=10k) with every node labeled 0."""
    from eventstorm_spark.extensions.dedup import star_components

    edges = spark.range(9_999).selectExpr("id AS id_a", "id + 1 AS id_b")
    labels, rounds = star_components(edges)
    assert rounds < 15, f"took {rounds} rounds"
    got = labels.collect()
    assert len(got) == 10_000
    assert {r["comp"] for r in got} == {0}


def test_star_components_match_union_find_tier(spark):
    """Same labels as the default (union-find) tier on a multi-component
    graph with chains, cliques and singleton-adjacent shapes."""
    from eventstorm_spark.extensions.dedup import duplicate_clusters

    raw = (
        [(i, i + 1) for i in range(0, 40)]          # one long chain 0..40
        + [(100, 101), (101, 102), (100, 102)]       # triangle
        + [(200, 205), (205, 203), (203, 201)]       # zigzag
        + [(300, 301)]                               # pair
    )
    pairs = spark.createDataFrame(raw, "id_a long, id_b long")
    uf = {r["doc_id"]: r["cluster_id"]
          for r in duplicate_clusters(pairs).collect()}
    star = {r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs, algorithm="star").collect()}
    assert star == uf


def test_kmeans_centroids_improve_ivf_recall(spark, emb):
    """Trained spherical k-means centroids must (a) be deterministic
    across partitionings, (b) reduce within-cluster scatter versus the
    untrained seeds, and (c) route ivf_topk at least as well as the
    untrained lowest-id centroids."""
    import numpy as np

    from eventstorm_spark.extensions.similarity import (
        brute_force_topk, ivf_topk, kmeans_centroids)

    qv = _query_vec(spark, SF_DIR)
    sub = emb.where(F.col("vec_id") != 0)

    c1 = kmeans_centroids(sub, k=16, iters=4)
    c2 = kmeans_centroids(sub.repartition(7), k=16, iters=4)
    a1, a2 = np.array(c1), np.array(c2)
    assert a1.shape == (16, 64)
    # determinism up to FP summation order in the distributed avg
    assert np.allclose(a1, a2, atol=1e-9)

    # scatter: mean max-cosine to a centroid should improve vs seeds
    vecs = np.array([np.asarray(r["embedding"], dtype=np.float64)
                     for r in sub.select("embedding").collect()])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    def mean_best_cos(cents):
        c = np.array(cents)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
        return float(np.max(vecs @ c.T, axis=1).mean())

    seeds = kmeans_centroids(sub, k=16, iters=0)
    assert mean_best_cos(c1) >= mean_best_cos(seeds) - 1e-9

    exact = [r["vec_id"] for r in brute_force_topk(sub, qv, k=10).collect()]
    trained = [r["vec_id"] for r in
               ivf_topk(sub, qv, k=10, centroids=c1).collect()]
    untrained = [r["vec_id"] for r in ivf_topk(sub, qv, k=10).collect()]
    assert len(set(trained) & set(exact)) >= len(set(untrained) & set(exact)) - 2
    assert len(set(trained) & set(exact)) >= 3


def test_bucket_cap_bounds_hot_bucket_blowup(spark):
    """A hot LSH bucket (20 identical docs = 190 pair rows per band)
    is dropped by the cap while normal near-dup pairs still flow."""
    from eventstorm_spark.extensions.dedup import (
        minhash_lsh_candidates, minhash_signatures)

    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    rows = [(i, "spam template text repeated verbatim " * 3) for i in range(20)]
    rows += [(100, base), (101, near)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs)

    uncapped = minhash_lsh_candidates(sigs)
    capped = minhash_lsh_candidates(sigs, max_bucket_size=10)
    got_capped = {(r.id_a, r.id_b) for r in capped.collect()}
    got_uncapped = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert (100, 101) in got_uncapped and (100, 101) in got_capped
    assert any(a < 20 and b < 20 for a, b in got_uncapped)   # clique present
    assert not any(a < 20 and b < 20 for a, b in got_capped)  # clique capped


# ---------------------------------------------------------------------------
# round 5: packing, C4 rules, DSIR, SemDeDup, temperature mixture
# ---------------------------------------------------------------------------


def test_pack_token_spans_partitions_every_token_exactly_once(docs):
    """Packing is a partition of the global token range: per-doc slices
    reassemble the document, per-sequence totals are exactly seq_len
    (except the final ragged sequence), and slices are contiguous."""
    from eventstorm_spark.extensions.packing import pack_token_spans
    from eventstorm_spark.extensions.text import tokens  # noqa: F401

    spans = pack_token_spans(docs, seq_len=128).collect()
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.selectExpr(
            "doc_id",
            "cast(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) as long) as n",
        ).collect() if r["n"] > 0
    }
    per_doc: dict[int, list] = {}
    per_seq: dict[int, int] = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(r)
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_toks"]
    assert set(per_doc) == set(toks)
    for did, rows in per_doc.items():
        rows.sort(key=lambda r: r["off_in_doc"])
        assert sum(r["n_toks"] for r in rows) == toks[did]
        off = 0
        for r in rows:
            assert r["off_in_doc"] == off  # contiguous slices
            off += r["n_toks"]
    last = max(per_seq)
    for sid, total in per_seq.items():
        assert total == 128 or sid == last
    # identical result under a different partitioning (global order is
    # id order, not partition order)
    spans2 = pack_token_spans(docs.repartition(7), seq_len=128).collect()
    key = lambda r: (r["seq_id"], r["doc_id"], r["off_in_doc"], r["n_toks"])  # noqa: E731
    assert sorted(map(key, spans2)) == sorted(map(key, spans))


def test_c4_rules_reject_reasons(spark):
    from eventstorm_spark.extensions.text import c4_rules

    good = "the quick brown fox jumps of over a lazy dog to and in it is " * 2
    rows = [
        (1, good),
        (2, "short text"),                              # too_few_words
        (3, good + " {code}"),                          # brace
        (4, good + " lorem ipsum dolor"),               # lorem_ipsum
        (5, good + " enable JavaScript now"),           # javascript
        (6, good + " " + "x" * 30),                     # long_word
        (7, "uno dos tres quatro cinco seis siete ocho nueve diez once"),  # stopwords
    ]
    out = {r["doc_id"]: r for r in
           c4_rules(spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[1]["kept"] == 1 and out[1]["reject_reason"] is None
    assert out[2]["reject_reason"] == "too_few_words"
    assert out[3]["reject_reason"] == "brace"
    assert out[4]["reject_reason"] == "lorem_ipsum"
    assert out[5]["reject_reason"] == "javascript"
    assert out[6]["reject_reason"] == "long_word"
    assert out[7]["reject_reason"] == "stopwords"
    assert all(r["kept"] == 0 for d, r in out.items() if d != 1)


def test_extract_html_text_golden():
    """Pure-function goldens for the HTML extractor: boilerplate strip,
    CDATA script hazards, entities, comments, block boundaries, inline
    fusion, malformation tolerance."""
    from eventstorm_spark.extensions.text import extract_html_text as ex

    # chrome stripped, blocks separated, inline tags fuse
    page = ("<html><head><title>T</title><style>p { x: 1 }</style></head>"
            "<body><nav><a href='/'>Home</a></nav>"
            "<h1>Head</h1><p>one <b>bo</b>ld</p><p>two</p>"
            "<ul><li>a</li><li>b</li></ul>"
            "<footer>foot</footer></body></html>")
    assert ex(page) == "Head one bold two a b"
    # script is CDATA: '<' and '"<div>"' inside JS never leak or abort
    assert ex('<script>if (1 < 2) { var x = "<div>"; }</script>ok') == "ok"
    # comments (even containing tags) are dropped
    assert ex("a<!-- <p>hidden</p> -->b") == "ab"
    # entities: named, decimal, hex; &amp;lt; double-escape decodes once
    assert ex("<p>x &amp; y &#60;z&#x3E; &amp;lt;</p>") == "x & y <z> &lt;"
    # <br> and self-closing blocks are boundaries
    assert ex("one<br>two<hr/>three") == "one two three"
    # nested strip containers; unclosed inline tag tolerated
    assert ex("<header><nav>chrome</nav>more chrome</header>x<b>y") == "xy"
    # strip containers are block boundaries: text around them never fuses
    assert ex("a<nav>x</nav>b") == "a b"
    assert ex("a<iframe/>b") == "a b"
    # whitespace runs collapse, edges trim
    assert ex("<p>  a\n\t b  </p> ") == "a b"
    # custom strip list
    assert ex("<nav>keep me</nav>", strip_tags=("script",)) == "keep me"
    assert ex(None) is None
    assert ex("") == ""


def test_html_to_text_spark_path_and_plan(spark):
    """The Spark form extracts through ONE Arrow-batched python stage
    over the scan — no shuffle, no row-at-a-time Python."""
    from eventstorm_spark.extensions.text import html_to_text

    df = spark.createDataFrame(
        [(1, "<body><h1>A</h1><p>b &amp; c</p><footer>f</footer></body>"),
         (2, None)],
        "doc_id long, html string")
    out = {r.doc_id: r.text for r in
           html_to_text(df, text_col="html", out_col="text").collect()}
    assert out[1] == "A b & c"
    assert out[2] is None
    plan = (html_to_text(df, text_col="html")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan


def test_html_extract_error_surface(spark, monkeypatch):
    """A parser that raises mid-document yields a TRUNCATED extraction;
    that state is surfaceable — errors='none' returns None from the
    pure function, and html_to_text(error_col=...) flags the row while
    staying a single no-shuffle Arrow stage."""
    import eventstorm_spark.extensions.text as T

    real_feed = T._HtmlExtractor.feed

    def exploding_feed(self, data):
        if "BOOM" in data:
            # parse the prefix, then die mid-document
            real_feed(self, data.split("BOOM")[0])
            raise RuntimeError("parser blew up")
        return real_feed(self, data)

    monkeypatch.setattr(T._HtmlExtractor, "feed", exploding_feed)
    assert T.extract_html_text("<p>pre</p>BOOM<p>post</p>") == "pre"
    assert T.extract_html_text("<p>pre</p>BOOM<p>post</p>",
                               errors="none") is None
    assert T.extract_html_text("<p>fine</p>", errors="none") == "fine"

    df = spark.createDataFrame(
        [(1, "<p>good page</p>"), (2, "<p>cut</p>BOOM<p>lost</p>"),
         (3, None)],
        "doc_id long, html string")
    out = {r.doc_id: (r.text, r.bad) for r in
           T.html_to_text(df, text_col="html", out_col="text",
                          error_col="bad").collect()}
    # executors re-import the real module, so the monkeypatch does not
    # reach them — drive the same UDF body locally instead
    pairs = [T._extract_html_checked(h, T.HTML_STRIP_TAGS)
             for h in ["<p>good page</p>", "<p>cut</p>BOOM<p>lost</p>", None]]
    assert pairs[0] == ("good page", False)
    assert pairs[1] == ("cut", True)
    assert pairs[2] == (None, False)
    # Spark path: schema + non-error rows behave (real parser never
    # raises on these, so bad=False everywhere here)
    assert out[1] == ("good page", False)
    assert out[3] == (None, False)
    plan = (T.html_to_text(df, text_col="html", error_col="bad")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan and "Exchange" not in plan


def test_dsir_weights_upweight_target_language(docs):
    """Target = the English slice: English docs must score higher on
    average than every other language (that's the resampling signal)."""
    from eventstorm_spark.extensions.text import dsir_weights

    w = dsir_weights(docs).join(docs.select("doc_id", "lang"), "doc_id")
    means = {r["lang"]: r["m"] for r in
             w.groupBy("lang").agg(F.avg("dsir_logratio").alias("m")).collect()}
    assert all(means["en"] > m for lang, m in means.items() if lang != "en")


def test_semantic_dedup_invariants(emb):
    from eventstorm_spark.extensions.dedup import semantic_dedup

    rows = semantic_dedup(emb, tau=0.4).collect()
    assert len(rows) == emb.count()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        rep = min(m["vec_id"] for m in members)
        for m in members:
            if m["vec_id"] == rep:
                assert m["dropped"] == 0          # the representative survives
                assert abs(m["cos_to_rep"] - 1.0) < 1e-6
            else:
                assert m["dropped"] == (1 if m["cos_to_rep"] >= 0.4 else 0)


def test_temperature_mixture_flattens_shares(docs):
    from eventstorm_spark.extensions.pipeline import temperature_mixture

    rows = temperature_mixture(docs, alpha=0.3).collect()
    assert abs(sum(r["sample_prob"] for r in rows) - 1.0) < 1e-4
    lo = min(rows, key=lambda r: r["corpus_share"])
    hi = max(rows, key=lambda r: r["corpus_share"])
    assert lo["sample_prob"] > lo["corpus_share"]   # tail upweighted
    assert hi["sample_prob"] < hi["corpus_share"]   # head downweighted


def test_pq_topk_recall_and_compression(spark, emb):
    """PQ/ADC: codes are M tinyints (the 32x compression claim), the
    ranking is partition-independent, and recall@10 against the exact
    top-10 is non-trivial even with untrained 16-entry codebooks."""
    from eventstorm_spark.extensions.similarity import (
        brute_force_topk, pq_codebooks, pq_encode, pq_topk)
    from eventstorm_spark.inventory import _query_vec

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where(F.col("vec_id") != 0)
    cb = pq_codebooks(base)
    assert cb.shape == (8, 16, 8)
    codes = pq_encode(base, cb).collect()
    assert all(len(r["pq_codes"]) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["pq_codes"])

    exact = [r["vec_id"] for r in brute_force_topk(base, qv, k=10).collect()]
    approx = [r["vec_id"] for r in pq_topk(base, qv, k=10).collect()]
    approx2 = [r["vec_id"] for r in
               pq_topk(base.repartition(7), qv, k=10).collect()]
    assert approx == approx2  # deterministic under repartitioning
    assert len(set(approx) & set(exact)) >= 2


def test_bm25_scores_docs_with_query_terms(docs):
    from eventstorm_spark.extensions.text import bm25_top_docs

    top = bm25_top_docs(docs, ["spark", "merge", "window"], k=20).collect()
    assert len(top) == 20
    assert all(top[i]["bm25"] >= top[i + 1]["bm25"] for i in range(19))
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in top:
        assert any(t in texts[r["doc_id"]] for t in ("spark", "merge", "window"))


def test_passage_scrub_removes_cross_doc_segments(docs):
    """Scrub accounting: totals reconcile with token counts, removals
    happen exactly where repeated_passages flags a non-first doc, and
    first-occurrence docs keep everything."""
    from eventstorm_spark.extensions.text import passage_scrub, repeated_passages

    out = {r["doc_id"]: r for r in passage_scrub(docs).collect()}
    toks = {r["doc_id"]: r["n"] for r in docs.selectExpr(
        "doc_id", "cast(size(split(trim(text), '\\\\s+')) as long) as n").collect()}
    assert set(out) == set(toks)
    for did, r in out.items():
        assert r["n_segments"] == -(-toks[did] // 10)
        assert 0 <= r["n_removed"] <= r["n_segments"]
        assert r["n_tokens_after"] <= toks[did]
        if r["n_removed"] == 0:
            assert r["n_tokens_after"] == toks[did]
    rep = repeated_passages(docs).collect()
    first_by_seg: dict[str, int] = {}
    for r in rep:
        first_by_seg[r["segment"]] = min(
            first_by_seg.get(r["segment"], r["doc_id"]), r["doc_id"])
    expected_removed: dict[int, int] = {}
    for r in rep:
        if r["doc_id"] != first_by_seg[r["segment"]]:
            expected_removed[r["doc_id"]] = expected_removed.get(r["doc_id"], 0) + 1
    assert sum(expected_removed.values()) > 0  # planted near-dups exist
    for did, n in expected_removed.items():
        assert out[did]["n_removed"] == n


def test_ivf_index_partition_pruned_serving(spark, emb, tmp_path):
    """write_ivf_index + ivf_index_topk: results equal the in-memory
    ivf_topk routing on the SAME centroids, the probe predicate lands
    in PartitionFilters (unprobed cells cost zero I/O — the at-rest
    100 TB serving shape), and the writer's default centroids are the
    TRAINED ones (r8 verdict task 4), not the lowest-id vectors."""
    import numpy as np

    from eventstorm_spark.extensions.similarity import (
        brute_force_topk, ivf_index_topk, ivf_topk, write_ivf_index)
    from eventstorm_spark.inventory import _query_vec

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf_index")
    cents = write_ivf_index(base, path)

    # default is trained routing, not the lowest-id construction
    lowest = [[float(x) for x in r["embedding"]] for r in
              base.orderBy("vec_id").limit(16).collect()]
    assert not np.allclose(np.array(cents), np.array(lowest))

    served = ivf_index_topk(spark, path, cents, qv, k=10)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    got = [(r["vec_id"], r["cosine_sim"]) for r in served.collect()]
    want = [(r["vec_id"], r["cosine_sim"])
            for r in ivf_topk(base, qv, k=10, centroids=cents).collect()]
    assert got == want and len(got) == 10

    # recall@10 of the trained at-rest default is not worse than the
    # untrained lowest-id layout would serve (tolerance for ties)
    exact = {r["vec_id"] for r in brute_force_topk(base, qv, k=10).collect()}
    untrained = {r["vec_id"]
                 for r in ivf_topk(base, qv, k=10, centroids=lowest).collect()}
    assert len({v for v, _ in got} & exact) >= len(untrained & exact) - 2


def test_bmp_codec_round_trip_all_paddings():
    """encode_bmp/decode_bmp: exact pixel-stat recovery across all four
    4-byte row-padding cases (widths 5..8), bottom-up AND top-down row
    order, plus honest refusals for non-24-bit / compressed payloads."""
    import struct as _struct

    from eventstorm_spark.extensions.multimodal import decode_bmp, encode_bmp

    for did in range(8):
        w, h = 5 + did % 4, 2 + did % 3
        rgb = bytes((did * 19 + k * 23) % 256 for k in range(w * h * 3))
        payload = encode_bmp(w, h, rgb)
        d = decode_bmp(payload)
        assert (d["width"], d["height"]) == (w, h)
        assert d["sum_r"] == sum(rgb[0::3])
        assert d["sum_g"] == sum(rgb[1::3])
        assert d["sum_b"] == sum(rgb[2::3])

    # top-down variant (negative height) decodes identically
    w, h = 5, 3
    rgb = bytes(range(w * h * 3))
    p = bytearray(encode_bmp(w, h, rgb))
    stride = w * 3
    padded = stride + ((-stride) % 4)
    rows = [bytes(p[54 + y * padded:54 + (y + 1) * padded])
            for y in range(h)]
    top_down = bytes(p[:54]) + b"".join(reversed(rows))
    top_down = bytearray(top_down)
    _struct.pack_into("<i", top_down, 22, -h)
    assert decode_bmp(bytes(top_down)) == decode_bmp(bytes(p))

    bad_bpp = bytearray(encode_bmp(2, 2, bytes(12)))
    _struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp(bytes(bad_bpp))
    bad_comp = bytearray(encode_bmp(2, 2, bytes(12)))
    _struct.pack_into("<I", bad_comp, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_bmp(bytes(bad_comp))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"P6\n1 1\n255\n\x00\x00\x00")


def test_jpeg_codec_round_trip_and_refusals():
    """encode_jpeg/decode_jpeg — the real baseline T.81 pipeline:
    (a) flat grayscale at quality 100 round-trips EXACTLY (lone DC
    coefficient, all-ones quant tables, identity color transform);
    (b) rich random content decodes within a tight mean-channel error
    at quality 90/100 (per-pixel lossy bound, not just sums);
    (c) progressive / subsampled / truncated payloads refuse honestly."""
    import struct as _struct

    import numpy as np

    from eventstorm_spark.extensions.multimodal import (decode_jpeg,
                                                        encode_jpeg)

    for did in range(10):
        w, h = 9 + did % 7, 6 + did % 5
        v = (did * 37 + 11) % 256
        d = decode_jpeg(encode_jpeg(w, h, bytes([v]) * (w * h * 3),
                                    quality=100))
        assert (d["width"], d["height"]) == (w, h)
        assert d["sum_r"] == d["sum_g"] == d["sum_b"] == v * w * h

    rng = np.random.default_rng(5)
    w, h = 23, 17
    rgb = bytes(rng.integers(0, 256, size=w * h * 3, dtype=np.uint8))
    orig = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(float)
    for q, tol in ((100, 1.0), (90, 6.0)):
        d = decode_jpeg(encode_jpeg(w, h, rgb, quality=q))
        got = np.array([d["sum_r"], d["sum_g"], d["sum_b"]], dtype=float)
        err = np.abs(got - orig.sum(axis=(0, 1))) / (w * h)
        assert (err < tol).all(), (q, err)

    p = bytearray(encode_jpeg(8, 8, bytes(192), quality=90))
    sof_at = bytes(p).find(b"\xff\xc0")
    prog = bytearray(p)
    prog[sof_at + 1] = 0xC2  # progressive
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(prog))
    sub = bytearray(p)
    sub[sof_at + 11] = 0x22  # 2x2 luma sampling
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg(bytes(sub))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BM123456")


def test_png_codec_round_trip_all_filter_types():
    """encode_png/decode_png: exact pixel-stat recovery for scanlines
    filtered with every PNG filter type (None/Sub/Up/Average/Paeth),
    plus CRC and format guards."""
    from eventstorm_spark.extensions.multimodal import decode_png, encode_png

    for did in range(10):
        w, h = 3 + did % 6, 2 + did % 4
        rgb = bytes((did * 11 + k * 17) % 256 for k in range(w * h * 3))
        payload = encode_png(
            w, h, rgb, row_filters=[(did + y) % 5 for y in range(h)])
        d = decode_png(payload)
        assert (d["width"], d["height"]) == (w, h)
        assert d["sum_r"] == sum(rgb[0::3])
        assert d["sum_g"] == sum(rgb[1::3])
        assert d["sum_b"] == sum(rgb[2::3])
    corrupt = bytearray(encode_png(3, 2, bytes(18)))
    corrupt[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\n\x00\x00\x00")


def test_png_decode_meta_distributed(spark, docs):
    """The synth-PNG corpus decodes distributedly (mapInPandas) to the
    exact per-id recurrence stats — deflate + defilter round-trip
    through the engine, not just driver-side."""
    from eventstorm_spark.extensions.multimodal import (
        decode_image_meta, synth_png_assets)

    sample = docs.limit(20)
    out = {r["asset_id"]: r for r in
           decode_image_meta(synth_png_assets(sample)).collect()}
    for r in sample.select("doc_id").collect():
        did = r["doc_id"]
        w, h = 3 + did % 6, 2 + did % 4
        rgb = [(did * 11 + k * 17) % 256 for k in range(w * h * 3)]
        row = out[did]
        assert (row["width"], row["height"]) == (w, h)
        assert row["mean_r"] == round(sum(rgb[0::3]) / (w * h), 6)


def test_pq_index_serving_parity_and_codes_only_scan(spark, emb, tmp_path):
    """write_pq_index + pq_index_topk: identical results to the
    query-time pq_topk (same deterministic codebooks round-tripped
    through the codebooks parquet), and the serving scan reads ONLY
    the M-byte codes table — no raw embedding column anywhere in the
    plan, which is the 32x I/O cut that makes the tier worth storing."""
    from eventstorm_spark.extensions.similarity import (
        pq_index_topk, pq_topk, write_pq_index)
    from eventstorm_spark.inventory import _query_vec

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "pq_index")
    write_pq_index(base, path)

    served = pq_index_topk(spark, path, qv, k=10)
    plan = served._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "pq_codes" in scan and "embedding" not in scan

    got = [(r["vec_id"], r["adc_sim"]) for r in served.collect()]
    want = [(r["vec_id"], r["adc_sim"])
            for r in pq_topk(base, qv, k=10).collect()]
    assert got == want and len(got) == 10


def test_ivfpq_index_prunes_partitions_and_scans_codes_only(spark, emb, tmp_path):
    """write_ivfpq_index + ivfpq_index_topk: the serving plan carries
    the cell partition filter AND scans only id + M-byte codes, and the
    results equal ADC over exactly the probed cells' members (computed
    via the in-memory encode path on the same codebooks)."""
    from eventstorm_spark.extensions.similarity import (
        ivfpq_index_topk, pq_adc_topk, pq_encode, write_ivfpq_index)
    from eventstorm_spark.inventory import _query_vec
    import math as _math

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    cents, cb = write_ivfpq_index(base, path)

    served = ivfpq_index_topk(spark, path, qv, k=10, n_probe=4)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "pq_codes" in scan and "embedding" not in scan

    # reference: ADC over the probed cells' members, in-memory route
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = _math.sqrt(sum(x * x for x in a))
        nb = _math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe = sorted(range(len(cents)),
                   key=lambda i: (-cos(qv, cents[i]), i))[:4]
    member_rows = spark.read.parquet(f"{path}/codes").where(
        F.col("cell").isin(probe)).select("vec_id")
    members = base.join(member_rows, "vec_id", "left_semi")
    want = [(r["vec_id"], r["adc_sim"]) for r in
            pq_adc_topk(pq_encode(members, cb), cb, qv, k=10).collect()]
    got = [(r["vec_id"], r["adc_sim"]) for r in served.collect()]
    assert got == want and len(got) == 10


def test_pq_rejects_non_divisible_subspaces(spark, emb):
    """dim % num_subspaces != 0 must raise, not silently truncate the
    trailing dimensions out of encoding and ADC scoring."""
    from eventstorm_spark.extensions.similarity import (
        pq_codebooks, pq_codebooks_trained)

    base = emb.where(F.col("vec_id") != 0)
    dim = len(base.select("embedding").first()[0])
    bad = dim - 1 if dim > 1 else 3
    while dim % bad == 0:  # find a genuine non-divisor
        bad -= 1
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(base, num_subspaces=bad)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_trained(base, num_subspaces=bad, iters=1)


def test_bpe_training_known_merges_and_tiebreak(spark):
    """Hand-checkable corpus: 'aaab aaab aab'. Step 1 merges (a,a)
    count 5; step 2 merges (b,</w>) count 3; step 3 is a 2-2 tie
    between ('a b</w>') and ('aa a') — the pair-string tie-break must
    pick 'a b</w>'."""
    from eventstorm_spark.extensions.bpe import bpe_merge_table

    docs = spark.createDataFrame(
        [(1, "aaab aaab aab")], "doc_id long, text string")
    rows = bpe_merge_table(docs, num_merges=3).collect()
    got = [(r["step"], r["pair"], r["merged"], r["count"]) for r in rows]
    assert got == [
        (1, "a a", "aa", 5),
        (2, "b </w>", "b</w>", 3),
        (3, "a b</w>", "ab</w>", 2),
    ]


def test_bpe_training_partitioning_independent(docs):
    from eventstorm_spark.extensions.bpe import bpe_merge_table

    a = [tuple(r) for r in bpe_merge_table(docs, num_merges=6).collect()]
    b = [tuple(r) for r in
         bpe_merge_table(docs.repartition(7), num_merges=6).collect()]
    assert a == b and len(a) == 6


def test_bpe_fertility_decreases_with_merges(docs):
    """More merges => fewer symbols per word (training compresses)."""
    from eventstorm_spark.extensions.bpe import bpe_fertility

    f2 = bpe_fertility(docs, num_merges=2).collect()[0]
    f8 = bpe_fertility(docs, num_merges=8).collect()[0]
    assert f2["n_words"] == f8["n_words"]
    assert f8["fertility"] < f2["fertility"]
    assert f8["fertility"] >= 1.0


def test_bpe_driver_and_distributed_paths_agree(spark, docs):
    """The hybrid fast path (vocab collected, Python merge loop) and
    the fully distributed loop must learn the identical merge table
    and identical final symbol strings. The corpus deliberately
    includes runs of >=5 identical symbols ('aaaaa', '11111', 'zzzzzzz')
    — the inputs where the engine's two-pass-replace merge rule diverges
    from textbook greedy left-to-right BPE, so a driver loop that
    implemented greedy instead of replicating the replace semantics
    fails here at merge step 2."""
    from eventstorm_spark.extensions.bpe import train_bpe

    runs = spark.createDataFrame(
        [(9_000_001, "aaaaa aaaaa aaaaa aaaaa aaaaa aaaaa"),
         (9_000_002, "11111 11111 11111 zzzzzzz zzzzzzz"),
         (9_000_003, "aaaaaaaaa bbbb aaaa")],
        "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(runs)
    m_drv, wf_drv = train_bpe(corpus, num_merges=6)
    m_dist, wf_dist = train_bpe(corpus, num_merges=6, driver_max_vocab=0)
    assert m_drv == m_dist
    a = {r["word"]: r["syms"] for r in wf_drv.collect()}
    b = {r["word"]: r["syms"] for r in wf_dist.collect()}
    assert a == b


def test_bpe_two_pass_replace_rule_on_identical_runs(spark):
    """Pin the documented two-pass-replace merge rule on the canonical
    diverging input: corpus 'aaaaa aaaaa'. Step 1 merges (a,a); under
    two-pass replace 'a a a a a </w>' -> 'aa a aa </w>' (textbook
    greedy would give 'aa aa a </w>'), so step 2's 3-way count-2 tie
    resolves to pair 'a aa' — greedy's post-step-1 state would instead
    tie-break to 'a </w>'. Both execution paths must agree with the
    DuckDB oracle replay of the same rule."""
    import duckdb
    from eventstorm_spark.extensions.bpe import train_bpe

    corpus = spark.createDataFrame(
        [(1, "aaaaa aaaaa")], "id long, text string")
    for driver_max_vocab in (200_000, 0):
        m, wf = train_bpe(corpus, num_merges=2,
                          driver_max_vocab=driver_max_vocab)
        assert m[0][1:] == ("a a", "aa", 8)
        assert m[1][1:] == ("a aa", "aaa", 2)
        syms = {r["word"]: r["syms"] for r in wf.collect()}
        assert syms["aaaaa"] == " aa aaa </w> "
    # oracle agreement on the same corpus: replay the two-step training
    oracle = duckdb.sql("""
        WITH w0 AS MATERIALIZED (
            SELECT word, CAST(count(*) AS BIGINT) AS freq,
                   ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
                       || ' </w> ' AS syms
            FROM (SELECT unnest(regexp_extract_all(lower('aaaaa aaaaa'),
                                                   '[a-z0-9]+')) AS word) t
            GROUP BY word),
        c1 AS MATERIALIZED (
            SELECT arr[j] || ' ' || arr[j + 1] AS pair,
                   CAST(sum(freq) AS BIGINT) AS c
            FROM (SELECT freq, string_split(trim(syms), ' ') AS arr
                  FROM w0) s,
                 unnest(generate_series(1, len(arr) - 1)) u(j)
            GROUP BY 1),
        t1 AS MATERIALIZED (
            SELECT pair, c FROM c1 ORDER BY c DESC, pair LIMIT 1),
        w1 AS MATERIALIZED (
            SELECT word, freq,
                   replace(replace(syms,
                       ' ' || (SELECT pair FROM t1) || ' ',
                       ' ' || (SELECT replace(pair, ' ', '') FROM t1) || ' '),
                       ' ' || (SELECT pair FROM t1) || ' ',
                       ' ' || (SELECT replace(pair, ' ', '') FROM t1) || ' ')
                       AS syms
            FROM w0),
        c2 AS MATERIALIZED (
            SELECT arr[j] || ' ' || arr[j + 1] AS pair,
                   CAST(sum(freq) AS BIGINT) AS c
            FROM (SELECT freq, string_split(trim(syms), ' ') AS arr
                  FROM w1) s,
                 unnest(generate_series(1, len(arr) - 1)) u(j)
            GROUP BY 1),
        t2 AS MATERIALIZED (
            SELECT pair, c FROM c2 ORDER BY c DESC, pair LIMIT 1)
        SELECT 1 AS step, pair, c FROM t1
        UNION ALL SELECT 2, pair, c FROM t2 ORDER BY step
    """).fetchall()
    m_eng, _ = train_bpe(corpus, num_merges=2, driver_max_vocab=0)
    assert [(s, p, c) for s, p, _, c in m_eng] == \
        [(s, p, c) for s, p, c in oracle]


def test_pq_trained_codebooks_cut_quantization_error(spark, emb):
    """Per-subspace L2 k-means codebooks must cut the mean squared
    reconstruction error vs the untrained lowest-id codebooks — the
    objective k-means provably improves (ADC ranking quality follows
    distortion, but single-query recall on near-random vectors is too
    noisy to assert). Training must also be partitioning-independent."""
    import numpy as np
    from eventstorm_spark.extensions.similarity import (
        pq_codebooks, pq_codebooks_trained, pq_encode)

    base = emb.where(F.col("vec_id") != 0)
    cb0 = pq_codebooks(base)
    cbt = pq_codebooks_trained(base, iters=4)
    assert cbt.shape == cb0.shape

    rows = base.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([np.asarray(r["embedding"], dtype=np.float64)
                     for r in rows])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    def mse(cb):
        codes = {r["vec_id"]: r["pq_codes"]
                 for r in pq_encode(base, cb).collect()}
        errs = []
        for vid, v in zip(ids, vecs):
            rec = np.concatenate([cb[s][codes[vid][s]] for s in range(8)])
            errs.append(((v - rec) ** 2).sum())
        return float(np.mean(errs))

    e0, et = mse(cb0), mse(cbt)
    assert et < e0 * 0.8  # training cuts distortion substantially

    cbt2 = pq_codebooks_trained(base.repartition(5), iters=4)
    assert np.allclose(cbt, cbt2, atol=1e-9)  # deterministic training


def test_rrf_fuse_semantics(spark):
    """RRF fusion: rank-only (score magnitudes irrelevant), ids missing
    from one list contribute only their present lists' terms, ties in
    score rank deterministically by id, n_lists counts the retrievers
    that surfaced the id."""
    from eventstorm_spark.extensions.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 100.0), (2, 50.0), (3, 10.0)],
                              "doc_id long, s double")
    b = spark.createDataFrame([(2, 0.9), (4, 0.8)],
                              "doc_id long, s double")
    out = {r.id: (r.rrf_score, r.n_lists)
           for r in rrf_fuse([a, b], rrf_k=60, out_k=10).collect()}
    assert out[2] == (round(1 / 62 + 1 / 61, 6), 2)   # rank 2 in a, 1 in b
    assert out[1] == (round(1 / 61, 6), 1)
    assert out[4] == (round(1 / 62, 6), 1)
    assert out[3] == (round(1 / 63, 6), 1)
    # scaling scores never changes the fusion (rank-only)
    a10 = a.select("doc_id", (F.col("s") * 10).alias("s"))
    out2 = {r.id: (r.rrf_score, r.n_lists)
            for r in rrf_fuse([a10, b], rrf_k=60, out_k=10).collect()}
    assert out2 == out
    # score ties break by id: (5, 1.0) ranks before (6, 1.0)
    t = spark.createDataFrame([(6, 1.0), (5, 1.0)], "doc_id long, s double")
    ranks = {r.id: r.rrf_score for r in rrf_fuse([t], rrf_k=60).collect()}
    assert ranks[5] > ranks[6]


def test_pca_whitening_decorrelates(spark, emb):
    """One-pass PCA: moments match a local numpy computation exactly
    (the distributed partials are the same arithmetic regrouped),
    whitened covariance is the identity, refits are byte-identical
    (sign convention), and the per-batch reduction never lands vector
    rows on the driver."""
    import numpy as np

    from eventstorm_spark.extensions.similarity import (
        embedding_moments, pca_fit, pca_whiten,
    )

    sub = emb.where(F.col("vec_id") != 0)
    local = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                      for r in sub.select("embedding").collect()])
    n, mean, cov = embedding_moments(sub)
    assert n == local.shape[0]
    assert np.allclose(mean, local.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(local.T, bias=True), atol=1e-7)

    model = pca_fit(sub, k=16)
    model2 = pca_fit(sub, k=16)
    assert np.array_equal(model["components"], model2["components"])
    assert model["eigvals"][0] >= model["eigvals"][-1] > 0

    w = pca_whiten(sub, model)
    wl = np.stack([np.asarray(r["whitened"]) for r in w.collect()])
    assert wl.shape == (n, 16)
    wc = np.cov(wl.T, bias=True)
    assert np.allclose(wc, np.eye(16), atol=1e-2)  # identity covariance
    # variance concentrates: top component's raw variance equals the
    # top eigenvalue (Rayleigh), and whitening flattens it to ~1
    proj = (local - mean) @ model["components"][:, 0]
    assert np.isclose(proj.var(), model["eigvals"][0], rtol=1e-6)


def test_ivfpq_residual_encoding_cuts_error_and_serves(spark, emb, tmp_path):
    """Residual IVF-PQ on CLUSTERED data (the case the tier exists
    for — real embedding corpora cluster; the sf embeddings table is
    uniform-random, where residuals provably cannot shrink): (a)
    reconstruction error of centroid+codebook decode is far lower than
    raw-vector IVF-PQ at the same (M, K) budget; (b) serving stays
    partition-pruned and codes-only; (c) served scores equal the
    in-memory q*c + LUT computation; (d) a non-residual index is
    refused by the meta guard; (e) residual_frame round-trips."""
    import numpy as np
    import pytest as _pytest

    from eventstorm_spark.extensions.similarity import (
        ivfpq_residual_index_topk, read_pq_codebooks, residual_frame,
        write_ivfpq_index, write_ivfpq_residual_index,
    )

    rng = np.random.default_rng(3)
    n_clusters, per, dim = 8, 40, 64
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, ids = [], []
    for c in range(n_clusters):
        pts = centers[c] + 0.15 * rng.normal(size=(per, dim))
        vecs.append(pts)
        ids.extend(range(c * per + 1, c * per + per + 1))
    X = np.concatenate(vecs)
    base = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
        "vec_id long, embedding array<float>")
    qv = [float(x) for x in (centers[0] + 0.1 * rng.normal(size=dim))]
    cents = [[float(x) for x in c] for c in centers]

    rpath = str(tmp_path / "ivfpq_res")
    ppath = str(tmp_path / "ivfpq_plain")
    _, rcb = write_ivfpq_residual_index(base, rpath, centroids=cents)
    _, pcb = write_ivfpq_index(base, ppath, centroids=cents)

    cm = np.asarray(cents, dtype=np.float64)
    cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    truth = {int(i): v / np.linalg.norm(v) for i, v in zip(ids, X)}

    def recon_err(path, cb, residual):
        rows = spark.read.parquet(f"{path}/codes").collect()
        n_sub, _, sub = cb.shape
        errs = []
        for r in rows:
            dec = np.concatenate([cb[s][r["pq_codes"][s]]
                                  for s in range(n_sub)])
            if residual:
                dec = dec + cmn[r["cell"]]
            errs.append(np.sum((dec - truth[r["vec_id"]]) ** 2))
        return float(np.mean(errs))

    e_res = recon_err(rpath, rcb, residual=True)
    e_plain = recon_err(ppath, pcb, residual=False)
    assert e_res < e_plain * 0.5, (e_res, e_plain)

    served = ivfpq_residual_index_topk(spark, rpath, qv, k=10, n_probe=4)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "pq_codes" in scan and "embedding" not in scan

    q = np.asarray(qv, dtype=np.float64)
    q = q / np.linalg.norm(q)
    sims = cmn @ q
    probe = sorted(range(len(cm)), key=lambda i: (-sims[i], i))[:4]
    cb2 = read_pq_codebooks(spark, rpath)
    n_sub, _, sub = cb2.shape
    lut = np.stack([cb2[s] @ q[s * sub:(s + 1) * sub] for s in range(n_sub)])
    want = []
    for r in spark.read.parquet(f"{rpath}/codes").where(
            F.col("cell").isin(probe)).collect():
        score = float(lut[np.arange(n_sub), np.asarray(r["pq_codes"])].sum()
                      + sims[r["cell"]])
        want.append((r["vec_id"], round(score, 6)))
    want = [x for x in sorted(want, key=lambda t: (-t[1], t[0]))][:10]
    got = [(r["vec_id"], r["adc_sim"]) for r in served.collect()]
    assert got == want

    with _pytest.raises(ValueError, match="not a residual"):
        ivfpq_residual_index_topk(spark, ppath, qv)

    rf = residual_frame(base.limit(20), cents)
    for r in rf.collect():
        back = np.asarray(r["residual"]) + cmn[r["cell"]]
        assert np.allclose(back, truth[r["vec_id"]], atol=1e-6)


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking invariants: every token covered, consecutive chunks
    share exactly `overlap` tokens, last chunk may be short, short docs
    yield one chunk, invalid overlap rejected."""
    import pytest as _pytest

    from eventstorm_spark.extensions.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))),   # 25 toks
         (2, "a b c")],                                # shorter than chunk
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=10, overlap=4)
    rows = sorted([(r.doc_id, r.chunk_no, r.start_tok, r.chunk, r.n_tokens)
                   for r in out.collect()])
    d1 = [r for r in rows if r[0] == 1]
    # stride 6: starts 0,6,12,18 -> ceil((25-4)/6)=4 chunks
    assert [(r[1], r[2]) for r in d1] == [(0, 0), (1, 6), (2, 12), (3, 18)]
    assert d1[0][3].split() == [f"t{i}" for i in range(10)]
    assert d1[1][3].split() == [f"t{i}" for i in range(6, 16)]
    assert d1[3][3].split() == [f"t{i}" for i in range(18, 25)]  # short tail
    assert d1[3][4] == 7
    # coverage: union of chunk token sets == all tokens
    covered = set()
    for r in d1:
        covered.update(r[3].split())
    assert covered == {f"t{i}" for i in range(25)}
    # overlap: consecutive chunks share exactly `overlap` tokens
    assert set(d1[0][3].split()) & set(d1[1][3].split()) == {
        f"t{i}" for i in range(6, 10)}
    d2 = [r for r in rows if r[0] == 2]
    assert len(d2) == 1 and d2[0][3] == "a b c" and d2[0][4] == 3
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=10, overlap=10)


def test_gif_codec_roundtrip_and_malformation():
    """Pure-function GIF codec: exact roundtrip on random rasters, LZW
    table growth past 512 entries (code-width change), KwKwK
    self-reference, extension-block skipping, and honest refusals
    (interlace, truncation, bad magic)."""
    import random
    import struct

    import pytest as _pytest

    from eventstorm_spark.extensions.multimodal import (
        decode_gif, encode_gif,
    )

    pal = bytes(v for i in range(256)
                for v in ((i * 3) % 256, (i * 5 + 1) % 256, (i * 7 + 2) % 256))

    def expect(idx):
        return (sum(pal[3 * i] for i in idx), sum(pal[3 * i + 1] for i in idx),
                sum(pal[3 * i + 2] for i in idx))

    rng = random.Random(7)
    for _ in range(15):
        w, h = rng.randint(1, 24), rng.randint(1, 24)
        idx = bytes(rng.randrange(32) for _ in range(w * h))
        d = decode_gif(encode_gif(w, h, idx, pal))
        assert (d["width"], d["height"]) == (w, h)
        assert (d["sum_r"], d["sum_g"], d["sum_b"]) == expect(idx)

    # KwKwK: 'aaa...' forces the first-use-of-new-code path; big repeat
    # pattern pushes the table past 512 entries (width growth)
    for idx in (bytes([5]) * 40,
                bytes((k * 13) % 32 for k in range(4000))):
        n = len(idx)
        w = 40 if n == 40 else 80
        h = n // w
        d = decode_gif(encode_gif(w, h, idx, pal))
        assert (d["sum_r"], d["sum_g"], d["sum_b"]) == expect(idx)

    # extension blocks (e.g. GCE) are skipped
    g = bytearray(encode_gif(2, 2, bytes([1, 2, 3, 4]), pal))
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # graphic control ext
    g2 = bytes(g[:13 + 768]) + ext + bytes(g[13 + 768:])
    d = decode_gif(g2)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == expect(bytes([1, 2, 3, 4]))

    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF!" * 4)
    with _pytest.raises(ValueError):
        decode_gif(bytes(encode_gif(4, 4, bytes(16), pal))[:-12])  # truncated
    # interlaced flag -> honest refusal
    g = bytearray(encode_gif(2, 2, bytes(4), pal))
    g[13 + 768 + 9] |= 0x40  # image descriptor flags byte
    with _pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(g))


def test_mulaw_codec_reference_values():
    """mu-law decode law pinned against Python's historical audioop
    reference values and structural properties: zero byte decodes to
    the max magnitude, 0xFF to 0, sign symmetry, monotone magnitudes
    per exponent segment, and the WAV roundtrip + fmt-code dispatch."""
    import pytest as _pytest

    from eventstorm_spark.extensions.multimodal import (
        decode_wav_any, decode_wav_mulaw, encode_wav_mulaw,
        encode_wav_pcm16, mulaw_to_linear,
    )

    # G.711 convention: the wire byte is COMPLEMENTED before expansion,
    # so 0xFF is +0, 0x7F is -0, 0x00 the most-negative and 0x80 the
    # most-positive sample (these are the classic table endpoints)
    assert mulaw_to_linear(0xFF) == 0
    assert mulaw_to_linear(0x7F) == 0
    assert mulaw_to_linear(0x00) == -32124
    assert mulaw_to_linear(0x80) == 32124
    for b in range(256):
        assert mulaw_to_linear(b) == -mulaw_to_linear(b ^ 0x80)
    # within the negative family (0x00-0x7F) samples rise monotonically
    # toward zero as the byte value rises
    vals = [mulaw_to_linear(b) for b in range(128)]
    assert all(a < b for a, b in zip(vals, vals[1:]))

    ulaw = bytes(range(256))
    d = decode_wav_mulaw(encode_wav_mulaw(ulaw, 8000))
    assert (d["sample_rate"], d["n_samples"], d["max_abs"]) == (8000, 256, 32124)
    assert d["sum_abs"] == 2 * sum(abs(mulaw_to_linear(b)) for b in range(128))

    # dispatch: PCM16 payloads still route to the PCM16 parser
    p = decode_wav_any(encode_wav_pcm16([0, 5, -5], 16000))
    assert (p["sample_rate"], p["n_samples"], p["sum_abs"]) == (16000, 3, 10)
    m = decode_wav_any(encode_wav_mulaw(b"\x00\xff", 8000))
    assert (m["n_samples"], m["max_abs"]) == (2, 32124)
    with _pytest.raises(NotImplementedError, match="format code"):
        bad = bytearray(encode_wav_mulaw(b"\x00", 8000))
        bad[20] = 3  # IEEE float fmt code
        decode_wav_any(bytes(bad))


def test_opq_rotation_balances_and_cuts_distortion(spark):
    """Parametric OPQ (eigenvalue allocation): on ANISOTROPIC data —
    variance concentrated in a few correlated directions, the regime
    plain contiguous-subspace PQ handles worst — the balanced rotation
    (a) is orthonormal, (b) spreads per-subspace variance far more
    evenly than PCA ordering, and (c) strictly cuts trained-PQ
    reconstruction error vs no rotation. Rotation preserves dots, so
    ADC serving only needs the query rotated."""
    import numpy as np

    from eventstorm_spark.extensions.similarity import (
        opq_rotation, pq_codebooks_trained, pq_encode, rotate_embeddings,
    )

    rng = np.random.default_rng(5)
    n, d = 400, 64
    # anisotropic: 8 strong correlated directions + small isotropic noise
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.concatenate([np.full(8, 6.0), np.full(d - 8, 0.3)])
    X = (rng.normal(size=(n, d)) * scales) @ basis.T
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<float>")

    R = opq_rotation(df, num_subspaces=8)
    assert np.allclose(R.T @ R, np.eye(d), atol=1e-8)  # orthonormal

    # per-subspace variance balance: rotated spread << unrotated PCA order
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    def subspace_vars(M):
        return np.array([M[:, 8 * s:8 * (s + 1)].var() for s in range(8)])
    v_rot = subspace_vars(Xn @ R)
    assert v_rot.max() / v_rot.min() < 5.0, v_rot  # balanced

    def distortion(frame):
        cb = pq_codebooks_trained(frame, num_subspaces=8, num_codes=16)
        codes = {r["vec_id"]: r["pq_codes"]
                 for r in pq_encode(frame, cb).collect()}
        vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
                for r in frame.collect()}
        errs = []
        for i, c in codes.items():
            dec = np.concatenate([cb[s][c[s]] for s in range(8)])
            v = vecs[i]
            v = v / np.linalg.norm(v)
            errs.append(np.sum((dec - v) ** 2))
        return float(np.mean(errs))

    e_plain = distortion(df)
    e_rot = distortion(rotate_embeddings(df, R))
    assert e_rot < e_plain * 0.8, (e_rot, e_plain)


def test_ivf_index_append_lifecycle(spark, emb, tmp_path):
    """Recurring-ingest lifecycle for the raw-vector IVF index: build,
    append a new batch, and serving finds appended vectors through the
    SAME partition-pruned probes — routing parity because writer and
    append share one cell expression."""
    import numpy as np

    from eventstorm_spark.extensions.similarity import (
        append_ivf_index, ivf_index_topk, write_ivf_index,
    )
    from eventstorm_spark.inventory import _query_vec

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where((F.col("vec_id") != 0) & (F.col("vec_id") <= 400))
    path = str(tmp_path / "ivf")
    cents = write_ivf_index(base, path)

    before = {r["vec_id"] for r in
              ivf_index_topk(spark, path, cents, qv, k=10).collect()}

    # append a synthetic batch including a vector equal to the query —
    # it must become the top hit via the same probes
    newbie = spark.createDataFrame(
        [(9001, [float(x) for x in qv], 0)],
        "vec_id long, embedding array<float>, label int")
    extra = emb.where(F.col("vec_id") > 400).unionByName(newbie)
    append_ivf_index(extra, path, cents)

    got = ivf_index_topk(spark, path, cents, qv, k=10).collect()
    assert got[0]["vec_id"] == 9001 and abs(got[0]["cosine_sim"] - 1.0) < 1e-6
    # previously-indexed hits are still served (no read-modify-write loss)
    assert before & {r["vec_id"] for r in got}
    # appended rows actually landed inside cell partition dirs
    import os as _os
    cells = [d for d in _os.listdir(path) if d.startswith("cell=")]
    assert cells


def test_ivfpq_index_append_lifecycle(spark, emb, tmp_path):
    """IVF-PQ append: a new batch encodes with the index's OWN persisted
    centroids/codebooks and appends into cell dirs; serving finds the
    appended vector through the same pruned codes-only scan, and a
    residual index refuses the raw-vector append."""
    import numpy as np

    from eventstorm_spark.extensions.similarity import (
        append_ivfpq_index, ivfpq_index_topk, write_ivfpq_index,
        write_ivfpq_residual_index,
    )
    from eventstorm_spark.inventory import _query_vec

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where((F.col("vec_id") != 0) & (F.col("vec_id") <= 400))
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(base, path)

    newbie = spark.createDataFrame(
        [(9001, [float(x) for x in qv], 0)],
        "vec_id long, embedding array<float>, label int")
    append_ivfpq_index(
        emb.where(F.col("vec_id") > 400).unionByName(newbie), path)

    got = ivfpq_index_topk(spark, path, qv, k=5, n_probe=4).collect()
    assert 9001 in {r["vec_id"] for r in got}  # appended vector served
    # codes-only at rest even after append
    cols = spark.read.parquet(f"{path}/codes").columns
    assert "embedding" not in cols and "pq_codes" in cols

    rpath = str(tmp_path / "ivfpq_res")
    write_ivfpq_residual_index(base, rpath)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="RESIDUAL"):
        append_ivfpq_index(newbie, rpath)


def test_ivfpq_residual_append_lifecycle(spark, emb, tmp_path):
    """Residual-index append: new batch residual-encodes with the
    persisted centroids/codebooks and is served through the bias+ADC
    rule; the plain index refuses it and it refuses the plain index."""
    from eventstorm_spark.extensions.similarity import (
        append_ivfpq_residual_index, ivfpq_residual_index_topk,
        write_ivfpq_index, write_ivfpq_residual_index,
    )
    from eventstorm_spark.inventory import _query_vec

    qv = _query_vec(spark, "/root/testdata/sf0.01")
    base = emb.where((F.col("vec_id") != 0) & (F.col("vec_id") <= 400))
    rpath = str(tmp_path / "res")
    write_ivfpq_residual_index(base, rpath)

    newbie = spark.createDataFrame(
        [(9001, [float(x) for x in qv], 0)],
        "vec_id long, embedding array<float>, label int")
    append_ivfpq_residual_index(newbie, rpath)
    got = ivfpq_residual_index_topk(spark, rpath, qv, k=5).collect()
    assert got[0]["vec_id"] == 9001  # query-equal vector tops the list

    import pytest as _pytest
    ppath = str(tmp_path / "plain")
    write_ivfpq_index(base, ppath)
    with _pytest.raises(ValueError, match="not a residual"):
        append_ivfpq_residual_index(newbie, ppath)


def test_token_balanced_shards_beats_hash_on_load_balance(spark, docs):
    """Size-aware dealing balances per-shard TOKEN loads far tighter
    than the salted-hash router, is a total assignment (every doc,
    exactly one shard), deterministic, and never compiles an
    Exchange SinglePartition (two-phase global rank)."""
    from eventstorm_spark.extensions.curation import assign_shards
    from eventstorm_spark.extensions.pipeline import token_balanced_shards
    from eventstorm_spark.extensions.text import token_count

    out = token_balanced_shards(docs, n_shards=8)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert {r.shard for r in rows} == set(range(8))

    def spread(frame, shard_col):
        loads = (frame.groupBy(shard_col)
                 .agg(F.sum("n_tokens").alias("t")).collect())
        ts = sorted(r["t"] for r in loads)
        return ts[-1] - ts[0]

    balanced_gap = spread(out, "shard")
    hashed = (assign_shards(docs, n_shards=8)
              .select("shard", token_count(F.col("text")).alias("n_tokens")))
    hashed_gap = spread(hashed, "shard")
    assert balanced_gap * 3 < hashed_gap, (balanced_gap, hashed_gap)

    again = {(r.doc_id, r.shard) for r in
             token_balanced_shards(docs, n_shards=8).collect()}
    assert again == {(r.doc_id, r.shard) for r in rows}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


# -- round 9: perceptual image hashing / audio features / source overlap --


def _ref_dhash(w, h, rgb, hash_w=8, hash_h=8):
    """Independent pure-Python dHash reference (no numpy)."""
    gray = [[sum(rgb[3 * (y * w + x) + k] for k in range(3)) // 3
             for x in range(w)] for y in range(h)]
    iy = [(y * h) // hash_h for y in range(hash_h)]
    ix = [(x * w) // (hash_w + 1) for x in range(hash_w + 1)]
    bits = []
    for y in iy:
        row = [gray[y][x] for x in ix]
        bits.extend(1 if row[x] > row[x + 1] else 0 for x in range(hash_w))
    half = hash_w * hash_h // 2
    hi = sum(b << i for i, b in enumerate(bits[:half]))
    lo = sum(b << i for i, b in enumerate(bits[half:]))
    return hi, lo


def test_image_dhash_matches_reference_and_is_codec_independent(spark):
    """Same raster through PPM and BMP payloads -> the same dHash as
    the independent pure-Python reference (the hash depends on pixels,
    never on the container format)."""
    w, h = 13, 9
    rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    assets = spark.createDataFrame(
        [(1, "image", multimodal.encode_ppm(w, h, rgb), None),
         (2, "image", multimodal.encode_bmp(w, h, rgb), None)],
        multimodal.ASSET_SCHEMA)
    rows = {r["asset_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in multimodal.image_dhash(assets).collect()}
    assert rows[1] == rows[2] == _ref_dhash(w, h, rgb)


def test_image_dhash_invariant_to_2x_nearest_upscale(spark):
    """dHash survives resizing: a 2x nearest-neighbor upscale samples
    back to the identical 9x8 grid ((x*2w)//9 // 2 == (x*w)//9), so the
    hash is bit-identical — the property that makes it a perceptual
    fingerprint rather than a byte hash."""
    w, h = 10, 7
    rgb = bytes((i * 53 + 5) % 256 for i in range(w * h * 3))
    up = multimodal.resize_rgb_nearest(w, h, rgb, 2 * w, 2 * h)
    assets = spark.createDataFrame(
        [(1, "image", multimodal.encode_ppm(w, h, rgb), None),
         (2, "image", multimodal.encode_ppm(2 * w, 2 * h, up), None)],
        multimodal.ASSET_SCHEMA)
    rows = {r["asset_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in multimodal.image_dhash(assets).collect()}
    assert rows[1] == rows[2]


def test_image_hamming_pairs_planted_near_dup(spark):
    """A near-identical image pairs with its original at a small
    Hamming distance; an unrelated pattern does not — and the banded
    join reproduces the brute-force pair set exactly at distance <= 3
    (pigeonhole: 4 bands, <4 differing bits)."""
    w, h = 16, 16
    base = [(x * 16 + y * 3) % 256 for y in range(h) for x in range(w)
            for _ in range(3)]
    tweaked = list(base)
    tweaked[3 * (5 * w + 5):3 * (5 * w + 5) + 3] = [255, 255, 255]
    noise = [(i * 101 + 7) % 256 for i in range(w * h * 3)]
    assets = spark.createDataFrame(
        [(1, "image", multimodal.encode_ppm(w, h, bytes(base)), None),
         (2, "image", multimodal.encode_ppm(w, h, bytes(tweaked)), None),
         (3, "image", multimodal.encode_ppm(w, h, bytes(noise)), None)],
        multimodal.ASSET_SCHEMA)
    hashes = multimodal.image_dhash(assets)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in multimodal.image_hamming_pairs(
               hashes, max_distance=3).collect()}
    assert set(got) == {(1, 2)}, got
    assert got[(1, 2)] <= 3
    # brute-force cross-check of the banded candidate generation
    hs = {r["asset_id"]: (r["dhash_hi"], r["dhash_lo"])
          for r in hashes.collect()}
    brute = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = (bin(hs[a][0] ^ hs[b][0]).count("1")
                 + bin(hs[a][1] ^ hs[b][1]).count("1"))
            if d <= 3:
                brute[(a, b)] = d
    assert got == brute


def test_image_hamming_pairs_hot_bucket_cap(spark):
    """max_bucket_size drops band buckets carried by too many images
    (the template-favicon adversary) — pairs vanish instead of the
    join going quadratic, mirroring the text LSH cap contract."""
    w, h = 8, 8
    rgb = bytes((i * 29 + 3) % 256 for i in range(w * h * 3))
    assets = spark.createDataFrame(
        [(i, "image", multimodal.encode_ppm(w, h, rgb), None)
         for i in range(6)],
        multimodal.ASSET_SCHEMA)
    hashes = multimodal.image_dhash(assets)
    full = multimodal.image_hamming_pairs(hashes, max_distance=0).collect()
    assert len(full) == 15  # 6 identical images -> C(6,2)
    capped = multimodal.image_hamming_pairs(
        hashes, max_distance=0, max_bucket_size=3).collect()
    assert capped == []


def test_audio_features_reference_values(spark):
    """Hand-computed RMS / zero-crossing-rate on a 4-sample PCM16 clip,
    plus the mu-law payload path through the same operator."""
    import math

    wav = multimodal.encode_wav_pcm16([10, -20, 30, -40], 8000)
    ulaw_wav = multimodal.encode_wav_mulaw(bytes([0xFF, 0x00]), 8000)
    assets = spark.createDataFrame(
        [(1, "audio", wav, None), (2, "audio", ulaw_wav, None)],
        multimodal.ASSET_SCHEMA)
    rows = {r["asset_id"]: r for r in
            multimodal.audio_features(assets).collect()}
    r = rows[1]
    assert r["n_samples"] == 4 and r["sample_rate"] == 8000
    assert r["rms"] == round(math.sqrt((100 + 400 + 900 + 1600) / 4), 6)
    assert r["zero_cross_rate"] == 1.0  # +,-,+,- : every adjacent pair flips
    # mu-law: 0xFF decodes to 0, 0x00 to -32124 -> one flip over one pair
    r2 = rows[2]
    assert r2["n_samples"] == 2
    assert r2["zero_cross_rate"] == 1.0
    assert r2["rms"] == round(math.sqrt(32124 ** 2 / 2), 6)


def test_source_ngram_overlap_hand_computed(spark):
    """Two sources sharing one trigram out of hand-countable sets, a
    third sharing nothing; hash_join and string-join forms agree."""
    rows = [
        (1, "a b c d", "s1"),   # shingles: {a b c, b c d}
        (2, "a b c e", "s2"),   # shingles: {a b c, b c e}
        (3, "x y z", "s3"),     # shingles: {x y z}
        (4, "b c e f", "s2"),   # adds {b c e, c e f} -> s2 set size 3
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    for hj in (True, False):
        got = {(r["source_a"], r["source_b"]):
               (r["n_common"], r["jaccard"])
               for r in dedup.source_ngram_overlap(
                   docs, hash_join=hj).collect()}
        # s1={abc,bcd} (2), s2={abc,bce,cef} (3), common={abc} (1)
        assert got == {("s1", "s2"): (1, round(1 / (2 + 3 - 1), 6))}


def test_source_ngram_overlap_prehashed_matches(spark):
    """The prehashed serving form (round 17: one distinct-hash pass
    shared with the KMV sketch in q_kmv_source_overlap) must yield the
    same matrix as re-shingling the docs, for any injective hash of the
    distinct shingle sets."""
    from pyspark.sql import functions as F

    from eventstorm_spark.extensions.dedup import _shingle_rows_raw
    from eventstorm_spark.extensions.sketches import _hash60

    rows = [
        (1, "a b c d", "s1"),
        (2, "a b c e", "s2"),
        (3, "x y z", "s3"),
        (4, "b c e f", "s2"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sh = _shingle_rows_raw(docs, 3, "text", "doc_id",
                           keep_cols=("source",))
    hashed = (sh.select("source",
                        _hash60(F.col("shingle").cast("string"),
                                True).alias("__h"))
              .distinct())
    key = lambda r: (r["source_a"], r["source_b"])
    want = {key(r): (r["n_common"], r["jaccard"])
            for r in dedup.source_ngram_overlap(docs).collect()}
    got = {key(r): (r["n_common"], r["jaccard"])
           for r in dedup.source_ngram_overlap(
               docs, prehashed=hashed).collect()}
    assert got == want == {("s1", "s2"): (1, round(1 / 4, 6))}


def test_real_featurize_covers_all_stdlib_codecs(spark):
    """decode_and_featurize(fake=False) now dispatches every stdlib
    codec: BMP, JPEG (flat gray, exact at q100) and GIF rasters plus
    mu-law audio — the same feature layout as the original PPM/WAV
    paths."""
    w, h = 6, 4
    rgb = bytes((i * 11 + 2) % 256 for i in range(w * h * 3))
    flat = bytes([77]) * (w * h * 3)
    pal = bytes(v for i in range(256)
                for v in ((i * 3) % 256, (i * 5 + 1) % 256, (i * 7 + 2) % 256))
    idx = bytes((k * 13) % 32 for k in range(w * h))
    assets = spark.createDataFrame(
        [(1, "image", multimodal.encode_bmp(w, h, rgb), None),
         (2, "image", multimodal.encode_jpeg(w, h, flat), None),
         (3, "image", multimodal.encode_gif(w, h, idx, pal), None),
         (4, "audio", multimodal.encode_wav_mulaw(bytes([0xFF, 0x00]), 8000),
          None)],
        multimodal.ASSET_SCHEMA)
    rows = {r["asset_id"]: r["features"] for r in
            multimodal.decode_and_featurize(assets, fake=False).collect()}
    assert rows[1][:4] == [float(w), float(h), 3.0, float(w * h)]
    assert rows[1][4] == sum(rgb[0::3]) / (w * h)
    assert rows[2][4:7] == [77.0, 77.0, 77.0]  # q100 flat gray is exact
    gif_rgb = [pal[3 * i + c] for i in idx for c in range(3)]
    assert rows[3][4] == sum(gif_rgb[0::3]) / (w * h)
    assert rows[4][:2] == [8000.0, 1.0]
    assert rows[4][5] == 32124 / 2  # mean_abs of {0, -32124}


def test_image_dhash_gif_payload_matches_rgb_twin(spark):
    """A GIF payload dHashes identically to the same raster as PPM —
    the sniffer's GIF branch feeds the shared pipeline."""
    pal = bytes(v for i in range(256)
                for v in ((i * 3) % 256, (i * 5 + 1) % 256, (i * 7 + 2) % 256))
    w, h = 14, 16
    idx = bytes((k * 13) % 32 for k in range(w * h))
    rgb = bytes(pal[3 * i + c] for i in idx for c in range(3))
    assets = spark.createDataFrame(
        [(1, "image", multimodal.encode_gif(w, h, idx, pal), None),
         (2, "image", multimodal.encode_ppm(w, h, rgb), None)],
        multimodal.ASSET_SCHEMA)
    rows = {r["asset_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in multimodal.image_dhash(assets).collect()}
    assert rows[1] == rows[2]


def test_image_hamming_pairs_scale_mode_fills_cap(spark):
    """scale=True fills SCALE_MAX_BAND_BUCKET when no explicit cap was
    chosen; an explicit cap wins — the same resolution contract as the
    substring family's scale flag."""
    w, h = 8, 8
    rgb = bytes((i * 29 + 3) % 256 for i in range(w * h * 3))
    n = multimodal.SCALE_MAX_BAND_BUCKET + 4
    assets = spark.createDataFrame(
        [(i, "image", multimodal.encode_ppm(w, h, rgb), None)
         for i in range(n)],
        multimodal.ASSET_SCHEMA)
    hashes = multimodal.image_dhash(assets).localCheckpoint()
    # n identical images: every band bucket holds n > the scale cap
    assert multimodal.image_hamming_pairs(
        hashes, max_distance=0, scale=True).collect() == []
    # explicit cap beats the scale default
    got = multimodal.image_hamming_pairs(
        hashes, max_distance=0, scale=True,
        max_bucket_size=n).count()
    assert got == n * (n - 1) // 2


def test_audio_fingerprint_reference_and_codec_independence(spark):
    """The energy-envelope hash matches an independent reference and is
    container-independent: the same samples through PCM16 and mu-law
    (encoding the mu-law-decoded values, so both decode identically)
    fingerprint alike; a planted near-identical clip pairs with the
    original through the SAME Hamming join images use, an unrelated
    clip does not."""
    import random

    rng = random.Random(7)
    n = 130
    ulaw = bytes(rng.randrange(256) for _ in range(n))
    lin = [multimodal.mulaw_to_linear(b) for b in ulaw]
    # independent pure-Python reference on the decoded samples: sample
    # i belongs to window (i*65)//n
    energy = [0] * 65
    for i, s in enumerate(lin):
        energy[(i * 65) // n] += abs(s)
    bits = [1 if energy[w] > energy[w + 1] else 0 for w in range(64)]
    ref = (sum(b << i for i, b in enumerate(bits[:32])),
           sum(b << i for i, b in enumerate(bits[32:])))

    tweaked = list(lin)
    tweaked[0] += 25  # tiny local edit: at most a few envelope bits flip
    noise = [((i * 9973) % 65536) - 32768 for i in range(n)]
    assets = spark.createDataFrame(
        [(1, "audio", multimodal.encode_wav_mulaw(ulaw, 8000), None),
         (2, "audio", multimodal.encode_wav_pcm16(lin, 8000), None),
         (3, "audio", multimodal.encode_wav_pcm16(tweaked, 8000), None),
         (4, "audio", multimodal.encode_wav_pcm16(noise, 8000), None)],
        multimodal.ASSET_SCHEMA)
    fp = multimodal.audio_fingerprint(assets).localCheckpoint()
    rows = {r["asset_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in fp.collect()}
    assert rows[1] == rows[2] == ref
    got = {(r["id_a"], r["id_b"]) for r in
           multimodal.hamming_pairs(fp, max_distance=3).collect()}
    assert (1, 2) in got and (2, 3) in got
    assert not any(4 in p for p in got)


def test_audio_fingerprint_short_clip_raises(spark):
    assets = spark.createDataFrame(
        [(1, "audio", multimodal.encode_wav_pcm16([5] * 10, 8000), None)],
        multimodal.ASSET_SCHEMA)
    import pytest as _pytest
    with _pytest.raises(Exception, match="shorter than"):
        multimodal.audio_fingerprint(assets).collect()


def test_mjpeg_split_and_sampled_decode(spark):
    """MJPEG streams split on a real T.81 segment walk (a rich-content
    frame's entropy bytes and headers must not fool the boundary scan)
    and sample_video_frames decodes exactly the every_n-th frames —
    flat q100 frames bit-exactly, rich frames within JPEG tolerance."""
    rich = bytes((i * 31 + 7) % 256 for i in range(12 * 10 * 3))
    frames = [
        (12, 10, rich),                      # frame 0: rich content
        (9, 6, bytes([50]) * (9 * 6 * 3)),   # frame 1: flat
        (11, 8, bytes([200]) * (11 * 8 * 3)),  # frame 2: flat
    ]
    stream = multimodal.encode_mjpeg(frames, quality=100)
    split = multimodal.mjpeg_frames(stream)
    assert len(split) == 3 and b"".join(split) == stream
    for (w, h, _), fr in zip(frames, split):
        dw, dh, _ = multimodal._jpeg_rgb(fr)
        assert (dw, dh) == (w, h)

    assets = spark.createDataFrame(
        [(1, "video", stream, None)], multimodal.ASSET_SCHEMA)
    rows = {r["frame_no"]: r for r in
            multimodal.sample_video_frames(assets, every_n=2).collect()}
    assert set(rows) == {0, 2}  # frame 1 split but never decoded
    assert (rows[0]["width"], rows[0]["height"]) == (12, 10)
    assert rows[2]["mean_r"] == 200.0  # flat q100 is exact
    all_rows = multimodal.sample_video_frames(assets, every_n=1).collect()
    assert [r["frame_no"] for r in
            sorted(all_rows, key=lambda r: r["frame_no"])] == [0, 1, 2]
    # rich frame decodes within lossy tolerance of the true means
    true_mean_r = sum(rich[0::3]) / (12 * 10)
    assert abs(rows[0]["mean_r"] - true_mean_r) < 3.0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="JPEG"):
        multimodal.mjpeg_frames(b"\xff\xd8garbage")


def test_video_near_duplicates_by_shared_frames(spark):
    """Two clips sharing re-encoded frames pair at the clip level; a
    disjoint clip does not — and the within-clip duplicate frame only
    counts once toward n_shared."""
    def grad(seed, w=16, h=12):
        return bytes(((i // 3) * seed + i % 3) % 256
                     for i in range(w * h * 3))

    f1, f2, f3, f4 = grad(7), grad(31), grad(64), grad(131)
    clip_a = multimodal.encode_mjpeg(
        [(16, 12, f1), (16, 12, f2), (16, 12, f3)], quality=100)
    # clip B: shares f1/f2 (one repeated), own tail frame
    clip_b = multimodal.encode_mjpeg(
        [(16, 12, f1), (16, 12, f1), (16, 12, f2), (16, 12, f4)],
        quality=100)
    # clip C: disjoint content
    clip_c = multimodal.encode_mjpeg(
        [(16, 12, grad(201)), (16, 12, grad(227))], quality=100)
    assets = spark.createDataFrame(
        [(1, "video", clip_a, None), (2, "video", clip_b, None),
         (3, "video", clip_c, None)], multimodal.ASSET_SCHEMA)
    hashes = multimodal.video_frame_dhash(assets).localCheckpoint()
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in
           multimodal.video_near_duplicates(hashes, min_shared=2).collect()}
    assert set(got) == {(1, 2)}, got
    assert got[(1, 2)] == 2  # f1 counted once despite B repeating it
    # every_n sampling bounds decode: only frames 0,2,... hashed
    sampled = multimodal.video_frame_dhash(assets, every_n=2).collect()
    assert {r["frame_no"] for r in sampled if r["asset_id"] == 2} == {0, 2}


def test_train_linear_quality_learns_separable_labels(spark):
    """On a genuinely separable corpus (label-1 docs are stopword-rich
    prose, label-0 docs are punctuation-heavy shouting), the trained
    model must recover the separation: positive stopword weight,
    negative punct/upper weights, and >= 95% training accuracy when the
    returned raw-space (weights, bias) plug straight into
    linear_quality_score."""
    from eventstorm_spark.extensions.text import (
        linear_quality_score, train_linear_quality,
    )
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append((i, "the cat sat of the mat and it is a fine day "
                            "to walk in the park with a friend", 1))
        else:
            rows.append((i, "BUY!!! NOW!!! CHEAP,,, DEALS;;; CLICK:: "
                            "HERE??? WOW!!! SALE!!!", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    labels = docs.select("doc_id", "label")
    w, b = train_linear_quality(docs, labels, iters=20, lr=1.0)
    assert w["stopword_distinct_ratio"] > 0
    assert w["punct_ratio"] < 0
    assert w["upper_ratio"] < 0
    scored = linear_quality_score(docs, weights=w, bias=b)
    acc = (scored.join(labels, "doc_id")
           .where(F.col("kept") == F.col("label")).count()) / 120
    assert acc >= 0.95, acc


def test_train_linear_quality_zero_variance_feature_inert(spark):
    """A constant feature must train to exactly weight 0.0 (the
    stddev floor keeps its standardized values and gradient at zero)
    rather than exploding by division with a near-zero stddev."""
    from eventstorm_spark.extensions.text import train_linear_quality
    rows = [(i, "plain words only here", i % 2) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_linear_quality(docs, labels=docs.select("doc_id", "label"),
                                iters=5)
    # every feature is constant across this corpus -> all weights 0
    assert all(v == 0.0 for v in w.values()), w


def test_keep_best_near_duplicates_picks_argmax_not_min_id(spark):
    """Within a duplicate cluster the highest-score member survives
    (ties break to min id) — verified against drop_near_duplicates,
    which would keep the min id instead; singletons always survive."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id long, score long")
    # cluster {1,2,3} via transitive pairs; {4} and {9} singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = dedup.keep_best_near_duplicates(docs, pairs, score_col="score")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 4, 9]
    # keep-first would have kept 1 — different survivor, same count
    first = dedup.drop_near_duplicates(docs, pairs)
    assert sorted(r.doc_id for r in first.collect()) == [1, 4, 9]


def test_hybrid_retrieval_served_entirely_from_indexes(spark, emb, tmp_path):
    """The whole hybrid retrieval stack can serve from at-rest indexes:
    RRF over (bm25_against_index, ivf_index_topk) equals RRF over the
    in-memory retrievers given the same corpus and centroids — neither
    leg re-reads corpus text or raw embeddings outside its index."""
    from eventstorm_spark.extensions.curation import (
        bm25_against_index, write_bm25_index,
    )
    from eventstorm_spark.extensions.similarity import (
        ivf_index_topk, ivf_topk, rrf_fuse, write_ivf_index,
    )
    from eventstorm_spark.extensions.text import bm25_top_docs
    from eventstorm_spark.inventory import _query_vec

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qv = _query_vec(spark, "/root/testdata/sf0.001")
    base = emb.where(F.col("vec_id") != 0)
    terms = ["spark", "merge", "window"]

    bpath = str(tmp_path / "bm25")
    write_bm25_index(docs, bpath, n_buckets=16)
    vpath = str(tmp_path / "ivf")
    cents = write_ivf_index(base, vpath)

    def fuse(bm, ann):
        return [(r.id, r.rrf_score) for r in
                rrf_fuse([bm.select("doc_id", "bm25"),
                          ann.select("vec_id", "cosine_sim")],
                         out_k=10).collect()]

    served = fuse(bm25_against_index(spark, bpath, terms, k=20, n_buckets=16),
                  ivf_index_topk(spark, vpath, cents, qv, k=20))
    memory = fuse(bm25_top_docs(docs, terms, k=20),
                  ivf_topk(base, qv, k=20, centroids=cents))
    assert served == memory and len(served) == 10


def test_image_phash_matches_direct_dct_reference(spark):
    """pHash bits must equal an independent naive double-loop DCT-II
    reference (explicit cosine sums, no shared code with the matrix
    form) on a deterministic random image."""
    import math

    import numpy as np

    rng = np.random.default_rng(7)
    w, h = 40, 30
    rgb = bytes(rng.integers(0, 256, size=w * h * 3, dtype=np.uint8))
    assets = spark.createDataFrame(
        [(1, "image", multimodal.encode_ppm(w, h, rgb), None)],
        multimodal.ASSET_SCHEMA)
    row = multimodal.image_phash(assets).collect()[0]

    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    gray = (arr[:, :, 0].astype(np.float64) + arr[:, :, 1] + arr[:, :, 2]) / 3
    iy = [(y * h) // 32 for y in range(32)]
    ix = [(x * w) // 32 for x in range(32)]
    small = [[gray[yy][xx] for xx in ix] for yy in iy]
    n = 32

    def dct2(u, v):  # naive O(n^2) per coefficient
        s = 0.0
        for y in range(n):
            for x in range(n):
                s += (small[y][x]
                      * math.cos(math.pi * (2 * y + 1) * u / (2 * n))
                      * math.cos(math.pi * (2 * x + 1) * v / (2 * n)))
        cu = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
        cv = math.sqrt(1.0 / n) if v == 0 else math.sqrt(2.0 / n)
        return cu * cv * s

    block = [dct2(u, v) for u in range(8) for v in range(8)]
    med = float(np.median(block[1:]))
    bits = [b > med for b in block]
    hi = sum(1 << i for i in range(32) if bits[i])
    lo = sum(1 << (i - 32) for i in range(32, 64) if bits[i])
    assert (row.dhash_hi, row.dhash_lo) == (hi, lo)


def test_image_phash_invariances_and_machinery(spark):
    """pHash is bit-stable under uniform brightness and contrast
    changes (affine transforms leave the AC-vs-median ordering alone)
    and under 2x nearest upscaling; distinct content stays distant;
    and the rows feed the shared Hamming pair machinery unchanged."""
    import numpy as np

    rng = np.random.default_rng(11)
    w, h = 32, 32
    base = rng.integers(30, 180, size=(h, w), dtype=np.uint8)
    def ppm(gray):
        rgb = np.repeat(gray.astype(np.uint8).ravel(), 3).tobytes()
        return multimodal.encode_ppm(gray.shape[1], gray.shape[0], rgb)

    brighter = np.clip(base.astype(np.int32) + 40, 0, 255)
    contrast = np.clip(base.astype(np.float64) * 1.3, 0, 255).astype(int)
    up = np.kron(base, np.ones((2, 2), dtype=np.uint8))  # 2x nearest
    other = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assets = spark.createDataFrame(
        [(1, "image", ppm(base), None), (2, "image", ppm(brighter), None),
         (3, "image", ppm(contrast), None), (4, "image", ppm(up), None),
         (5, "image", ppm(other), None)], multimodal.ASSET_SCHEMA)
    rows = {r.asset_id: (r.dhash_hi, r.dhash_lo)
            for r in multimodal.image_phash(assets).collect()}

    def ham(a, b):
        return (bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1"))

    assert ham(rows[1], rows[2]) <= 1   # brightness: only the DC bit may move
    assert ham(rows[1], rows[3]) <= 1   # contrast
    assert ham(rows[1], rows[4]) <= 1   # 2x nearest upscale
    assert ham(rows[1], rows[5]) > 10   # different content stays distant

    pairs = {(r.id_a, r.id_b)
             for r in multimodal.image_hamming_pairs(
                 multimodal.image_phash(assets), max_distance=3).collect()}
    assert (1, 2) in pairs and (1, 5) not in pairs


def test_edit_distance_pairs_typos_and_stop_shingle_cut(spark):
    """Levenshtein near-dup: a one-word edit of a 10-word doc scores
    ~0.9+ and pairs; an order-scramble keeps Jaccard=1.0 but drops the
    edit similarity (the char-level score is order-sensitive); the
    stop-shingle cut removes candidates blocked only by a boilerplate
    shingle."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    typo = base.replace("epsilon", "epsilom")
    scrambled = " ".join(reversed(base.split()))
    docs = spark.createDataFrame(
        [(1, base), (2, typo), (3, scrambled)], "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.edit_sim
           for r in dedup.edit_distance_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert (1, 3) not in got  # same shingle-free words, different order

    # boilerplate shingle shared by everyone: the df cut removes the
    # candidate pairs it alone created
    boiler = [(i, f"unique{i} words{i} here{i} the same boilerplate run")
              for i in range(10, 16)]
    bdocs = spark.createDataFrame(boiler, "doc_id long, text string")
    uncapped = dedup.edit_distance_pairs(bdocs, threshold=0.0)
    capped = dedup.edit_distance_pairs(bdocs, threshold=0.0,
                                       max_shingle_df=2)
    assert uncapped.count() > 0 and capped.count() == 0


# ---------------------------------------------------------------------------
# KMV distinct sketch + exact heavy hitters
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k_and_estimate_above(spark):
    from eventstorm_spark.extensions import sketches
    df = spark.createDataFrame(
        [("a", f"v{i % 10}") for i in range(100)]
        + [("b", f"w{i}") for i in range(500)], ["g", "v"])
    est = {r.g: r.n_distinct_est for r in
           sketches.kmv_estimate(
               sketches.kmv_sketch(df, "v", k=64, group_cols=["g"]), k=64)
           .collect()}
    assert est["a"] == 10.0              # below k: exact
    assert abs(est["b"] - 500) / 500 < 0.35  # KMV estimate, k=64 (~13% MRE)


def test_kmv_merge_equals_single_build(spark):
    from eventstorm_spark.extensions import sketches
    df = spark.createDataFrame([("g", f"v{i}") for i in range(300)],
                               ["g", "v"])
    whole = sketches.kmv_sketch(df, "v", k=32, group_cols=["g"])
    halves = (sketches.kmv_sketch(df.where(F.xxhash64("v") % 2 == 0), "v",
                                  k=32, group_cols=["g"])
              .unionByName(
                  sketches.kmv_sketch(df.where(F.xxhash64("v") % 2 != 0),
                                      "v", k=32, group_cols=["g"])))
    merged = sketches.kmv_merge(halves, k=32, group_cols=["g"])
    assert merged.collect()[0].sketch == whole.collect()[0].sketch


def test_kmv_pairwise_overlap_exact_below_k(spark):
    """When the union fits inside k the set-op estimates are EXACT:
    L is the whole union, m the true intersection size."""
    from eventstorm_spark.extensions import sketches
    # a = {v0..v99}, b = {v60..v159}: union 160, intersection 40
    df = spark.createDataFrame(
        [("a", f"v{i:03d}") for i in range(100)]
        + [("b", f"v{i:03d}") for i in range(60, 160)], ["g", "v"])
    sk = sketches.kmv_sketch(df, "v", k=256, group_cols=["g"])
    row = sketches.kmv_pairwise_overlap(sk, "g", k=256).collect()[0]
    assert (row.grp_a, row.grp_b) == ("a", "b")
    assert row.m == 40
    assert row.n_union_est == 160.0
    assert row.jaccard_est == round(40 / 160, 6)
    assert row.n_intersect_est == 40.0


def test_kmv_pairwise_overlap_estimates_above_k(spark):
    """Above k the Jaccard estimate tracks the truth (~1/sqrt(k) MRE)
    and disjoint sets report zero intersection."""
    from eventstorm_spark.extensions import sketches
    df = spark.createDataFrame(
        [("a", f"v{i:04d}") for i in range(1000)]
        + [("b", f"v{i:04d}") for i in range(500, 1500)]
        + [("c", f"w{i:04d}") for i in range(1000)], ["g", "v"])
    sk = sketches.kmv_sketch(df, "v", k=128, group_cols=["g"])
    rows = {(r.grp_a, r.grp_b): r
            for r in sketches.kmv_pairwise_overlap(sk, "g", k=128).collect()}
    ab = rows[("a", "b")]
    # truth: union 1500, intersection 500, jaccard 1/3
    assert abs(ab.jaccard_est - 1 / 3) < 0.15
    assert abs(ab.n_union_est - 1500) / 1500 < 0.35
    assert rows[("a", "c")].m == 0
    assert rows[("a", "c")].n_intersect_est == 0.0


def test_heavy_hitters_exact_and_partitioning_independent(spark):
    from eventstorm_spark.extensions import sketches
    # 1000 rows: "hot" x 300, "warm" x 100, tail of singletons
    rows = (["hot"] * 300 + ["warm"] * 100
            + [f"tail{i}" for i in range(600)])
    for nparts in (1, 7):
        df = spark.createDataFrame([(v,) for v in rows], ["v"]) \
                  .repartition(nparts)
        got = {r.value: (r.n, r.share) for r in
               sketches.heavy_hitters(df, "v", threshold=0.05).collect()}
        assert got == {"hot": (300, 0.3), "warm": (100, 0.1)}


def test_heavy_hitters_mg_batch_merge_keeps_superset(spark):
    from eventstorm_spark.extensions import sketches
    # tiny capacity forces constant pruning; output must stay exact
    rows = ["hh"] * 50 + [f"t{i}" for i in range(450)]
    df = spark.createDataFrame([(v,) for v in rows], ["v"]).repartition(3)
    got = sketches.heavy_hitters(df, "v", threshold=0.09,
                                 capacity=25).collect()
    assert [(r.value, r.n) for r in got] == [("hh", 50)]


def test_mine_triplets_semantics(spark):
    from eventstorm_spark.extensions.similarity import mine_triplets
    # two tight clusters by label; anchor 1's positive is its nearest
    # same-label vector, hard negative the closest cross-label one
    rows = [
        (1, [1.0, 0.0, 0.0], "a"),
        (2, [0.9, 0.1, 0.0], "a"),
        (3, [0.0, 1.0, 0.0], "b"),
        (4, [0.1, 0.9, 0.0], "b"),
        (5, [0.7, 0.7, 0.0], "b"),  # the hard negative for label a
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {r.anchor: r for r in
           mine_triplets(emb, num_planes=8, bands=8).collect()}
    assert got[1].pos_id == 2
    assert got[1].neg_id == 5  # closer than 3/4 in cosine
    assert got[1].margin == round(got[1].pos_sim - got[1].neg_sim, 6)
    # anchors keep only genuinely-hard negatives: every present row
    # must be cross-label
    labels = {r[0]: r[2] for r in rows}
    for a, r in got.items():
        assert labels[a] != labels[r.neg_id]
        assert labels[a] == labels[r.pos_id]


def test_weighted_sample_proportional_and_deterministic(spark):
    from eventstorm_spark.extensions.pipeline import weighted_sample
    # one group: heavy docs (w=100) vs light (w=1), sample 50 of 400.
    rows = [(i, "g", 100 if i < 100 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = weighted_sample(df, k=50, group_cols=("source",)).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r.doc_id < 100)
    # heavy ids are 1/4 of rows but 100x weight: they must dominate
    assert heavy > 35
    # deterministic under repartitioning
    again = weighted_sample(df.repartition(7), k=50,
                            group_cols=("source",)).collect()
    assert {r.doc_id for r in got} == {r.doc_id for r in again}
    # zero/negative weights are excluded
    z = spark.createDataFrame([(1, "g", 0), (2, "g", 5)],
                              ["doc_id", "source", "n_chars"])
    kept = weighted_sample(z, k=10, group_cols=("source",)).collect()
    assert [r.doc_id for r in kept] == [2]


def test_hdr_histogram_merge_and_quantile_bounds(spark):
    from eventstorm_spark.extensions.sketches import (hdr_histogram,
                                                      hdr_merge,
                                                      hdr_quantiles)
    import math
    vals = [float(i) for i in range(1, 1001)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    hist = hdr_histogram(df, "v", sig_digits=2)
    # merge of two halves == one build (counts sum per bucket)
    h1 = hdr_histogram(df.where(F.col("v") <= 500), "v", sig_digits=2)
    h2 = hdr_histogram(df.where(F.col("v") > 500), "v", sig_digits=2)
    merged = hdr_merge(h1.unionByName(h2))
    assert {(r.exp, r.mant, r.n) for r in merged.collect()} == \
        {(r.exp, r.mant, r.n) for r in hist.collect()}
    # quantile estimates within the bucket's relative-error bound
    got = {r.q: r.value_est
           for r in hdr_quantiles(hist, [0.5, 0.99],
                                  sig_digits=2).collect()}
    for q, true in ((0.5, 500.0), (0.99, 990.0)):
        assert abs(got[q] - true) / true < 0.02  # ~10^-2 + bucket edge


def test_hdr_exponent_exact_at_powers_of_two(spark):
    from eventstorm_spark.extensions.sketches import hdr_histogram
    df = spark.createDataFrame(
        [(float(2 ** k),) for k in range(-3, 11)], ["v"])
    rows = hdr_histogram(df, "v", sig_digits=2).collect()
    # every exact power of two must land at (exp=k, mant=100)
    assert {(r.exp, r.mant) for r in rows} == \
        {(k, 100) for k in range(-3, 11)}


def test_hdr_nonpositive_underflow_bucket(spark):
    from eventstorm_spark.extensions.sketches import hdr_histogram
    df = spark.createDataFrame([(0.0,), (-5.0,), (3.0,)], ["v"])
    rows = {(r.exp, r.mant): r.n
            for r in hdr_histogram(df, "v", sig_digits=2).collect()}
    assert rows[(-(1 << 31), 0)] == 2


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("portable", [True, False])
def test_cdc_chunks_tile_and_resync(spark, portable):
    """Chunks tile each doc exactly, and an edit near the start leaves
    the post-edit chunks identical (boundary re-synchronization — the
    property fixed-size blocking lacks and the whole reason CDC
    exists). Runs in BOTH modes: portable (md5-substring explode,
    oracle-replayable) and production (Arrow-batched Rabin rolling
    hash) — the boundaries differ across modes but the CDC contract
    must hold in each."""
    from eventstorm_spark.extensions.text import cdc_chunks
    body = "the quick brown fox jumps over the lazy dog " * 30
    docs = spark.createDataFrame(
        [(1, body), (2, "EDITED PREAMBLE >>> " + body),
         (3, "tiny"), (4, "")], ["doc_id", "text"])
    rows = cdc_chunks(docs, window=16, divisor=32,
                      portable=portable).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    d2 = sorted(by_doc[2], key=lambda r: r.chunk_idx)
    # tiling: contiguous, complete, 1-indexed
    assert d1[0].chunk_start == 0
    assert sum(r.chunk_len for r in d1) == len(body)
    assert len(d1) > 5  # the divisor actually cuts (not one blob)
    for a, b in zip(d1, d1[1:]):
        assert b.chunk_start == a.chunk_start + a.chunk_len
        assert b.chunk_idx == a.chunk_idx + 1
    # resync: after the edited head, the chunk streams realign — the
    # tails are identical and only the head chunk is unique to d1
    h1 = [r.chunk_hash for r in d1]
    h2 = [r.chunk_hash for r in d2]
    assert h1[-5:] == h2[-5:]
    assert len(set(h1) - set(h2)) <= 1
    # short doc = single whole-text chunk; empty doc = no chunks
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[3]] == [(0, 4)]
    assert 4 not in by_doc
    # deterministic under repartitioning
    again = {(r.doc_id, r.chunk_idx, r.chunk_hash)
             for r in cdc_chunks(docs.repartition(5), window=16,
                                 divisor=32, portable=portable).collect()}
    assert again == {(r.doc_id, r.chunk_idx, r.chunk_hash) for r in rows}


@pytest.mark.parametrize("portable", [True, False])
def test_cdc_chunks_non_identifier_columns(spark, portable):
    """Production (gear/rolling) mode iterates rows positionally and
    backtick-quotes its DDL schema, so id/keep columns that aren't
    valid Python identifiers (spaces, namedtuple collisions) behave
    exactly like portable mode."""
    from eventstorm_spark.extensions.text import cdc_chunks
    body = "the quick brown fox jumps over the lazy dog " * 30
    docs = spark.createDataFrame(
        [(10, "s1", body), (11, "s2", "tiny")],
        ["chunk id", "count", "text"])
    rows = cdc_chunks(docs, window=16, divisor=32, portable=portable,
                      id_col="chunk id", keep_cols=("count",)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["chunk id"], []).append(r)
    assert sum(r.chunk_len for r in by_doc[10]) == len(body)
    assert len(by_doc[10]) > 5
    assert all(r["count"] == "s1" for r in by_doc[10])
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[11]] == [(0, 4)]


def test_mad_outlier_report_resists_masking(spark):
    """One huge outlier inflates mean/sigma enough to mask a second,
    smaller one from the z-score sweep; median/MAD flags both."""
    from eventstorm_spark.extensions import sketches
    base = [("a", float(v)) for v in range(100)]  # 0..99, MAD = 25
    data = base + [("a", 1e6), ("a", 500.0)]
    df = spark.createDataFrame(data, ["g", "v"])
    r = sketches.mad_outlier_report(df, "v", group_cols=["g"]).collect()[0]
    assert r.med == 50.5 and r.mad == 25.5
    assert r.n == 102 and r.n_outliers == 2   # both flagged
    assert r.outlier_frac == round(2 / 102, 6)
    # z-score with the 1e6 point present: sigma ~ 1e5, so 500 has
    # z << 1 — the masking failure the robust sweep avoids
    import statistics
    vals = [v for _, v in data]
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert abs(500.0 - mu) / sd < 1
    # constant group: mad == 0 -> no flags, NULL max_score
    const = spark.createDataFrame([("c", 7.0)] * 10, ["g", "v"])
    rc = sketches.mad_outlier_report(const, "v",
                                     group_cols=["g"]).collect()[0]
    assert rc.mad == 0.0 and rc.n_outliers == 0 and rc.max_score is None


def test_phrase_search_adjacency_and_order(spark):
    from eventstorm_spark.extensions.text import phrase_search
    docs = spark.createDataFrame([
        (1, "big data big data big"),       # "big data" twice
        (2, "data big"),                    # reversed: no match
        (3, "big x data"),                  # gap: no match
        (4, "big data"),                    # once, at 0
    ], ["doc_id", "text"])
    got = {r.doc: (r.n_matches, r.first_pos)
           for r in phrase_search(docs, ["big", "data"]).collect()}
    assert got == {1: (2, 0), 4: (1, 0)}
    # three-term phrase spans the pair matches
    got3 = {r.doc: (r.n_matches, r.first_pos)
            for r in phrase_search(docs, ["big", "data", "big"]).collect()}
    assert got3 == {1: (2, 0)}
    with pytest.raises(ValueError):
        phrase_search(docs, [])


def test_pmi_pairs_surfaces_planted_collocation(spark):
    from eventstorm_spark.extensions.text import pmi_pairs
    # "foo bar" always co-occur (10/20 docs); filler varies independently
    fillers = ["aa bb", "aa cc", "bb cc", "cc dd", "dd aa"]
    rows = [(i, "foo bar " + fillers[i % 5]) for i in range(10)] + \
           [(10 + i, fillers[i % 5] + " " + fillers[(i + 2) % 5])
            for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = pmi_pairs(docs, min_df_frac=0.05, max_df_frac=0.95,
                    min_cooc=3, k=10).collect()
    top = got[0]
    # the planted pair ranks first with perfect association:
    # pmi = ln(n_ab * N / (n_a * n_b)) = ln(10*20/(10*10)) = ln 2
    assert (top.term_a, top.term_b) == ("bar", "foo")
    assert top.n_ab == 10 and top.pmi == round(__import__("math").log(2), 6)
    # partitioning independence
    again = pmi_pairs(docs.repartition(7), min_df_frac=0.05,
                      max_df_frac=0.95, min_cooc=3, k=10).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_wordpiece_greedy_longest_match(spark):
    from eventstorm_spark.extensions.bpe import (wordpiece_segment,
                                                 wordpiece_vocab)
    docs = spark.createDataFrame(
        [(1, "spark spark spark park parks")], ["doc_id", "text"])
    vocab = wordpiece_vocab(docs, max_piece_len=5, num_pieces=20)
    vp = {r.piece for r in vocab.collect()}
    # chars always covered; 'spark' is the top-weighted multi piece
    assert {"s", "p", "a", "r", "k"} <= vp and "spark" in vp
    words = spark.createDataFrame([("sparks",), ("park",)], ["word"])
    seg = {(r.word, r.idx): r.piece
           for r in wordpiece_segment(words, vocab,
                                      max_piece_len=5).collect()}
    # greedy longest match: 'sparks' -> spark + s (never s|park|s)
    assert seg[("sparks", 0)] == "spark" and seg[("sparks", 1)] == "s"
    # out-of-vocabulary character is an honest error
    bad = spark.createDataFrame([("qux",)], ["word"])
    with pytest.raises(Exception):
        wordpiece_segment(bad, vocab, max_piece_len=5).collect()


def test_viterbi_segment_score_and_tiebreaks(spark):
    """Viterbi segmentation maximizes total log-prob (not longest
    match), and its two tie-breaks — fewer pieces, then
    lexicographically smaller sequence — are exact."""
    from eventstorm_spark.extensions.bpe import viterbi_segment
    vocab = spark.createDataFrame(
        [("a", -1.0), ("b", -1.0), ("aa", -2.0), ("ab", -2.0),
         ("ba", -2.0), ("aab", -10.0)],
        "piece string, logp double")
    words = spark.createDataFrame([("aa",), ("aba",), ("aab",)], ["word"])
    seg = {}
    for r in viterbi_segment(words, vocab, max_piece_len=3).collect():
        seg.setdefault(r.word, []).append((r.idx, r.piece))
    pieces = {w: [p for _, p in sorted(v)] for w, v in seg.items()}
    # 'aa' as one piece (-2.0) ties 'a'+'a' (-2.0): fewer pieces wins
    assert pieces["aa"] == ["aa"]
    # 'aba': ('a','ba') ties ('ab','a') at -3.0 / 2 pieces:
    # lexicographically smaller sequence wins
    assert pieces["aba"] == ["a", "ba"]
    # score beats piece length: 'aab' as the single piece scores -10,
    # any 2-piece split scores -3 — Viterbi must NOT take the longest
    # match; among the -3.0 ties ('a','ab') < ('aa','b') lexically
    assert pieces["aab"] == ["a", "ab"]
    # out-of-vocabulary character is an honest error
    bad = spark.createDataFrame([("qux",)], ["word"])
    with pytest.raises(Exception):
        viterbi_segment(bad, vocab, max_piece_len=3).collect()


def test_unigram_lm_vocab_em_improves_and_is_deterministic(spark):
    """Hard-EM contract: the corpus Viterbi log-likelihood under the
    trained vocabulary is non-decreasing in em_iters (classification-
    EM guarantee, modulo round-9 quantization), characters never drop
    out (coverage), and training is a pure function of the corpus
    (repartition-invariant)."""
    from eventstorm_spark.extensions.bpe import (unigram_lm_vocab,
                                                 viterbi_segment,
                                                 word_frequencies)
    docs = spark.createDataFrame(
        [(1, "spark spark spark sparks park parking mark marks"),
         (2, "park park mark spark sparking parks")],
        ["doc_id", "text"])
    wf = word_frequencies(docs)

    def corpus_ll(vocab):
        seg = viterbi_segment(wf, vocab, max_piece_len=5)
        lp = {r.piece: r.logp for r in vocab.collect()}
        tot = 0.0
        for r in seg.join(wf, "word").collect():
            tot += r.freq * lp[r.piece]
        return tot

    lls = [corpus_ll(unigram_lm_vocab(docs, max_piece_len=5,
                                      num_pieces=8, em_iters=i))
           for i in (0, 1, 2)]
    assert lls[1] >= lls[0] - 1e-6
    assert lls[2] >= lls[1] - 1e-6
    v2 = unigram_lm_vocab(docs, max_piece_len=5, num_pieces=8,
                          em_iters=2)
    got = {(r.piece, r.logp) for r in v2.collect()}
    chars = {c for w in "spark sparks park parking mark marks "
             "sparking parks".split() for c in w}
    assert chars <= {p for p, _ in got}  # coverage floor
    again = unigram_lm_vocab(docs.repartition(7), max_piece_len=5,
                             num_pieces=8, em_iters=2)
    assert {(r.piece, r.logp) for r in again.collect()} == got


def test_proximity_search_window_semantics(spark):
    from eventstorm_spark.extensions.text import proximity_search
    docs = spark.createDataFrame([
        (1, "big x data"),               # span 2 <= slop
        (2, "big x x x x x x x data"),   # span 8 > slop 4
        (3, "data big"),                 # unordered: span 1
        (4, "big only here"),            # missing term
    ], ["doc_id", "text"])
    got = {r.doc: (r.best_span, r.n_windows)
           for r in proximity_search(docs, ["big", "data"],
                                     slop=4).collect()}
    assert got == {1: (2, 1), 3: (1, 1)}
    import pytest as _p
    with _p.raises(ValueError):
        proximity_search(docs, ["big"])
    with _p.raises(ValueError):
        proximity_search(docs, ["big", "big"])


def test_hashed_tfidf_knn_finds_planted_neighbor(spark):
    from eventstorm_spark.extensions.text import hashed_tfidf_knn
    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma epsilon"),   # near-twin of 0
        (2, "zeta eta theta iota"),
        (3, "zeta eta kappa lambda"),
    ], ["doc_id", "text"])
    qs = docs.where(F.col("doc_id") == 0)
    got = hashed_tfidf_knn(docs, qs, dim=64, k=2).collect()
    assert [r.doc for r in got][0] == 1       # the twin ranks first
    assert all(r.q_doc == 0 and r.doc != 0 for r in got)
    assert got[0].cosine > 0.3
    # partitioning independence
    again = hashed_tfidf_knn(docs.repartition(5), qs, dim=64, k=2).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_expect_quality_gate(spark):
    from eventstorm_spark.extensions.pipeline import expect
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (4, "a", None)],
        ["id", "cat", "v"])
    got = {r.check: (r.n_rows, r.n_violations, r.violation_rate)
           for r in expect(df, {
               "cat present": F.col("cat").isNotNull(),
               "v non-negative": F.col("v") >= 0,
               "id positive": F.col("id") > 0,
           }).collect()}
    assert got["cat present"] == (4, 1, 0.25)
    # NULL predicate (v is NULL) counts as a violation
    assert got["v non-negative"] == (4, 2, 0.5)
    assert got["id positive"] == (4, 0, 0.0)
    import pytest as _p
    with _p.raises(ValueError):
        expect(df, {})


def test_expect_hostile_check_names(spark):
    """Check names are arbitrary labels interpolated into a generated
    stack() expression — quotes AND backslashes must round-trip (a
    trailing backslash would otherwise swallow the closing quote under
    Spark's default escapedStringLiterals=false)."""
    from eventstorm_spark.extensions.pipeline import expect
    df = spark.createDataFrame([(1,), (2,), (-3,)], ["id"])
    names = ["isn't null", "path \\", "back\\slash 'mix'\\"]
    got = {r.check: r.n_violations
           for r in expect(df, {n: F.col("id") > 0 for n in names}).collect()}
    assert got == {n: 1 for n in names}
