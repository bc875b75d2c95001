"""End-to-end training-data pipeline walkthrough — the user-facing
composition of the engine's curation operators on the synthetic corpus.

Stages (each one a lazy DataFrame transform until the final writes):

  raw documents
    -> URL step-zero                  (web.synth_urls + canonicalize +
                                       url_dedup — drop re-crawls by
                                       canonical URL before any payload
                                       work)
    -> host-reputation gate           (web.page_rank over the link
                                       graph; bottom-decile hosts
                                       dropped — the domain-rank
                                       recipe)
    -> C4/Gopher rule filter          (text.c4_rules, auditable reasons)
    -> exact dedup                    (dedup.drop_exact_duplicates)
    -> quality model trained in-engine (text.train_linear_quality on
                                       weak labels; scores drive the
                                       near-dup survivor choice)
    -> near-dup removal               (dedup.minhash_near_duplicates +
                                       keep_best_near_duplicates —
                                       survivors are the highest-scored
                                       cluster members, not first-crawled;
                                       the (hashes, bands) config is
                                       audited empirically by
                                       dedup.lsh_recall_audit)
    -> benchmark decontamination      (pipeline.decontaminate_bloom —
                                       hash-slot broadcast semi-join)
    -> substring scrub                (text.exact_substring_scrub_text;
                                       at corpus scale pass scale=True
                                       for the hot-fingerprint cap)
    -> pack into 256-token sequences  (packing.pack_token_spans)
    -> shard + write                  (curation.write_packed_shards)
    -> image near-dup sidecar         (multimodal.image_dhash +
                                       image_hamming_pairs, survivors
                                       persisted via write_dhash_index
                                       so the next ingest probes at
                                       rest instead of re-decoding)
  plus the dataset-card reports        (source_composition; at-rest KMV
                                       distinct-token sketches via
                                       curation.write_kmv_index; exact
                                       heavy-hitter boilerplate tokens;
                                       a z-order layout prunability
                                       audit)

Run: python examples/training_pipeline.py [sf_dir] [out_dir]
Prints one line per stage with surviving doc/token counts.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eventstorm_spark.extensions import curation, dedup, packing, pipeline, text  # noqa: E402
from eventstorm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("training_pipeline_example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"raw                 {n0:>7d} docs")

    # step zero: collapse re-crawled URLs before any payload work
    # (pages_per_source sets the synthetic re-crawl rate; ~2 crawls
    # per page here)
    from eventstorm_spark.extensions import web
    urls = web.canonicalize_urls(web.synth_urls(docs, pages_per_source=240))
    fetched = docs.join(web.url_dedup(urls).select("doc_id"), "doc_id")
    print(f"url dedup           {fetched.count():>7d} docs")

    # domain-reputation gate: PageRank over the link graph, hosts in
    # the bottom tail dropped before any payload work (the CommonCrawl
    # domain-rank recipe). Host score = sum of its page ranks.
    ranks = web.page_rank(web.synth_link_graph(docs), iters=3)
    host_rank = (ranks
                 .withColumn("host", F.split("node", "/").getItem(0))
                 .groupBy("host").agg(F.sum("rank").alias("host_rank")))
    cut = host_rank.agg(
        F.expr("percentile(host_rank, 0.1)").alias("p10"))
    good_hosts = (host_rank.crossJoin(F.broadcast(cut))
                  .where(F.col("host_rank") >= F.col("p10"))
                  .select("host"))
    fetched = fetched.join(
        good_hosts.select(F.col("host").alias("source")), "source")
    print(f"host-rank gate      {fetched.count():>7d} docs "
          f"(dropped bottom-decile hosts)")

    kept_ids = (text.c4_rules(fetched).where(F.col("kept") == 1)
                .select("doc_id"))
    filtered = fetched.join(kept_ids, "doc_id")
    print(f"c4 rules            {filtered.count():>7d} docs")

    exact = dedup.drop_exact_duplicates(filtered)
    print(f"exact dedup         {exact.count():>7d} docs")

    # train the quality model on the engine (weak labels), then let its
    # scores pick the near-dup survivors: keep the BEST copy, not the
    # first-crawled one
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("label"))
    w, b = text.train_linear_quality(exact, labels)
    scores = text.linear_quality_score(exact, weights=w, bias=b)
    scored = exact.join(scores.select("doc_id", "quality_score"), "doc_id")
    pairs = dedup.minhash_near_duplicates(exact, threshold=0.8)
    near = dedup.keep_best_near_duplicates(
        scored, pairs, score_col="quality_score").drop("quality_score")
    print(f"near dedup          {near.count():>7d} docs (keep-best)")

    # did the banding config actually catch the >=0.8 pairs? (audited
    # on a bounded sample, not assumed from the theoretical s-curve)
    audit = dedup.lsh_recall_audit(docs).collect()
    for r in audit:
        print(f"  lsh recall @ j>={r.bucket_lo:.1f}: "
              f"{r.n_caught}/{r.n_true_pairs} = {r.recall}")

    # drop anything sharing a 5-gram hash slot with the (tiny, static)
    # benchmark suite — the broadcast-budget Bloom form
    benchmark = docs.orderBy(F.col("doc_id").desc()).limit(20)
    clean = pipeline.decontaminate_bloom(near, benchmark)
    print(f"decontaminated      {clean.count():>7d} docs")

    scrubbed = (text.exact_substring_scrub_text(clean)
                .where(F.col("text") != ""))
    n_tok = scrubbed.agg(
        F.sum(text.token_count(F.col("text")))).first()[0]
    print(f"substring scrub     {scrubbed.count():>7d} docs"
          f"  ({n_tok} tokens survive)")

    spans = packing.pack_token_spans(scrubbed, seq_len=256)
    n_seq = spans.agg(F.countDistinct("seq_id")).first()[0]
    print(f"packed              {n_seq:>7d} sequences of 256 tokens")

    shard_path = os.path.join(out_dir, "shards")
    curation.write_packed_shards(scrubbed, shard_path, seq_len=256,
                                 n_shards=8)
    print(f"shards              written to {shard_path}")

    # multimodal sidecar: perceptual-dedup the image assets once, then
    # keep the dHash index at rest so the next ingest never re-decodes
    from eventstorm_spark.extensions import multimodal
    assets = multimodal.synth_ppm_assets(near)
    dupes = multimodal.image_hamming_pairs(
        multimodal.image_dhash(assets), max_distance=3)
    keep = assets.join(dupes.select(F.col("id_b").alias("asset_id")),
                       "asset_id", "left_anti")
    idx_path = os.path.join(out_dir, "dhash_index")
    curation.write_dhash_index(keep, idx_path)
    print(f"image dedup         {keep.count():>7d} assets kept "
          f"(index at {idx_path})")

    # layout audit: how prunable would a (doc_id, n_chars)-z-ordered
    # write of the surviving corpus be? (avg span fraction per file ~
    # the share of files a point predicate reads)
    from eventstorm_spark.extensions import layout
    rep = layout.zorder_locality_report(near, ["doc_id", "n_chars"],
                                        n_buckets=16)
    spans = rep.agg(F.round(F.avg("span_frac_doc_id"), 3),
                    F.round(F.avg("span_frac_n_chars"), 3)).first()
    print(f"z-order layout      avg file span: doc_id {spans[0]}, "
          f"n_chars {spans[1]}")

    print("\ndataset card:")
    curation.source_composition(near).orderBy("source").show(5)

    # per-source distinct-token sketches, persisted so the next ingest
    # updates the card without re-scanning this snapshot
    from eventstorm_spark.extensions.sketches import heavy_hitters
    kmv_path = os.path.join(out_dir, "kmv_index")
    toks = near.select("source", F.explode(F.expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("tok"))
    curation.write_kmv_index(toks, kmv_path, "tok",
                             group_cols=("source",), k=128)
    curation.kmv_index_estimate(spark, kmv_path) \
        .orderBy("source").show(5)
    print("top boilerplate tokens (exact, >=1% support):")
    heavy_hitters(toks, "tok", threshold=0.01) \
        .orderBy(F.col("n").desc()).show(5)

    # late round-10 tier: (a) a PSI drift gate — would this corpus
    # snapshot's shape pass review against the pre-clean corpus?
    feat = (near.select(
        "doc_id", "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")))
    base_feat = (docs.select(
        "doc_id", "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")))
    print("PSI drift vs raw corpus (cleaning shifts the shape):")
    curation.psi_drift(base_feat, feat, ["n_chars", "n_tokens"]) \
        .orderBy("feature").show()

    # (b) storage-level redundancy: content-defined chunk dedup ratio
    # (production hash mode — the oracle-portable md5 stays in the
    # driver query)
    ch = text.cdc_chunks(near, window=16, divisor=64,
                         keep_cols=("source",), portable=False)
    red = ch.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("chunk_hash").alias("d")).first()
    print(f"CDC chunks          {red['n']} chunks, "
          f"{red['n'] - red['d']} duplicated")

    # (c) an at-rest positional index over the survivors, probed with
    # an exact phrase — the serving path never re-tokenizes the corpus
    pos_path = os.path.join(out_dir, "pos_index")
    curation.write_positional_index(near, pos_path, n_buckets=16)
    hits = curation.phrase_against_index(
        spark, pos_path, ["merge", "window"], n_buckets=16).count()
    print(f"phrase index        'merge window' in {hits} docs "
          f"(index at {pos_path})")

    # round 11: tokenizer fitting on the survivors — the unigram-LM
    # family (hard-EM + Viterbi) next to the BPE trainer; ONE
    # word-frequency pass feeds seeding, EM and the fertility readout
    from eventstorm_spark.extensions import bpe
    wf = bpe.word_frequencies(near).localCheckpoint(eager=False)
    uni = bpe.unigram_lm_vocab(near, num_pieces=64, em_iters=2, wf=wf)
    seg = bpe.viterbi_segment(wf, uni)
    fert = (seg.groupBy("word").agg(F.count(F.lit(1)).alias("n_pieces"))
            .join(wf, "word")
            .agg((F.sum(F.col("n_pieces") * F.col("freq"))
                  / F.sum("freq")).alias("fertility")).first())
    print(f"unigram-LM          {uni.count()} pieces, corpus fertility "
          f"{fert['fertility']:.3f} pieces/word")


if __name__ == "__main__":
    main()
