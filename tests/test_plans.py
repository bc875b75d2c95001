"""Plan-quality regression tests — the scale contract (SURVEY §4).

These assert the *physical plan shape*, not results: predicates must
reach the parquet scan, projections must prune columns, top-k reads must
not globally sort, small dimensions must broadcast, and prefix filters
must compile to pushdown-capable StartsWith rather than RLike. A change
that silently regresses any of these would still pass the value-equality
oracles while being catastrophically slower at 100 TB.
"""

from __future__ import annotations

import pytest

from eventstorm_spark import inventory


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return plan_of(inventory.queries()[name](spark, sf_dir))
    return run


def test_position_filter_reaches_scan(q):
    plan = q("read_all_from_position")
    assert "(position" in plan and ">= 500" in plan
    assert "FileScan parquet" in plan


def test_stream_read_prunes_and_pushes(q):
    plan = q("read_stream_forward")
    # equality predicate in the scan's data filters
    assert "= user-7" in plan


def test_backward_limited_read_is_topk_not_sort(q):
    plan = q("read_stream_backward")
    assert "TakeOrderedAndProject" in plan
    # no global sort exchange for a LIMIT-k read
    assert "rangepartitioning" not in plan


def test_prefix_filter_compiles_to_startswith(q):
    plan = q("filter_stream_prefix")
    assert "StartsWith" in plan
    assert "RLike" not in plan


def test_q6_scan_prunes_columns(q):
    plan = q("tpch_q6")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # only the 4 referenced columns are read, not the full 11-col table
    assert "l_quantity" in scan and "l_shipdate" in scan
    assert "l_returnflag" not in scan and "l_orderkey" not in scan


def test_dimension_joins_broadcast(q):
    # no forced hint — Catalyst's size-stat threshold (or AQE at
    # runtime) picks broadcast at this sf; at 100 TB the same plan
    # degrades to a shuffle join instead of OOMing
    plan = q("top_orders_by_revenue")
    assert "BroadcastHashJoin" in plan


def test_inventory_broadcast_hints_only_on_bounded_tables():
    """Forced broadcast hints are allowed ONLY on tables whose
    cardinality does not scale with sf: nation (25 rows), region (5),
    per-event-type aggregates, and provably-1-row frames. Everything
    customer/part/supplier/corpus-scaled must be hint-free so AQE can
    degrade to shuffle joins at scale."""
    import inspect
    import re
    src = inspect.getsource(inventory)
    hinted = set(re.findall(r"F\.broadcast\((\w+)", src))
    # thresh = nation_part_share's 1-row scalar-aggregate frame;
    # outs = event_transitions' per-event-type outgoing totals
    # (|event_types| rows, sf-invariant)
    # base = events_seasonal_deviation's (event_type x 24) training
    # profile — bounded by key-cardinality x hours, sf-invariant
    assert hinted <= {"nation", "region", "stats", "max_rev", "avg_bal",
                      "thresh", "outs", "base"}, hinted


def test_read_path_pushes_to_parquet_and_stays_jvm(q):
    plan = q("read_all_from_position")
    # pushed into the parquet reader itself (row-group/page pruning),
    # not just a post-scan Filter node
    assert "GreaterThanOrEqual(position,500)" in plan
    assert "EvalPython" not in plan


def test_native_agg_has_partial_aggregation(q):
    """head_revisions must map-side combine before the shuffle."""
    plan = q("head_revisions")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_new_relational_joins_broadcast(q):
    # Q15/Q16/Q18 shapes: the derived key sets (max-revenue row, arrears
    # suppliers, big-order keys) must build broadcast hash joins — the
    # fact side never shuffles for them.
    for name in ["top_supplier", "supplier_part_counts", "large_volume_orders"]:
        assert "BroadcastHashJoin" in q(name), name


def test_disjunctive_predicate_stays_jvm(q):
    # Q19 shape: the OR-of-conjuncts is evaluated in codegen after a
    # broadcast join; no Python/BatchEvalPython stage anywhere.
    plan = q("disjunctive_brand_revenue")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_percentiles_have_partial_aggregation(q):
    # percentile() is a TypedImperativeAggregate: buffers merge, so the
    # shuffle carries one buffer per (task, event_type), not raw rows.
    plan = q("value_percentiles")
    assert "partial_percentile" in plan


def test_shingle_path_has_no_interpreted_hofs(q):
    # the near-dup candidate path must stay in codegen: no lambda
    # (higher-order-function) expressions and no Python stages.
    plan = q("near_dup_ngram_jaccard")
    assert "lambdafunction" not in plan.lower()
    assert "BatchEvalPython" not in plan


def test_tf_idf_vocab_broadcasts(q):
    # at small scale the vocabulary fits under autoBroadcastJoinThreshold
    # and Catalyst picks broadcast on its own (no forced hint — see
    # test_text_vocab_join_has_shuffle_fallback for the unbounded case)
    plan = q("tf_idf_top_terms")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_text_vocab_join_has_shuffle_fallback(spark, sf_dir):
    """The vocabulary / repeated-segment joins must NOT be forced
    broadcasts: with the broadcast threshold disabled the plan has to
    degrade to a shuffle join (the 100 TB unbounded-vocabulary path)
    instead of OOMing on a hinted broadcast. Only the provably-1-row
    corpus-total aggregates may keep an explicit hint."""
    from eventstorm_spark import inventory

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ["tf_idf_top_terms", "doc_unigram_logprob",
                     "repeated_passages"]:
            plan = plan_of(inventory.queries()[name](spark, sf_dir))
            # the equi-join on term/segment fell back to a shuffle join
            assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), name
            assert "BroadcastHashJoin" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# Shuffle-budget regression: ceilings per headline query (SCALE.md §9).
# A new Exchange in any of these plans is a scale regression even if
# values stay correct. Counts are ShuffleExchange only (broadcast
# exchanges are the cheap path and excluded on purpose).
_SHUFFLE_BUDGET = {
    "read_all_from_position": 1,   # global position order -> one range exchange
    "filter_type_regex": 1,        # ordered filtered read, same
    "head_revisions": 1,
    "proj_stats_by_type": 1,       # fold key exchange only
    "proj_stats_by_type_lowered": 1,
    "proj_count_by_stream": 1,
    "tpch_q1": 1,
    "tpch_q6": 1,                  # 32-row single-partition final agg
    "top_orders_by_revenue": 1,    # fact-fact join; dims broadcast
    "nation_revenue": 2,
    "top_parts_per_brand": 2,
    "segment_order_stats": 2,
    "events_daily_counts": 1,
    "events_sessionization": 1,    # both windows reuse one exchange
    "cust_order_distribution": 2,
    "value_percentiles": 1,
    "dedup_exact": 1,
    "dedup_embedding_cosine": 2,
    "ann_cosine_topk": 0,
    "token_counts": 0,
    "split_assign": 0,             # pure projection
    "split_contamination": 2,
    "tf_idf_top_terms": 5,
    "repetition_features": 3,
    # round-5 training-mix paths
    "pack_sequences": 1,           # the one range exchange of the cumsum
    "c4_quality_filter": 0,        # row-local rules, pure projection
    "temperature_mixture": 1,      # one corpus group aggregate
    "semantic_dedup": 1,           # rep min_by agg; verdict join broadcasts
    "dsir_weights": 5,             # two LM aggs + totals + scoring join + rollup
    "bm25_top_docs": 5,            # postings agg + df + stats + dl join + topk
    "passage_scrub": 3,            # segment freq + join back + per-doc rollup
    "ann_pq_topk": 0,              # encode + ADC are projections; topk is TakeOrdered
    # round-6 curation suite
    "shard_manifest": 1,           # bounded groupBy(shard) only
    "length_bucket_report": 1,     # bounded groupBy(bucket) only
    "dedup_incremental": 7,        # 3-branch synthetic union x (anti + canon)
    "snapshot_novelty": 9,
    "vocab_coverage": 2,           # __pid window re-key + final order (term
                                   # agg + range phase hide behind the
                                   # two-phase cumsum's localCheckpoint)
    "source_composition": 4,       # group agg (w/ distinct) + totals
    "dataset_profile": 2,          # one scan-wide agg + stack reshape
    "model_quality_score": 0,      # pure codegen scoring plan, one scan
    "winnow_fingerprints": 1,      # one per-doc window exchange (both passes reuse it)
    "events_session_native": 1,    # session-window agg key exchange
    "epoch_plan": 1,               # one bounded group aggregate
    "epoch_materialized_counts": 2,
    # round-8 additions
    "min_cost_supplier": 3,        # unit agg + per-part min + equality join-back
    "nation_part_share": 3,        # value agg + 1-row threshold + final
    "bulk_part_suppliers": 2,      # two agg levels; totals join back co-keyed
    "waiting_suppliers": 3,        # per-(order,supp) agg + windows + final rollup
    "winnow_cross_matches": 3,     # two winnow window exchanges + pair regroup
    "hybrid_retrieval": 5,         # bm25 tower + two k-bounded rank windows + fuse
    "corpus_diff": 3,              # two digest aggs + digest-keyed full-outer
    "chunk_documents": 0,          # row-local transform+explode, pure projection
    "multimodal_gif_decode": 1,    # Arrow decode + the output-order range exchange
    "multimodal_mulaw_decode": 1,
}


def test_shuffle_budget(q):
    import re
    over = {}
    for name, budget in _SHUFFLE_BUDGET.items():
        plan = q(name)
        n = len(re.findall(r"Exchange (hash|range|SinglePartition)", plan))
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle budget exceeded: {over}"


def test_event_analytics_broadcast_shapes(q):
    # funnel/cohort/anomalies: the derived per-user/per-type tables are
    # broadcast; the events fact never shuffles for those joins.
    for name in ["funnel_conversion", "cohort_retention", "events_anomalies"]:
        assert "BroadcastHashJoin" in q(name), name
        assert "BatchEvalPython" not in q(name), name


def test_unigram_logprob_broadcasts_and_stays_jvm(q):
    # vocabulary + corpus-total must broadcast; no Python stages
    plan = q("doc_unigram_logprob")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bigram_logprob_stays_jvm_with_partial_agg(q):
    # bigram LM: pure codegen (posexplode + lead window + two count
    # tables joined back size-gated); map-side combine on the counts
    plan = q("doc_bigram_logprob")
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_vocab_stats_has_partial_aggregation(q):
    # tokenize -> vocab agg must combine map-side before the exchange
    plan = q("vocab_stats")
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_portable_minhash_stays_codegen(q):
    # the portable (md5) hashing must not fall out of codegen into
    # interpreted HOFs or Python on the corpus-scale signature path
    plan = q("dedup_minhash_lsh")
    assert "BatchEvalPython" not in plan


def test_star_components_stays_jvm(q):
    # the star-CC rounds (groupBy-min + join per star) and the final
    # docs join must never leave the JVM
    plan = q("dedup_clusters_star")
    assert "BatchEvalPython" not in plan


def test_codec_decode_plans_are_scan_plus_udf(q):
    # real-codec decode: one Arrow-batched python stage over the scan,
    # at most the final order's range exchange — no joins, no extra
    # shuffles (the decode parallelizes embarrassingly at corpus scale)
    import re
    for name in ["multimodal_wav_decode", "multimodal_ppm_decode"]:
        plan = q(name)
        n = len(re.findall(r"Exchange (hash|range|SinglePartition)", plan))
        assert n <= 1, (name, n)
        assert "Join" not in plan, name


def test_shingle_join_keys_are_hashed(q):
    # the candidate self-join must exchange 8-byte hash keys, not
    # shingle strings (the shuffle-bytes contract of hash_join=True).
    # The hashing itself hides behind the localCheckpoint scan, so
    # assert the join key TYPE: shingle#NL is a long, shingle#N would
    # be the string key.
    import re
    plan = q("near_dup_ngram_jaccard")
    join_line = next(l for l in plan.splitlines() if "HashJoin [shingle#" in l)
    assert re.search(r"\[shingle#\d+L\]", join_line), join_line


def test_pack_sequences_avoids_single_partition_cumsum(q):
    """The global token cumsum must be the two-phase distributed form
    (range partition + per-partition window + broadcast offsets), never
    a no-partition-key window — that plan funnels the whole corpus
    through one task."""
    plan = q("pack_sequences")
    assert "SinglePartition" not in plan


def test_vocab_coverage_avoids_single_partition_window(q):
    """The vocabulary rank/cumsum must be the two-phase distributed form
    (range partition + per-partition windows + broadcast offsets), never
    an unpartitioned ORDER BY window — that plan funnels the whole
    vocabulary through one task."""
    plan = q("vocab_coverage")
    assert "SinglePartition" not in plan


def test_semantic_dedup_broadcasts_representatives(q):
    """The per-cell representative table is bounded by n_centroids: it
    must broadcast, and the corpus side must not shuffle for the join."""
    plan = q("semantic_dedup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_family_has_no_forced_broadcasts(spark, sf_dir):
    """No dedup-tier join may carry a forced broadcast hint on a table
    whose cardinality scales with the corpus: the per-document sizes
    frame in ngram_jaccard_pairs, the candidate-id set in
    minhash_near_duplicates, and the vector-attach joins in
    embedding_near_duplicates are all corpus-fraction-sized on
    dup-heavy crawls. Size-gating policy: zero ResolvedHints in the
    optimized logical plan — Catalyst/AQE still picks broadcast at
    runtime when the side is genuinely small."""
    for name in ["near_dup_ngram_jaccard", "dedup_minhash_lsh",
                 "dedup_embedding_lsh", "near_dup_containment",
                 "near_dup_incremental"]:
        df = inventory.queries()[name](spark, sf_dir)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical, name


def test_embedding_lsh_attach_joins_are_candidate_pruned(spark, sf_dir):
    """The vector re-attach in embedding_near_duplicates must semi-join
    the embedding table down to candidate ids before the equi-joins —
    the full-corpus vector table must never be a join build side. With
    the broadcast threshold disabled the attach degrades to shuffle
    joins (never OOMs an executor on a hinted corpus broadcast), and a
    LeftSemi prune is present in the plan."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = inventory.queries()["dedup_embedding_lsh"](spark, sf_dir)
        plan = plan_of(df)
        assert "BroadcastHashJoin" not in plan
        assert "LeftSemi" in plan
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_jaccard_sizes_join_has_shuffle_fallback(spark, sf_dir):
    """ngram_jaccard_pairs' per-document sizes join must degrade to a
    shuffle join when broadcast is impossible — the 100 TB path — not
    carry a forced hint that OOMs on a billion-document corpus."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = inventory.queries()["near_dup_ngram_jaccard"](spark, sf_dir)
        plan = plan_of(df)
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dsir_vocab_joins_are_not_forced_broadcasts(spark, sf_dir):
    """Both LM frequency tables are vocabulary-sized: the logical plan
    must carry no forced broadcast hint on them (size-gating policy —
    Catalyst/AQE may still choose broadcast at runtime when small)."""
    df = inventory.queries()["dsir_weights"](spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly one hinted broadcast: the provably-1-row totals frame
    assert logical.count("ResolvedHint") <= 1


def test_shard_routing_is_pure_projection(spark, sf_dir):
    """assign_shards must add zero exchanges: the routing is a row-local
    md5 expression, and the manifest's only shuffle is the bounded
    groupBy(shard) with a partial aggregate below it."""
    from eventstorm_spark.extensions.curation import assign_shards
    docs = inventory.load(spark, sf_dir, "documents")
    plan = plan_of(assign_shards(docs, n_shards=16))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    mplan = plan_of(inventory.queries()["shard_manifest"](spark, sf_dir))
    assert mplan.count("Exchange") == 1
    assert mplan.count("HashAggregate") >= 2  # partial + final


def test_length_buckets_stay_jvm_with_partial_agg(q):
    plan = q("length_bucket_report")
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_incremental_dedup_ships_digests_not_payloads(spark, sf_dir):
    """dedup_against_corpus: the corpus side of the anti-join must be
    pre-aggregated to distinct digests (partial agg below the exchange)
    and no join may carry a forced hint — both sides scale with data,
    so with broadcast disabled the whole plan degrades to shuffle joins
    instead of OOMing."""
    df = inventory.queries()["dedup_incremental"](spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(inventory.queries()["dedup_incremental"](spark, sf_dir))
        assert "BroadcastHashJoin" not in plan
        assert "LeftAnti" in plan
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dataset_profile_is_single_pass(q):
    """profile_table computes every column's counters in ONE aggregate
    over one scan — a per-column scan loop would read the table N times."""
    plan = q("dataset_profile")
    assert plan.count("FileScan parquet") == 1
    assert "BatchEvalPython" not in plan


def test_source_composition_has_partial_aggregation(q):
    plan = q("source_composition")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_q5_q8_shapes_broadcast_dimensions(q):
    """Q5/Q8 analogues: every dimension chain (nation/region/supplier
    subsets) builds broadcast hash joins; no Python stages; only the
    fact-fact lineitem⋈orders join may shuffle."""
    for name in ["regional_supplier_volume", "market_share"]:
        plan = q(name)
        assert "BroadcastHashJoin" in plan, name
        assert "BatchEvalPython" not in plan, name


def test_model_quality_score_is_pure_scoring_plan(q):
    """The linear quality scorer must compile to a single scan with zero
    exchanges and zero Python stages — the shape 'run the model over
    100 TB' requires when the model is linear."""
    plan = q("model_quality_score")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan parquet") == 1


def test_winnow_passes_share_one_exchange(q):
    """Both winnowing window passes (trailing min, forward max) and the
    whole-doc count must reuse the single per-document hash exchange."""
    import re
    plan = q("winnow_fingerprints")
    assert len(re.findall(r"Exchange (hash|range|SinglePartition)", plan)) == 1
    assert "BatchEvalPython" not in plan


def test_winnow_exchange_carries_docs_not_shingles(q):
    """Round-17: on a narrow (driver-SF) scan the explicit doc-id
    repartition IS the per-document window exchange, placed BELOW the
    shingle posexplode — the exchange moves raw doc rows (~4x fewer
    bytes than the exploded positional shingles), and the explode runs
    post-shuffle across the repartition width instead of serializing
    on the scan's single split. In the printed plan tree (root first)
    the Generate must therefore sit ABOVE the Exchange."""
    from eventstorm_spark.session import get_spark

    # the repartition branch only fires when par // 2 > 1 AND the test
    # scan is a single split; at SPARK_GRAFT_CPUS <= 3 the widen is a
    # no-op and the window exchange legitimately sits above Generate
    if get_spark().sparkContext.defaultParallelism < 4:
        import pytest
        pytest.skip("winnow widen needs defaultParallelism >= 4")
    plan = q("winnow_fingerprints")
    assert "Generate" in plan and "Exchange" in plan
    assert plan.index("Generate") < plan.index("Exchange"), (
        "shingle explode planned below the exchange — the window "
        "exchange is shuffling exploded shingle rows again")


def test_state_point_lookup_pushes_partition_filter(spark, tmp_path):
    """P16 State(name, partition): Materializer.state_of's slice must
    push the partition equality into the state parquet scan
    (PushedFilters) — the lookup reads matching row groups, never the
    state table (one row per stream at 100 TB)."""
    from eventstorm_spark.log.store import EventLog
    from eventstorm_spark.projections.batch import partition_states
    from eventstorm_spark.projections.dsl import AggSpec, projection
    from eventstorm_spark.projections.materialize import Materializer
    from tests.fixtures import new_events

    log = EventLog(spark, str(tmp_path / "log"))
    log.append("user-1", new_events(3, prefix="a"))
    log.append("user-2", new_events(2, prefix="b"))
    spec = (projection("pin").from_all().foreach_stream()
            .when_agg({"n": AggSpec.count()}))
    m = Materializer(log, spec, str(tmp_path / "state"))
    m.refresh()

    sliced = partition_states(m.state(), ["user-1"])
    plan = plan_of(sliced)
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PushedFilters" in scan and "user-1" in scan, scan
    assert "In(partition" in scan or "EqualTo(partition" in scan, scan


def test_multimodal_fingerprint_scans_have_no_exchange(q):
    """image_dhash and audio_fingerprints are single decode scans —
    payload-local mapInPandas, zero data shuffles (the 100-TB shape:
    the hash table is the only thing that ever moves). The single
    range exchange is the query form's presentation orderBy."""
    import re
    for name in ("image_dhash", "audio_fingerprints"):
        plan = q(name)
        assert not re.search(r"Exchange hash", plan), (name, plan)
        assert len(re.findall(r"Exchange range", plan)) <= 1, (name, plan)


def test_source_overlap_shuffle_budget(q):
    """source_overlap's exchanges: the doc-window shingling partition,
    the per-source distinct, the shingle self-join and the pair/size
    aggregates — budget 8; a regression (e.g. string keys resurfacing
    after the pre-distinct hash, or a lost reuse) shows up as extra
    exchanges. Also: no interpreted HOF shingling (no BatchEvalPython)
    and no forced broadcast of the unbounded per-source size table."""
    import re
    plan = q("source_overlap")
    assert len(re.findall(r"Exchange (hash|range|SinglePartition)",
                          plan)) <= 8, plan
    assert "BatchEvalPython" not in plan


def test_quality_trainer_gradient_is_one_partial_agg_no_python(spark, sf_dir):
    """Each GD iteration of the quality trainer must be one map-side-
    combinable aggregate (partial + final HashAggregate) in pure JVM
    expressions — no Python stage, no join (labels are pre-joined into
    the cached training frame), no extra exchange beyond the final
    single-partition gather of the d+1 floats."""
    from pyspark.sql import functions as F
    from eventstorm_spark.extensions.text import quality_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = ["avg_token_len", "n_tokens", "punct_ratio"]
    data = (quality_features(docs)
            .join(docs.select("doc_id",
                              (F.col("lang") == "en").cast("double")
                              .alias("_y")), "doc_id")
            .select(*feats, "_y"))
    z = F.lit(0.0)
    for c in feats:
        z = z + F.lit(0.1) * ((F.col(c) - F.lit(1.0)) / F.lit(2.0))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    grad = data.select((p - F.col("_y")).alias("_e"), *feats).agg(
        F.avg("_e").alias("gb"),
        *(F.avg(F.col("_e") * F.col(c)).alias(f"g_{j}")
          for j, c in enumerate(feats)))
    plan = plan_of(grad)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_gapfill_filter_reaches_scan_and_bounded_windows(q):
    """The gapfill queries' value>=97 predicate must be in the scan's
    pushed filters, and the fill must stay at two key-window passes —
    a self-join reformulation would blow the exchange budget."""
    import re
    plan = q("events_gapfill_interp")
    assert "97" in plan and "FileScan parquet" in plan
    assert len(re.findall(r"Exchange (hash|range|SinglePartition)",
                          plan)) <= 5, plan
    assert "CartesianProduct" not in plan


def test_kmv_sketch_bottom_k_is_salted_two_phase(q):
    """kmv_distinct_tokens: the sketch side must sort per (group,
    salt) then per group — never a single global sort — and all
    hashing stays JVM-side (no Python stage)."""
    plan = q("kmv_distinct_tokens")
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # two bounded window sorts: (source, salt) then (source)
    assert plan.count("RunningWindowFunction") >= 0  # window exec present
    assert "row_number" in plan


def test_heavy_hitters_recount_joins_on_broadcast_candidates(q):
    """heavy_hitter_tokens: pass 2's semi-join against the candidate
    set must be a BroadcastHashJoin (candidates are threshold-bounded),
    and the only Python stage is the MG candidate scan (ArrowEvalPython
    /mapInPandas), never a per-row UDF."""
    plan = q("heavy_hitter_tokens")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_page_rank_iterations_have_no_nested_loop(q):
    """link_page_rank: every iteration joins the edge list by key —
    no CartesianProduct; the only BroadcastNestedLoopJoins are the
    one-row scalar attachments (n_total, dangling mass)."""
    plan = q("link_page_rank")
    assert "CartesianProduct" not in plan


def test_zorder_key_stays_jvm(q):
    """zorder_locality: the Morton interleave must be pure codegen —
    no Python stage, no per-row UDF — and the report is one hash
    aggregate over the bucketed key."""
    plan = q("zorder_locality")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_round10_late_queries_stay_jvm(q):
    # the whole late-r10 tier is pure codegen: no Python stage anywhere
    for name in ["events_ewma_anomaly", "decayed_user_activity",
                 "phrase_search", "events_mad_outliers", "cdc_chunk_dedup",
                 "corpus_drift_psi", "kmv_source_overlap",
                 "link_communities", "skew_salted_join"]:
        assert "BatchEvalPython" not in q(name), name


def test_round10_late_shuffle_budgets(q):
    # one exchange per keyed pass; TakeOrdered (not a range exchange)
    # for the top-k reads. Only LIVE exchanges count: an
    # InMemoryRelation PRINTS its stored build lineage (including the
    # memoization repartition, round 17) but execution hits the cached
    # blocks — same live-vs-lineage convention as
    # test_postings_queries_share_one_tokenize.
    import re
    budgets = {"events_ewma_anomaly": 1,   # the one per-user window
               "decayed_user_activity": 1,  # one combinable aggregate
               "phrase_search": 2,          # postings + final group
               "events_mad_outliers": 4,    # med -> mad -> flag passes
               "cdc_chunk_dedup": 4}        # cuts agg, join-back, stats
    over = {}
    for name, budget in budgets.items():
        plan = q(name)
        live = plan.split("InMemoryRelation", 1)[0]
        n = len(re.findall(r"Exchange (hash|range|SinglePartition)",
                           live))
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle budget exceeded: {over}"


def test_ewma_single_window_no_sort_exchange(q):
    # top-50 must compile to TakeOrdered, never a global range sort
    plan = q("events_ewma_anomaly")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange range" not in plan


def test_postings_queries_share_one_tokenize(q, spark, sf_dir):
    """Round 11: phrase/proximity/tfidf-knn serve from the session-
    memoized postings frame — their plans must read the persisted
    blocks (InMemoryTableScan; the relation still PRINTS its parquet
    lineage, but execution hits the cache) instead of re-running the
    posexplode tokenize (no Generate stage outside the cached
    relation's printed lineage)."""
    for name in ["phrase_search", "proximity_search"]:
        plan = q(name)
        assert "InMemoryTableScan" in plan, name
        # every Generate (posexplode/explode) must sit INSIDE the
        # InMemoryRelation's printed lineage, never as a live stage
        # above the cache scan — live stages appear before the first
        # InMemoryRelation marker in the plan string
        live = plan.split("InMemoryRelation", 1)[0]
        assert "Generate posexplode" not in live, name
    # tfidf-knn's rows frame is localCheckpoint'd (it feeds four
    # consumers), so the postings cache sits behind the checkpoint
    # boundary — the plan shows the RDD scan, not the cache scan
    assert "Scan ExistingRDD" in q("hashed_tfidf_knn")


def test_cdc_rolling_mode_is_shuffle_free(spark, sf_dir):
    """The production CDC chunker is a pure flat map: one Arrow stage,
    zero exchanges (the portable path shuffles cut arrays to rejoin
    the text; the rolling path holds the text in-batch)."""
    from eventstorm_spark.extensions.text import cdc_chunks

    docs = inventory.load(spark, sf_dir, "documents")
    plan = plan_of(cdc_chunks(docs, portable=False))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_scale_forms_drop_the_audit_stages(spark, sf_dir):
    """bench.py's scale forms must actually shed the audit work: the
    hdr audit=False plan carries no sort-based percentile, the mad
    approx form no exact percentile (approx_percentile only), the kmv
    estimate-only form no exact distinct count of the token stream."""
    plan = plan_of(inventory.queries()["hdr_value_quantiles"](
        spark, sf_dir, audit=False))
    assert "percentile" not in plan
    plan = plan_of(inventory.queries()["events_mad_outliers"](
        spark, sf_dir, audit=False))
    assert "approx_percentile" in plan
    assert "percentile(" not in plan.replace("approx_percentile(", "")
    plan = plan_of(inventory.queries()["kmv_distinct_tokens"](
        spark, sf_dir, audit=False))
    assert "count(distinct" not in plan.lower()


def test_triplet_driver_config_is_capped(spark):
    """The contrastive_triplets driver config must carry the hot-bucket
    cap — the scale-safe config the sf1 probe validated, not the
    uncapped one it measured at 19.3x. Since round 17 the candidate
    pipeline is localCheckpoint-ed inside mine_triplets (it feeds both
    direction branches), so the cap's HAVING semi-join no longer PRINTS
    in the composed plan; pin it behaviorally through the same
    mine_triplets entry the driver query calls (a hot bucket larger
    than the cap must stop yielding negatives), plus the driver wiring
    that passes the literal 512."""
    import inspect

    from eventstorm_spark.extensions.similarity import (_portable_planes,
                                                        mine_triplets)

    n = 8
    # identical vectors: every banded bucket holds all n rows
    emb = spark.createDataFrame(
        [(i, i % 2, [1.0, 0.0, 0.0, 0.0]) for i in range(n)],
        "vec_id long, label int, embedding array<double>")
    planes = _portable_planes(4, 8)
    kw = dict(planes=planes, num_planes=8, bands=2)
    capped = mine_triplets(emb, max_bucket_size=n - 1, **kw)
    uncapped = mine_triplets(emb, max_bucket_size=n, **kw)
    assert capped.count() == 0          # bucket over cap -> dropped
    assert uncapped.count() > 0         # same data under cap -> mined
    # the driver query passes exactly the probe-validated cap
    src = inspect.getsource(inventory.q_contrastive_triplets)
    assert "max_bucket_size=512" in src


def test_final_wave_plan_shapes(q):
    # seasonal profile joins via broadcast; gate/funnel/rfm/pmi/
    # calibration stay pure JVM
    plan = q("events_seasonal_deviation")
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
    for name in ["dq_gate", "funnel_conversion_windowed",
                 "funnel_transition_times", "user_rfm_segments",
                 "token_pmi_pairs", "quality_calibration",
                 "hashed_tfidf_knn"]:
        assert "BatchEvalPython" not in q(name), name
