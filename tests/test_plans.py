"""Physical-plan assertions: the properties that matter at 100 TB
(predicate pushdown, broadcast joins, single-scan fusion) must appear
in the executed plan, not just in design notes."""

from __future__ import annotations

import pytest

from data_validator_spark.queries import build_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    q, _ = build_registry()
    return q


def plan_of(spark, registry, name):
    return registry[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_shipdate_filter_into_scan(spark, registry):
    plan = plan_of(spark, registry, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q3_broadcasts_customer_and_pushes_segment_filter(spark, registry):
    plan = plan_of(spark, registry, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcasts_dims_and_pushes_region_filter(spark, registry):
    plan = plan_of(spark, registry, "q5_local_supplier")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_q6_pushes_all_three_predicates_into_scan(spark, registry):
    plan = plan_of(spark, registry, "q6_forecast_revenue")
    # the scan carries data filters for all three predicate columns
    # (the printed PushedFilters list is truncated, so assert on the
    # scan's DataFilters prefix instead)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "(l_discount" in plan and "(l_quantity" in plan
    # scan-agg only: no join operators at all
    assert "Join" not in plan


def test_q10_broadcasts_nation_and_pushes_returnflag(spark, registry):
    plan = plan_of(spark, registry, "q10_returned_items")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q18_aggregates_before_joining(spark, registry):
    """The HAVING aggregate must run below the joins so only
    qualifying orderkeys reach them (plan shows the quantity
    aggregate on the build side of the first join, not above it)."""
    plan = plan_of(spark, registry, "q18_large_volume")
    first_join = min(
        i for i in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"), plan.find("ShuffledHashJoin"))
        if i != -1
    )
    agg_pos = plan.find("sum(cast(l_quantity")
    assert agg_pos != -1 and agg_pos > first_join  # below = printed after


def test_combined_single_pass_is_one_scan_one_exchange(spark, registry):
    plan = plan_of(spark, registry, "combined_single_pass")
    assert plan.count("FileScan") == 1
    # partial agg -> singlePartition exchange -> final agg, nothing else
    assert plan.count("Exchange") == 1


def test_dedup_minhash_never_builds_all_pairs(spark, registry):
    # the self-join must key on (band, sig) — a hash join with join
    # keys, never a cartesian/broadcast-nested-loop product
    plan = plan_of(spark, registry, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_ivf_broadcasts_centroids(spark, registry):
    plan = plan_of(spark, registry, "similarity_ann_ivf")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q4_uses_semi_join_with_pushed_date_filter(spark, registry):
    plan = plan_of(spark, registry, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_q7_broadcasts_only_nation(spark, registry):
    plan = plan_of(spark, registry, "q7_volume_shipping")
    # nation is broadcast onto both the supplier and customer sides;
    # the fact-fact meet on the order key carries no broadcast hint
    # (AQE may still pick one at local SF, so only the broadcast-dim
    # property is plan-stable across scales)
    assert plan.count("BroadcastExchange") >= 2


def test_q13_outer_join_preserves_customers_and_reuses_custkey_shuffle(spark, registry):
    plan = plan_of(spark, registry, "q13_customer_distribution")
    assert "LeftOuter" in plan
    # both aggregations present; the per-customer agg keys on the same
    # custkey the join shuffled on, so no extra Exchange between them
    assert "HashAggregate" in plan


def test_q22_anti_join_with_pushed_totalprice_filter(spark, registry):
    plan = plan_of(spark, registry, "q22_prospective_customers")
    assert "LeftAnti" in plan
    # the large-order predicate reaches the orders scan
    assert "GreaterThan(o_totalprice,400000.0)" in plan
    # the scalar threshold is broadcast, not recomputed per row
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_events_rollup_is_single_scan_expand(spark, registry):
    """Three granularities must come from ONE scan via grouping-set
    Expand, not one job per granularity."""
    plan = plan_of(spark, registry, "events_rollup")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_token_frequencies_partial_aggregates_before_shuffle(spark, registry):
    """The explode fan-out must collapse map-side: partial_count below
    the exchange, and top-k as TakeOrdered, not a global sort."""
    plan = plan_of(spark, registry, "token_frequencies")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_q15_broadcasts_scalar_max_not_window(spark, registry):
    plan = plan_of(spark, registry, "q15_top_supplier")
    # the 1-row max meets the revenue relation via broadcast
    assert "BroadcastExchange" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q17_broadcasts_brand_filtered_part(spark, registry):
    plan = plan_of(spark, registry, "q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(p_brand,Brand#23)" in plan


def test_corpus_train_filter_fuses_to_one_scan(spark, registry):
    """Dedup keeper + quality + split + census must fuse into one scan
    of documents (window on fingerprint, then the census agg)."""
    plan = plan_of(spark, registry, "corpus_train_filter")
    assert plan.count("Scan parquet") == 1
    assert "Window" in plan


def test_q8_broadcasts_all_dimensions(spark, registry):
    """7-table tree: part/supplier/nation×2/region all broadcast; the
    only shuffles belong to the fact-fact meets."""
    plan = plan_of(spark, registry, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert "EqualTo(r_name,AMERICA)" in plan


def test_q8_fact_join_rides_bucketed_copies(spark, registry):
    """r14 (r13 verdict item 3): lineitem⨝orders reads both at-rest
    orderkey-bucketed copies as a colocated SMJ — no exchange may sit
    between either dv_bkt scan and the merge join, and the
    o_orderdate window must push into the bucketed orders scan."""
    plan = plan_of(spark, registry, "q8_market_share")
    assert "dv_bkt_lineitem_" in plan and "dv_bkt_orders_" in plan
    assert "SortMergeJoin" in plan, f"no SMJ in q8 plan:\n{plan}"
    # colocation: neither side of the orderkey meet may be re-shuffled
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    orders_scan = next(
        s for s in plan.split("FileScan parquet") if "dv_bkt_orders_" in s[:200]
    )
    pushed = orders_scan.split("PushedFilters: [", 1)[1][:300]
    assert "GreaterThanOrEqual(o_orderdate" in pushed


def test_r14_orderkey_census_queries_ride_bucketed_copies(spark, registry):
    """SCALE.md r14 at-scale census closures: q5/q10 (fact⨝fact on
    the order key), reconciliation_check (per-order totals vs
    header), and unique_check (composite-key census) all read the
    at-rest orderkey-bucketed copies, and NONE may hash-partition on
    an order key — the bucketed scan's partitioning carries through
    the groupBy/join (subset clustering)."""
    for name in (
        "q5_local_supplier",
        "q10_returned_items",
        "reconciliation_check",
        "unique_check",
    ):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_lineitem_" in plan, name
        assert "Exchange hashpartitioning(l_orderkey" not in plan, name
        assert "Exchange hashpartitioning(o_orderkey" not in plan, name
        assert "Exchange hashpartitioning(k#" not in plan, name


def test_copurchase_basket_build_is_shuffle_free(spark):
    """The capped-basket cache build reads the bucketed lineitem copy:
    both the (orderkey, partkey) DISTINCT and the first
    groupBy(orderkey) collect_list must be satisfied by the scan's
    partitioning (at 100 TB those two lineitem-scale shuffles WERE
    the cache-build cost). r18: the build additionally attaches
    per-part order counts (slim part-keyed rows, one-time) and
    re-collects — at most ONE l_orderkey exchange (the re-collect
    after the count join), never one under the first collect."""
    from data_validator_spark.queries.mining_ops import _BASKET_CACHE, _basket_lines

    for df in _BASKET_CACHE.values():
        df.unpersist()
    _BASKET_CACHE.clear()
    plan = _basket_lines(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "dv_bkt_lineitem_" in plan
    assert plan.count("Exchange hashpartitioning(l_orderkey") <= 1


def test_behavioral_family_rides_user_bucketed_events(spark, registry):
    """SCALE.md r14 census, second key class: the per-user analytics
    queries read the user_id-bucketed events copy and may not
    hash-partition on user_id — every per-user window/groupBy/self-
    join is satisfied by the scan partitioning. r15 closes the last
    two: events_asof_join rides asof_self_join and events_range_join
    rides range_count_self (in-place predicate tagging / RANGE-framed
    window), so neither carries the tagged UNION that discarded child
    partitioning — the whole family is now user_id-exchange-free."""
    for name in (
        "events_sessionized",
        "events_funnel",
        "events_retention",
        "event_transitions",
        "conversion_lag",
        "events_user_cap",
        "scd2_intervals",
        "events_asof_join",
        "events_range_join",
    ):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_events_" in plan, name
        assert "Exchange hashpartitioning(user_id" not in plan, name


def test_r15_custkey_family_rides_bucketed_copies(spark, registry):
    """SCALE.md r15, third key class: the per-customer consumers of
    RAW orders/customer read the o_custkey/c_custkey at-rest copies
    and may not hash-partition on either custkey — the copies'
    HashPartitioning satisfies every per-customer groupBy and the
    q13/q22/cdc key-to-key joins. (cdc_upsert's changes side still
    shuffles on its own `key` column — insert keys relocate by
    construction, a |delta|-scale exchange that is the point of the
    MERGE shape.)"""
    for name in (
        "orders_cohort_retention",
        "ivm_agg",
        "cdc_upsert",
        "q13_customer_distribution",
        "q22_prospective_customers",
    ):
        plan = plan_of(spark, registry, name)
        assert (
            "dv_bkt_orders_o_custkey_" in plan
            or "dv_bkt_customer_c_custkey_" in plan
        ), name
        assert "Exchange hashpartitioning(o_custkey" not in plan, name
        assert "Exchange hashpartitioning(c_custkey" not in plan, name
    # rfm_segments consumes the copy through its session-persisted
    # per-customer relation: assert the BUILD plan (the relation the
    # quantile engine and the final scoring both scan) is custkey-
    # exchange-free and reads the copy.
    from data_validator_spark.queries.warehouse_ops import _RFM_CACHE, _rfm_relation

    for df in _RFM_CACHE.values():
        df.unpersist()
    _RFM_CACHE.clear()
    plan = _rfm_relation(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "dv_bkt_orders_o_custkey_" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan


def test_r15_partkey_family_rides_bucketed_copies(spark, registry):
    """SCALE.md r15 late extension, fifth key class: q14/q17 join RAW
    lineitem to part with no orderkey meet — both now read the
    l_partkey/p_partkey at-rest copies and may not hash-partition on
    either partkey (q17's per-part average threshold and its
    join-back ride the same scan partitioning). fd_check's lineitem
    arm keys on l_partkey and rides the same copy."""
    for name in ("q14_promo_revenue", "q17_small_quantity_revenue", "fd_check"):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_lineitem_l_partkey_" in plan, name
        assert "Exchange hashpartitioning(l_partkey" not in plan, name
        assert "Exchange hashpartitioning(p_partkey" not in plan, name
    # q19's meet is on the DERIVED relations: partkey-bucketed ext
    # copies (lineitem_ext on l_partkey, part_ext on p_partkey), with
    # the shipmode/shipinstruct predicates pushed into the copy scan
    plan = plan_of(spark, registry, "q19_discounted_revenue")
    assert "dv_bkt_lineitem_ext_l_partkey_" in plan
    assert "dv_bkt_part_ext_p_partkey_" in plan
    assert "Exchange hashpartitioning(l_partkey" not in plan
    assert "Exchange hashpartitioning(p_partkey" not in plan


def test_r15_doc_family_rides_doc_bucketed_documents(spark, registry):
    """SCALE.md r15, fourth key class: the graded doc-family entries
    read the doc_id-bucketed documents copy, and the pure per-doc
    pipelines (text kernels + groupBy(doc_id) collapses) plan with
    ZERO exchanges — the in-row kernels and gram explodes preserve
    the scan's HashPartitioning(doc_id). (The below-cut doc-family
    entries stay on spread(load()) until the r16 grading rotation can
    cover their switch — the staged plan in SCALE.md.)"""
    zero_exchange = (
        "token_count",
        "text_quality",
        "lang_id",
        "doc_fingerprint",
        "gopher_quality",
        "char_entropy",
        "doc_chunk",
    )
    for name in zero_exchange:
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_documents_doc_id_" in plan, name
        # zero WIDE exchanges (a one-time BroadcastExchange inside a
        # session-persisted signal build is not a shuffle)
        assert "Exchange hashpartitioning" not in plan, name
        assert "Exchange roundrobin" not in plan, name
    for name in ("dsir_importance", "quality_ensemble", "tfidf_topk"):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_documents_doc_id_" in plan, name


def test_r15_asof_range_self_forms_are_window_only(spark, registry):
    """The union-free rewrites must not reintroduce a join: both plans
    are scan → filter → sort → window over the bucketed events copy —
    no Join operator, no Union, no row fan-out Generate."""
    for name in ("events_asof_join", "events_range_join"):
        plan = plan_of(spark, registry, name)
        assert "Window" in plan, name
        assert "Union" not in plan, name
        for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
            assert op not in plan, (name, op)


def test_r16_below_cut_doc_family_rides_doc_bucketed_documents(spark, registry):
    """SCALE.md r16, class closure (1): the 22 formerly-below-cut
    doc-family entries read the doc_id-bucketed documents copy and
    never re-shuffle raw documents on doc_id or pay a round-robin
    spread. Spot-pins one entry per module plus the heaviest
    consumers; the full set was census-verified at switch time."""
    for name in (
        "bm25_topk",
        "trigram_lm_score",
        "heavy_hitters_cms",
        "token_frequencies",
        "corpus_train_filter",
        "pii_scrub",
        "stratified_sample",
        "global_shuffle",
        "dedup_exact",
        "vocab_growth",
        "pareto_skyline",
        "inverted_index",
        "hll_distinct",
        "pmi_collocations",
    ):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_documents_doc_id_" in plan, name
        assert "Exchange RoundRobinPartitioning" not in plan, name


def test_r16_embeddings_family_rides_vec_bucketed_copy(spark, registry):
    """SCALE.md r16, class closure (2): the embeddings family serves
    from the vec_id-bucketed copy — zero vec_id hash exchanges (the
    scan partitioning carries the per-vector signal join-backs) and
    zero round-robin spreads anywhere in the family."""
    for name in (
        "similarity_topk",
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "dedup_embedding_cosine",
        "semdedup",
        "embedding_outliers",
        "cluster_purity",
        "knn_label_noise",
        "ann_recall_eval",
        "embedding_rp_jl",
        "kmeans_embeddings",
        "embedding_norm_quant",
    ):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_embeddings_vec_id_" in plan, name
        assert "Exchange hashpartitioning(vec_id" not in plan, name
        assert "Exchange rangepartitioning(vec_id" not in plan, name
        assert "Exchange RoundRobinPartitioning" not in plan, name
    # norm_quant is the pure map case: NO exchange of any kind
    plan = plan_of(spark, registry, "embedding_norm_quant")
    assert "Exchange" not in plan


def test_r17_dedup_family_rides_doc_bucketed_documents(spark, registry):
    """SCALE.md r17, class closure: the near-dup dedup family's shared
    relations (shingle hashes, LSH pairs, incremental index, simhash
    scan, source projections) build off the doc_id-bucketed documents
    copy — no raw-documents scan, no round-robin spread anywhere."""
    for name in (
        "dedup_simhash",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "minhash_containment",
        "ngram_novelty",
        "source_overlap",
        "dedup_incremental",
    ):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_documents_doc_id_" in plan, name
        assert "Exchange RoundRobinPartitioning" not in plan, name


def test_r17_confirm_joins_build_on_candidate_side(spark, registry):
    """The Jaccard-confirm shuffle-hash joins must build their hash
    maps over the candidate-scale pair relation (BuildLeft) and
    stream the corpus-scale shingle relation — never the reverse, and
    never a broadcast of the corpus side (the one plan that cannot
    survive 100 TB)."""
    import re

    for name in ("dedup_ngram_jaccard", "minhash_containment"):
        plan = plan_of(spark, registry, name)
        shj = re.findall(r"ShuffledHashJoin \[doc_[ab][^\n]*", plan)
        assert shj, (name, "expected shuffle-hash confirm joins")
        assert all("BuildLeft" in ln for ln in shj), (name, shj)


def test_r18_final_doc_sites_ride_doc_bucketed_documents(spark, registry):
    """SCALE.md r18, class closure: the LAST spread(load()) doc-family
    sites — the pipeline_ops trio, lang_id_confusion, and the
    multimodal family's shared media_table — read the doc_id-bucketed
    documents copy with no round-robin spread. With this, every
    corpus-kernel documents scan in the registry rides the copy; the
    only raw documents reads left are deliberate: watermark/pivot
    scalar probes (which must observe the SOURCE to guard copy
    freshness), incremental delta scans (which read source appends by
    design), and string_length_check (a validator validates the
    SOURCE table; the copy-trusting validators opted in through the
    content_wm="full" sha256 watermark instead)."""
    for name in (
        "domain_diversity",
        "sequence_pack",
        "dedup_keep_best",
        "split_contamination",
        "lang_id_confusion",
        "multimodal_meta",
        "multimodal_resize",
        "multimodal_frame_sample",
        "multimodal_features",
    ):
        plan = plan_of(spark, registry, name)
        assert "dv_bkt_documents_doc_id_" in plan, name
        assert "Exchange RoundRobinPartitioning" not in plan, name


def test_r18_dsir_scores_with_per_bucket_term(spark, registry):
    """The dsir scoring join must carry the pre-rounded per-bucket
    decimal term (t_dec), not re-derive the ln() ratio per (doc,
    bucket) row: the corpus-scale side is joined to ONE broadcast
    (the 4096-row bucket_terms relation) and the plan's only ln()
    evaluations sit inside that broadcast build side."""
    plan = plan_of(spark, registry, "dsir_importance")
    assert "t_dec" in plan
    # the cross join against the 1-row totals happens at model scale,
    # inside the broadcast build — the corpus side never cross-joins
    import re

    # final agg consumes t_dec * c, i.e. no LOG( in the agg projection
    # above the scoring join (all LOG sites live under BroadcastExchange)
    head = plan.split("BroadcastExchange", 1)[0]
    assert "LOG(" not in head and "ln(" not in head.lower()


def test_r19_lineitem_scan_rides_ride_copies(spark, registry):
    """r19 bucketed-copy scan class: the remaining timed spread(load())
    sites (q1, q20, col_stats, bloom_filter_semijoin) plus
    profile_table switch to their at-rest bucketed copies —
    bucket-file parallelism with no round-robin exchange.
    Row-identical by construction (same rows, different at-rest
    layout); the A/B seconds live in OPTIMIZATION_r19.md.
    drift_psi/benford_check were measured on the same ride and
    REVERTED (trivial-per-row passes lose to the 32-task stage floor
    under the driver methodology — same doc)."""
    expect = {
        "q1_pricing_summary": "dv_bkt_lineitem_l_orderkey_",
        "col_stats": "dv_bkt_lineitem_l_orderkey_",
        "profile_table": "dv_bkt_lineitem_l_orderkey_",
        "q20_potential_promotion": "dv_bkt_lineitem_l_partkey_",
        "bloom_filter_semijoin": "dv_bkt_orders_o_orderkey_",
    }
    for name, copy_prefix in expect.items():
        plan = plan_of(spark, registry, name)
        assert copy_prefix in plan, name
        if name == "q20_potential_promotion":
            # q20 joins the session-cached partsupp relation, whose
            # ONE-TIME build plan (spread() included) is re-printed
            # inside the InMemoryTableScan subtree — steady state
            # reads the cache; only the lineitem arm is pinned here
            continue
        assert "Exchange RoundRobinPartitioning" not in plan, name


def test_r19_corpus_train_filter_rides_ensemble_docs(spark, registry):
    """corpus_train_filter reads the session-persisted (doc_id, lang,
    text, norm) relation (_ensemble_docs) and fingerprints off the
    cached norm — its plan must hold an InMemoryTableScan and ZERO
    normalization regexes above it (the md5 is the only fingerprint
    work left per call)."""
    from data_validator_spark.queries.quality_ops import _ensemble_docs

    _ensemble_docs(spark, SF).count()  # prime, as the bench prime pass does
    plan = plan_of(spark, registry, "corpus_train_filter")
    assert "InMemoryTableScan" in plan
    head = plan.split("InMemoryTableScan", 1)[0]
    assert "regexp_replace" not in head
