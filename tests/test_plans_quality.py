"""Physical-plan assertions for the session-4 quality/selection
operators: the scale properties their docstrings claim (zero wide
joins, single shuffled verification join, map-only fan-out, cache
reuse, all-native expression evaluation) must appear in the executed
plan."""

from __future__ import annotations

import pytest

from data_validator_spark.queries import build_registry

SF = "/root/testdata/sf0.001"

WIDE_JOINS = ("SortMergeJoin", "ShuffledHashJoin")


@pytest.fixture(scope="module")
def registry():
    q, _ = build_registry()
    return q


def plan_of(spark, registry, name):
    return registry[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def n_wide_joins(plan: str) -> int:
    return sum(plan.count(j) for j in WIDE_JOINS)


def test_drift_psi_has_no_wide_joins(spark, registry):
    """Both PSI passes are scan+aggregate with broadcast scalars —
    a shuffled join anywhere means the stats row stopped
    broadcasting."""
    plan = plan_of(spark, registry, "drift_psi")
    assert n_wide_joins(plan) == 0


def test_drift_ks_has_no_wide_joins(spark, registry):
    plan = plan_of(spark, registry, "drift_ks")
    assert n_wide_joins(plan) == 0
    assert "Window" in plan  # the ECDF cumulative pass


def test_benford_single_table_no_wide_joins(spark, registry):
    plan = plan_of(spark, registry, "benford_check")
    assert n_wide_joins(plan) == 0


def test_fd_check_is_pure_aggregation(spark, registry):
    """Five candidate FDs = three-level aggregation cascades; no join
    operator of any kind belongs in this plan, and no Expand — the
    distinct-rhs count comes from the (lhs,rhs) pre-aggregation, not
    a countDistinct rewrite that would double every shuffled row at
    scale (r7)."""
    plan = plan_of(spark, registry, "fd_check")
    assert "Join" not in plan
    assert "Expand" not in plan


def test_key_skew_audit_is_pure_aggregation(spark, registry):
    """The heavy path is the two-level aggregation cascade; the only
    join allowed is the 4-row literal key-dimension broadcast that
    guarantees the one-row-per-audited-key output shape."""
    plan = plan_of(spark, registry, "key_skew_audit")
    assert n_wide_joins(plan) == 0, plan
    assert "BroadcastHashJoin" in plan


def test_mad_outliers_has_no_wide_joins(spark, registry):
    """Median/MAD scalars must broadcast into the scan passes."""
    plan = plan_of(spark, registry, "mad_outliers")
    assert n_wide_joins(plan) == 0


def test_fk_integrity_single_shuffled_verification_join(spark, registry):
    """All six FK edges verify through ONE shuffled full-outer join of
    the tagged key relations."""
    plan = plan_of(spark, registry, "fk_integrity")
    assert n_wide_joins(plan) == 1, plan.count("Join")


def test_doc_chunk_is_map_only(spark, registry):
    """Chunking fans out in-row; the only exchange allowed is the
    final output ordering's range partitioning."""
    plan = plan_of(spark, registry, "doc_chunk")
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_quality_ensemble_stays_jvm_native(spark, registry):
    """The fused three-signal plan must contain no Python evaluation
    stage — every signal is native column expressions."""
    plan = plan_of(spark, registry, "quality_ensemble")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_triangle_count_reuses_cached_pair_relation(spark, registry):
    """The LSH candidate-pair relation is persisted per session; the
    triangle plan must read the cache, not re-derive the LSH pipeline
    for each of its self-join arms."""
    plan = plan_of(spark, registry, "triangle_count")
    assert "InMemoryTableScan" in plan


def test_semdedup_reuses_cached_assignment(spark, registry):
    """The IVF coarse assignment is persisted per session (an index
    build); semdedup's cluster census and pair-kernel input must read
    that cache, not re-run scan + centroid probe + argmax window. The
    pair search itself must be the per-cluster Arrow kernel (r7) —
    one FlatMapGroupsInPandas stage, NO pair self-join — the only
    join left is the ≤nlist-row census ⋈ dropped-count left join."""
    registry["similarity_ann_ivf"](spark, SF)
    plan = plan_of(spark, registry, "semdedup")
    assert "InMemoryTableScan" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert n_wide_joins(plan) <= 1
    # degenerate clusters are dropped BEFORE the grouped-map shuffle —
    # the broadcast semi-join against the census must be in the plan
    assert "LeftSemi" in plan


def test_pagerank_broadcasts_rank_relation(spark, registry):
    """Each power iteration joins edges against the BROADCAST rank
    relation — the edge side must never shuffle for the join — and
    the contribution sums are fixed-point BIGINT (r7): no decimal
    aggregate buffer belongs in this plan. r10: the groupBy(dst)
    inherits the edge checkpoint's HashPartitioning, so NO iteration
    may insert a dst shuffle (the only dst repartition lives inside
    the cached edge plan as REPARTITION_BY_COL, paid once at build)."""
    plan = plan_of(spark, registry, "pagerank_bipartite")
    assert "BroadcastHashJoin" in plan
    assert "decimal(38,18)" not in plan
    ensure_dst = [
        ln
        for ln in plan.splitlines()
        if "ENSURE_REQUIREMENTS" in ln and "hashpartitioning(dst" in ln
    ]
    assert not ensure_dst, ensure_dst


def test_copurchase_pairs_fan_out_in_row(spark, registry):
    """Pairs derive map-side from the persisted capped basket arrays
    (r7): the plan must read the cache and fan out via Generate
    (explode) — the order-keyed self-join and basket-census join are
    gone, and since r18 the part counts ride the array elements, so
    steady state has NO join at all (the old per-call broadcast of
    the SF-proportional part-frequency relation was itself the last
    scale hazard here)."""
    from data_validator_spark.plans.audit import prune_cached_subtrees

    registry["copurchase_similarity"](spark, SF)  # build the cache
    plan = plan_of(spark, registry, "copurchase_similarity")
    assert "InMemoryTableScan" in plan
    assert "Generate explode" in plan
    # prune the cached relation's re-printed BUILD plan (it carries
    # the one-time count-attach join); the steady-state query itself
    # must be join-free
    assert "Join" not in prune_cached_subtrees(plan)


def test_corr_matrix_single_scan_no_joins(spark, registry):
    """The whole 15-term moment aggregate fuses into ONE lineitem
    scan; the 6 pair rows fan out in-row (Generate over the scalar
    aggregate) — a second scan or any join means the fusion broke."""
    plan = plan_of(spark, registry, "corr_matrix")
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")
    assert n_wide_joins(plan) == 0
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_embedding_outliers_reuses_index_broadcasts_stats(spark, registry):
    """Both passes read the SESSION-PERSISTED IVF assignment (the
    shared index build) and every join is broadcast (centroid set,
    ≤nlist stats relation) — a wide join means the corpus shuffled
    for what must stay a map-side lookup."""
    registry["embedding_outliers"](spark, SF)  # build the cache
    plan = plan_of(spark, registry, "embedding_outliers")
    assert "InMemoryTableScan" in plan
    assert n_wide_joins(plan) == 0
    assert "BroadcastHashJoin" in plan


def test_cluster_purity_reuses_index_no_wide_joins(spark, registry):
    """Purity reads the SESSION-PERSISTED IVF assignment; after the
    one map-side-combined (list_id, label) count shuffle everything
    runs on the <= nlist x n_labels count relation — a wide join
    anywhere means the corpus shuffled for what must stay a cached
    read + bounded aggregate."""
    registry["cluster_purity"](spark, SF)  # build the cache
    plan = plan_of(spark, registry, "cluster_purity")
    assert "InMemoryTableScan" in plan
    assert n_wide_joins(plan) == 0


def test_knn_label_noise_blocked_kernel_no_wide_joins(spark, registry):
    """The vote runs as a per-cluster Arrow-batched grouped-map kernel
    over the cached assignment (the semdedup shape): the census cap
    join must be broadcast and no pair self-join relation may exist."""
    registry["knn_label_noise"](spark, SF)  # build the cache
    plan = plan_of(spark, registry, "knn_label_noise")
    assert "FlatMapGroupsInPandas" in plan
    assert "InMemoryTableScan" in plan
    assert n_wide_joins(plan) == 0
    assert "BroadcastHashJoin" in plan
