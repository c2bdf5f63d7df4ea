"""The driver grades registry entries in dict-insertion order and has
cut after exactly 50 entries in every graded round — so ordering IS
grading coverage. These tests pin the r6 rotation contract from
data_validator_spark/queries/__init__.py:GRADE_PRIORITY."""

from __future__ import annotations

from data_validator_spark.queries import GRADE_PRIORITY, build_registry

DRIVER_GRADE_BUDGET = 50

# Tier 0 this round: the 10 entries that had never been driver-graded
# before r6 (7 added after the r5 budget saturated + 3 whose hash
# oracles postdate their last driver row), plus the 5 entries whose
# physical plans change this round (approx_profile wiring, shared
# sub-relations, pagerank fused aggregates, embedding_norm_quant
# re-pin) — all MUST be inside the grading budget.
NEW_OR_CHANGED = {
    "event_transitions", "conversion_lag", "weighted_sample",
    "semdedup", "repetition_strip", "global_shuffle",
    "copurchase_similarity", "multimodal_frame_sample",
    "multimodal_features", "streaming_validation",
    "mad_outliers", "quality_ensemble", "dsir_importance",
    "pagerank_bipartite", "embedding_norm_quant",
}

# Entries whose last driver-green row is CORRECTNESS_r03 (rotated out
# of the r4 and r5 budgets) — refreshed this round.
R3_STALE = {
    "q15_top_supplier", "q17_small_quantity_revenue", "q18_large_volume",
    "q22_prospective_customers", "events_asof_join", "events_range_join",
    "events_funnel", "text_quality", "token_frequencies",
    "corpus_train_filter", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "token_count", "doc_split_sample", "dedup_exact", "dedup_simhash",
    "salted_aggregation", "lang_id", "doc_fingerprint",
    "events_windowed", "events_pivot", "events_retention",
    "events_rollup",
}

# No SQL oracle by design — EMPTY since r5 session 5: every registry
# entry carries a hash oracle.
ROWS_ONLY: set[str] = set()

# Entries below the budget cut with no driver row — EMPTY as of r6:
# the r5 backlog was promoted into tier 0a.
NEW_LOCAL_ONLY: set[str] = set()


def test_priority_list_matches_registry():
    q, _ = build_registry()
    assert set(GRADE_PRIORITY) == set(q), set(GRADE_PRIORITY) ^ set(q)


def test_new_and_stale_entries_fit_grading_budget():
    q, _ = build_registry()
    graded = set(list(q)[:DRIVER_GRADE_BUDGET])
    assert NEW_OR_CHANGED <= graded, NEW_OR_CHANGED - graded
    assert R3_STALE <= graded, R3_STALE - graded


def test_rotated_out_entries_hold_recent_driver_green():
    """Whatever falls past the grading budget must already hold a
    driver-green row in CORRECTNESS_r05 or r04 (the freshest evidence
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

    green_recent = green("CORRECTNESS_r05.json") | green("CORRECTNESS_r04.json")
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
        k for k in (NEW_OR_CHANGED | R3_STALE) if k not in bench.HEADLINE
    ]
    assert not unbenched, f"priority entries missing from bench: {unbenched}"
