"""The driver grades registry entries in dict-insertion order and has
cut after exactly 50 entries in every graded round — so ordering IS
grading coverage. These tests pin the r10 rotation contract from
data_validator_spark/queries/__init__.py:GRADE_PRIORITY."""

from __future__ import annotations

from data_validator_spark.queries import GRADE_PRIORITY, build_registry

DRIVER_GRADE_BUDGET = 50

# Tier 0 this round: the 6 r9 batch-2 operators that were never
# driver-graded (the r9 budget cut before reaching them — restoring
# the every-entry-driver-green invariant is r9 verdict item 1), and
# the entries whose execution changed or is re-audited in r10
# (pagerank_bipartite / multimodal_features perf work, the
# events_rolling bench anomaly, streaming_sessionized/join harness
# profiling).
NEW_OR_CHANGED = {
    # r9 batch-2, never driver-graded
    "embedding_rp_jl", "streaming_incremental_dedup", "source_overlap",
    "dedup_incremental_minhash", "ngram_novelty", "quality_calibration",
    # new in r10: persisted fingerprint-index table + refresh
    "dedup_index_refresh",
    # r10 engine changes / re-audits
    "pagerank_bipartite", "multimodal_features", "events_rolling",
    "streaming_sessionized", "streaming_join",
}

# Entries whose last driver-green row is CORRECTNESS_r05 — the oldest
# evidence tier left after r9 graded the whole r5-stale batch green
# (events_rolling is also r5-green but already sits in tier 0b).
R5_STALE = {
    "hll_distinct", "events_gap_fill", "events_time_weighted",
    "gopher_quality",
}

# r6-green rows that fit the remaining budget (the oldest bulk tier;
# the 7 that don't fit rotate below the cut on the local-proof rule).
R6_FILL = {
    "semdedup", "copurchase_similarity", "event_transitions",
    "conversion_lag", "weighted_sample", "repetition_strip",
    "global_shuffle", "multimodal_frame_sample", "streaming_validation",
    "quality_ensemble", "dsir_importance", "embedding_norm_quant",
    "corpus_train_filter", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "q17_small_quantity_revenue", "events_asof_join",
    "events_range_join", "events_funnel", "text_quality",
    "token_frequencies", "token_count", "doc_split_sample",
    "dedup_exact", "dedup_simhash", "salted_aggregation", "lang_id",
    "doc_fingerprint", "events_pivot", "events_retention",
    "similarity_topk", "pii_scrub", "stratified_sample",
    "sequence_pack",
}

# No SQL oracle by design — EMPTY since r5 session 5: every registry
# entry carries a hash oracle.
ROWS_ONLY: set[str] = set()

# Entries below the cut with no driver row ever — EMPTY as of r10:
# the r9 batch-2 operators grade first this round.
NEW_LOCAL_ONLY: set[str] = set()


def test_priority_list_matches_registry():
    q, _ = build_registry()
    assert set(GRADE_PRIORITY) == set(q), set(GRADE_PRIORITY) ^ set(q)


def test_new_and_stale_entries_fit_grading_budget():
    q, _ = build_registry()
    graded = set(list(q)[:DRIVER_GRADE_BUDGET])
    assert NEW_OR_CHANGED <= graded, NEW_OR_CHANGED - graded
    assert R5_STALE <= graded, R5_STALE - graded
    assert R6_FILL <= graded, R6_FILL - graded
    # the tiers exactly fill the budget — no wasted slot
    assert len(NEW_OR_CHANGED | R5_STALE | R6_FILL) == DRIVER_GRADE_BUDGET


def test_rotated_out_entries_hold_recent_driver_green():
    """Whatever falls past the grading budget must already hold a
    driver-green row in CORRECTNESS_r09, r08 or r06 (the freshest
    evidence tiers), or be rows-only by design."""
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent

    def green(fname):
        d = json.loads((root / fname).read_text())
        return {
            k for k, v in d.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        }

    green_recent = (
        green("CORRECTNESS_r09.json")
        | green("CORRECTNESS_r08.json")
        | green("CORRECTNESS_r06.json")
    )
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
        k for k in (NEW_OR_CHANGED | R5_STALE | R6_FILL)
        if k not in bench.HEADLINE
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


def test_bench_stdout_line_fits_driver_capture_window():
    """BENCH_r06/r08 both came back `parsed: null` because the full
    queries dict overflowed the driver's 2000-char stdout tail capture.
    compact_line must stay under the window for a registry-sized
    result set with worst-case timing widths."""
    import importlib.util
    import json
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    results = {name: 123.456 for name in bench.HEADLINE}
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": 0.1,
        "runs_per_query": 2,
        "prime_pass_sec": 41.51,
        "cc_chain": {
            "propagation_sec": 7.772, "propagation_rounds": 32,
            "star_sec": 7.303, "star_rounds": 6,
        },
    }
    line = bench.compact_line(out, "BENCH_FULL.json")
    assert len(line) <= 2000 - 100  # margin for driver framing
    parsed = json.loads(line)
    assert parsed["value"] == out["value"]
    assert parsed["queries"]  # at least some per-query detail survives
    assert parsed["queries_omitted"] + len(parsed["queries"]) == len(results)
    assert parsed["n_errors"] == 0
    # error sentinels are excluded from timing sums but explicitly
    # counted, so omitted-vs-errored stays distinguishable (ADVICE r9)
    bad = dict(results)
    bad[next(iter(bad))] = -1.0
    parsed_bad = json.loads(bench.compact_line({**out, "queries": bad}, "f"))
    assert parsed_bad["n_errors"] == 1
    assert parsed_bad["fast_queries_total_sec"] >= 0
