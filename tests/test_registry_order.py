"""The driver grades registry entries in dict-insertion order and has
cut after exactly 50 entries in every graded round — so ordering IS
grading coverage. These tests pin the r11 rotation contract from
data_validator_spark/queries/__init__.py:GRADE_PRIORITY, plus the
auto-promote rule (r10 verdict item 2): an entry whose code or oracle
changes after the cut must ride INSIDE the graded budget — the r10
weak-marks came from exactly that ordering bug."""

from __future__ import annotations

import importlib.util
import pathlib

from data_validator_spark.queries import GRADE_PRIORITY, build_registry

DRIVER_GRADE_BUDGET = 50
ROOT = pathlib.Path(__file__).resolve().parent.parent

# Tier 0a — the 4 entries the r10 verdict marked WEAK (the
# exact_quantile ±inf rewrite / gate-aware ccnet oracle landed AFTER
# the r10 cut and the r10 local sweep never ran).
WEAK_R10 = {"col_quantiles", "mad_outliers", "rfm_segments", "ccnet_buckets"}

# Tier 0b — last driver-green row is r6 (rotated out four rounds
# running; the oldest evidence tier).
R6_STALE = {
    "dedup_keep_best", "split_contamination", "events_json_extract",
    "events_anomaly", "multimodal_meta", "multimodal_resize",
}

# Tiers 0c/1 — every r11-changed entry that fits the budget: the
# watermark-guarded findex plus the 39 outputs whose cosmetic
# corpus-scale orderBy was dropped (r10 verdict item 3).
R11_CHANGED_GRADED = {
    "dedup_index_refresh",
    "multimodal_frame_sample", "token_count", "text_quality", "lang_id",
    "doc_fingerprint", "q7_volume_shipping", "q9_product_profit",
    "events_sessionized", "events_asof_join", "events_range_join",
    "substring_dedup", "dsir_importance", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "minhash_containment", "dedup_clusters",
    "dedup_incremental", "gopher_quality", "tfidf_topk",
    "events_gap_fill", "char_entropy", "q4_order_priority",
    "embedding_norm_quant", "q18_large_volume", "ngram_contamination",
    "quality_ensemble", "similarity_ann_lsh", "dedup_embedding_cosine",
    "q3_shipping_priority", "embedding_outliers", "cluster_purity",
    "streaming_sessionized", "streaming_join", "doc_chunk",
    "repetition_strip", "cdc_upsert", "scd2_intervals", "ivm_agg",
    "events_rolling",
}

# r11-changed entries deliberately left BELOW the cut, each with a
# justification; their r11 evidence is the committed 3-SF local sweep.
# trigram_lm_score: its exact scores are aggregated by ccnet_buckets
# (tier 0a), so a value drift would flip a GRADED hash.
# dedup_exact / dedup_simhash / semdedup / pii_scrub / global_shuffle:
# all r10-driver-green and touched only by the zero-risk output-sort
# drop — they ceded their tier-1 slots to q7/q9/q3/q4/q18, whose
# bucketed-fact join rework is the riskier r11 change.
CHANGED_LOCAL_ONLY = {
    "trigram_lm_score", "dedup_exact", "dedup_simhash",
    "semdedup", "pii_scrub", "global_shuffle",
}

# No SQL oracle by design — EMPTY since r5 session 5: every registry
# entry carries a hash oracle.
ROWS_ONLY: set[str] = set()

# Entries below the cut with no driver row ever (new ops enter here
# when the budget is saturated, per the verify-skill contract).
# dedup_band_index_refresh (NEW r11): persisted minhash band-index
# table — 3-SF local sweeps + rebuild≡refresh pytests are its
# evidence.
NEW_LOCAL_ONLY: set[str] = {"dedup_band_index_refresh"}


def test_priority_list_matches_registry():
    q, _ = build_registry()
    assert set(GRADE_PRIORITY) == set(q), set(GRADE_PRIORITY) ^ set(q)


def test_new_and_stale_entries_fit_grading_budget():
    q, _ = build_registry()
    graded = set(list(q)[:DRIVER_GRADE_BUDGET])
    assert WEAK_R10 <= graded, WEAK_R10 - graded
    assert R6_STALE <= graded, R6_STALE - graded
    assert R11_CHANGED_GRADED <= graded, R11_CHANGED_GRADED - graded
    # the tiers exactly fill the budget — no wasted slot
    assert len(WEAK_R10 | R6_STALE | R11_CHANGED_GRADED) == DRIVER_GRADE_BUDGET
    assert not CHANGED_LOCAL_ONLY & graded  # below the cut by design


def test_rotated_out_entries_hold_recent_driver_green():
    """Whatever falls past the grading budget must already hold a
    driver-green row in CORRECTNESS_r10, r09 or r08 (the freshest
    evidence tiers), or be explicitly declared local-only."""
    import json

    def green(fname):
        d = json.loads((ROOT / fname).read_text())
        return {
            k for k, v in d.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
        }

    green_recent = (
        green("CORRECTNESS_r10.json")
        | green("CORRECTNESS_r09.json")
        | green("CORRECTNESS_r08.json")
    )
    q, _ = build_registry()
    overflow = list(q)[DRIVER_GRADE_BUDGET:]
    not_proven = [
        k for k in overflow
        if k not in green_recent
        and k not in ROWS_ONLY
        and k not in NEW_LOCAL_ONLY
        and k not in CHANGED_LOCAL_ONLY
    ]
    assert not not_proven, not_proven


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, ROOT / "tools" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_changed_since_cut_auto_promoted():
    """The auto-promote tripwire (r10 verdict item 2): recompute the
    cut-time hashes (tools/grade_cut_snapshot.json, regenerated ONLY in
    the commit that finalizes GRADE_PRIORITY) and flag any registry
    entry that changed since the cut — its query-function source, its
    oracle text, or a HELPER module its query module imports (one hop;
    this is what catches the r10 failure class, where
    operators/exact_quantile.py changed but the query functions of the
    entries it broke did not). Flagged entries must be inside the
    graded top-50 or named in CHANGED_LOCAL_ONLY / NEW_LOCAL_ONLY."""
    import json
    import os

    gc = _load_tool("grade_cut")
    snap = json.loads((ROOT / "tools" / "grade_cut_snapshot.json").read_text())
    cur_files = gc.source_hashes(str(ROOT))
    changed_files = {rel for rel in cur_files if snap["files"].get(rel) != cur_files[rel]}
    changed_files |= set(snap["files"]) - set(cur_files)
    changed_helpers = {rel for rel in changed_files if gc.is_helper(rel)}
    cur_entries = gc.entry_hashes(str(ROOT))
    deps = gc.module_deps(str(ROOT)) if changed_helpers else {}
    q, _ = build_registry()
    graded = set(list(q)[:DRIVER_GRADE_BUDGET])
    exempt = graded | CHANGED_LOCAL_ONLY | NEW_LOCAL_ONLY
    offenders = {}
    for name, fn in q.items():
        if name in exempt:
            continue
        if snap["entries"].get(name) != cur_entries[name]:
            offenders[name] = "query fn or oracle changed"
            continue
        rel = fn.__module__.replace(".", os.sep) + ".py"
        touched = ({rel} | deps.get(rel, set())) & changed_helpers
        if touched:
            offenders[name] = f"helper changed: {sorted(touched)}"
    assert not offenders, (
        "entries changed since the grading cut but not promoted into the "
        f"top-{DRIVER_GRADE_BUDGET} (re-cut GRADE_PRIORITY + rerun "
        f"tools/grade_cut.py, or declare them local-only): {offenders}"
    )


def test_bench_headline_keys_exist_in_registry():
    """Every benched query must be a registered query (typo guard), and
    every priority-tier entry (weak, stale, or changed — the queries
    with the least recent evidence) must be benched."""
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    q, _ = build_registry()
    missing = [k for k in bench.HEADLINE if k not in q]
    assert not missing, f"bench HEADLINE keys not in registry: {missing}"
    unbenched = [
        k for k in (WEAK_R10 | R6_STALE | R11_CHANGED_GRADED | CHANGED_LOCAL_ONLY)
        if k not in bench.HEADLINE
    ]
    assert not unbenched, f"priority entries missing from bench: {unbenched}"


def test_bench_prime_keys_exist_in_registry():
    """The prime-phase list must name real registry entries (typo
    guard — a misspelled primer would silently skip a cache build)."""
    import re

    q, _ = build_registry()
    # PRIME is local to main(); read it from the source text
    src = (ROOT / "bench.py").read_text()
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
    import json

    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
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
