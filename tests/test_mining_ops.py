"""Semantic tests for the mining operators (mining_ops): crafted
inputs through the real query functions via tmp parquet dirs shaped
like the synthetic testdata, plus accuracy/shape checks on sf0.001."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    rows = [
        # doc 0: high-diversity text -> passes the Gopher rules
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0", 56),
        # doc 1: one token dominates -> fails top_token_frac
        (1, "spam spam spam spam spam spam spam spam spam ham", "en", "s0", 49),
        # doc 2: repeated bigrams -> high dup_bigram_frac
        (2, "go stop go stop go stop go stop go stop go stop", "en", "s0", 47),
        # doc 3: the strong collocation pair, repeated across docs
        (3, "new york new york new york traffic report daily", "en", "s1", 47),
        (4, "new york weather and new york subway news today", "en", "s1", 47),
        (5, "visiting new york was great fun for everyone there", "en", "s1", 50),
        # doc 6: single token (no bigrams at all)
        (6, "solo", "en", "s1", 4),
    ]
    d = tmp_path_factory.mktemp("mining_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_gopher_quality_flags(spark, doc_dir):
    from data_validator_spark.queries.mining_ops import q_gopher_quality

    rows = {r["doc_id"]: r for r in q_gopher_quality(spark, doc_dir).collect()}
    # diverse doc passes
    assert rows[0]["keep"] == 1
    assert rows[0]["distinct_ratio"] == pytest.approx(1.0)
    # spam doc: 9/10 same token -> fails top_token_frac
    assert rows[1]["top_token_frac"] == pytest.approx(0.9)
    assert rows[1]["keep"] == 0
    # go/stop doc: every bigram instance is a repeat -> dup mass 1.0
    assert rows[2]["dup_bigram_frac"] == pytest.approx(1.0)
    assert rows[2]["keep"] == 0
    # single-token doc: no bigrams, dup fraction coalesces to 0
    assert rows[6]["n_tokens"] == 1 and rows[6]["dup_bigram_frac"] == 0.0


def test_pmi_finds_collocation(spark, doc_dir):
    from data_validator_spark.queries.mining_ops import q_pmi_collocations

    rows = q_pmi_collocations(spark, doc_dir).collect()
    # "new york" and "go stop" each occur 6 times (>= min support) with
    # unigram counts 6/6 -> equal PMI; the tie breaks on the bigram
    assert rows, "no collocations found"
    by_bigram = {r["bigram"]: r for r in rows}
    assert "new york" in by_bigram and by_bigram["new york"]["c_xy"] == 6
    assert rows[0]["bigram"] == "go stop"  # alphabetical tiebreak
    assert rows[0]["pmi"] == pytest.approx(by_bigram["new york"]["pmi"])
    # PMI must be positive for a true collocation
    assert by_bigram["new york"]["pmi"] > 0
    # output sorted by (pmi desc, bigram)
    keys = [(-r["pmi"], r["bigram"]) for r in rows]
    assert keys == sorted(keys)


def test_tfidf_rank_and_idf_semantics(spark, doc_dir):
    from data_validator_spark.queries.mining_ops import q_tfidf_topk, TFIDF_K

    rows = q_tfidf_topk(spark, doc_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_K
        # tfidf non-increasing with rank
        vals = [r["tfidf"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert vals == sorted(vals, reverse=True)
    # a corpus-unique term ("ham", df=1) must outrank the dominant but
    # not exclusive "spam"? no — tf wins here; instead check idf=ln(7)
    ham = [r for r in by_doc[1] if r["term"] == "ham"]
    if ham:
        assert ham[0]["df"] == 1
    # doc 0's terms are all unique in-doc: tf=1, so tfidf = ln(7/df)
    r0 = by_doc[0][0]
    assert r0["tfidf"] == pytest.approx(r0["tf"] * math.log(7 / r0["df"]), abs=1e-6)


def test_inverted_index_postings_sorted_and_capped(spark):
    from data_validator_spark.queries.mining_ops import (
        q_inverted_index,
        IDX_POSTINGS,
        IDX_TOP_TERMS,
    )

    rows = q_inverted_index(spark, SF).collect()
    assert 0 < len(rows) <= IDX_TOP_TERMS
    # df descending with term tiebreak
    keys = [(-r["df"], r["term"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= IDX_POSTINGS
        assert len(ids) == min(r["df"], IDX_POSTINGS)
        assert r["total_tf"] >= r["df"]


def test_hll_estimate_accuracy(spark):
    from data_validator_spark.queries.mining_ops import q_hll_distinct

    rows = {r["metric"]: r for r in q_hll_distinct(spark, SF).collect()}
    assert set(rows) == {"tokens", "fingerprints"}
    for r in rows.values():
        assert 0 <= r["v_empty"] <= 1024
        # HLL with m=1024 has ~3.25% relative error (1.04/sqrt(m));
        # allow 4 sigma
        assert r["n_est"] == pytest.approx(r["n_exact"], rel=0.13)


def test_gap_fill_grid_dense_and_interpolated(spark):
    from data_validator_spark.queries.mining_ops import q_events_gap_fill

    rows = q_events_gap_fill(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        hs = [r["h"] for r in rs]
        # dense hourly grid: contiguous hours, no holes
        assert hs == list(range(min(hs), max(hs) + 1))
        # boundary rows are observed (grid spans observed min..max)
        assert rs[0]["is_gap"] == 0 and rs[-1]["is_gap"] == 0
        for r in rs:
            assert r["avg_value_filled"] is not None
            assert (r["n_events"] == 0) == (r["is_gap"] == 1)
    # gap rows interpolate strictly between neighbors
    for t, rs in by_type.items():
        for i, r in enumerate(rs):
            if r["is_gap"] == 1:
                prev = next(x for x in reversed(rs[:i]) if x["is_gap"] == 0)
                nxt = next(x for x in rs[i + 1 :] if x["is_gap"] == 0)
                lo = min(prev["avg_value_filled"], nxt["avg_value_filled"])
                hi = max(prev["avg_value_filled"], nxt["avg_value_filled"])
                assert lo - 1e-6 <= r["avg_value_filled"] <= hi + 1e-6


def test_time_weighted_average_semantics(spark, tmp_path):
    import pandas as pd

    # crafted series: value 10 held for 3us, value 0 held for 1us ->
    # tw_avg = (10*3 + 0*1) / 4 = 7.5 (arithmetic mean would be 5)
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime([1_000_000_000, 1_000_000_003, 1_000_000_004], unit="us"),
            "user_id": [1, 1, 1],
            "event_type": ["a", "a", "a"],
            "value": [10.0, 0.0, 99.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    d = tmp_path / "tw"
    d.mkdir()
    spark.createDataFrame(rows).coalesce(1).write.parquet(str(d / "events.parquet"))
    from data_validator_spark.queries.mining_ops import q_events_time_weighted

    out = q_events_time_weighted(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 3
    assert r["span_us"] == 4
    assert r["tw_avg"] == 7.5  # final value (99) holds no duration


def test_char_entropy_orders_quality(spark, doc_dir):
    import math

    from data_validator_spark.queries.mining_ops import q_char_entropy

    rows = {r["doc_id"]: r for r in q_char_entropy(spark, doc_dir).collect()}
    # the diverse doc has strictly higher entropy than the spam doc
    assert rows[0]["entropy"] > rows[1]["entropy"]
    # doc 6 "solo": chars s,o,l,o -> p = (1/4, 1/2, 1/4)
    expect = -(2 * 0.25 * math.log(0.25) + 0.5 * math.log(0.5))
    assert rows[6]["entropy"] == pytest.approx(expect, abs=1e-5)
    for r in rows.values():
        assert r["entropy"] >= 0
        assert r["keep"] in (0, 1)


def test_hll_null_text_matches_oracle(spark, tmp_path):
    """NULL-text semantics are deliberate (ADVICE r18): the oracle's
    fingerprint branch emits md5(NULL) = NULL for a NULL-text doc,
    whose register GROUP BY keeps a NULL bucket — one n_buckets slot,
    nothing added to the register sum or COUNT(DISTINCT v). Before
    r19, concat's NULL propagation silently dropped the doc from BOTH
    Spark streams, so estimates would have drifted the moment NULL
    text appeared. Full engine-vs-DuckDB parity on a corpus WITH a
    NULL-text doc pins the alignment."""
    import duckdb

    from data_validator_spark.queries import build_registry, evict_session_caches
    from data_validator_spark.queries.mining_ops import q_hll_distinct

    rows = [
        (0, "alpha beta gamma", "en", "s0", 16),
        (1, "beta gamma delta epsilon", "en", "s0", 24),
        (2, None, "en", "s0", 0),          # the NULL-text doc
        (3, "", "en", "s0", 0),            # and the empty-text doc
        (4, "alpha beta", "en", "s0", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    try:
        got = sorted(tuple(r) for r in q_hll_distinct(spark, str(tmp_path)).collect())
        _, oracles = build_registry()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path}/documents.parquet/*.parquet')"
        )
        want = sorted(tuple(r) for r in con.execute(oracles["hll_distinct"]).fetchall())
        assert got == want
    finally:
        evict_session_caches(str(tmp_path))
