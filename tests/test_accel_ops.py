"""Semantic tests for accel_ops: Bloom semi-join audit invariants,
Pareto-skyline dominance correctness vs a brute-force check, rolling
window vs hand-computed trailing sums."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_bloom_semijoin_invariants(spark):
    from data_validator_spark.queries.accel_ops import q_bloom_filter_semijoin

    row = q_bloom_filter_semijoin(spark, SF).collect()[0]
    # no false negatives: bloom pass is a superset of the exact match
    assert row["n_bloom_pass"] >= row["n_exact"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_exact"]
    # the filter must actually filter (selective segment)
    assert row["n_bloom_pass"] < row["n_orders"]
    assert row["n_exact"] > 0
    # with m=16384 bits vs a few hundred keys, FP rate should be tiny
    assert row["n_false_pos"] <= 0.05 * row["n_orders"]


def test_pareto_skyline_matches_bruteforce(spark):
    from data_validator_spark.queries.accel_ops import q_pareto_skyline
    from data_validator_spark.queries import load
    from pyspark.sql import functions as F

    sky = {r["doc_id"] for r in q_pareto_skyline(spark, SF).collect()}

    df = load(spark, SF, "documents")
    toks = df.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    ).where(F.length("t") > 0)
    vocab = toks.groupBy("doc_id").agg(F.countDistinct("t").alias("v"))
    docs = [
        (r["doc_id"], r["n_chars"], r["v"])
        for r in df.select("doc_id", "n_chars").join(vocab, "doc_id").collect()
    ]
    brute = set()
    for d, c, v in docs:
        dominated = any(
            (v2 >= v and c2 <= c and (v2 > v or c2 < c)) for _, c2, v2 in docs
        )
        if not dominated:
            brute.add(d)
    assert sky == brute


def test_rolling_window_trailing_sums(spark):
    from data_validator_spark.queries.accel_ops import q_events_rolling, ROLL_HOURS

    rows = q_events_rolling(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        # hand-compute the trailing sum over the RANGE frame
        for i, r in enumerate(rs):
            lo = r["h"] - (ROLL_HOURS - 1)
            expect = sum(x["cnt"] for x in rs if lo <= x["h"] <= r["h"])
            assert r["roll_cnt"] == expect, (t, r["h"])
        # first row's window contains only itself
        assert rs[0]["roll_cnt"] == rs[0]["cnt"]


def test_rrf_fusion_semantics(spark):
    from data_validator_spark.queries.accel_ops import (
        q_rrf_fusion,
        RRF_K,
        RRF_TOPK,
    )

    rows = q_rrf_fusion(spark, SF).collect()
    assert 0 < len(rows) <= RRF_TOPK
    # rrf descending with doc_id tiebreak
    keys = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        expect = 0.0
        if r["rank_rel"] is not None:
            expect += 1.0 / (RRF_K + r["rank_rel"])
        if r["rank_qual"] is not None:
            expect += 1.0 / (RRF_K + r["rank_qual"])
        assert r["rrf"] == pytest.approx(expect, abs=1e-6)
    # a doc in both candidate lists at rank 1 would score 2/(K+1);
    # everything is bounded by that
    assert all(r["rrf"] <= 2.0 / (RRF_K + 1) + 1e-9 for r in rows)
