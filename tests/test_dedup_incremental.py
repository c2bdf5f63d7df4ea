"""dedup_incremental: the batch-append dedup must scan ONLY the
append delta (verdict r8 item 7), route bloom-negative rows around
the index join, and flag planted duplicates correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validator_spark.queries.dedup import (
    DELTA_FRAC,
    _incremental_index,
    _incremental_pivot,
    q_dedup_incremental,
)

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_plan_scans_delta_not_corpus(spark):
    """After the index is session-persisted, the graded execution's
    only LIVE parquet relations are the two delta branches (bloom-pass
    and bloom-fail) with the literal pivot pushed down; every
    corpus-side consumer resolves to the persisted InMemoryRelation.
    (Plan toString prints the cached child inside InMemoryRelation /
    InMemoryTableScan, so live leaves are counted via the optimized
    logical plan's `Relation` lines, which cached subtrees don't
    emit.)"""
    _incremental_index(spark, SF)  # build + persist the index once
    pivot = _incremental_pivot(spark, SF)
    df = q_dedup_incremental(spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    live = [
        ln for ln in opt.splitlines()
        if "- Relation [" in ln and "parquet" in ln
    ]
    assert len(live) == 2, live  # the two delta branches, nothing else
    # corpus index (x1 exact join) + bloom bits (x3 markers) all cached
    assert opt.count("InMemoryRelation") >= 4
    plan = _executed_plan(df)
    # the literal pivot reaches the delta parquet scan
    assert f"GreaterThanOrEqual(doc_id,{pivot})" in plan
    # the bloom markers broadcast — no shuffle on the delta probe side
    assert "BroadcastHashJoin" in plan


def test_planted_duplicates_flagged(spark, tmp_path):
    """Synthetic corpus with known duplicates across the pivot:
    - doc 95 repeats corpus doc 3's text    -> dup_of_corpus
    - docs 96 and 97 share fresh text       -> 97 dup_in_delta
    - doc 98 is novel                       -> keep
    max_id=99 -> pivot = floor(100 * DELTA_FRAC) = 90."""
    assert DELTA_FRAC == 0.9
    rows = [(i, f"unique corpus text number {i}") for i in range(95)]
    rows += [
        (95, "unique corpus text number 3"),  # dup of corpus doc 3
        (96, "fresh shared text"),
        (97, "fresh shared text"),            # dup of 96 within delta
        (98, "completely novel text"),
        (99, "unique corpus text number 42"),  # dup of corpus doc 42
    ]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d)
    )
    out = {
        r["doc_id"]: r
        for r in q_dedup_incremental(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(range(90, 100))
    assert out[95]["dup_of_corpus"] == 1 and out[95]["keep"] == 0
    assert out[95]["bloom_pass"] == 1  # bloom never drops a true match
    assert out[99]["dup_of_corpus"] == 1 and out[99]["bloom_pass"] == 1
    assert out[96]["dup_in_delta"] == 0 and out[96]["dup_of_corpus"] == 0
    assert out[97]["dup_in_delta"] == 1 and out[97]["keep"] == 0
    assert out[98]["keep"] == 1
    # delta docs 90-94 are unique corpus-side continuations -> novel
    for i in range(90, 95):
        assert out[i]["dup_of_corpus"] == 0 and out[i]["keep"] == 1


def test_bloom_negative_rows_bypass_index_join(spark, tmp_path):
    """All-novel delta: every row must be decided without the exact
    index join contributing matches (dup_of_corpus all zero), and the
    result keeps every doc."""
    rows = [(i, f"text {i}") for i in range(40)]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(d)
    )
    out = q_dedup_incremental(spark, str(tmp_path))
    agg = out.agg(
        F.sum("dup_of_corpus").alias("dc"),
        F.sum("dup_in_delta").alias("dd"),
        F.sum("keep").alias("k"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert agg["dc"] == 0 and agg["dd"] == 0
    assert agg["k"] == agg["n"] == 4  # pivot = floor(40*0.9) = 36
