"""Semantic asserts for the derived TPC-H relations (tpch_ext): the
queries themselves are oracle-checked against DuckDB; these tests pin
the derivation invariants the oracle comparison alone wouldn't explain
if they broke."""

from __future__ import annotations

from pyspark.sql import functions as F

import data_validator_spark.queries.tpch_ext as tx

SF = "/root/testdata/sf0.001"


def test_partsupp_keys_unique_and_in_range(spark):
    ps = tx.partsupp_df(spark, SF)
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    n_part = spark.read.parquet(f"{SF}/part.parquet").count()
    row = ps.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_partkey", "ps_suppkey").alias("nd"),
        F.min("ps_suppkey").alias("lo"),
        F.max("ps_suppkey").alias("hi"),
        F.min("ps_availqty").alias("qlo"),
        F.max("ps_availqty").alias("qhi"),
        F.min("ps_supplycost").alias("clo"),
        F.max("ps_supplycost").alias("chi"),
    ).first()
    assert row["n"] == 4 * n_part
    assert row["nd"] == row["n"]  # (partkey, suppkey) unique by construction
    assert 1 <= row["lo"] and row["hi"] <= n_supp
    assert 1 <= row["qlo"] and row["qhi"] <= 9999
    assert 1.0 <= row["clo"] and row["chi"] <= 1000.0


def test_lineitem_ext_derived_columns(spark):
    li = tx.lineitem_ext_df(spark, SF)
    ship = F.to_date("l_shipdate")
    row = li.agg(
        F.sum(F.when(F.col("l_shipmode").isin(*tx.MODES), 0).otherwise(1)).alias("bad_mode"),
        F.sum(F.when(F.col("l_shipinstruct").isin(*tx.INSTRUCTS), 0).otherwise(1)).alias("bad_instr"),
        F.min(F.datediff("l_commitdate", ship)).alias("cd_lo"),
        F.max(F.datediff("l_commitdate", ship)).alias("cd_hi"),
        F.min(F.datediff("l_receiptdate", ship)).alias("rd_lo"),
        F.max(F.datediff("l_receiptdate", ship)).alias("rd_hi"),
    ).first()
    assert row["bad_mode"] == 0 and row["bad_instr"] == 0
    assert -30 <= row["cd_lo"] and row["cd_hi"] <= 30
    assert 1 <= row["rd_lo"] and row["rd_hi"] <= 30


def test_derivation_is_stable_across_partitionings(spark):
    """The derived columns must be pure functions of the row (no
    nondeterminism): recomputing under a different partitioning yields
    the identical relation."""
    a = tx.lineitem_ext_df(spark, SF).select(
        "l_orderkey", "l_linenumber", "l_shipmode", "l_commitdate"
    )
    b = (
        tx.lineitem_ext_df(spark, SF)
        .repartition(7)
        .select("l_orderkey", "l_linenumber", "l_shipmode", "l_commitdate")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_q12_pushes_shipdate_bound_to_scan(spark, monkeypatch):
    """The receipt-window filter sits on derived columns, so q12
    explicitly pushes the equivalent l_shipdate bound. With the
    session cache bypassed (the real-deployment shape, where the ship
    columns come straight off the table), the parquet scan must show
    a pushed filter on l_shipdate."""
    # Spark's CacheManager substitutes any matching persisted plan
    # fragment, so bypassing _cached is not enough — drop the persisted
    # relations too (later tests re-materialize on demand).
    for df in tx._EXT_CACHE.values():
        df.unpersist()
    tx._EXT_CACHE.clear()
    monkeypatch.setattr(tx, "_cached", lambda spark, sf, name, build: build())
    plan = tx.q12_shipmode_priority(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters: [", 1)[1][:200]


def test_lineitem_ext_is_cached_for_consumers(spark):
    """q19 reads the session-persisted derived relation — the executed
    plan must read the in-memory relation, not re-run the md5
    derivation against parquet (r6 explain finding: unpersisted, the
    derived filter ran on ONE scan split). q12/q21 moved OFF this
    cache in r13: they read the at-rest bucketed copy, whose scan must
    appear (bucketed, with the shipmode filter pushed down) instead of
    an InMemoryTableScan."""
    tx.lineitem_ext_df(spark, SF).count()  # materialize
    plan = tx.q19_discounted_revenue(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    q12_plan = (
        tx.q12_shipmode_priority(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "dv_bkt_lineitem_ext_" in q12_plan
    assert "InMemoryTableScan" not in q12_plan


def test_q21_scans_lineitem_exactly_once(spark):
    """The r13 q21 rewrite's scale property: the per-order census
    (min/max/count over late suppkeys) answers BOTH exists arms and
    names the waiting supplier, so lineitem_ext must appear as exactly
    ONE scan in the physical plan (the r11 shape re-read it for the
    late rows) — at 100 TB a second fact scan is the single largest
    avoidable cost in this query."""
    import re

    plan = (
        tx.q21_waiting_orders(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Scan parquet \S*dv_bkt_lineitem_ext_", plan)) == 1
    assert len(re.findall(r"Scan parquet \S*dv_bkt_orders_", plan)) == 1
