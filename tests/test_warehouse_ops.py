"""Semantic tests for the warehouse-maintenance operators (CDC MERGE +
SCD2 history) on crafted inputs."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def wh_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("wh")
    cust = [
        # key 0: %7==0 -> updated
        (0, "a", 1, 100.0, "SEG"),
        # key 3: %13==3 (and %7!=0) -> deleted
        (3, "b", 1, 50.0, "SEG"),
        # key 1: %31==1 -> stays AND spawns insert 1000001
        (1, "c", 1, 80.0, "SEG"),
        # key 2: untouched
        (2, "d", 1, 10.005, "SEG"),
    ]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    ev = [
        (1, "2024-01-01 00:00:00", 7, "purchase", 5.0, "{}"),
        (2, "2024-01-02 00:00:00", 7, "purchase", 6.0, "{}"),
        (3, "2024-01-03 00:00:00", 7, "view", 9.0, "{}"),
        (4, "2024-01-01 12:00:00", 8, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        ev,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import functions as F

    df.withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_cdc_upsert_merge_semantics(spark, wh_dir):
    from data_validator_spark.queries.warehouse_ops import q_cdc_upsert

    out = {r["custkey"]: r for r in q_cdc_upsert(spark, wh_dir).collect()}
    assert out[0]["src"] == "updated" and out[0]["acctbal"] == 200.0
    assert 3 not in out  # deleted
    assert out[2]["src"] == "base" and out[2]["acctbal"] == 10.01  # half-up
    assert out[1]["src"] == "base"
    ins = out[1000001]
    assert ins["src"] == "inserted" and ins["acctbal"] == 40.0
    assert len(out) == 4


def test_scd2_intervals_chain_per_user(spark, wh_dir):
    from data_validator_spark.queries.warehouse_ops import q_scd2_intervals

    rows = q_scd2_intervals(spark, wh_dir).collect()
    u7 = [r for r in rows if r["user_id"] == 7]
    # only purchases build history; intervals chain and close
    assert len(u7) == 2
    assert u7[0]["valid_to"] == u7[1]["valid_from"]
    assert not u7[0]["is_current"] and u7[1]["is_current"]
    assert u7[1]["valid_to"] is None
    u8 = [r for r in rows if r["user_id"] == 8]
    assert len(u8) == 1 and u8[0]["is_current"]


def test_pagerank_star_center_dominates(spark, tmp_path):
    """A supplier every customer buys from must out-rank everyone: the
    star center absorbs mass from all leaves each iteration."""
    orders = [(i, i, "F") for i in range(8)]  # order i by customer i
    # every order has a line from supplier 0; order 1 also supplier 1
    lines = [(i, 0) for i in range(8)] + [(1, 1)]
    spark.createDataFrame(
        [(o, c) for o, c, _ in orders], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    from data_validator_spark.queries.graph_ops import q_pagerank_bipartite

    rows = q_pagerank_bipartite(spark, str(tmp_path)).collect()
    top = rows[0]
    assert top["node_type"] == "supplier" and top["orig_id"] == 0
    # rank is a probability-like mass: all positive, hub >> any leaf
    assert all(r["pr"] > 0 for r in rows)
    leaf = [r for r in rows if r["node_type"] == "customer"][0]
    assert top["pr"] > 3 * leaf["pr"]


def test_pagerank_fixed_point_bit_identical(spark, tmp_path):
    """The 2^-50 fixed-point contribution sums (graph_ops.PR_FIX) must
    make the whole recurrence engine-independent: every step is exact
    IEEE arithmetic, so Spark's emitted pr values are BIT-identical to
    a pure-Python double reference of the same quantized recurrence —
    no tolerance. This is the determinism contract the oracle hash
    rides on, pinned at the kernel level."""
    import math
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    orders = [(i, i % 3) for i in range(9)]  # 9 orders over 3 customers
    lines = [(i, i % 4) for i in range(9)] + [(0, 3), (5, 2)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    from data_validator_spark.queries.graph_ops import (
        DAMPING,
        PR_FIX,
        PR_ITERS,
        q_pagerank_bipartite,
    )

    # reference: identical quantized recurrence in Python doubles
    cust = {o: c for o, c in orders}
    pairs = sorted({(cust[o] * 2, s * 2 + 1) for o, s in lines})
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    pr = {v: 1.0 / n for v in deg}
    for _ in range(PR_ITERS):
        mass = defaultdict(int)
        for s, d in edges:
            mass[d] += math.floor(pr[s] / deg[s] * PR_FIX + 0.5)
        pr = {
            v: (1.0 - DAMPING) / n + DAMPING * (float(mass[v]) / PR_FIX)
            for v in deg
        }

    def round12(x: float) -> float:
        # Spark's ROUND(double, 12) goes through BigDecimal.valueOf(d)
        # — Double.toString's SHORTEST round-trip decimal — then
        # setScale(12, HALF_UP). Python's repr is the same shortest
        # round-trip string, so Decimal(repr(x)) models it; Decimal(x)
        # (the exact binary expansion) would round the wrong way when
        # the shortest repr ends in a '5' digit at the 13th decimal
        # while the binary value sits just below it.
        return float(Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP))

    rows = q_pagerank_bipartite(spark, str(tmp_path)).collect()
    assert len(rows) == n  # n < 20, so the limit keeps every node
    for r in rows:
        node = r["orig_id"] * 2 + (0 if r["node_type"] == "customer" else 1)
        assert r["pr"] == round12(pr[node]), (node, r["pr"], pr[node])


def test_ivm_merge_equals_recompute(spark):
    """The IVM merge must equal a full recompute over
    (base - deletes + inserts) — same invariant the oracle hash pins,
    proven here row-by-row on sf0.001."""
    from pyspark.sql import functions as F

    from data_validator_spark.queries import load
    from data_validator_spark.queries.warehouse_ops import (
        IVM_DEL_MOD,
        IVM_INS_BUMP,
        IVM_INS_MOD,
        q_ivm_agg,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["o_custkey"]: r for r in q_ivm_agg(spark, sf).collect()}

    orders = load(spark, sf, "orders")
    survivors = orders.where(F.col("o_orderkey") % IVM_DEL_MOD != 0).select(
        "o_custkey", "o_totalprice"
    )
    inserted = orders.where(F.col("o_orderkey") % IVM_INS_MOD == 0).select(
        "o_custkey", (F.col("o_totalprice") + IVM_INS_BUMP).alias("o_totalprice")
    )
    want = {
        r["o_custkey"]: r
        for r in survivors.unionAll(inserted)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_price"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_orders"] == want[k]["n_orders"], k
        assert got[k]["sum_price"] == want[k]["sum_price"], k
