"""Warehouse-maintenance operators: CDC upsert (MERGE) and SCD2
history building — the mutation patterns a lakehouse pipeline runs
between analytics jobs.

Both are expressed as the generic join/window plans that scale (the
MERGE is one equi-join on the key; the SCD2 build is one window
shuffle), not as row-at-a-time logic. The changes batch for the MERGE
is DERIVED deterministically from the base table with the same
arithmetic in the DuckDB oracle (the tpch_ext pattern — the driver's
parquet dirs are fixed, so test inputs must be derivable).

Parity note: the reference engine (target/data-validator) validates
tables but never mutates them; these rows extend it per the build
brief, mirroring Delta MERGE INTO / SCD2 OPTIMIZE patterns.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_validator_spark.queries import load


# -- cdc_upsert ------------------------------------------------------------
# Deterministic changes batch derived from `customer`:
#   update: c_custkey % 7 == 0            -> acctbal += 100.00
#   delete: else if c_custkey % 13 == 3   -> row removed
#   insert: c_custkey % 31 == 1           -> new key = old + 1_000_000
INS_OFFSET = 1_000_000


def _r2(col):
    """2-decimal rounding as floor(x*100 + 0.5)/100 — ROUND() on
    doubles is half-up in Spark but not in DuckDB on exact halves
    (acctbal/2 produces .xx5 constantly); floor arithmetic is
    bit-identical in both engines (same rule as embedding_norm_quant)."""
    return F.floor(col * 100.0 + 0.5) / 100.0


def _changes(base):
    """(key, new_acctbal, op) change rows — op in U/D/I."""
    upd = base.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("key"),
        _r2(F.col("c_acctbal") + 100.0).alias("new_acctbal"),
        F.lit("U").alias("op"),
    )
    dele = base.where(
        (F.col("c_custkey") % 7 != 0) & (F.col("c_custkey") % 13 == 3)
    ).select(
        F.col("c_custkey").alias("key"),
        F.lit(None).cast("double").alias("new_acctbal"),
        F.lit("D").alias("op"),
    )
    ins = base.where(F.col("c_custkey") % 31 == 1).select(
        (F.col("c_custkey") + INS_OFFSET).alias("key"),
        _r2(F.col("c_acctbal") / 2.0).alias("new_acctbal"),
        F.lit("I").alias("op"),
    )
    return upd.union(dele).union(ins)


def q_cdc_upsert(spark, sf):
    """Join-based MERGE (Delta's MERGE INTO shape): apply a changes
    batch (update / delete / insert ops) to the customer snapshot in
    ONE full-outer equi-join on the key — matched+U rewrites the
    value, matched+D drops the row, unmatched-change inserts.

    Scale shape: the merge is a single shuffle join on the primary
    key; with the base table bucketed on that key (operators/
    bucketing.py) the base side never re-shuffles across daily merge
    cycles — the standard lakehouse upsert topology. No window, no
    driver state; AQE handles skewed keys.
    """
    base = load(spark, sf, "customer")
    merged = base.join(_changes(base), base.c_custkey == F.col("key"), "full_outer")
    return (
        merged.where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(F.col("key"), F.col("c_custkey")).alias("custkey"),
            F.when(F.col("op") == "U", F.col("new_acctbal"))
            .when(F.col("op") == "I", F.col("new_acctbal"))
            .otherwise(_r2(F.col("c_acctbal")))
            .alias("acctbal"),
            F.when(F.col("op") == "U", F.lit("updated"))
            .when(F.col("op") == "I", F.lit("inserted"))
            .otherwise(F.lit("base"))
            .alias("src"),
        )
        .orderBy("custkey")
    )


SQL_CDC_UPSERT = f"""
WITH changes AS (
  SELECT c_custkey AS key, FLOOR((c_acctbal + 100.0) * 100.0 + 0.5) / 100.0 AS new_acctbal, 'U' AS op
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, NULL, 'D'
  FROM customer WHERE c_custkey % 7 != 0 AND c_custkey % 13 = 3
  UNION ALL
  SELECT c_custkey + {INS_OFFSET}, FLOOR((c_acctbal / 2.0) * 100.0 + 0.5) / 100.0, 'I'
  FROM customer WHERE c_custkey % 31 = 1)
SELECT COALESCE(key, c_custkey) AS custkey,
       CASE WHEN op IN ('U', 'I') THEN new_acctbal
            ELSE FLOOR(c_acctbal * 100.0 + 0.5) / 100.0 END AS acctbal,
       CASE WHEN op = 'U' THEN 'updated'
            WHEN op = 'I' THEN 'inserted'
            ELSE 'base' END AS src
FROM customer FULL OUTER JOIN changes ON c_custkey = key
WHERE op IS NULL OR op != 'D'
ORDER BY custkey
"""


# -- scd2_intervals --------------------------------------------------------
def q_scd2_intervals(spark, sf):
    """SCD2 history build: turn each user's purchase stream into
    slowly-changing-dimension validity intervals — valid_from = event
    time, valid_to = next event's time (NULL while current), plus the
    is_current flag. The standard "dimension history from a CDC feed"
    transformation.

    Scale shape: ONE shuffle on the dimension key (the window
    partition); lead() is evaluated inside the sorted partition with
    no second pass. Timestamps are emitted as epoch microseconds
    (integers) so the cross-engine hash never touches timestamp
    formatting.
    """
    ev = load(spark, sf, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.unix_micros("ts").alias("valid_from"),
            F.unix_micros(F.lead("ts").over(w)).alias("valid_to"),
            F.round("value", 6).alias("value"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "value")
    )


SQL_SCD2_INTERVALS = """
SELECT user_id,
       epoch_us(ts) AS valid_from,
       epoch_us(lead(ts) OVER w) AS valid_to,
       ROUND(value, 6) AS value,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from, value
"""


# -- ivm_agg ---------------------------------------------------------------
# Deterministic delta batch derived from `orders` (fixed parquet dirs,
# so deltas must be derivable — the cdc_upsert pattern):
#   delete: o_orderkey % 17 == 0
#   insert: a copy of every o_orderkey % 13 == 0 row at +10.00 price
IVM_DEL_MOD = 17
IVM_INS_MOD = 13
IVM_INS_BUMP = 10.0


def q_ivm_agg(spark, sf):
    """Incremental view maintenance of a per-customer order aggregate:
    apply a signed delta batch (deletes as −1/−price, inserts as
    +1/+price) to the MATERIALIZED aggregate with one outer join —
    never re-aggregating the base fact — and emit the refreshed view.
    The DuckDB oracle IS the full recompute over (base − deletes +
    inserts), so a green hash PROVES merge-equals-recompute.

    Scale shape: the base aggregate is |customers| rows (in
    production, read back from the store — here rebuilt once to stand
    in for it); the delta pipeline shuffles at |delta| scale with
    map-side combine; the merge is ONE full-outer equi-join on the
    aggregate key. Refresh cost tracks the delta, not the fact table —
    the entire point of IVM at 100 TB.

    Determinism: counts are signed integers; price sums accumulate in
    decimal(30,6) on both the base and delta sides (exact retraction:
    a deleted row subtracts the identical decimal it added); keys
    whose count reaches 0 drop out in both engines.
    """
    orders = load(spark, sf, "orders")
    dec_price = F.col("o_totalprice").cast("decimal(30,6)")
    base = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_b"), F.sum(dec_price).alias("s_b")
    )
    deletes = orders.where(F.col("o_orderkey") % IVM_DEL_MOD == 0).select(
        "o_custkey",
        F.lit(-1).alias("dn"),
        (-dec_price).alias("ds"),
    )
    inserts = orders.where(F.col("o_orderkey") % IVM_INS_MOD == 0).select(
        "o_custkey",
        F.lit(1).alias("dn"),
        (F.col("o_totalprice") + IVM_INS_BUMP).cast("decimal(30,6)").alias("ds"),
    )
    delta = (
        deletes.unionAll(inserts)
        .groupBy("o_custkey")
        .agg(F.sum("dn").alias("n_d"), F.sum("ds").alias("s_d"))
    )
    merged = base.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce(F.col("n_b"), F.lit(0)) + F.coalesce(F.col("n_d"), F.lit(0))).alias(
            "n_orders"
        ),
        (
            F.coalesce(F.col("s_b"), F.lit(0).cast("decimal(30,6)"))
            + F.coalesce(F.col("s_d"), F.lit(0).cast("decimal(30,6)"))
        ).alias("s"),
    )
    return (
        merged.where(F.col("n_orders") > 0)
        .select("o_custkey", "n_orders", F.col("s").cast("double").alias("sum_price"))
        .orderBy("o_custkey")
    )


SQL_IVM_AGG = f"""
WITH current AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % {IVM_DEL_MOD} <> 0
  UNION ALL
  SELECT o_custkey, o_totalprice + {IVM_INS_BUMP} FROM orders
  WHERE o_orderkey % {IVM_INS_MOD} = 0)
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM current GROUP BY o_custkey ORDER BY o_custkey
"""


QUERIES = {
    "cdc_upsert": q_cdc_upsert,
    "scd2_intervals": q_scd2_intervals,
    "ivm_agg": q_ivm_agg,
}

ORACLES = {
    "cdc_upsert": SQL_CDC_UPSERT,
    "scd2_intervals": SQL_SCD2_INTERVALS,
    "ivm_agg": SQL_IVM_AGG,
}
