"""Data-quality audit operators beyond the reference's per-column
checks — distribution drift (PSI), referential integrity, Benford
first-digit conformance, order/line reconciliation, and train/eval
n-gram contamination.

These extend the reference validator surface (target/data-validator
covers per-column checks only — ValidatorTable.scala:1, RowBased.scala:1)
with the table-level audits a production data platform runs next to
them: drift between snapshots, FK orphan detection, fraud-style digit
analysis, cross-table reconciliation, and the train/eval leakage scan
an LLM corpus pipeline needs (n-gram granularity; the exact-fingerprint
variant is ``split_contamination``).

Same conventions as the rest of the package: declarative plans with
map-side partial aggregation, 60-bit md5 hashes, decimal(30,6) exact
sums, DEC-rounded doubles so a 1-ulp ``ln()`` difference between
engines cannot flip the value hash.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_validator_spark.queries import DEC, load, spread
from data_validator_spark.queries.pipeline_ops import _hash60, _sql_hash60
from data_validator_spark.queries.textops import (
    SQL_SPLIT_BUCKET,
    TRAIN_CUT,
    VAL_CUT,
    split_bucket,
)

# -- drift_psi -------------------------------------------------------------
PSI_PIVOT = "1998-07-01"  # reference = ships before, current = after
PSI_BUCKETS = 10


def q_drift_psi(spark, sf):
    """Population-stability-index drift audit of l_extendedprice
    between two lineitem snapshots (shipped before vs after the
    pivot date) — the standard model-monitoring drift check, applied
    table-to-table: 10 equi-width buckets over the shared value
    range, add-1 smoothed shares, per-bucket PSI terms
    (p-q)·ln(p/q).

    Scale shape: TWO full-table map stages and zero wide shuffles —
    scan 1 is one fused aggregate (global min/max cents + both
    population totals), broadcast as a scalar; scan 2 buckets every
    row against those constants and collapses via a
    map-side-combined groupBy to ≤10 rows. The 10-row bucket spine
    left-join guarantees a dense grid in both engines.

    Determinism: bucketing runs on exact integer cents
    (floor(x·100+0.5), the embedding_norm_quant rounding rule) with
    integer div, so no float compare can place a row differently;
    the smoothed shares are single exact int/int divisions and the
    ln() product rounds through decimal(30,6).
    """
    li = spread(load(spark, sf, "lineitem"))
    cents = F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
    is_ref = F.col("l_shipdate") < F.lit(PSI_PIVOT)
    base = li.select(cents.alias("cents"), is_ref.alias("is_ref"))
    stats = base.agg(
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
        F.sum(F.col("is_ref").cast("long")).alias("ref_tot"),
        F.sum((~F.col("is_ref")).cast("long")).alias("cur_tot"),
    )
    bucket = F.least(
        F.lit(PSI_BUCKETS - 1),
        F.expr(f"((cents - minc) * {PSI_BUCKETS}) div (maxc - minc + 1)"),
    )
    counts = (
        base.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum(F.col("is_ref").cast("long")).alias("ref_cnt"),
            F.sum((~F.col("is_ref")).cast("long")).alias("cur_cnt"),
        )
    )
    spine = spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
    totals = stats.select("ref_tot", "cur_tot")
    full = (
        spine.join(F.broadcast(counts), "bucket", "left")
        .crossJoin(F.broadcast(totals.select(
            F.col("ref_tot").alias("rt"), F.col("cur_tot").alias("ct"))))
        .select(
            "bucket",
            F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
            F.col("rt"),
            F.col("ct"),
        )
    )
    p = (F.col("ref_cnt") + 1).cast("double") / (
        F.col("rt") + PSI_BUCKETS
    ).cast("double")
    q = (F.col("cur_cnt") + 1).cast("double") / (
        F.col("ct") + PSI_BUCKETS
    ).cast("double")
    return full.select(
        "bucket",
        "ref_cnt",
        "cur_cnt",
        p.cast(DEC).cast("double").alias("ref_share"),
        q.cast(DEC).cast("double").alias("cur_share"),
        ((p - q) * F.log(p / q)).cast(DEC).cast("double").alias("psi_term"),
    ).orderBy("bucket")


SQL_DRIFT_PSI = f"""
WITH base AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         l_shipdate < TIMESTAMP '{PSI_PIVOT} 00:00:00' AS is_ref
  FROM lineitem),
stats AS (
  SELECT MIN(cents) AS minc, MAX(cents) AS maxc,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_tot,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_tot
  FROM base),
counts AS (
  SELECT LEAST({PSI_BUCKETS - 1},
               ((cents - minc) * {PSI_BUCKETS}) // (maxc - minc + 1)) AS bucket,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
         CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_cnt
  FROM base, stats GROUP BY 1),
spine AS (SELECT unnest(range(0, {PSI_BUCKETS})) AS bucket),
grid AS (
  SELECT s.bucket,
         COALESCE(c.ref_cnt, 0) AS ref_cnt,
         COALESCE(c.cur_cnt, 0) AS cur_cnt,
         stats.ref_tot AS rt, stats.cur_tot AS ct
  FROM spine s LEFT JOIN counts c ON s.bucket = c.bucket, stats),
shares AS (
  SELECT bucket, ref_cnt, cur_cnt,
         CAST(ref_cnt + 1 AS DOUBLE) / (rt + {PSI_BUCKETS}) AS p,
         CAST(cur_cnt + 1 AS DOUBLE) / (ct + {PSI_BUCKETS}) AS q
  FROM grid)
SELECT bucket, ref_cnt, cur_cnt,
       CAST(CAST(p AS DECIMAL(30,6)) AS DOUBLE) AS ref_share,
       CAST(CAST(q AS DECIMAL(30,6)) AS DOUBLE) AS cur_share,
       CAST(CAST((p - q) * ln(p / q) AS DECIMAL(30,6)) AS DOUBLE) AS psi_term
FROM shares ORDER BY bucket
"""


# -- fk_integrity ----------------------------------------------------------
# (relation label, child table, child key, parent table, parent key)
FK_RELATIONS = [
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events_customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def q_fk_integrity(spark, sf):
    """Referential-integrity audit over every foreign-key edge of the
    star schema: child row/key counts, orphan rows (child key absent
    from the parent), and what fraction of parent keys the children
    actually reference — the uniqueCheck's cross-table sibling
    (reference covers only within-table keys, UniqueCheck.scala:1).

    Scale shape: per relation, the child collapses FIRST to distinct
    keys with per-key row counts (map-side combine), so the
    verification join moves O(|keys|) rows, never O(|rows|); parent
    sides project the key column only. Dim parents broadcast; the
    lineitem→orders edge joins key-to-key after both sides collapse.
    The final result is a 6-row union of scalar aggregates.

    Determinism: pure integer counts; coverage_pct is one exact
    int/int division rounded through decimal(30,6).
    """
    rows = []
    for label, child, ckey, parent, pkey in FK_RELATIONS:
        c = (
            spread(load(spark, sf, child))
            .groupBy(F.col(ckey).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = load(spark, sf, parent).select(
            F.col(pkey).alias("k"), F.lit(1).alias("present")
        )
        joined = c.join(p, "k", "left")
        pstat = load(spark, sf, parent).agg(
            F.count(F.lit(1)).alias("n_parent_keys")
        )
        agg = joined.agg(
            F.sum("n").alias("n_child_rows"),
            F.count(F.lit(1)).alias("n_child_keys"),
            F.sum(F.when(F.col("present").isNull(), F.col("n")).otherwise(0)).alias(
                "n_orphan_rows"
            ),
            F.sum(F.col("present").isNotNull().cast("long")).alias("n_matched_keys"),
        ).crossJoin(F.broadcast(pstat))
        rows.append(
            agg.select(
                F.lit(label).alias("relation"),
                "n_child_rows",
                "n_child_keys",
                "n_orphan_rows",
                "n_matched_keys",
                "n_parent_keys",
                (
                    F.col("n_matched_keys").cast("double")
                    * 100.0
                    / F.col("n_parent_keys").cast("double")
                )
                .cast(DEC)
                .cast("double")
                .alias("coverage_pct"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("relation")


def _sql_fk_integrity() -> str:
    arms = []
    for label, child, ckey, parent, pkey in FK_RELATIONS:
        arms.append(f"""
SELECT '{label}' AS relation,
       CAST(SUM(n) AS BIGINT) AS n_child_rows,
       COUNT(*) AS n_child_keys,
       CAST(SUM(CASE WHEN present IS NULL THEN n ELSE 0 END) AS BIGINT)
         AS n_orphan_rows,
       CAST(SUM(CASE WHEN present IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched_keys,
       (SELECT COUNT(*) FROM {parent}) AS n_parent_keys,
       CAST(CAST(CAST(SUM(CASE WHEN present IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) * 100.0 / (SELECT COUNT(*) FROM {parent})
            AS DECIMAL(30,6)) AS DOUBLE) AS coverage_pct
FROM (SELECT c.k, c.n, p.present
      FROM (SELECT {ckey} AS k, COUNT(*) AS n FROM {child} GROUP BY 1) c
      LEFT JOIN (SELECT {pkey} AS k, 1 AS present FROM {parent}) p
        ON c.k = p.k)""")
    return " UNION ALL ".join(arms) + " ORDER BY relation"


# -- benford_check ---------------------------------------------------------
# Expected Benford shares log10(1+1/d), rounded once in Python and
# embedded as identical literals in both engines.
BENFORD_EXPECTED = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def q_benford_check(spark, sf):
    """Benford's-law first-digit audit of l_extendedprice — the
    classic fraud/corruption screen for financial columns: observed
    first-significant-digit shares vs log10(1+1/d), with absolute
    deviation and chi-square contribution per digit.

    Scale shape: ONE scan, one map-side-combined groupBy to ≤9 rows;
    the total for the share division comes from a window-free
    broadcast of the 9-row relation's own aggregate.

    Determinism: the first digit is extracted from the exact integer
    cents (floor(x·100+0.5) — ×100 never changes the leading
    significant digit) via string substring, identical in both
    engines; shares are single int/int divisions rounded through
    decimal(30,6).
    """
    li = spread(load(spark, sf, "lineitem"))
    cents = F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
    digits = (
        li.select(cents.alias("cents"))
        .where(F.col("cents") > 0)
        .select(F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = digits.agg(F.sum("cnt").alias("total"))
    exp = F.create_map(
        *[x for d, e in BENFORD_EXPECTED.items() for x in (F.lit(d), F.lit(e))]
    )
    obs = F.col("cnt").cast("double") / F.col("total").cast("double")
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "d",
            "cnt",
            obs.cast(DEC).cast("double").alias("obs_share"),
            exp[F.col("d")].alias("exp_share"),
            F.abs(obs - exp[F.col("d")]).cast(DEC).cast("double").alias("abs_dev"),
            ((obs - exp[F.col("d")]) * (obs - exp[F.col("d")]) / exp[F.col("d")])
            .cast(DEC)
            .cast("double")
            .alias("chi2_term"),
        )
        .orderBy("d")
    )


def _sql_benford() -> str:
    exp_case = " ".join(
        f"WHEN {d} THEN CAST({e!r} AS DOUBLE)" for d, e in BENFORD_EXPECTED.items()
    )
    return f"""
WITH digits AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS d,
         COUNT(*) AS cnt
  FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem)
  WHERE cents > 0 GROUP BY 1),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM digits),
j AS (
  SELECT d, cnt, CAST(cnt AS DOUBLE) / total AS obs,
         CASE d {exp_case} END AS exp
  FROM digits, t)
SELECT d, cnt,
       CAST(CAST(obs AS DECIMAL(30,6)) AS DOUBLE) AS obs_share,
       exp AS exp_share,
       CAST(CAST(abs(obs - exp) AS DECIMAL(30,6)) AS DOUBLE) AS abs_dev,
       CAST(CAST((obs - exp) * (obs - exp) / exp AS DECIMAL(30,6)) AS DOUBLE)
         AS chi2_term
FROM j ORDER BY d
"""


# -- reconciliation_check --------------------------------------------------
RECON_TOL = "0.01"  # decimal literal so the threshold compare is exact


def q_reconciliation_check(spark, sf):
    """Cross-table reconciliation: does orders.o_totalprice equal the
    order's lineitem total Σ extprice·(1-disc)·(1+tax)? The
    accounting control every warehouse runs between a rollup table
    and its fact lines; emits match/mismatch counts and the
    magnitude of the disagreement. (On this synthetic data the
    generator does NOT derive o_totalprice from lineitem, so the
    audit reports 100% mismatch — exactly what it is built to
    surface.)

    Scale shape: lineitem collapses to per-order totals with ONE
    map-side-combined groupBy keyed on l_orderkey; the comparison
    join is then key-to-key on two same-keyed relations (AQE plans
    SMJ/shuffle-hash; no row-level data moves twice), and the
    verdict collapses in a single fused aggregate.

    Determinism: the per-line product is one fixed-order IEEE double
    expression (the TPC-H q1 convention) summed through
    decimal(30,6); o_totalprice is compared in decimal, so the
    tolerance test is exact in both engines.
    """
    li = spread(load(spark, sf, "lineitem"))
    computed = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            F.expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)").cast(DEC)
        ).alias("line_total")
    )
    orders = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").cast(DEC).alias("header")
    )
    diff = F.col("header") - F.col("line_total")
    absdiff = F.abs(diff)
    matched = absdiff <= F.expr(f"CAST({RECON_TOL} AS {DEC})")
    return orders.join(computed, "k", "left").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("line_total").isNotNull().cast("long")).alias("n_with_lines"),
        F.sum((F.col("line_total").isNotNull() & matched).cast("long")).alias(
            "n_matched"
        ),
        F.sum((F.col("line_total").isNotNull() & ~matched).cast("long")).alias(
            "n_mismatched"
        ),
        F.max(absdiff).cast("double").alias("max_abs_diff"),
        F.sum(absdiff).cast("double").alias("sum_abs_diff"),
    )


SQL_RECONCILIATION = f"""
WITH computed AS (
  SELECT l_orderkey AS k,
         SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                  AS DECIMAL(30,6))) AS line_total
  FROM lineitem GROUP BY 1),
j AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(30,6)) AS header, c.line_total,
         abs(CAST(o.o_totalprice AS DECIMAL(30,6)) - c.line_total) AS ad
  FROM orders o LEFT JOIN computed c ON o.o_orderkey = c.k)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN line_total IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_lines,
       CAST(SUM(CASE WHEN line_total IS NOT NULL
                      AND ad <= CAST({RECON_TOL} AS DECIMAL(30,6))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN line_total IS NOT NULL
                      AND ad > CAST({RECON_TOL} AS DECIMAL(30,6))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
       CAST(MAX(ad) AS DOUBLE) AS max_abs_diff,
       CAST(SUM(ad) AS DOUBLE) AS sum_abs_diff
FROM j
"""


# -- ngram_contamination ---------------------------------------------------
CONTAM_N = 5  # word n-gram width; 5 is the synthetic-vocab analog of
# the 8-13 gram windows used on natural text (the ~30-word generator
# vocabulary makes 8-grams near-unique, which would test nothing)


def q_ngram_contamination(spark, sf):
    """Train/eval n-gram contamination scan: for every TEST-split
    document, how many of its word 5-grams also occur anywhere in
    the TRAIN split — the n-gram-level leakage audit (GPT-3/PaLM
    style) that catches partial-overlap contamination exact
    fingerprints miss (`split_contamination` is the exact-dup
    variant; both derive the split from textops.split_bucket so
    they can never disagree on membership).

    Scale shape: n-grams are built in-row (transform over the
    materialized token array — the gopher_quality pattern) and
    immediately collapse to DISTINCT 60-bit hashes (map-side
    combine), so the join moves hashes, never text. The test side is
    ~1% of the corpus (AQE broadcasts it); the train side shuffles
    once on the hash key. Output is one row per test doc.

    Determinism: gram identity is the 60-bit md5 prefix of the
    joined token string; counts are integers, the contamination
    fraction one exact int/int division through decimal(30,6).
    """
    df = spread(load(spark, sf, "documents"))
    bucket = split_bucket()
    toks = df.select(
        "doc_id",
        bucket.alias("bucket"),
        F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        "bucket",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {CONTAM_N} THEN "
                f"transform(sequence(1, size(toks) - {CONTAM_N} + 1), "
                f" i -> array_join(slice(toks, i, {CONTAM_N}), ' ')) "
                "ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", "bucket", _hash60(F.col("g")).alias("gh"))
    train = (
        grams.where(F.col("bucket") < TRAIN_CUT)
        .select("gh")
        .distinct()
        .select("gh", F.lit(1).alias("hit"))
    )
    test = grams.where(F.col("bucket") >= VAL_CUT).select("doc_id", "gh").distinct()
    per_doc = (
        test.join(train, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("long")).alias(
                "n_contaminated"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"))
        .cast(DEC)
        .cast("double")
        .alias("contam_frac"),
    ).orderBy("doc_id")


SQL_NGRAM_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, {SQL_SPLIT_BUCKET} AS bucket,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, bucket,
         {_sql_hash60("g")} AS gh
  FROM (
    SELECT doc_id, bucket,
           unnest(list_transform(range(1, len(toks) - {CONTAM_N} + 2),
             i -> list_aggregate(toks[CAST(i AS INTEGER):CAST(i AS INTEGER) + {CONTAM_N} - 1],
                                 'string_agg', ' '))) AS g
    FROM toks WHERE len(toks) >= {CONTAM_N})),
train AS (SELECT DISTINCT gh FROM grams WHERE bucket < {TRAIN_CUT}),
test AS (SELECT DISTINCT doc_id, gh FROM grams WHERE bucket >= {VAL_CUT}),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN tr.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM test t LEFT JOIN train tr ON t.gh = tr.gh
  GROUP BY t.doc_id)
SELECT doc_id, n_grams, n_contaminated,
       CAST(CAST(CAST(n_contaminated AS DOUBLE) / n_grams AS DECIMAL(30,6))
            AS DOUBLE) AS contam_frac
FROM per_doc ORDER BY doc_id
"""


QUERIES = {
    "drift_psi": q_drift_psi,
    "fk_integrity": q_fk_integrity,
    "benford_check": q_benford_check,
    "reconciliation_check": q_reconciliation_check,
    "ngram_contamination": q_ngram_contamination,
}

ORACLES = {
    "drift_psi": SQL_DRIFT_PSI,
    "fk_integrity": _sql_fk_integrity(),
    "benford_check": _sql_benford(),
    "reconciliation_check": SQL_RECONCILIATION,
    "ngram_contamination": SQL_NGRAM_CONTAMINATION,
}
