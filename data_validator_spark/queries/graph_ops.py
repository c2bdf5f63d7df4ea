"""Graph analytics over the purchase graph: PageRank on the
customer–supplier bipartite graph (who-buys-from-whom), the iterative
DataFrame pattern that complements the connected-components family in
dedup.py / operators/cc_star.py.

Scale shape: one edge relation (distinct customer–supplier pairs from
one orders⋈lineitem join) hash-partitioned by src ONCE and
checkpointed — the partitioning survives the checkpoint, so each
power iteration's edges ⋈ ranks join moves only the node-count-sized
rank relation, never the edges — plus one groupBy(dst) with partial
aggregation per round. The driver never sees data — iterations are a
fixed unrolled chain, so Catalyst plans the whole thing as one DAG. At 100 TB the edge relation would be
localCheckpoint-ed per round like the CC loop; three unrolled rounds
at bench scale keep the oracle a finite CTE chain.

Cross-engine determinism: rank contributions are summed through
decimal(38,18) (exact, order-independent — rank mass is ~1/N, far
below the package's money-scale decimal(30,6)); the per-edge division
pr/deg is IEEE double in both engines; the final output rounds to 12
decimals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_validator_spark.queries import load

DAMPING = 0.85
PR_ITERS = 3
DEC18 = "decimal(38,18)"


def _edges(spark, sf):
    """Undirected bipartite edges as (src, dst) both ways; node id =
    2*custkey for customers, 2*suppkey+1 for suppliers."""
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def q_pagerank_bipartite(spark, sf):
    # materialize the edge relation ONCE (localCheckpoint truncates the
    # orders⋈lineitem lineage) — the unrolled iterations would otherwise
    # re-run the fact join every round; same rule as the CC loop
    # Partitioned by src BEFORE the checkpoint: LogicalRDD preserves
    # the hash partitioning, so every iteration's edges⋈ranks join
    # reuses it instead of re-shuffling the (large) edge side — only
    # the node-count-sized rank relation moves per round. nodes is
    # checkpointed too so deg isn't regrouped every iteration.
    edges = _edges(spark, sf).repartition("src").localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        deg.select(F.col("src").alias("node"), "deg")
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n"))))
        .repartition("node")
        .localCheckpoint()
    )
    # uniform start: pr0 = 1/N
    pr = nodes.select("node", "deg", "n", (F.lit(1.0) / F.col("n")).alias("pr"))
    for _ in range(PR_ITERS):
        contrib = edges.join(
            pr.select(F.col("node").alias("src"), "deg", "pr"), "src"
        ).select("dst", (F.col("pr") / F.col("deg")).alias("w"))
        sums = contrib.groupBy("dst").agg(
            F.sum(F.col("w").cast(DEC18)).cast("double").alias("mass")
        )
        pr = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            "deg",
            "n",
            (
                (1.0 - DAMPING) / F.col("n")
                + DAMPING * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("pr"),
        )
    return (
        pr.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").alias("orig_id"),
            F.round("pr", 12).alias("pr"),
        )
        .orderBy(F.desc("pr"), "orig_id")
        .limit(20)
    )


def _sql_pagerank() -> str:
    its = []
    prev = "pr0"
    for i in range(1, PR_ITERS + 1):
        its.append(
            f"""
pr{i} AS (
  SELECT n.node, n.deg, n.n,
         (1.0 - {DAMPING}) / n.n + {DAMPING} * COALESCE(s.mass, 0.0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst,
           CAST(SUM(CAST(p.pr / p.deg AS DECIMAL(38,18))) AS DOUBLE) AS mass
    FROM edges e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst) s ON n.node = s.dst)"""
        )
        prev = f"pr{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM deg),
nodes AS (SELECT src AS node, deg, n FROM deg CROSS JOIN nn),
pr0 AS (SELECT node, deg, n, 1.0 / n AS pr FROM nodes),
{','.join(its)}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       node // 2 AS orig_id,
       ROUND(pr, 12) AS pr
FROM {prev}
ORDER BY pr DESC, orig_id LIMIT 20
"""


QUERIES = {"pagerank_bipartite": q_pagerank_bipartite}
ORACLES = {"pagerank_bipartite": _sql_pagerank()}
