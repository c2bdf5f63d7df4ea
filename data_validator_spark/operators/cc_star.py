"""Large-star / small-star connected components.

The alternating-star algorithm from Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14): two edge rewrites that
provably preserve connectivity while monotonically pointing every node
at smaller node ids, converging in O(log n) rounds even on
high-diameter graphs — the scale path for dedup clustering where the
plain min-label propagation loop needs O(diameter) rounds.

  large-star(u): for every neighbor v > u, re-point v at
                 m = min(N(u) ∪ {u})
  small-star(u): canonicalize edges so u > v, then re-point every
                 smaller neighbor (and u itself) at m = min(N(u) ∪ {u})

Each round is two shuffle-joins on node id (groupBy min + join back);
every intermediate is localCheckpoint-ed so the plan stays O(1) per
round instead of nesting (the same lineage rule as the propagation
loop in queries/dedup.py). Convergence is detected by an edge-set
fingerprint (count + order-independent hash sum) — one tiny aggregate
per round, no driver-side edge materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.operators.checkpoint import free_local_checkpoint


def _large_star(edges: DataFrame) -> DataFrame:
    """edges: undirected edge list (u, v), both directions present."""
    mins = edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        edges.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """edges: directed (u, v) with u > v after large-star."""
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v")).distinct()
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    joined = canon.join(mins, "u")
    repointed = joined.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return repointed.union(self_edge).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int, int]:
    # bit_xor: order-independent and overflow-free (edges are distinct,
    # so xor-cancellation of duplicates cannot occur). Two independent
    # hashes (argument orders differ) so a single 64-bit xor collision
    # between distinct same-size edge sets cannot end the loop early —
    # both would have to collide simultaneously.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        F.coalesce(F.expr("bit_xor(xxhash64(v, u))"), F.lit(0)).alias("h2"),
    ).first()
    return int(row["n"]), int(row["h"]), int(row["h2"])


def connected_components(
    pairs: DataFrame, max_iter: int = 25, stats: dict | None = None
) -> DataFrame:
    """(doc_a, doc_b) undirected pairs -> (node, label) with
    label = min node id in the component. Isolated nodes never appear
    (they are not in any pair), matching the propagation loop.

    When ``stats`` is passed, records ``stats['rounds']`` = star
    rounds executed (including the final confirming no-change round)
    so benchmarks can pin the O(log n) claim against measured rounds.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_fp = _fingerprint(edges)
    prev_cp = edges
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        ls = _large_star(edges)
        sym = ls.union(ls.select(F.col("v").alias("u"), F.col("u").alias("v")))
        nxt = _small_star(sym)
        # star output is (child, parent<child); keep the symmetric form
        # the next large-star expects
        edges = (
            nxt.union(nxt.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # DataFrame.unpersist() is a no-op on checkpoint blocks — free
        # the previous round's RDD through its LogicalRDD handle
        free_local_checkpoint(prev_cp)
        prev_cp = edges
        fp = _fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge within {max_iter} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
    # converged edges are stars: every node points at its component min
    return (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("node"), "label")
    )
