"""free_local_checkpoint must actually release storage blocks —
DataFrame.unpersist() on a checkpointed frame is a silent no-op
(the defect this helper exists to fix)."""

from __future__ import annotations

from data_validator_spark.operators.checkpoint import free_local_checkpoint


def _cached_rdd_ids(spark):
    sc = spark.sparkContext
    return {
        info.id()
        for info in sc._jsc.sc().getRDDStorageInfo()
        if info.numCachedPartitions() > 0
    }


def test_dataframe_unpersist_is_noop_but_helper_frees(spark):
    before = _cached_rdd_ids(spark)
    cp = spark.range(50000).selectExpr("id", "id * 2 AS y").localCheckpoint()
    after_cp = _cached_rdd_ids(spark)
    assert after_cp - before, "checkpoint should have cached blocks"

    cp.unpersist(True)
    assert _cached_rdd_ids(spark) == after_cp, (
        "if DataFrame.unpersist ever starts working on checkpoints, "
        "the helper can be retired"
    )

    assert free_local_checkpoint(cp, blocking=True)
    assert _cached_rdd_ids(spark) == before


def test_helper_refuses_non_checkpointed_frames(spark):
    df = spark.range(10).selectExpr("id")
    assert free_local_checkpoint(df) is False


def test_cc_loop_does_not_accumulate_blocks(spark):
    from data_validator_spark.operators.cc_star import connected_components

    before = _cached_rdd_ids(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    connected_components(pairs).collect()
    leaked = _cached_rdd_ids(spark) - before
    # only the FINAL round's edges may remain cached (result lineage)
    assert len(leaked) <= 1, leaked
