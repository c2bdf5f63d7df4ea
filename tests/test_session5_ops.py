"""Semantic tests for the r5-session-5 operators: semdedup
(cluster-bucketed semantic dedup), repetition_strip (consecutive
duplicate-token collapse), global_shuffle (deterministic sharded
training order) — crafted inputs through the real query functions,
brute-force-verified in Python."""

from __future__ import annotations

import hashlib

import pytest

SF = "/root/testdata/sf0.001"


def _hash60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# -- repetition_strip ------------------------------------------------------
@pytest.fixture(scope="module")
def rep_dir(spark, tmp_path_factory):
    rows = [
        (0, "a a a b b c", "en", "s", 11),
        (1, "x y x y", "en", "s", 7),  # alternating: nothing to strip
        (2, "", "en", "s", 0),
        (3, "solo", "en", "s", 4),
        (4, "a  a\tb", "en", "s", 6),  # multi-whitespace split
        (5, "q q q q q q q q", "en", "s", 15),
    ]
    d = tmp_path_factory.mktemp("repdocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_repetition_strip_collapses_runs(spark, rep_dir):
    from data_validator_spark.queries.textops import q_repetition_strip

    out = {r["doc_id"]: r for r in q_repetition_strip(spark, rep_dir).collect()}
    assert (out[0]["n_tokens"], out[0]["n_kept"]) == (6, 3)
    assert out[0]["clean_hash"] == _hash60_py("a b c")
    # alternating tokens survive untouched — only CONSECUTIVE runs collapse
    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (4, 4)
    assert out[1]["clean_hash"] == _hash60_py("x y x y")
    assert (out[2]["n_tokens"], out[2]["n_kept"]) == (0, 0)
    assert out[2]["clean_hash"] == _hash60_py("")
    assert (out[3]["n_tokens"], out[3]["n_kept"]) == (1, 1)
    # "a  a\tb" splits on \s+ -> [a, a, b] -> [a, b]
    assert (out[4]["n_tokens"], out[4]["n_kept"]) == (3, 2)
    assert out[4]["clean_hash"] == _hash60_py("a b")
    assert (out[5]["n_tokens"], out[5]["n_kept"]) == (8, 1)
    assert out[5]["clean_hash"] == _hash60_py("q")


def test_repetition_strip_preserves_order_on_corpus(spark):
    """On the real corpus: stripping is idempotent (re-stripping the
    cleaned text changes nothing) and never reorders — verified by
    brute force on a sample."""
    from pyspark.sql import functions as F

    from data_validator_spark.queries import load

    rows = (
        load(spark, SF, "documents")
        .where(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    from data_validator_spark.queries.textops import q_repetition_strip

    out = {r["doc_id"]: r for r in q_repetition_strip(spark, SF).collect()}
    for r in rows:
        toks = r["text"].split() if r["text"].strip() else []
        kept = [t for i, t in enumerate(toks) if i == 0 or toks[i - 1] != t]
        o = out[r["doc_id"]]
        assert o["n_tokens"] == len(toks)
        assert o["n_kept"] == len(kept)
        assert o["clean_hash"] == _hash60_py(" ".join(kept))


# -- global_shuffle --------------------------------------------------------
def test_global_shuffle_is_a_permutation(spark):
    from data_validator_spark.queries.pipeline_ops import (
        N_SHARDS,
        SHUFFLE_SALT,
        q_global_shuffle,
    )

    rows = q_global_shuffle(spark, SF).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows) == 500
    # shard is the salted hash mod N_SHARDS, recomputed independently
    by_shard: dict[int, list] = {}
    for r in rows:
        h = _hash60_py(f"{SHUFFLE_SALT}:{r['doc_id']}")
        assert r["shard_id"] == h % N_SHARDS
        by_shard.setdefault(r["shard_id"], []).append((h, r["doc_id"], r["shard_pos"]))
    # within each shard: positions are 1..n and ordered by (hash, id)
    for members in by_shard.values():
        members.sort()
        assert [m[2] for m in members] == list(range(1, len(members) + 1))


def test_global_shuffle_deterministic(spark):
    from data_validator_spark.queries.pipeline_ops import q_global_shuffle

    a = sorted(map(tuple, q_global_shuffle(spark, SF).collect()))
    b = sorted(map(tuple, q_global_shuffle(spark, SF).collect()))
    assert a == b


# -- semdedup --------------------------------------------------------------
@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    """18 one-hot 64-dim vectors: ids 0..15 are e_0..e_15 (the derived
    nlist=16 coarse centroids, mutually orthogonal), ids 16 and 17
    duplicate e_3 exactly."""

    def onehot(i):
        v = [0.0] * 64
        v[i] = 1.0
        return v

    rows = [(i, onehot(i), 0) for i in range(16)]
    rows += [(16, onehot(3), 0), (17, onehot(3), 0)]
    d = tmp_path_factory.mktemp("embs")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_semdedup_drops_exact_semantic_dups(spark, emb_dir):
    from data_validator_spark.queries.similarity import q_semdedup

    out = {r["cluster_id"]: r for r in q_semdedup(spark, emb_dir).collect()}
    assert len(out) == 16
    # cluster 3 holds e_3 and its two clones; keep-lowest-id drops both clones
    assert out[3]["n_members"] == 3 and out[3]["n_dropped"] == 2
    for cid, r in out.items():
        if cid != 3:
            assert r["n_members"] == 1 and r["n_dropped"] == 0
    assert sum(r["n_members"] for r in out.values()) == 18


def test_semdedup_members_cover_corpus(spark):
    """On the real corpus the per-cluster member counts sum to the
    corpus size (every vector lands in exactly one cluster), and
    dropped <= members - 1 per cluster."""
    from data_validator_spark.queries.similarity import q_semdedup

    rows = q_semdedup(spark, SF).collect()
    assert sum(r["n_members"] for r in rows) == 500
    for r in rows:
        assert 0 <= r["n_dropped"] <= r["n_members"] - 1
