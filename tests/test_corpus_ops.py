"""Semantic tests for the corpus-preparation operators (corpus_ops):
crafted inputs through the real query functions via tmp parquet dirs
shaped like the synthetic testdata."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        # doc 0: dense in query terms, short
        (0, "spark query spark stream", "en", "srcA", 24),
        # doc 1: same tf but much longer -> lower bm25
        (1, "spark query spark stream " + "filler word " * 40, "en", "srcA", 500),
        # doc 2: one term only
        (2, "window pane cleaner", "en", "srcA", 19),
        # doc 3: no query terms
        (3, "completely unrelated text here", "en", "srcB", 30),
        # docs 4/5 share a long run -> substring dup; 5 flagged vs 4
        (4, "prefix one " + shared, "en", "srcB", 70),
        (5, shared + " suffix two", "en", "srcB", 70),
        # doc 6: unique long text, no dup
        (6, "zebra xylophone quartz vortex jackal numb wharf glyph", "en", "srcB", 53),
        # srcA has 4 docs, srcB 4; add a dominant source srcC
        (7, "common words common words common words", "en", "srcC", 38),
        (8, "common words common words common words", "en", "srcC", 38),
        (9, "common words common words common words", "en", "srcC", 38),
        (10, "common words common words common words", "en", "srcC", 38),
        (11, "common words common words common words", "en", "srcC", 38),
        (12, "common words common words common words", "en", "srcC", 38),
        (13, "common words common words common words", "en", "srcC", 38),
        (14, "common words common words common words", "en", "srcC", 38),
    ]
    d = tmp_path_factory.mktemp("corpus_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bm25_ranking_semantics(spark, doc_dir):
    from data_validator_spark.queries.corpus_ops import q_bm25_topk

    rows = q_bm25_topk(spark, doc_dir).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    # same tf, shorter doc wins (length normalization)
    assert scores[0] > scores[1]
    # doc with no query terms scores 0
    assert scores.get(3, 0.0) == pytest.approx(0.0)
    # output is sorted by score desc with doc_id tiebreak
    pairs = [(-r["score"], r["doc_id"]) for r in rows]
    assert pairs == sorted(pairs)


def test_substring_dedup_flags_shared_run(spark, doc_dir):
    from data_validator_spark.queries.corpus_ops import q_substring_dedup

    out = {r["doc_id"]: r for r in q_substring_dedup(spark, doc_dir).collect()}
    # doc 5 shares a >=24-char normalized run with doc 4
    assert 5 in out and out[5]["dup_of"] == 4
    # unique doc never flagged; the canonical (earliest) owner never flagged
    assert 6 not in out and 4 not in out
    # the identical srcC docs chain back to the first of them
    assert out[8]["dup_of"] == 7


def test_trigram_lm_prefers_typical_text(spark, doc_dir):
    from data_validator_spark.queries.corpus_ops import q_trigram_lm_score

    out = {r["doc_id"]: r for r in q_trigram_lm_score(spark, doc_dir).collect()}
    # the 8 identical srcC docs are made of the corpus's dominant
    # trigrams -> higher (less negative) avg logp than the one-off zoo
    assert out[7]["avg_logp"] > out[6]["avg_logp"]
    # every scored doc has n_trigrams = len(norm) - 2 > 0
    assert all(r["n_trigrams"] > 0 for r in out.values())


def test_quantile_shard_partitions_corpus(spark, doc_dir):
    from data_validator_spark.queries.corpus_ops import N_SHARDS, q_quantile_shard

    rows = q_quantile_shard(spark, doc_dir).collect()
    assert sum(r["n_docs"] for r in rows) == 15
    assert all(0 <= r["shard"] < N_SHARDS for r in rows)
    # shards are contiguous, non-overlapping token ranges
    ordered = sorted(rows, key=lambda r: r["shard"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["max_tokens"] <= b["min_tokens"]


def test_domain_mix_downsamples_dominant_source(spark, doc_dir):
    from data_validator_spark.queries.corpus_ops import q_domain_mix_sample

    out = {r["source"]: r for r in q_domain_mix_sample(spark, doc_dir).collect()}
    # srcC is over-represented (8/15 vs uniform 5) -> rate < 1
    assert out["srcC"]["n_kept"] < out["srcC"]["n_before"]
    # under-represented sources keep everything (rate clamps at 1)
    assert out["srcA"]["n_kept"] == out["srcA"]["n_before"] == 3
    # deterministic: same result on re-run
    out2 = {r["source"]: r for r in q_domain_mix_sample(spark, doc_dir).collect()}
    assert {k: v["id_checksum"] for k, v in out.items()} == {
        k: v["id_checksum"] for k, v in out2.items()
    }


def test_heavy_hitters_cms_bounds(spark, doc_dir):
    from data_validator_spark.queries.corpus_ops import q_heavy_hitters_cms

    rows = q_heavy_hitters_cms(spark, doc_dir).collect()
    # CMS never underestimates
    assert all(r["est_count"] >= r["exact_count"] for r in rows)
    by_tok = {r["token"]: r for r in rows}
    # "common"/"words" appear 3x in each of 8 srcC docs
    assert by_tok["common"]["exact_count"] == 24
    assert by_tok["words"]["exact_count"] == 24


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    import random

    rng = random.Random(7)

    def vec(center, jitter):
        return [float(c + rng.uniform(-jitter, jitter)) for c in center]

    a = [1.0] + [0.0] * 63
    b = [0.0] * 63 + [1.0]
    rows = []
    for i in range(10):
        rows.append((i, vec(a, 0.01), 0))
    for i in range(10, 20):
        rows.append((i, vec(b, 0.01), 1))
    d = tmp_path_factory.mktemp("corpus_emb")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_kmeans_separates_planted_clusters(spark, emb_dir):
    from data_validator_spark.queries.corpus_ops import q_kmeans_embeddings

    rows = q_kmeans_embeddings(spark, emb_dir).collect()
    assert sum(r["n_members"] for r in rows) == 20
    # the two planted blobs are 1.4 apart with 0.01 jitter: no cluster
    # can straddle them, so the far blob (vec_ids 10..19, none of which
    # seeded a centroid near it... vec_id 0..7 seed) groups together
    big = max(rows, key=lambda r: r["n_members"])
    assert big["n_members"] >= 10 and big["min_vec_id"] >= 10 or any(
        r["min_vec_id"] >= 10 and r["n_members"] == 10 for r in rows
    )
    # deterministic re-run
    again = q_kmeans_embeddings(spark, emb_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_k_anonymity_flags_small_groups(spark, tmp_path_factory):
    from data_validator_spark.queries.corpus_ops import K_ANON, q_k_anonymity

    rows = [(i, f"c{i}", 1, 0.0, "SEG_BIG") for i in range(K_ANON + 2)]
    rows += [(100 + i, f"r{i}", 2, 0.0, "SEG_RARE") for i in range(3)]
    d = tmp_path_factory.mktemp("anon")
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    out = q_k_anonymity(spark, str(d)).collect()
    assert [(r["c_nationkey"], r["c_mktsegment"], r["group_size"]) for r in out] == [
        (2, "SEG_RARE", 3)
    ]


def test_sampling_ops_invariant_under_input_order(spark, doc_dir, tmp_path):
    """Hash-based keeps and histogram-derived shards must not depend on
    row order or partitioning — the property that makes corpus subsets
    reproducible across cluster layouts and retries."""
    from pyspark.sql import functions as F

    from data_validator_spark.queries.corpus_ops import (
        q_domain_mix_sample,
        q_quantile_shard,
    )

    df = spark.read.parquet(f"{doc_dir}/documents.parquet")
    d2 = tmp_path / "shuffled"
    d2.mkdir()
    (
        df.orderBy(F.desc("doc_id"))
        .repartition(3)
        .write.parquet(str(d2 / "documents.parquet"))
    )
    for q in (q_domain_mix_sample, q_quantile_shard):
        a = sorted(map(tuple, q(spark, doc_dir).collect()))
        b = sorted(map(tuple, q(spark, str(d2)).collect()))
        assert a == b, q.__name__


# -- l_diversity -------------------------------------------------------------
def test_l_diversity_matches_brute_force(spark, tmp_path):
    """Crafted customers: one group k-anonymous but single-band (the
    leak k-anonymity misses), one diverse group, one in-debt band."""
    import math
    from collections import defaultdict

    from data_validator_spark.queries.corpus_ops import L_DIVERSITY, q_l_diversity

    rows = [
        # group (1, 'A'): 12 members, ALL in band 5 -> violates
        *[(i, f"c{i}", 1, 5432.10, "A") for i in range(12)],
        # group (2, 'B'): 3 members in 3 bands -> diverse
        (100, "x", 2, 100.0, "B"),
        (101, "y", 2, 2100.0, "B"),
        (102, "z", 2, -50.0, "B"),  # debt class = band -1
        # group (3, 'C'): 2 members in 2 bands -> violates (L=3)
        (200, "p", 3, 999.995, "C"),   # rounds to 100000 cents = band 1
        (201, "q", 3, 999.99, "C"),    # 99999 cents = band 0
    ]
    d = tmp_path / "cust"
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))

    def band(b):
        return -1 if b < 0 else int(math.floor(b * 100 + 0.5)) // 100000

    census = defaultdict(lambda: defaultdict(int))
    for _, _, nk, bal, seg in rows:
        census[(nk, seg)][band(bal)] += 1
    got = {(r["c_nationkey"], r["c_mktsegment"]): r
           for r in q_l_diversity(spark, str(d)).collect()}
    assert set(got) == set(census)
    for key, bands in census.items():
        r = got[key]
        total = sum(bands.values())
        assert r["group_size"] == total
        assert r["n_sensitive_bands"] == len(bands)
        assert r["top_band_share_micro"] == (max(bands.values()) * 1_000_000) // total
        assert r["violates_l"] == int(len(bands) < L_DIVERSITY)
    assert got[(1, "A")]["violates_l"] == 1      # big but single-band
    assert got[(2, "B")]["violates_l"] == 0
    assert got[(3, "C")]["violates_l"] == 1
    # the .995 boundary exercises half-up cents: band 1, not band 0
    assert got[(3, "C")]["n_sensitive_bands"] == 2


def test_l_diversity_census_on_corpus(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.corpus_ops import q_l_diversity

    SF = "/root/testdata/sf0.001"
    rows = q_l_diversity(spark, SF).collect()
    n = load(spark, SF, "customer").count()
    assert sum(r["group_size"] for r in rows) == n
    for r in rows:
        assert 1 <= r["n_sensitive_bands"] <= r["group_size"]
        assert 0 < r["top_band_share_micro"] <= 1_000_000


def test_kmeans_centroid_cache_evicts_on_dataset_rewrite(spark, tmp_path):
    """r16: the trained-centroid session cache must not serve a stale
    model after the dataset is rewritten at the same path — the
    standard rewrite discipline (evict_session_caches between
    same-path rewrites) has to reach the new scalar cache too. The
    post-rewrite output is checked against a DuckDB recomputation of
    the op's own oracle SQL on the v2 files."""
    import duckdb

    from data_validator_spark.queries import build_registry, evict_session_caches
    from data_validator_spark.queries.corpus_ops import EMB_DIM, q_kmeans_embeddings

    def write(seed):
        import random

        rng = random.Random(seed)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(EMB_DIM)], i % 3)
            for i in range(120)
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label long"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    def oracle_rows():
        _, oracles = build_registry()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{tmp_path}/embeddings.parquet/*.parquet')"
        )
        return sorted(tuple(r) for r in con.execute(
            oracles["kmeans_embeddings"]
        ).fetchall())

    def spark_rows():
        return sorted(
            tuple(r) for r in q_kmeans_embeddings(spark, str(tmp_path)).collect()
        )

    write(seed=1)
    assert spark_rows() == oracle_rows()
    write(seed=2)  # same path, same row count — only values change
    evict_session_caches(str(tmp_path))
    assert spark_rows() == oracle_rows()


def test_kmeans_assign_kernel_matches_exact_reference(spark):
    """r17: the Arrow assignment kernel's integer arithmetic must equal
    an independently-computed exact reference — per-component
    quantize-then-subtract on the milli-unit grid, argmin ties to the
    lowest cluster id — including negative components and values that
    sit exactly on the .5 rounding boundary."""
    import math

    from pyspark.sql import functions as F

    from data_validator_spark.queries.corpus_ops import _assign

    vecs = [
        (0, [0.0015, -0.0005, 1.0, -1.0]),     # exact .5 boundaries
        (1, [0.0014999, -0.00051, 0.9994999, -0.9995]),
        (2, [0.25, 0.25, 0.25, 0.25]),
        (3, [-0.75, 0.5, -0.5, 0.75]),
        (4, [2.0, -2.0, 0.0, 0.0]),
    ]
    cents = [(0, [0.0, 0.0, 1.0, -1.0]), (1, [0.25, 0.25, 0.25, 0.25])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist"])
        for r in _assign(df, cents).collect()
    }

    def q(x):
        return int(math.floor(x * 1000.0 + 0.5))

    for vid, v in vecs:
        best = None
        for cid, c in cents:
            d = sum((q(a) - q(b)) ** 2 for a, b in zip(v, c))
            if best is None or d < best[1]:  # strict <: ties keep lowest cid
                best = (cid, d)
        assert got[vid] == best, (vid, got[vid], best)


def test_kmeans_assign_kernel_scale_invariance_sanity(spark):
    """A vector exactly AT a centroid must assign there with distance
    zero, and a distance must be symmetric under swapping vector and
    centroid values (both quantize on the same grid)."""
    from data_validator_spark.queries.corpus_ops import _assign

    a = [0.123, -0.456, 0.789, -0.012]
    b = [-0.3, 0.2, -0.1, 0.4]
    df = spark.createDataFrame(
        [(0, a), (1, b)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r for r in _assign(df, [(0, a), (1, b)]).collect()}
    assert got[0]["cluster_id"] == 0 and got[0]["dist"] == 0
    assert got[1]["cluster_id"] == 1 and got[1]["dist"] == 0
    # cross distances: d(a as vector, b as centroid) == d(b, a)
    d_ab = {r["vec_id"]: r["dist"] for r in _assign(df, [(0, b)]).collect()}[0]
    d_ba = {r["vec_id"]: r["dist"] for r in _assign(df, [(0, a)]).collect()}[1]
    assert d_ab == d_ba > 0
