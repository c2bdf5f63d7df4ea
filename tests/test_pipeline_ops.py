"""Semantic tests for the training-pipeline operators (pipeline_ops):
crafted inputs through the real query functions via a tmp parquet dir
shaped like the synthetic testdata."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    rows = [
        (0, "contact bob@example.com or +1 555-123-4567 now", "en", "s", 46),
        (1, "server at 10.0.0.1 and 192.168.1.255 rebooted", "en", "s", 45),
        (2, "hello world " * 50, "en", "s", 600),
        (3, "hello world " * 50, "en", "s", 600),  # exact dup of 2
        (4, "", "de", "s", 0),
        (5, "kurz", "de", "s", 4),
    ]
    d = tmp_path_factory.mktemp("docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_pii_scrub_counts_and_redaction(spark, doc_dir):
    from data_validator_spark.queries.pipeline_ops import q_pii_scrub

    out = {r["doc_id"]: r for r in q_pii_scrub(spark, doc_dir).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[1]["n_ips"] == 2
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_phones"] == 0
    # identical docs scrub to identical hashes
    assert out[2]["scrub_hash"] == out[3]["scrub_hash"]


def test_pii_scrub_replaces_email_before_ip(spark):
    # an email containing a dotted quad must become <EMAIL>, not <IP>
    from pyspark.sql import functions as F

    from data_validator_spark.queries.pipeline_ops import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    df = spark.createDataFrame([("mail a1.2.3.4@h.example.com now",)], "text string")
    scrubbed = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
            ),
            PII_PHONE,
            "<PHONE>",
        ).alias("t")
    ).first()["t"]
    assert scrubbed == "mail <EMAIL> now"


def test_sequence_pack_budget_and_coverage(spark, doc_dir):
    from data_validator_spark.queries.pipeline_ops import (
        PACK_BUDGET,
        q_sequence_pack,
    )

    rows = q_sequence_pack(spark, doc_dir).collect()
    # every document lands in exactly one pack
    assert sum(r["n_docs"] for r in rows) == 6
    for r in rows:
        # a pack only overflows via its LAST doc straddling the boundary;
        # total minus that doc fits the budget
        assert r["n_tokens"] - PACK_BUDGET < PACK_BUDGET or r["n_docs"] == 1
        assert r["first_doc"] <= r["last_doc"]
    # doc 2 (100 tokens) and doc 3 start in the same first en pack
    en0 = [r for r in rows if r["lang"] == "en" and r["pack_id"] == 0][0]
    assert en0["n_docs"] >= 2


def test_dedup_keep_best_picks_longest_then_lowest_id(spark, doc_dir):
    from data_validator_spark.queries.pipeline_ops import q_dedup_keep_best

    rows = q_dedup_keep_best(spark, doc_dir).collect()
    clusters = {r["cluster_fp"]: r for r in rows}
    dup = [r for r in rows if r["n_members"] == 2]
    assert len(dup) == 1 and dup[0]["keeper_doc_id"] == 2  # tie -> lower id
    assert dup[0]["n_dropped"] == 1
    assert sum(r["n_members"] for r in rows) == 6


def test_stratified_sample_deterministic_and_per_stratum(spark):
    from data_validator_spark.queries.pipeline_ops import q_stratified_sample

    a = {r["lang"]: r for r in q_stratified_sample(spark, SF).collect()}
    b = {r["lang"]: r for r in q_stratified_sample(spark, SF).collect()}
    assert a.keys() == b.keys()
    for lang in a:
        assert a[lang]["n_sampled"] == b[lang]["n_sampled"]
        assert a[lang]["sampled_id_sum"] == b[lang]["sampled_id_sum"]
        # ~20% with generous slack on small strata
        frac = a[lang]["n_sampled"] / a[lang]["n_total"]
        assert 0.05 <= frac <= 0.40, (lang, frac)


def test_embedding_norm_quant_bounds(spark):
    from data_validator_spark.queries.pipeline_ops import q_embedding_norm_quant

    rows = q_embedding_norm_quant(spark, SF).limit(2000).collect()
    assert rows
    for r in rows:
        assert -128 <= r["q_min"] <= r["q_max"] <= 128
        assert r["l2_norm"] >= 0.0


def test_split_contamination_detects_planted_dup(spark, tmp_path):
    """Plant an identical document in train and in test; the test row
    must report exactly that one contamination."""
    import hashlib

    from data_validator_spark.queries.pipeline_ops import q_split_contamination
    from data_validator_spark.queries.textops import SPLIT_SALT

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(f"{SPLIT_SALT}:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 100

    train_id = next(i for i in range(1000) if bucket(i) < 98)
    val_id = next(i for i in range(1000) if bucket(i) == 98)
    test_id = next(i for i in range(1000) if bucket(i) == 99)
    other = next(i for i in range(train_id + 1, 1000) if bucket(i) < 98)
    rows = [
        (train_id, "the quick brown fox", "en", "s", 19),
        (other, "totally different text here", "en", "s", 27),
        (val_id, "unrelated validation text", "en", "s", 25),
        (test_id, "The quick  brown FOX.", "en", "s", 21),  # normalizes equal
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r["split"]: r for r in q_split_contamination(spark, str(tmp_path)).collect()}
    assert out["test"]["n_contaminated"] == 1
    assert out["test"]["n_leaked_fingerprints"] == 1
    assert out["test"]["contaminated_id_sum"] == test_id
    assert out["val"]["n_contaminated"] == 0
    assert out["val"]["n_docs"] == 1


def test_containment_dominates_jaccard(spark):
    """|A∩B|/|A| >= |A∩B|/|A∪B| for every candidate pair, and both
    directions stay in [0, 1]."""
    from data_validator_spark.queries.dedup import (
        q_dedup_ngram_jaccard,
        q_minhash_containment,
    )

    sf = "/root/testdata/sf0.001"
    cont = {
        (r["doc_a"], r["doc_b"]): r for r in q_minhash_containment(spark, sf).collect()
    }
    assert cont
    for (a, b), r in cont.items():
        assert 0.0 <= r["contain_a_in_b"] <= 1.0
        assert 0.0 <= r["contain_b_in_a"] <= 1.0
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q_dedup_ngram_jaccard(spark, sf).collect()
    }
    checked = 0
    for pair, j in jac.items():
        assert pair in cont
        assert cont[pair]["contain_a_in_b"] >= j - 1e-6
        assert cont[pair]["contain_b_in_a"] >= j - 1e-6
        checked += 1
    assert checked
