"""Text-analysis column functions on small literal frames."""

from __future__ import annotations

import pytest

from data_validator_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    normalized_text,
    quality_features,
    rolling_shingle_hashes,
    token_count,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "el perro y el gato en la casa con un amigo"),
        (3, ""),
        (4, "   "),
        (5, "Hello, World! 123abc"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def vals(df, col):
    return {r["id"]: r[col] for r in df.collect()}


def test_token_count(spark, docs):
    out = vals(docs.select("id", token_count(F.col("text")).alias("n")), "n")
    assert out[1] == 9
    assert out[3] == 0 and out[4] == 0  # empty/blank → 0


def test_bpe_ish_token_count(spark, docs):
    out = vals(docs.select("id", bpe_ish_token_count(F.col("text")).alias("n")), "n")
    # "Hello, World! 123abc" → Hello , World ! 123 abc = 6
    assert out[5] == 6


def test_normalized_text(spark, docs):
    out = vals(docs.select("id", normalized_text(F.col("text")).alias("t")), "t")
    assert out[1] == "the quick brown fox jumps over the lazy dog"
    assert out[5] == "hello world 123abc"
    assert out[3] == "" and out[4] == ""


def test_doc_fingerprint_collides_on_case_and_punct(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "different")],
        "id int, text string",
    )
    out = vals(df.select("id", doc_fingerprint(F.col("text")).alias("f")), "f")
    assert out[1] == out[2] != out[3]


def test_lang_id(spark, docs):
    out = vals(docs.select("id", lang_id(F.col("text")).alias("lang")), "lang")
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_features_ratios(spark):
    df = spark.createDataFrame([(1, "ab 12.")], "id int, text string")
    f = quality_features(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in f.items()]).collect()[0].asDict()
    assert row["n_chars"] == 6
    assert row["alpha_ratio"] == 2 / 6
    assert row["digit_ratio"] == 2 / 6
    assert row["punct_ratio"] == 1 / 6
    assert row["space_ratio"] == 1 / 6


def test_quality_features_empty_text_null_ratios(spark):
    df = spark.createDataFrame([(1, "")], "id int, text string")
    f = quality_features(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in f.items()]).collect()[0].asDict()
    assert row["alpha_ratio"] is None and row["mean_token_len"] is None


def test_rolling_shingle_hashes(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "a b c d")], "id int, text string"
    )
    out = vals(df.select("id", rolling_shingle_hashes(F.col("text"), 3).alias("h")), "h")
    assert len(out[1]) == 2  # "a b c", "b c d"
    assert len(out[2]) == 1  # short doc → one whole-text shingle
    assert out[1] == out[3]  # deterministic
    assert all(isinstance(x, int) for x in out[1])


def test_doc_split_sample_is_deterministic_and_complete(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.textops import q_doc_split_sample

    sf = "/root/testdata/sf0.001"
    a = {(r.lang, r.split): r.n_docs for r in q_doc_split_sample(spark, sf).collect()}
    b = {(r.lang, r.split): r.n_docs for r in q_doc_split_sample(spark, sf).collect()}
    assert a == b  # hash-based, not RNG: identical on every run
    total = load(spark, sf, "documents").count()
    assert sum(a.values()) == total  # every doc lands in exactly one split
    train = sum(n for (_, s), n in a.items() if s == "train")
    assert 0.9 * total <= train <= total  # ~98% nominal
