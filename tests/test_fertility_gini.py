"""Semantic tests for tokenizer_fertility (per-language token-cost
census) and user_activity_gini (count-of-counts Gini) — crafted inputs
through the real query functions, brute-force-verified in pure
Python."""

from __future__ import annotations

import datetime
import re

import pytest

SF = "/root/testdata/sf0.001"


# -- tokenizer_fertility -----------------------------------------------------
def _bpe_count(text: str) -> int:
    return len(re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]", text))


def _ws_count(text: str) -> int:
    t = text.strip()
    return 0 if not t else len(re.split(r"[ \t\n\x0B\f\r]+", t))


@pytest.fixture(scope="module")
def fert_dir(spark, tmp_path_factory):
    rows = [
        (0, "hello world", "en", "s", 11),
        (1, "a1b2 c3!", "en", "s", 8),          # digit/letter runs + punct
        (2, "", "xx", "s", 0),                   # empty: all counts 0
        (3, "une phrase simple", "fr", "s", 17),
        (4, "!!!", "fr", "s", 3),                # punct-only
        (5, "word", "en", "s", 4),
    ]
    d = tmp_path_factory.mktemp("fertdocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), rows


def test_tokenizer_fertility_matches_brute_force(spark, fert_dir):
    from collections import defaultdict

    from data_validator_spark.queries.textops import q_tokenizer_fertility

    d, rows = fert_dir
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for _, text, lang, _, _ in rows:
        a = agg[lang]
        a[0] += 1
        a[1] += len(text)
        a[2] += _bpe_count(text)
        a[3] += _ws_count(text)
    got = {r["lang"]: r for r in q_tokenizer_fertility(spark, d).collect()}
    assert set(got) == set(agg)
    for lang, (nd, ch, bpe, ws) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["chars_total"], r["bpe_total"], r["words_total"]) == (
            nd, ch, bpe, ws,
        )
        assert r["chars_per_bpe_micro"] == (
            (ch * 1_000_000) // bpe if bpe else None
        )
        assert r["bpe_per_word_micro"] == (
            (bpe * 1_000_000) // ws if ws else None
        )
    # the empty-text language exercises the nullif(0) path
    assert got["xx"]["chars_per_bpe_micro"] is None


def test_tokenizer_fertility_consistent_with_token_count(spark):
    """On the real corpus the per-language totals must equal the sums
    of the per-doc token_count entry joined to lang."""
    from pyspark.sql import functions as F

    from data_validator_spark.queries import load
    from data_validator_spark.queries.textops import q_token_count, q_tokenizer_fertility

    per_doc = q_token_count(spark, SF)
    langs = load(spark, SF, "documents").select("doc_id", "lang")
    expect = {
        r["lang"]: (r["ws"], r["bpe"])
        for r in per_doc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("ws"),
            F.sum("n_bpe_tokens").cast("bigint").alias("bpe"),
        )
        .collect()
    }
    got = {r["lang"]: (r["words_total"], r["bpe_total"])
           for r in q_tokenizer_fertility(spark, SF).collect()}
    assert got == expect


# -- user_activity_gini ------------------------------------------------------
@pytest.fixture(scope="module")
def gini_dir(spark, tmp_path_factory):
    base = datetime.datetime(2022, 1, 1)
    rows = []
    eid = 0
    # 'flat': 4 users x 3 events each -> Gini 0
    for u in range(4):
        for j in range(3):
            rows.append((eid, base + datetime.timedelta(minutes=eid), u, "flat", 1.0, "{}"))
            eid += 1
    # 'skew': users with 1,1,1,9 events
    for u, n in enumerate([1, 1, 1, 9]):
        for j in range(n):
            rows.append((eid, base + datetime.timedelta(minutes=eid), 100 + u, "skew", 1.0, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("ginievents")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d), rows


def _gini_py(counts):
    xs = sorted(counts)
    n, s = len(xs), sum(xs)
    a = 2 * sum((i + 1) * x for i, x in enumerate(xs))
    return ((a - s * (n + 1)) * 1_000_000) // (n * s)


def test_user_activity_gini_matches_brute_force(spark, gini_dir):
    from data_validator_spark.queries.mining_ops import q_user_activity_gini

    d, rows = gini_dir
    got = {r["event_type"]: r for r in q_user_activity_gini(spark, d).collect()}
    assert got["flat"]["gini_micro"] == 0
    assert got["flat"]["n_users"] == 4 and got["flat"]["n_events"] == 12
    assert got["skew"]["gini_micro"] == _gini_py([1, 1, 1, 9])
    # exact value: xs=[1,1,1,9], A=2*(1+2+3+36)=84, S=12, N=4 ->
    # (84-60)*1e6 // 48 = 500000
    assert got["skew"]["gini_micro"] == 500_000
    assert got["skew"]["max_events_per_user"] == 9


def test_user_activity_gini_vs_ranked_definition_on_corpus(spark):
    """On the real corpus, the histogram formula must equal the
    textbook ranked-user computation done by brute force."""
    from collections import Counter

    from data_validator_spark.queries import load
    from data_validator_spark.queries.mining_ops import q_user_activity_gini

    events = load(spark, SF, "events").select("event_type", "user_id").collect()
    per = Counter((r["event_type"], r["user_id"]) for r in events)
    by_type = {}
    for (et, _), k in per.items():
        by_type.setdefault(et, []).append(k)
    got = {r["event_type"]: r["gini_micro"]
           for r in q_user_activity_gini(spark, SF).collect()}
    assert got == {et: _gini_py(ks) for et, ks in by_type.items()}


# -- events_user_cap ---------------------------------------------------------
def test_events_user_cap_matches_brute_force(spark, gini_dir):
    from collections import defaultdict

    from data_validator_spark.queries.mining_ops import USER_CAP, q_events_user_cap

    d, rows = gini_dir
    # rank each user's events by (ts, event_id) across ALL types
    by_user = defaultdict(list)
    for eid, ts, uid, et, _, _ in rows:
        by_user[uid].append((ts, eid, et))
    cells = defaultdict(lambda: [0, 0, 0])
    for uid, evs in by_user.items():
        for rank, (_, _, et) in enumerate(sorted(evs), start=1):
            c = cells[et]
            c[0] += 1
            c[1] += 1 if rank <= USER_CAP else 0
            c[2] += 1 if rank > USER_CAP else 0
    got = {r["event_type"]: (r["n_total"], r["n_kept"], r["n_dropped"])
           for r in q_events_user_cap(spark, d).collect()}
    assert got == {et: tuple(v) for et, v in cells.items()}


def test_events_user_cap_small_cap(spark, tmp_path):
    """With a monkeypatched cap of 2, a 5-event user keeps exactly its
    first 2 events by (ts, event_id)."""
    import datetime as dt

    import data_validator_spark.queries.mining_ops as mo

    rows = [
        (i, dt.datetime(2022, 1, 1, 0, 5 - i), 7, "click", 1.0, "{}")
        for i in range(5)  # later event_id = EARLIER ts
    ]
    d = tmp_path / "cap"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    old = mo.USER_CAP
    try:
        mo.USER_CAP = 2
        got = q = mo.q_events_user_cap(spark, str(d)).collect()
        assert [(r["n_total"], r["n_kept"], r["n_dropped"]) for r in got] == [(5, 2, 3)]
    finally:
        mo.USER_CAP = old


def test_events_user_cap_totals_on_corpus(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.mining_ops import q_events_user_cap

    rows = q_events_user_cap(spark, SF).collect()
    n = load(spark, SF, "events").count()
    assert sum(r["n_total"] for r in rows) == n
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_total"]
