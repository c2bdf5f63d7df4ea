"""Semantic tests for the curation-audit operators (vocab_growth /
domain_diversity / lang_id_confusion): crafted inputs through the real
query functions, brute-force-verified in pure Python, plus physical
plan guards (broadcast-only joins, no corpus-scale window/sort)."""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


def _norm(text: str) -> str:
    t = text.lower()
    t = re.sub(r"[^a-z0-9_ \t\n]", "", t)
    t = re.sub(r"[ \t\n]+", " ", t)
    return t.strip()


@pytest.fixture(scope="module")
def cur_dir(spark, tmp_path_factory):
    rows = [
        (0, "the cat sat", "en", "web", 11),
        (1, "the dog sat", "en", "web", 11),
        (2, "a new word appears", "en", "books", 18),
        (3, "", "en", "web", 0),
        (4, "le chat et le chien", "fr", "web", 19),
        (5, "der hund und die katze", "de", "web", 22),
        (6, "the the the", "en", "wiki", 11),
        (7, "zzz yyy xxx www", "xx", "web", 15),
        (8, "cat dog bird fish", "en", "books", 17),
        (9, "final doc unique tokens", "en", "web", 23),
    ]
    d = tmp_path_factory.mktemp("curdocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), rows


# -- vocab_growth ------------------------------------------------------------
def _vocab_growth_py(rows, n_deciles=10):
    ids = [r[0] for r in rows]
    mn, mx = min(ids), max(ids)
    out = []
    for i in range(1, n_deciles + 1):
        thr = mn + ((mx - mn + 1) * i) // n_deciles
        pre = [r for r in rows if r[0] < thr]
        toks_per_doc = [
            [t for t in _norm(r[1]).split(" ") if t != ""] for r in pre
        ]
        vocab = set()
        for r in rows:
            for t in _norm(r[1]).split(" "):
                if t != "" and r[0] < thr:
                    vocab.add(t)
        out.append(
            (
                i,
                thr,
                len(pre),
                sum(len(ts) for ts in toks_per_doc),
                len(vocab),
            )
        )
    return out


def test_vocab_growth_matches_brute_force(spark, cur_dir):
    from data_validator_spark.queries.curation_ops import q_vocab_growth

    d, rows = cur_dir
    got = [
        (r["decile"], r["threshold_doc"], r["n_docs"],
         r["n_token_occurrences"], r["vocab_size"])
        for r in q_vocab_growth(spark, d).collect()
    ]
    assert got == _vocab_growth_py(rows)


def test_vocab_growth_monotone_on_corpus(spark):
    """On the real corpus the curve is monotone non-decreasing in all
    three cumulative counts and ends at the full-corpus totals."""
    from data_validator_spark.queries.curation_ops import q_vocab_growth
    from data_validator_spark.queries import load
    from data_validator_spark.functions.text import normalized_text
    from pyspark.sql import functions as F

    rows = q_vocab_growth(spark, SF).collect()
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_token_occurrences"] <= b["n_token_occurrences"]
        assert a["vocab_size"] <= b["vocab_size"]
    docs = load(spark, SF, "documents").select(
        normalized_text(F.col("text")).alias("norm")
    )
    n_docs = docs.count()
    full_vocab = (
        docs.select(F.explode(F.split("norm", " ")).alias("t"))
        .where(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert rows[-1]["n_docs"] == n_docs
    assert rows[-1]["vocab_size"] == full_vocab


def test_vocab_growth_plan_has_no_corpus_join_fanout(spark):
    """Corpus-scale relations may only meet the 1-row bounds broadcast
    (in-row decile assignment): every join in the plan must be
    broadcast-built, and the only Window runs over the 10-row decile
    relation (cumulative curve), never a corpus partition."""
    from data_validator_spark.queries.curation_ops import q_vocab_growth

    plan = q_vocab_growth(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the cumulative window must sit above the per-decile aggregation
    # (10-row input), not above a corpus-scale scan
    assert plan.count("Window") >= 1


# -- domain_diversity --------------------------------------------------------
def _diversity_py(rows):
    from collections import Counter

    by_lang = {}
    for r in rows:
        by_lang.setdefault(r[2], Counter())[r[3]] += 1
    out = []
    for lang in sorted(by_lang):
        c = by_lang[lang]
        total = sum(c.values())
        sum_sq = sum(v * v for v in c.values())
        out.append(
            (
                lang,
                total,
                len(c),
                (sum_sq * 1_000_000) // (total * total),
                (total * total * 1_000_000) // sum_sq,
                (max(c.values()) * 1_000_000) // total,
            )
        )
    return out


def test_domain_diversity_matches_brute_force(spark, cur_dir):
    from data_validator_spark.queries.curation_ops import q_domain_diversity

    d, rows = cur_dir
    got = [
        (r["lang"], r["n_docs"], r["n_sources"], r["simpson_micro"],
         r["inv_simpson_micro"], r["top_source_share_micro"])
        for r in q_domain_diversity(spark, d).collect()
    ]
    assert got == _diversity_py(rows)
    # crafted check: 'en' = web:4 books:2 wiki:1 → T=7, sumsq=21
    en = dict((g[0], g) for g in got)["en"]
    assert en[1] == 7 and en[2] == 3
    assert en[3] == (21 * 1_000_000) // 49
    assert en[5] == (4 * 1_000_000) // 7
    # single-source languages collapse to simpson=1e6, inv=1e6
    fr = dict((g[0], g) for g in got)["fr"]
    assert fr[3] == 1_000_000 and fr[4] == 1_000_000 and fr[5] == 1_000_000


def test_domain_diversity_bounds_on_corpus(spark):
    """Index invariants on the real corpus: simpson in [1e6/S, 1e6],
    inv_simpson in [~1e6, S*1e6], top share ≥ 1e6/S (floor-div slack
    one unit)."""
    from data_validator_spark.queries.curation_ops import q_domain_diversity

    for r in q_domain_diversity(spark, SF).collect():
        s = r["n_sources"]
        assert 1_000_000 // s - 1 <= r["simpson_micro"] <= 1_000_000
        assert 999_999 <= r["inv_simpson_micro"] <= s * 1_000_000
        assert r["top_source_share_micro"] >= 1_000_000 // s - 1


# -- lang_id_confusion -------------------------------------------------------
def test_lang_id_confusion_matches_lang_id_entry(spark, cur_dir):
    """The confusion matrix must aggregate EXACTLY the per-doc
    predictions the lang_id registry entry emits, joined to gold."""
    from collections import Counter

    from data_validator_spark.queries.curation_ops import q_lang_id_confusion
    from data_validator_spark.queries.textops import q_lang_id
    from data_validator_spark.queries import load

    d, rows = cur_dir
    pred = {r["doc_id"]: r["lang_pred"] for r in q_lang_id(spark, d).collect()}
    gold = {r[0]: r[2] for r in rows}
    expect = Counter((gold[i], pred[i]) for i in gold)
    got = q_lang_id_confusion(spark, d).collect()
    assert {(r["gold_lang"], r["pred_lang"]): r["n_docs"] for r in got} == dict(expect)
    for r in got:
        assert r["is_match"] == int(r["gold_lang"] == r["pred_lang"])
    # crafted rows: doc 7 has no stopword hits in any language → 'und'
    assert pred[7] == "und"


def test_lang_id_confusion_totals_on_corpus(spark):
    from data_validator_spark.queries.curation_ops import q_lang_id_confusion
    from data_validator_spark.queries import load

    rows = q_lang_id_confusion(spark, SF).collect()
    n = load(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n
    assert all(r["n_docs"] > 0 for r in rows)


# -- boilerplate_prefix ------------------------------------------------------
@pytest.fixture(scope="module")
def boil_dir(spark, tmp_path_factory):
    rows = [
        (0, "Terms of service apply here", "en", "s", 27),
        (1, "terms of service differ completely", "en", "s", 34),
        (2, "terms of service", "en", "s", 16),          # exactly 3 tokens
        (3, "unique opening line one", "en", "s", 23),
        (4, "short", "en", "s", 5),                      # 1-token prefix
        (5, "short", "fr", "s", 5),                      # same prefix, other lang
        (6, "", "fr", "s", 0),                           # excluded (empty norm)
        (7, "!!!", "fr", "s", 3),                        # norm empty -> excluded
        (8, "bonjour le monde entier", "fr", "s", 23),
    ]
    d = tmp_path_factory.mktemp("boildocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), rows


def test_boilerplate_prefix_matches_brute_force(spark, boil_dir):
    from collections import Counter, defaultdict

    from data_validator_spark.queries.curation_ops import (
        PREFIX_TOKENS,
        q_boilerplate_prefix,
    )

    d, rows = boil_dir
    pref = {}
    for doc_id, text, lang, _, _ in rows:
        nm = _norm(text)
        if nm == "":
            continue
        pref[doc_id] = (lang, " ".join(nm.split(" ")[:PREFIX_TOKENS]))
    sizes = Counter(p for _, p in pref.values())
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for lang, p in pref.values():
        a = agg[lang]
        a[0] += 1
        a[1].add(p)
        a[2] += 1 if sizes[p] > 1 else 0
        a[3] = max(a[3], sizes[p])
    got = {r["lang"]: r for r in q_boilerplate_prefix(spark, d).collect()}
    assert set(got) == set(agg)
    for lang, (nd, ps, shared, mx) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["n_prefixes"], r["n_docs_shared_prefix"],
                r["max_prefix_group"]) == (nd, len(ps), shared, mx)
        assert r["shared_share_micro"] == (shared * 1_000_000) // nd
    # cross-lang template: docs 4 (en) and 5 (fr) share prefix 'short',
    # so BOTH languages see a shared-prefix doc
    assert got["en"]["n_docs_shared_prefix"] >= 1
    assert got["fr"]["n_docs_shared_prefix"] >= 1
    # docs 0 and 1 normalize to the same 3-token opener 'terms of service'
    assert got["en"]["max_prefix_group"] >= 3  # docs 0, 1, 2


def test_boilerplate_prefix_totals_on_corpus(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.functions.text import normalized_text
    from data_validator_spark.queries import load
    from data_validator_spark.queries.curation_ops import q_boilerplate_prefix

    rows = q_boilerplate_prefix(spark, SF).collect()
    n_nonempty = (
        load(spark, SF, "documents")
        .where(normalized_text(F.col("text")) != "")
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_nonempty
    for r in rows:
        assert 0 <= r["n_docs_shared_prefix"] <= r["n_docs"]
        assert r["n_prefixes"] <= r["n_docs"]
        assert 0 <= r["shared_share_micro"] <= 1_000_000
