"""Semantic tests for quality_ops + triangle_count: PSI accounting
identities, FK audit invariants, Benford share accounting,
reconciliation bookkeeping vs a pandas recompute, n-gram contamination
vs a brute-force Python recompute, and the triangle census vs a
brute-force count over the collected pair graph."""

from __future__ import annotations

import itertools

SF = "/root/testdata/sf0.001"


def test_drift_psi_accounting(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import PSI_BUCKETS, q_drift_psi

    rows = q_drift_psi(spark, SF).collect()
    assert len(rows) == PSI_BUCKETS
    assert [r["bucket"] for r in rows] == list(range(PSI_BUCKETS))
    n_li = load(spark, SF, "lineitem").count()
    assert sum(r["ref_cnt"] + r["cur_cnt"] for r in rows) == n_li
    # smoothed shares each sum to 1 (up to the 1e-6 decimal rounding)
    assert abs(sum(r["ref_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["cur_share"] for r in rows) - 1.0) < 1e-4
    # every PSI term is non-negative: (p-q) and ln(p/q) share sign
    assert all(r["psi_term"] >= -1e-6 for r in rows)


def test_fk_integrity_invariants(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import FK_RELATIONS, q_fk_integrity

    rows = {r["relation"]: r for r in q_fk_integrity(spark, SF).collect()}
    assert set(rows) == {label for label, *_ in FK_RELATIONS}
    counts = {
        t: load(spark, SF, t).count()
        for t in {c for _, c, _, p, _ in FK_RELATIONS for c in (c, p)}
    }
    for label, child, _ckey, parent, _pkey in FK_RELATIONS:
        r = rows[label]
        # the synthetic generator emits no orphans anywhere
        assert r["n_orphan_rows"] == 0, label
        assert r["n_child_rows"] == counts[child], label
        assert r["n_child_keys"] <= r["n_child_rows"], label
        assert r["n_matched_keys"] <= r["n_parent_keys"], label
        assert r["n_parent_keys"] == counts[parent], label
        expect_cov = round(100.0 * r["n_matched_keys"] / r["n_parent_keys"], 4)
        assert abs(r["coverage_pct"] - expect_cov) < 1e-3, label
    # every nation referenced by customers (dense dim)
    assert rows["customer_nation"]["coverage_pct"] == 100.0


def test_benford_shares_account(spark):
    from data_validator_spark.queries.quality_ops import (
        BENFORD_EXPECTED,
        q_benford_check,
    )

    rows = q_benford_check(spark, SF).collect()
    assert 1 <= len(rows) <= 9
    assert all(1 <= r["d"] <= 9 for r in rows)
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["exp_share"] == BENFORD_EXPECTED[r["d"]]
        assert abs(r["abs_dev"] - round(abs(r["obs_share"] - r["exp_share"]), 6)) < 2e-6


def test_reconciliation_matches_pandas(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import q_reconciliation_check

    row = q_reconciliation_check(spark, SF).collect()[0]
    li = load(spark, SF, "lineitem").toPandas()
    orders = load(spark, SF, "orders").toPandas()
    li["line"] = li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax)
    per_order = li.groupby("l_orderkey")["line"].sum()
    merged = orders.set_index("o_orderkey").join(per_order, how="left")
    with_lines = merged["line"].notna()
    diffs = (merged.o_totalprice - merged["line"]).abs()
    assert row["n_orders"] == len(orders)
    assert row["n_with_lines"] == int(with_lines.sum())
    assert row["n_matched"] + row["n_mismatched"] == row["n_with_lines"]
    assert abs(row["max_abs_diff"] - diffs[with_lines].max()) < 1e-3
    # mismatch count agrees with the pandas recompute away from the
    # tolerance boundary (exact decimal vs float64 rounding)
    assert abs(row["n_mismatched"] - int((diffs[with_lines] > 0.01).sum())) <= 1


def test_ngram_contamination_bruteforce(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import CONTAM_N, q_ngram_contamination
    from data_validator_spark.queries.textops import TRAIN_CUT, VAL_CUT, SPLIT_SALT
    import hashlib

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(f"{SPLIT_SALT}:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % 100

    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    train_grams: set[str] = set()
    test_docs: dict[int, set[str]] = {}
    for r in docs:
        toks = r["text"].strip().split()
        grams = {
            " ".join(toks[i : i + CONTAM_N])
            for i in range(len(toks) - CONTAM_N + 1)
        }
        b = bucket(r["doc_id"])
        if b < TRAIN_CUT:
            train_grams |= grams
        elif b >= VAL_CUT:
            test_docs[r["doc_id"]] = grams

    rows = {r["doc_id"]: r for r in q_ngram_contamination(spark, SF).collect()}
    assert set(rows) == {d for d, g in test_docs.items() if g}
    for d, grams in test_docs.items():
        if not grams:
            continue
        assert rows[d]["n_grams"] == len(grams)
        assert rows[d]["n_contaminated"] == len(grams & train_grams)


def test_drift_ks_bruteforce(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import PSI_PIVOT, q_drift_ks
    import pandas as pd

    row = q_drift_ks(spark, SF).collect()[0]
    li = load(spark, SF, "lineitem").select("l_extendedprice", "l_shipdate").toPandas()
    cents = (li.l_extendedprice * 100 + 0.5).apply(lambda x: int(x))
    is_ref = li.l_shipdate < pd.Timestamp(PSI_PIVOT)
    ref = sorted(cents[is_ref])
    cur = sorted(cents[~is_ref])
    values = sorted(set(cents))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(ref, v) / len(ref)
            - bisect.bisect_right(cur, v) / len(cur)
        )
        for v in values
    )
    assert row["n_ref_total"] == len(ref)
    assert row["n_cur_total"] == len(cur)
    assert row["n_distinct_values"] == len(values)
    assert abs(row["ks_d"] - d) < 2e-6
    assert 0.0 <= row["ks_d"] <= 1.0


def test_quality_ensemble_component_agreement(spark):
    """The ensemble's flags must equal its source operators' flags and
    the fused keep must be their conjunction."""
    from data_validator_spark.queries.mining_ops import (
        q_char_entropy,
        q_gopher_quality,
    )
    from data_validator_spark.queries.quality_ops import q_quality_ensemble

    ens = {r["doc_id"]: r for r in q_quality_ensemble(spark, SF).collect()}
    gop = {r["doc_id"]: r["keep"] for r in q_gopher_quality(spark, SF).collect()}
    ent = {r["doc_id"]: r["keep"] for r in q_char_entropy(spark, SF).collect()}
    assert set(ens) == set(gop) == set(ent)
    for d, r in ens.items():
        assert r["gopher_keep"] == gop[d]
        assert r["ent_keep"] == ent[d]
        assert r["keep"] == int(
            r["gopher_keep"] == 1 and r["ent_keep"] == 1 and r["lm_keep"] == 1
        )
        assert 0.0 <= r["score"] <= 1.0
    # at least one gate must actually discriminate on this corpus
    # (the fused keep can legitimately be all-0 at tiny SF)
    discriminating = [
        flag
        for flag in ("gopher_keep", "ent_keep", "lm_keep")
        if {r[flag] for r in ens.values()} == {0, 1}
    ]
    assert discriminating, "no ensemble gate separates any documents"


def test_ccnet_buckets_tertiles(spark):
    from data_validator_spark.queries.corpus_ops import q_trigram_lm_score
    from data_validator_spark.queries.quality_ops import q_ccnet_buckets

    rows = {r["bucket"]: r for r in q_ccnet_buckets(spark, SF).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    n_docs = q_trigram_lm_score(spark, SF).count()
    sizes = [rows[b]["n_docs"] for b in ("head", "middle", "tail")]
    assert sum(sizes) == n_docs
    assert max(sizes) - min(sizes) <= 1  # ntile equal-split contract
    # head is the most fluent tertile: its worst score is no worse
    # than the best score of middle, and middle's than tail's
    assert rows["head"]["min_logp"] >= rows["middle"]["max_logp"] - 1e-9
    assert rows["middle"]["min_logp"] >= rows["tail"]["max_logp"] - 1e-9


def test_doc_chunk_bruteforce(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.textops import CHUNK_S, CHUNK_W, q_doc_chunk

    rows = q_doc_chunk(spark, SF).collect()
    docs = {r["doc_id"]: r["text"].strip().split() for r in
            load(spark, SF, "documents").select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in docs.items() if t}
    for d, toks in docs.items():
        n = len(toks)
        expect_k = 1 if n <= CHUNK_W else ((n - CHUNK_W + CHUNK_S - 1) // CHUNK_S) + 1
        chunks = sorted(by_doc[d], key=lambda r: r["chunk_idx"])
        assert len(chunks) == expect_k, d
        for r in chunks:
            start = r["chunk_idx"] * CHUNK_S
            expect = toks[start : start + CHUNK_W]
            assert r["start_tok"] == start + 1
            assert r["n_chunk_tokens"] == len(expect)
        # neighbors overlap by W-S tokens (except a short last chunk)
        if expect_k > 1:
            assert chunks[0]["n_chunk_tokens"] == CHUNK_W


def test_dsir_importance_direction(spark):
    """Target-like docs (gopher keep=1) must average a higher
    importance weight than non-target docs — the defining DSIR
    property — and every weight must be finite."""
    from data_validator_spark.queries.corpus_ops import q_dsir_importance
    from data_validator_spark.queries.mining_ops import q_gopher_quality
    import math

    w = {r["doc_id"]: r["dsir_logw"] for r in q_dsir_importance(spark, SF).collect()}
    keep = {r["doc_id"]: r["keep"] for r in q_gopher_quality(spark, SF).collect()}
    assert set(w) == set(keep)
    assert all(math.isfinite(v) for v in w.values())
    kept = [w[d] for d in w if keep[d] == 1]
    dropped = [w[d] for d in w if keep[d] == 0]
    if kept and dropped:
        assert sum(kept) / len(kept) > sum(dropped) / len(dropped)


def test_ann_recall_eval_bounds(spark):
    from data_validator_spark.queries.similarity import (
        N_QUERIES,
        TOP_K,
        q_ann_recall_eval,
        q_similarity_ann_ivf,
        q_similarity_topk,
    )

    rows = {r["query_id"]: r for r in q_ann_recall_eval(spark, SF).collect()}
    assert len(rows) == N_QUERIES
    truth = {}
    for r in q_similarity_topk(spark, SF).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    retr = {}
    for r in q_similarity_ann_ivf(spark, SF).collect():
        retr.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid, r in rows.items():
        assert r["n_truth"] == len(truth[qid]) == TOP_K
        assert r["n_retrieved"] == len(retr.get(qid, set()))
        assert r["n_hit"] == len(truth[qid] & retr.get(qid, set()))
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert abs(r["recall_at_k"] - round(r["n_hit"] / r["n_truth"], 6)) < 2e-6


def test_fd_check_bruteforce(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import FD_CANDIDATES, q_fd_check

    rows = {r["fd"]: r for r in q_fd_check(spark, SF).collect()}
    assert set(rows) == {f"{t}.{l}->{r}" for t, l, r in FD_CANDIDATES}
    for table, lhs, rhs in FD_CANDIDATES:
        r = rows[f"{table}.{lhs}->{rhs}"]
        data = load(spark, SF, table).select(lhs, rhs).collect()
        groups: dict = {}
        for row in data:
            groups.setdefault(row[lhs], set()).add(row[rhs])
        assert r["n_rows"] == len(data)
        assert r["n_groups"] == len(groups)
        assert r["n_violating_groups"] == sum(1 for v in groups.values() if len(v) > 1)
    # the nation PK dependency must hold exactly
    assert rows["nation.n_nationkey->n_regionkey"]["n_violating_groups"] == 0


def test_mad_outliers_bruteforce(spark):
    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import (
        MAD_COLUMN,
        MAD_KS,
        q_mad_outliers,
    )
    import statistics

    row = q_mad_outliers(spark, SF).collect()[0]
    xs = [r[MAD_COLUMN] for r in load(spark, SF, "lineitem").select(MAD_COLUMN).collect()]
    med = statistics.median(xs)
    ads = [abs(x - med) for x in xs]
    mad = statistics.median(ads)
    assert row["n_rows"] == len(xs)
    assert abs(row["median"] - med) < 1e-3
    assert abs(row["mad"] - mad) < 1e-3
    for k in MAD_KS:
        got = row[f"n_out_{int(k)}mad"]
        want = sum(1 for a in ads if a > k * mad)
        assert abs(got - want) <= 1, k  # median interp rounding slack
    # counts must be monotonically non-increasing in k
    counts = [row[f"n_out_{int(k)}mad"] for k in MAD_KS]
    assert counts == sorted(counts, reverse=True)


def test_key_skew_audit_bruteforce(spark):
    from collections import Counter

    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import SKEW_KEYS, q_key_skew_audit

    rows = {r["key"]: r for r in q_key_skew_audit(spark, SF).collect()}
    assert set(rows) == {f"{t}.{k}" for t, k in SKEW_KEYS}
    for table, key in SKEW_KEYS:
        r = rows[f"{table}.{key}"]
        freqs = Counter(
            row[key] for row in load(spark, SF, table).select(key).collect()
        )
        assert r["n_rows"] == sum(freqs.values())
        assert r["n_keys"] == len(freqs)
        assert r["max_freq"] == max(freqs.values())
        expect_skew = round(
            max(freqs.values()) * len(freqs) / sum(freqs.values()), 6
        )
        assert abs(r["skew_factor"] - expect_skew) < 2e-6
        assert abs(
            r["top_share"] - round(max(freqs.values()) / sum(freqs.values()), 6)
        ) < 2e-6
        assert r["skew_factor"] >= 1.0 - 1e-9


def test_key_skew_audit_empty_table_parity(spark, tmp_path):
    """An EMPTY audited table must still get its audit row with the
    oracle's scalar-aggregate semantics (n_keys 0, every other stat
    NULL) — a bare groupBy('key') would silently drop the one table an
    audit most needs to report. Proven by running the real DuckDB
    oracle on the same parquet files and comparing full row sets."""
    import duckdb

    from data_validator_spark.queries.quality_ops import (
        _sql_key_skew,
        q_key_skew_audit,
    )

    spark.createDataFrame([], "user_id long").coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "l_partkey long, l_suppkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(5,), (5,), (6,)], "o_custkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))

    got = [tuple(r) for r in q_key_skew_audit(spark, str(tmp_path)).collect()]

    con = duckdb.connect()
    for t in ("events", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    want = [tuple(r) for r in con.execute(_sql_key_skew()).fetchall()]
    con.close()
    assert got == want
    empty = dict(zip([r[0] for r in got], got))["events.user_id"]
    assert empty[1] is None and empty[2] == 0 and empty[3] is None


def test_event_transitions_bruteforce(spark):
    from collections import Counter, defaultdict

    from data_validator_spark.queries import load
    from data_validator_spark.queries.analytics import q_event_transitions

    rows = {(r["from_type"], r["to_type"]): r for r in
            q_event_transitions(spark, SF).collect()}
    ev = load(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    assert set(rows) == set(counts)
    from_tot: Counter = Counter()
    for (a, _), n in counts.items():
        from_tot[a] += n
    for k, n in counts.items():
        assert rows[k]["n"] == n
        assert abs(rows[k]["prob"] - round(n / from_tot[k[0]], 6)) < 2e-6
    # each from-row's probabilities sum to 1
    for a in from_tot:
        tot = sum(r["prob"] for (f, _), r in rows.items() if f == a)
        assert abs(tot - 1.0) < 1e-4


def test_conversion_lag_bruteforce(spark):
    from collections import defaultdict

    from data_validator_spark.queries import load
    from data_validator_spark.queries.analytics import q_conversion_lag

    row = q_conversion_lag(spark, SF).collect()[0]
    ev = load(spark, SF, "events").select("user_id", "ts", "event_type").collect()
    signups: dict = {}
    purchases = defaultdict(list)
    for r in ev:
        if r["event_type"] == "signup":
            s = signups.get(r["user_id"])
            if s is None or r["ts"] < s:
                signups[r["user_id"]] = r["ts"]
        elif r["event_type"] == "purchase":
            purchases[r["user_id"]].append(r["ts"])
    lags = []
    for u, s in signups.items():
        after = [p for p in purchases.get(u, []) if p >= s]
        if after:
            lags.append(int((min(after) - s).total_seconds()))
    assert row["n_signup_users"] == len(signups)
    assert row["n_converted"] == len(lags)
    import statistics

    if lags:
        assert abs(row["p50_lag_s"] - statistics.median(lags)) < 1.0
        assert row["p50_lag_s"] <= row["p90_lag_s"]
    assert abs(
        row["conversion_pct"] - round(100.0 * len(lags) / len(signups), 6)
    ) < 2e-6


def test_weighted_sample_deterministic_and_correct(spark):
    import hashlib
    import math

    from data_validator_spark.queries import load
    from data_validator_spark.queries.pipeline_ops import (
        WSAMPLE_K,
        WSAMPLE_SALT,
        q_weighted_sample,
    )

    rows = q_weighted_sample(spark, SF).collect()
    assert len(rows) == WSAMPLE_K
    docs = load(spark, SF, "documents").select("doc_id", "n_chars").collect()

    def key(doc_id: int, w: int) -> float:
        h = int(
            hashlib.md5(f"{WSAMPLE_SALT}:{doc_id}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(2**60)
        return round(math.log(u) / w, 6)

    ranked = sorted(
        ((key(r["doc_id"], r["n_chars"]), r["doc_id"]) for r in docs),
        key=lambda t: (-t[0], t[1]),
    )[:WSAMPLE_K]
    assert [r["doc_id"] for r in rows] == [d for _, d in ranked]
    # re-running yields the identical sample (hash-derived, no RNG)
    rows2 = q_weighted_sample(spark, SF).collect()
    assert [r["doc_id"] for r in rows2] == [r["doc_id"] for r in rows]


def test_triangle_count_bruteforce(spark):
    from data_validator_spark.queries.dedup import _lsh_pairs_df
    from data_validator_spark.queries.graph_ops import q_triangle_count

    row = q_triangle_count(spark, SF).collect()[0]
    pairs = {(r["doc_a"], r["doc_b"]) for r in _lsh_pairs_df(spark, SF).collect()}
    nodes = {n for e in pairs for n in e}
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1
        for x, y, z in itertools.combinations(sorted(nodes), 3)
        if (x, y) in pairs and (x, z) in pairs and (y, z) in pairs
    )
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(pairs)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tris
    expect_t = round(3.0 * tris / wedges, 6) if wedges else 0.0
    assert abs(row["transitivity"] - expect_t) < 2e-6


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from data_validator_spark.queries import load
    from data_validator_spark.queries.quality_ops import CORR_COLUMNS, q_corr_matrix

    rows = q_corr_matrix(spark, SF).collect()
    k = len(CORR_COLUMNS)
    assert len(rows) == k * (k - 1) // 2

    li = load(spark, SF, "lineitem").toPandas()
    units = {}
    for name, _expr, scale in CORR_COLUMNS:
        x = li[name].to_numpy(dtype=float)
        units[name] = (
            x.astype(np.int64)
            if scale == 1.0
            else np.floor(x * scale + 0.5).astype(np.int64)
        )
    n = len(li)
    for r in rows:
        x, y = units[r["col_x"]], units[r["col_y"]]
        assert r["n_rows"] == n
        expect_corr = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
        assert abs(r["corr"] - expect_corr) < 5e-6, (r["col_x"], r["col_y"])
    scales = {name: s for name, _e, s in CORR_COLUMNS}
    for r in rows:
        x = units[r["col_x"]]
        assert abs(r["mean_x"] - x.mean() / scales[r["col_x"]]) < 2e-6
        y = units[r["col_y"]]
        assert abs(r["mean_y"] - y.mean() / scales[r["col_y"]]) < 2e-6


def test_corr_matrix_zero_variance_is_null(spark, tmp_path):
    """A zero-variance column must yield NULL r (guarded), never
    inf/NaN; a perfectly linear pair must yield exactly 1.0."""
    from data_validator_spark.queries.quality_ops import q_corr_matrix

    rows_in = [(float(q), 10.0 * q, 0.01 * (q % 3), 0.02) for q in range(1, 9)]
    df = spark.createDataFrame(
        rows_in,
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {(r["col_x"], r["col_y"]): r for r in q_corr_matrix(spark, str(tmp_path)).collect()}
    assert out[("l_quantity", "l_extendedprice")]["corr"] == 1.0
    for (cx, cy), r in out.items():
        if "l_tax" in (cx, cy):
            assert r["corr"] is None, (cx, cy)


def test_contam_train_cache_evicts_on_dataset_rewrite(spark, tmp_path):
    """r16: the persisted train-gram relation must not leak across a
    same-path dataset rewrite — after evict_session_caches the next
    run rebuilds it from the v2 corpus (checked against a DuckDB
    recomputation of the op's own oracle SQL on the v2 files)."""
    import duckdb

    from data_validator_spark.queries import build_registry, evict_session_caches
    from data_validator_spark.queries.quality_ops import q_ngram_contamination

    def write(seed):
        import random

        rng = random.Random(seed)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        rows = [
            (
                i,
                " ".join(rng.choice(words) for _ in range(rng.randint(8, 30))),
                "en",
                f"src{i % 3}",
            )
            for i in range(400)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def oracle_rows():
        _, oracles = build_registry()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path}/documents.parquet/*.parquet')"
        )
        return sorted(tuple(r) for r in con.execute(
            oracles["ngram_contamination"]
        ).fetchall())

    def spark_rows():
        return sorted(
            tuple(r) for r in q_ngram_contamination(spark, str(tmp_path)).collect()
        )

    write(seed=11)
    assert spark_rows() == oracle_rows()
    write(seed=12)  # same path, same row count — only text changes
    evict_session_caches(str(tmp_path))
    assert spark_rows() == oracle_rows()
