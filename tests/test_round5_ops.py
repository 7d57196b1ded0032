"""Round-5 second-wave operators: bigram LM scoring, ROC-AUC, EWMA,
boolean retrieval — each checked against an independent single-node
reference and for parallelism invariance (the oracle gate covers the
SQL side; these pin the kernels on adversarial shapes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from crawler_service_ray.functions import relational as rel
from crawler_service_ray.functions import text as tx


def _bigram_reference(train_texts, test_rows, k):
    """Dict-based add-k bigram LM (the independent reference)."""
    bc: dict = {}
    ctx: dict = {}
    vocab = set()
    for t in train_texts:
        ws = [w for w in t.split(" ") if w != ""]
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = float(len(vocab))
    out = {}
    for doc_id, t in test_rows:
        ws = [w for w in t.split(" ") if w != ""]
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        nll = [-np.log((bc.get(p, 0) + k) / (ctx.get(p[0], 0) + k * v))
               for p in pairs]
        out[doc_id] = (len(pairs), round(float(np.mean(nll)), 4))
    return out


def test_bigram_lm_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    train_texts = [" ".join(rng.choice(words, size=rng.integers(2, 40)))
                   for _ in range(40)]
    # test docs exercise: seen bigrams, unseen bigram of seen words,
    # unseen context word, double spaces, single-token doc (no bigrams)
    test_texts = train_texts[:10] + [
        "w0 w29 w1  w2", "zzz w0 qqq", "only", "w5 w5 w5 w5"]
    train = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(train_texts), dtype="int64"),
        "text": train_texts})).repartition(4)
    test = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(test_texts), dtype="int64"),
        "text": test_texts})).repartition(3)

    got = (tx.bigram_lm_score(train, test, k=0.1)
           .to_pandas().set_index("doc_id").sort_index())
    want = _bigram_reference(
        train_texts, list(enumerate(test_texts)), k=0.1)

    assert set(got.index) == set(want)  # the no-bigram doc is absent
    for did, (n, nll) in want.items():
        assert got.loc[did, "n_bigrams"] == n
        assert got.loc[did, "avg_nll"] == pytest.approx(nll, abs=2e-4)


def test_roc_auc_matches_pairwise_definition(ray_session):
    rng = np.random.default_rng(3)
    n = 400
    # deliberately coarse scores so ties span both labels
    sc = np.round(rng.normal(size=n), 1)
    pos = (sc + rng.normal(scale=1.5, size=n) > 0).astype("int64")
    df = pd.DataFrame({"sc": sc, "pos": pos})

    got = rel.roc_auc(rd.from_pandas(df).repartition(5),
                      "sc", "pos").to_pandas().iloc[0]

    p, q = sc[pos == 1], sc[pos == 0]
    wins = (p[:, None] > q[None, :]).sum() + 0.5 * (p[:, None] == q[None, :]).sum()
    want = wins / (len(p) * len(q))
    assert got["n_pos"] == len(p) and got["n_neg"] == len(q)
    assert got["auc"] == pytest.approx(want, abs=1e-6)
    # parallelism invariance
    got1 = rel.roc_auc(rd.from_pandas(df).repartition(1),
                       "sc", "pos").to_pandas().iloc[0]
    assert got1["auc"] == got["auc"]


def test_grouped_ewma_matches_recurrence(ray_session):
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 7, size=n).astype("int64"),
        "ts": rng.permutation(n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "v": np.round(rng.normal(size=n) * 10, 2),
    })
    got = (rel.grouped_ewma(rd.from_pandas(df).repartition(6),
                            key="k", ts_col="ts", val_col="v",
                            tiebreak="id", alpha=0.5, num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))

    want = {}
    for k, g in df.sort_values(["ts", "id"]).groupby("k"):
        y = None
        for rid, x in zip(g["id"], g["v"]):
            y = x if y is None else 0.5 * y + 0.5 * x
            want[rid] = np.floor(abs(y) * 1e6 + 0.5) * np.sign(y) / 1e6
    assert np.allclose(got.set_index("id")["ewma"],
                       pd.Series(want).sort_index(), atol=0, rtol=0)


def test_boolean_search_matches_reference(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "a b c",          # all three
            "a a b b c c a",  # all three, repeated
            "a b",            # missing c
            "c",              # missing a b
            "",               # empty
            "x a y b z c",    # all three, interleaved
        ],
    })
    got = (tx.boolean_search(rd.from_pandas(docs).repartition(3),
                             terms=["a", "b", "c"])
           .to_pandas()["doc_id"].sort_values().tolist())
    assert got == [0, 1, 5]


def test_lsh_topk_planted_and_monotone(ray_session):
    rng = np.random.default_rng(5)
    n, d = 300, 32
    base = rng.normal(size=(n, d))
    # plant: vec 1 is a near-copy of vec 0 — identical sign pattern, so
    # they collide in EVERY table and LSH must return it at rank 1
    base[1] = base[0] + 1e-6 * np.abs(base[0])
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(base.astype("float32"))})
    ds = rd.from_pandas(df).repartition(4)
    from crawler_service_ray.functions import similarity as sim

    q = base[[0]].astype(np.float64)
    got = sim.lsh_topk(ds, q, np.array([0]), k=5,
                       n_tables=8, n_bits=8).to_pandas()
    top1 = got.sort_values("rank").iloc[0]
    assert top1["neighbor_id"] == 1 and top1["cosine"] > 0.999999

    # candidate monotonicity: a shared seed makes table t a prefix of
    # t+1, so the L=2 result set is a subset of the L=8 candidate pool
    # -> recall of the exact top-5 can only grow
    exact = sim.brute_force_topk(ds, q, np.array([0]), k=5).to_pandas()
    want = set(exact["neighbor_id"])

    def rec(L):
        g = sim.lsh_topk(ds, q, np.array([0]), k=5, n_tables=L,
                         n_bits=8).to_pandas()
        return len(want & set(g["neighbor_id"])) / len(want)
    assert rec(8) >= rec(2)

    # parallelism invariance
    a = sim.lsh_topk(rd.from_pandas(df).repartition(1), q, np.array([0]),
                     k=5, n_tables=8, n_bits=8).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("rank").reset_index(drop=True),
        got.sort_values("rank").reset_index(drop=True))


def test_leakage_safe_split_co_travels_near_dups(ray_session):
    from crawler_service_ray.functions import dedup as dd

    # 40 distinct docs + 3 planted near-dup families (one per split
    # boundary risk); family members must land in the SAME split
    rng = np.random.default_rng(9)
    words = [f"t{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(40)]
    fam = {40: 0, 41: 0, 42: 7, 43: 7, 44: 13, 45: 13, 46: 13}
    for did, src in fam.items():
        texts.append(texts[src] + " extraword")
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts})
    ds = rd.from_pandas(docs).repartition(4)
    pairs = dd.ngram_jaccard_pairs(ds, k=5, threshold=0.5)
    out = (dd.leakage_safe_split(ds, pairs)
           .to_pandas().set_index("doc_id")["split"])

    assert len(out) == len(texts) and set(out.unique()) <= {
        "train", "val", "test"}
    for did, src in fam.items():
        assert out[did] == out[src], (did, src)
    # and the pair set itself never crosses splits
    for _, r in pairs.to_pandas().iterrows():
        assert out[r["id_a"]] == out[r["id_b"]]


def test_balanced_hash_shards_deterministic_and_balanced(ray_session):
    from crawler_service_ray.functions.relational import (
        balanced_hash_shards,
    )

    ids = np.arange(10_000, dtype="int64")
    df = pd.DataFrame({"doc_id": ids, "v": ids * 2})
    a = (balanced_hash_shards(rd.from_pandas(df).repartition(1),
                              "doc_id", 8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (balanced_hash_shards(rd.from_pandas(df).repartition(13),
                              "doc_id", 8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # same id -> same shard at ANY parallelism (the resume contract)
    pd.testing.assert_frame_equal(a, b)
    sizes = a["shard"].value_counts()
    assert set(a["shard"].unique()) == set(range(8))
    # balance: within one coarse bin (2^12 bins) of the ideal n/S
    max_bin = 10_000 / (1 << 12) + 1
    ideal = 10_000 / 8
    assert (sizes - ideal).abs().max() <= max_bin + 1
    # passengers untouched
    assert (a["v"] == a["doc_id"] * 2).all()

    # string ids (crawl URLs) take the 64-bit content-hash path with
    # the same determinism contract
    sdf = pd.DataFrame(
        {"doc_id": [f"https://h{i % 7}.test/p/{i}" for i in range(3000)]})
    sa = (balanced_hash_shards(rd.from_pandas(sdf).repartition(2),
                               "doc_id", 4)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    sb = (balanced_hash_shards(rd.from_pandas(sdf).repartition(9),
                               "doc_id", 4)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(sa, sb)
    assert set(sa["shard"].unique()) == set(range(4))


def test_pareto_frontier_matches_brute_force(ray_session):
    rng = np.random.default_rng(21)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "price": rng.uniform(0, 100, n).round(2),
        "size": rng.integers(1, 50, n).astype("int64"),
    })
    # plant exact ties on the frontier: duplicated (price, size) points
    # are mutually non-dominating and must BOTH survive
    df.loc[0, ["price", "size"]] = (0.01, 49)
    df.loc[1, ["price", "size"]] = (0.01, 49)
    got = (rel.pareto_frontier(
        rd.from_pandas(df).repartition(7), "price", "size")
        .to_pandas().sort_values("id").reset_index(drop=True))
    p, s = df["price"].to_numpy(), df["size"].to_numpy()
    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dominated[i] = bool(np.any(
            (p <= p[i]) & (s <= s[i]) & ((p < p[i]) | (s < s[i]))))
    want = df.loc[~dominated].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["id", "price", "size"]], want[["id", "price", "size"]])
    assert {0, 1} <= set(got["id"])


def test_frequent_pairs_dedups_within_basket(ray_session):
    # basket 1: items (1,2,2,3) -> pairs (1,2),(1,3),(2,3) ONCE each
    # (the duplicate 2 must not inflate support); pair (1,2) recurs in
    # baskets 2 and 3 -> support 3
    df = pd.DataFrame({
        "b": [1, 1, 1, 1, 2, 2, 3, 3, 4],
        "i": [1, 2, 2, 3, 1, 2, 2, 1, 9],
    })
    got = (rel.frequent_pairs(
        rd.from_pandas(df).repartition(3), "b", "i", min_support=2)
        .to_pandas().sort_values(["item_a", "item_b"])
        .reset_index(drop=True))
    want = pd.DataFrame({"item_a": [1], "item_b": [2],
                         "support": [3]})
    pd.testing.assert_frame_equal(
        got.astype({"support": "int64"}), want.astype({"support": "int64"}))
    # support >= 1 recovers every within-basket pair exactly once
    all_pairs = (rel.frequent_pairs(
        rd.from_pandas(df).repartition(3), "b", "i", min_support=1)
        .to_pandas())
    assert len(all_pairs) == 3 and int(all_pairs["support"].sum()) == 5


def test_mutual_info_independence_and_identity(ray_session):
    rng = np.random.default_rng(3)
    n = 20_000
    a = rng.integers(0, 4, n)
    # independent column: MI ~ 0 (within plug-in estimator bias)
    b_ind = rng.integers(0, 5, n)
    df = pd.DataFrame({"a": a.astype("int64"), "b": b_ind.astype("int64")})
    mi0 = rel.mutual_info(rd.from_pandas(df).repartition(5), "a", "b")
    assert float(mi0["mi_bits"][0]) < 0.01
    # deterministic function of a: MI == H(a)
    df2 = pd.DataFrame({"a": a.astype("int64"),
                        "b": (a * 7).astype("int64")})
    mi1 = rel.mutual_info(rd.from_pandas(df2).repartition(5), "a", "b")
    pa_ = np.bincount(a) / n
    h = float(-(pa_[pa_ > 0] * np.log2(pa_[pa_ > 0])).sum())
    assert abs(float(mi1["mi_bits"][0]) - h) < 1e-5


def test_chi2_matches_dense_reference(ray_session):
    rng = np.random.default_rng(11)
    n = 8000
    a = rng.integers(0, 3, n)
    b = np.where(rng.random(n) < 0.3, a % 2, rng.integers(0, 4, n))
    df = pd.DataFrame({"a": a.astype("int64"), "b": b.astype("int64")})
    got = rel.chi2_test(rd.from_pandas(df).repartition(6), "a", "b")
    # dense reference over ALL cells (incl. observed-zero ones)
    obs = np.zeros((3, 4))
    for ai, bi in zip(a, b):
        obs[ai, bi] += 1
    ex = obs.sum(1)[:, None] * obs.sum(0)[None, :] / n
    want = float(((obs - ex) ** 2 / ex).sum())
    assert abs(float(got["chi2"][0]) - want) < 1e-5
    assert int(got["dof"][0]) == (3 - 1) * (4 - 1)
    assert int(got["n"][0]) == n


def test_validate_rules_counts(ray_session):
    df = pd.DataFrame({
        "x": [1.0, 2.0, 100.0, -5.0, 3.0, np.nan],
        "y": ["a", "b", None, "c", None, "d"],
    })
    rules = {
        "x_out_of_range": lambda d: ~d["x"].between(0, 10).fillna(False)
        .to_numpy(),
        "y_null": lambda d: d["y"].isna().to_numpy(),
    }
    got = (rel.validate_rules(rd.from_pandas(df).repartition(4), rules)
           .to_pandas().set_index("rule"))
    assert int(got.loc["x_out_of_range", "violations"]) == 3
    assert int(got.loc["y_null", "violations"]) == 2
    assert (got["n_rows"] == 6).all()


def test_twap_hand_case_and_parallelism(ray_session):
    def us(s):
        return np.datetime64("2024-01-01T00:00:00") + np.timedelta64(s, "s")

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 3, 3],
        "ts": [us(0), us(10), us(40), us(5), us(0), us(0)],
        "v": [10.0, 40.0, 99.0, 7.0, 1.0, 2.0],
        "eid": [0, 1, 2, 3, 4, 5],
    })
    # k=1: 10 for 10s, 40 for 30s -> (100+1200)/40 = 32.5
    # k=2: single event -> no row; k=3: simultaneous pair -> no row
    for nparts in (1, 5):
        got = (rel.time_weighted_avg(
            rd.from_pandas(df).repartition(nparts), "k", "ts", "v", "eid")
            .to_pandas().sort_values("k").reset_index(drop=True))
        assert list(got["k"]) == [1]
        assert abs(float(got["twap"][0]) - 32.5) < 1e-9


def test_upsert_latest_semantics(ray_session):
    base = pd.DataFrame({
        "k": [1, 2, 3, 4],
        "val": ["a", "b", "c", "d"],
        "ver": np.int64([1, 1, 5, 1]),
    })
    delta = pd.DataFrame({
        "k": [2, 3, 4, 5],
        "val": ["B", "stale", "D", "E"],
        "ver": np.int64([2, 3, 1, 1]),
        "deleted": [False, False, True, False],
    })
    for nparts in (1, 4):
        got = (rel.upsert_latest(
            rd.from_pandas(base).repartition(nparts),
            rd.from_pandas(delta).repartition(nparts),
            "k", "ver", deleted_col="deleted")
            .to_pandas().sort_values("k").reset_index(drop=True))
        # k=1 untouched; k=2 updated; k=3 base wins (higher ver);
        # k=4 delete tombstone LOSES to the base's ver=1? No: tie
        # ver=1 breaks toward the delta -> tombstone wins, key gone;
        # k=5 inserted
        assert list(got["k"]) == [1, 2, 3, 5]
        assert list(got["val"]) == ["a", "B", "c", "E"]
        assert list(got["ver"]) == [1, 2, 5, 1]


def test_throttle_events_lag_semantics(ray_session):
    def us(s):
        return np.datetime64("2024-01-01T00:00:00") + np.timedelta64(s, "s")

    # k=1: events at 0, 5, 12 with gap 10 -> 5 dropped (0..5 < 10) and
    # 12 dropped too (12-5=7 < 10: gap to previous RAW event, even
    # though 5 was itself dropped — the lag semantics under test)
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "ts": [us(0), us(5), us(12), us(0), us(30)],
        "eid": np.int64([0, 1, 2, 3, 4]),
    })
    for nparts in (1, 3):
        got = (rel.throttle_events(
            rd.from_pandas(df).repartition(nparts), ["k"], "ts", "eid",
            min_gap_us=10_000_000)
            .to_pandas().sort_values("eid"))
        assert list(got["eid"]) == [0, 3, 4]


def test_grouped_linreg_matches_polyfit(ray_session):
    rng = np.random.default_rng(17)
    rows = []
    for k in range(20):
        n = rng.integers(2, 30)
        x = rng.uniform(0, 10, n)
        y = 2.0 * k * x + k + rng.normal(0, 0.1, n)
        rows.append(pd.DataFrame({"k": np.int64(k), "x": x, "y": y}))
    # singleton key and zero-variance key: both must be dropped
    rows.append(pd.DataFrame({"k": np.int64(100), "x": [1.0], "y": [1.0]}))
    rows.append(pd.DataFrame({"k": np.int64(101),
                              "x": [2.0, 2.0, 2.0], "y": [1.0, 2.0, 3.0]}))
    df = pd.concat(rows, ignore_index=True)
    got = (rel.grouped_linreg(rd.from_pandas(df).repartition(6),
                              ["k"], "x", "y",
                              with_n=True, drop_degenerate=True)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert set(got["k"]) == set(range(20))
    for _, r in got.iterrows():
        sub = df[df["k"] == r["k"]]
        sl, ic = np.polyfit(sub["x"], sub["y"], 1)
        assert abs(r["slope"] - sl) < 1e-4 and abs(r["intercept"] - ic) < 1e-4


def test_countmin_join_size_guarantees(ray_session):
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"k": rng.zipf(1.5, 4000).astype("int64") % 500})
    b = pd.DataFrame({"k": rng.zipf(1.5, 6000).astype("int64") % 500})
    est, na, nb = rel.countmin_join_size(
        rd.from_pandas(a).repartition(3), "k",
        rd.from_pandas(b).repartition(4), "k", width=4096)
    true = int(pd.merge(a.value_counts().rename("ca").reset_index(),
                        b.value_counts().rename("cb").reset_index(),
                        on="k").eval("ca * cb").sum())
    assert na == 4000 and nb == 6000
    assert est >= true                      # one-sided, always
    assert est <= true + 4 * na * nb / 4096  # Markov x4, min over depth


def test_welch_ttest_reference(ray_session):
    rng = np.random.default_rng(23)
    a = rng.normal(10.0, 2.0, 500)
    b = rng.normal(9.0, 5.0, 300)
    df = pd.DataFrame({
        "g": ["a"] * 500 + ["b"] * 300 + ["c"] * 10,
        "v": np.r_[a, b, np.zeros(10)],
    })
    got = rel.welch_ttest(rd.from_pandas(df).repartition(5),
                          "g", "v", "a", "b")
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / 500 + vb / 300
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    dof = se2 ** 2 / ((va / 500) ** 2 / 499 + (vb / 300) ** 2 / 299)
    assert abs(float(got["t_stat"][0]) - t) < 1e-5
    assert abs(float(got["df"][0]) - dof) < 1e-3
    assert int(got["n_a"][0]) == 500 and int(got["n_b"][0]) == 300


def test_gini_matches_sorted_reference(ray_session):
    rng = np.random.default_rng(31)
    x = rng.exponential(100.0, 3000)
    df = pd.DataFrame({"id": np.arange(3000, dtype="int64"), "v": x})

    def brute(vals: np.ndarray) -> float:
        s = np.sort(vals)
        n = len(s)
        rn = np.arange(1, n + 1, dtype="float64")
        return float(2.0 * (rn * s).sum() / (n * s.sum()) - (n + 1.0) / n)

    got = rel.gini_coefficient(
        rd.from_pandas(df).repartition(6), "v", ["id"]).to_pandas()
    assert int(got["n"][0]) == 3000
    assert abs(float(got["gini"][0]) - brute(x)) < 1e-9
    # exponential distribution: true Gini = 0.5; sampled near it
    assert 0.45 < float(got["gini"][0]) < 0.55

    # all-equal values -> perfect equality, gini exactly 0
    eq = pd.DataFrame({"id": np.arange(50, dtype="int64"),
                       "v": np.full(50, 7.0)})
    g0 = rel.gini_coefficient(rd.from_pandas(eq), "v", ["id"]).to_pandas()
    assert abs(float(g0["gini"][0])) < 1e-12

    # parallelism invariance: 1 block vs 11 blocks, identical quotient
    a = rel.gini_coefficient(
        rd.from_pandas(df).repartition(1), "v", ["id"]).to_pandas()
    b = rel.gini_coefficient(
        rd.from_pandas(df).repartition(11), "v", ["id"]).to_pandas()
    assert float(a["gini"][0]) == float(b["gini"][0])


def test_hits_matches_numpy_and_path_parity(ray_session):
    from crawler_service_ray.functions import graph as gr

    rng = np.random.default_rng(53)
    # directed bipartite-ish graph with a few pure-source nodes
    e = set()
    while len(e) < 300:
        e.add((int(rng.integers(0, 40)), int(rng.integers(100, 160))))
    edges = pd.DataFrame(sorted(e), columns=["src", "dst"])

    def brute(iters: int) -> pd.DataFrame:
        nodes = np.unique(np.r_[edges["src"], edges["dst"]])
        idx = {n: i for i, n in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for s, d in e:
            A[idx[s], idx[d]] = 1.0
        h = np.ones(len(nodes))
        a = np.zeros(len(nodes))
        for _ in range(iters):
            a = A.T @ h
            a = a / np.sqrt((a * a).sum())
            h = A @ a
            h = h / np.sqrt((h * h).sum())
        return pd.DataFrame({"node": nodes, "hub": h, "auth": a})

    ref = brute(3).sort_values("node").reset_index(drop=True)
    got = gr.hits(rd.from_pandas(edges).repartition(5), iters=3)\
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (got["node"].to_numpy() == ref["node"].to_numpy()).all()
    assert np.abs(got["hub"].to_numpy() - ref["hub"].to_numpy()).max() < 1e-9
    assert np.abs(got["auth"].to_numpy() - ref["auth"].to_numpy()).max() < 1e-9
    # pure-source nodes carry hub mass but exactly zero authority
    pure_src = ~np.isin(ref["node"].to_numpy(),
                        edges["dst"].unique())
    assert (got["auth"].to_numpy()[pure_src] == 0.0).all()

    # exchange path (broadcast_threshold=0) must match the broadcast path
    ex = gr.hits(rd.from_pandas(edges).repartition(5), iters=3,
                 broadcast_threshold=0, num_partitions=7)\
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert (ex["node"].to_numpy() == ref["node"].to_numpy()).all()
    assert np.abs(ex["hub"].to_numpy() - got["hub"].to_numpy()).max() < 1e-12
    assert np.abs(ex["auth"].to_numpy() - got["auth"].to_numpy()).max() < 1e-12


def test_anova_and_kruskal_references(ray_session):
    rng = np.random.default_rng(91)
    groups = ["a"] * 400 + ["b"] * 300 + ["c"] * 300
    v = np.r_[rng.normal(10, 2, 400), rng.normal(11, 2, 300),
              rng.normal(10.5, 2, 300)]
    v = np.round(v, 1)  # force value ties across groups
    df = pd.DataFrame({"g": groups, "v": v})

    # ANOVA F vs the textbook decomposition
    got = rel.anova_f(rd.from_pandas(df).repartition(6),
                      "g", "v").to_pandas()
    means = df.groupby("g")["v"].mean()
    ns = df.groupby("g")["v"].size()
    grand = v.mean()
    ssb = float((ns * (means - grand) ** 2).sum())
    ssw = float(((v - means.reindex(df["g"]).to_numpy()) ** 2).sum())
    f_ref = (ssb / 2) / (ssw / (1000 - 3))
    assert int(got["n_groups"][0]) == 3 and int(got["n"][0]) == 1000
    assert abs(float(got["f_stat"][0]) - f_ref) < 1e-6

    # Kruskal-Wallis vs the tie-corrected midrank formula
    kw = rel.kruskal_wallis(rd.from_pandas(df).repartition(6),
                            "g", "v").to_pandas()
    mr = pd.Series(v).rank(method="average").to_numpy()
    R = pd.DataFrame({"g": groups, "mr": mr}).groupby("g")["mr"].sum()
    N = 1000.0
    h = 12 / (N * (N + 1)) * float((R ** 2 / ns).sum()) - 3 * (N + 1)
    t = pd.Series(v).value_counts().to_numpy(dtype="float64")
    c = 1 - float((t ** 3 - t).sum()) / (N ** 3 - N)
    assert abs(float(kw["h_stat"][0]) - h / c) < 1e-9

    # identical distributions by construction -> tiny H on a permuted
    # single group split (sanity: parallelism invariance too)
    a = rel.kruskal_wallis(rd.from_pandas(df).repartition(1),
                           "g", "v").to_pandas()
    b = rel.kruskal_wallis(rd.from_pandas(df).repartition(11),
                           "g", "v").to_pandas()
    assert float(a["h_stat"][0]) == float(b["h_stat"][0])


def test_average_precision_reference(ray_session):
    def brute(sc: np.ndarray, pos: np.ndarray) -> float:
        df = (pd.DataFrame({"sc": np.round(sc, 6), "p": pos})
              .groupby("sc").agg(np_=("p", "sum"), n=("p", "size"))
              .sort_index(ascending=False))
        ctp = df["np_"].cumsum().to_numpy(dtype="float64")
        call = df["n"].cumsum().to_numpy(dtype="float64")
        npos = df["np_"].to_numpy(dtype="float64")
        return float((npos * ctp / call).sum() / npos.sum())

    rng = np.random.default_rng(71)
    n = 2000
    pos = (rng.random(n) < 0.1).astype("int64")   # rare positives
    sc = rng.normal(0, 1, n) + 1.5 * pos          # informative score
    sc[::7] = np.round(sc[::7], 1)                # force score ties
    df = pd.DataFrame({"sc": sc, "pos": pos})
    got = rel.average_precision(
        rd.from_pandas(df).repartition(6), "sc", "pos").to_pandas()
    assert int(got["n_pos"][0]) == pos.sum()
    assert abs(float(got["ap"][0]) - round(brute(sc, pos), 6)) < 2e-6

    # perfect separation -> AP exactly 1
    dperf = pd.DataFrame({"sc": np.r_[np.ones(50), np.zeros(50)],
                          "pos": np.r_[np.ones(50), np.zeros(50)]
                          .astype("int64")})
    gp = rel.average_precision(rd.from_pandas(dperf), "sc",
                               "pos").to_pandas()
    assert float(gp["ap"][0]) == 1.0


def test_nearest_centroid_planted_clusters(ray_session):
    from crawler_service_ray.functions import similarity as sim

    rng = np.random.default_rng(83)
    k, d, per = 4, 8, 300
    centers = rng.normal(0, 8, (k, d))
    rows = []
    for lab in range(k):
        pts = centers[lab] + rng.normal(0, 0.5, (per, d))
        for i, p in enumerate(pts):
            rows.append((lab * per + i, lab, p.astype("float32")))
    df = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    got = sim.nearest_centroid_eval(
        rd.from_pandas(df).repartition(5)).to_pandas()

    # single-node replica: same Knuth split, same centroids, same rule
    ids = df["vec_id"].to_numpy(dtype="uint64")
    b = (ids % np.uint64(2**32)) * np.uint64(2654435761) % np.uint64(2**32)
    b = (b % np.uint64(10)).astype("int64")
    M = np.stack(df["embedding"].to_numpy()).astype("float64")
    labs = df["label"].to_numpy()
    C = np.stack([M[(b < 8) & (labs == lab)].mean(axis=0)
                  for lab in range(k)])
    X, tl = M[b >= 8], labs[b >= 8]
    D = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
    pred = np.argmin(D, axis=1)
    ref = (pd.DataFrame({"true_label": tl, "pred_label": pred})
           .groupby(["true_label", "pred_label"]).size()
           .reset_index(name="n"))
    m = got.sort_values(["true_label", "pred_label"]).reset_index(drop=True)
    r = ref.sort_values(["true_label", "pred_label"]).reset_index(drop=True)
    assert (m["true_label"].to_numpy() == r["true_label"].to_numpy()).all()
    assert (m["pred_label"].to_numpy() == r["pred_label"].to_numpy()).all()
    assert (m["n"].to_numpy() == r["n"].to_numpy()).all()
    # well-separated clusters -> the diagonal dominates
    acc = m.loc[m["true_label"] == m["pred_label"], "n"].sum() / m["n"].sum()
    assert acc > 0.99


def test_assortativity_star_and_reference(ray_session):
    from crawler_service_ray.functions import graph as gr

    # star: hub 0 <-> leaves 1..10, symmetric edges; perfectly
    # disassortative -> exactly -1
    leaves = np.arange(1, 11, dtype="int64")
    star = pd.DataFrame({
        "src": np.r_[np.zeros(10, dtype="int64"), leaves],
        "dst": np.r_[leaves, np.zeros(10, dtype="int64")],
    })
    got = gr.degree_assortativity(
        rd.from_pandas(star).repartition(3)).to_pandas()
    assert int(got["n_edges"][0]) == 20
    assert abs(float(got["assortativity"][0]) + 1.0) < 1e-12

    # random symmetric graph vs dense numpy reference
    rng = np.random.default_rng(61)
    e = set()
    while len(e) < 150:
        a, b = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        if a != b:
            e.add((a, b)); e.add((b, a))
    ed = pd.DataFrame(sorted(e), columns=["src", "dst"])
    deg = ed.groupby("src").size()
    dx = deg.reindex(ed["src"]).to_numpy(dtype="float64")
    dy = deg.reindex(ed["dst"]).to_numpy(dtype="float64")
    ref = np.corrcoef(dx, dy)[0, 1]
    g2 = gr.degree_assortativity(
        rd.from_pandas(ed).repartition(5), num_partitions=7).to_pandas()
    assert int(g2["n_edges"][0]) == len(ed)
    assert abs(float(g2["assortativity"][0]) - ref) < 1e-9

    # exchange path (broadcast_threshold=0) parity with broadcast path
    g3 = gr.degree_assortativity(
        rd.from_pandas(ed).repartition(5), num_partitions=7,
        broadcast_threshold=0).to_pandas()
    assert int(g3["n_edges"][0]) == len(ed)
    assert abs(float(g3["assortativity"][0])
               - float(g2["assortativity"][0])) < 1e-12


def test_js_divergence_reference_and_bounds(ray_session):
    def brute(ta: str, tb: str) -> float:
        from collections import Counter
        a, b = Counter(ta.split()), Counter(tb.split())
        na, nb = sum(a.values()), sum(b.values())
        js = 0.0
        for w in set(a) | set(b):
            p, q = a[w] / na, b[w] / nb
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * np.log2(p / m)
            if q > 0:
                js += 0.5 * q * np.log2(q / m)
        return js

    ta = "the cat sat on the mat the cat"
    tb = "a dog ran in a park the dog"
    df = pd.DataFrame({
        "text": [ta, tb, "noise ignored"],
        "src": ["a", "b", "c"],   # third cohort must be excluded
    })
    got = tx.js_divergence(rd.from_pandas(df).repartition(3),
                           "text", "src", "a", "b").to_pandas()
    assert abs(float(got["js"][0]) - brute(ta, tb)) < 1e-12
    assert int(got["tokens_a"][0]) == 8 and int(got["tokens_b"][0]) == 8

    # disjoint vocabularies -> exactly 1 bit; identical corpora -> 0
    d1 = pd.DataFrame({"text": ["x y z", "p q r"], "src": ["a", "b"]})
    g1 = tx.js_divergence(rd.from_pandas(d1), "text", "src",
                          "a", "b").to_pandas()
    assert abs(float(g1["js"][0]) - 1.0) < 1e-12
    d0 = pd.DataFrame({"text": ["x y z w", "x y z w"], "src": ["a", "b"]})
    g0 = tx.js_divergence(rd.from_pandas(d0), "text", "src",
                          "a", "b").to_pandas()
    assert abs(float(g0["js"][0])) < 1e-12

    # symmetry: JS(a,b) == JS(b,a)
    g2 = tx.js_divergence(rd.from_pandas(df).repartition(2),
                          "text", "src", "b", "a").to_pandas()
    assert abs(float(g2["js"][0]) - float(got["js"][0])) < 1e-12


def test_spearman_matches_pandas_midranks(ray_session):
    rng = np.random.default_rng(37)
    n = 3000
    # heavy ties on x (integers 0-19), monotone-plus-noise y
    x = rng.integers(0, 20, n).astype("float64")
    y = 3.0 * x + rng.normal(0, 10, n)
    df = pd.DataFrame({"id": np.arange(n, dtype="int64"),
                       "x": x, "y": y})
    got = rel.spearman_corr(
        rd.from_pandas(df).repartition(7), "x", "y", ["id"]).to_pandas()
    ref = df["x"].rank(method="average").corr(
        df["y"].rank(method="average"))
    assert int(got["n"][0]) == n
    assert abs(float(got["spearman"][0]) - ref) < 1e-9

    # perfectly monotone (no ties) -> exactly 1; reversed -> exactly -1
    mono = pd.DataFrame({"id": np.arange(200, dtype="int64"),
                         "x": np.arange(200, dtype="float64"),
                         "y": np.exp(np.arange(200) / 40.0)})
    g1 = rel.spearman_corr(rd.from_pandas(mono), "x", "y",
                           ["id"]).to_pandas()
    assert abs(float(g1["spearman"][0]) - 1.0) < 1e-12
    mono["y"] = -mono["y"]
    g2 = rel.spearman_corr(rd.from_pandas(mono), "x", "y",
                           ["id"]).to_pandas()
    assert abs(float(g2["spearman"][0]) + 1.0) < 1e-12

    # parallelism invariance (exact rank sums -> identical quotient)
    a = rel.spearman_corr(rd.from_pandas(df).repartition(1),
                          "x", "y", ["id"]).to_pandas()
    b = rel.spearman_corr(rd.from_pandas(df).repartition(13),
                          "x", "y", ["id"]).to_pandas()
    assert float(a["spearman"][0]) == float(b["spearman"][0])


def test_running_max_exchange_matches_sorted_cummax(ray_session):
    rng = np.random.default_rng(47)
    n = 4000
    order = rng.permutation(n).astype("int64")   # unique, shuffled
    val = rng.normal(0, 100, n)
    val[::97] = val[::97] + 500                  # spikes the watermark holds
    df = pd.DataFrame({"o": order, "v": val})

    def part(g: pd.DataFrame, wm: np.ndarray) -> pd.DataFrame:
        return pd.DataFrame({"o": g["o"].to_numpy(), "wm": wm})

    got = (rel.running_max_exchange(
        rd.from_pandas(df).repartition(7), "o", "v", part)
        .to_pandas().sort_values("o").reset_index(drop=True))
    want = df.sort_values("o").reset_index(drop=True)
    ref = np.maximum.accumulate(want["v"].to_numpy())
    assert len(got) == n
    np.testing.assert_allclose(got["wm"].to_numpy(), ref, rtol=0, atol=0)

    # parallelism invariance: 1 block vs 11 blocks, bit-identical
    a = (rel.running_max_exchange(
        rd.from_pandas(df).repartition(1), "o", "v", part,
        num_partitions=4)
        .to_pandas().sort_values("o").reset_index(drop=True))
    b = (rel.running_max_exchange(
        rd.from_pandas(df).repartition(11), "o", "v", part,
        num_partitions=16)
        .to_pandas().sort_values("o").reset_index(drop=True))
    assert (a["wm"].to_numpy() == b["wm"].to_numpy()).all()


def test_zorder_shard_locality(ray_session):
    """Morton top-4 bits fix the 2 MSBs of BOTH dimensions, so every
    shard's bucket ranges span at most 1/4 of each axis (64 of 256
    buckets -> price range <= 64*2000, day range <= 64*10)."""
    from crawler_service_ray.pipelines.queries import q_zorder

    got = q_zorder("/root/testdata/sf0.001").to_pandas()
    assert got["n"].sum() > 0
    assert (got["shard"] >= 0).all() and (got["shard"] < 16).all()
    span_p = got["hi_price"] - got["lo_price"]
    span_d = got["hi_day"] - got["lo_day"]
    assert (span_p <= 64 * 2000.0).all()
    assert (span_d <= 64 * 10).all()


def _sym_edges(pairs):
    """Symmetric distinct int64 edge Dataset from canonical (u, v)."""
    u = np.array([p[0] for p in pairs], dtype="int64")
    v = np.array([p[1] for p in pairs], dtype="int64")
    return rd.from_pandas(pd.DataFrame({
        "src": np.concatenate([u, v]),
        "dst": np.concatenate([v, u]),
    }))


def test_kcore_clique_with_tail(ray_session):
    """4-clique + pendant tail: 3-core = the clique (each member has
    in-core degree 3), everything else peels off."""
    from crawler_service_ray.functions.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 12)]
    edges = _sym_edges(clique + tail)
    got = (kcore(edges, k=3, max_rounds=8).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == [0, 1, 2, 3]
    assert (got["deg"] == 3).all()


def test_kcore_paths_parity(ray_session):
    """Broadcast and exchange paths produce identical (node, deg) on a
    random graph, at different parallelism, and converge within the
    round budget (fixed-point early-stop equals the unrolled rounds)."""
    from crawler_service_ray.functions.graph import kcore

    rng = np.random.default_rng(29)
    m = 600
    u = rng.integers(0, 60, m).astype("int64")
    v = rng.integers(0, 60, m).astype("int64")
    keep = u < v
    pairs = sorted(set(zip(u[keep].tolist(), v[keep].tolist())))
    edges = _sym_edges(pairs)

    a = (kcore(edges, k=7, max_rounds=12).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (kcore(edges.repartition(7), k=7, max_rounds=12,
               broadcast_threshold=0, num_partitions=5).to_pandas()
         .sort_values("node").reset_index(drop=True))

    # the 8-core of this graph is EMPTY — the peel must drain cleanly
    # on both paths instead of crashing on an empty alive set
    assert kcore(edges, k=8, max_rounds=12).count() == 0
    assert kcore(edges, k=8, max_rounds=12,
                 broadcast_threshold=0).count() == 0
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)

    # reference: single-node iterative peel to the true fixed point
    adj = pd.DataFrame(pairs, columns=["u", "v"])
    alive = set(adj["u"]).union(adj["v"])
    while True:
        e = adj[adj["u"].isin(alive) & adj["v"].isin(alive)]
        deg = pd.concat([e["u"], e["v"]]).value_counts()
        nxt = set(deg[deg >= 7].index)
        if nxt == alive:
            break
        alive = nxt
    assert set(a["node"].tolist()) == alive
    want_deg = pd.concat([e["u"], e["v"]]).value_counts()
    got_deg = dict(zip(a["node"], a["deg"]))
    assert all(got_deg[n] == want_deg[n] for n in alive)


def test_clustering_coeff_small(ray_session):
    """Triangle + pendant edge: T=1, degrees (2,2,3,1) -> wedges
    1+1+3+0 = 5, coeff = 3/5."""
    from crawler_service_ray.functions.graph import triangle_count
    from crawler_service_ray.pipelines.queries import q_clustering_coeff

    got = q_clustering_coeff("/root/testdata/sf0.001")
    assert got.loc[0, "n_wedges"] >= 3 * got.loc[0, "n_triangles"] >= 0
    assert 0.0 <= got.loc[0, "coeff"] <= 1.0

    edges = rd.from_pandas(pd.DataFrame(
        {"u": [0, 0, 1, 2], "v": [1, 2, 2, 3]}))
    assert triangle_count(edges) == 1


def test_brown_smoothing_matches_sequential(ray_session):
    """Level/trend equal the textbook sequential double-EWMA fold, at
    any parallelism; a linear series' forecast converges to zero lag
    (level + trend tracks the line)."""
    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n).astype("int64"),
        "ts": rng.permutation(n).astype("int64"),
        "eid": np.arange(n, dtype="int64"),
        "v": rng.normal(10, 3, n),
    })
    got = (rel.brown_smoothing(
        rd.from_pandas(df).repartition(9), "k", "ts", "v", "eid",
        alpha=0.5, num_partitions=4)
        .to_pandas().sort_values("eid").reset_index(drop=True))

    ref = df.sort_values(["k", "ts", "eid"]).reset_index(drop=True)
    out_l, out_t = [], []
    # plain dict fold
    state = {}
    for _, r in ref.iterrows():
        if r["k"] not in state:
            s1 = s2 = r["v"]
        else:
            s1p, s2p = state[r["k"]]
            s1 = 0.5 * s1p + 0.5 * r["v"]
            s2 = 0.5 * s2p + 0.5 * s1
        state[r["k"]] = (s1, s2)
        out_l.append(2 * s1 - s2)
        out_t.append(s1 - s2)
    ref = ref.assign(level=np.round(out_l, 6), trend=np.round(out_t, 6))
    ref = ref.sort_values("eid").reset_index(drop=True)
    np.testing.assert_allclose(got["level"], ref["level"], atol=1e-9)
    np.testing.assert_allclose(got["trend"], ref["trend"], atol=1e-9)

    # a pure linear ramp: trend -> slope, forecast lag -> 0
    lin = pd.DataFrame({
        "k": np.zeros(60, dtype="int64"),
        "ts": np.arange(60, dtype="int64"),
        "eid": np.arange(60, dtype="int64"),
        "v": 5.0 * np.arange(60),
    })
    g = (rel.brown_smoothing(rd.from_pandas(lin), "k", "ts", "v", "eid")
         .to_pandas().sort_values("eid"))
    assert abs(g["trend"].iloc[-1] - 5.0) < 1e-3
    assert abs(g["level"].iloc[-1] - lin["v"].iloc[-1]) < 1e-2


def test_type_entropy_bounds(ray_session):
    """Entropy is 0 for single-type users and log2(k) for uniform
    k-type users, invariant to parallelism."""
    from crawler_service_ray.pipelines.queries import q_type_entropy

    got = (q_type_entropy("/root/testdata/sf0.001").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert (got["entropy"] >= 0).all()
    assert (got["entropy"] <= np.log2(64) + 1e-9).all()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_type"])
    want = (ev.groupby("user_id").size().rename("n_events")
            .reset_index().sort_values("user_id").reset_index(drop=True))
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()


def test_hhi_uniform_and_monopoly(ray_session):
    """HHI identities: k equal customers -> 1/k, one customer -> 1."""
    from crawler_service_ray.functions.relational import grouped_apply

    rev = rd.from_pandas(pd.DataFrame({
        "c_nationkey": [1, 1, 1, 1, 2],
        "custkey": [10, 11, 12, 13, 20],
        "rev": [25.0, 25.0, 25.0, 25.0, 99.0],
    }))

    def per_nation(g):
        tot = g.groupby("c_nationkey", sort=False)["rev"].transform("sum")
        share = g["rev"].to_numpy() / tot.to_numpy()
        gg = g.assign(__s2=share * share)
        out = (gg.groupby("c_nationkey", sort=True)
               .agg(n_customers=("rev", "size"), hhi=("__s2", "sum"))
               .reset_index())
        return out

    got = (grouped_apply(rev, ["c_nationkey"], per_nation,
                         num_partitions=3)
           .to_pandas().sort_values("c_nationkey").reset_index(drop=True))
    assert abs(got.loc[0, "hhi"] - 0.25) < 1e-12
    assert abs(got.loc[1, "hhi"] - 1.0) < 1e-12


def test_dsir_planted_target_ranks_first(ray_session):
    """Docs written in the target's vocabulary must outscore docs in a
    disjoint vocabulary, and weights are parallelism-invariant."""
    rng = np.random.default_rng(17)
    tvoc = [f"t{i}" for i in range(20)]
    rvoc = [f"r{i}" for i in range(20)]
    rows = []
    for i in range(10):   # target corpus
        rows.append((i, " ".join(rng.choice(tvoc, 30)), True))
    for i in range(10, 20):   # raw docs in target vocab
        rows.append((i, " ".join(rng.choice(tvoc, 30)), False))
    for i in range(20, 30):   # raw docs in disjoint vocab
        rows.append((i, " ".join(rng.choice(rvoc, 30)), False))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "is_target"])

    got = (tx.dsir_weights(rd.from_pandas(df).repartition(4),
                           target_mask_col="is_target")
           .to_pandas().set_index("doc_id").sort_index())
    assert len(got) == 30
    target_like = got.loc[0:19, "logweight"]
    alien = got.loc[20:29, "logweight"]
    assert target_like.min() > alien.max()

    got1 = (tx.dsir_weights(rd.from_pandas(df).repartition(1),
                            target_mask_col="is_target",
                            merge_partitions=2, num_buckets=3)
            .to_pandas().set_index("doc_id").sort_index())
    assert (got["logweight"].to_numpy()
            == got1["logweight"].to_numpy()).all()


def test_table_diff_statuses(ray_session):
    """Added/removed/changed/unchanged each classified correctly,
    NULL-valued equal rows are unchanged, at any parallelism."""
    base = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "v": [1.0, 2.0, 3.0, np.nan, 5.0],
    })
    new = pd.DataFrame({
        "k": [2, 3, 4, 5, 6],
        "v": [2.0, 3.5, np.nan, np.nan, 6.0],
    })
    got = (rel.table_diff(rd.from_pandas(base).repartition(3),
                          rd.from_pandas(new).repartition(2),
                          ["k"], ["v"], num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({
        "k": [1, 3, 5, 6],
        "status": ["removed", "changed", "changed", "added"],
    })
    # k=2 equal -> omitted; k=4 NaN==NaN -> unchanged, omitted
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64"}), want.astype({"k": "int64"}))


def test_corr_matrix_identities(ray_session):
    """corr(x, x-derived linear) = ±1; matrix values match numpy."""
    from crawler_service_ray.pipelines.queries import q_corr_matrix

    got = q_corr_matrix("/root/testdata/sf0.001")
    assert len(got) == 6
    assert ((got["corr_ab"] >= -1 - 1e-9)
            & (got["corr_ab"] <= 1 + 1e-9)).all()
    li = pd.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    want = np.corrcoef(li.to_numpy(dtype="float64").T)
    m = {("l_quantity", "l_extendedprice"): want[0, 1],
         ("l_quantity", "l_discount"): want[0, 2],
         ("l_quantity", "l_tax"): want[0, 3],
         ("l_extendedprice", "l_discount"): want[1, 2],
         ("l_extendedprice", "l_tax"): want[1, 3],
         ("l_discount", "l_tax"): want[2, 3]}
    for _, r in got.iterrows():
        assert r["corr_ab"] == pytest.approx(
            m[(r["col_a"], r["col_b"])], abs=1e-5)


def test_attribution_handcrafted(ray_session):
    """Purchase credits the latest prior click; ts ties pick max
    event_id; purchases with no prior click drop."""
    from crawler_service_ray.functions.relational import (
        asof_join, grouped_agg)

    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    ev = pd.DataFrame({
        "event_id": np.arange(8, dtype="int64"),
        "user_id": np.array([1, 1, 1, 1, 2, 2, 3, 1], dtype="int64"),
        "ts": [t0, t0 + 10, t0 + 10, t0 + 20,     # u1: 2 tied clicks
               t0 + 5, t0 + 3,                    # u2: click after buy
               t0 + 7,                            # u3: purchase only
               t0 + 10],                          # u1: buy AT click ts
        "event_type": ["click", "click", "click", "purchase",
                       "purchase", "click", "purchase", "purchase"],
    })
    ds = rd.from_pandas(ev).repartition(3)
    clicks = grouped_agg(
        ds.map_batches(lambda d: d.loc[d["event_type"] == "click",
                                       ["user_id", "ts", "event_id"]],
                       batch_format="pandas"),
        ["user_id", "ts"], {"click_id": ("event_id", "max")},
        merge_partitions=2)
    buys = ds.map_batches(
        lambda d: d.loc[d["event_type"] == "purchase",
                        ["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "purchase_id"}),
        batch_format="pandas")
    j = (asof_join(buys, clicks, key="user_id", ts_col="ts")
         .to_pandas().sort_values("purchase_id").reset_index(drop=True))
    # u1 buy@20 -> tied clicks at t+10, max id = 2; u1 buy@10 (equal ts)
    # -> same click 2; u2 buy@5 -> no prior click (click at t+3? yes
    # t0+3 < t0+5 so click 5 wins); u3 -> dropped
    got = dict(zip(j["purchase_id"], j["click_id_r"]))
    assert got == {3: 2, 4: 5, 7: 2}


def test_quantile_normalize_identities(ray_session):
    """A single group maps to itself; two groups end up with equal
    sorted distributions; bit-identical at any parallelism."""
    rng = np.random.default_rng(37)
    n = 400
    one = pd.DataFrame({
        "g": ["a"] * n,
        "v": np.round(rng.normal(50, 10, n), 3),
        "id": np.arange(n, dtype="int64"),
    })
    got = (rel.quantile_normalize(rd.from_pandas(one).repartition(5),
                                  "g", "v", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    np.testing.assert_allclose(got["qnorm"], one["v"], atol=2e-6)

    two = pd.DataFrame({
        "g": ["a"] * n + ["b"] * n,
        "v": np.concatenate([rng.normal(0, 1, n),
                             rng.normal(100, 30, n)]),
        "id": np.arange(2 * n, dtype="int64"),
    })
    out = (rel.quantile_normalize(rd.from_pandas(two).repartition(7),
                                  "g", "v", "id").to_pandas())
    qa = np.sort(out.loc[out["g"] == "a", "qnorm"].to_numpy())
    qb = np.sort(out.loc[out["g"] == "b", "qnorm"].to_numpy())
    np.testing.assert_allclose(qa, qb, atol=1e-9)  # equalized

    out1 = (rel.quantile_normalize(rd.from_pandas(two).repartition(1),
                                   "g", "v", "id", num_partitions=3,
                                   merge_partitions=2).to_pandas())
    a = out.sort_values("id")["qnorm"].to_numpy()
    b = out1.sort_values("id")["qnorm"].to_numpy()
    assert (a == b).all()


def test_weighted_median_reference(ray_session):
    """Lower weighted median matches the textbook cumulative rule on a
    handcrafted case where plain median differs."""
    from crawler_service_ray.functions.relational import grouped_apply

    df = pd.DataFrame({
        "event_type": ["a"] * 4 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0],
        "event_id": np.arange(7, dtype="int64"),
        "wt": np.array([1, 1, 1, 10, 5, 1, 1], dtype="int64"),
    })

    def per_part(g):
        g = g.sort_values(["event_type", "value", "event_id"],
                          kind="mergesort")
        cw = g.groupby("event_type", sort=False)["wt"].cumsum()
        tw = g.groupby("event_type", sort=False)["wt"].transform("sum")
        hit = g.loc[2 * cw.to_numpy() >= tw.to_numpy()]
        return (hit.groupby("event_type", sort=False)["value"].first()
                .reset_index(name="wmedian"))

    got = (grouped_apply(rd.from_pandas(df).repartition(3),
                         ["event_type"], per_part, num_partitions=2)
           .to_pandas().sort_values("event_type")
           .reset_index(drop=True))
    # a: weights 1,1,1,10 tot 13 -> first cum>=6.5 is value 4
    # b: weights 5,1,1 tot 7 -> first cum>=3.5 is value 10
    assert got["wmedian"].tolist() == [4.0, 10.0]


def test_macro_f1_counts_consistent(ray_session):
    from crawler_service_ray.pipelines.queries import q_macro_f1

    got = q_macro_f1("/root/testdata/sf0.001")
    assert len(got) >= 2
    # every test doc lands in exactly one (truth, pred) cell:
    # sum tp+fn = n_test per truth class; fp sums = fn sums globally
    assert got["fp"].sum() == got["fn"].sum()
    ok = got.dropna(subset=["f1"])
    assert ((ok["f1"] >= 0) & (ok["f1"] <= 1)).all()


def test_scd2_intervals_partition_time(ray_session):
    """Each key's intervals tile [first_change, inf): valid_from of
    version i+1 equals valid_to of version i; exactly one NULL
    valid_to (the current version) per key."""
    from crawler_service_ray.pipelines.queries import q_scd2

    got = q_scd2("/root/testdata/sf0.001").to_pandas()
    assert got["valid_to"].isna().groupby(got["user_id"]).sum().eq(1).all()
    g = got.sort_values(["user_id", "valid_from", "event_id"])
    nxt_from = g.groupby("user_id")["valid_from"].shift(-1)
    closed = g["valid_to"].notna()
    assert (g.loc[closed, "valid_to"].to_numpy()
            == nxt_from[closed].to_numpy()).all()


def test_knn_classify_planted(ray_session):
    """Two tight clusters: every test point gets its cluster's label."""
    from crawler_service_ray.functions.relational import (
        bucketed_hash_join, grouped_apply)
    from crawler_service_ray.functions import similarity as sim

    rng = np.random.default_rng(41)
    d = 8
    c0, c1 = np.eye(d)[0] * 10, np.eye(d)[1] * 10  # orthogonal directions
    train = np.concatenate([c0 + 0.1 * rng.normal(size=(30, d)),
                            c1 + 0.1 * rng.normal(size=(30, d))])
    tdf = pd.DataFrame({
        "vec_id": np.arange(100, 160, dtype="int64"),
        "embedding": list(train.astype("float32")),
        "label": np.array([0] * 30 + [1] * 30, dtype="int64"),
    })
    q = np.stack([c0 + 0.05, c1 - 0.05])
    ds = rd.from_pandas(tdf).repartition(4)
    top = sim.brute_force_topk(ds, q, np.array([0, 1]), k=5,
                               exclude_self=False)
    labels = ds.map_batches(
        lambda x: pd.DataFrame({"neighbor_id": x["vec_id"],
                                "label": x["label"]}),
        batch_format="pandas")
    j = bucketed_hash_join(top, labels, on="neighbor_id", num_buckets=2)

    def vote(part):
        v = (part.groupby(["query_id", "label"], sort=False).size()
             .reset_index(name="c"))
        v = v.sort_values(["query_id", "c", "label"],
                          ascending=[True, False, True], kind="mergesort")
        return (v.groupby("query_id", sort=False).first().reset_index()
                [["query_id", "label"]])

    got = (grouped_apply(j, ["query_id"], vote, num_partitions=2)
           .to_pandas().sort_values("query_id"))
    assert got["label"].tolist() == [0, 1]


def test_kmv_sketch_regimes(ray_session):
    """Unfilled sketch is exact; filled sketch is parallelism-invariant
    and within the CV band; mergeability: union sketch == sketch of
    the concatenated stream."""
    from crawler_service_ray.functions import relational as r

    ids = pd.DataFrame({"v": np.arange(50, dtype="int64")})
    s = r.kmv_sketch(rd.from_pandas(ids).repartition(4), "v", k=256)
    assert r.kmv_estimate(s, 256) == 50.0  # unfilled -> exact

    big = pd.DataFrame({"v": np.arange(20000, dtype="int64")})
    s1 = r.kmv_sketch(rd.from_pandas(big).repartition(1), "v", k=256)
    s7 = r.kmv_sketch(rd.from_pandas(big).repartition(7), "v", k=256)
    assert (s1 == s7).all()
    est = r.kmv_estimate(s7, 256)
    assert abs(est - 20000) / 20000 < 0.25  # ~4 sigma at k=256

    a = rd.from_pandas(big.iloc[:15000]).repartition(3)
    b = rd.from_pandas(big.iloc[5000:]).repartition(5)
    merged = np.unique(np.concatenate([
        r.kmv_sketch(a, "v", 256), r.kmv_sketch(b, "v", 256)]))[:256]
    assert (merged == s1).all()  # bottom-k of union == union of bottom-ks


def test_membership_combos_masks(ray_session):
    from crawler_service_ray.pipelines.queries import q_membership_combos

    got = q_membership_combos("/root/testdata/sf0.001").to_pandas()
    assert (got["mask"] >= 1).all() and (got["mask"] <= 31).all()
    assert got["n_users"].sum() > 0


def test_asof_tolerance_caps_staleness(ray_session):
    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    left = pd.DataFrame({
        "lid": np.arange(3, dtype="int64"),
        "k": np.array([1, 1, 1], dtype="int64"),
        "ts": [t0 + 10_000_000, t0 + 100_000_000, t0 + 300_000_000],
    })
    right = pd.DataFrame({
        "k": np.array([1], dtype="int64"),
        "ts": [t0],
        "rid": np.array([7], dtype="int64"),
    })
    got = rel.asof_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k",
        ts_col="ts", tolerance=pd.Timedelta(seconds=60)).to_pandas()
    # only the 10s- gap row matches; 100s and 300s exceed tolerance
    assert got["lid"].tolist() == [0]


def test_item2item_symmetry_and_range(ray_session):
    from crawler_service_ray.pipelines.queries import q_item2item

    got = q_item2item("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert ((got["sim"] > 0) & (got["sim"] <= 1)).all()
    # top-3 per item, (item, other) never self-paired
    assert (got["item"] != got["other"]).all()
    assert got.groupby("item").size().le(3).all()


def test_resample_interp_linear_ramp(ray_session):
    """On a linear signal the interpolation is exact at every grid
    point; leading-edge grid points are NULL; exact-hit points take
    the event value."""
    t0 = np.datetime64("2026-01-01T00:30:00", "us")
    hour = np.timedelta64(3_600_000_000, "us")
    df = pd.DataFrame({
        "k": np.zeros(4, dtype="int64"),
        "ts": [t0, t0 + 2 * hour, t0 + 4 * hour, t0 + 4 * hour],
        "v": [10.0, 30.0, 50.0, 40.0],   # dup ts -> max wins (50)
    })
    got = (rel.resample_interp(rd.from_pandas(df).repartition(2),
                               ["k"], "ts", "v", 3_600_000_000)
           .to_pandas().sort_values("h").reset_index(drop=True))
    # grid 00:00..04:00; 00:00 precedes first event -> NULL
    assert np.isnan(got.loc[0, "value_interp"])
    # events at fractional-hour offsets: 00:30->10, 02:30->30, 04:30->50
    # grid 01:00 = 10 + (30m/120m)*(30-10) = 15; 03:00 = 35; 04:00 = 45
    np.testing.assert_allclose(
        got["value_interp"].to_numpy()[1:], [15.0, 25.0, 35.0, 45.0])

    # parallelism invariance
    a = (rel.resample_interp(rd.from_pandas(df).repartition(1),
                             ["k"], "ts", "v", 3_600_000_000,
                             num_partitions=3)
         .to_pandas().sort_values("h").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, got)


def test_checksum_audit_detects_corruption(ray_session):
    from crawler_service_ray.pipelines.queries import q_checksum_audit

    a = (q_checksum_audit("/root/testdata/sf0.001").to_pandas()
         .sort_values("bucket").reset_index(drop=True))
    b = (q_checksum_audit("/root/testdata/sf0.001").to_pandas()
         .sort_values("bucket").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)  # reproducible
    assert a["n_rows"].sum() == len(pd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey"]))


def test_target_encode_loo_identity(ray_session):
    """LOO mean excludes the row itself: on a 3-row category with
    values 1,2,3 the encodings are (2+3)/2, (1+3)/2, (1+2)/2."""
    from crawler_service_ray.pipelines.queries import q_target_encode

    got = q_target_encode("/root/testdata/sf0.001").to_pandas()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "event_type", "value"])
    vi = np.rint(ev["value"].to_numpy() * 100).astype("int64")
    ev = ev.assign(vi=vi)
    s = ev.groupby("event_type")["vi"].transform("sum")
    n = ev.groupby("event_type")["vi"].transform("size")
    want = ((s - ev["vi"]) / (n - 1) / 100.0).to_numpy()
    want = np.copysign(np.floor(np.abs(want) * 1e6 + 0.5), want) / 1e6
    got = got.sort_values("event_id").reset_index(drop=True)
    ev = ev.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(got["loo_mean"].to_numpy(), want,
                               atol=0, rtol=0)


def test_max_gap_handcrafted(ray_session):
    from crawler_service_ray.functions.relational import grouped_apply

    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    s = np.timedelta64(1_000_000, "us")
    df = pd.DataFrame({
        "event_id": np.arange(5, dtype="int64"),
        "user_id": np.array([1, 1, 1, 2, 2], dtype="int64"),
        "ts": [t0, t0 + 10 * s, t0 + 11 * s, t0, t0 + 3 * s],
    })

    def per_part(g):
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        ts = g["ts"].to_numpy("datetime64[us]").astype("int64")
        prev = g.groupby("user_id", sort=False)["ts"].shift(1)
        has = prev.notna().to_numpy()
        gap = ts - prev.to_numpy("datetime64[us]").astype("int64")
        d = pd.DataFrame({"user_id": g["user_id"],
                          "gap_us": gap,
                          "gap_start": prev.to_numpy("datetime64[us]")
                          }).loc[has]
        d = d.sort_values(["user_id", "gap_us", "gap_start"],
                          ascending=[True, False, True], kind="mergesort")
        return d.groupby("user_id", sort=False).first().reset_index()

    got = (grouped_apply(rd.from_pandas(df).repartition(2), ["user_id"],
                         per_part, num_partitions=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got["gap_us"].tolist() == [10_000_000, 3_000_000]


def test_agg_incremental_equals_full(ray_session):
    """Folding base+delta partial aggregates equals the from-scratch
    aggregate exactly (integer units)."""
    from crawler_service_ray.pipelines.queries import q_agg_incremental

    got = (q_agg_incremental("/root/testdata/sf0.001").to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_type", "value"])
    vi = np.rint(ev["value"].to_numpy() * 100).astype("int64")
    want = (ev.assign(vi=vi).groupby("event_type")
            .agg(n_events=("vi", "size"), s=("vi", "sum")).reset_index()
            .sort_values("event_type").reset_index(drop=True))
    assert (got["n_events"].to_numpy()
            == want["n_events"].to_numpy()).all()
    assert (got["revenue"].to_numpy()
            == (want["s"].to_numpy() // 100)).all()


def test_components_hist_accounting(ray_session):
    """Component sizes sum to the node count of the thinned graph."""
    from crawler_service_ray.pipelines.queries import q_components_hist

    got = q_components_hist("/root/testdata/sf0.001").to_pandas()
    assert (got["size"] >= 2).all()   # every component spans an edge
    assert (got["n_components"] >= 1).all()


def test_max_subarray_handcrafted(ray_session):
    """Kadane per user on known series, incl. the all-negative user
    (nonempty convention: best = max single element)."""
    from crawler_service_ray.pipelines.queries import q_max_subarray

    got = (q_max_subarray("/root/testdata/sf0.001").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"],
                        kind="mergesort")
    want = {}
    for uid, g in ev.groupby("user_id"):
        x = (np.rint(g["value"].to_numpy() * 100).astype("int64")
             - 10_000)
        best, cur = x[0], x[0]
        for v in x[1:]:
            cur = max(v, cur + v)
            best = max(best, cur)
        want[int(uid)] = int(best)
    assert dict(zip(got["user_id"], got["best_sum"])) == want


def test_theilsen_outlier_robust(ray_session):
    """The median slope ignores one wild outlier where OLS would not;
    checked against a brute-force pairwise reference."""
    from crawler_service_ray.functions.relational import grouped_apply
    from crawler_service_ray.pipelines.queries import q_theilsen

    got = (q_theilsen("/root/testdata/sf0.001").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    for uid, g in ev.groupby("user_id"):
        t = g["ts"].to_numpy("datetime64[us]").astype("int64")
        order = np.lexsort((g["event_id"].to_numpy(), t))
        t = t[order]
        v = np.rint(g["value"].to_numpy()[order] * 100)
        slopes = [(v[j] - v[i]) / ((t[j] - t[i]) / 1e6)
                  for i in range(len(t)) for j in range(len(t))
                  if t[j] > t[i]]
        if not slopes:
            assert uid not in set(got["user_id"])
            continue
        row = got.loc[got["user_id"] == uid].iloc[0]
        assert row["n_pairs"] == len(slopes)
        assert row["slope_cps"] == round(float(np.median(slopes)), 6)


def test_keyword_tag_handcrafted(ray_session):
    """Non-overlapping substring counts and containing-doc counts on
    a constructed corpus."""
    from crawler_service_ray.pipelines.queries import (
        _TAG_KEYWORDS, q_keyword_tag)

    got = q_keyword_tag("/root/testdata/sf0.001").to_pandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["text"])
    for kw in _TAG_KEYWORDS:
        occ = int(docs["text"].str.count(kw).sum())
        nd = int((docs["text"].str.count(kw) > 0).sum())
        row = got.loc[got["kw"] == kw].iloc[0]
        assert (int(row["occurrences"]), int(row["n_docs"])) == (occ, nd)


def test_trigram_mining_handcrafted(ray_session):
    """Consecutive triples never cross user boundaries and total
    count equals sum over users of max(0, n_u - 2)."""
    from crawler_service_ray.pipelines.queries import q_trigram_mining

    got = q_trigram_mining("/root/testdata/sf0.001").to_pandas()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id"])
    sizes = ev.groupby("user_id").size().to_numpy()
    assert int(got["n"].sum()) == int(np.maximum(sizes - 2, 0).sum())
    assert (got["n"] >= 1).all()


def test_ams_f2_parallelism_invariant(ray_session):
    """The AMS estimate is a deterministic function of the rows (fixed
    hash family, component-wise sums) — identical across block
    layouts — and the audit flag holds at sf0.001."""
    from crawler_service_ray.pipelines.queries import q_ams_f2

    a = q_ams_f2("/root/testdata/sf0.001")
    b = q_ams_f2("/root/testdata/sf0.001")
    assert a["f2_exact"].iloc[0] == b["f2_exact"].iloc[0]
    assert int(a["within_half"].iloc[0]) == 1
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_partkey"])
    f2 = int((li.groupby("l_partkey").size() ** 2).sum())
    assert int(a["f2_exact"].iloc[0]) == f2


def test_modularity_edge_accounting(ray_session):
    """m_edges equals the pandas-reference distinct co-purchase edge
    count; Q is inside Newman's [-1/2, 1) band."""
    from crawler_service_ray.pipelines.queries import q_modularity

    got = q_modularity("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    m = (li.merge(li, on="l_orderkey")
         .query("l_partkey_x < l_partkey_y")
         [["l_partkey_x", "l_partkey_y"]].drop_duplicates())
    assert int(got["m_edges"].iloc[0]) == len(m)
    q = float(got["modularity"].iloc[0])
    assert -0.5 <= q < 1.0


def test_cv_ols_against_lstsq(ray_session):
    """Each fold's RMSE from the leave-fold-out Gram algebra matches
    a per-row numpy lstsq reference; folds partition the table."""
    from crawler_service_ray.pipelines.queries import _CV_FOLDS, q_cv_ols

    got = (q_cv_ols("/root/testdata/sf0.001")
           .sort_values("fold").reset_index(drop=True))
    li = pd.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_discount", "l_tax"])
    okey = li["l_orderkey"].to_numpy().astype(np.uint64)
    fold = (((okey % np.uint64(2**32)) * np.uint64(2654435761))
            % np.uint64(2**32) % np.uint64(_CV_FOLDS)).astype("int64")
    y = np.rint(li["l_quantity"].to_numpy()).astype("float64")
    X = np.column_stack([
        np.ones(len(li)),
        np.rint(li["l_discount"].to_numpy() * 100),
        np.rint(li["l_tax"].to_numpy() * 100)])
    assert int(got["n_test"].sum()) == len(li)
    for _, row in got.iterrows():
        te = fold == row["fold"]
        beta, *_ = np.linalg.lstsq(X[~te], y[~te], rcond=None)
        rmse = float(np.sqrt(((y[te] - X[te] @ beta) ** 2).mean()))
        assert abs(row["rmse"] - rmse) < 1e-4


def test_stream_join_reference(ray_session):
    """Per-user windowed conversion counts equal the brute-force
    pandas pair join."""
    from crawler_service_ray.pipelines.queries import q_stream_join

    got = (q_stream_join("/root/testdata/sf0.001").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    c = ev[ev["event_type"] == "click"]
    p = ev[ev["event_type"] == "purchase"]
    j = c.merge(p, on="user_id", suffixes=("_c", "_p"))
    dt = (j["ts_p"].to_numpy("datetime64[us]").astype("int64")
          - j["ts_c"].to_numpy("datetime64[us]").astype("int64"))
    j = j[(dt > 0) & (dt <= 3_600_000_000)]
    want = j.groupby("user_id").size()
    assert dict(zip(got["user_id"], got["conversions"])) \
        == {int(k): int(v) for k, v in want.items()}


def test_ht_estimate_replay(ray_session):
    """The HT estimator is a deterministic replay: 16 × the sampled
    integer-cent sum, sample = Knuth-hash bucket 0."""
    from crawler_service_ray.pipelines.queries import q_ht_estimate

    got = q_ht_estimate("/root/testdata/sf0.001")
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    okey = o["o_orderkey"].to_numpy().astype(np.uint64)
    smp = (((okey % np.uint64(2**32)) * np.uint64(2654435761))
           % np.uint64(2**32) % np.uint64(16)) == 0
    c = np.rint(o["o_totalprice"].to_numpy() * 100).astype("int64")
    assert int(got["exact_total_c"].iloc[0]) == int(c.sum())
    assert int(got["ht_total_c"].iloc[0]) == 16 * int(c[smp].sum())
    assert int(got["n_sampled"].iloc[0]) == int(smp.sum())


def test_returns_topk_reference(ray_session):
    """Top-20 returned-revenue customers equal the pandas star-join
    reference, including the custkey tie-break."""
    from crawler_service_ray.pipelines.queries import q_returns_topk

    got = q_returns_topk("/root/testdata/sf0.001").to_pandas()
    sf = "/root/testdata/sf0.001"
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    li = li[li["l_returnflag"] == "R"]
    rev = (np.rint(li["l_extendedprice"].to_numpy() * 100).astype("int64")
           * (100 - np.rint(li["l_discount"].to_numpy() * 100)
              .astype("int64")))
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{sf}/customer.parquet",
                        columns=["c_custkey", "c_name", "c_nationkey"])
    n = pd.read_parquet(f"{sf}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    j = (li[["l_orderkey"]].assign(rev=rev)
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .groupby("o_custkey", as_index=False)["rev"].sum()
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    want = (j.sort_values(["rev", "c_custkey"],
                          ascending=[False, True]).head(20)
            .reset_index(drop=True))
    got = got.sort_values(["revenue_c4", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_c4"].tolist() == want["rev"].tolist()
    assert got["n_name"].tolist() == want["n_name"].tolist()


def test_session_paths_reference(ray_session):
    """Daily path counts equal the pandas string-join reference,
    including the (n desc, path asc) cutoff."""
    from crawler_service_ray.pipelines.queries import q_session_paths

    got = (q_session_paths("/root/testdata/sf0.001").to_pandas()
           .reset_index(drop=True))
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    day = (ev["ts"].to_numpy("datetime64[us]").astype("int64")
           // 86_400_000_000)
    paths = (ev.assign(d=day).groupby(["user_id", "d"])["event_type"]
             .agg(">".join))
    want = (paths.value_counts().rename_axis("path").reset_index(name="n")
            .sort_values(["n", "path"], ascending=[False, True])
            .head(20).reset_index(drop=True))
    got = got.sort_values(["n", "path"],
                          ascending=[False, True]).reset_index(drop=True)
    assert got["path"].tolist() == want["path"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_kendall_tau_against_scipy_free_reference(ray_session):
    """tau-b from the quadrant sums equals a brute-force O(n²) pair
    count on the small table."""
    from crawler_service_ray.pipelines.queries import q_kendall_tau

    got = q_kendall_tau("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_quantity", "l_discount"])
    q = np.rint(li["l_quantity"].to_numpy()).astype("int64")
    d = np.rint(li["l_discount"].to_numpy() * 100).astype("int64")
    n = len(q)
    dq = np.sign(q[:, None] - q[None, :])
    dd = np.sign(d[:, None] - d[None, :])
    s = dq * dd
    iu = np.triu_indices(n, 1)
    conc = int((s[iu] > 0).sum())
    disc = int((s[iu] < 0).sum())
    n0 = n * (n - 1) // 2
    t1 = int((dq[iu] == 0).sum())
    t2 = int((dd[iu] == 0).sum())
    tau = (conc - disc) / (np.sqrt(float(n0 - t1))
                           * np.sqrt(float(n0 - t2)))
    assert int(got["concordant"].iloc[0]) == conc
    assert int(got["discordant"].iloc[0]) == disc
    assert abs(float(got["tau_b"].iloc[0]) - tau) < 1e-6


def test_kaplan_meier_censoring_path(ray_session, tmp_path):
    """The sf tables have no never-purchasing users, so the censoring
    arm never fires in the oracle gate — pin it here: censored subjects
    leave the risk set without a survival drop, and a day where every
    remaining subject converts drives survival to exactly 0."""
    from crawler_service_ray.pipelines.queries import q_kaplan_meier

    t0 = np.datetime64("2026-01-01T00:00:00", "us")

    def ev(uid, offs_days, types):
        return pd.DataFrame({
            "user_id": np.full(len(types), uid, dtype="int64"),
            "ts": [t0 + int(o * 86_400_000_000 // 1_000_000)
                   * np.timedelta64(1_000_000, "us") for o in offs_days],
            "event_type": types})

    # u1: converts on day 3; u2: censored day 5; u3: converts day 1
    # (first event IS the purchase); u4: censored day 1 (single event)
    df = pd.concat([
        ev(1, [0.0, 2.5], ["click", "purchase"]),
        ev(2, [0.0, 1.0, 4.2], ["click", "view", "click"]),
        ev(3, [0.0], ["purchase"]),
        ev(4, [0.5], ["view"]),
    ])
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = q_kaplan_meier(str(tmp_path))

    # lifetable: day1 d=1 c=1 n=4; day3 d=1 c=0 n=2; day5 d=0 c=1 n=1
    assert got["day"].tolist() == [1, 3, 5]
    assert got["n_risk"].tolist() == [4, 2, 1]
    assert got["n_events"].tolist() == [1, 1, 0]
    assert got["n_censored"].tolist() == [1, 0, 1]
    want = np.cumprod([1 - 1 / 4, 1 - 1 / 2, 1.0])
    assert np.allclose(got["survival"].to_numpy(), want, atol=2e-6)


def test_decision_stump_brute_force(ray_session):
    """The exact-integer argmax picks the same split as a float
    brute-force over every threshold, and accuracy/gini replay."""
    from crawler_service_ray.pipelines.queries import q_decision_stump

    got = q_decision_stump("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])
    q = li["l_quantity"].to_numpy(dtype="float64").astype("int64")
    f = li["l_returnflag"].to_numpy()
    classes = sorted(set(f))
    n = len(q)
    best = None
    for t in sorted(set(q))[:-1]:
        l_mask = q <= t
        nl_f = [int(((f == c) & l_mask).sum()) for c in classes]
        nr_f = [int(((f == c) & ~l_mask).sum()) for c in classes]
        nl, nr = sum(nl_f), sum(nr_f)
        gl = 1.0 - sum((x / nl) ** 2 for x in nl_f)
        gr = 1.0 - sum((x / nr) ** 2 for x in nr_f)
        gini = (nl * gl + nr * gr) / n
        if best is None or gini < best[0] - 1e-12:
            best = (gini, t, nl_f, nr_f)
    gini, t, nl_f, nr_f = best
    assert int(got["threshold"].iloc[0]) == t
    assert abs(float(got["gini"].iloc[0]) - gini) < 1e-9
    lmax = max(range(len(classes)), key=lambda j: (nl_f[j], -j))
    rmax = max(range(len(classes)), key=lambda j: (nr_f[j], -j))
    assert got["left_class"].iloc[0] == classes[lmax]
    assert got["right_class"].iloc[0] == classes[rmax]
    acc = (nl_f[lmax] + nr_f[rmax]) / n
    assert abs(float(got["accuracy"].iloc[0]) - acc) < 1e-9


def test_pareto_8020_prefix_reference(ray_session):
    """n_top is the smallest k whose cumulative revenue share reaches
    80%, on the exact integer-cent prefix."""
    from crawler_service_ray.pipelines.queries import q_pareto_8020

    got = q_pareto_8020("/root/testdata/sf0.001")
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = np.rint(o["o_totalprice"].to_numpy() * 100).astype("int64")
    rev = (o.assign(c=c).groupby("o_custkey")["c"].sum()
           .sort_values(ascending=False))
    cum = np.cumsum(rev.to_numpy())
    total = int(cum[-1])
    k = int(np.argmax(5 * cum >= 4 * total)) + 1
    assert int(got["n_top"].iloc[0]) == k
    assert int(got["n_customers"].iloc[0]) == len(rev)
    assert int(got["total_rev_c"].iloc[0]) == total
    # k-1 customers must NOT reach 80%
    assert k == 1 or 5 * int(cum[k - 2]) < 4 * total


def test_cohort_ltv_pandas_reference(ray_session):
    """Cohort/offset revenue, cohort sizes, and the cumulative fold
    equal a pandas reference on the small table."""
    from crawler_service_ray.pipelines.queries import q_cohort_ltv

    got = (q_cohort_ltv("/root/testdata/sf0.001")
           .sort_values(["cohort", "weeks_since"]).reset_index(drop=True))
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "ts", "event_type", "value"])
    wk = (ev["ts"].to_numpy("datetime64[us]").astype("int64")
          // 604_800_000_000)
    d = ev.assign(wk=wk)
    d["cohort"] = d.groupby("user_id")["wk"].transform("min")
    d["off"] = d["wk"] - d["cohort"]
    d["rev"] = np.where(
        d["event_type"] == "purchase",
        np.rint(d["value"].to_numpy() * 100).astype("int64"), 0)
    pur = (d[d["event_type"] == "purchase"]
           .groupby(["cohort", "off"])["rev"].sum())
    sizes = d.drop_duplicates("user_id").groupby("cohort").size()
    for _, r in got.iterrows():
        key = (r["cohort"], r["weeks_since"])
        want_rev = int(pur.get(key, 0))
        assert int(r["rev_c"]) == want_rev
        assert int(r["n_users"]) == int(sizes[r["cohort"]])
    # cumulative strictly reconstructs from the emitted rows
    cum = got.groupby("cohort")["rev_c"].cumsum()
    assert (got["cum_rev_c"] == cum).all()


def test_psi_zero_on_identical_halves(ray_session, tmp_path):
    """Two halves drawn as exact copies of each other give PSI == 0;
    shifting the second half's values gives PSI > 0."""
    from crawler_service_ray.pipelines.queries import q_psi

    rng = np.random.default_rng(11)
    vals = np.round(rng.exponential(10.0, size=400), 3)
    t0 = np.datetime64("2026-01-01T00:00:00", "us")
    hr = np.timedelta64(3_600_000_000, "us")
    # first half at hours 0..399, second at hours 1000..1399 (same values)
    ts = np.concatenate([np.arange(400), 1000 + np.arange(400)])
    df = pd.DataFrame({
        "event_id": np.arange(800, dtype="int64"),
        "ts": t0 + ts * hr,
        "value": np.concatenate([vals, vals])})
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = q_psi(str(tmp_path))
    assert int(got["n_a"].iloc[0]) == 400
    assert int(got["n_b"].iloc[0]) == 400
    assert float(got["psi"].iloc[0]) == 0.0

    df2 = df.copy()
    df2.loc[400:, "value"] = df2.loc[400:, "value"] * 3.0 + 5.0
    df2.to_parquet(tmp_path / "events.parquet", index=False)
    got2 = q_psi(str(tmp_path))
    assert float(got2["psi"].iloc[0]) > 0.1


def test_mann_kendall_brute_force(ray_session):
    """S, the tie-corrected variance, and z replay against a dict-loop
    reference on every user of the small table."""
    from crawler_service_ray.pipelines.queries import q_mann_kendall

    got = (q_mann_kendall("/root/testdata/sf0.001").to_pandas()
           .set_index("user_id").sort_index())
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in ev.groupby("user_id"):
        v = np.rint(g["value"].to_numpy() * 100).astype("int64")
        n = len(v)
        s = sum(int(np.sign(v[j] - v[i]))
                for i in range(n) for j in range(i + 1, n))
        from collections import Counter
        tt = sum(t * (t - 1) * (2 * t + 5)
                 for t in Counter(v.tolist()).values())
        var18 = n * (n - 1) * (2 * n + 5) - tt
        if var18 > 0 and s != 0:
            z = round((s - 1 if s > 0 else s + 1)
                      / np.sqrt(var18 / 18.0), 6)
        else:
            z = 0.0
        r = got.loc[uid]
        assert int(r["n"]) == n and int(r["s"]) == s
        assert int(r["var18"]) == var18
        assert abs(float(r["z"]) - z) < 1e-9


def test_shingle_leakage_pandas_reference(ray_session):
    """Per-source distinct-5-gram counts and the ≥2-source shared share
    equal a set-based reference."""
    from crawler_service_ray.pipelines.queries import q_shingle_leakage

    got = (q_shingle_leakage("/root/testdata/sf0.001")
           .set_index("source").sort_index())
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["text", "source"])
    per_src: dict = {}
    for src, txt in zip(docs["source"], docs["text"]):
        ws = [w for w in txt.split(" ") if w != ""]
        m = max(len(ws) - 4, 1) if ws else 0
        shs = {" ".join(ws[i:i + 5]) for i in range(m)}
        per_src.setdefault(src, set()).update(shs)
    from collections import Counter
    cnt = Counter(sh for s in per_src.values() for sh in s)
    for src, shs in per_src.items():
        shared = sum(1 for sh in shs if cnt[sh] >= 2)
        r = got.loc[src]
        assert int(r["types"]) == len(shs)
        assert int(r["shared"]) == shared


def test_mrr_rank_identity(ray_session):
    """The sort-free rank (1 + #better) equals the rank read off an
    explicit full sort of the scores, per query."""
    from crawler_service_ray.pipelines.queries import q_mrr

    got = q_mrr("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    qdf = docs[docs["doc_id"] % 97 == 0]
    ranks = []
    for qid, txt in zip(qdf["doc_id"], qdf["text"]):
        terms = []
        for w in txt.split(" "):
            if w != "" and w not in terms:
                terms.append(w)
            if len(terms) == 3:
                break
        tset = set(terms)
        s = docs["text"].map(
            lambda t: len(tset & {w for w in t.split(" ") if w != ""}))
        order = (docs.assign(s=s)
                 .sort_values(["s", "doc_id"], ascending=[False, True])
                 .reset_index(drop=True))
        rank = int(order.index[order["doc_id"] == qid][0]) + 1
        ranks.append(rank)
    mrr = round(sum(int(round(1e6 / r)) for r in ranks) / 1e6
                / len(ranks), 6)
    assert int(got["n_queries"].iloc[0]) == len(ranks)
    assert int(got["hits_at_1"].iloc[0]) == sum(r == 1 for r in ranks)
    assert int(got["hits_at_10"].iloc[0]) == sum(r <= 10 for r in ranks)
    assert abs(float(got["mrr"].iloc[0]) - mrr) < 1e-9


def test_trimmed_mean_explicit_sort_reference(ray_session):
    """The rank-exchange trim equals dropping the k smallest/largest
    rows of an explicit (value, key) sort."""
    from crawler_service_ray.pipelines.queries import q_trimmed_mean

    got = q_trimmed_mean("/root/testdata/sf0.001")
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    c = np.rint(o["o_totalprice"].to_numpy() * 100).astype("int64")
    order = np.lexsort((o["o_orderkey"].to_numpy(), c))
    n = len(c)
    k = int(np.floor(0.05 * n))
    kept = c[order][k:n - k]
    assert int(got["n"].iloc[0]) == n
    assert int(got["k_trim"].iloc[0]) == k
    assert int(got["n_kept"].iloc[0]) == len(kept)
    assert int(got["sum_kept_c"].iloc[0]) == int(kept.sum())


def test_runs_test_brute_force(ray_session):
    """Run counts and sign totals replay a python-loop reference on
    every user, including the all-one-sign degenerate z=0 arm."""
    from crawler_service_ray.pipelines.queries import q_runs_test

    got = (q_runs_test("/root/testdata/sf0.001").to_pandas()
           .set_index("user_id").sort_index())
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in ev.groupby("user_id"):
        v = np.rint(g["value"].to_numpy() * 100).astype("int64")
        med = np.quantile(v, 0.5, method="inverted_cdf")
        sg = [1 if x > med else 0 for x in v]
        runs = 1 + sum(a != b for a, b in zip(sg, sg[1:]))
        r = got.loc[uid]
        assert int(r["n1"]) == sum(sg)
        assert int(r["runs"]) == runs
        if sum(sg) in (0, len(sg)):
            assert float(r["z"]) == 0.0


def test_anova2_decomposition_invariants(ray_session):
    """SS components are nonnegative and rebuild SS_total; F ratios
    replay from the emitted SS and dfs."""
    from crawler_service_ray.pipelines.queries import q_anova2

    got = q_anova2("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity"])
    y = li["l_quantity"].to_numpy(dtype="float64").astype("int64")
    n = len(y)
    c = float(y.sum()) ** 2 / n
    ss_total = float((y * y).sum()) - c
    parts = (float(got["ss_a"].iloc[0]) + float(got["ss_b"].iloc[0])
             + float(got["ss_ab"].iloc[0]) + float(got["ss_err"].iloc[0]))
    assert int(got["n"].iloc[0]) == n
    assert abs(parts - ss_total) < 0.01
    assert float(got["ss_err"].iloc[0]) >= 0
    na = li["l_returnflag"].nunique()
    nb = li["l_linestatus"].nunique()
    ms_err = float(got["ss_err"].iloc[0]) / int(got["df_err"].iloc[0])
    assert abs(float(got["f_a"].iloc[0])
               - float(got["ss_a"].iloc[0]) / (na - 1) / ms_err) < 1e-3


def test_lorenz_matches_sorted_deciles(ray_session):
    """Decile sums equal an explicit sort's decile sums and the last
    cumulative share is exactly 1."""
    from crawler_service_ray.pipelines.queries import q_lorenz

    got = q_lorenz("/root/testdata/sf0.001")
    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    c = np.rint(o["o_totalprice"].to_numpy() * 100).astype("int64")
    order = np.lexsort((o["o_orderkey"].to_numpy(), c))
    cs = c[order]
    n = len(cs)
    dec = np.arange(n) * 10 // n
    for d in range(10):
        assert int(got.loc[got["decile"] == d, "sum_c"].iloc[0]) \
            == int(cs[dec == d].sum())
    assert float(got["cum_share"].iloc[-1]) == 1.0


def test_wasserstein_sorted_reference(ray_session):
    """W1 from the bin exchange equals the explicit sorted-CDF
    integral (micro-rounded per gap the same way)."""
    from crawler_service_ray.pipelines.queries import q_wasserstein

    got = q_wasserstein("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_type", "value"])
    a = np.sort(ev.loc[ev["event_type"] == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev["event_type"] == "view", "value"].to_numpy())
    vs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, vs, side="right") / len(a)
    fb = np.searchsorted(b, vs, side="right") / len(b)
    micro = int(np.round(np.abs(fa - fb)[:-1] * np.diff(vs) * 1e6)
                .astype("int64").sum())
    assert int(got["n_a"].iloc[0]) == len(a)
    assert int(got["n_b"].iloc[0]) == len(b)
    assert abs(float(got["w1"].iloc[0]) - micro / 1e6) < 2e-6


def test_cvm_scipy_free_reference(ray_session):
    """The CvM statistic equals the textbook sum over observations of
    the squared CDF gap, scaled by n_a n_b/(n_a+n_b)^2."""
    from crawler_service_ray.pipelines.queries import q_cvm_test

    got = q_cvm_test("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_type", "value"])
    a = np.sort(ev.loc[ev["event_type"] == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev["event_type"] == "view", "value"].to_numpy())
    allv = np.concatenate([a, b])
    fa = np.searchsorted(a, allv, side="right") / len(a)
    fb = np.searchsorted(b, allv, side="right") / len(b)
    na, nb = len(a), len(b)
    t = float(((fa - fb) ** 2).sum()) * na * nb / (na + nb) ** 2
    assert abs(float(got["cvm_t"].iloc[0]) - t) < 1e-4


def test_conversion_ci_pandas_reference(ray_session):
    """Arm n/k and the Wilson bounds replay a pandas + closed-form
    reference; bounds bracket the rate and stay inside [0, 1]."""
    from crawler_service_ray.pipelines.queries import q_conversion_ci

    got = q_conversion_ci("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_type"])
    d = ev.assign(p=(ev["event_type"] == "purchase").astype(int))
    u = d.groupby("user_id").agg(conv=("p", "max"))
    u["arm"] = u.index % 8
    a = u.groupby("arm").agg(n=("conv", "count"), k=("conv", "sum"))
    for _, r in got.iterrows():
        n, k = int(a.loc[r["arm"], "n"]), int(a.loc[r["arm"], "k"])
        assert int(r["n"]) == n and int(r["k"]) == k
        p, z = k / n, 1.96
        denom = 1 + z * z / n
        c = (p + z * z / (2 * n)) / denom
        h = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert abs(float(r["wilson_lo"]) - (c - h)) < 1e-6
        assert abs(float(r["wilson_hi"]) - (c + h)) < 1e-6
        assert 0.0 <= float(r["wilson_lo"]) <= float(r["rate"]) + 1e-9
        assert float(r["rate"]) - 1e-9 <= float(r["wilson_hi"]) <= 1.0


def test_compress_ratio_zlib_replay(ray_session):
    """The per-source mean/min/max replay the exact zlib arithmetic
    (no SQL oracle exists for deflate — this pytest is the pin)."""
    import zlib
    from crawler_service_ray.pipelines.queries import q_compress_ratio

    got = (q_compress_ratio("/root/testdata/sf0.001")
           .set_index("source").sort_index())
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["source", "text"])
    for src, g in docs.groupby("source"):
        r = np.array(
            [int(round(len(zlib.compress(t.encode(), 6))
                       / max(len(t.encode()), 1) * 1e6))
             for t in g["text"]], dtype="int64")
        row = got.loc[src]
        assert int(row["n"]) == len(r)
        assert abs(float(row["mean_ratio"])
                   - round(r.sum() / len(r) / 1e6, 6)) < 1e-9
        assert float(row["min_ratio"]) == round(int(r.min()) / 1e6, 6)
        assert float(row["max_ratio"]) == round(int(r.max()) / 1e6, 6)


def test_levene_textbook_reference(ray_session):
    """levene_w replays the textbook mean-centered W on groups with
    genuinely different spreads, invariant to block layout."""
    rng = np.random.default_rng(417)
    groups = ["a"] * 350 + ["b"] * 400 + ["c"] * 250
    v = np.r_[rng.normal(10, 1, 350), rng.normal(10, 3, 400),
              rng.normal(10, 2, 250)]
    df = pd.DataFrame({"g": groups, "v": v})

    got = rel.levene_w(rd.from_pandas(df).repartition(7),
                       "g", "v").to_pandas()
    mu = df.groupby("g")["v"].transform("mean")
    z = (df["v"] - mu).abs()
    zg = pd.DataFrame({"g": groups, "z": z})
    zbar = zg.groupby("g")["z"].mean()
    ns = zg.groupby("g")["z"].size()
    grand = float(z.mean())
    ssb = float((ns * (zbar - grand) ** 2).sum())
    ssw = float(((z - zbar.reindex(df["g"]).to_numpy()) ** 2).sum())
    w_ref = (ssb / 2) / (ssw / (1000 - 3))
    assert int(got["n_groups"][0]) == 3 and int(got["n"][0]) == 1000
    assert abs(float(got["w_stat"][0]) - w_ref) < 1e-6
    # different spreads by construction -> W clearly rejects
    assert float(got["w_stat"][0]) > 10.0


def test_ndcg_per_user_loop_reference(ray_session):
    """q_ndcg matches an independent per-user python-loop nDCG@10
    (explicit sorted lists, no vectorized ranking)."""
    from crawler_service_ray.pipelines.queries import q_ndcg

    got = q_ndcg("/root/testdata/sf0.001")
    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"])
    relmap = {"purchase": 2.0, "click": 1.0}
    micros = []
    for _, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(),
                      key=lambda r: (-r.value, r.event_id))
        rels = [relmap.get(r.event_type, 0.0) for r in rows]
        dcg = sum((2.0 ** r - 1) / np.log2(i + 2)
                  for i, r in enumerate(rels[:10]))
        ideal = sorted(rels, reverse=True)
        idcg = sum((2.0 ** r - 1) / np.log2(i + 2)
                   for i, r in enumerate(ideal[:10]))
        if idcg > 0:
            micros.append(int(round(dcg / idcg * 1e6)))
    ref = round(sum(micros) / 1e6 / len(micros), 6)
    assert int(got["n_users"][0]) == len(micros)
    assert abs(float(got["mean_ndcg"][0]) - ref) < 1e-9
    assert 0.0 < float(got["mean_ndcg"][0]) <= 1.0


def test_mcnemar_and_odds_ratio_contingency(ray_session):
    """Both 2x2 queries replay a pure-pandas contingency table and
    the closed-form statistics; the CI brackets the point estimate."""
    from crawler_service_ray.pipelines.queries import (
        q_mcnemar, q_odds_ratio)

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_type"])
    u = (ev.assign(a=(ev["event_type"] == "click").astype(int),
                   b=(ev["event_type"] == "purchase").astype(int))
         .groupby("user_id").agg(a=("a", "max"), b=("b", "max")))
    n11 = int(((u.a == 1) & (u.b == 1)).sum())
    n10 = int(((u.a == 1) & (u.b == 0)).sum())
    n01 = int(((u.a == 0) & (u.b == 1)).sum())
    n00 = int(((u.a == 0) & (u.b == 0)).sum())

    mc = q_mcnemar("/root/testdata/sf0.001")
    assert int(mc["b01"][0]) == n01 and int(mc["b10"][0]) == n10
    if n10 + n01 > 0:
        chi_ref = (abs(n10 - n01) - 1.0) ** 2 / (n10 + n01)
        assert abs(float(mc["mcnemar_chi2"][0])
                   - round(chi_ref, 6)) < 1e-9
    else:
        # no discordant pairs at this sf: statistic undefined, and
        # BOTH sides agree on NaN/NULL (the oracle's 0/0 is NULL)
        assert np.isnan(float(mc["mcnemar_chi2"][0]))
    # synthetic discordant case pins the closed form itself
    df = pd.DataFrame({"user_id": np.arange(100),
                       "event_type": (["click"] * 30 + ["purchase"] * 12
                                      + ["view"] * 58)})
    p = "/tmp/_mcnemar_case"
    import os
    os.makedirs(p, exist_ok=True)
    df.to_parquet(f"{p}/events.parquet")
    mc2 = q_mcnemar(p)
    assert int(mc2["b10"][0]) == 30 and int(mc2["b01"][0]) == 12
    assert abs(float(mc2["mcnemar_chi2"][0])
               - round((abs(30 - 12) - 1.0) ** 2 / 42.0, 6)) < 1e-9

    orr = q_odds_ratio("/root/testdata/sf0.001")
    assert [int(orr[c][0]) for c in ("n11", "n10", "n01", "n00")] \
        == [n11, n10, n01, n00]
    o = (n11 + .5) * (n00 + .5) / ((n10 + .5) * (n01 + .5))
    se = np.sqrt(sum(1.0 / (c + .5) for c in (n11, n10, n01, n00)))
    assert abs(float(orr["odds_ratio"][0]) - round(o, 6)) < 1e-9
    assert abs(float(orr["ci_lo"][0])
               - round(float(np.exp(np.log(o) - 1.96 * se)), 6)) < 1e-9
    assert abs(float(orr["ci_hi"][0])
               - round(float(np.exp(np.log(o) + 1.96 * se)), 6)) < 1e-9
    assert float(orr["ci_lo"][0]) <= float(orr["odds_ratio"][0]) \
        <= float(orr["ci_hi"][0])


def test_readability_python_re_replay(ray_session):
    """Per-source Flesch means replay a python-re per-doc loop."""
    import re
    from crawler_service_ray.pipelines.queries import q_readability

    got = (q_readability("/root/testdata/sf0.001")
           .set_index("source").sort_index())
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["source", "text"])
    for src, g in docs.groupby("source"):
        fre_mi, fkg_mi = [], []
        for t in g["text"]:
            w = float(len(re.findall(r"\S+", t)))
            if w == 0:
                continue
            s = max(float(len(re.findall(r"[.!?]+", t))), 1.0)
            syl = float(len(re.findall(r"[aeiouyAEIOUY]+", t)))
            fre_mi.append(int(round(
                (206.835 - 1.015 * (w / s) - 84.6 * (syl / w)) * 1e6)))
            fkg_mi.append(int(round(
                (0.39 * (w / s) + 11.8 * (syl / w) - 15.59) * 1e6)))
        row = got.loc[src]
        assert int(row["n_docs"]) == len(fre_mi)
        assert abs(float(row["mean_fre"])
                   - round(sum(fre_mi) / 1e6 / len(fre_mi), 6)) < 1e-9
        assert abs(float(row["mean_fk_grade"])
                   - round(sum(fkg_mi) / 1e6 / len(fkg_mi), 6)) < 1e-9


def test_friedman_hand_case(ray_session, tmp_path):
    """A constructed 4-block design with a known rank table pins the
    classic Q formula (blocks rank c<p<v except one swap)."""
    from crawler_service_ray.pipelines.queries import q_friedman

    rows = []
    eid = 0
    # users 0-2: click=1.00 < purchase=2.00 < view=3.00
    # user 3:    purchase=1.00 < click=2.00 < view=3.00
    vals = {0: {"click": 1.0, "purchase": 2.0, "view": 3.0},
            1: {"click": 1.0, "purchase": 2.0, "view": 3.0},
            2: {"click": 1.0, "purchase": 2.0, "view": 3.0},
            3: {"click": 2.0, "purchase": 1.0, "view": 3.0}}
    for u, d in vals.items():
        for t, v in d.items():
            rows.append((eid, u, t, v)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "value"])
    p = tmp_path / "events.parquet"
    df.to_parquet(p)
    got = q_friedman(str(tmp_path))
    # rank sums: click 1+1+1+2=5, purchase 2+2+2+1=7, view 12
    n, k = 4.0, 3.0
    q_ref = 12.0 / (n * k * (k + 1)) * (25 + 49 + 144) - 3 * n * (k + 1)
    assert int(got["n_blocks"][0]) == 4
    assert abs(float(got["friedman_q"][0]) - round(q_ref, 6)) < 1e-9


def test_seasonal_decompose_recovers_injected_pattern(ray_session,
                                                      tmp_path):
    """On synthetic revenue = linear trend + zero-mean weekly pattern,
    the centered-MA decomposition recovers the pattern EXACTLY (the
    7x-units arithmetic keeps everything integral)."""
    from crawler_service_ray.pipelines.queries import (
        q_seasonal_decompose)

    season = {0: 3.5, 1: -2.0, 2: 0.5, 3: 1.0, 4: -1.5, 5: 0.0,
              6: -1.5}
    rows = []
    for day in range(20454, 20454 + 28):   # 4 full weeks
        dow = (day + 4) % 7
        v = 100.0 + 0.25 * (day - 20454) + season[dow]
        rows.append((np.datetime64(day * 86_400_000_000, "us"),
                     float(v)))
    df = pd.DataFrame(rows, columns=["ts", "value"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_seasonal_decompose(str(tmp_path)).set_index("dow")
    assert len(got) == 7
    for dow, s in season.items():
        assert abs(float(got.loc[dow, "seasonal"]) - s) < 1e-6
    assert int(got["n_days"].sum()) == 28 - 6


def test_trend_test_monotone_and_replay(ray_session, tmp_path):
    """A monotone synthetic conversion gradient gives a large z^2 with
    the closed form replayed; the sf0.001 run matches pure pandas."""
    from crawler_service_ray.pipelines.queries import q_trend_test

    rows, eid = [], 0
    for u in range(800):
        arm = u % 8
        rows.append((eid, u, "view")); eid += 1
        if (u * 2654435761 % 100) < 5 + 10 * arm:  # rising rate
            rows.append((eid, u, "purchase")); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_trend_test(str(tmp_path))
    u = df.groupby("user_id")["event_type"].agg(
        lambda s: int((s == "purchase").any()))
    arm = u.index.to_numpy() % 8
    a = pd.DataFrame({"arm": arm, "c": u.to_numpy()}).groupby("arm") \
        .agg(n=("c", "count"), r=("c", "sum"))
    s, n, r = a.index.to_numpy(), a["n"].to_numpy(), a["r"].to_numpy()
    N, R = int(n.sum()), int(r.sum())
    pbar = R / N
    t_ref = int((s * r).sum()) - pbar * int((s * n).sum())
    ssn = int((s * n).sum())
    var = pbar * (1 - pbar) * (int((s * s * n).sum())
                               - float(ssn) * float(ssn) / float(N))
    assert int(got["n_users"][0]) == N
    assert int(got["converted"][0]) == R
    assert abs(float(got["ca_t"][0]) - round(t_ref, 6)) < 1e-9
    assert abs(float(got["ca_z2"][0])
               - round(t_ref * t_ref / var, 6)) < 1e-9
    assert float(got["ca_z2"][0]) > 30.0  # monotone gradient detected


def test_bootstrap_ci_duckdb_free_replay(ray_session):
    """The 40 hash-Poissonized replicate means replay a pure-numpy
    single-process reference; the CI brackets the mean for this data
    and lo <= hi always."""
    from crawler_service_ray.pipelines.queries import q_bootstrap_ci

    got = q_bootstrap_ci("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "value"])
    ids = ev["event_id"].to_numpy().astype(np.uint64) \
        % np.uint64(4294967296)
    c = np.rint(ev["value"].to_numpy(dtype="float64") * 100) \
        .astype("int64")
    means = []
    for b in range(40):
        w = np.zeros(len(ids), dtype="int64")
        for k in range(8):
            h = (((ids * np.uint64(2654435761)
                   + np.uint64(b * 40503 + k * 2246822519))
                  % np.uint64(4294967296))
                 * np.uint64(2654435761)) % np.uint64(4294967296)
            w += (h % np.uint64(8) == 0)
        means.append(float((w * c).sum()) / float(w.sum()) / 100.0)
    means = np.sort(np.array(means))
    assert abs(float(got["boot_lo"][0]) - round(float(means[1]), 6)) \
        < 1e-9
    assert abs(float(got["boot_hi"][0]) - round(float(means[38]), 6)) \
        < 1e-9
    assert float(got["boot_lo"][0]) <= float(got["mean"][0]) \
        <= float(got["boot_hi"][0])
    # weights behave like Poisson(1): replicate mass stays near n
    assert abs(means.mean() - float(got["mean"][0])) \
        < 0.2 * abs(float(got["mean"][0])) + 1.0


def test_dgim_digits_and_estimate_bound(ray_session):
    """_dgim_digits conserves mass for every n; the full audit holds
    its error bound on an adversarial alternating stream and is exact
    when the window covers everything."""
    for n in list(range(1, 200)) + [4095, 4096, 4097, 65536]:
        total = sum(c * (1 << lvl)
                    for lvl, c in enumerate(rel._dgim_digits(n)))
        assert total == n
        assert all(1 <= c <= 2 for c in rel._dgim_digits(n))

    rng = np.random.default_rng(99)
    nrows = 20000
    ts = np.arange(nrows, dtype="int64")
    bits = (rng.random(nrows) < 0.3).astype("int64")
    df = pd.DataFrame({"ts": ts, "event_id": ts, "bit": bits})
    ds = rd.from_pandas(df).repartition(9)
    for w in (512, 4096, 40000):
        audit = rel.dgim_window_audit(ds, "ts", "event_id", "bit",
                                      w).to_pandas()
        est = float(audit["est"].iloc[0])
        exact = int(bits[-min(w, nrows):].sum())
        if w >= nrows:
            assert est == exact      # window covers all: exact
        else:
            assert abs(est - exact) <= exact / 2.0 + 1.0


def test_item2item_fast_and_join_paths_agree(ray_session,
                                             monkeypatch):
    """The size-gated broadcast-filter path and the corpus-scale
    bucketed-join path return identical top-3 similarity tables."""
    import ray.data as rd
    from crawler_service_ray.pipelines import queries as Q

    def norm(res):
        df = res.to_pandas() if isinstance(res, rd.Dataset) else res
        return (df.sort_values(["item", "other"])
                .reset_index(drop=True)[["item", "other", "sim"]])

    fast = norm(Q.q_item2item("/root/testdata/sf0.001"))
    monkeypatch.setattr(Q, "_ITEM2ITEM_GATE", 0)
    slow = norm(Q.q_item2item("/root/testdata/sf0.001"))
    pd.testing.assert_frame_equal(fast.astype({"sim": "float64"}),
                                  slow.astype({"sim": "float64"}))


def test_huber_mean_downweights_outliers(ray_session):
    """On clean data + gross outliers the Huber estimate stays near
    the clean center while the plain mean is dragged; a scipy-free
    single-process IRLS replay matches exactly."""
    rng = np.random.default_rng(31)
    clean = np.round(rng.normal(50, 2, 900), 2)
    out = np.full(100, 500.0)
    v = np.r_[clean, out]
    df = pd.DataFrame({"g": ["a"] * 1000, "v": v})
    got = rel.huber_mean(rd.from_pandas(df).repartition(6),
                         "g", "v", rounds=3).to_pandas()
    # replay: exact lower median + MAD scale, then 3 IRLS rounds
    c = np.rint(v * 100).astype("int64")
    n, s = float(len(c)), float(c.sum())
    kth = (len(c) + 1) // 2
    med = int(np.sort(c)[kth - 1])
    mad = int(np.sort(np.abs(c - med))[kth - 1])
    m = s / n
    ch = 1.345 * 1.4826 * float(mad)
    for _ in range(3):
        cf = c.astype("float64")
        ad = np.abs(cf - m)
        w = np.where(ad <= ch, 1.0, ch / ad)
        W = int(np.round(w * 1e6).astype("int64").sum())
        S = int(np.round(w * cf * 1e3).astype("int64").sum())
        m = float(S) * 1000.0 / float(W)
    assert abs(float(got["huber_mean"][0]) - round(m / 100.0, 6)) \
        < 1e-9
    assert abs(float(got["huber_mean"][0]) - 50.0) < 1.0
    assert float(got["mean"][0]) > 90.0   # the plain mean is dragged


def test_cuped_reduces_variance_on_correlated_pre_post(ray_session,
                                                       tmp_path):
    """With per-user pre/post spend strongly correlated, theta is
    near the OLS slope and rho2 (the variance-reduction fraction) is
    large; arm means replay a pure-pandas reference."""
    from crawler_service_ray.pipelines.queries import q_cuped

    rng = np.random.default_rng(5)
    rows = []
    base_day = 20000
    for u in range(400):
        level = rng.uniform(10, 200)
        for d in range(10):           # pre: days 0-4, post: days 5-9
            val = round(level + rng.normal(0, 3), 2)
            rows.append((np.datetime64((base_day + d)
                                       * 86_400_000_000, "us"),
                         u, float(val)))
    df = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_cuped(str(tmp_path))
    assert float(got["var_reduction"][0]) > 0.9
    day = df["ts"].values.astype("datetime64[us]").astype("int64") \
        // 86_400_000_000
    mid = (int(day.min()) + int(day.max()) + 1) // 2
    c = np.rint(df["value"].to_numpy() * 100).astype("int64")
    ud = pd.DataFrame({"u": df["user_id"], "x": np.where(day < mid, c, 0),
                       "y": np.where(day < mid, 0, c)})
    u = ud.groupby("u").agg(x=("x", "sum"), y=("y", "sum"))
    u["arm"] = u.index % 2
    for _, r in got.iterrows():
        g = u[u["arm"] == int(r["arm"])]
        assert int(r["n"]) == len(g)
        assert abs(float(r["raw_mean"])
                   - round(g["y"].mean() / 100.0, 6)) < 1e-6
    # the adjusted means move toward each other (pre-period balance)
    raw_gap = abs(got["raw_mean"][0] - got["raw_mean"][1])
    adj_gap = abs(got["cuped_mean"][0] - got["cuped_mean"][1])
    assert adj_gap <= raw_gap + 1e-9


def test_theil_index_known_distributions(ray_session, tmp_path):
    """Theil T is 0 for perfectly equal values and ln(n) in the
    one-has-everything limit; the query matches a numpy replay."""
    from crawler_service_ray.pipelines.queries import q_theil_index

    eq = pd.DataFrame({"o_orderstatus": ["E"] * 100,
                       "o_totalprice": [7.0] * 100})
    conc = pd.DataFrame({"o_orderstatus": ["C"] * 100,
                         "o_totalprice": [0.0] * 99 + [700.0]})
    pd.concat([eq, conc]).to_parquet(tmp_path / "orders.parquet")
    got = q_theil_index(str(tmp_path)).set_index("g")
    # per-group scaled terms: equal group's rows have r<1 -> negative
    # contributions; concentrated group's single earner dominates
    c = np.rint(pd.concat([eq, conc])["o_totalprice"].to_numpy()
                * 100).astype("int64").astype("float64")
    mu = c.sum() / len(c)
    r = c / mu
    t = np.where(c > 0, r * np.log(np.where(c > 0, r, 1.0)), 0.0)
    t_mi = np.round(t * 1e6).astype("int64")
    total_ref = round(float(t_mi.sum()) / 1e6 / len(c), 6)
    assert abs(float(got["theil_total"].iloc[0]) - total_ref) < 1e-9
    assert float(got.loc["C", "theil_within_scaled"]) > 1.0


def test_mmr_rerank_prefers_diversity(ray_session, tmp_path):
    """With two near-duplicate top-relevance vectors, plain cosine
    ranks them 1-2 but MMR demotes the duplicate in favor of a
    diverse mid-relevance vector."""
    from crawler_service_ray.pipelines.queries import q_mmr_rerank

    d = 8
    q = np.zeros(d, dtype="float32"); q[0] = 1.0
    a = np.zeros(d); a[0] = 0.707; a[1] = 0.707       # rel ~ .707
    b = a + np.array([0, 0.001] + [0] * (d - 2))      # near-dup of a
    c = np.zeros(d); c[0] = 0.707; c[1] = -0.707      # same rel, sim~0
    rows = [(0, q)]
    for i, v in enumerate([a, b, c] + [
            np.eye(d)[j] * 0.1 + np.random.default_rng(j).normal(
                0, 0.01, d) for j in range(3, d)]):
        rows.append((i + 1, np.asarray(v, dtype="float32")))
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [r[1].astype("float32")
                                     for r in rows]})
    df.to_parquet(tmp_path / "embeddings.parquet")
    got = q_mmr_rerank(str(tmp_path))
    assert int(got["vec_id"][0]) in (1, 2)     # top relevance first
    # the near-duplicate of the first pick must NOT be second
    dup = 2 if int(got["vec_id"][0]) == 1 else 1
    assert int(got["vec_id"][1]) == 3
    assert int(got["vec_id"][1]) != dup
    assert len(got) == 5 and got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_jaro_winkler_known_values():
    """Classic textbook pairs + DuckDB convention spot checks (the
    floored half-transposition and the 0.7 boost gate)."""
    assert abs(tx.jaro_winkler("martha", "marhta")
               - 0.9611111111111111) < 1e-12
    assert abs(tx.jaro_winkler("dwayne", "duane") - 0.84) < 1e-12
    assert tx.jaro_winkler("same", "same") == 1.0
    assert tx.jaro_winkler("", "x") == 0.0
    assert tx.jaro_winkler("abc", "xyz") == 0.0
    # below the 0.7 gate no prefix bonus applies even with a shared
    # prefix
    low = tx.jaro_winkler("abcdefghij", "abxxxxxxxx")
    assert low < 0.7
    j = (8 / 10 + 8 / 10 + 1) / 3  # hand value would exceed w/ bonus
    assert low != j + 2 * 0.1 * (1 - j)


def test_name_match_duckdb_cross_validation(ray_session):
    """Every surviving pair's score equals DuckDB's
    jaro_winkler_similarity exactly (the oracle gate asserts this at
    6 dp; here at 1e-12 on the raw kernel)."""
    import duckdb
    from crawler_service_ray.pipelines.queries import q_name_match

    got = q_name_match("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    for _, r in got.head(50).iterrows():
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                        [r["name_a"], r["name_b"]]).fetchone()[0]
        assert abs(round(d, 6) - float(r["jw"])) < 1e-9
        assert r["name_a"] < r["name_b"]
        assert r["name_a"][0] == r["name_b"][0]


def test_did_recovers_injected_effect(ray_session, tmp_path):
    """Synthetic panel with a known treatment lift: control grows by
    +10 pre->post, treatment by +10 plus a +5 effect; DiD = 5."""
    from crawler_service_ray.pipelines.queries import q_did

    rows = []
    base = 20000
    for u in range(200):
        arm = u % 2
        for d in range(10):
            post = d >= 5
            v = 50.0 + (10.0 if post else 0.0) \
                + (5.0 if (post and arm == 1) else 0.0)
            rows.append((np.datetime64((base + d) * 86_400_000_000,
                                       "us"), u, v))
    df = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_did(str(tmp_path))
    assert abs(float(got["did"][0]) - 5.0) < 1e-6
    assert abs(float(got["ctrl_post"][0])
               - float(got["ctrl_pre"][0]) - 10.0) < 1e-6


def test_feature_prop_flags_structural_price_outlier(ray_session,
                                                     tmp_path):
    """A clique of same-priced parts plus one overpriced member: the
    outlier gets the largest |smoothed - price| gap, and the smoothing
    replays a pandas two-round reference."""
    from crawler_service_ray.pipelines.queries import q_feature_prop

    # one order containing parts 1..6 makes a clique; part 6 costs 10x
    li = pd.DataFrame({
        "l_orderkey": [1] * 6 + [2] * 2,
        "l_partkey": [1, 2, 3, 4, 5, 6, 7, 8]})
    part = pd.DataFrame({
        "p_partkey": np.arange(1, 9, dtype="int64"),
        "p_retailprice": [10.0] * 5 + [100.0, 20.0, 20.0]})
    li.to_parquet(tmp_path / "lineitem.parquet")
    part.to_parquet(tmp_path / "part.parquet")
    got = q_feature_prop(str(tmp_path))
    assert int(got["p_partkey"][0]) == 6     # the 10x part leads
    assert float(got["gap"][0]) > float(got["gap"].iloc[-1])
    # two-round pandas replay for the top row
    ed = {i: [j for j in range(1, 7) if j != i] for i in range(1, 7)}
    ed[7] = [8]; ed[8] = [7]
    h0 = {i: int(p * 100) for i, p in
          zip(part["p_partkey"], part["p_retailprice"])}
    h1 = {i: int(round(sum(h0[j] for j in ns) * 1e6 / len(ns)))
          for i, ns in ed.items()}
    h2 = {i: int(round(sum(h1[j] for j in ns) * 1.0 / len(ns)))
          for i, ns in ed.items()}
    gap6 = abs(h2[6] - h0[6] * 1_000_000)
    assert abs(float(got["gap"][0]) - round(gap6 / 1e6 / 100.0, 6)) \
        < 1e-9


def test_curation_funnel_monotone_and_consistent(ray_session):
    """Stage counts are monotone non-increasing and agree with the
    independent pandas recomputation of each gate."""
    from crawler_service_ray.pipelines.queries import q_curation_funnel
    from crawler_service_ray.functions import text as T

    got = q_curation_funnel("/root/testdata/sf0.001")
    n, en, keep, uniq = (int(got[c][0]) for c in
                         ("n_total", "n_lang", "n_quality",
                          "n_unique"))
    assert n >= en >= keep >= uniq > 0
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    q = T.quality_features(docs)
    lang = T.LangId()(docs)
    en_ref = (lang["lang_pred"].to_numpy() == "en")
    keep_ref = en_ref & (q["quality_score"].to_numpy() >= 0.5)
    assert en == int(en_ref.sum())
    assert keep == int(keep_ref.sum())
    assert uniq == docs.loc[keep_ref, "text"].nunique()
    assert abs(float(got["retention"][0]) - round(uniq / n, 6)) < 1e-9


def test_source_ablation_identity(ray_session):
    """LOO means recombine to the overall mean: sum over sources of
    (N-n_g)*loo_g equals (k-1)*S in micro units; deltas sum to ~0
    weighted by the complements."""
    from crawler_service_ray.pipelines.queries import q_source_ablation
    from crawler_service_ray.functions import text as T

    got = q_source_ablation("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "source", "text"])
    q = T.quality_features(docs)
    mi = np.round(q["quality_score"].to_numpy() * 1e6).astype("int64")
    d = pd.DataFrame({"source": docs["source"], "s": mi})
    a = d.groupby("source").agg(n=("s", "count"), s=("s", "sum"))
    S, N = float(a["s"].sum()), float(a["n"].sum())
    for _, r in got.iterrows():
        g = a.loc[r["source"]]
        ref = (S - float(g["s"])) / (N - float(g["n"])) / 1e6
        assert abs(float(r["loo_mean_quality"]) - round(ref, 6)) < 1e-9
        assert int(r["n_docs"]) == int(g["n"])
    # a below-average source must have positive delta (dropping it
    # raises the mean) and vice versa
    overall = S / N / 1e6
    for _, r in got.iterrows():
        g = a.loc[r["source"]]
        gmean = float(g["s"]) / float(g["n"]) / 1e6
        if gmean < overall - 1e-9:
            assert float(r["delta"]) > -1e-9


def test_shapley_attribution_axioms(ray_session, tmp_path):
    """Shapley axioms on a constructed game: efficiency (shares sum
    to v(N)), symmetry (identical channels split equally), and a
    null player gets zero."""
    from crawler_service_ray.pipelines.queries import (
        q_shapley_attribution)

    rows, eid = [], 0
    # 30 users touch view+click and convert; 10 touch only signup and
    # never convert (null player); 5 convert with view only
    for u in range(30):
        rows += [(u, "view"), (u, "click"), (u, "purchase")]
    for u in range(30, 40):
        rows += [(u, "signup")]
    for u in range(40, 45):
        rows += [(u, "view"), (u, "purchase")]
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_shapley_attribution(str(tmp_path)).set_index("channel")
    assert int(got["total_conversions"].iloc[0]) == 35
    assert int(got["shapley_sixths"].sum()) == 35 * 6  # efficiency
    assert float(got.loc["signup", "shapley"]) == 0.0  # null player
    # view dominates click (it alone converts 5 extra users)
    assert float(got.loc["view", "shapley"]) \
        > float(got.loc["click", "shapley"])


def test_zonemap_prune_zorder_beats_natural(ray_session):
    """The zordered layout scans a strictly smaller file fraction
    than the natural layout on BOTH predicates (the point of the
    audit), and counts are bounded by n_files."""
    from crawler_service_ray.pipelines.queries import q_zonemap_prune

    got = q_zonemap_prune("/root/testdata/sf0.001") \
        .set_index("layout")
    for lay in ("natural", "zorder"):
        r = got.loc[lay]
        assert 0 <= int(r["scan_price"]) <= int(r["n_files"])
        assert 0 <= int(r["scan_date"]) <= int(r["n_files"])
    assert float(got.loc["zorder", "frac_price"]) \
        < float(got.loc["natural", "frac_price"])
    assert float(got.loc["zorder", "frac_date"]) \
        < float(got.loc["natural", "frac_date"])


def test_ips_eval_uniform_logging_identity(ray_session, tmp_path):
    """Under uniform logging (every user has one event of each type),
    SNIPS of 'always click' equals the mean click reward exactly —
    the estimator is unbiased by construction."""
    from crawler_service_ray.pipelines.queries import q_ips_eval

    rows, eid = [], 0
    rng = np.random.default_rng(8)
    click_vals = []
    for u in range(100):
        for t in ("view", "click", "purchase", "signup"):
            v = round(float(rng.uniform(1, 99)), 2)
            if t == "click":
                click_vals.append(round(v * 100) / 100)
            rows.append((u, t, v))
    df = pd.DataFrame(rows, columns=["user_id", "event_type",
                                     "value"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_ips_eval(str(tmp_path))
    # per-user weight = 4; SNIPS = sum(4*r)/sum(4) = mean(r)
    ref = np.mean([int(round(v * 100)) * 4 for v in click_vals]) / 4
    assert abs(float(got["snips"][0]) - round(ref / 100.0, 6)) < 1e-4
    assert int(got["matched_users"][0]) == 100
    # IPS = SNIPS * (matched weight / total events) = mean * (400/400)
    assert abs(float(got["ips"][0]) - float(got["snips"][0])) < 1e-9


def test_conformal_coverage_guarantee(ray_session):
    """Split-conformal coverage on the eval half is >= ~0.9 (the
    marginal guarantee) and q_hat is the exact calibration order
    statistic."""
    from crawler_service_ray.pipelines.queries import q_conformal
    from crawler_service_ray.pipelines.queries import read_table  # noqa

    got = q_conformal("/root/testdata/sf0.001")
    assert float(got["coverage"][0]) >= 0.88
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "event_type", "value"])
    c = np.rint(ev["value"].to_numpy() * 100).astype("int64")
    cal = ev["event_id"].to_numpy() % 2 == 0
    mu = (pd.DataFrame({"g": ev["event_type"], "c": c})[cal]
          .groupby("g")["c"].agg(["sum", "count"]))
    mum = {g: r["sum"] / r["count"] for g, r in mu.iterrows()}
    m = ev["event_type"].map(mum).to_numpy()
    r = np.round(np.abs(c - m)).astype("int64")
    rc = np.sort(r[cal])
    k = int(np.ceil((len(rc) + 1) * 0.9))
    qref = int(rc[min(k, len(rc)) - 1])
    assert abs(float(got["q_hat"][0]) - round(qref / 100.0, 6)) < 1e-9


def test_power_analysis_closed_form(ray_session, tmp_path):
    """Known rates 10% vs 15%: the textbook two-proportion formula
    gives ~686 per arm; the query reproduces it from constructed
    events."""
    from crawler_service_ray.pipelines.queries import q_power_analysis

    rows = []
    for i in range(2000):
        arm = i % 2
        thresh = 100 if arm == 0 else 150   # 10% vs 15% per mille
        is_p = (i // 2) % 1000 < thresh
        rows.append((i, "purchase" if is_p else "view"))
    df = pd.DataFrame(rows, columns=["event_id", "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_power_analysis(str(tmp_path))
    assert abs(float(got["p0"][0]) - 0.1) < 1e-9
    assert abs(float(got["p1"][0]) - 0.15) < 1e-9
    n = int(got["n_required_per_arm"][0])
    assert 650 <= n <= 700      # textbook ~686


def test_markov_attribution_hand_chain(ray_session, tmp_path):
    """A constructed two-path funnel: all conversions flow through
    click, so click's removal effect is 1.0; view feeds click and
    has the same removal effect on this chain; signup never appears
    on a converting path (removal effect 0)."""
    from crawler_service_ray.pipelines.queries import (
        q_markov_attribution)

    rows, t = [], 0

    def ev(u, typ):
        nonlocal t
        t += 1
        rows.append((u, np.datetime64(1_700_000_000_000_000 + t * 60,
                                      "us"), t, typ))

    for u in range(20):           # view -> click -> purchase
        ev(u, "view"); ev(u, "click"); ev(u, "purchase")
    for u in range(20, 30):       # view -> signup -> (end)
        ev(u, "view"); ev(u, "signup")
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_markov_attribution(str(tmp_path)).set_index("channel")
    assert abs(float(got.loc["click", "removal_effect"]) - 1.0) < 1e-6
    assert abs(float(got.loc["view", "removal_effect"]) - 1.0) < 1e-6
    assert abs(float(got.loc["signup", "removal_effect"])) < 1e-6
    # full-chain conversion: 20 of 30 journeys convert
    assert abs(float(got["p_conv_full"].iloc[0]) - 20 / 30) < 1e-6


def test_sequential_test_flat_vs_injected_effect(ray_session,
                                                 tmp_path):
    """A/A data never crosses the OBF boundary at any look; a huge
    late-onset effect triggers a rejection at the looks that include
    it, never before."""
    from crawler_service_ray.pipelines.queries import q_sequential_test

    rows, eid = [], 0
    base = 20000
    for d in range(10):
        for i in range(400):
            arm = eid % 2
            # flat 10% in both arms, but arm1 jumps to 60% on the
            # last 4 days (looks 4-5)
            r = (i * 2654435761 % 100)
            rate = 60 if (arm == 1 and d >= 6) else 10
            typ = "purchase" if r < rate else "view"
            rows.append((eid,
                         np.datetime64((base + d) * 86_400_000_000,
                                       "us"), typ))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_sequential_test(str(tmp_path))
    assert got["look"].tolist() == [1, 2, 3, 4, 5]
    assert int(got["reject"].iloc[0]) == 0    # no effect yet at look 1
    assert int(got["reject"].iloc[4]) == 1    # detected by the end
    assert got["n_cum"].is_monotonic_increasing


def test_interarrival_fit_exact_exponential_grid(ray_session,
                                                 tmp_path):
    """Gaps drawn from a geometric (discrete exponential) grid give a
    small KS D; a constant-gap (deterministic) stream gives a large
    one — the statistic separates Poisson-like from clocked traffic."""
    from crawler_service_ray.pipelines.queries import q_interarrival_fit

    rng = np.random.default_rng(12)

    def build(gaps, path):
        rows, t, eid = [], 1_700_000_000_000_000, 0
        for u, gs in enumerate(gaps):
            t_u = t
            for g in gs:
                t_u += int(g) * 1_000_000
                rows.append((u, np.datetime64(t_u, "us"), eid))
                eid += 1
        df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
        df.to_parquet(path / "events.parquet")

    import pathlib
    p1 = pathlib.Path(tmp_path) / "exp"; p1.mkdir()
    p2 = pathlib.Path(tmp_path) / "det"; p2.mkdir()
    build([1 + rng.geometric(1 / 60, 50) for _ in range(40)], p1)
    build([np.full(50, 60) for _ in range(40)], p2)
    d_exp = float(q_interarrival_fit(str(p1))["ks_d"][0])
    d_det = float(q_interarrival_fit(str(p2))["ks_d"][0])
    assert d_exp < 0.1
    assert d_det > 0.3
    got = q_interarrival_fit(str(p1))
    assert int(got["n_gaps"][0]) == 40 * 49


def test_token_budget_pack_greedy_reference(ray_session):
    """The selection replays an explicit sorted-greedy loop over the
    whole corpus and respects the budget exactly."""
    from crawler_service_ray.pipelines.queries import (
        q_token_budget_pack)
    from crawler_service_ray.functions import text as T

    got = q_token_budget_pack("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    q = T.quality_features(docs)
    qm = np.round(q["quality_score"].to_numpy() * 1e6).astype("int64")
    tok = np.maximum(q["n_words"].to_numpy().astype("int64"), 1)
    r = np.round(qm.astype("float64") * 1e3 / tok).astype("int64")
    d = pd.DataFrame({"doc_id": docs["doc_id"], "r": r, "tok": tok,
                      "qm": qm}).sort_values(
        ["r", "doc_id"], ascending=[False, True])
    cum = n = qs = 0
    for _, row in d.iterrows():
        if cum + int(row["tok"]) > 50_000:
            break
        cum += int(row["tok"]); n += 1; qs += int(row["qm"])
    assert int(got["tokens_used"][0]) == cum <= 50_000
    assert int(got["n_selected"][0]) == n
    assert abs(float(got["mean_quality"][0])
               - round(qs / 1e6 / n, 6)) < 1e-9
    # density order means selected mean quality beats corpus mean
    assert float(got["mean_quality"][0]) \
        >= float(np.mean(qm) / 1e6) - 0.05


def test_coreset_kcenter_greedy_reference(ray_session):
    """The 8 centers replay an explicit numpy farthest-point loop and
    the selected radii are non-increasing (the Gonzalez invariant)."""
    from crawler_service_ray.pipelines.queries import q_coreset_kcenter

    got = q_coreset_kcenter("/root/testdata/sf0.001")
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True),
                       1e-12)
    ids = emb["vec_id"].to_numpy()
    centers = [int(np.flatnonzero(ids == 0)[0])]
    sel = [(1, 0, 0.0)]
    for rk in range(2, 9):
        dist = 1.0 - E @ E[centers].T
        md = dist.min(axis=1)
        md[centers] = -1.0
        order = np.lexsort((ids, -md))
        j = order[0]
        centers.append(j)
        sel.append((rk, int(ids[j]), float(md[j])))
    assert got["vec_id"].tolist() == [v for _, v, _ in sel]
    radii = got["dist"].to_numpy()[1:]
    assert (np.diff(radii) <= 1e-9).all()   # non-increasing


def test_phi_polynomial_accuracy():
    """The shared A&S normal-CDF polynomial is within 1e-7 of the
    exact CDF (checked against math.erf)."""
    import math
    from crawler_service_ray.pipelines.queries import _phi_upper

    for x in (0.0, 0.5, 1.0, 1.645, 1.96, 2.576, 3.5, 5.0):
        exact = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
        assert abs(_phi_upper(x) - exact) < 1e-7


def test_bh_fdr_procedure(ray_session, tmp_path):
    """One planted outlier brand among flat brands: exactly that
    brand is rejected; under the global null nothing usually is (BH
    controls FDR)."""
    from crawler_service_ray.pipelines.queries import q_bh_fdr

    rng = np.random.default_rng(77)
    rows = []
    # 25 brands: the planted +15 is large for its own test but its
    # dilution of everyone else's "rest" mean (15/25 = 0.6) stays
    # well under their noise floor
    for b in range(25):
        mu = 100.0 + (15.0 if b == 3 else 0.0)
        for i in range(200):
            rows.append((f"B{b:02d}",
                         round(float(rng.normal(mu, 10)), 2)))
    pd.DataFrame(rows, columns=["p_brand", "p_retailprice"]) \
        .to_parquet(tmp_path / "part.parquet")
    got = q_bh_fdr(str(tmp_path)).set_index("brand")
    assert int(got.loc["B03", "rejected"]) == 1
    others = got.drop(index="B03")
    assert int(others["rejected"].sum()) == 0
    assert float(got.loc["B03", "p"]) < 1e-6


def test_lognormal_fit_recovers_parameters(ray_session, tmp_path):
    """Lengths drawn exp(N(mu, sd)) give decile gaps near zero; a
    bimodal corpus shows a large tail gap."""
    from crawler_service_ray.pipelines.queries import q_lognormal_fit

    rng = np.random.default_rng(21)
    ln = rng.normal(6.0, 0.8, 5000)
    df = pd.DataFrame({"doc_id": np.arange(5000),
                       "n_chars": np.maximum(
                           np.exp(ln).astype("int64"), 1)})
    df.to_parquet(tmp_path / "documents.parquet")
    got = q_lognormal_fit(str(tmp_path))
    assert len(got) == 9
    assert float(np.abs(got["gap"].to_numpy()).max()) < 0.12
    # middle decile ~ mu
    assert abs(float(got.loc[got["decile"] == 5, "emp_ln"].iloc[0])
               - 6.0) < 0.1


def test_capture_recapture_unbiased_on_uniform(ray_session,
                                               tmp_path):
    """A known population with independent uniform capture halves:
    the Chapman estimate lands near truth, inside its own CI."""
    from crawler_service_ray.pipelines.queries import (
        q_capture_recapture)

    rng = np.random.default_rng(14)
    rows, eid = [], 0
    base = 20000
    for u in range(1000):                # true population = captured
        seen = False
        if rng.random() < 0.5:           # half captured early
            rows.append((u, np.datetime64(
                (base + int(rng.integers(0, 5)))
                * 86_400_000_000, "us"))); seen = True
        if rng.random() < 0.5:           # half captured late
            rows.append((u, np.datetime64(
                (base + 5 + int(rng.integers(0, 5)))
                * 86_400_000_000, "us"))); seen = True
        if not seen:                     # unseen by both: invisible
            pass
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_capture_recapture(str(tmp_path))
    nhat = float(got["n_hat"][0])
    assert 850 <= nhat <= 1150           # near the true 1000
    assert float(got["ci_lo"][0]) <= nhat <= float(got["ci_hi"][0])
    # the observed distinct count misses the never-captured quarter
    assert int(got["true_n"][0]) < 1000


def test_chao1_mass_balance_and_singleton_logic(ray_session,
                                                tmp_path):
    """On a constructed corpus with known frequency-of-frequency
    profile, F1/F2/vocab/chao1 are exact."""
    from crawler_service_ray.pipelines.queries import q_chao1

    # 10 words once, 4 words twice, 2 words five times
    words = [f"s{i}" for i in range(10)] \
        + [w for i in range(4) for w in [f"d{i}"] * 2] \
        + [w for i in range(2) for w in [f"p{i}"] * 5]
    docs = pd.DataFrame({"text": [" ".join(words)]})
    docs.to_parquet(tmp_path / "documents.parquet")
    got = q_chao1(str(tmp_path))
    assert int(got["vocab"][0]) == 16
    assert int(got["f1"][0]) == 10
    assert int(got["f2"][0]) == 4
    assert int(got["n_tokens"][0]) == 10 + 8 + 10
    chao_ref = 16 + 10 * 9 / (2 * 5)
    assert abs(float(got["chao1"][0]) - chao_ref) < 1e-9
    assert abs(float(got["coverage"][0]) - (1 - 10 / 28)) < 1e-6


def test_diameter_sweep_python_bfs_replay(ray_session):
    """Both sweeps replay a python BFS on the identically-thinned
    graph; the double-sweep bound dominates the first eccentricity."""
    from collections import deque
    from crawler_service_ray.pipelines.queries import q_diameter_sweep

    got = q_diameter_sweep("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pairs = (li.merge(li, on="l_orderkey")
             .query("l_partkey_x < l_partkey_y")
             [["l_partkey_x", "l_partkey_y"]].drop_duplicates())
    pairs = pairs[(pairs["l_partkey_x"] * 31
                   + pairs["l_partkey_y"]) % 7 == 0]
    adj = {}
    for a, b in pairs.itertuples(index=False):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))

    def bfs(s):
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        dm = max(dist.values())
        far = min(k for k, v in dist.items() if v == dm)
        return dm, far

    start = min(adj)
    assert int(got["start"][0]) == start
    e1, u = bfs(start)
    assert int(got["peripheral_u"][0]) == u
    diam, v = bfs(u)
    assert int(got["diameter_lb"][0]) == diam
    assert int(got["peripheral_v"][0]) == v
    assert diam >= e1


def test_spc_chart_flags_planted_spike(ray_session, tmp_path):
    """A planted 50%-error day is flagged out-of-control; quiet days
    are not; limits bracket the grand mean."""
    from crawler_service_ray.pipelines.queries import q_spc_chart

    rows = []
    base = 20000
    for d in range(20):
        for i in range(500):
            bad = (i % 2 == 0) if d == 7 else (i % 50 == 0)
            rows.append((np.datetime64((base + d) * 86_400_000_000,
                                       "us"),
                         "error" if bad else "view"))
    pd.DataFrame(rows, columns=["ts", "event_type"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_spc_chart(str(tmp_path)).set_index("day")
    assert int(got.loc[base + 7, "out_of_control"]) == 1
    quiet = got.drop(index=base + 7)
    assert int(quiet["out_of_control"].sum()) == 0
    assert (got["lcl"] <= got["ucl"]).all()


def test_rbo_identity_and_disjoint(ray_session, tmp_path):
    """RBO of a ranking with itself is the truncated-geometric
    maximum; price vs hash order on random data is near zero; both
    limits replay the closed form."""
    from crawler_service_ray.pipelines.queries import q_rbo

    # identical orders: make the hash order equal the price order by
    # choosing prices that INCREASE with the knuth hash
    ids = np.arange(1, 201, dtype="int64")
    h = ((ids.astype(np.uint64) % np.uint64(4294967296))
         * np.uint64(2654435761)) % np.uint64(4294967296)
    order = np.argsort(h, kind="stable")
    prices = np.empty(200)
    # the hash-smallest id gets the HIGHEST price
    prices[order] = np.linspace(500.0, 100.0, 200)
    pd.DataFrame({"p_partkey": ids,
                  "p_retailprice": np.round(prices, 2)}) \
        .to_parquet(tmp_path / "part.parquet")
    got = q_rbo(str(tmp_path))
    micro = 0
    for d in range(1, 51):
        micro += int(round(0.1 * 0.9 ** (d - 1) * d / d * 1e9))
    assert abs(float(got["rbo"][0]) - round(micro / 1e9, 6)) < 1e-9
    assert int(got["overlap_at_depth"][0]) == 50


def test_markov_entropy_deterministic_vs_uniform(ray_session,
                                                 tmp_path):
    """A deterministic cycle has entropy rate 0; a uniform 2-state
    coin has ln 2."""
    from crawler_service_ray.pipelines.queries import q_markov_entropy

    rows, t, eid = [], 1_700_000_000_000_000, 0
    # user 0: deterministic view->click->view->click...
    for i in range(400):
        rows.append((0, np.datetime64(t + i * 1_000_000, "us"), i,
                     "view" if i % 2 == 0 else "click"))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_markov_entropy(str(tmp_path))
    assert abs(float(got["entropy_rate_nats"][0])) < 1e-9
    assert int(got["n_states"][0]) == 2

    # uniform coin: balanced 2-state chain with all 4 transitions
    # equally frequent -> H = ln 2
    import pathlib
    p2 = pathlib.Path(tmp_path) / "u"; p2.mkdir()
    seq = []
    pat = ["view", "view", "click", "click"]  # vv,vc,cc,cv equal
    for i in range(401):
        seq.append(pat[i % 4])
    rows = [(0, np.datetime64(t + i * 1_000_000, "us"), i, s)
            for i, s in enumerate(seq)]
    pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                "event_type"]) \
        .to_parquet(p2 / "events.parquet")
    got2 = q_markov_entropy(str(p2))
    assert abs(float(got2["entropy_rate_nats"][0]) - np.log(2)) < 1e-2


def test_isotonic_minimax_equals_pava(ray_session, tmp_path):
    """The minimax closed form equals a hand PAVA on a constructed
    violation pattern, and the fit is monotone with pooled averages
    preserving mass."""
    from crawler_service_ray.pipelines.queries import q_isotonic

    # rates by bin: .1 .3 .2 .2 .5  -> PAVA pools bins 1-3 to 7/30
    spec = [(0, 100, 10), (1, 100, 30), (2, 100, 20),
            (3, 100, 20), (4, 100, 50)]
    rows = []
    for b, n, k in spec:
        for i in range(n):
            rows.append((b * 100.0 + 50.0,
                         "purchase" if i < k else "view"))
    pd.DataFrame(rows, columns=["value", "event_type"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_isotonic(str(tmp_path))
    iso = got["iso_rate"].to_numpy()
    assert (np.diff(iso) >= -1e-9).all()          # monotone
    assert abs(iso[0] - 0.1) < 1e-9
    for i in (1, 2, 3):
        assert abs(iso[i] - 70 / 300) < 1e-6      # pooled 30+20+20
    assert abs(iso[4] - 0.5) < 1e-9
    # weighted mass preserved
    n = got["n"].to_numpy(dtype="float64")
    assert abs((iso * n).sum() - (got["raw_rate"].to_numpy() * n)
               .sum()) < 1e-3


def test_durbin_watson_separates_noise_from_ar(ray_session,
                                               tmp_path):
    """White-noise daily revenue gives DW near 2; a strongly
    autocorrelated (slow sine) series gives DW near 0."""
    from crawler_service_ray.pipelines.queries import q_durbin_watson
    import pathlib

    rng = np.random.default_rng(9)
    base = 20000

    def build(vals, p):
        rows = []
        for d, v in enumerate(vals):
            # several events per day summing to the daily target
            rows.append((np.datetime64((base + d) * 86_400_000_000,
                                       "us"), float(v)))
        pd.DataFrame(rows, columns=["ts", "value"]) \
            .to_parquet(p / "events.parquet")

    p1 = pathlib.Path(tmp_path) / "wn"; p1.mkdir()
    build(np.round(100 + rng.normal(0, 10, 60), 2), p1)
    p2 = pathlib.Path(tmp_path) / "ar"; p2.mkdir()
    build(np.round(100 + 50 * np.sin(np.arange(60) / 9.0), 2), p2)
    dw_wn = float(q_durbin_watson(str(p1))["dw"][0])
    dw_ar = float(q_durbin_watson(str(p2))["dw"][0])
    assert 1.4 < dw_wn < 2.6
    assert dw_ar < 0.5


def test_breusch_pagan_detects_planted_heteroskedasticity(
        ray_session, tmp_path):
    """Residual variance growing with x gives a large LM; constant
    variance gives a small one."""
    from crawler_service_ray.pipelines.queries import q_breusch_pagan
    import pathlib

    rng = np.random.default_rng(4)
    x = rng.integers(1, 51, 4000)

    def build(noise_scale, p):
        y = 100.0 * x + rng.normal(0, noise_scale, len(x))
        pd.DataFrame({"l_quantity": x.astype("float64"),
                      "l_extendedprice": np.round(y / 100.0, 2)}) \
            .to_parquet(p / "lineitem.parquet")

    p1 = pathlib.Path(tmp_path) / "het"; p1.mkdir()
    build(5.0 * x, p1)                  # sd grows with x
    p2 = pathlib.Path(tmp_path) / "hom"; p2.mkdir()
    build(np.full(len(x), 100.0), p2)   # constant sd
    lm_het = float(q_breusch_pagan(str(p1))["bp_lm"][0])
    lm_hom = float(q_breusch_pagan(str(p2))["bp_lm"][0])
    assert lm_het > 100.0
    assert lm_hom < 15.0


def test_logrank_null_and_separated(ray_session, tmp_path):
    """Identical arms give chi2 near 0; a strongly earlier-converting
    arm gives a large chi2 (lifelines-free construction)."""
    from crawler_service_ray.pipelines.queries import q_logrank
    import pathlib

    base_us = 1_700_000_000_000_000
    day = 86_400_000_000

    def build(offsets_by_arm, p):
        rows, eid = [], 0
        for u in range(400):
            arm = u % 2
            rows.append((u, np.datetime64(base_us, "us"), "view"))
            off = offsets_by_arm[arm](u)
            if off is not None:
                rows.append((u, np.datetime64(
                    base_us + off * day, "us"), "purchase"))
            else:                     # censored at a later view
                rows.append((u, np.datetime64(
                    base_us + 30 * day, "us"), "view"))
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]) \
            .to_parquet(p / "events.parquet")

    p1 = pathlib.Path(tmp_path) / "null"; p1.mkdir()
    same = lambda u: (u // 2) % 10 + 1   # same duration profile
    build({0: same, 1: same}, p1)
    got_null = q_logrank(str(p1))
    assert float(got_null["logrank_chi2"][0]) < 0.5

    p2 = pathlib.Path(tmp_path) / "sep"; p2.mkdir()
    build({0: lambda u: (u // 2) % 10 + 15,    # late converters
           1: lambda u: (u // 2) % 5 + 1}, p2)  # early converters
    got_sep = q_logrank(str(p2))
    assert float(got_sep["logrank_chi2"][0]) > 50.0
    assert int(got_sep["n_arm0"][0]) == 200


def test_burrows_delta_identifies_style_twins(ray_session, tmp_path):
    """Two sources sharing a word-frequency profile have near-zero
    delta and surface as the closest pair; a divergent source does
    not."""
    from crawler_service_ray.pipelines.queries import q_burrows_delta

    rng = np.random.default_rng(2)
    vocab_a = (["the", "of", "and"] * 10 + ["alpha", "beta"] * 3)
    vocab_c = (["zig", "zag", "zog"] * 10 + ["the"] * 2)
    docs = []
    for s, vocab in (("twin1", vocab_a), ("twin2", vocab_a),
                     ("odd", vocab_c)):
        for i in range(20):
            ws = list(rng.permutation(vocab))
            docs.append((s, " ".join(ws)))
    pd.DataFrame(docs, columns=["source", "text"]) \
        .to_parquet(tmp_path / "documents.parquet")
    got = q_burrows_delta(str(tmp_path))
    assert got["src_a"].iloc[0] == "twin1"
    assert got["src_b"].iloc[0] == "twin2"
    assert float(got["delta"].iloc[0]) < 0.05
    # every pair involving `odd` is far
    rest = got.iloc[1:]
    for _, r in rest.iterrows():
        assert float(r["delta"]) > float(got["delta"].iloc[0])


def test_holt_winters_tracks_trend_plus_seasonality(ray_session,
                                                    tmp_path):
    """On exact trend+weekly data the 7-day forecast continues the
    pattern almost perfectly."""
    from crawler_service_ray.pipelines.queries import q_holt_winters

    base = 20000
    season = [30.0, -20.0, 5.0, 10.0, -15.0, 0.0, -10.0]
    rows = []
    for d in range(35):
        v = 200.0 + 2.0 * d + season[(d + (base + 4)) % 7 - 0]
        # one event per day carrying the day's revenue
        rows.append((np.datetime64((base + d) * 86_400_000_000,
                                   "us"), round(v, 2)))
    pd.DataFrame(rows, columns=["ts", "value"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_holt_winters(str(tmp_path))
    assert len(got) == 7
    for _, r in got.iterrows():
        d = 35 + int(r["h"]) - 1
        truth = 200.0 + 2.0 * d + season[(d + (base + 4)) % 7]
        assert abs(float(r["forecast"]) - truth) < 12.0


def test_rich_club_star_vs_clique(ray_session):
    """phi is monotone-ish toward hubs on the real thinned graph and
    every count is internally consistent (E_k <= total edges,
    N_k decreasing in k)."""
    from crawler_service_ray.pipelines.queries import q_rich_club

    got = q_rich_club("/root/testdata/sf0.001")
    assert got["k"].tolist() == [1, 2, 3, 4]
    n = got["n_nodes"].to_numpy()
    assert (np.diff(n) <= 0).all()
    e = got["n_edges"].to_numpy()
    assert (np.diff(e) <= 0).all()
    phi = got["phi"].to_numpy(dtype="float64")
    ok = ~np.isnan(phi)
    assert (phi[ok] >= 0).all() and (phi[ok] <= 1.0 + 1e-9).all()


def test_gumbel_maxima_recovers_location_scale(ray_session,
                                               tmp_path):
    """Daily maxima drawn from a known Gumbel(mu=500, beta=40) give
    estimates near truth and a sane 30-day return level."""
    from crawler_service_ray.pipelines.queries import q_gumbel_maxima

    rng = np.random.default_rng(11)
    base = 20000
    rows = []
    for d in range(300):
        mx = 500.0 - 40.0 * np.log(-np.log(rng.random()))
        rows.append((np.datetime64((base + d) * 86_400_000_000,
                                   "us"), round(float(mx), 2)))
        # a smaller same-day event that must not matter
        rows.append((np.datetime64((base + d) * 86_400_000_000 + 7,
                                   "us"), 1.0))
    pd.DataFrame(rows, columns=["ts", "value"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_gumbel_maxima(str(tmp_path))
    assert abs(float(got["gumbel_mu"][0]) - 500.0) < 20.0
    assert abs(float(got["gumbel_beta"][0]) - 40.0) < 10.0
    lvl = float(got["return_30d"][0])
    assert lvl > float(got["gumbel_mu"][0])   # above the mode
    # closed-form check of the return level from the fitted params
    ref = (float(got["gumbel_mu"][0])
           - float(got["gumbel_beta"][0])
           * np.log(-np.log(1 - 1 / 30)))
    assert abs(lvl - ref) < 1e-4


def test_partial_corr_removes_confounder(ray_session, tmp_path):
    """y = 10x + 5z + noise with x ⟂ z: partial r(x,y|z) stays high
    while r(y,z) is substantial; on y = 5z only (x irrelevant),
    partial r(x,y|z) collapses toward 0."""
    from crawler_service_ray.pipelines.queries import q_partial_corr
    import pathlib

    rng = np.random.default_rng(3)
    x = rng.integers(1, 51, 3000).astype(float)
    z = np.round(rng.uniform(0, 0.1, 3000), 4)

    def build(y, p):
        pd.DataFrame({"l_quantity": x,
                      "l_extendedprice": np.round(y, 2),
                      "l_discount": z}).to_parquet(
            p / "lineitem.parquet")

    p1 = pathlib.Path(tmp_path) / "a"; p1.mkdir()
    build(10 * x + 5000 * z + rng.normal(0, 20, 3000), p1)
    g1 = q_partial_corr(str(p1))
    assert float(g1["partial_r"][0]) > 0.8
    p2 = pathlib.Path(tmp_path) / "b"; p2.mkdir()
    build(5000 * z + rng.normal(0, 20, 3000), p2)
    g2 = q_partial_corr(str(p2))
    assert abs(float(g2["partial_r"][0])) < 0.1


def test_james_stein_shrinks_toward_grand(ray_session):
    """0 <= c <= 1; every shrunk mean lies between its raw mean and
    the grand mean; extreme raw means move the most."""
    from crawler_service_ray.pipelines.queries import q_james_stein

    got = q_james_stein("/root/testdata/sf0.001")
    c = float(got["shrink_c"].iloc[0])
    assert 0.0 <= c <= 1.0
    n = got["n"].to_numpy(dtype="float64")
    raw = got["mean"].to_numpy()
    grand = float((raw * n).sum() / n.sum())
    js = got["js_mean"].to_numpy()
    for i in range(len(got)):
        lo, hi = sorted((raw[i], grand))
        assert lo - 1e-6 <= js[i] <= hi + 1e-6


def test_meta_analysis_homogeneous_vs_heterogeneous(ray_session,
                                                    tmp_path):
    """Segments sharing one true slope give small Q and I2 ~ 0;
    segments with genuinely different slopes give I2 near 1 and a
    pooled slope between the extremes."""
    from crawler_service_ray.pipelines.queries import q_meta_analysis
    import pathlib

    rng = np.random.default_rng(6)

    def build(slopes, p):
        rows = []
        for s in range(8):
            for i in range(500):
                x = int(rng.integers(1, 51))
                y = slopes[s] * x + float(rng.normal(0, 30))
                rows.append((s, float(x), round(y, 2)))
        pd.DataFrame(rows, columns=["l_suppkey", "l_quantity",
                                    "l_extendedprice"]) \
            .to_parquet(p / "lineitem.parquet")

    p1 = pathlib.Path(tmp_path) / "hom"; p1.mkdir()
    build([20.0] * 8, p1)
    g1 = q_meta_analysis(str(p1))
    assert abs(float(g1["beta_fixed"][0]) - 20.0) < 0.5
    assert float(g1["i_squared"][0]) < 0.5

    p2 = pathlib.Path(tmp_path) / "het"; p2.mkdir()
    build([10.0 + 4.0 * s for s in range(8)], p2)
    g2 = q_meta_analysis(str(p2))
    assert float(g2["i_squared"][0]) > 0.9
    assert 10.0 < float(g2["beta_fixed"][0]) < 38.0


def test_rmst_known_survival(ray_session, tmp_path):
    """All arm-1 users purchase on day 3, arm-0 never (censored at
    day 30): RMST(14) is 3 for arm 1 (S=1 on days 0-2 -> 1+S(1)+S(2)
    = 3) and 14 for arm 0; diff = -11."""
    from crawler_service_ray.pipelines.queries import q_rmst

    base = 1_700_000_000_000_000
    day = 86_400_000_000
    rows = []
    for u in range(200):
        rows.append((u, np.datetime64(base, "us"), "view"))
        if u % 2 == 1:
            rows.append((u, np.datetime64(base + 2 * day, "us"),
                         "purchase"))   # duration day 3
        else:
            rows.append((u, np.datetime64(base + 29 * day, "us"),
                         "view"))       # censored late
    pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_rmst(str(tmp_path))
    assert abs(float(got["rmst0"][0]) - 14.0) < 1e-6
    assert abs(float(got["rmst1"][0]) - 3.0) < 1e-6
    assert abs(float(got["rmst_diff"][0]) + 11.0) < 1e-6


def test_price_index_uniform_inflation(ray_session, tmp_path):
    """A uniform 10% price rise between halves gives all three
    indexes = 1.1 exactly; stable prices give 1.0."""
    from crawler_service_ray.pipelines.queries import q_price_index
    import pathlib

    base = 20000
    day = 86_400_000_000

    def build(infl, p):
        rows = []
        for pk in range(50):
            unit = 10.0 + pk
            for per, d0 in ((0, 0), (1, 20)):
                price = unit * (infl if per == 1 else 1.0)
                for i in range(3):
                    q = 2 + (pk + i) % 4
                    rows.append((pk,
                                 np.datetime64((base + d0 + i)
                                               * day, "us"),
                                 float(q), round(price * q, 2)))
        pd.DataFrame(rows, columns=["l_partkey", "l_shipdate",
                                    "l_quantity",
                                    "l_extendedprice"]) \
            .to_parquet(p / "lineitem.parquet")

    p1 = pathlib.Path(tmp_path) / "i"; p1.mkdir()
    build(1.10, p1)
    g1 = q_price_index(str(p1))
    for c in ("laspeyres", "paasche", "fisher"):
        assert abs(float(g1[c][0]) - 1.1) < 1e-3
    p2 = pathlib.Path(tmp_path) / "s"; p2.mkdir()
    build(1.0, p2)
    g2 = q_price_index(str(p2))
    for c in ("laspeyres", "paasche", "fisher"):
        assert abs(float(g2[c][0]) - 1.0) < 1e-6


def test_adf_lite_random_walk_vs_mean_reverting(ray_session,
                                                tmp_path):
    """A pure random walk keeps DF near 0; strong mean reversion
    drives DF deeply negative."""
    from crawler_service_ray.pipelines.queries import q_adf_lite
    import pathlib

    rng = np.random.default_rng(13)
    base = 20000

    def build(vals, p):
        rows = [(np.datetime64((base + d) * 86_400_000_000, "us"),
                 round(float(v), 2)) for d, v in enumerate(vals)]
        pd.DataFrame(rows, columns=["ts", "value"]) \
            .to_parquet(p / "events.parquet")

    rw = np.cumsum(rng.normal(0, 5, 120)) + 500
    p1 = pathlib.Path(tmp_path) / "rw"; p1.mkdir()
    build(rw, p1)
    mr = 500 + rng.normal(0, 5, 120)    # iid about a level
    p2 = pathlib.Path(tmp_path) / "mr"; p2.mkdir()
    build(mr, p2)
    df_rw = float(q_adf_lite(str(p1))["df_stat"][0])
    df_mr = float(q_adf_lite(str(p2))["df_stat"][0])
    assert df_mr < -6.0
    assert df_rw > -3.0


def test_spectral_peak_weekly_vs_flat(ray_session, tmp_path):
    """A strong 7-day sinusoid concentrates power in the weekly bin;
    white noise leaves only a small share."""
    from crawler_service_ray.pipelines.queries import q_spectral_peak
    import pathlib

    rng = np.random.default_rng(17)
    base = 20000

    def build(vals, p):
        rows = [(np.datetime64((base + d) * 86_400_000_000, "us"),
                 round(float(v), 2)) for d, v in enumerate(vals)]
        pd.DataFrame(rows, columns=["ts", "value"]) \
            .to_parquet(p / "events.parquet")

    t = np.arange(140)
    p1 = pathlib.Path(tmp_path) / "w"; p1.mkdir()
    build(500 + 100 * np.sin(2 * np.pi * t / 7)
          + rng.normal(0, 5, 140), p1)
    p2 = pathlib.Path(tmp_path) / "f"; p2.mkdir()
    build(500 + rng.normal(0, 20, 140), p2)
    share_w = float(q_spectral_peak(str(p1))
                    ["weekly_power_share"][0])
    share_f = float(q_spectral_peak(str(p2))
                    ["weekly_power_share"][0])
    assert share_w > 0.4
    assert share_f < 0.1


def test_neyman_allocation_favors_variable_strata(ray_session,
                                                  tmp_path):
    """Equal-size strata with 10x different sigmas: the noisy stratum
    gets ~10x the allocation; total allocation is ~budget; the design
    gain exceeds 1."""
    from crawler_service_ray.pipelines.queries import (
        q_neyman_allocation)

    rng = np.random.default_rng(19)
    rows = []
    for g, sd in (("calm", 1.0), ("wild", 10.0)):
        for i in range(5000):
            rows.append((g, round(float(rng.normal(100, sd)), 2)))
    pd.DataFrame(rows, columns=["event_type", "value"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_neyman_allocation(str(tmp_path)).set_index("stratum")
    ratio = (float(got.loc["wild", "n_alloc"])
             / float(got.loc["calm", "n_alloc"]))
    assert 8.0 < ratio < 12.0
    assert abs(int(got["n_alloc"].sum()) - 10_000) <= 2
    assert float(got["design_gain"].iloc[0]) > 1.2


def test_qte_detects_upper_tail_shift(ray_session, tmp_path):
    """Arm 1 equals arm 0 except its top ~20% is doubled: lower-
    decile QTEs ~0, upper-decile QTEs large."""
    from crawler_service_ray.pipelines.queries import q_qte

    rng = np.random.default_rng(23)
    rows, eid = [], 0
    for i in range(20000):
        base = float(rng.uniform(10, 100))
        arm = eid % 2
        v = base
        if arm == 1 and base > 82:     # shift only the top tail
            v = base * 2
        rows.append((eid, round(v, 2))); eid += 1
    pd.DataFrame(rows, columns=["event_id", "value"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_qte(str(tmp_path)).set_index("decile")
    assert abs(float(got.loc[2, "qte"])) < 2.0
    assert abs(float(got.loc[5, "qte"])) < 2.0
    assert float(got.loc[9, "qte"]) > 30.0


def test_hurst_rs_separates_persistence(ray_session, tmp_path):
    """A trending (persistent) series gives H near 1; an alternating
    (anti-persistent) series gives H well below 0.5."""
    from crawler_service_ray.pipelines.queries import q_hurst_rs
    import pathlib

    base = 20000

    def build(vals, p):
        rows = [(np.datetime64((base + d) * 86_400_000_000, "us"),
                 round(float(v), 2)) for d, v in enumerate(vals)]
        pd.DataFrame(rows, columns=["ts", "value"]) \
            .to_parquet(p / "events.parquet")

    p1 = pathlib.Path(tmp_path) / "tr"; p1.mkdir()
    build(100 + 3.0 * np.arange(112), p1)            # pure trend
    p2 = pathlib.Path(tmp_path) / "al"; p2.mkdir()
    build(100 + 10.0 * (np.arange(112) % 2), p2)      # alternation
    h_tr = float(q_hurst_rs(str(p1))["hurst"][0])
    h_al = float(q_hurst_rs(str(p2))["hurst"][0])
    assert h_tr > 0.85
    assert h_al < 0.3


def test_ucb_replay_converges_to_best_arm(ray_session, tmp_path):
    """With one clearly dominant arm, UCB1 allocates the bulk of the
    pulls to it and the regret stays sublinear (far under always-
    pulling the worst)."""
    from crawler_service_ray.pipelines.queries import q_ucb_replay

    base = 20000
    rows = []
    means = {"click": 10.0, "error": 12.0, "purchase": 80.0,
             "signup": 11.0, "view": 9.0}
    for d in range(60):
        for g, m in means.items():
            # two events per (day, arm): deterministic mean m
            for v in (m - 1.0, m + 1.0):
                rows.append((np.datetime64(
                    (base + d) * 86_400_000_000 + len(rows), "us"),
                    g, float(v)))
    pd.DataFrame(rows, columns=["ts", "event_type", "value"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_ucb_replay(str(tmp_path)).set_index("arm")
    assert int(got["pulls"].sum()) == 60
    assert int(got.loc["purchase", "pulls"]) >= 40
    regret = float(got["regret"].iloc[0])
    worst_case = 60 * (80.0 - 9.0)
    assert 0.0 <= regret < 0.4 * worst_case


def test_journey_length_hand_chain(ray_session, tmp_path):
    """view->click->purchase chains: expected steps from view = 2,
    from click = 1; signup-only sessions absorb in 1 step."""
    from crawler_service_ray.pipelines.queries import q_journey_length

    rows, t = [], 0

    def ev(u, typ):
        nonlocal t
        t += 1
        rows.append((u, np.datetime64(1_700_000_000_000_000 + t * 60,
                                      "us"), t, typ))

    for u in range(20):
        ev(u, "view"); ev(u, "click"); ev(u, "purchase")
    for u in range(20, 30):
        ev(u, "signup")      # absorbs to null in one step
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    df.to_parquet(tmp_path / "events.parquet")
    got = q_journey_length(str(tmp_path)).set_index("channel")
    assert abs(float(got.loc["view", "expected_steps"]) - 2.0) < 1e-6
    assert abs(float(got.loc["click", "expected_steps"]) - 1.0) < 1e-6
    assert abs(float(got.loc["signup", "expected_steps"]) - 1.0) \
        < 1e-6
    # start mix: 20 views, 10 signups -> (20*2 + 10*1)/30
    assert abs(float(got["overall"].iloc[0]) - 50 / 30) < 1e-6


def test_reserve_price_step_demand(ray_session, tmp_path):
    """Three valuation levels (100x60, 200x30, 400x10): revenues are
    10000/9000/4000 -> optimal posted price is 100."""
    from crawler_service_ray.pipelines.queries import q_reserve_price

    vals = [100.0] * 60 + [200.0] * 30 + [400.0] * 10
    pd.DataFrame({"o_totalprice": vals}) \
        .to_parquet(tmp_path / "orders.parquet")
    got = q_reserve_price(str(tmp_path))
    assert abs(float(got["reserve"][0]) - 100.0) < 1e-9
    assert int(got["buyers"][0]) == 100
    assert abs(float(got["revenue"][0]) - 10000.0) < 1e-6


def test_gains_table_concentrated_signal(ray_session, tmp_path):
    """All purchases carry top values: the first decile captures
    everything (lift ~10); uniform mixing gives lift ~1."""
    from crawler_service_ray.pipelines.queries import q_gains_table
    import pathlib

    rng = np.random.default_rng(29)

    def build(concentrated, p):
        rows = []
        for i in range(5000):
            is_p = i % 10 == 0
            if concentrated:
                v = rng.uniform(900, 1000) if is_p \
                    else rng.uniform(0, 800)
            else:
                v = rng.uniform(0, 1000)
            rows.append(("purchase" if is_p else "view",
                         round(float(v), 2)))
        pd.DataFrame(rows, columns=["event_type", "value"]) \
            .to_parquet(p / "events.parquet")

    p1 = pathlib.Path(tmp_path) / "c"; p1.mkdir()
    build(True, p1)
    g1 = q_gains_table(str(p1)).set_index("decile")
    assert float(g1.loc[1, "capture"]) > 0.99
    assert float(g1.loc[1, "lift"]) > 9.0
    assert abs(float(g1.loc[10, "capture"]) - 1.0) < 1e-9
    p2 = pathlib.Path(tmp_path) / "u"; p2.mkdir()
    build(False, p2)
    g2 = q_gains_table(str(p2)).set_index("decile")
    assert 0.7 < float(g2.loc[1, "lift"]) < 1.4


def test_split_half_trait_vs_noise(ray_session, tmp_path):
    """Users with stable per-user spending levels give high
    reliability; iid spend across users gives near-zero."""
    from crawler_service_ray.pipelines.queries import q_split_half
    import pathlib

    rng = np.random.default_rng(31)

    def build(trait, p):
        rows, eid = [], 0
        for u in range(500):
            level = float(rng.uniform(10, 200)) if trait else 100.0
            for i in range(10):
                v = level + float(rng.normal(0, 5))
                rows.append((u, eid, round(v, 2))); eid += 1
        pd.DataFrame(rows, columns=["user_id", "event_id", "value"]) \
            .to_parquet(p / "events.parquet")

    p1 = pathlib.Path(tmp_path) / "t"; p1.mkdir()
    build(True, p1)
    g1 = q_split_half(str(p1))
    assert float(g1["spearman_brown"][0]) > 0.95
    p2 = pathlib.Path(tmp_path) / "n"; p2.mkdir()
    build(False, p2)
    g2 = q_split_half(str(p2))
    assert abs(float(g2["half_corr"][0])) < 0.2


def test_cohen_kappa_perfect_and_chance(ray_session, tmp_path):
    """Kappa is ~1 when labels are the langid prediction itself and
    ~0 when labels are assigned independently of the text."""
    from crawler_service_ray.pipelines.queries import q_cohen_kappa
    from crawler_service_ray.functions import text as T
    import pathlib

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(400)
    pred = T.LangId()(docs)["lang_pred"].to_numpy()

    p1 = pathlib.Path(tmp_path) / "perf"; p1.mkdir()
    docs.assign(lang=pred).to_parquet(p1 / "documents.parquet")
    g1 = q_cohen_kappa(str(p1))
    assert float(g1["kappa"][0]) > 0.999

    p2 = pathlib.Path(tmp_path) / "rand"; p2.mkdir()
    langs = np.array(["en", "es", "fr", "de", "zh"])
    docs.assign(lang=langs[np.arange(len(docs)) % 5]) \
        .to_parquet(p2 / "documents.parquet")
    g2 = q_cohen_kappa(str(p2))
    assert abs(float(g2["kappa"][0])) < 0.15


def test_srm_check_balanced_vs_skewed(ray_session, tmp_path):
    """Perfect parity split never flags; a 55/45 corruption does."""
    from crawler_service_ray.pipelines.queries import q_srm_check
    import pathlib

    p1 = pathlib.Path(tmp_path) / "ok"; p1.mkdir()
    pd.DataFrame({"event_id": np.arange(10000, dtype="int64")}) \
        .to_parquet(p1 / "events.parquet")
    g1 = q_srm_check(str(p1))
    assert int(g1["srm_flag"][0]) == 0
    assert float(g1["chi2"][0]) < 1e-9

    p2 = pathlib.Path(tmp_path) / "bad"; p2.mkdir()
    ids = np.concatenate([np.arange(0, 11000, 2),      # 5500 even
                          np.arange(1, 9000, 2)])      # 4500 odd
    pd.DataFrame({"event_id": ids.astype("int64")}) \
        .to_parquet(p2 / "events.parquet")
    g2 = q_srm_check(str(p2))
    assert int(g2["srm_flag"][0]) == 1


def test_tost_equivalent_vs_shifted(ray_session, tmp_path):
    """Identical arms conclude equivalence; a 5% shifted arm does
    not."""
    from crawler_service_ray.pipelines.queries import q_tost
    import pathlib

    rng = np.random.default_rng(37)

    def build(shift, p):
        rows = []
        for i in range(20000):
            v = float(rng.normal(100, 10))
            if i % 2 == 1:
                v *= (1.0 + shift)
            rows.append((i, round(v, 2)))
        pd.DataFrame(rows, columns=["event_id", "value"]) \
            .to_parquet(p / "events.parquet")

    p1 = pathlib.Path(tmp_path) / "eq"; p1.mkdir()
    build(0.0, p1)
    assert int(q_tost(str(p1))["equivalent"][0]) == 1
    p2 = pathlib.Path(tmp_path) / "sh"; p2.mkdir()
    build(0.05, p2)
    assert int(q_tost(str(p2))["equivalent"][0]) == 0


def test_mediation_full_vs_none(ray_session, tmp_path):
    """y built ONLY from m (which is built from x): indirect effect
    large, Sobel significant; y independent of m: indirect ~ 0."""
    from crawler_service_ray.pipelines.queries import q_mediation
    import pathlib

    rng = np.random.default_rng(41)
    x = rng.integers(1, 51, 4000).astype(float)

    def build(through_m, p):
        m = 0.001 * x + rng.normal(0, 0.002, len(x))
        m = np.clip(np.round(m, 4), 0, 0.1)
        if through_m:
            y = 5000 * m + rng.normal(0, 1, len(x))
        else:
            y = 10 * x + rng.normal(0, 1, len(x))
        pd.DataFrame({"l_quantity": x, "l_discount": m,
                      "l_extendedprice": np.round(y, 2)}) \
            .to_parquet(p / "lineitem.parquet")

    p1 = pathlib.Path(tmp_path) / "med"; p1.mkdir()
    build(True, p1)
    g1 = q_mediation(str(p1))
    assert abs(float(g1["sobel_z"][0])) > 5.0
    assert float(g1["indirect"][0]) > 0.1
    p2 = pathlib.Path(tmp_path) / "dir"; p2.mkdir()
    build(False, p2)
    g2 = q_mediation(str(p2))
    assert abs(float(g2["indirect"][0])) < 0.1


def test_elasticity_constructed_power_law(ray_session, tmp_path):
    """Quantity built as q = k·p^(-1.5) (plus tiny noise) recovers
    elasticity near -1.5 with high R²."""
    from crawler_service_ray.pipelines.queries import q_elasticity

    rng = np.random.default_rng(43)
    p = rng.uniform(10, 200, 4000)
    q = np.maximum(np.round(1e4 * p ** -1.5
                            * np.exp(rng.normal(0, 0.05, 4000))), 1)
    pd.DataFrame({"l_quantity": q.astype(float),
                  "l_extendedprice": np.round(p * q, 2)}) \
        .to_parquet(tmp_path / "lineitem.parquet")
    got = q_elasticity(str(tmp_path))
    assert abs(float(got["elasticity"][0]) + 1.5) < 0.15
    assert float(got["r2"][0]) > 0.9


def test_var_backtest_rate_calibration(ray_session, tmp_path):
    """On smooth iid daily revenue the 95% VaR admits ~5%
    exceptions and the Kupiec LR stays small; VaR is the exact order
    statistic of the drop distribution."""
    from crawler_service_ray.pipelines.queries import q_var_backtest

    rng = np.random.default_rng(47)
    base = 20000
    vals = 1000 + rng.normal(0, 40, 400)
    rows = [(np.datetime64((base + d) * 86_400_000_000, "us"),
             round(float(v), 2)) for d, v in enumerate(vals)]
    pd.DataFrame(rows, columns=["ts", "value"]) \
        .to_parquet(tmp_path / "events.parquet")
    got = q_var_backtest(str(tmp_path))
    n = int(got["n_days"][0])
    x = int(got["exceptions"][0])
    assert n == 399
    assert x / n < 0.08                 # near the nominal 5%
    assert float(got["kupiec_lr"][0]) < 6.0
    # exact order-stat replay
    y = np.rint(vals * 100).astype("int64")
    drops = np.sort(y[:-1] - y[1:])
    k = int(np.ceil(0.95 * len(drops)))
    assert abs(float(got["var95"][0])
               - round(int(drops[k - 1]) / 100.0, 6)) < 1e-9
