"""Text analysis + similarity search + multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

from crawler_service_ray.functions import similarity, text


@pytest.fixture
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat and the dog are in the house of the king",
                    "el perro y el gato de la casa que los reyes",
                    "的了是我不的了是我不",
                ],
            }
        )
    )


def test_langid(docs_ds):
    out = text.langid_stage(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "es"
    assert out.loc[3, "lang_pred"] == "zh"


def test_quality_features():
    df = text.quality_features(
        pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat!", ""]})
    )
    r = df.set_index("doc_id")
    assert r.loc[1, "n_words"] == 3
    assert r.loc[1, "punct_ratio"] > 0
    assert r.loc[2, "n_words"] == 0
    assert 0 <= r.loc[1, "quality_score"] <= 1


def test_token_counter(docs_ds):
    out = text.token_stage(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_ws_tokens"] == 12
    assert out.loc[1, "n_bpe_tokens"] >= 12


def test_pii_redactor_planted():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "contact bob.smith+x@example.co.uk for details",
                "server at 10.0.255.3 answered",
                "call 5551234 ext 99 room 7",
                "nothing sensitive here",
            ],
        }
    )
    out = text.PiiRedactor()(df).set_index("doc_id")
    assert out.loc[1, "n_pii"] == 1
    assert out.loc[1, "redacted"] == "contact <PII> for details"
    assert out.loc[2, "n_pii"] == 1
    assert out.loc[2, "redacted"] == "server at <PII> answered"
    # 5551234 and 99 are digit-runs; the single digit 7 is not
    assert out.loc[3, "n_pii"] == 2
    assert out.loc[3, "redacted"] == "call <PII> ext <PII> room 7"
    assert out.loc[4, "n_pii"] == 0
    assert out.loc[4, "redacted"] == "nothing sensitive here"


def test_pii_redactor_email_before_numbers():
    # the email pattern must consume its digits before the digit-run
    # pattern sees them (ordering contract of PII_PATTERNS)
    out = text.PiiRedactor()(
        pd.DataFrame({"doc_id": [1], "text": ["a12bc34@ex99.com end 42"]})
    )
    assert out["redacted"].iloc[0] == "<PII> end <PII>"
    assert out["n_pii"].iloc[0] == 2


def test_vocab_topk(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {"text": ["a b b c", "b c  d", "c d e", ""] * 5}
    )
    out = (
        text.vocab_topk(rd.from_pandas(df, override_num_blocks=3), k=3)
        .to_pandas()
    )
    # truth: b=15, c=15, a=5, d=10, e=5 → top3 = b,c (tie, word asc), d
    assert list(out["word"]) == ["b", "c", "d"]
    assert list(out["cnt"]) == [15, 15, 10]


def test_contamination_hits(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions import dedup

    bench = pd.DataFrame(
        {"doc_id": [100], "text": ["q1 q2 q3 q4 q5 q6"]}
    )
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "x q1 q2 q3 q4 q5 y",      # shares the q1..q5 5-gram
                "q9 q8 q7 q6 q5 q4",       # reversed: no shared 5-gram
                "clean words only here now",
            ],
        }
    )
    out = dedup.contamination_hits(
        rd.from_pandas(corpus, override_num_blocks=2),
        rd.from_pandas(bench),
    ).to_pandas().set_index("doc_id")
    assert set(out.index) == {1}
    assert out.loc[1, "n_contaminated"] == 1


def test_sample_hash_parallelism_invariant(ray_session):
    from crawler_service_ray.pipelines.queries import q_sample_hash

    a = q_sample_hash("/root/testdata/sf0.001").to_pandas()
    assert len(a) > 0
    ids = a["doc_id"].to_numpy().astype(np.uint64)
    h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
    assert (h < np.uint64(214748365)).all()


def test_mixture_sample_alpha_semantics(ray_session):
    """α=1 keeps natural proportions; α→0 flattens toward uniform
    (low-resource groups gain share); output is deterministic and
    parallelism-shaped by hash only."""
    import ray.data as rd

    from crawler_service_ray.functions.text import mixture_sample

    df = pd.DataFrame({
        "doc_id": np.arange(1, 1001, dtype=np.int64),
        "source": (["web"] * 810) + (["books"] * 90)
                  + (["code"] * 100),
    })
    natural = mixture_sample(rd.from_pandas(df), "source", "doc_id",
                             total=100, alpha=1.0).to_pandas()
    flat = mixture_sample(rd.from_pandas(df), "source", "doc_id",
                          total=99, alpha=0.001).to_pandas()
    nat = natural["source"].value_counts()
    fl = flat["source"].value_counts()
    assert nat["web"] == 81 and nat["books"] == 9 and nat["code"] == 10
    # near-uniform thirds at α≈0 despite the 8:1 natural skew
    assert set(fl.values) <= {32, 33} and len(fl) == 3
    # determinism: same call twice = identical membership
    again = mixture_sample(rd.from_pandas(df), "source", "doc_id",
                           total=100, alpha=1.0).to_pandas()
    assert sorted(again["doc_id"]) == sorted(natural["doc_id"])
    # never overshoots the budget; groups smaller than their target
    # contribute everything they have
    tiny = mixture_sample(rd.from_pandas(df.head(12)), "source",
                          "doc_id", total=1000, alpha=0.5).to_pandas()
    assert len(tiny) == 12


def test_fingerprint_stability_and_sensitivity():
    a = text.fingerprint_batch(
        pd.DataFrame({"doc_id": [1], "text": ["w1 w2 w3 w4 w5 w6 w7 w8 w9 "
                                              "w10 w11 w12"]})
    )
    b = text.fingerprint_batch(
        pd.DataFrame({"doc_id": [1], "text": ["w1 w2 w3 w4 w5 w6 w7 w8 w9 "
                                              "w10 w11 w12"]})
    )
    c = text.fingerprint_batch(
        pd.DataFrame({"doc_id": [1], "text": ["w1 w2 w3 w4 XX w6 w7 w8 w9 "
                                              "w10 w11 w12"]})
    )
    assert a["fingerprint"].iloc[0] == b["fingerprint"].iloc[0]
    assert a["fingerprint"].iloc[0] != c["fingerprint"].iloc[0]


def test_brute_force_topk_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    M = rng.normal(size=(50, 8)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(50, dtype="int64"),
                       "embedding": list(M)})
    out = similarity.brute_force_topk(
        rd.from_pandas(df), M[:3], np.arange(3), k=4
    ).to_pandas()
    # exact oracle via numpy
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn[:3] @ Mn.T
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf
        want = list(np.argsort(-s)[:4])
        got = out[out.query_id == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == want, (q, got, want)


def test_ivf_recall_reasonable(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(6)
    M = rng.normal(size=(400, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(400, dtype="int64"),
                       "embedding": list(M)})
    ds = rd.from_pandas(df)
    exact = similarity.brute_force_topk(ds, M[:5], np.arange(5), k=5).to_pandas()
    approx = similarity.ivf_topk(ds, M[:5], np.arange(5), k=5,
                                 num_cells=8, nprobe=4).to_pandas()
    recalls = []
    for q in range(5):
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


def test_media_features_pipeline(ray_session, tiny_corpus, tmp_path):
    from crawler_service_ray.config import CrawlConfig
    from crawler_service_ray.functions.multimodal import media_features
    from crawler_service_ray.pipelines.crawl import CrawlRun, fetched_dataset
    from crawler_service_ray.sources.corpus import default_seeds

    cfg = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=str(tmp_path / "run"),
        seeds=default_seeds(3), max_epochs=3, num_seen_shards=2,
        force_mode="local",
    )
    CrawlRun(cfg).run(resume=False)
    out = media_features(fetched_dataset(cfg.run_dir)).to_pandas()
    assert len(out) > 0
    # known-magic payloads decode with real header-parsed features;
    # headerless blobs sniff as octet-stream and fail decode honestly
    dec = out[out["decoded"]]
    assert len(dec) > 0
    assert set(dec["media_type"]) <= {"image/png", "image/gif",
                                      "image/jpeg", "audio/wav"}
    img = dec[dec["media_type"].str.startswith("image/")]
    assert (img["width"] >= 16).all() and (img["height"] >= 16).all()
    wav = dec[dec["media_type"] == "audio/wav"]
    assert (wav["sample_rate"] >= 8000).all() if len(wav) else True
    und = out[~out["decoded"]]
    assert (und["media_type"] == "application/octet-stream").all()
    assert (out["payload_bytes"] > 0).all()
    # determinism: same refs → same features
    out2 = media_features(fetched_dataset(cfg.run_dir)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_ref").reset_index(drop=True),
        out2.sort_values("media_ref").reset_index(drop=True),
    )


def test_header_codec_sniff_and_parse():
    """Magic-byte sniffing + header parsing round-trips the generator's
    encoded dimensions for every format."""
    from crawler_service_ray.functions import multimodal as mm

    codec = mm.HeaderCodec()
    h = 123456789
    f = codec.decode(mm._png_payload(h))
    assert f["media_type"] == "image/png"
    assert (f["width"], f["height"]) == (64 + h % 1920, 64 + (h >> 16) % 1080)
    f = codec.decode(mm._gif_payload(h))
    assert f["media_type"] == "image/gif"
    assert (f["width"], f["height"]) == (16 + h % 1024, 16 + (h >> 16) % 768)
    f = codec.decode(mm._jpeg_payload(h))
    assert f["media_type"] == "image/jpeg"
    assert (f["width"], f["height"]) == (32 + h % 4096, 32 + (h >> 16) % 2160)
    f = codec.decode(mm._wav_payload(h))
    assert f["media_type"] == "audio/wav"
    assert f["sample_rate"] in (8000, 16000, 22050, 44100)
    assert f["channels"] in (1, 2)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        codec.decode(b"\x00\x01\x02\x03 headerless blob")
    assert mm.sniff_mime(b"\x00\x01\x02") == "application/octet-stream"


def test_header_codec_truncated_payloads_do_not_crash(ray_session):
    """Payloads with valid magic but truncated headers surface as
    undecodable rows, not a stage crash."""
    import pyarrow as pa

    from crawler_service_ray.functions import multimodal as mm

    t = pa.table(
        {
            "media_ref": ["a", "b", "c"],
            "doc_id": ["d1", "d2", "d3"],
            "payload": [b"\x89PNG\r\n\x1a\n", b"RIFF\x00\x00\x00\x00WAVE",
                        mm._png_payload(12345)],
        }
    )
    out = mm.MediaFeatures()(t)
    dec = dict(zip(out["media_ref"].to_pylist(), out["decoded"].to_pylist()))
    assert dec == {"a": False, "b": False, "c": True}


def test_kmeans_parallelism_invariant_and_converging(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from crawler_service_ray.functions.similarity import kmeans

    rng = np.random.default_rng(5)
    # three well-separated direction clusters
    centers = np.eye(3, 16) * 10
    X = np.vstack([
        centers[i] + rng.normal(0, 0.3, size=(40, 16)) for i in range(3)
    ])
    df = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": list(X.astype(np.float64)),
    })
    outs = []
    for blocks in (2, 8):
        ds = rd.from_pandas(df, override_num_blocks=blocks)
        _C, assign = kmeans(ds, k=3, iters=4)
        outs.append(assign.to_pandas().sort_values("vec_id")
                    .reset_index(drop=True))
    # identical assignments at any parallelism
    pd.testing.assert_frame_equal(outs[0], outs[1])
    a = outs[0]["cluster"].to_numpy()
    # well-separated clusters are recovered exactly (up to relabeling)
    for i in range(3):
        grp = a[i * 40:(i + 1) * 40]
        assert (grp == grp[0]).all()
    assert len(set(a[::40])) == 3


def test_pca_fit_recovers_planted_structure(ray_session):
    """A planted dominant direction must be the first component (up to
    the deterministic sign convention); components are orthonormal; the
    projection reproduces the driver-side computation; block count
    (parallelism) doesn't change the answer beyond float reassociation."""
    import ray.data as rd

    from crawler_service_ray.functions.similarity import (
        pca_fit,
        pca_project,
    )

    rng = np.random.default_rng(7)
    d, n = 8, 400
    axis = np.zeros(d)
    axis[2] = 1.0
    X = rng.normal(0, 0.05, size=(n, d)) + np.outer(
        rng.normal(0, 3.0, size=n), axis)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(X.astype(np.float32)),
    })
    mean, comps, evals = pca_fit(rd.from_pandas(df), k=3)
    assert comps.shape == (3, d)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)
    assert evals[0] > 10 * evals[1]          # planted variance dominates
    assert abs(comps[0, 2]) > 0.99           # first PC ≈ planted axis
    assert comps[0, 2] > 0                   # sign convention
    # parallelism invariance (different block structure)
    m2, c2, e2 = pca_fit(
        rd.from_pandas(df).repartition(7), k=3)
    assert np.allclose(mean, m2, atol=1e-9)
    assert np.abs(comps.T @ comps - c2.T @ c2).max() < 1e-6
    # projection parity vs driver matmul
    got = pca_project(rd.from_pandas(df), mean, comps).to_pandas()
    got = got.sort_values("vec_id")
    P = np.stack(got["pc"].to_numpy())
    want = (np.stack(df["embedding"].to_numpy()).astype(np.float64)
            - mean) @ comps.T
    assert np.abs(P - want).max() < 1e-9


def test_char_entropy_kernel_edges(ray_session):
    import math
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from crawler_service_ray.functions.text import char_entropy

    def ref(s):
        if not s:
            return 0.0
        c, n = Counter(s), len(s)
        return round(-sum((v / n) * math.log2(v / n) for v in c.values()), 6)

    texts = ["", "aaaa", "abab", "hello world", "汉字汉字a", "x"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (char_entropy(rd.from_pandas(df, override_num_blocks=3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["entropy"]) == [ref(t) for t in texts]
    assert list(out["n_chars"]) == [len(t) for t in texts]


def test_bpe_train_matches_reference(ray_session):
    """Distributed BPE merges == independent dict/loop reference,
    including the overlapping-run greedy case ('aaaa')."""
    import ray.data as rd

    from crawler_service_ray.functions.text import (_bpe_word_table,
                                                    bpe_reference,
                                                    bpe_train_merges)

    docs = pd.DataFrame({"text": [
        "low low low lower lowest",
        "new newer newest new new",
        "aaaa aaaa aa banana bandana",
        "low new low new",
    ]})
    ds = rd.from_pandas(docs, override_num_blocks=2)
    got = bpe_train_merges(ds, num_merges=6, num_partitions=4)
    wc = _bpe_word_table(ds, "text", num_partitions=4).to_pandas()
    want = bpe_reference(wc, num_merges=6)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    assert len(got) == 6
    # merged symbols must really merge: applying rank-0 merge reduces
    # the rank-0 pair's count to zero in the next round's stats
    r0 = (got["left"].iloc[0], got["right"].iloc[0])
    later = got.iloc[1:]
    assert not ((later["left"] == r0[0]) & (later["right"] == r0[1])).any()


def test_bpe_encode_matches_reference(ray_session):
    """Vectorized distributed encode == independent dict/loop per-word
    encoder on the trained merges, including overlap runs and words the
    trainer never saw whole ('aaaaa')."""
    import ray.data as rd

    from crawler_service_ray.functions.text import (_bpe_word_table,
                                                    bpe_encode_counts,
                                                    bpe_encode_reference,
                                                    bpe_train_merges)

    docs = pd.DataFrame({
        "doc_id": range(5),
        "text": [
            "low low low lower lowest",
            "new newer newest new new",
            "aaaa aaaa aa aaa aaaaa banana bandana",
            "low new low new",
            "",
        ],
    })
    ds = rd.from_pandas(docs, override_num_blocks=3)
    merges = bpe_train_merges(ds, num_merges=6, num_partitions=4)
    mlist = list(zip(merges["left"], merges["right"]))
    got = (bpe_encode_counts(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def ref_doc(t):
        ws = [w for w in t.split(" ") if w]
        return len(ws), sum(bpe_encode_reference(w, mlist) for w in ws)

    want = [ref_doc(t) for t in docs["text"]]
    assert list(got["n_words"]) == [w for w, _ in want]
    assert list(got["n_bpe_tokens"]) == [t for _, t in want]
    # merges really compress: fewer tokens than characters
    chars = docs["text"].str.replace(" ", "", regex=False).str.len()
    assert (got["n_bpe_tokens"].to_numpy()
            <= chars.to_numpy()).all()
    assert (got["n_bpe_tokens"].to_numpy()
            < chars.to_numpy())[chars.to_numpy() > 0].any()


def test_bpe_apply_merge_overlap_greedy():
    """'aaaa' with merge (a,a) -> (aa, aa); 'aaa' -> (aa, a)."""
    from crawler_service_ray.functions.text import _bpe_apply_merge

    flat = np.array(list("aaaa") + list("aaa"), dtype=object)
    word_of = np.array([0, 0, 0, 0, 1, 1, 1])
    f2, w2 = _bpe_apply_merge(flat, word_of, "a", "a")
    assert list(f2) == ["aa", "aa", "aa", "a"]
    assert list(w2) == [0, 0, 1, 1]


# ---------------------------------------------------------------------------
# collocations (bigram PMI)
# ---------------------------------------------------------------------------

def test_collocations_matches_single_node(ray_session):
    import numpy as np
    import ray.data as rd

    from crawler_service_ray.functions.text import collocations

    rng = np.random.default_rng(3)
    words = ["the", "of", "data", "ray", "new", "york"]
    docs = []
    for _ in range(200):
        toks = list(rng.choice(words, size=12))
        # plant a strong collocation: "new york" always adjacent
        if rng.random() < 0.5:
            i = int(rng.integers(0, 11))
            toks[i], toks[i + 1] = "new", "york"
        docs.append(" ".join(toks))
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(8)
    got = collocations(ds, k=10, min_count=2).to_pandas()

    # single-node reference with the same self-consistent PMI
    pairs = {}
    for d in docs:
        t = [x for x in d.split(" ") if x]
        for a, b in zip(t[:-1], t[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    n = sum(pairs.values())
    c1, c2 = {}, {}
    for (a, b), c in pairs.items():
        c1[a] = c1.get(a, 0) + c
        c2[b] = c2.get(b, 0) + c
    rows = [(a, b, c, round(np.log(c * n / (c1[a] * c2[b])), 6))
            for (a, b), c in pairs.items() if c >= 2]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    ref = pd.DataFrame(rows[:10], columns=["w1", "w2", "c_ab", "pmi"])

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref, check_dtype=False)
    # the planted phrase must rank first
    assert (got.iloc[0]["w1"], got.iloc[0]["w2"]) == ("new", "york")


def test_pq_roundtrip_planted_clusters(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.similarity import (
        _pq_assign,
        _pq_subspaces,
        pq_encode,
        pq_fit,
    )

    rng = np.random.default_rng(23)
    m, k, dsub = 2, 4, 8
    d = m * dsub
    # planted: per subspace, points sit in k tight clusters
    centers = rng.normal(size=(m, k, dsub)) * 10
    n = 600
    which = rng.integers(0, k, size=(n, m))
    X = np.concatenate(
        [centers[j, which[:, j]] + rng.normal(size=(n, dsub)) * 0.01
         for j in range(m)], axis=1)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(X.astype(np.float32))})
    ds = rd.from_pandas(df).repartition(6)

    C = pq_fit(ds, m=m, k=k, iters=6)
    assert C.shape == (m, k, dsub)
    enc = (pq_encode(ds, C).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    codes = enc[[f"code_{j}" for j in range(m)]].to_numpy()
    assert codes.min() >= 0 and codes.max() < k
    # reconstruction must beat the rank-0 (global-mean) baseline by a
    # wide margin on planted clusters (Lloyd from a k-sample init is
    # not guaranteed to resolve every planted cluster, so don't assert
    # near-zero error — the audit's invariant is the improvement)
    Xf = X.astype(np.float64)
    sse_mean = float(((Xf - Xf.mean(axis=0)) ** 2).sum())
    assert float(enc["recon_sse"].sum()) < 0.5 * sse_mean

    # parallelism invariance: 1-block vs 6-block fits agree (same
    # content-hash init, same Lloyd; clusters far apart so float
    # reassociation cannot flip an assignment)
    C1 = pq_fit(rd.from_pandas(df), m=m, k=k, iters=6)
    codes1 = _pq_assign(_pq_subspaces(Xf, m), C1)
    np.testing.assert_array_equal(codes, codes1)


def test_pq_topk_exact_on_quantized_corpus(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.similarity import (
        _pq_assign,
        _pq_subspaces,
        pq_encode,
        pq_fit,
        pq_topk,
    )

    rng = np.random.default_rng(31)
    m, k, dsub, n = 2, 4, 4, 300
    X = rng.normal(size=(n, m * dsub))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(X.astype(np.float32))})
    ds = rd.from_pandas(df).repartition(5)
    C = pq_fit(ds, m=m, k=k, iters=3)
    enc = pq_encode(ds, C).materialize()

    Q = X[:3].astype(np.float64)
    got = (pq_topk(enc, C, Q, np.arange(3), k=7)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))

    # reference: exact ADC over the SAME quantized corpus
    Xs = _pq_subspaces(np.stack(
        df["embedding"].to_numpy()).astype(np.float64), m)
    codes = _pq_assign(Xs, C)
    recon = np.concatenate(
        [C[j][codes[:, j]] for j in range(m)], axis=1)
    for qi in range(3):
        d = ((recon - Q[qi]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(n), np.round(d, 12)))[:7]
        g = got[got["query_id"] == qi]
        # adist ranking must match the exact quantized distances
        np.testing.assert_allclose(
            np.sort(g["adist"].to_numpy()),
            np.sort(d[order]), rtol=1e-9)
        assert set(g["neighbor_id"]) == set(order) or \
            np.allclose(sorted(d[list(g["neighbor_id"])]),
                        sorted(d[order]), rtol=1e-9)


def test_naive_bayes_matches_single_node(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.text import naive_bayes_classify

    rng = np.random.default_rng(59)
    vocab = {"en": ["the", "cat", "dog", "house"],
             "es": ["el", "gato", "perro", "casa"],
             "de": ["der", "katze", "hund", "haus"]}
    shared = ["data", "x1", "x2"]
    rows = []
    for i in range(240):
        lang = ["en", "es", "de"][i % 3]
        words = list(rng.choice(vocab[lang] + shared, size=12))
        rows.append({"doc_id": i, "text": " ".join(words),
                     "lang": lang})
    df = pd.DataFrame(rows)
    train = df[df["doc_id"] >= 60]
    test = df[df["doc_id"] < 60]
    got = (naive_bayes_classify(
        rd.from_pandas(train).repartition(5),
        rd.from_pandas(test[["doc_id", "text"]]).repartition(3),
        num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # single-node reference: identical Laplace-smoothed model
    tt = {}
    tot = {}
    ndocs = {}
    for _, r in train.iterrows():
        ndocs[r["lang"]] = ndocs.get(r["lang"], 0) + 1
        for w in r["text"].split(" "):
            if w:
                tt[(r["lang"], w)] = tt.get((r["lang"], w), 0) + 1
                tot[r["lang"]] = tot.get(r["lang"], 0) + 1
    V = len({w for (_l, w) in tt})
    labels = sorted(tot)
    n_train = sum(ndocs.values())
    preds = []
    for _, r in test.iterrows():
        best = None
        for l in labels:
            s = np.log(ndocs[l] / n_train)
            for w in r["text"].split(" "):
                if w:
                    s += np.log((tt.get((l, w), 0) + 1)
                                / (tot[l] + V))
            s = round(s, 6)
            if best is None or s > best[0]:
                best = (s, l)
        preds.append({"doc_id": r["doc_id"], "pred_lang": best[1]})
    ref = (pd.DataFrame(preds).sort_values("doc_id")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    # the planted vocabulary makes the task near-separable
    truth = test.set_index("doc_id")["lang"]
    acc = (got.set_index("doc_id")["pred_lang"] == truth).mean()
    assert acc > 0.9
