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
    assert out["decoded"].all()
    assert (out["width"] >= 64).all() and (out["payload_bytes"] > 0).all()
    # determinism: same refs → same features
    out2 = media_features(fetched_dataset(cfg.run_dir)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_ref").reset_index(drop=True),
        out2.sort_values("media_ref").reset_index(drop=True),
    )
