"""Dedup family on crafted corpora with planted duplicates."""

import numpy as np
import pandas as pd
import pytest

from crawler_service_ray.functions import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the rain falls softly on the old roof "
    "of the quiet house near the river bend where children play"
)


def _docs():
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},  # exact dup of 1
        {"doc_id": 3, "text": BASE.replace("lazy", "sleepy")},  # near dup
        {"doc_id": 4, "text": "completely different content about spark "
                              "query engines and distributed shuffles with "
                              "partitioned joins and sorted aggregates over "
                              "columnar arrow batches in the object store"},
        {"doc_id": 5, "text": "unrelated short text"},
    ]
    return pd.DataFrame(rows)


@pytest.fixture
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(_docs())


def test_exact_dedup(docs_ds):
    out = dedup.exact_dedup(docs_ds).to_pandas()
    assert len(out) == 4  # 5 docs, one exact dup pair
    row = out[out["doc_id"] == 1]
    assert row["dup_count"].iloc[0] == 2


def test_minhash_lsh_finds_planted_near_dups(docs_ds):
    pairs = dedup.minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in got  # exact dup
    assert (1, 3) in got and (2, 3) in got  # near dup
    assert not any(4 in p or 5 in p for p in got)
    exact = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)]["jaccard"].iloc[0]
    assert exact == 1.0


def test_jaccard_kernel():
    assert dedup.jaccard(BASE, BASE) == 1.0
    assert dedup.jaccard(BASE, "xyz") < 0.05
    j = dedup.jaccard(BASE, BASE.replace("lazy", "sleepy"))
    assert 0.5 < j < 1.0


def test_simhash_finds_exact_and_near(docs_ds):
    pairs = dedup.simhash_dedup(docs_ds, max_hamming=10).to_pandas()
    got = {tuple(p): h for *p, h in
           pairs[["id_a", "id_b", "hamming"]].to_numpy()}
    assert got.get((1, 2)) == 0  # identical fingerprints
    assert (1, 3) in got  # one-word change → small hamming
    assert (1, 4) not in got and (1, 5) not in got


def test_simhash_deterministic():
    s1 = dedup.simhash_batch(pd.Series([BASE, "abc def"]))
    s2 = dedup.simhash_batch(pd.Series([BASE, "abc def"]))
    assert (s1 == s2).all()


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 16)).astype(np.float32)
    base[1] = base[0] + 0.001  # planted near-dup pair (0,1)
    df = pd.DataFrame(
        {"vec_id": np.arange(6, dtype="int64"), "embedding": list(base)}
    )
    out = dedup.embedding_near_dup(
        rd.from_pandas(df), threshold=0.99
    ).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert pairs == {(0, 1)}
    assert out["cosine"].iloc[0] > 0.999


def test_minhash_signature_deterministic():
    a, b = dedup._minhash_params(32)
    s1 = dedup.minhash_signature(BASE, a, b)
    s2 = dedup.minhash_signature(BASE, a, b)
    assert (s1 == s2).all()
    assert s1.dtype == np.uint64
