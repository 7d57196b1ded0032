"""Property-based tests (hypothesis) for the pure vectorized kernels —
no Ray session needed; these pin the batch-vectorized implementations
against scalar/single-doc oracles on adversarial inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=64))
def test_popcount64_matches_bit_count(xs):
    from crawler_service_ray.functions.dedup import popcount64

    arr = np.array(xs, dtype=np.uint64)
    got = popcount64(arr)
    want = np.array([int(x).bit_count() for x in xs], dtype=np.int64)
    assert (got == want).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                min_size=1, max_size=32))
def test_key_hash_dtype_canonical(xs):
    """int64 5 and float64 5.0 must hash identically — the null-padding
    union widens join keys to float64, and a raw-bits hash would
    silently miss every co-located match (round-2 regression class)."""
    from crawler_service_ray.functions.relational import _key_hash

    a = _key_hash(pd.DataFrame({"k": pd.Series(xs, dtype="int64")}), ["k"])
    b = _key_hash(pd.DataFrame({"k": pd.Series(xs, dtype="float64")}), ["k"])
    assert (a == b).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                           max_codepoint=0x7F),
    max_size=80), min_size=1, max_size=8))
def test_pii_redaction_complete(texts):
    """After redaction no digit-run of length ≥ 2 survives anywhere
    (emails/IPs contain digit-runs or none; the final pattern must
    have swept every remainder)."""
    import re

    from crawler_service_ray.functions.text import PiiRedactor

    out = PiiRedactor()(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ))
    for red in out["redacted"]:
        assert re.search(r"\d{2}", red) is None, red


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30)
    .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=6))
def test_fingerprint_batch_equals_per_doc(texts):
    """The batch-vectorized winnowing fingerprint must equal the same
    kernel run one document at a time — the global sliding-window
    argmin and XOR reduceat cannot leak across document segments."""
    from crawler_service_ray.functions.text import fingerprint_batch

    batch = fingerprint_batch(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ))
    for i, t in enumerate(texts):
        single = fingerprint_batch(pd.DataFrame(
            {"doc_id": [i], "text": [t]}
        ))
        assert batch["fingerprint"].iloc[i] == single["fingerprint"].iloc[0]
        assert batch["n_anchors"].iloc[i] == single["n_anchors"].iloc[0]


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40)
    .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=6))
def test_oph_signatures_deterministic_and_shaped(texts):
    from crawler_service_ray.functions.dedup import (
        minhash_batch_signatures_oph,
    )

    a = minhash_batch_signatures_oph(texts, num_perm=32)
    b = minhash_batch_signatures_oph(texts, num_perm=32)
    assert a.shape == (32, len(texts))
    assert (a == b).all()
    for i, t in enumerate(texts):
        if not t.split():
            assert (a[:, i] == 0).all()
        else:
            assert not (a[:, i] == 0).all()
