"""Sequence packing + duplicated-span kernels: greedy recurrence parity
on adversarial inputs, Dataset-level invariants, and exact span recall on
a crafted corpus."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_greedy(ntok, cap):
    bins, b, fill = [], 0, None
    for n in ntok:
        if fill is None:
            fill = n
        elif fill + n > cap:
            b += 1
            fill = n
        else:
            fill += n
        bins.append(b)
    return np.array(bins, dtype=np.int64)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), max_size=60),
    st.integers(min_value=1, max_value=30),
)
def test_greedy_pack_bins_matches_recurrence(ntok, cap):
    from crawler_service_ray.functions.text import greedy_pack_bins

    got = greedy_pack_bins(np.array(ntok, dtype=np.int64), cap)
    assert (got == _ref_greedy(ntok, cap)).all()


def test_greedy_pack_oversize_and_zero_edges():
    from crawler_service_ray.functions.text import greedy_pack_bins

    # oversize doc alone; zero-token doc after it joins the NEXT bin
    nt = np.array([100, 0, 3, 3], dtype=np.int64)
    assert (greedy_pack_bins(nt, 8) == [0, 1, 1, 1]).all()
    # exact-capacity fill then reset
    nt = np.array([4, 4, 1], dtype=np.int64)
    assert (greedy_pack_bins(nt, 8) == [0, 0, 1]).all()


def test_pack_sequences_dataset_invariants(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.text import pack_sequences

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "lang": np.array(["en", "de", "zh", "fr"])[
            rng.integers(0, 4, 200)],
        "text": [" ".join(["w"] * int(n))
                 for n in rng.integers(1, 60, 200)],
    })
    cap = 64
    out = (pack_sequences(rd.from_pandas(df), capacity=cap)
           .to_pandas().sort_values(["lang", "doc_id"]))
    assert len(out) == 200
    for _, g in out.groupby("lang"):
        # in-order by doc_id, seq ids contiguous from 0
        assert (np.diff(g["seq_id"].to_numpy()) >= 0).all()
        assert g["seq_id"].iloc[0] == 0
        fills = g.groupby("seq_id")["n_tokens"].sum()
        # no bin overflows (no doc here exceeds capacity)
        assert (fills <= cap).all()
        # greedy maximality: the first doc of bin b+1 would not have fit
        first_next = g[g["seq_id"].diff() == 1]["n_tokens"].to_numpy()
        prev_fill = fills.to_numpy()[:-1]
        assert (prev_fill + first_next > cap).all()


def test_dup_spans_crafted_corpus(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.dedup import dup_span_occurrences

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": [
            "x0 x1 " + shared + " y0 y1",       # shared at start_word 3
            shared + " z0",                      # shared at start_word 1
            "only unique words here nothing repeats at all",
            "too short",                         # < k tokens: no spans
        ],
    })
    out = (dup_span_occurrences(rd.from_pandas(docs), k=8)
           .to_pandas().sort_values(["doc_id", "start_word"])
           .reset_index(drop=True))
    got = set(zip(out["doc_id"], out["start_word"]))
    assert (0, 3) in got and (1, 1) in got
    assert (out["n_docs"] == 2).all()
    # doc 2 and the short doc emit nothing; no spurious spans beyond the
    # single shared 8-gram (sliding overlaps with the pads differ)
    assert set(out["doc_id"]) == {0, 1}
    assert len(out) == 2


def test_dup_spans_within_doc_repeat_not_emitted(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.dedup import dup_span_occurrences

    rep = "a b c d e f g h"
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": [rep + " q " + rep,  # repeats only within one doc
                 "totally different tokens one two three four five six"],
    })
    out = dup_span_occurrences(rd.from_pandas(docs), k=8).to_pandas()
    assert len(out) == 0


def test_pack_payloads_matches_assignments(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.text import (
        pack_payloads,
        pack_sequences,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": np.arange(80, dtype=np.int64),
        "lang": np.array(["en", "de"])[rng.integers(0, 2, 80)],
        "text": [" ".join([f"t{i}"] * int(n))
                 for i, n in enumerate(rng.integers(1, 30, 80))],
    })
    ds = rd.from_pandas(df, override_num_blocks=5)
    assign = pack_sequences(ds, capacity=48).to_pandas()
    pay = pack_payloads(ds, capacity=48).to_pandas()
    # bin-level rollups agree with the per-doc assignment
    want = assign.groupby(["lang", "seq_id"]).agg(
        n_docs=("doc_id", "size"), seq_tokens=("n_tokens", "sum"))
    got = pay.set_index(["lang", "seq_id"])[["n_docs", "seq_tokens"]]
    pd.testing.assert_frame_equal(
        got.sort_index(), want.sort_index(), check_dtype=False)
    # payload text is the member docs joined in doc order
    m = df.merge(assign[["doc_id", "seq_id"]], on="doc_id")
    one = m[(m["lang"] == "en") & (m["seq_id"] == 0)].sort_values("doc_id")
    row = pay[(pay["lang"] == "en") & (pay["seq_id"] == 0)].iloc[0]
    assert row["text"] == "\n".join(one["text"])


def test_remove_dup_spans_crafted(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.dedup import remove_dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": [
            "x0 x1 " + shared + " y0 y1",
            shared,
            "nothing shared in this document at all here",
        ],
    })
    out = (remove_dup_spans(rd.from_pandas(docs), k=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 0: the 8 shared words removed, unique pads kept
    assert out.loc[0, "text_clean"] == "x0 x1 y0 y1"
    assert out.loc[0, "n_words"] == 12 and out.loc[0, "n_words_kept"] == 4
    # doc 1 was entirely the duplicated gram -> empty remainder
    assert out.loc[1, "text_clean"] == ""
    assert out.loc[1, "n_words_kept"] == 0
    # untouched doc comes back verbatim
    assert out.loc[2, "text_clean"] == docs.loc[2, "text"]
    assert out.loc[2, "n_words_kept"] == out.loc[2, "n_words"]
