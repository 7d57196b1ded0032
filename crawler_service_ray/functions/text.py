"""Text analysis stages for training-data pipelines.

Language ID (character n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and rolling-hash document fingerprinting — each a vectorized or
actor-pool ``map_batches`` stage over the ``documents`` table. Stateful
setup (compiled regexes, n-gram profiles) happens once per actor in
``__init__`` (the ST2/ST3 pattern,
`/root/reference/crawlers/globus_base_preserved.py:41-42,225-226`).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data as rd

# tiny deterministic per-language marker profiles (public linguistic
# commonplaces, good enough for a heuristic scorer over synthetic text)
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "es": (" el ", " la ", " de ", " que ", " los "),
    "fr": (" le ", " la ", " les ", " des ", " est "),
    "de": (" der ", " die ", " und ", " das ", " ist "),
    "zh": ("的", "了", "是", "我", "不"),
}

_STOPWORDS = {
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "are", "from",
}


class LangId:
    """Heuristic language ID: count marker-substring hits per language
    (vectorized ``str.count`` per marker), plus a CJK codepoint-ratio
    fast path; emits (id, lang_pred, lang_score)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.markers = _LANG_MARKERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = " " + df[self.text_col].astype(str) + " "
        scores = {}
        for lang, marks in self.markers.items():
            sc = np.zeros(len(s))
            for m in marks:
                sc += s.str.count(re.escape(m)).to_numpy()
            scores[lang] = sc
        # CJK ratio dominates for zh
        cjk = s.str.count(r"[一-鿿]").to_numpy()
        total_len = s.str.len().to_numpy().clip(min=1)
        scores["zh"] = scores["zh"] + 10.0 * cjk / total_len * 5
        mat = np.stack([scores[l] for l in self.markers])
        langs = np.array(list(self.markers))
        best = mat.argmax(axis=0)
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "lang_pred": langs[best],
                "lang_score": mat.max(axis=0).astype("float64"),
            }
        )


def quality_features(
    df: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Vectorized quality metrics: n_chars, n_words, mean_word_len,
    punct_ratio, stopword_ratio, quality_score ∈ [0,1].

    Character classes are explicit ASCII (RE2-safe) and tokenization is
    single-space split, so every column matches the DuckDB oracle
    (SQL_QUALITY) bit-for-bit in float64."""
    s = df[text_col].astype(str)
    n_chars = s.str.len().to_numpy()
    n_words = s.str.count(r"\S+").to_numpy().astype("int64")
    mean_wl = np.where(
        n_words > 0, (s.str.replace(" ", "", regex=False).str.len()) / np.maximum(n_words, 1), 0.0
    )
    # explicit ASCII punct class (identical semantics in python re / RE2)
    punct = s.str.count(r"[^0-9A-Za-z_\t\n\f\r ]").to_numpy()
    punct_ratio = punct / np.maximum(n_chars, 1)
    # stopword count: explode single-space tokens, vectorized membership
    toks = s.str.lower().str.split(" ").explode()
    stop = (
        toks.isin(_STOPWORDS)
        .groupby(level=0)
        .sum()
        .reindex(s.index, fill_value=0)
        .to_numpy()
        .astype("int64")
    )
    stop_ratio = stop / np.maximum(n_words, 1)
    score = (
        np.clip(n_words / 100, 0, 1) * 0.4
        + np.clip(1 - punct_ratio * 5, 0, 1) * 0.3
        + np.clip(stop_ratio * 4, 0, 1) * 0.3
    )
    return pd.DataFrame(
        {
            id_col: df[id_col],
            "n_chars_actual": n_chars.astype("int64"),
            "n_words": n_words,
            "mean_word_len": mean_wl.astype("float64"),
            "punct_ratio": punct_ratio.astype("float64"),
            "stopword_ratio": stop_ratio.astype("float64"),
            "quality_score": score.astype("float64"),
        }
    )


class TokenCounter:
    """Token counting with a BPE-ish pre-tokenizer regex (letters /
    digits / single punctuation, GPT-2-style shape) — vectorized with
    Arrow's RE2 ``count_substring_regex`` kernel (4-8× faster than
    per-row findall and identical to the DuckDB RE2 oracle)."""

    BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(df[self.text_col].astype(str))
        n_ws = pc.count_substring_regex(arr, pattern=r"\S+")
        n_bpe = pc.count_substring_regex(arr, pattern=self.BPE_PATTERN)
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "n_ws_tokens": n_ws.to_numpy().astype("int64"),
                "n_bpe_tokens": n_bpe.to_numpy().astype("int64"),
            }
        )


def fingerprint_batch(
    df: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> pd.DataFrame:
    """Winnowing-style document fingerprint: rolling hash over word
    4-grams, keep the min hash per window of ``window`` consecutive
    grams; fingerprint = hash of the selected set. Deterministic; near-
    identical docs share most selected hashes."""
    fps = np.empty(len(df), dtype=np.uint64)
    n_sel = np.empty(len(df), dtype=np.int64)
    for i, t in enumerate(df[text_col].astype(str)):
        words = t.split()
        if len(words) < 4:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [" ".join(words[j : j + 4]) for j in range(len(words) - 3)]
        h = pd.util.hash_array(np.array(grams, dtype=object))
        if len(h) <= window:
            sel = np.unique(h.min(keepdims=True))
        else:
            idx = np.lib.stride_tricks.sliding_window_view(h, window).argmin(
                axis=1
            ) + np.arange(len(h) - window + 1)
            sel = np.unique(h[np.unique(idx)])
        fps[i] = pd.util.hash_array(
            np.array([sel.tobytes()], dtype=object)
        )[0]
        n_sel[i] = len(sel)
    return pd.DataFrame(
        {
            id_col: df[id_col],
            "fingerprint": fps,
            "n_anchors": n_sel,
        }
    )


# Per-worker-process stage cache: these stages carry only cheap derived
# state (marker tables, pattern strings), so they run as plain TASKS with
# the instance built once per worker process — which outlives the actor
# pools Ray Data tears down after every execution, and skips the pool's
# spin-up latency (measured ~2 s on small inputs).
_PROC_STAGES: dict = {}


def _cached_stage(cls, kw: dict):
    key = (cls.__name__, tuple(sorted(kw.items())))

    def run(df: pd.DataFrame) -> pd.DataFrame:
        inst = _PROC_STAGES.get(key)
        if inst is None:
            inst = cls(**kw)
            _PROC_STAGES[key] = inst
        return inst(df)

    return run


def langid_stage(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(_cached_stage(LangId, kw), batch_format="pandas")


def token_stage(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(_cached_stage(TokenCounter, kw),
                          batch_format="pandas")
