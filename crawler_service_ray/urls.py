"""URL canonicalization, hashing and priority.

Generalizes the reference's path normalization — extension extraction
(`/root/reference/crawlers/globus_base_preserved.py:157-169`, duplicated at
`crawlers/local_funcx.py:131-143`) and full-path construction
(`crawlers/globus_base_preserved.py:310-314`) — into a real URL
canonicalizer, required by the north rule (canonicalized URL hashes key the
seen set).

Two implementations of the SAME spec:
  * ``canonicalize_url`` — pure Python, used by the reference oracle.
  * ``canonicalize_many`` — vectorized pandas str kernels, used inside
    ``map_batches`` in the hot path.
Property tests assert they agree (tests/test_urls.py).

Canonical form:
  scheme lowercased (default ``http`` when missing), host lowercased,
  default ports stripped (``:80`` http / ``:443`` https), fragment dropped,
  repeated ``/`` in the path collapsed, trailing ``/`` stripped (root is
  ``scheme://host`` with no slash), ``utm_*`` query params dropped, empty
  query dropped.

Hashing uses ``pandas.util.hash_array`` (SipHash-1-3 with a fixed key):
deterministic across processes — the reference's ``uuid4`` ids
(``application.py:107``) are replaced by content-derived hashes so runs are
reproducible (an equivalence requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_DEFAULT_PORT = {"http": ":80", "https": ":443"}

__all__ = [
    "canonicalize_url",
    "canonicalize_many",
    "hash_urls",
    "hash_url",
    "host_of",
    "hosts_of",
    "priority_of",
    "priorities_of",
]


def _canon_path_query(pathq: str) -> str:
    """Canonicalize the '/path?query' part (input without leading host)."""
    if "?" in pathq:
        path, _, query = pathq.partition("?")
    else:
        path, query = pathq, ""
    # collapse duplicate slashes
    while "//" in path:
        path = path.replace("//", "/")
    # strip trailing slash (root becomes empty path)
    path = path.rstrip("/")
    if path and not path.startswith("/"):
        path = "/" + path
    # drop utm_* params
    if query:
        kept = [p for p in query.split("&") if p and not p.startswith("utm_")]
        query = "&".join(kept)
    return path + (("?" + query) if query else "")


def canonicalize_url(url: str) -> str:
    """Pure-Python canonicalizer (oracle-side ground truth)."""
    u = url.strip()
    u = u.split("#", 1)[0]
    if "://" in u:
        scheme, _, rest = u.partition("://")
        scheme = scheme.lower()
    else:
        scheme, rest = "http", u
    if "/" in rest:
        hostport, _, pathq = rest.partition("/")
        pathq = "/" + pathq
    else:
        hostport, pathq = rest, ""
    host = hostport.lower()
    dp = _DEFAULT_PORT.get(scheme)
    if dp and host.endswith(dp):
        host = host[: -len(dp)]
    return f"{scheme}://{host}{_canon_path_query(pathq)}"


def canonicalize_many(urls) -> np.ndarray:
    """Vectorized canonicalizer over an array/list of URL strings.

    pandas ``.str`` kernels only — no Python-level per-row loop; used in
    ``map_batches`` stages (SURVEY.md §2.2 M1/M3).
    """
    s = pd.Series(np.asarray(urls, dtype=object)).astype(str).str.strip()
    s = s.str.split("#", n=1).str[0]
    has_scheme = s.str.contains("://", regex=False)
    scheme = (
        s.str.partition("://")[0].str.lower().where(has_scheme, "http")
    )
    rest = s.str.partition("://")[2].where(has_scheme, s)
    slash = rest.str.find("/")
    hostport = rest.where(slash.lt(0), rest.str.split("/", n=1).str[0])
    pathq = pd.Series(
        np.where(slash.lt(0), "", ("/" + rest.str.split("/", n=1).str[1].fillna(""))),
        index=s.index,
    )
    host = hostport.str.lower()
    # strip default port for the matching scheme
    for sch, port in _DEFAULT_PORT.items():
        mask = scheme.eq(sch) & host.str.endswith(port)
        if mask.any():
            host = host.where(~mask, host.str[: -len(port)])
    # path / query
    split_q = pathq.str.partition("?")
    path, query = split_q[0], split_q[2]
    # collapse duplicate slashes until fixed point (vectorized replace)
    while path.str.contains("//", regex=False).any():
        path = path.str.replace("//", "/", regex=False)
    path = path.str.rstrip("/")
    needs_slash = path.ne("") & ~path.str.startswith("/")
    path = path.where(~needs_slash, "/" + path)
    # drop utm_* params
    has_q = query.ne("")
    if has_q.any():
        cleaned = (
            query[has_q]
            .str.split("&")
            .map(lambda ps: "&".join(p for p in ps if p and not p.startswith("utm_")))
        )
        query = query.copy()
        query[has_q] = cleaned
    out = scheme + "://" + host + path + np.where(query.ne(""), "?" + query, "")
    return out.to_numpy(dtype=object)


_HASH_KEY = "cs-ray-url-hash-"  # 16 bytes, fixed -> deterministic across runs


def hash_urls(urls) -> np.ndarray:
    """uint64 SipHash of (already canonical) URL strings, vectorized."""
    arr = np.asarray(urls, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash_url(url: str) -> int:
    return int(hash_urls(np.array([url], dtype=object))[0])


def host_of(url: str) -> str:
    """Host of a canonical URL."""
    rest = url.partition("://")[2]
    return rest.split("/", 1)[0]


def hosts_of(urls) -> np.ndarray:
    s = pd.Series(np.asarray(urls, dtype=object)).astype(str)
    rest = s.str.partition("://")[2]
    return rest.str.split("/", n=1).str[0].to_numpy(dtype=object)


def priority_of(url: str) -> np.float32:
    """Frontier priority — a pure function of the canonical URL.

    Deliberately depth-independent so that whichever parent discovers a URL
    first (a per-epoch race inside the seen-filter shards) cannot change its
    priority: crawl order stays deterministic (SURVEY.md §7.5). Seeds carry
    explicit priority 1.0 which dominates (hash-derived values are < 1.0).
    """
    return priorities_of(np.array([url], dtype=object))[0]


def priorities_of(urls) -> np.ndarray:
    h = hash_urls(urls)
    return ((h >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.float64).astype(
        np.float32
    ) / np.float32(65536.0)
