"""Deterministic synthetic corpus of interleaved text+media documents.

This is the engine's "web": one row per fetchable URL, with a ``spans``
column of interleaved text / media / link spans (the exact ``input_hint``
schema — FIXTURES.md F1). It generalizes the remote filesystem the
reference crawls: a page's link spans are the analog of a directory's
subdirectory entries (`/root/reference/crawlers/globus_base_preserved.py:308-351`),
its text/media spans the analog of the file-metadata records.

Graph shape (all pure functions of (seed, host index, page index) — no
wall-clock, no uuid4):
  * in-host fanout-``F`` tree: page ``i`` links to ``i*F+1 .. i*F+F`` →
    known BFS depth structure;
  * cross-host links, some to nonexistent pages (→ 404 fetches);
  * a hot host ``h0`` receiving ~30% of cross links → exercises skew
    handling and politeness;
  * noisy duplicate links (uppercase host, ``#fragment``, trailing slash,
    ``utm_`` params) → exercises canonicalization + the seen filter.

Physical layout (scale design): ``corpus_dir/bucket=BBB/part.parquet`` with
``bucket = url_hash % num_buckets`` and rows sorted by ``doc_id`` inside a
bucket, so the fetch stage reads only the buckets a batch needs — the
Ray-Data analog of the reference's per-directory ``operation_ls`` fetch.
Lance is not installed in this sandbox (SURVEY.md §7.0); parquet directories
carry the identical logical schema.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..urls import hash_urls

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPANS_TYPE = pa.list_(SPAN_STRUCT)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPANS_TYPE)])

ROBOTS_SCHEMA = pa.schema(
    [("host", pa.string()), ("disallow", pa.list_(pa.string()))]
)


def page_url(host_idx: int, page_idx: int) -> str:
    return f"http://h{host_idx}.test/p/{page_idx}"


def default_seeds(num_hosts: int, n: int = 3) -> list[str]:
    return [page_url(j, 0) for j in range(min(n, num_hosts))]


def _noisy(url: str, variant: int) -> str:
    """Deterministic canonicalization noise on a link target."""
    v = variant % 5
    if v == 1:
        scheme, _, rest = url.partition("://")
        host, slash, path = rest.partition("/")
        return f"{scheme}://{host.upper()}{slash}{path}"
    if v == 2:
        return url + "#sec-2"
    if v == 3:
        return url + "/"
    if v == 4:
        return url + "?utm_source=feed&utm_campaign=x"
    return url


def _fix_offsets(spans: list[dict]) -> list[dict]:
    for idx, s in enumerate(spans):
        s["offset"] = idx
    return spans


def _archive_payload_json(j: int, i: int, h: int, *, num_hosts: int,
                          pages_per_host: int, nested: bool) -> str:
    """Deterministic JSON payload of a page-specific archive: 1-2 member
    docs, each with its own spans; member 0 carries a link (extracted
    content feeds the frontier, like the reference's second metadata pass
    over decompressed files,
    `/root/reference/legacy/posix_crawler.py:150-185,232`); ``nested``
    archives contain a second-level compressed span (the recursive
    fixed-point of `legacy/posix_crawler.py:114-147`)."""
    members = []
    n_members = 1 + (h >> 9) % 2
    for k in range(n_members):
        spans: list[dict] = [
            {"kind": "text",
             "text": f"member {k} of archive {j}/{i} tok{(h >> (3 * k)) % 7919}",
             "media_ref": "", "offset": 0}
        ]
        if k == 0:
            spans.append(
                {"kind": "link", "text": "from-archive",
                 "media_ref": page_url((j + 3) % num_hosts,
                                       (i * 5 + 1) % pages_per_host),
                 "offset": 0}
            )
        if nested and k == 0:
            inner = {
                "members": [
                    {"name": "n0",
                     "spans": [{"kind": "text",
                                "text": f"nested member of {j}/{i}",
                                "media_ref": "", "offset": 0}]}
                ]
            }
            spans.append(
                {"kind": "compressed", "text": json.dumps(inner, sort_keys=True),
                 "media_ref": f"http://h{j}.test/arch/{i}.zip!inner",
                 "offset": 0}
            )
        members.append({"name": f"m{k}", "spans": _fix_offsets(spans)})
    return json.dumps({"members": members}, sort_keys=True)


def _shared_payload_json(j: int, *, num_hosts: int,
                         pages_per_host: int) -> str:
    """Payload of the per-host SHARED archive — a pure function of the
    host so every referencing page carries an identical copy; the engine
    must extract it exactly once (the already-extracted set, SURVEY.md
    §2.7 D3, `/root/reference/legacy/posix_crawler.py:131-134`)."""
    members = [
        {"name": "s0",
         "spans": _fix_offsets([
             {"kind": "text", "text": f"shared archive of host {j} tok{j * 37}",
              "media_ref": "", "offset": 0},
             {"kind": "link", "text": "from-shared-archive",
              "media_ref": page_url(j, min(3, pages_per_host - 1)),
              "offset": 0},
         ])}
    ]
    return json.dumps({"members": members}, sort_keys=True)


def _page_spans(j: int, i: int, h: int, *, num_hosts: int,
                pages_per_host: int, fanout: int, cross: int) -> list[dict]:
    """Spans of page (host j, page i); ``h`` is the page's uint64 hash."""
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str = "", media_ref: str = ""):
        nonlocal off
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": off}
        )
        off += 1

    n_text = 1 + (h % 3)
    for s in range(n_text):
        add("text", f"host {j} page {i} span {s} tok{(h >> (8 * s)) % 9973} "
                    f"lorem ipsum dolor sit amet {(h >> 5) % 271}")
    if (h >> 3) % 2 == 0:
        add("media", media_ref=f"http://h{j}.test/media/{i}/{(h >> 7) % 17}.bin")
    # in-host tree children (BFS structure), with canonicalization noise
    for m in range(fanout):
        cid = i * fanout + 1 + m
        if cid < pages_per_host:
            raw = _noisy(page_url(j, cid), int((h >> (4 * m)) % 5))
            add("link", text=f"child {cid}", media_ref=raw)
            if m == 0:  # duplicate of the same target, different noise
                add("link", text=f"child {cid} again",
                    media_ref=_noisy(page_url(j, cid), 4))
    # cross-host links; target id may exceed pages_per_host → 404
    for m in range(cross):
        tj = (j + 1 + m + i) % num_hosts
        tid = (i * 13 + 7 * m + int(h % 11)) % max(1, int(pages_per_host * 1.25))
        add("link", text=f"x {tj}/{tid}", media_ref=page_url(tj, tid))
    # hot host: ~30% of pages also link to h0 → skew
    if num_hosts > 1 and (h >> 8) % 10 < 3:
        add("link", text="hot", media_ref=page_url(0, (i * 31 + 7) % pages_per_host))
    if i % 17 == 5:  # robots-blocked target (all hosts disallow /private)
        add("link", text="priv", media_ref=f"http://h{j}.test/private/{i}")
    # compressed-content spans (the decompressor analog,
    # `/root/reference/legacy/decompressor.py:13-75`): ~1/29 of pages carry
    # a page-specific archive (half 2-level nested); ~1/11 carry their
    # host's SHARED archive (identical payload from every referencing
    # page — extracted once per host, so its density is nearly free).
    # Page-archive density is kept low deliberately: each one amplifies
    # the fetched-doc volume with member docs (full enrichment cost), and
    # archives are a structural feature to exercise, not the bulk load.
    if h % 29 == 3:
        add("compressed",
            text=_archive_payload_json(
                j, i, h, num_hosts=num_hosts, pages_per_host=pages_per_host,
                nested=(h % 58 == 3),
            ),
            media_ref=f"http://h{j}.test/arch/{i}.zip")
    elif h % 11 == 5:
        add("compressed",
            text=_shared_payload_json(
                j, num_hosts=num_hosts, pages_per_host=pages_per_host
            ),
            media_ref=f"http://h{j}.test/arch/shared.zip")
    return spans


def robots_rules(num_hosts: int) -> dict[str, tuple[str, ...]]:
    """Per-host disallow path prefixes (deterministic).

    The reference has no robots handling (SURVEY.md §2.3 ST6 — new per
    north rule). Every host disallows ``/private``; every 5th host (j%5==3)
    additionally disallows the prefix ``/p/1`` (blocking p/1, p/10-19, ...).
    """
    rules = {}
    for j in range(num_hosts):
        dis = ["/private"]
        if j % 5 == 3:
            dis.append("/p/1")
        rules[f"h{j}.test"] = tuple(dis)
    return rules


def generate_corpus(
    corpus_dir: str,
    *,
    num_hosts: int = 3,
    pages_per_host: int = 40,
    fanout: int = 2,
    cross: int = 1,
    num_buckets: int = 16,
    seed: int = 42,
    overwrite: bool = False,
) -> dict:
    """Write the docs + robots tables; returns the meta dict.

    Idempotent cache: if ``meta.json`` exists with identical params the
    corpus is reused (bench + tests share generated corpora under /tmp).
    """
    meta = {
        "num_hosts": num_hosts,
        "pages_per_host": pages_per_host,
        "fanout": fanout,
        "cross": cross,
        "num_buckets": num_buckets,
        "seed": seed,
        # v2: compressed-content spans; v3: page-archive density 1/29
        "format": "parquet-bucketed-v3",
    }
    meta_path = os.path.join(corpus_dir, "meta.json")
    if os.path.exists(meta_path) and not overwrite:
        with open(meta_path) as f:
            if json.load(f) == meta:
                return meta
    if os.path.exists(corpus_dir):
        shutil.rmtree(corpus_dir)
    os.makedirs(corpus_dir)

    n = num_hosts * pages_per_host
    js = np.repeat(np.arange(num_hosts), pages_per_host)
    is_ = np.tile(np.arange(pages_per_host), num_hosts)
    urls = np.array(
        [page_url(int(j), int(i)) for j, i in zip(js, is_)], dtype=object
    )
    # page hashes: salt with the corpus seed so seeds change content
    hashes = hash_urls(np.array([f"{seed}|{u}" for u in urls], dtype=object))
    buckets = (hash_urls(urls) % np.uint64(num_buckets)).astype(np.int64)

    spans_all = [
        _page_spans(
            int(js[k]), int(is_[k]), int(hashes[k]),
            num_hosts=num_hosts, pages_per_host=pages_per_host,
            fanout=fanout, cross=cross,
        )
        for k in range(n)
    ]

    for b in range(num_buckets):
        idx = np.nonzero(buckets == b)[0]
        idx = idx[np.argsort(urls[idx].astype(str), kind="stable")]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array(urls[idx], type=pa.string()),
                "spans": pa.array([spans_all[k] for k in idx], type=SPANS_TYPE),
            },
            schema=DOCS_SCHEMA,
        )
        bdir = os.path.join(corpus_dir, f"bucket={b:03d}")
        os.makedirs(bdir)
        pq.write_table(tbl, os.path.join(bdir, "part.parquet"))

    rules = robots_rules(num_hosts)
    rt = pa.Table.from_pydict(
        {
            "host": pa.array(list(rules.keys()), type=pa.string()),
            "disallow": pa.array([list(v) for v in rules.values()],
                                 type=pa.list_(pa.string())),
        },
        schema=ROBOTS_SCHEMA,
    )
    pq.write_table(rt, os.path.join(corpus_dir, "robots.parquet"))
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def corpus_meta(corpus_dir: str) -> dict:
    with open(os.path.join(corpus_dir, "meta.json")) as f:
        return json.load(f)


def bucket_path(corpus_dir: str, bucket: int) -> str:
    return os.path.join(corpus_dir, f"bucket={bucket:03d}", "part.parquet")


def corpus_to_dict(corpus_dir: str) -> dict[str, list[tuple]]:
    """Load the whole corpus as {url: [(kind, text, media_ref, offset)...]}.

    Oracle/test-side only — materializes everything; never used by the
    engine.
    """
    out: dict[str, list[tuple]] = {}
    nb = corpus_meta(corpus_dir)["num_buckets"]
    for b in range(nb):
        t = pq.read_table(bucket_path(corpus_dir, b))
        ids = t["doc_id"].to_pylist()
        spans = t["spans"].to_pylist()
        for u, sp in zip(ids, spans):
            out[u] = [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp
            ]
    return out


def load_robots(corpus_dir: str) -> dict[str, tuple[str, ...]]:
    t = pq.read_table(os.path.join(corpus_dir, "robots.parquet"))
    return {
        h: tuple(d)
        for h, d in zip(t["host"].to_pylist(), t["disallow"].to_pylist())
    }
