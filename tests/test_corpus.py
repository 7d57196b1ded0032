import os

import pyarrow.parquet as pq

from crawler_service_ray.sources.corpus import (
    DOCS_SCHEMA,
    bucket_path,
    corpus_meta,
    corpus_to_dict,
    generate_corpus,
    load_robots,
    page_url,
)
from crawler_service_ray.urls import canonicalize_url


def test_deterministic_and_cached(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = generate_corpus(d1, num_hosts=2, pages_per_host=10, num_buckets=4)
    generate_corpus(d2, num_hosts=2, pages_per_host=10, num_buckets=4)
    assert corpus_to_dict(d1) == corpus_to_dict(d2)
    # cache: second call with same params is a no-op
    mtime = os.path.getmtime(bucket_path(d1, 0))
    assert generate_corpus(d1, num_hosts=2, pages_per_host=10, num_buckets=4) == m1
    assert os.path.getmtime(bucket_path(d1, 0)) == mtime


def test_schema_and_layout(tmp_path):
    d = str(tmp_path / "c")
    generate_corpus(d, num_hosts=2, pages_per_host=10, num_buckets=4)
    assert corpus_meta(d)["num_buckets"] == 4
    t = pq.read_table(bucket_path(d, 0))
    assert t.schema.equals(DOCS_SCHEMA)
    ids = t["doc_id"].to_pylist()
    assert ids == sorted(ids), "bucket files must be sorted by doc_id"


def test_span_invariants(tmp_path):
    d = str(tmp_path / "s")
    generate_corpus(d, num_hosts=3, pages_per_host=20, num_buckets=4)
    docs = corpus_to_dict(d)
    assert page_url(0, 0) in docs
    for url, spans in docs.items():
        offsets = [o for (_k, _t, _m, o) in spans]
        assert offsets == list(range(len(spans))), url
        for kind, text, media_ref, _o in spans:
            assert kind in ("text", "media", "link", "compressed")
            if kind == "text":
                assert text and media_ref == ""
            elif kind == "compressed":
                # archive span: media_ref is the archive ref, text the
                # deterministic JSON payload of member docs
                assert media_ref and text
                import json

                doc = json.loads(text)
                assert doc["members"], media_ref
                for mem in doc["members"]:
                    assert mem["name"] and mem["spans"]
            else:
                assert media_ref
    # link targets mostly canonicalize to in-corpus pages (graph is connected)
    links = [
        canonicalize_url(m)
        for spans in docs.values()
        for (k, _t, m, _o) in spans
        if k == "link"
    ]
    hits = sum(1 for l in links if l in docs)
    assert hits > len(links) * 0.5


def test_robots(tmp_path):
    d = str(tmp_path / "r")
    generate_corpus(d, num_hosts=12, pages_per_host=5, num_buckets=4)
    r = load_robots(d)
    assert r["h0.test"] == ("/private",)
    assert r["h3.test"] == ("/private", "/p/1")
