"""Training-data export: partitioned output, manifest/readback parity,
dedup-filter semantics, and resume no-op."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads


def test_export_corpus_end_to_end(ray_session, tmp_path):
    from crawler_service_ray.pipelines.export import export_corpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "exp")
    m = export_corpus(sf, out, min_quality=0.5)
    assert m["rows_in"] == 500
    assert 0 < m["rows_written"] <= m["rows_in"]

    data = pads.dataset(os.path.join(out, "data"), partitioning="hive")
    df = data.to_table().to_pandas()
    # manifest counts match what a hive-partitioning consumer reads back
    got = df.groupby(["split", "lang_pred"]).size()
    assert {f"{s}/{lg}": int(n) for (s, lg), n in got.items()} \
        == m["partitions"]
    # every written row passes the filter, no duplicate texts survive
    assert (df["quality_score"] >= 0.5).all()
    assert not df["text"].duplicated().any()
    assert set(df["split"]) <= {"train", "val", "test"}

    # resume: manifest present -> same dict back, files untouched
    f = next(iter(data.files))
    mtime = os.path.getmtime(f)
    m2 = export_corpus(sf, out, min_quality=0.5)
    assert m2 == m and os.path.getmtime(f) == mtime


def test_export_lang_filter(ray_session, tmp_path):
    from crawler_service_ray.pipelines.export import export_corpus

    out = str(tmp_path / "exp_lang")
    # the synthetic corpora predict 'en' throughout (LangId is a marker
    # heuristic, oracle-checked for parity not ground truth), so 'en'
    # exercises the isin-filter path and 'zz' (below) the empty path
    m = export_corpus("/root/testdata/sf0.001", out,
                      min_quality=0.0, langs=["en"])
    assert m["rows_written"] > 0
    assert all(k.endswith("/en") for k in m["partitions"])


def test_export_empty_result(ray_session, tmp_path):
    from crawler_service_ray.pipelines.export import export_corpus

    out = str(tmp_path / "exp_empty")
    m = export_corpus("/root/testdata/sf0.001", out,
                      min_quality=0.0, langs=["zz"])
    assert m["rows_written"] == 0 and m["partitions"] == {}
    # resume returns the empty manifest too
    assert export_corpus("/root/testdata/sf0.001", out) == m


def test_export_packed_sequences(ray_session, tmp_path):
    from crawler_service_ray.pipelines.export import export_corpus

    out = str(tmp_path / "exp_packed")
    m = export_corpus("/root/testdata/sf0.001", out,
                      min_quality=0.5, packed=True, pack_capacity=256)
    # every surviving doc lands in exactly one sequence
    assert m["packed_docs"] == m["rows_written"]
    assert sum(m["sequences"].values()) > 0
    pt = pads.dataset(os.path.join(out, "packed"), partitioning="hive")
    pdf = pt.to_table().to_pandas()
    assert len(pdf) == sum(m["sequences"].values())
    # no sequence mixes splits (partition column is per-row exact) and
    # none exceeds capacity unless it is a single oversize doc
    over = pdf[pdf["seq_tokens"] > 256]
    assert (over["n_docs"] == 1).all()
    # token accounting is consistent with the doc table
    ddf = pads.dataset(os.path.join(out, "data"),
                       partitioning="hive").to_table().to_pandas()
    want = (ddf["text"].str.strip().str.split().str.len()).sum()
    assert m["packed_tokens"] == want


def test_export_run_crawl_to_training_data(ray_session, tiny_corpus,
                                           tmp_path):
    from crawler_service_ray.config import CrawlConfig
    from crawler_service_ray.pipelines.crawl import CrawlRun
    from crawler_service_ray.pipelines.export import export_run

    run = str(tmp_path / "run")
    cfg = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=run,
        seeds=["http://h0.test/p/0", "http://h1.test/p/0"],
        max_epochs=30, num_seen_shards=2)
    s = CrawlRun(cfg).run(resume=False)
    assert s["urls_fetched"] > 0

    out = str(tmp_path / "exp")
    m = export_run(run, out, min_quality=0.0, packed=True,
                   pack_capacity=256)
    # fetched docs + in-epoch archive members
    assert m["rows_in"] == s["urls_fetched"] + s["members_extracted"]
    assert 0 < m["rows_written"] <= m["rows_in"]
    assert m["packed_docs"] == m["rows_written"]

    df = pads.dataset(os.path.join(out, "data"),
                      partitioning="hive").to_table().to_pandas()
    # doc_id is the url; reassembled text is non-empty for 200s with
    # text spans, and the crawl's own enrichment scores rode along
    assert df["doc_id"].str.startswith("http").all()
    assert (df["text"].str.len() > 0).any()
    assert df["quality_score"].notna().all()
    # resume no-op
    assert export_run(run, out) == m


def test_export_run_multimodal_media(ray_session, tiny_corpus, tmp_path):
    """Interleaved text+media export: segments column preserves span
    order, media/ is corpus-deduped, manifest accounts both tables."""
    from crawler_service_ray.config import CrawlConfig
    from crawler_service_ray.pipelines.crawl import CrawlRun
    from crawler_service_ray.pipelines.export import export_run

    run = str(tmp_path / "run")
    cfg = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=run,
        seeds=["http://h0.test/p/0", "http://h1.test/p/0"],
        max_epochs=30, num_seen_shards=2)
    CrawlRun(cfg).run(resume=False)

    out = str(tmp_path / "exp_mm")
    m = export_run(run, out, min_quality=0.0, packed=True,
                   pack_capacity=256)

    df = pads.dataset(os.path.join(out, "data"),
                      partitioning="hive").to_table().to_pandas()
    # segments: interleaved, in span (offset) order, media preserved
    assert "segments" in df.columns
    n_media_total = 0
    saw_media = False
    for _, row in df.iterrows():
        segs = list(row["segments"])
        offs = [s["offset"] for s in segs]
        assert offs == sorted(offs)  # document order preserved
        kinds = {s["kind"] for s in segs}
        assert kinds <= {"text", "media"}  # links dropped
        media = [s for s in segs if s["kind"] == "media"]
        for s in media:
            assert s["media_ref"]
        n_media_total += len(media)
        saw_media = saw_media or bool(media)
        assert int(row["n_media"]) == len(media)
    assert saw_media  # the corpus genuinely carries media spans

    # media/: corpus-level dedup with use accounting
    mt = pads.dataset(os.path.join(out, "media")).to_table().to_pandas()
    assert not mt["media_ref"].duplicated().any()
    assert mt["n_uses"].sum() == n_media_total
    assert m["media_unique"] == len(mt)
    assert m["media_occurrences"] == n_media_total
    # content tier: features decoded per unique ref, canonical refs are
    # group minima and the manifest counts distinct payloads
    assert mt["content_hash"].str.len().eq(32).all()
    assert (mt["payload_bytes"] > 0).all()
    assert set(mt.loc[mt["decoded"], "media_type"]) <= {
        "image/png", "image/gif", "image/jpeg", "audio/wav"}
    grp = mt.groupby("content_hash")["media_ref"]
    assert (mt["canonical_ref"] == grp.transform("min")).all()
    assert m["media_content_unique"] == mt["content_hash"].nunique()
    # occurrences can only meet or exceed distinct refs (true repeats
    # are pinned by the oracle-checked mm_media_dedup query, whose
    # derived refs collide across docs by construction)
    assert m["media_occurrences"] >= m["media_unique"]

    # packed/: interleaved sequences keep every media ref in doc order
    pdf = pads.dataset(os.path.join(out, "packed"),
                       partitioning="hive").to_table().to_pandas()
    assert m["packed_media"] == n_media_total
    assert pdf["n_media"].sum() == n_media_total
    for _, row in pdf.iterrows():
        segs = list(row["segments"])
        assert int(row["n_media"]) == sum(
            1 for s in segs if s["kind"] == "media")

    # flag-narrowing rerun into the SAME dir must clear stale siblings
    m3 = export_run(run, out, min_quality=0.0, multimodal=False,
                    packed=False, resume=False)
    assert not os.path.exists(os.path.join(out, "media"))
    assert not os.path.exists(os.path.join(out, "packed"))
    assert "media_unique" not in m3

    # text-only escape hatch: no segments / media artifacts
    out2 = str(tmp_path / "exp_txt")
    m2 = export_run(run, out2, min_quality=0.0, multimodal=False)
    df2 = pads.dataset(os.path.join(out2, "data"),
                       partitioning="hive").to_table().to_pandas()
    assert "segments" not in df2.columns
    assert not os.path.exists(os.path.join(out2, "media"))
    assert "media_unique" not in m2
    assert m2["rows_written"] == m["rows_written"]


def test_export_corpus_multimodal(ray_session, tmp_path):
    """--sf-dir multimodal: interleaved derivation + media dedup over a
    plain documents shard (refs collide across docs by construction)."""
    from crawler_service_ray.pipelines.export import export_corpus

    out = str(tmp_path / "exp_mm_c")
    m = export_corpus("/root/testdata/sf0.001", out, min_quality=0.5,
                      packed=True, pack_capacity=256, multimodal=True)
    assert m["media_occurrences"] > m["media_unique"]  # true dedup
    assert m["packed_media"] == m["media_occurrences"]
    df = pads.dataset(os.path.join(out, "data"),
                      partitioning="hive").to_table().to_pandas()
    assert "segments" in df.columns
    assert (df["n_media"].to_numpy() >= 0).all()
    # per-doc media accounting is internally consistent
    assert df["n_media"].sum() == m["media_occurrences"]
    mt = pads.dataset(os.path.join(out, "media")).to_table().to_pandas()
    assert len(mt) == m["media_unique"]
    assert not mt["media_ref"].duplicated().any()
    assert m["media_content_unique"] <= m["media_unique"]
    assert (mt["canonical_ref"] ==
            mt.groupby("content_hash")["media_ref"].transform("min")).all()


def test_media_content_dedup_collapses_identical_payloads(ray_session):
    """Distinct refs serving identical bytes collapse to one canonical
    ref (content tier of the media dedup)."""
    import ray.data as rd

    from crawler_service_ray.functions.multimodal import (
        media_content_dedup,
    )

    df = pd.DataFrame({
        "media_ref": ["u/a", "u/b", "u/c", "u/d"],
        "content_hash": ["h1", "h1", "h2", "h1"],
        "n_uses": [3, 1, 2, 5],
    })
    out = media_content_dedup(
        rd.from_pandas(df, override_num_blocks=2), num_partitions=4
    ).to_pandas().sort_values("media_ref").reset_index(drop=True)
    assert list(out["canonical_ref"]) == ["u/a", "u/a", "u/c", "u/a"]
    assert list(out["content_dup_count"]) == [3, 3, 1, 3]


def test_export_multimodal_all_text_corpus(ray_session, tmp_path):
    """multimodal=True over docs that yield no media segments must still
    commit a schema-complete empty media/ table and zeroed accounting."""
    import ray.data as rd

    import crawler_service_ray.pipelines.export as ex

    # monkeypatch-free: drive _dedup_split_write through export_corpus
    # with a doc set too short to produce chunks beyond one (no media)
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf_tiny")
    os.makedirs(sf)
    import pyarrow as pa
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["the and of to a in is it that for on with as",
                          "was at by an be this are from the and of to"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([40, 40], type=pa.int64()),
    }), os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "exp_notmedia")
    m = ex.export_corpus(sf, out, min_quality=0.0, multimodal=True)
    assert m["rows_written"] == 2
    assert m["media_unique"] == 0
    assert m["media_occurrences"] == 0
    assert m["media_content_unique"] == 0
    mt = pads.dataset(os.path.join(out, "media")).to_table()
    assert mt.num_rows == 0 and "canonical_ref" in mt.schema.names

def test_export_media_merge_never_on_driver(ray_session, tmp_path,
                                            monkeypatch):
    """High-cardinality media refs: with the driver-merge bar lowered to
    fixture scale, the media/ table's aggregate must run through the
    hash-partitioned merge (grouped_apply on media_ref — never a driver
    collect) and produce byte-identical media accounting."""
    import crawler_service_ray.functions.relational as rel
    import crawler_service_ray.pipelines.export as ex

    # baseline: default (driver-merge) path at fixture scale
    out_a = str(tmp_path / "exp_a")
    m_a = ex.export_corpus("/root/testdata/sf0.001", out_a,
                           min_quality=0.5, multimodal=True)
    mt_a = (pads.dataset(os.path.join(out_a, "media")).to_table()
            .to_pandas().sort_values("media_ref").reset_index(drop=True))

    engaged = []
    orig = rel.grouped_apply

    def spy(ds, keys, fn, num_partitions=32):
        engaged.append((list(keys), num_partitions))
        return orig(ds, keys, fn, num_partitions=num_partitions)

    monkeypatch.setattr(rel, "grouped_apply", spy)
    monkeypatch.setattr(ex, "MEDIA_MERGE_DRIVER_MAX", 0)

    out_b = str(tmp_path / "exp_b")
    m_b = ex.export_corpus("/root/testdata/sf0.001", out_b,
                           min_quality=0.5, multimodal=True)
    media_merges = [e for e in engaged if e[0] == ["media_ref"]]
    assert media_merges and all(p >= 2 for _, p in media_merges)
    for k in ("rows_written", "media_unique", "media_occurrences",
              "media_content_unique"):
        assert m_b[k] == m_a[k], k
    mt_b = (pads.dataset(os.path.join(out_b, "media")).to_table()
            .to_pandas().sort_values("media_ref").reset_index(drop=True))
    pd.testing.assert_frame_equal(mt_b, mt_a, check_dtype=False)

def test_export_packed_bpe_token_budget(ray_session, tmp_path):
    """--bpe-merges makes pack_capacity mean real tokenizer tokens: the
    packed table's seq_tokens are BPE counts (sum matches an
    independent re-encode of the written docs), the manifest records
    the tokenizer, and budgets differ from the whitespace run."""
    import pyarrow.parquet as pq

    from crawler_service_ray.functions.text import (bpe_doc_token_counts,
                                                    bpe_train_merges)
    from crawler_service_ray.pipelines.export import export_corpus
    from crawler_service_ray.pipelines.queries import read_table

    sf = "/root/testdata/sf0.001"
    merges = bpe_train_merges(
        read_table(sf, "documents", columns=["doc_id", "text"]),
        num_merges=8)
    mpath = str(tmp_path / "merges.parquet")
    pq.write_table(pa.Table.from_pandas(merges), mpath)
    mlist = list(zip(merges["left"], merges["right"]))

    out_ws = str(tmp_path / "exp_ws")
    m_ws = export_corpus(sf, out_ws, min_quality=0.5, packed=True,
                         pack_capacity=256)
    out_bpe = str(tmp_path / "exp_bpe")
    m_bpe = export_corpus(sf, out_bpe, min_quality=0.5, packed=True,
                          pack_capacity=256, bpe_merges=mpath)
    assert m_bpe["tokenizer"] == "bpe"
    assert m_ws["tokenizer"] == "whitespace"
    assert m_bpe["bpe_merges"] == mpath
    assert m_bpe["rows_written"] == m_ws["rows_written"]
    assert m_bpe["packed_tokens"] != m_ws["packed_tokens"]

    # seq_tokens really are BPE counts: re-encode the written docs
    df = pads.dataset(os.path.join(out_bpe, "data"),
                      partitioning="hive").to_table().to_pandas()
    _, want = bpe_doc_token_counts(df["text"], mlist)
    assert m_bpe["packed_tokens"] == int(want.sum())
    assert (df["n_tokens"].to_numpy() == want).all()

    # multimodal packed path budgets BPE tokens too
    out_mm = str(tmp_path / "exp_mm_bpe")
    m_mm = export_corpus(sf, out_mm, min_quality=0.5, packed=True,
                         pack_capacity=256, multimodal=True,
                         bpe_merges=merges)
    assert m_mm["tokenizer"] == "bpe"
    mmdf = pads.dataset(os.path.join(out_mm, "data"),
                        partitioning="hive").to_table().to_pandas()
    _, want_mm = bpe_doc_token_counts(mmdf["text"], mlist)
    assert (mmdf["n_tokens"].to_numpy() == want_mm).all()
    assert m_mm["packed_tokens"] == int(want_mm.sum())

def test_export_lsh_lifecycle_chains_two_crawls(ray_session, tiny_corpus,
                                                tmp_path):
    """Crawl A bootstraps a persistent LSH index; crawl B (a mirror of
    A under different hosts — new URLs, identical content) exports
    against it and must report exactly the near-dup pairs that a
    full-corpus minhash_lsh_pairs over BOTH runs' curated docs finds
    touching B. Retrying B's index phase never double-indexes."""
    import glob
    import json as _json

    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_service_ray.config import CrawlConfig
    from crawler_service_ray.functions.dedup import minhash_lsh_pairs
    from crawler_service_ray.pipelines.crawl import CrawlRun
    from crawler_service_ray.pipelines.export import export_run

    run_a = str(tmp_path / "run_a")
    cfg = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=run_a,
        seeds=["http://h0.test/p/0", "http://h1.test/p/0"],
        max_epochs=30, num_seen_shards=2)
    CrawlRun(cfg).run(resume=False)

    # run B = a mirror site: same fetched content at rewritten hosts
    run_b = str(tmp_path / "run_b")
    for f in glob.glob(os.path.join(run_a, "epochs", "epoch=*",
                                    "fetched", "*.parquet")):
        t = pq.read_table(f)
        urls = pd.Series(t.column("url").to_pandas()).str.replace(
            "http://h", "http://m", regex=False)
        t = t.set_column(t.schema.get_field_index("url"), "url",
                         pa.array(urls, type=pa.string()))
        dst = f.replace(run_a, run_b)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        pq.write_table(t, dst)

    idx = str(tmp_path / "lsh_index")
    out_a = str(tmp_path / "exp_a_lsh")
    m_a = export_run(run_a, out_a, min_quality=0.0, multimodal=False,
                     lsh_index=idx)
    assert m_a["lsh"]["bootstrap"] is True
    assert m_a["lsh"]["delta_docs"] == m_a["rows_written"]
    assert m_a["lsh"]["cross_pairs"] == 0  # nothing indexed before A

    out_b = str(tmp_path / "exp_b_lsh")
    m_b = export_run(run_b, out_b, min_quality=0.0, multimodal=False,
                     lsh_index=idx)
    lsh = m_b["lsh"]
    assert lsh["bootstrap"] is False
    # every B doc mirrors an A doc: at least one cross pair per B doc
    assert lsh["cross_pairs"] >= m_b["rows_written"] > 0

    # machine-check the manifest counts against a full-corpus LSH run
    # over the union of both exports' curated docs, restricted to B
    import pyarrow.dataset as _pads
    docs_a = _pads.dataset(os.path.join(out_a, "data"),
                           partitioning="hive").to_table(
        columns=["doc_id", "text"]).to_pandas()
    docs_b = _pads.dataset(os.path.join(out_b, "data"),
                           partitioning="hive").to_table(
        columns=["doc_id", "text"]).to_pandas()
    union = rd.from_pandas(pd.concat([docs_a, docs_b],
                                     ignore_index=True))
    full = minhash_lsh_pairs(union, num_perm=128, bands=32,
                             threshold=0.7).to_pandas()
    b_ids = set(docs_b["doc_id"])
    want = (full[full["id_a"].isin(b_ids) | full["id_b"].isin(b_ids)]
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    got = (pq.read_table(os.path.join(out_b, "near_dups",
                                      "pairs.parquet")).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert lsh["near_dup_pairs"] == len(want)

    # idempotence: a post-crash retry (manifest lost, index appended)
    # re-reports the same pairs and never double-indexes
    def n_band_rows():
        return sum(pq.read_table(f).num_rows for f in
                   glob.glob(os.path.join(idx, "shard=*", "*.parquet")))

    n_rows = n_band_rows()
    os.remove(os.path.join(out_b, "export_manifest.json"))
    m_b2 = export_run(run_b, out_b, min_quality=0.0, multimodal=False,
                      lsh_index=idx)
    assert m_b2["lsh"]["near_dup_pairs"] == lsh["near_dup_pairs"]
    assert n_band_rows() == n_rows
    assert len(glob.glob(os.path.join(idx, "docs", "*.parquet"))) == 2


def test_export_shuffle_shards_layout(ray_session, tmp_path):
    """--shuffle-shards writes shard=K hive dirs whose membership is the
    deterministic global-hash-order partition: balanced, manifest-
    accounted, and identical on a fresh re-export (the skip-finished-
    shards contract)."""
    from crawler_service_ray.pipelines.export import export_corpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shuf")
    m = export_corpus(sf, out, min_quality=0.5, shuffle_shards=4)
    assert m["shuffle_shards"] == 4
    assert sum(m["shards"].values()) == m["rows_written"]

    data = pads.dataset(os.path.join(out, "data"), partitioning="hive")
    df = data.to_table().to_pandas()
    df["shard"] = df["shard"].astype("int64")
    got = df.groupby("shard").size()
    assert {str(k): int(n) for k, n in got.items()} == m["shards"]
    # reruns reproduce the exact membership (fresh out dir, no resume
    # short-circuit)
    out2 = str(tmp_path / "shuf2")
    m2 = export_corpus(sf, out2, min_quality=0.5, shuffle_shards=4,
                       resume=False)
    df2 = (pads.dataset(os.path.join(out2, "data"), partitioning="hive")
           .to_table().to_pandas())
    df2["shard"] = df2["shard"].astype("int64")
    a = df.sort_values("doc_id")[["doc_id", "shard"]].reset_index(drop=True)
    b = df2.sort_values("doc_id")[["doc_id", "shard"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert m2["shards"] == m["shards"]
    # the plain columns (split/lang/quality) still ride along intact
    assert set(df["split"]) <= {"train", "val", "test"}


def test_export_shuffle_shards_multimodal(ray_session, tmp_path):
    """The shard column coexists with the nested segments list<struct>
    (arrow end-to-end) and the media accounting is unchanged by the
    extra hive level."""
    from crawler_service_ray.pipelines.export import export_corpus

    out = str(tmp_path / "mm")
    m = export_corpus("/root/testdata/sf0.001", out, min_quality=0.5,
                      multimodal=True, shuffle_shards=2)
    assert m["shuffle_shards"] == 2
    assert sum(m["shards"].values()) == m["rows_written"]
    t = pads.dataset(os.path.join(out, "data"),
                     partitioning="hive").to_table()
    assert "segments" in t.schema.names
    assert t.num_rows == m["rows_written"]
    # media accounting matches a no-shards export of the same input
    out2 = str(tmp_path / "mm_plain")
    m2 = export_corpus("/root/testdata/sf0.001", out2, min_quality=0.5,
                       multimodal=True)
    assert m["media_unique"] == m2["media_unique"]
    assert m["media_occurrences"] == m2["media_occurrences"]
