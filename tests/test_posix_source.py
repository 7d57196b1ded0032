"""POSIX directory-tree source (the Source-seam proof) and the paginated
consumer drain."""

import os

import pyarrow as pa

from crawler_service_ray.config import CrawlConfig, PolitenessConfig
from crawler_service_ray.pipelines.crawl import (
    CrawlRun,
    drain_fetched,
    fetched_table,
)
from crawler_service_ray.stages.posix import PosixFetcher, walk_expected


def _make_tree(root):
    os.makedirs(os.path.join(root, "a", "a1"))
    os.makedirs(os.path.join(root, "b"))
    for p, content in [
        ("readme.txt", "hello world"),
        ("a/notes.md", "alpha beta"),
        ("a/a1/deep.log", "x" * 100),
        ("a/img.png", "not really a png"),
        ("b/data.bin", "binary-ish"),
    ]:
        with open(os.path.join(root, p), "w") as f:
            f.write(content)


def _cfg(root, run_dir, **kw):
    d = dict(
        corpus_dir=root, run_dir=run_dir, source_kind="posix",
        seeds=["posix://data"],
        politeness=PolitenessConfig(min_gap_ms=1, epoch_ms=10000),
        max_epochs=20, num_seen_shards=2, force_mode="local",
        enrich_text=False,
    )
    d.update(kw)
    return CrawlConfig(**d)


def test_posix_crawl_visits_whole_tree(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _make_tree(root)
    cfg = _cfg(root, str(tmp_path / "run"))
    summary = CrawlRun(cfg).run(resume=False)
    t = fetched_table(cfg.run_dir)
    urls = set(t["url"].to_pylist())
    assert urls == walk_expected(root)
    assert summary["urls_fetched"] == len(urls)
    # file docs carry stat metadata; binary files carry a media span
    rows = {r["url"]: r for r in t.to_pylist()}
    f = rows["posix://data/readme.txt"]
    assert f["status"] == 200
    assert "size 11" in f["spans"][0]["text"]
    assert rows["posix://data/b/data.bin"]["n_media_spans"] == 1
    assert rows["posix://data/a"]["n_links"] == 3  # a1, img.png, notes.md


def test_posix_dataset_mode_matches_local(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _make_tree(root)
    a = _cfg(root, str(tmp_path / "l"))
    b = _cfg(root, str(tmp_path / "d"), force_mode="dataset")
    CrawlRun(a).run(resume=False)
    CrawlRun(b).run(resume=False)
    assert fetched_table(a.run_dir).sort_by("url").equals(
        fetched_table(b.run_dir).sort_by("url")
    )


def test_posix_fetcher_404_and_traversal_guard(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    _make_tree(root)
    f = PosixFetcher(root)
    t = pa.table(
        {
            "url": ["posix://data/missing", "posix://data/../escape",
                    "posix://database/readme.txt", "posix://data/readme.txt"],
            "host": ["data"] * 4,
            "priority": pa.array([0.0] * 4, type=pa.float32()),
            "depth": pa.array([0] * 4, type=pa.int32()),
            "host_rank": pa.array([0] * 4, type=pa.int32()),
            "virtual_ts_ms": pa.array([0] * 4, type=pa.int64()),
            "retries": pa.array([0] * 4, type=pa.int16()),
        }
    )
    out = f(t)
    st = dict(zip(out["url"].to_pylist(), out["status"].to_pylist()))
    assert st["posix://data/missing"] == 404
    assert st["posix://data/../escape"] == 404  # cannot escape the root
    # a LONGER host sharing the alias prefix must not map into the tree
    assert st["posix://database/readme.txt"] == 404
    assert st["posix://data/readme.txt"] == 200


def test_drain_fetched_pagination(ray_session, tiny_corpus, tmp_path):
    from crawler_service_ray.sources.corpus import default_seeds

    cfg = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=str(tmp_path / "run"),
        seeds=default_seeds(3), max_epochs=10, num_seen_shards=2,
        force_mode="local",
    )
    CrawlRun(cfg).run(resume=False)
    full = fetched_table(cfg.run_dir)
    # drain in pages of 37; concatenation must equal the full table in
    # (epoch, url) order, regardless of page boundaries
    pages, cursor = [], None
    while True:
        page, cursor = drain_fetched(cfg.run_dir, 37, cursor)
        if page.num_rows == 0 and cursor is None:
            break
        pages.append(page)
        if cursor is None:
            break
    drained = pa.concat_tables(pages)
    assert drained.num_rows == full.num_rows
    want = full.sort_by([("fetch_epoch", "ascending"), ("url", "ascending")])
    assert drained["url"].to_pylist() == want["url"].to_pylist()
    # resumability: a cursor from one process works in a "new" one (pure
    # value, no in-memory state) — re-drain from the 2nd page's cursor
    p1, c1 = drain_fetched(cfg.run_dir, 37)
    p2a, _ = drain_fetched(cfg.run_dir, 37, c1)
    p2b, _ = drain_fetched(cfg.run_dir, 37, c1)
    assert p2a.equals(p2b)
    assert p2a["url"].to_pylist() == drained.slice(37, 37)["url"].to_pylist()
