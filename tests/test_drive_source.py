"""Cloud-drive connector (Box/GDrive-shaped paginated folder listings —
SURVEY.md §2 rows S4/S5) through the unchanged frontier engine."""

import pyarrow as pa

from crawler_service_ray.config import CrawlConfig, PolitenessConfig
from crawler_service_ray.pipelines.crawl import CrawlRun, fetched_table
from crawler_service_ray.stages.drive import (
    DriveFetcher,
    default_drive_seeds,
    drive_expected,
    generate_drive_fixture,
)


def _cfg(root, run_dir, **kw):
    d = dict(
        corpus_dir=root, run_dir=run_dir, source_kind="drive",
        seeds=default_drive_seeds(root),
        politeness=PolitenessConfig(min_gap_ms=1, epoch_ms=10000),
        max_epochs=30, num_seen_shards=2, force_mode="local",
        enrich_text=False,
    )
    d.update(kw)
    return CrawlConfig(**d)


def _frontier(urls, host):
    n = len(urls)
    return pa.table({
        "url": urls,
        "host": [host] * n,
        "priority": pa.array([0.0] * n, type=pa.float32()),
        "depth": pa.array([0] * n, type=pa.int32()),
        "host_rank": pa.array([0] * n, type=pa.int32()),
        "virtual_ts_ms": pa.array([0] * n, type=pa.int64()),
        "retries": pa.array([0] * n, type=pa.int16()),
    })


def test_drive_crawl_visits_whole_account(ray_session, tmp_path):
    root = str(tmp_path / "acct")
    generate_drive_fixture(root, num_drives=2, folders_per_drive=7,
                           files_per_folder=6, fanout=2, page_size=4)
    cfg = _cfg(root, str(tmp_path / "run"))
    summary = CrawlRun(cfg).run(resume=False)
    t = fetched_table(cfg.run_dir)
    urls = set(t["url"].to_pylist())
    # every folder page and every file of both drives, nothing else
    assert urls == drive_expected(root)
    assert summary["urls_fetched"] == len(urls)
    rows = {r["url"]: r for r in t.to_pylist()}
    # root folder has 2 subfolders + 6 files = 8 items -> 2 pages of 4;
    # page 0 carries 4 item links + the next-page link
    p0 = rows["drive://d0.drv/f/d0f0"]
    assert p0["status"] == 200
    assert "page 0 of 2 total 8" in p0["spans"][0]["text"]
    assert p0["n_links"] == 5
    assert p0["spans"][-1]["text"] == "next"
    p1 = rows["drive://d0.drv/f/d0f0/p/1"]
    assert p1["n_links"] == 4  # last page: no continuation link
    # non-text files carry a media span; text files don't
    media = [r for r in rows.values() if r["n_media_spans"] > 0]
    assert media and all("/x/" in r["url"] for r in media)
    txt = [r for r in rows.values()
           if "/x/" in r["url"] and r["n_media_spans"] == 0]
    assert txt and all("mime text/" in r["spans"][0]["text"] for r in txt)


def test_drive_pagination_covers_items_exactly_once(tmp_path):
    root = str(tmp_path / "acct")
    generate_drive_fixture(root, num_drives=1, folders_per_drive=3,
                           files_per_folder=9, fanout=2, page_size=4)
    f = DriveFetcher(root)
    # walk folder d0f0's pages by following only the emitted next links
    seen_items, url = [], "drive://d0.drv/f/d0f0"
    while url is not None:
        spans = f._doc_spans(url)
        assert spans is not None
        nxt = None
        for s in spans[1:]:
            if s["text"] == "next":
                nxt = s["media_ref"]
            else:
                seen_items.append(s["media_ref"])
        url = nxt
    fixture_items = f.folders["d0f0"]["items"]
    assert len(seen_items) == len(fixture_items)  # no dup, no loss
    assert len(set(seen_items)) == len(seen_items)
    want = {(f"drive://d0.drv/f/{it['id']}" if it["type"] == "folder"
             else f"drive://d0.drv/x/{it['id']}") for it in fixture_items}
    assert set(seen_items) == want


def test_drive_fetcher_404s(tmp_path):
    root = str(tmp_path / "acct")
    generate_drive_fixture(root, num_drives=2, folders_per_drive=2,
                           files_per_folder=2, fanout=2, page_size=4)
    f = DriveFetcher(root)
    out = f(_frontier([
        "drive://d0.drv/f/nope",        # unknown folder id
        "drive://d0.drv/f/d1f0",        # other drive's id: never leaks
        "drive://d0.drv/f/d0f0/p/7",    # page beyond total
        "drive://d9.drv/f/d0f0",        # unknown drive
        "drive://d0.drv/x/d0x0_0",      # valid file
        "drive://d0.drv/f/d0f0",        # valid folder
    ], "d0.drv"))
    st = dict(zip(out["url"].to_pylist(), out["status"].to_pylist()))
    assert st["drive://d0.drv/f/nope"] == 404
    assert st["drive://d0.drv/f/d1f0"] == 404
    assert st["drive://d0.drv/f/d0f0/p/7"] == 404
    assert st["drive://d9.drv/f/d0f0"] == 404
    assert st["drive://d0.drv/x/d0x0_0"] == 200
    assert st["drive://d0.drv/f/d0f0"] == 200


def test_drive_dataset_mode_matches_local(ray_session, tmp_path):
    root = str(tmp_path / "acct")
    generate_drive_fixture(root, num_drives=2, folders_per_drive=5,
                           files_per_folder=5, fanout=2, page_size=3)
    a = _cfg(root, str(tmp_path / "l"))
    b = _cfg(root, str(tmp_path / "d"), force_mode="dataset")
    CrawlRun(a).run(resume=False)
    CrawlRun(b).run(resume=False)
    assert fetched_table(a.run_dir).sort_by("url").equals(
        fetched_table(b.run_dir).sort_by("url")
    )


def test_drive_resume_equals_uninterrupted(ray_session, tmp_path):
    root = str(tmp_path / "acct")
    generate_drive_fixture(root)
    full = _cfg(root, str(tmp_path / "full"))
    CrawlRun(full).run(resume=False)
    part = _cfg(root, str(tmp_path / "part"), max_epochs=3)
    CrawlRun(part).run(resume=False)
    cont = _cfg(root, str(tmp_path / "part"), max_epochs=30)
    CrawlRun(cont).run(resume=True)
    assert fetched_table(full.run_dir).sort_by("url").equals(
        fetched_table(part.run_dir).sort_by("url")
    )
