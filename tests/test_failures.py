"""Transient fetch failures, retries and the failed table (the reference's
retry loop + failed_dirs.json, globus_base_preserved.py:283-301,473-477)."""

import os

from crawler_service_ray.config import CrawlConfig, PolitenessConfig
from crawler_service_ray.oracle import oracle_crawl
from crawler_service_ray.pipelines.crawl import (
    CrawlRun,
    _parquet_files,
    fetched_table,
)
from crawler_service_ray.sources.corpus import default_seeds


def _cfg(corpus, run_dir, **kw):
    d = dict(
        corpus_dir=corpus, run_dir=run_dir, seeds=default_seeds(3),
        politeness=PolitenessConfig(min_gap_ms=200, epoch_ms=4000),
        max_epochs=60, num_seen_shards=4, force_mode="local",
        flaky_every=7,
    )
    d.update(kw)
    return CrawlConfig(**d)


def _attempts(run_dir):
    t = fetched_table(run_dir)
    return sorted(
        (r["url"], r["fetch_epoch"], r["status"], r["retries"])
        for r in t.select(
            ["url", "fetch_epoch", "status", "retries", "src"]
        ).to_pylist()
        if r["src"] == "fetch"  # fetch attempts only, not archive members
    )


def test_flaky_retry_matches_oracle(ray_session, tiny_corpus, tmp_path):
    cfg = _cfg(tiny_corpus, str(tmp_path / "run"))
    CrawlRun(cfg).run(resume=False)
    ora = oracle_crawl(cfg)
    eng = _attempts(cfg.run_dir)
    # per-attempt multiset equality on (url, epoch, status)
    ora_attempts = sorted((u, ep, st) for (u, ep, _o, st, _s, _p) in ora.records)
    assert [(u, e, s) for (u, e, s, _r) in eng] == ora_attempts
    # stats parity under flakiness: retry re-entries count as `discovered`
    # in both execution modes, matching the oracle's accounting
    from crawler_service_ray.pipelines.crawl import crawl_stats_table

    stats = crawl_stats_table(cfg.run_dir).to_pylist()
    ora_stats = {s["epoch"]: s for s in ora.per_epoch_counts}
    for s in stats:
        o = ora_stats[s["epoch"]]
        assert s["discovered"] == o["discovered"], s["epoch"]
        assert s["deferred"] == o["deferred"], s["epoch"]
        assert s["urls_fetched"] == o["urls_fetched"], s["epoch"]
    # there were real 503s and each flaky URL eventually succeeded
    n503 = sum(1 for (_u, _e, s, _r) in eng if s == 503)
    assert n503 > 0
    failed_urls = {u for (u, _e, s, _r) in eng if s == 503}
    ok_urls = {u for (u, _e, s, _r) in eng if s == 200}
    assert failed_urls <= ok_urls | {u for (u, _e, s, _r) in eng if s == 404}
    # retried attempts carry retries=1
    assert any(r == 1 for (_u, _e, s, r) in eng if s == 200)
    # no failed-table rows (flaky URLs succeed on attempt 1)
    ep_root = os.path.join(cfg.run_dir, "epochs")
    failed_files = [
        f
        for d in os.listdir(ep_root)
        for f in _parquet_files(os.path.join(ep_root, d, "failed"))
    ]
    assert not failed_files
    assert not ora.failed


def test_max_retries_zero_populates_failed_table(ray_session, tiny_corpus,
                                                 tmp_path):
    cfg = _cfg(tiny_corpus, str(tmp_path / "run"), max_retries=0)
    CrawlRun(cfg).run(resume=False)
    ora = oracle_crawl(cfg)
    assert len(ora.failed) > 0
    ep_root = os.path.join(cfg.run_dir, "epochs")
    failed_files = [
        f
        for d in sorted(os.listdir(ep_root))
        for f in _parquet_files(os.path.join(ep_root, d, "failed"))
    ]
    assert failed_files
    import pyarrow.parquet as pq

    rows = []
    for f in failed_files:
        rows.extend(pq.read_table(f).to_pylist())
    eng_failed = sorted((r["url"], r["epoch"]) for r in rows)
    assert eng_failed == sorted((u, e) for (u, e, _r) in ora.failed)
    assert all(r["error"] == "fetch_failed_503" for r in rows)


def test_flaky_dataset_mode_matches_local(ray_session, tiny_corpus, tmp_path):
    a = _cfg(tiny_corpus, str(tmp_path / "a"))
    b = _cfg(tiny_corpus, str(tmp_path / "b"), force_mode="dataset",
             max_epochs=6)
    a6 = _cfg(tiny_corpus, str(tmp_path / "a6"), max_epochs=6)
    CrawlRun(a6).run(resume=False)
    CrawlRun(b).run(resume=False)
    assert _attempts(a6.run_dir) == _attempts(b.run_dir)
    # per-epoch stats identical across modes even with flakiness (retry
    # rows land under `discovered` in BOTH modes)
    from crawler_service_ray.pipelines.crawl import crawl_stats_table

    keys = ("urls_fetched", "urls_503", "discovered", "deferred",
            "dedup_hits", "archives_expanded", "members_extracted")
    sa = crawl_stats_table(a6.run_dir).to_pylist()
    sb = crawl_stats_table(b.run_dir).to_pylist()
    assert [{k: s[k] for k in keys} for s in sa] == [
        {k: s[k] for k in keys} for s in sb
    ]
