"""Nested-content expansion (the decompressor analog): compressed spans
expand in-epoch into member docs, recursively, exactly once per archive —
engine vs oracle parity is in test_crawl_equivalence; here the operator's
own invariants."""

import pyarrow as pa

from crawler_service_ray.config import CrawlConfig, PolitenessConfig
from crawler_service_ray.oracle import oracle_crawl
from crawler_service_ray.pipelines.crawl import (
    CrawlRun,
    crawl_stats_table,
    fetched_table,
)
from crawler_service_ray.sources.corpus import default_seeds
from crawler_service_ray.stages.archives import expand_archives
from crawler_service_ray.stages.fetch import FETCHED_SCHEMA


def _cfg(corpus, run_dir, **kw):
    d = dict(
        corpus_dir=corpus, run_dir=run_dir, seeds=default_seeds(3),
        politeness=PolitenessConfig(min_gap_ms=100, epoch_ms=4000),
        max_epochs=60, num_seen_shards=4, force_mode="local",
    )
    d.update(kw)
    return CrawlConfig(**d)


def test_archive_expansion_two_levels_and_shared_dedup(
    ray_session, tiny_corpus, tmp_path
):
    cfg = _cfg(tiny_corpus, str(tmp_path / "run"))
    CrawlRun(cfg).run(resume=False)
    t = fetched_table(cfg.run_dir)
    rows = t.to_pylist()
    members = [r for r in rows if r["src"] == "archive"]
    assert members, "corpus must contain archives reachable from seeds"
    # 2-level nesting actually exercised: nested members carry '!inner#'
    nested = [r for r in members if "!inner#" in r["url"]]
    assert nested, "2-level nested archives must be extracted"
    # members have real spans and stats columns
    for r in members:
        assert r["status"] == 200
        assert r["spans"], r["url"]
        assert r["n_text_spans"] >= 1
    # exactly-once extraction: member urls unique
    urls = [r["url"] for r in members]
    assert len(urls) == len(set(urls))
    # the shared archive was referenced by >1 page but extracted once
    stats = crawl_stats_table(cfg.run_dir).to_pylist()
    assert sum(s["archives_dup"] for s in stats) > 0, (
        "shared archives must trigger the already-extracted set"
    )
    ora = oracle_crawl(cfg)
    assert sum(s["archives_expanded"] for s in stats) == len(ora.extracted)
    assert sum(s["members_extracted"] for s in stats) == len(
        ora.member_records
    )


def test_expand_archives_noop_without_compressed(ray_session):
    # a batch with no compressed spans passes through untouched
    t = pa.Table.from_pylist(
        [
            {
                "doc_id": "u", "url": "u", "host": "h", "priority": 1.0,
                "depth": 0, "fetch_epoch": 0, "host_rank": 0,
                "virtual_ts_ms": 0, "retries": 0, "status": 200,
                "src": "fetch",
                "spans": [{"kind": "text", "text": "x", "media_ref": "",
                           "offset": 0}],
                "n_text_spans": 1, "n_media_spans": 0, "n_links": 0,
                "bytes": 1,
            }
        ],
        schema=FETCHED_SCHEMA,
    )
    out = expand_archives(t, shards=[], epoch=0)
    assert out is t
