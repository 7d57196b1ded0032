"""Checkpoint/resume: kill after epoch k, resume, outputs byte-identical
(SURVEY.md §5.3; replaces the reference's restart-from-zero heartbeat
retry, /root/reference/application.py:25-58)."""

import json
import os
import shutil

from crawler_service_ray.config import CrawlConfig, PolitenessConfig
from crawler_service_ray.pipelines.crawl import CrawlRun, fetched_table
from crawler_service_ray.sources.corpus import default_seeds


def _cfg(corpus, run_dir, max_epochs=60):
    return CrawlConfig(
        corpus_dir=corpus,
        run_dir=run_dir,
        seeds=default_seeds(3),
        politeness=PolitenessConfig(min_gap_ms=200, epoch_ms=4000),
        max_epochs=max_epochs,
        num_seen_shards=4,
        force_mode="local",
    )


def test_resume_matches_uninterrupted(ray_session, tiny_corpus, tmp_path):
    full = _cfg(tiny_corpus, str(tmp_path / "full"))
    CrawlRun(full).run(resume=False)

    # "crash" after 3 epochs: run with max_epochs=3, then resume with full
    part = _cfg(tiny_corpus, str(tmp_path / "part"), max_epochs=3)
    CrawlRun(part).run(resume=False)
    assert not os.path.exists(os.path.join(part.run_dir, "run_summary.json"))
    resumed = _cfg(tiny_corpus, str(tmp_path / "part"))
    summary = CrawlRun(resumed).run(resume=True)
    assert os.path.exists(os.path.join(part.run_dir, "run_summary.json"))

    a = fetched_table(full.run_dir).sort_by("url").to_pylist()
    b = fetched_table(part.run_dir).sort_by("url").to_pylist()
    assert a == b
    n_fetch = sum(1 for r in a if r["src"] == "fetch")
    assert summary["urls_fetched"] == n_fetch
    assert summary["members_extracted"] == len(a) - n_fetch


def test_resume_dataset_mode(ray_session, tiny_corpus, tmp_path):
    """Interrupt/resume through the Dataset execution path too."""
    full = _cfg(tiny_corpus, str(tmp_path / "full"))
    CrawlRun(full).run(resume=False)
    part_cfg = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=str(tmp_path / "p"),
        seeds=default_seeds(3),
        politeness=PolitenessConfig(min_gap_ms=200, epoch_ms=4000),
        max_epochs=3, num_seen_shards=4, force_mode="dataset",
    )
    CrawlRun(part_cfg).run(resume=False)
    resumed = CrawlConfig(
        corpus_dir=tiny_corpus, run_dir=str(tmp_path / "p"),
        seeds=default_seeds(3),
        politeness=PolitenessConfig(min_gap_ms=200, epoch_ms=4000),
        max_epochs=60, num_seen_shards=4, force_mode="dataset",
    )
    CrawlRun(resumed).run(resume=True)
    a = fetched_table(full.run_dir).sort_by("url").to_pylist()
    b = fetched_table(str(tmp_path / "p")).sort_by("url").to_pylist()
    assert a == b


def test_incomplete_epoch_dir_is_discarded(ray_session, tiny_corpus, tmp_path):
    cfg = _cfg(tiny_corpus, str(tmp_path / "run"), max_epochs=2)
    CrawlRun(cfg).run(resume=False)
    # simulate a crash mid-epoch: a temp dir with partial junk
    tmp_epoch = os.path.join(cfg.run_dir, "epochs", ".tmp_epoch_00002")
    os.makedirs(os.path.join(tmp_epoch, "fetched"))
    with open(os.path.join(tmp_epoch, "fetched", "garbage.parquet"), "w") as f:
        f.write("not parquet")
    summary = CrawlRun(_cfg(tiny_corpus, cfg.run_dir)).run(resume=True)
    assert not os.path.exists(tmp_epoch)
    assert summary["urls_fetched"] > 0


def test_manifest_lineage(ray_session, tiny_corpus, tmp_path):
    cfg = _cfg(tiny_corpus, str(tmp_path / "run"))
    CrawlRun(cfg).run(resume=False)
    ep0 = os.path.join(cfg.run_dir, "epochs", "epoch=00000")
    with open(os.path.join(ep0, "manifest.json")) as f:
        m = json.load(f)
    assert m["epoch"] == 0
    assert m["input_frontier_rows"] == len(cfg.seeds)
    assert all(
        os.path.exists(os.path.join(ep0, p)) for p in m["outputs"]["fetched"]
    )
    assert all(
        os.path.exists(os.path.join(ep0, p))
        for p in m["outputs"]["frontier_next"]
    )
    assert m["stats"]["urls_fetched"] == len(cfg.seeds)
    # seen snapshots exist per epoch
    assert os.path.exists(os.path.join(ep0, "seen", "shard_0000.npz"))


def test_partition_writer_spills_at_threshold(ray_session, tmp_path):
    """A writer over its byte threshold spills mid-epoch (bounded actor
    memory); the union of spilled + final files equals everything sent."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from crawler_service_ray.state.writers import make_writers, send_partitioned

    out = str(tmp_path / "spill")
    writers = make_writers(2, flush_bytes=128)  # spill on nearly every append
    ray.get([w.begin_epoch.remote(out, "discovered") for w in writers])
    sent = []
    for batch in range(5):
        t = pa.table({"url": [f"u{batch}-{i}" for i in range(50)],
                      "host": [f"h{i % 8}" for i in range(50)]})
        parts = np.array([i % 8 for i in range(50)])
        send_partitioned(writers, 8, t, parts)
        sent.extend(t["url"].to_pylist())
    ray.get([w.flush.remote() for w in writers])
    import glob

    files = sorted(glob.glob(out + "/*.parquet"))
    # mid-epoch spills → more than one file sequence per (part, writer)
    assert any("-f0001" in f or "-f0002" in f for f in files)
    got = []
    for f in files:
        got.extend(pq.read_table(f)["url"].to_pylist())
    assert sorted(got) == sorted(sent)


def test_mid_epoch_crash_leaves_no_partial_commit(ray_session, tiny_corpus,
                                                  tmp_path):
    """A failure mid-epoch (after fetch side-writes, before the manifest)
    must leave NO committed epoch dir; resume wipes the temp dir, reruns
    the epoch from the checkpointed frontier, and the final outputs are
    byte-identical to an uninterrupted run — the contract that lets the
    expand/admission stages run with max_retries=0."""
    import pytest

    from crawler_service_ray.pipelines import crawl as crawl_mod

    full = _cfg(tiny_corpus, str(tmp_path / "full"))
    CrawlRun(full).run(resume=False)

    cfg = _cfg(tiny_corpus, str(tmp_path / "crash"))
    orig = crawl_mod.extract_links
    state = {"calls": 0}

    def exploding_extract(t):
        state["calls"] += 1
        if state["calls"] == 4:  # fail inside epoch 3, after the fetch
            raise RuntimeError("injected mid-epoch crash")
        return orig(t)

    crawl_mod.extract_links = exploding_extract
    try:
        with pytest.raises(RuntimeError, match="injected"):
            CrawlRun(cfg).run(resume=False)
    finally:
        crawl_mod.extract_links = orig

    epochs_dir = os.path.join(cfg.run_dir, "epochs")
    committed = [d for d in os.listdir(epochs_dir) if d.startswith("epoch=")]
    tmp_dirs = [d for d in os.listdir(epochs_dir) if d.startswith(".tmp_")]
    assert len(committed) == 3  # epochs 0-2 committed, epoch 3 not
    assert tmp_dirs  # the crashed epoch's temp dir remains for the wipe
    assert not os.path.exists(os.path.join(cfg.run_dir, "run_summary.json"))

    CrawlRun(cfg).run(resume=True)
    a = fetched_table(full.run_dir).sort_by("url")
    b = fetched_table(cfg.run_dir).sort_by("url")
    assert a.equals(b)
