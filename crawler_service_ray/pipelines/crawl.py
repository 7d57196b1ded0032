"""The epoch driver: BFS supersteps over a materialized frontier.

The fundamental inversion vs the reference (SURVEY.md §1.2): where the
reference streams paths through one shared in-memory ``Queue`` mutated by 8
threads (`/root/reference/crawlers/globus_base_preserved.py:427-428,256,351`)
and terminates via an all-workers-idle protocol (`:235-249`), this engine
materializes the frontier as an epoch-partitioned parquet table and loops:

  frontier_k → politeness admission (two-phase per-host top-K, stages/admit)
             → fetch/expand (actor-pool corpus lookup, stages/fetch)
             → outlink extract/canonicalize/robots/skip (stages/outlinks)
             → seen-filter anti-join (sharded cuckoo actors, state/seen)
             → frontier_{k+1} = deferred ∪ newly-discovered

terminating when frontier_{k+1} is empty — the deterministic replacement
for the reference's idle-detection (SURVEY.md §2.9).

Adaptive execution: an epoch whose frontier is large runs as a Ray Data
``Dataset`` pipeline (streaming, actor pools, the groupby("host") shuffle);
a tail epoch below ``local_epoch_threshold`` rows runs the SAME Arrow
kernels driver-locally against the same seen/metrics actors — identical
semantics, none of the per-execution orchestration overhead that would
dominate tiny epochs. Both paths are covered by the equivalence tests.

Checkpoint/resume (north rule): every epoch writes, inside a temp dir that
is atomically renamed to ``epochs/epoch=K`` only after success:
  fetched/            one parquet dir per epoch (the output table)
  frontier_next/      deferred + discovered parquet (input of epoch K+1)
  seen/shard_*.npz    seen-filter snapshots
  stats.parquet       the per-epoch crawl_stats row
  manifest.json       per-partition lineage: input files → output files
Resume = drop incomplete temp dirs, restore seen shards from the last
complete epoch, continue from its frontier_next. A finished run writes
``run_summary.json``; rerunning returns it without recomputation.
"""

from __future__ import annotations

import json
import os
import shutil
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..sources.corpus import load_robots
from ..stages.admit import admit_per_host, local_topk_mark
from ..stages.fetch import FETCHED_SCHEMA, CorpusFetcher
from ..stages.outlinks import (
    FRONTIER_SCHEMA,
    canon_and_filter,
    extract_links,
    probe_new,
    seed_frontier,
)
from ..state.metrics import LocalMetrics
from ..state.seen import (
    collect_stats,
    make_shards,
    restore_shards,
    snapshot_shards,
)

FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA]


def _parquet_files(d: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(d):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def _count_rows(files: list[str]) -> int:
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _write_table(t: pa.Table, directory: str, name: str) -> list[str]:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    pq.write_table(t, path)
    return [path]


class CrawlRun:
    def __init__(self, config: CrawlConfig):
        self.cfg = config
        self.run_dir = config.run_dir
        self.epochs_dir = os.path.join(self.run_dir, "epochs")
        self.robots = load_robots(config.corpus_dir)
        self.shards: list = []
        self.metrics: LocalMetrics | None = None
        self._local_fetcher: CorpusFetcher | None = None

    # -- layout helpers ---------------------------------------------------
    def _epoch_dir(self, k: int) -> str:
        return os.path.join(self.epochs_dir, f"epoch={k:05d}")

    def _complete_epochs(self) -> list[int]:
        if not os.path.isdir(self.epochs_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.epochs_dir)):
            if name.startswith("epoch=") and os.path.exists(
                os.path.join(self.epochs_dir, name, "manifest.json")
            ):
                out.append(int(name.split("=")[1]))
        return out

    # -- public API -------------------------------------------------------
    def run(self, resume: bool = True) -> dict:
        import ray

        summary_path = os.path.join(self.run_dir, "run_summary.json")
        if resume and os.path.exists(summary_path):
            with open(summary_path) as f:
                return json.load(f)

        os.makedirs(self.epochs_dir, exist_ok=True)
        # drop incomplete temp epoch dirs (failed mid-write)
        for name in os.listdir(self.epochs_dir):
            if name.startswith(".tmp_"):
                shutil.rmtree(os.path.join(self.epochs_dir, name))

        self.shards = make_shards(self.cfg.num_seen_shards)
        from ..state.metrics import MetricsActor

        self.metrics = LocalMetrics(MetricsActor.remote())
        self._robots_ref = ray.put(self.robots)

        if not resume:
            if os.path.isdir(self.epochs_dir):
                shutil.rmtree(self.epochs_dir)
                os.makedirs(self.epochs_dir)
            if os.path.exists(summary_path):
                os.remove(summary_path)
        done = self._complete_epochs() if resume else []
        if done:
            last = done[-1]
            restore_shards(self.shards, os.path.join(self._epoch_dir(last), "seen"))
            frontier_files = _parquet_files(
                os.path.join(self._epoch_dir(last), "frontier_next")
            )
            start = last + 1
        else:
            seeds_dir = os.path.join(self.run_dir, "seed_frontier")
            if os.path.isdir(seeds_dir):
                shutil.rmtree(seeds_dir)
            seed_t = seed_frontier(
                self.cfg.seeds, self.robots, tuple(self.cfg.skip_substrings),
                self.shards,
            )
            frontier_files = _write_table(seed_t, seeds_dir, "part-0.parquet")
            start = 0

        epoch_stats: list[dict] = []
        for k in range(start, self.cfg.max_epochs):
            n_frontier = _count_rows(frontier_files)
            if n_frontier == 0:
                break
            stats = self._run_epoch(k, frontier_files, n_frontier)
            epoch_stats.append(stats)
            frontier_files = _parquet_files(
                os.path.join(self._epoch_dir(k), "frontier_next")
            )

        prior = []
        for k in self._complete_epochs():
            sp = os.path.join(self._epoch_dir(k), "stats.parquet")
            prior.append(pq.read_table(sp).to_pylist()[0])
        summary = {
            "epochs": len(prior),
            "urls_fetched": int(sum(s["urls_fetched"] for s in prior)),
            "bytes": int(sum(s["bytes"] for s in prior)),
            "dedup_hits": int(sum(s["dedup_hits"] for s in prior)),
            "robots_denied": int(sum(s["robots_denied"] for s in prior)),
            "seen_size": int(
                sum(s["n_seen"] for s in collect_stats(self.shards))
            ),
            "config": self.cfg.to_json_dict(),
        }
        if _count_rows(frontier_files) == 0:
            with open(summary_path + ".tmp", "w") as f:
                json.dump(summary, f, indent=1)
            os.replace(summary_path + ".tmp", summary_path)
        return summary

    # -- one epoch --------------------------------------------------------
    def _run_epoch(
        self, k: int, frontier_files: list[str], n_frontier: int
    ) -> dict:
        mode = self.cfg.force_mode or (
            "local" if n_frontier < self.cfg.local_epoch_threshold else "dataset"
        )
        tmp = os.path.join(self.epochs_dir, f".tmp_epoch_{k:05d}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        fetched_dir = os.path.join(tmp, "fetched")
        next_dir = os.path.join(tmp, "frontier_next")
        os.makedirs(fetched_dir)
        os.makedirs(next_dir)

        if mode == "local":
            lineage = self._epoch_local(k, frontier_files, fetched_dir, next_dir)
        else:
            lineage = self._epoch_dataset(k, frontier_files, fetched_dir, next_dir)

        stats = self._epoch_stats(k, fetched_dir, next_dir, mode)
        pq.write_table(
            pa.Table.from_pylist([stats]), os.path.join(tmp, "stats.parquet")
        )
        snapshot_shards(self.shards, os.path.join(tmp, "seen"))
        manifest = {
            "epoch": k,
            "mode": mode,
            "input_frontier_files": frontier_files,
            "input_frontier_rows": n_frontier,
            # lineage paths are relative to the (renamed) epoch dir
            "outputs": {
                stage: [os.path.relpath(p, tmp) for p in files]
                for stage, files in lineage.items()
            },
            "stats": stats,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._epoch_dir(k))  # atomic commit of the epoch
        return stats

    # -- local (tail-epoch) path -----------------------------------------
    def _epoch_local(
        self, k: int, frontier_files: list[str], fetched_dir: str, next_dir: str
    ) -> dict:
        t = pa.concat_tables(
            [pq.read_table(f) for f in frontier_files]
        ).combine_chunks()
        adm = admit_per_host(t, self.cfg.politeness, k)
        admitted = adm.filter(adm["admitted"])
        deferred = adm.filter(pc.invert(adm["admitted"])).select(FRONTIER_COLS)
        _write_table(deferred, next_dir, "deferred-0.parquet")
        # deterministic fetch order (priority desc, url asc) — value-defined,
        # the sort here just makes the written files human-ordered
        idx = pc.sort_indices(
            admitted,
            sort_keys=[("priority", "descending"), ("url", "ascending")],
        )
        admitted = admitted.take(idx)
        if self._local_fetcher is None:
            self._local_fetcher = CorpusFetcher(self.cfg.corpus_dir, k)
        self._local_fetcher.set_epoch(k)
        fetched = self._local_fetcher(admitted)
        _write_table(fetched, fetched_dir, "part-0.parquet")
        links = extract_links(fetched.select(["url", "depth", "spans"]))
        cb = lambda name, v: self.metrics.add(k, name, v)  # noqa: E731
        filt = canon_and_filter(
            links, self.robots, tuple(self.cfg.skip_substrings), cb
        )
        newfr = probe_new(filt, self.shards, k, cb)
        _write_table(newfr, next_dir, "discovered-0.parquet")
        return {
            "fetched": _parquet_files(fetched_dir),
            "frontier_next": _parquet_files(next_dir),
        }

    # -- dataset (large-epoch) path --------------------------------------
    def _epoch_dataset(
        self, k: int, frontier_files: list[str], fetched_dir: str, next_dir: str
    ) -> dict:
        import ray
        import ray.data as rd

        cfg = self.cfg
        pol = cfg.politeness
        mark = partial(local_topk_mark, pol=pol)
        fr = rd.read_parquet(frontier_files)
        p1 = fr.map_batches(
            mark, batch_format="pyarrow", batch_size=cfg.admit_batch_size,
            zero_copy_batch=True,
        ).materialize()  # frontier-scale only: needed to split defer/cand
        p1.map_batches(
            lambda t: t.filter(t["defer1"]).select(FRONTIER_COLS),
            batch_format="pyarrow", zero_copy_batch=True,
        ).write_parquet(os.path.join(next_dir, "deferred1"))
        cand = p1.map_batches(
            lambda t: t.filter(pc.invert(t["defer1"].combine_chunks())),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        admit = partial(admit_per_host, pol=pol, epoch=k)
        adm = cand.groupby("host").map_groups(
            admit, batch_format="pyarrow"
        ).materialize()  # ≤ K×blocks rows per host after phase 1
        adm.map_batches(
            lambda t: t.filter(
                pc.invert(t["admitted"].combine_chunks())
            ).select(FRONTIER_COLS),
            batch_format="pyarrow", zero_copy_batch=True,
        ).write_parquet(os.path.join(next_dir, "deferred2"))
        admitted = adm.map_batches(
            lambda t: t.filter(t["admitted"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        admitted.map_batches(
            CorpusFetcher,
            fn_constructor_args=(cfg.corpus_dir, k),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency,
            zero_copy_batch=True,
        ).write_parquet(fetched_dir)
        # outlinks: re-read only the 3 needed columns of what we just wrote
        outstage = _OutlinkStage(
            self._robots_ref, tuple(cfg.skip_substrings), self.shards,
            self.metrics.actor, k,
        )
        rd.read_parquet(
            fetched_dir, columns=["url", "depth", "spans"]
        ).map_batches(
            outstage, batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency, zero_copy_batch=True,
        ).write_parquet(os.path.join(next_dir, "discovered"))
        return {
            "fetched": _parquet_files(fetched_dir),
            "frontier_next": _parquet_files(next_dir),
        }

    # -- per-epoch stats --------------------------------------------------
    def _epoch_stats(
        self, k: int, fetched_dir: str, next_dir: str, mode: str
    ) -> dict:
        pol = self.cfg.politeness
        cols = pads.dataset(_parquet_files(fetched_dir)).to_table(
            columns=["host", "status", "bytes", "n_links"]
        )
        hosts = pd.Series(cols["host"].to_numpy(zero_copy_only=False))
        per_host = hosts.value_counts()
        wait_ms = int(((per_host - 1).clip(lower=0) * pol.min_gap_ms).sum())
        status = cols["status"].to_numpy(zero_copy_only=False)
        mcounters = self.metrics.epoch_counters(k)
        deferred = _count_rows(
            [
                f
                for f in _parquet_files(next_dir)
                if "deferred" in os.path.basename(os.path.dirname(f))
                or os.path.basename(f).startswith("deferred")
            ]
        )
        discovered = _count_rows(
            [
                f
                for f in _parquet_files(next_dir)
                if "discovered" in os.path.basename(os.path.dirname(f))
                or os.path.basename(f).startswith("discovered")
            ]
        )
        return {
            "epoch": k,
            "mode": mode,
            "urls_fetched": int(cols.num_rows),
            "urls_200": int((status == 200).sum()),
            "urls_404": int((status == 404).sum()),
            "bytes": int(
                pc.sum(cols["bytes"]).as_py() or 0
            ),
            "links_total": int(pc.sum(cols["n_links"]).as_py() or 0),
            "dedup_hits": int(mcounters.get("dedup_hits", 0)),
            "robots_denied": int(mcounters.get("robots_denied", 0)),
            "skip_filtered": int(mcounters.get("skip_filtered", 0)),
            "candidates": int(mcounters.get("candidates", 0)),
            "deferred": int(deferred),
            "discovered": int(discovered),
            "politeness_wait_ms": wait_ms,
            "num_hosts": int(len(per_host)),
        }


class _OutlinkStage:
    """extract → canonicalize/filter → seen-probe, as one actor-pool stage.

    Robots rules arrive as a broadcast ``ray.put`` ref resolved once per
    actor; metrics are flushed synchronously once per batch (one tiny RPC).
    """

    def __init__(self, robots_ref, skip, shards, metrics_actor, epoch):
        import ray

        self.robots = ray.get(robots_ref)
        self.skip = skip
        self.shards = shards
        self.metrics_actor = metrics_actor
        self.epoch = epoch

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        counters: dict[str, int] = {}

        def cb(name, v):
            counters[name] = counters.get(name, 0) + int(v)

        links = extract_links(t)
        filt = canon_and_filter(links, self.robots, self.skip, cb)
        out = probe_new(filt, self.shards, self.epoch, cb)
        if counters and self.metrics_actor is not None:
            ray.get(self.metrics_actor.add_many.remote(self.epoch, counters))
        return out


def fetched_dataset(run_dir: str):
    """All fetched docs of a (possibly partial) run as one Dataset."""
    import ray.data as rd

    files: list[str] = []
    ep_root = os.path.join(run_dir, "epochs")
    for d in sorted(os.listdir(ep_root)):
        if d.startswith("epoch="):
            files.extend(_parquet_files(os.path.join(ep_root, d, "fetched")))
    return rd.read_parquet(files)


def crawl_stats_table(run_dir: str) -> pa.Table:
    files = sorted(
        os.path.join(run_dir, "epochs", d, "stats.parquet")
        for d in os.listdir(os.path.join(run_dir, "epochs"))
        if d.startswith("epoch=")
    )
    return pa.concat_tables([pq.read_table(f) for f in files])


def fetched_table(run_dir: str) -> pa.Table:
    """Driver-side load of all fetched rows (tests / small runs only)."""
    files = []
    ep_root = os.path.join(run_dir, "epochs")
    for d in sorted(os.listdir(ep_root)):
        if d.startswith("epoch="):
            files.extend(_parquet_files(os.path.join(ep_root, d, "fetched")))
    tables = [pq.read_table(f, schema=FETCHED_SCHEMA) for f in files]
    return pa.concat_tables(tables).combine_chunks()
