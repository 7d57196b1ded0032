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
``Dataset`` pipeline over host partitions (see below); a tail epoch below
``local_epoch_threshold`` rows runs the SAME Arrow kernels driver-locally
against the same seen/metrics actors — identical semantics, none of the
per-execution orchestration overhead that would dominate tiny epochs. Both
paths are covered by the equivalence tests.

Partitioning (the design that replaced a per-epoch groupby("host")
shuffle): ONE partitioning key — ``hash(host) % num_host_partitions`` — is
reused across every epoch. Every stage that emits frontier rows (seeds,
deferrals, discoveries) writes them pre-split by that key into files named
``...-pNNNN-...``, so the next epoch's admission reads arrive host-complete
with NO exchange at all: the "shuffle" happens as a side effect of writing
the checkpoint files the north rule requires anyway. Measured against both
Ray shuffle strategies on a 1.4M-row frontier, the sort shuffle cost >10 s
of non-task overhead per epoch and hash shuffle more; this path costs zero.
Skew note: a pathological host whose pending frontier outgrows one
partition task's memory is handled by priority-cutoff frontier SPILLING
(state/spill.py, ``frontier_spill_rows``): the host keeps its
top-priority slice live, the tail spills to immutable sorted chunks
refilled best-first as the slice drains — admission order and the final
fetched set are identical to the unbounded run (tests/test_spill.py
asserts byte-identical output). The reference simply drops oversized
directories (`/root/reference/crawlers/globus_base_preserved.py:293-297`).

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
import re
import shutil
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..sources.corpus import load_robots
from ..stages.admit import admit_per_host
from ..stages.archives import expand_archives
from ..stages.enrich import enrich_fetched
from ..stages.fetch import (
    FETCHED_SCHEMA,
    CorpusFetcher,
    SharedBucketProvider,
    put_corpus,
)
from ..stages.outlinks import (
    FRONTIER_SCHEMA,
    canon_and_filter,
    extract_links,
    probe_new,
    probe_new_finish,
    probe_new_start,
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


def _enrich_parallel(t: pa.Table, min_rows: int = 4096,
                     num_chunks: int = 8) -> pa.Table:
    """Local-path enrich: the kernel is row-independent, so a tail/warmup
    epoch big enough to beat task-dispatch cost fans out as plain Ray
    tasks (the table ships via the object store once per chunk, results
    concat in order — output identical to the serial call). The serial
    enrich was the local path's dominant term (measured 1.1 s of 3.2 s
    driver-side at bench scale); small epochs stay serial."""
    import ray

    if t.num_rows < min_rows:
        return enrich_fetched(t)
    global _ENRICH_TASK
    if _ENRICH_TASK is None:
        _ENRICH_TASK = ray.remote(num_cpus=1)(enrich_fetched)
    step = -(-t.num_rows // num_chunks)
    refs = [
        _ENRICH_TASK.remote(t.slice(i, step))
        for i in range(0, t.num_rows, step)
    ]
    return pa.concat_tables(ray.get(refs))


_ENRICH_TASK = None


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
        self.spill_dir = os.path.join(self.run_dir, "spill")
        if config.frontier_spill_rows and config.force_mode == "local":
            raise ValueError(
                "frontier_spill_rows requires dataset mode (spill state "
                "is per host partition)"
            )
        # posix source trees have no robots sidecar (everything allowed)
        self.robots = (
            load_robots(config.corpus_dir)
            if config.source_kind == "corpus" else {}
        )
        self.shards: list = []
        self.metrics: LocalMetrics | None = None
        self._local_fetcher = None
        self._robots_part_refs: list | None = None

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
    def close(self) -> None:
        """Kill this run's service actors (seen shards, writers, metrics).

        Actor handles are only reference-counted — dropping a CrawlRun
        does NOT promptly stop its actors, and each seen shard reserves
        0.25 CPU. A second run in the same driver session then schedules
        against the leak: measured 12 s → 67 s on the sf0.1 bench corpus
        until the explicit kills below were added. run() always tears
        down in a finally; every durable artifact (epoch parquet, seen
        snapshots, manifests) is on disk, so resume never needs a live
        actor."""
        import ray

        for a in list(self.shards) + list(getattr(self, "writers", [])):
            try:
                ray.kill(a)
            except Exception:
                pass
        if self.metrics is not None:
            try:
                ray.kill(self.metrics.actor)
            except Exception:
                pass
        self.shards, self.writers, self.metrics = [], [], None

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

        try:
            return self._run_body(resume, summary_path)
        finally:
            self.close()

    def _run_body(self, resume: bool, summary_path: str) -> dict:
        import ray

        self.shards = make_shards(self.cfg.num_seen_shards)
        from ..state.metrics import MetricsActor
        from ..state.writers import make_writers

        self.writers = make_writers(
            max(4, self.cfg.num_host_partitions // 4)
        )
        self.metrics = LocalMetrics(MetricsActor.remote())
        if self.cfg.robots_at_admission:
            # the 10^9-host scale path (config.py): rules split by the
            # SAME run-wide host partition key as the frontier, one
            # object-store entry per partition — each admission task
            # resolves only its own hosts' rules; discovery-time
            # filtering is disabled (empty broadcast dict)
            P = self.cfg.num_host_partitions
            per_part: list[dict] = [{} for _ in range(P)]
            if self.robots:
                hosts_arr = np.array(list(self.robots), dtype=object)
                parts = _host_partitions_of(hosts_arr, P)
                for (h, rules), p in zip(self.robots.items(), parts):
                    per_part[int(p)][h] = rules
            self._robots_part_refs = [ray.put(d) for d in per_part]
            self._robots_ref = ray.put({})
        else:
            self._robots_part_refs = None
            self._robots_ref = ray.put(self.robots)
        if self.cfg.source_kind == "corpus":
            # corpus buckets: loaded+indexed once, object-store-shared
            # zero-copy (cached per driver process across CrawlRuns; keyed
            # by the corpus META SIGNATURE, not just the path, so a corpus
            # regenerated in place with different params never serves
            # stale buckets)
            self._corpus_sig = _corpus_signature(self.cfg.corpus_dir)
            warm_corpus(self.cfg.corpus_dir)
            self._corpus_refs, self._corpus_nb = _CORPUS_REFS[
                self._corpus_sig
            ]
        elif self.cfg.source_kind == "drive":
            # drive fixture: loaded per worker in DriveFetcher.__init__;
            # sig includes the fixture file's (mtime, size) so a fixture
            # regenerated in place never serves a stale per-worker cache
            from ..stages.drive import fixture_path

            fp = fixture_path(self.cfg.corpus_dir)
            st = os.stat(fp)
            self._corpus_sig = f"drive|{fp}|{st.st_mtime_ns}|{st.st_size}"
            self._corpus_refs, self._corpus_nb = None, 0
        else:  # posix: the tree is read directly by each fetch task
            self._corpus_sig = f"posix|{os.path.abspath(self.cfg.corpus_dir)}"
            self._corpus_refs, self._corpus_nb = None, 0

        if not resume:
            if os.path.isdir(self.epochs_dir):
                shutil.rmtree(self.epochs_dir)
                os.makedirs(self.epochs_dir)
            if os.path.exists(summary_path):
                os.remove(summary_path)
        done = self._complete_epochs() if resume else []
        spill_manifests: dict[int, str] = {}
        if done:
            last = done[-1]
            # snapshot chain: each epoch checkpoints only its new hashes
            # (delta) with periodic fulls — restore replays the whole chain
            restore_shards(
                self.shards,
                [os.path.join(self._epoch_dir(k), "seen") for k in done],
            )
            frontier_files = _parquet_files(
                os.path.join(self._epoch_dir(last), "frontier_next")
            )
            spill_manifests = _spill_manifest_files(self._epoch_dir(last))
            start = last + 1
        else:
            seeds_dir = os.path.join(self.run_dir, "seed_frontier")
            if os.path.isdir(seeds_dir):
                shutil.rmtree(seeds_dir)
            seed_t = seed_frontier(
                self.cfg.seeds, self.robots, tuple(self.cfg.skip_substrings),
                self.shards,
            )
            _sidewrite_partitioned(
                seed_t, seeds_dir, "seed", self.cfg.num_host_partitions
            )
            frontier_files = _parquet_files(seeds_dir)
            start = 0

        from ..state import spill as spill_mod

        epoch_stats: list[dict] = []
        for k in range(start, self.cfg.max_epochs):
            n_frontier = _count_rows(frontier_files)
            n_spilled = sum(
                spill_mod.manifest_pending(spill_mod.load_manifest(m))
                for m in spill_manifests.values()
            )
            if n_frontier == 0 and n_spilled == 0:
                break
            stats = self._run_epoch(
                k, frontier_files, n_frontier, spill_manifests
            )
            epoch_stats.append(stats)
            frontier_files = _parquet_files(
                os.path.join(self._epoch_dir(k), "frontier_next")
            )
            spill_manifests = _spill_manifest_files(self._epoch_dir(k))
            # committed manifests are the only live references — drop
            # chunks that refill rewrites / drains left behind
            spill_mod.gc_chunks(self.spill_dir, spill_manifests)

        prior = []
        for k in self._complete_epochs():
            sp = os.path.join(self._epoch_dir(k), "stats.parquet")
            prior.append(pq.read_table(sp).to_pylist()[0])
        summary = {
            "epochs": len(prior),
            "urls_fetched": int(sum(s["urls_fetched"] for s in prior)),
            "archives_expanded": int(
                sum(s.get("archives_expanded", 0) for s in prior)
            ),
            "members_extracted": int(
                sum(s.get("members_extracted", 0) for s in prior)
            ),
            "bytes": int(sum(s["bytes"] for s in prior)),
            "dedup_hits": int(sum(s["dedup_hits"] for s in prior)),
            "robots_denied": int(sum(s["robots_denied"] for s in prior)),
            "spilled_rows": int(sum(s.get("spilled_rows", 0) for s in prior)),
            "refilled_rows": int(
                sum(s.get("refilled_rows", 0) for s in prior)
            ),
            "seen_size": int(
                sum(s["n_seen"] for s in collect_stats(self.shards))
            ),
            "config": self.cfg.to_json_dict(),
        }
        n_spill_left = sum(
            spill_mod.manifest_pending(spill_mod.load_manifest(m))
            for m in spill_manifests.values()
        )
        if _count_rows(frontier_files) == 0 and n_spill_left == 0:
            with open(summary_path + ".tmp", "w") as f:
                json.dump(summary, f, indent=1)
            os.replace(summary_path + ".tmp", summary_path)
        return summary

    # -- one epoch --------------------------------------------------------
    def _run_epoch(
        self,
        k: int,
        frontier_files: list[str],
        n_frontier: int,
        spill_manifests: dict[int, str] | None = None,
    ) -> dict:
        import time

        t_epoch0 = time.time()
        if self.cfg.frontier_spill_rows:
            # spill state is per host partition — always dataset mode
            mode = "dataset"
        else:
            mode = self.cfg.force_mode or (
                "local" if n_frontier < self.cfg.local_epoch_threshold
                else "dataset"
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
            lineage = self._epoch_dataset(
                k, frontier_files, fetched_dir, next_dir,
                spill_manifests or {},
            )

        stats = self._epoch_stats(k, fetched_dir, next_dir, mode)
        stats["wall_s"] = round(time.time() - t_epoch0, 3)
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
        if self.cfg.robots_at_admission and t.num_rows and self.robots:
            from ..stages.outlinks import robots_mask_urls

            blocked = robots_mask_urls(t["url"], t["host"], self.robots)
            nb = int(blocked.sum())
            if nb:
                self.metrics.add(k, "robots_denied", nb)
                t = t.filter(pa.array(~blocked))
        adm = admit_per_host(t, self.cfg.politeness, k)
        admitted = adm.filter(adm["admitted"])
        deferred = adm.filter(pc.invert(adm["admitted"])).select(FRONTIER_COLS)
        _sidewrite_partitioned(
            deferred, next_dir, "deferred", self.cfg.num_host_partitions
        )
        # deterministic fetch order (priority desc, url asc) — value-defined,
        # the sort here just makes the written files human-ordered
        idx = pc.sort_indices(
            admitted,
            sort_keys=[("priority", "descending"), ("url", "ascending")],
        )
        admitted = admitted.take(idx)
        if self._local_fetcher is None:
            self._local_fetcher = _make_fetcher(
                self.cfg.source_kind, self.cfg.corpus_dir,
                self._corpus_refs, self._corpus_nb, k,
                self.cfg.flaky_every,
            )
        self._local_fetcher.set_epoch(k)
        cb = lambda name, v: self.metrics.add(k, name, v)  # noqa: E731
        _politeness_partials(admitted, self.cfg.politeness.min_gap_ms, cb)
        fetched = self._local_fetcher(admitted)
        _fetch_counters(fetched, cb)
        fetched = expand_archives(fetched, self.shards, k, cb)
        _volume_counters(fetched, cb)
        if self.cfg.enrich_text:
            fetched = _enrich_parallel(fetched)
        _write_table(fetched, fetched_dir, "part-0.parquet")
        retry_rows, failed_rows = split_fetch_failures(
            fetched.select([f.name for f in FETCHED_SCHEMA]), k,
            self.cfg.max_retries,
        )
        _sidewrite(failed_rows,
                   os.path.join(os.path.dirname(next_dir), "failed"),
                   "failed")
        links = extract_links(fetched.select(["url", "depth", "spans"]))
        filt = canon_and_filter(
            links,
            {} if self.cfg.robots_at_admission else self.robots,
            tuple(self.cfg.skip_substrings), cb,
        )
        newfr = probe_new(filt, self.shards, k, cb)
        # retry re-entries count as next-epoch frontier under the same
        # "discovered" prefix in BOTH execution modes (matching the
        # oracle's per-epoch accounting, which includes retries in
        # `discovered`)
        if retry_rows.num_rows:
            newfr = pa.concat_tables([newfr, retry_rows]).combine_chunks()
        _sidewrite_partitioned(
            newfr, next_dir, "discovered", self.cfg.num_host_partitions
        )
        return {
            "fetched": _parquet_files(fetched_dir),
            "frontier_next": _parquet_files(next_dir),
        }

    # -- dataset (large-epoch) path --------------------------------------
    def _epoch_dataset(
        self,
        k: int,
        frontier_files: list[str],
        fetched_dir: str,
        next_dir: str,
        spill_manifests: dict[int, str] | None = None,
    ) -> dict:
        """One shuffle-free streaming execution per epoch.

        The frontier arrives pre-partitioned by ``hash(host) % P`` (every
        sink splits by that key), so the epoch pipeline is

          from_items(partitions)
          -> map_batches(admission): read the partition's frontier files
             (host-complete by construction), per-host politeness top-K,
             side-write deferrals (partition-pure) -- emits admitted rows
          -> map_batches(expand): chunked corpus fetch against the shared
             zero-copy buckets, side-write fetched rows, outlink extract /
             canonicalize / robots / skip, seen-shard probe; discoveries
             are routed to the PartitionWriter actors (state/writers.py)
             that flush one file per partition at epoch end.

        ``target_max_block_size`` is dropped to a few MB for this
        execution so each partition's admitted rows split into several
        blocks -- expand parallelism is chunk-level, decoupled from the
        partition count.

        Side-written files are content-named -> a retried task overwrites
        its own output; everything lands in the epoch temp dir, renamed
        into place only after the manifest is written.

        History (measured on 0.4-4M-URL frontiers at 8 vs 32 CPUs): a
        6-execution pipeline cost 2-4 s orchestration per epoch; a
        groupby("host") shuffle cost >10 s per epoch of sort overhead
        (hash shuffle: worse); direct per-task partitioned writes created
        tasks x partitions ~ 16k files per epoch whose open cost alone
        was ~100 CPU-seconds. Partitioned frontier files + writer-actor
        fan-in keep the exchange free and the file count at
        O(partitions) per epoch.
        """
        import ray
        import ray.data as rd
        from ray.data import DataContext

        cfg = self.cfg
        by_part = _partition_files(frontier_files)
        spill_manifests = spill_manifests or {}
        for p in spill_manifests:  # partitions with only spilled rows
            by_part.setdefault(int(p), [])
        items = [
            {"part": int(p), "files": fs,
             "manifest": spill_manifests.get(int(p), "")}
            for p, fs in sorted(by_part.items())
        ]
        ray.get([
            w.begin_epoch.remote(next_dir, "discovered") for w in self.writers
        ])
        ctx = DataContext.get_current()
        prev_block_size = ctx.target_max_block_size
        # small target blocks: admission's output (admitted rows) splits
        # into ~2MB blocks, so expand parallelism is block-level, decoupled
        # from the partition count — without any repartition/AllToAll
        # operator (measured: Repartition burned ~18 s of wall per epoch
        # with <50 ms of actual task time)
        ctx.target_max_block_size = 2 * 1024 * 1024
        try:
            ds = rd.from_items(items, override_num_blocks=len(items))
            adm = ds.map_batches(
                partial(
                    _admit_partition_fn,
                    pol=cfg.politeness,
                    epoch=k,
                    next_dir=next_dir,
                    num_parts=cfg.num_host_partitions,
                    metrics_actor=self.metrics.actor,
                    spill_dir=self.spill_dir,
                    spill_rows=cfg.frontier_spill_rows,
                    keep_per_host=cfg.spill_keep_per_host(),
                    manifest_out_dir=os.path.join(
                        os.path.dirname(next_dir), "spill"
                    ),
                    robots_parts=self._robots_part_refs,
                ),
                batch_format="pyarrow",
                batch_size=None,  # one partition item per task
                zero_copy_batch=True,
                # differing resource spec prevents Ray from FUSING
                # admission+expand into one operator (a fused operator ran
                # the whole epoch as a single task — measured)
                num_cpus=0.9,
                # metrics partials are not idempotent under task retry —
                # fail the epoch instead (resume reruns it whole)
                max_retries=0,
                retry_exceptions=False,
            )
            out_ds = adm.map_batches(
                partial(
                    _expand_fn,
                    epoch=k,
                    fetched_dir=fetched_dir,
                    num_parts=cfg.num_host_partitions,
                    source_kind=cfg.source_kind,
                    corpus_dir=cfg.corpus_dir,
                    corpus_sig=self._corpus_sig,
                    corpus_refs=self._corpus_refs,
                    corpus_nb=self._corpus_nb,
                    robots_ref=self._robots_ref,
                    skip=tuple(cfg.skip_substrings),
                    shards=self.shards,
                    metrics_actor=self.metrics.actor,
                    writers=self.writers,
                    enrich=cfg.enrich_text,
                    flaky_every=cfg.flaky_every,
                    max_retries=cfg.max_retries,
                ),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                zero_copy_batch=True,
                # NO task retries: expand mutates durable state (seen-shard
                # inserts, metrics, writer buffers) before its side-writes
                # land, so a mid-task retry would silently drop the rerun's
                # "already seen" URLs and double-count metrics. A failed
                # task fails the epoch; the epoch temp dir is wiped whole
                # and the epoch rerun from its checkpointed frontier.
                max_retries=0,
                retry_exceptions=False,
            )
            # drive the streaming execution; output rows are tiny counts
            for _ in out_ds.iter_batches(batch_format="pyarrow"):
                pass
        finally:
            ctx.target_max_block_size = prev_block_size
        ray.get([w.flush.remote() for w in self.writers])
        if os.environ.get("CSR_EPOCH_STATS"):
            print(f"==== epoch {k} stats ====\n{out_ds.stats()}", flush=True)
        return {
            "fetched": _parquet_files(fetched_dir),
            "frontier_next": _parquet_files(next_dir),
        }

    # -- per-epoch stats --------------------------------------------------
    def _epoch_stats(
        self, k: int, fetched_dir: str, next_dir: str, mode: str
    ) -> dict:
        """All row-derived stats come from counters the tasks accumulated
        (admission partitions are host-complete, so per-host politeness
        partials are exact) — the driver never re-reads the epoch's
        fetched rows (measured: the full-epoch parquet re-read was a
        multi-second serial term per epoch at bench scale). File counts
        below touch only parquet footers."""
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
            "urls_fetched": int(mcounters.get("urls_fetched", 0)),
            "urls_200": int(mcounters.get("urls_200", 0)),
            "urls_404": int(mcounters.get("urls_404", 0)),
            "urls_503": int(mcounters.get("urls_503", 0)),
            "failed": _count_rows(
                _parquet_files(
                    os.path.join(os.path.dirname(next_dir), "failed")
                )
            ),
            "bytes": int(mcounters.get("bytes", 0)),
            "links_total": int(mcounters.get("links_total", 0)),
            "dedup_hits": int(mcounters.get("dedup_hits", 0)),
            "robots_denied": int(mcounters.get("robots_denied", 0)),
            "skip_filtered": int(mcounters.get("skip_filtered", 0)),
            "candidates": int(mcounters.get("candidates", 0)),
            "deferred": int(deferred),
            "discovered": int(discovered),
            "archives_expanded": int(mcounters.get("archives_expanded", 0)),
            "archives_dup": int(mcounters.get("archives_dup", 0)),
            "members_extracted": int(mcounters.get("members_extracted", 0)),
            "spilled_rows": int(mcounters.get("spilled_rows", 0)),
            "refilled_rows": int(mcounters.get("refilled_rows", 0)),
            "politeness_wait_ms": int(
                mcounters.get("politeness_wait_ms", 0)
            ),
            "num_hosts": int(mcounters.get("n_hosts", 0)),
            "t_fetch_ms": int(mcounters.get("t_fetch_ms", 0)),
            "t_enrich_ms": int(mcounters.get("t_enrich_ms", 0)),
            "t_write_ms": int(mcounters.get("t_write_ms", 0)),
            "t_canon_ms": int(mcounters.get("t_canon_ms", 0)),
            "t_probe_ms": int(mcounters.get("t_probe_ms", 0)),
            "t_send_ms": int(mcounters.get("t_send_ms", 0)),
        }


def _batch_file_name(t: pa.Table, prefix: str) -> str:
    """Deterministic content-derived file name: a retried task producing
    the same batch overwrites its own file (idempotent side-writes)."""
    from ..urls import hash_urls

    h = hash_urls(t["url"].to_numpy(zero_copy_only=False))
    sig = (int(h.sum()) & 0xFFFFFFFFFFFFFFFF) ^ (len(h) << 48)
    return f"{prefix}-{sig:016x}-{t.num_rows}.parquet"


def _sidewrite(t: pa.Table, directory: str, prefix: str) -> None:
    if t.num_rows == 0:
        return
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _batch_file_name(t, prefix))
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)


FAILED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("epoch", pa.int32()),
        ("retries", pa.int16()),
        ("error", pa.string()),
    ]
)


def split_fetch_failures(
    fetched: pa.Table, epoch: int, max_retries: int
) -> tuple[pa.Table, pa.Table]:
    """(retry frontier rows, failed-table rows) from a fetched batch.

    A 503 attempt with retries < max_retries re-enters the frontier (same
    priority — admission re-ranks it next epoch); beyond max_retries it
    becomes a failed-table row — the first-class replacement for the
    reference's exit-time ``failed_dirs.json``
    (`/root/reference/crawlers/globus_base_preserved.py:473-477`).
    """
    from ..urls import hash_urls

    status = fetched["status"].to_numpy(zero_copy_only=False)
    retries = fetched["retries"].to_numpy(zero_copy_only=False)
    is_503 = status == 503
    retry_mask = is_503 & (retries < max_retries)
    failed_mask = is_503 & ~retry_mask
    rt = fetched.filter(pa.array(retry_mask))
    nr = rt.num_rows
    urls = rt["url"].to_numpy(zero_copy_only=False)
    kh = hash_urls(urls) if nr else np.empty(0, dtype=np.uint64)
    retry_rows = pa.Table.from_arrays(
        [
            rt["url"].combine_chunks(),
            rt["host"].combine_chunks(),
            rt["depth"].combine_chunks(),
            rt["priority"].combine_chunks(),
            pa.array(np.full(nr, epoch + 1, dtype=np.int32)),
            pa.array([""] * nr, type=pa.string()),
            pa.array((kh >> np.uint64(32) & np.uint64(63)).astype(np.int16)),
            pc.add(rt["retries"].combine_chunks(),
                   pa.scalar(1, pa.int16())).cast(pa.int16()),
        ],
        schema=FRONTIER_SCHEMA,
    )
    ft = fetched.filter(pa.array(failed_mask))
    failed_rows = pa.Table.from_arrays(
        [
            ft["url"].combine_chunks(),
            ft["host"].combine_chunks(),
            pa.array(np.full(ft.num_rows, epoch, dtype=np.int32)),
            ft["retries"].combine_chunks(),
            pa.array(["fetch_failed_503"] * ft.num_rows, type=pa.string()),
        ],
        schema=FAILED_SCHEMA,
    )
    return retry_rows, failed_rows


_PART_RE = re.compile(r"-p(\d+)-")


def _politeness_partials(admitted: pa.Table, min_gap_ms: int, cb) -> None:
    """Exact per-host politeness partials from an admitted batch: the
    batch is host-complete (admission partitions own whole hosts), so
    per-host counts — and therefore wait = (count-1)×gap and the distinct
    host count — are exact, not approximations."""
    hosts = pd.Series(admitted["host"].to_numpy(zero_copy_only=False))
    per_host = hosts.value_counts()
    cb("politeness_wait_ms",
       int(((per_host - 1).clip(lower=0) * min_gap_ms).sum()))
    cb("n_hosts", int(len(per_host)))


def _fetch_counters(fetched: pa.Table, cb) -> None:
    """Status tallies of a fetch batch (before member expansion — every
    fetcher row is src='fetch')."""
    st = fetched["status"].to_numpy(zero_copy_only=False)
    cb("urls_fetched", len(st))
    cb("urls_200", int((st == 200).sum()))
    cb("urls_404", int((st == 404).sum()))
    cb("urls_503", int((st == 503).sum()))


def _volume_counters(fetched: pa.Table, cb) -> None:
    """Bytes/link totals over the full batch (fetches + members)."""
    cb("bytes", int(pc.sum(fetched["bytes"]).as_py() or 0))
    cb("links_total", int(pc.sum(fetched["n_links"]).as_py() or 0))


def _host_partitions_of(hosts: np.ndarray, num_parts: int) -> np.ndarray:
    from ..urls import hash_urls

    return (hash_urls(hosts) % np.uint64(num_parts)).astype(np.int64)


def _sidewrite_partitioned(
    t: pa.Table, directory: str, prefix: str, num_parts: int
) -> None:
    """Write frontier rows split by the run-wide host partition key; the
    partition id is encoded in the file name (``prefix-pNNNN-sig.parquet``)
    so the next epoch groups files without opening them."""
    if t.num_rows == 0:
        return
    parts = _host_partitions_of(
        t["host"].to_numpy(zero_copy_only=False), num_parts
    )
    # one stable sort + take, zero-copy slices per partition (same split
    # strategy as state/writers.send_partitioned; row order within a
    # partition is preserved)
    order = np.argsort(parts, kind="stable")
    st = t.take(pa.array(order))
    sparts = parts[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(sparts)) + 1))
    lens = np.diff(np.concatenate((starts, [len(sparts)])))
    for s, ln in zip(starts, lens):
        p = int(sparts[s])
        _sidewrite(st.slice(int(s), int(ln)), directory,
                   f"{prefix}-p{p:04d}")


def _spill_manifest_files(epoch_dir: str) -> dict[int, str]:
    """Per-partition spill manifests committed with an epoch."""
    d = os.path.join(epoch_dir, "spill")
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in sorted(os.listdir(d)):
        m = re.match(r"manifest-p(\d+)\.json$", name)
        if m:
            out[int(m.group(1))] = os.path.join(d, name)
    return out


def _partition_files(files: list[str]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for f in files:
        m = _PART_RE.search(os.path.basename(f))
        p = int(m.group(1)) if m else 0
        out.setdefault(p, []).append(f)
    return out


# Per-WORKER-PROCESS cache for the fused expand stage. Ray Data tears actor
# pools down after every execution, but worker processes persist across the
# run's epochs — a module-level cache keeps the (zero-copy, object-store-
# backed) bucket handles and robots rules warm for the whole crawl (the ST1
# once-per-worker pattern,
# `/root/reference/crawlers/globus_base_preserved.py:192-207`). Everything
# cached is read-only; the heavy bytes live ONCE in the object store.
_PROC_CACHE: dict = {}
# Driver-side cache: corpus signature -> (bucket refs, num_buckets).
_CORPUS_REFS: dict = {}


def _corpus_signature(corpus_dir: str) -> str:
    """(path, meta) content signature: regenerating a corpus at the same
    path with different params yields a different signature, so neither
    the driver bucket-ref cache nor the per-worker fetcher cache can ever
    resume against stale content."""
    from ..sources.corpus import corpus_meta

    return os.path.abspath(corpus_dir) + "|" + json.dumps(
        corpus_meta(corpus_dir), sort_keys=True
    )


def warm_corpus(corpus_dir: str) -> None:
    """Pre-load + object-store-share the corpus buckets (idempotent).

    Benchmarks call this before the timed section: corpus residency is
    environment setup (the page-cache-warm analog), not crawl work.
    """
    key = _corpus_signature(corpus_dir)
    if key not in _CORPUS_REFS:
        _CORPUS_REFS[key] = put_corpus(corpus_dir)


def _admit_partition_fn(
    batch: pa.Table,
    *,
    pol,
    epoch: int,
    next_dir: str,
    num_parts: int,
    metrics_actor=None,
    spill_dir: str | None = None,
    spill_rows: int | None = None,
    keep_per_host: int = 0,
    manifest_out_dir: str | None = None,
    robots_parts: list | None = None,
) -> pa.Table:
    """Admission for one host partition (host-complete by construction):
    read the partition's frontier files, per-host politeness top-K,
    side-write deferrals (partition-pure, one file), emit admitted rows;
    exact per-host politeness partials go to the metrics actor (this
    partition owns its hosts whole).

    Spilling (``spill_rows`` set — state/spill.py): frontier files are
    accumulated one at a time; rows worse than a spilled host's boundary
    divert to spill on read, and whenever the accumulation exceeds
    ``spill_rows`` the mega-host tails are compacted out — task memory
    stays bounded by spill_rows + one frontier file, not by the host's
    true pending size. Before admission, drained hosts refill their live
    slice from spill (best-first), so admission order per host matches
    the unbounded run wherever the live slice is non-empty."""
    from ..state import spill as spill_mod

    out = []
    counters: dict[str, int] = {}

    def cb(name, v):
        counters[name] = counters.get(name, 0) + int(v)

    for item in batch.to_pylist():
        p = int(item["part"])
        manifest = spill_mod.load_manifest(item.get("manifest") or "")
        parts: list[pa.Table] = []
        acc_rows = 0
        for f in item["files"]:
            t = pq.read_table(f)
            if manifest:
                t, ns = spill_mod.enforce_boundary(
                    t, manifest, spill_dir, p
                )
                cb("spilled_rows", ns)
            parts.append(t)
            acc_rows += t.num_rows
            if spill_rows and acc_rows > spill_rows:
                merged = pa.concat_tables(parts).combine_chunks()
                merged, ns = spill_mod.compact(
                    merged, manifest, spill_dir, p, keep_per_host
                )
                cb("spilled_rows", ns)
                parts, acc_rows = [merged], merged.num_rows
        frontier = (
            pa.concat_tables(parts).combine_chunks()
            if parts else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
        )
        if manifest:
            refilled, nref = spill_mod.refill(
                frontier, manifest, spill_dir, p, keep_per_host,
                trigger_for=lambda h: 2 * pol.max_per_epoch(h),
            )
            if refilled is not None:
                frontier = pa.concat_tables(
                    [frontier, refilled.select(frontier.column_names)]
                ).combine_chunks()
                cb("refilled_rows", nref)
            if manifest_out_dir:
                spill_mod.write_manifest(manifest, manifest_out_dir, p)
        if robots_parts is not None and frontier.num_rows:
            # admission-time robots (config.robots_at_admission): this
            # partition's OWN rules only — resolved once per worker via
            # the shared broadcast LRU. Filtering precedes the top-K so
            # admitted rows match the discovery-time-filtered run.
            from ..functions.relational import resolve_broadcast
            from ..stages.outlinks import robots_mask_urls

            rules = resolve_broadcast(robots_parts[p])
            if rules:
                blocked = robots_mask_urls(
                    frontier["url"], frontier["host"], rules
                )
                nb = int(blocked.sum())
                if nb:
                    cb("robots_denied", nb)
                    frontier = frontier.filter(pa.array(~blocked))
        adm = admit_per_host(frontier, pol, epoch)
        mask = adm["admitted"].combine_chunks()
        deferred = adm.filter(pc.invert(mask)).select(FRONTIER_COLS)
        _sidewrite_partitioned(deferred, next_dir, "deferred", num_parts)
        admitted = adm.filter(mask).drop_columns(["admitted"])
        _politeness_partials(admitted, pol.min_gap_ms, cb)
        out.append(admitted)
    if counters and metrics_actor is not None:
        import ray

        ray.get(metrics_actor.add_many.remote(epoch, counters))
    return pa.concat_tables(out) if len(out) > 1 else out[0]


def _make_fetcher(source_kind: str, corpus_dir: str, corpus_refs,
                  corpus_nb: int, epoch: int, flaky_every: int):
    """Source seam (SURVEY.md §2.10): every fetcher implements the same
    ``__call__(frontier batch) -> FETCHED_SCHEMA`` + ``set_epoch``
    contract; the epoch driver is source-agnostic."""
    if source_kind == "posix":
        from ..stages.posix import PosixFetcher

        return PosixFetcher(corpus_dir, epoch)
    if source_kind == "drive":
        from ..stages.drive import DriveFetcher

        return DriveFetcher(corpus_dir, epoch)
    return CorpusFetcher(
        SharedBucketProvider(corpus_refs, corpus_nb), epoch,
        flaky_every=flaky_every,
    )


def _expand_fn(
    t: pa.Table,
    *,
    epoch: int,
    fetched_dir: str,
    num_parts: int,
    corpus_dir: str,
    corpus_sig: str,
    corpus_refs: list,
    corpus_nb: int,
    robots_ref,
    skip: tuple,
    shards: list,
    metrics_actor,
    writers: list,
    source_kind: str = "corpus",
    enrich: bool = True,
    flaky_every: int = 0,
    max_retries: int = 2,
) -> pa.Table:
    """Fetch/expand one chunk of admitted rows: corpus lookup against the
    shared zero-copy buckets, archive-member expansion, side-write fetched
    rows (spans included), extract/canonicalize/filter outlinks, probe the
    seen shards (launched async, gathered after enrich+write so the RPC
    round-trip overlaps compute), route the surviving discoveries to their
    partition's writer actor. Returns one tiny count row (the pipeline's
    driver-visible output). NOT retry-safe (seen-shard/metrics/writer side
    effects) — the stage runs with max_retries=0 and a failure fails the
    epoch, which resume reruns whole."""
    import ray

    from ..state.writers import send_partitioned

    fetcher = _PROC_CACHE.get(("fetcher", corpus_sig, flaky_every))
    if fetcher is None:
        fetcher = _make_fetcher(source_kind, corpus_dir, corpus_refs,
                                corpus_nb, epoch, flaky_every)
        _PROC_CACHE[("fetcher", corpus_sig, flaky_every)] = fetcher
    fetcher.set_epoch(epoch)
    rkey = ("robots", robots_ref.hex() if hasattr(robots_ref, "hex") else id(robots_ref))
    robots = _PROC_CACHE.get(rkey)
    if robots is None:
        robots = ray.get(robots_ref)
        _PROC_CACHE[rkey] = robots

    counters: dict[str, int] = {}

    def cb(name, v):
        counters[name] = counters.get(name, 0) + int(v)

    import time as _time

    _t0 = _time.perf_counter()
    fetched = fetcher(t)
    _fetch_counters(fetched, cb)
    fetched = expand_archives(fetched, shards, epoch, cb)
    _volume_counters(fetched, cb)
    _t1 = _time.perf_counter()
    links = extract_links(fetched.select(["url", "depth", "spans"]))
    filt = canon_and_filter(links, robots, skip, cb)
    probe_state = probe_new_start(filt, shards)  # RPCs now in flight
    _t15 = _time.perf_counter()
    if enrich:
        fetched = enrich_fetched(fetched)
    _t2 = _time.perf_counter()
    disc = probe_new_finish(probe_state, epoch, cb)
    retry_rows, failed_rows = split_fetch_failures(
        fetched.select([f.name for f in FETCHED_SCHEMA]), epoch, max_retries
    )
    if retry_rows.num_rows:
        disc = pa.concat_tables([disc, retry_rows]).combine_chunks()
    _t5 = _time.perf_counter()
    # fire the frontier sends FIRST and ack them LAST: writer-side
    # buffering (and any background spill) overlaps this task's own
    # parquet sidewrites instead of serializing after them
    send_refs = []
    if disc.num_rows:
        parts = _host_partitions_of(
            disc["host"].to_numpy(zero_copy_only=False), num_parts
        )
        send_refs = send_partitioned(writers, num_parts, disc, parts,
                                     block=False)
    _t55 = _time.perf_counter()
    _sidewrite(fetched, fetched_dir, "fetched")
    if failed_rows.num_rows:
        _sidewrite(
            failed_rows,
            os.path.join(os.path.dirname(fetched_dir), "failed"),
            "failed",
        )
    _t3 = _time.perf_counter()
    if send_refs:
        ray.get(send_refs)  # delivery guarantee: buffered before success
    _t6 = _time.perf_counter()
    # per-stage telemetry (ms, summed per epoch) — reads back in stats
    cb("t_fetch_ms", (_t1 - _t0) * 1000)
    cb("t_canon_ms", (_t15 - _t1) * 1000)
    cb("t_enrich_ms", (_t2 - _t15) * 1000)
    cb("t_write_ms", (_t3 - _t55) * 1000)
    cb("t_probe_ms", (_t5 - _t2) * 1000)  # gather only; RPCs overlapped
    cb("t_send_ms", ((_t55 - _t5) + (_t6 - _t3)) * 1000)
    if counters and metrics_actor is not None:
        ray.get(metrics_actor.add_many.remote(epoch, counters))
    return pa.Table.from_pydict(
        {"n_fetched": pa.array([t.num_rows], type=pa.int64()),
         "n_discovered": pa.array([disc.num_rows], type=pa.int64())}
    )


def fetched_dataset(run_dir: str):
    """All fetched docs of a (possibly partial) run as one Dataset."""
    import ray.data as rd

    files: list[str] = []
    ep_root = os.path.join(run_dir, "epochs")
    for d in sorted(os.listdir(ep_root)):
        if d.startswith("epoch="):
            files.extend(_parquet_files(os.path.join(ep_root, d, "fetched")))
    return rd.read_parquet(files)


# one-entry per-process cache for drain_fetched: the last epoch's sorted
# fetched table (epochs are immutable once committed)
_DRAIN_CACHE: dict = {}


def drain_fetched(
    run_dir: str,
    n: int,
    cursor: tuple[int, str] | None = None,
    columns: list[str] | None = None,
) -> tuple[pa.Table, tuple[int, str] | None]:
    """Resumable paginated drain of the fetched table — the consumer-side
    analog of the reference's ``fetch_mdata(n)`` poll loop
    (`/root/reference/application.py:255-274` plucks ≤n files per call
    from the drained SQS queue; here pagination is deterministic and
    restartable instead of destructive).

    Rows are delivered in total order (fetch_epoch, url). ``cursor`` is
    the (epoch, url) of the last delivered row (opaque to callers);
    passing the returned cursor back continues exactly after it — across
    process restarts too, since the cursor carries no in-memory state.
    Reads one epoch's fetched files at a time, so driver memory is
    bounded by ONE EPOCH's fetched rows + the page (the epoch is
    sorted in memory on first touch — a consumer draining a run whose
    single largest epoch exceeds driver memory should read the epoch
    parquet dirs directly as a Dataset instead); a one-entry per-process
    cache keeps the LAST epoch's sorted table, so sequentially draining
    an epoch in small pages is O(page) per call instead of re-reading
    and re-sorting the epoch every page (committed epochs are immutable,
    so the cache can never go stale within a run dir).

    Cursor correctness rests on per-epoch url uniqueness (the seen
    filter admits each url once, archive members are namespaced) — the
    strict ``url > after_url`` resume would silently skip rows if an
    epoch ever held duplicates, so the sort ASSERTS the invariant and a
    future break surfaces loudly here rather than as dropped rows.

    Returns (page table, next cursor); next cursor is None when the run
    is exhausted.
    """
    ep_root = os.path.join(run_dir, "epochs")
    epochs = sorted(
        int(d.split("=")[1]) for d in os.listdir(ep_root)
        if d.startswith("epoch=")
    )
    start_epoch, after_url = cursor if cursor else (epochs[0] if epochs else 0,
                                                   "")
    pages: list[pa.Table] = []
    got = 0
    for k in epochs:
        if k < start_epoch:
            continue
        files = _parquet_files(
            os.path.join(ep_root, f"epoch={k:05d}", "fetched")
        )
        if not files:
            continue
        cache_key = (os.path.abspath(run_dir), k, tuple(files))
        if _DRAIN_CACHE.get("key") == cache_key:
            t = _DRAIN_CACHE["table"]
        else:
            t = pa.concat_tables(
                [pq.read_table(f) for f in files]
            ).sort_by("url")
            n_uniq = pc.count_distinct(t["url"]).as_py()
            if n_uniq != t.num_rows:
                raise AssertionError(
                    f"epoch {k}: {t.num_rows - n_uniq} duplicate fetched "
                    "urls — the (epoch, url) drain cursor would skip rows"
                )
            _DRAIN_CACHE["key"] = cache_key
            _DRAIN_CACHE["table"] = t
        if k == start_epoch and after_url:
            mask = pc.greater(t["url"], pa.scalar(after_url))
            t = t.filter(mask)
        if columns:
            t = t.select(columns + (["url"] if "url" not in columns else []))
        if t.num_rows > n - got:
            t = t.slice(0, n - got)
        if t.num_rows:
            pages.append(t)
            got += t.num_rows
            cursor = (k, t["url"][-1].as_py())
        if got >= n:
            return pa.concat_tables(pages), cursor
    page = (
        pa.concat_tables(pages) if pages
        else pa.Table.from_pylist([], schema=FETCHED_SCHEMA)
    )
    return page, None  # exhausted


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
    tables = [pq.read_table(f) for f in files]
    return pa.concat_tables(tables).combine_chunks()
