"""Sharded URL-seen service: cuckoo-filter actors + batch router.

Replaces the reference's implicit tree-uniqueness and `dup_check` stubs
(`/root/reference/crawlers/local_posix.py:156-158`,
`legacy/posix_crawler.py:66-68`) with the north-rule seen set: URLs are
hash-routed ``url_hash % num_shards`` to stateful shard actors, each
holding a cuckoo filter (bloom fallback on overflow — state/cuckoo.py)
plus an exact backing set used ONLY to verify the rare filter-positive
(false positives would silently drop URLs, SURVEY.md §7.5). This makes
the semi/anti-join of candidate outlinks against the seen set (SURVEY.md
§2.4 J3) an explicit hash-routed actor probe, NOT an all-to-all Ray Data
shuffle — the design that survives a 10^10-URL frontier, where each shard
would page its exact backing to an on-disk sorted run.

Atomicity: ``probe_and_insert`` runs as one actor task, so a URL sent by
many concurrent fetch batches is admitted exactly once regardless of
arrival order; everything the equivalence contract checks (admitted set,
priorities) is arrival-order independent because priority is a pure
function of the URL (urls.py).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the seen set. State survives across epochs."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.exact: set[int] = set()
        self.dedup_hits = 0
        self.false_positives = 0

    def probe_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        """Return bool mask: True = new (admitted, now inserted).

        ``hashes`` may contain duplicates (multiple parents discovered the
        same URL in one batch); the FIRST occurrence wins, later ones count
        as dedup hits — matching the oracle's per-occurrence accounting.
        """
        h = hashes.astype(np.uint64)
        out = np.zeros(len(h), dtype=bool)
        maybe = self.filter.maybe_contains_many(h)
        batch_seen: set[int] = set()
        for i in np.nonzero(~maybe)[0]:
            hi = int(h[i])
            if hi in batch_seen:  # dup within this batch
                self.dedup_hits += 1
                continue
            batch_seen.add(hi)
            out[i] = True
        # filter-positives: verify against the exact backing
        for i in np.nonzero(maybe)[0]:
            hi = int(h[i])
            if hi in self.exact or hi in batch_seen:
                self.dedup_hits += 1
            else:
                self.false_positives += 1
                batch_seen.add(hi)
                out[i] = True
        if batch_seen:
            self.filter.insert_many(
                np.fromiter(batch_seen, dtype=np.uint64, count=len(batch_seen))
            )
            self.exact.update(batch_seen)
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        return np.fromiter((int(x) in self.exact for x in h), dtype=bool,
                           count=len(h))

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "n_seen": len(self.exact),
            "n_cuckoo": self.filter.n_items,
            "n_bloom_overflow": self.filter.n_bloom,
            "dedup_hits": self.dedup_hits,
            "false_positives": self.false_positives,
        }

    def snapshot(self, path: str) -> str:
        tmp = path + ".tmp.npz"  # ends in .npz so numpy won't rename it
        np.savez_compressed(
            tmp,
            exact=np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact)),
            dedup_hits=np.int64(self.dedup_hits),
            false_positives=np.int64(self.false_positives),
            **self.filter.state_dict(),
        )
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        d = np.load(path)
        self.filter = CuckooFilter.from_state(
            {k: d[k] for k in ("table", "bloom", "n_items", "n_bloom")}
        )
        self.exact = set(int(x) for x in d["exact"])
        self.dedup_hits = int(d["dedup_hits"])
        self.false_positives = int(d["false_positives"])
        return len(self.exact)


def make_shards(num_shards: int, capacity_per_shard: int = 1 << 20) -> list:
    return [
        SeenShard.remote(i, capacity_per_shard) for i in range(num_shards)
    ]


def probe_shards(shards: list, hashes: np.ndarray) -> np.ndarray:
    """Route a batch of url hashes to shards, probe+insert, gather mask.

    Called from inside ``map_batches`` tasks: one RPC per touched shard per
    batch, all in flight concurrently. Returns the is-new bool mask aligned
    with ``hashes``.
    """
    n = len(hashes)
    if n == 0:
        return np.zeros(0, dtype=bool)
    h = hashes.astype(np.uint64)
    sid = (h % np.uint64(len(shards))).astype(np.int64)
    out = np.zeros(n, dtype=bool)
    refs, idxs = [], []
    for s in np.unique(sid):
        idx = np.nonzero(sid == s)[0]
        refs.append(shards[int(s)].probe_and_insert.remote(h[idx]))
        idxs.append(idx)
    for idx, mask in zip(idxs, ray.get(refs)):
        out[idx] = mask
    return out


def collect_stats(shards: list) -> list[dict]:
    return ray.get([s.stats.remote() for s in shards])


def snapshot_shards(shards: list, directory: str) -> list[str]:
    os.makedirs(directory, exist_ok=True)
    return ray.get(
        [
            s.snapshot.remote(os.path.join(directory, f"shard_{i:04d}.npz"))
            for i, s in enumerate(shards)
        ]
    )


def restore_shards(shards: list, directory: str) -> int:
    counts = ray.get(
        [
            s.restore.remote(os.path.join(directory, f"shard_{i:04d}.npz"))
            for i, s in enumerate(shards)
        ]
    )
    return int(sum(counts))
