"""Incremental seen-set checkpoints: per-epoch snapshot cost is O(new
hashes), not O(all seen) — deltas chain back to a periodic full, restore
replays the chain and rebuilds the cuckoo filter from the exact set."""

import os

import numpy as np
import ray

from crawler_service_ray.state.seen import (
    make_shards,
    probe_shards,
    restore_shards,
    snapshot_shards,
    collect_stats,
)


def _rng_hashes(seed, n):
    return np.random.default_rng(seed).integers(
        0, 2**63, size=n, dtype=np.int64
    ).astype(np.uint64)


def test_snapshot_chain_restores_exactly(ray_session, tmp_path):
    shards = make_shards(2)
    dirs = []
    all_h = []
    # epoch 0: big base; later epochs: small deltas (steady-state shape)
    for k, n in enumerate([20000, 300, 300, 300, 300]):
        h = _rng_hashes(k, n)
        probe_shards(shards, h)
        all_h.append(h)
        d = str(tmp_path / f"ep{k:03d}")
        snapshot_shards(shards, d)
        dirs.append(d)

    # steady-state epochs must write deltas, not fulls: their files are
    # tiny next to the base epoch's
    base = os.path.getsize(os.path.join(dirs[0], "shard_0000.npz"))
    tail = os.path.getsize(os.path.join(dirs[-1], "shard_0000.npz"))
    assert tail * 10 < base

    before = {s["shard_id"]: s for s in collect_stats(shards)}
    fresh = make_shards(2)
    restore_shards(fresh, dirs)
    after = {s["shard_id"]: s for s in collect_stats(fresh)}
    for sid in before:
        assert after[sid]["n_seen"] == before[sid]["n_seen"]
        assert after[sid]["dedup_hits"] == before[sid]["dedup_hits"]

    # every hash ever inserted reads as already-seen on the restored set
    h = np.concatenate(all_h)
    assert not probe_shards(fresh, h).any()
    # and a genuinely new batch still reads as new
    assert probe_shards(fresh, _rng_hashes(99, 50)).all()
    for a in shards + fresh:
        ray.kill(a)


def test_restore_from_single_full_dir(ray_session, tmp_path):
    """A chain of length one (the pre-incremental layout) still works."""
    shards = make_shards(2)
    h = _rng_hashes(7, 5000)
    probe_shards(shards, h)
    d = str(tmp_path / "only")
    snapshot_shards(shards, d)
    fresh = make_shards(2)
    restore_shards(fresh, d)  # str, not list
    assert not probe_shards(fresh, h).any()
    for a in shards + fresh:
        ray.kill(a)
