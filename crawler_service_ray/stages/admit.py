"""Politeness admission: per-host top-K with explicit skew control.

The reference has no admission control — a giant directory pins one thread
and oversized listings are dropped
(`/root/reference/crawlers/globus_base_preserved.py:293-297`). Here
admission is two-phase, designed for a skewed 10^10-row frontier:

  phase 1 (``local_topk_mark``, stateless ``map_batches`` over the raw
  frontier): within each block, rows ranked worse than K(host) for their
  host are marked deferred — if ≥K same-host rows outrank a row inside ONE
  block, ≥K outrank it globally, so the mark is exact, not heuristic. A hot
  host with 10^7 frontier rows therefore contributes ≤ K rows per block to
  the shuffle — this bounded-per-block contribution is the salting
  equivalent for admission (SURVEY.md §4 skew row).

  phase 2 (``admit_per_host``, ``groupby("host").map_groups``): exact
  global per-host top-K over the ≤ K×num_blocks survivors; assigns
  ``host_rank`` and the virtual fetch timestamp
  ``epoch*epoch_ms + host_rank*min_gap_ms`` — the recorded
  politeness-compliance metric (min-gap spacing per host).

Ranking key everywhere: (priority desc, url asc) — deterministic, equal to
the oracle's (oracle.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PolitenessConfig


def _rank_within_host(t: pa.Table) -> np.ndarray:
    """Rank (0-based) of each row within its host by (prio desc, url asc)."""
    df = pd.DataFrame(
        {
            "host": t["host"].to_numpy(zero_copy_only=False),
            "priority": t["priority"].to_numpy(zero_copy_only=False),
            "url": t["url"].to_numpy(zero_copy_only=False),
        }
    )
    order = df.sort_values(
        ["host", "priority", "url"], ascending=[True, False, True], kind="mergesort"
    ).index.to_numpy()
    rank_sorted = (
        df["host"].iloc[order].groupby(df["host"].iloc[order]).cumcount()
    )
    rank = np.empty(len(df), dtype=np.int64)
    rank[order] = rank_sorted.to_numpy()
    return rank


def _caps_for(hosts: np.ndarray, pol: PolitenessConfig) -> np.ndarray:
    default = max(1, pol.epoch_ms // pol.min_gap_ms)
    if not pol.per_host_overrides:
        return np.full(len(hosts), default, dtype=np.int64)
    s = pd.Series(hosts)
    return (
        s.map(pol.per_host_overrides).fillna(default).astype(np.int64).to_numpy()
    )


def local_topk_mark(t: pa.Table, pol: PolitenessConfig) -> pa.Table:
    """Phase 1: append bool ``defer1`` (True = provably deferred)."""
    if t.num_rows == 0:
        return t.append_column("defer1", pa.array([], type=pa.bool_()))
    rank = _rank_within_host(t)
    caps = _caps_for(t["host"].to_numpy(zero_copy_only=False), pol)
    return t.append_column("defer1", pa.array(rank >= caps))


def admit_per_host(
    group: pa.Table, pol: PolitenessConfig, epoch: int
) -> pa.Table:
    """Phase 2: one host's surviving rows → admitted/deferred + timestamps.

    Appends ``admitted`` (bool), ``host_rank`` (int32, -1 if deferred) and
    ``virtual_ts_ms`` (int64, -1 if deferred).
    """
    n = group.num_rows
    if n == 0:
        return (
            group.append_column("admitted", pa.array([], type=pa.bool_()))
            .append_column("host_rank", pa.array([], type=pa.int32()))
            .append_column("virtual_ts_ms", pa.array([], type=pa.int64()))
        )
    rank = _rank_within_host(group)
    caps = _caps_for(group["host"].to_numpy(zero_copy_only=False), pol)
    admitted = rank < caps
    host_rank = np.where(admitted, rank, -1).astype(np.int32)
    ts = np.where(
        admitted,
        np.int64(epoch) * pol.epoch_ms + rank * pol.min_gap_ms,
        np.int64(-1),
    )
    return (
        group.append_column("admitted", pa.array(admitted))
        .append_column("host_rank", pa.array(host_rank, type=pa.int32()))
        .append_column("virtual_ts_ms", pa.array(ts, type=pa.int64()))
    )
