"""Partitioned frontier sink: per-partition write-buffer actors.

The Y-problem: N expand tasks each discovering rows for any of P host
partitions would write N×P tiny files per epoch (measured: ~16k files and
50-160 CPU-seconds of per-file open cost at a 1.6M-URL epoch). The
reference solves the same fan-in with its 10 SQS commit threads batching
messages (`/root/reference/crawlers/globus_base_preserved.py:100-107,
116-155`); here the analog is a small pool of zero-CPU writer actors, each
owning a slice of the host partitions: expand tasks send each discovered
chunk to the owning writer (one actor call per writer touched per chunk),
writers buffer per partition, and the epoch driver flushes them once —
one file per non-empty partition per epoch.

Delivery guarantee: expand tasks ``ray.get`` their append calls, so a task
only succeeds after its rows are buffered; a crashed epoch is wiped whole
(temp dir + ``begin_epoch`` reset) and rerun, so buffered-but-unflushed
rows can never leak into a committed epoch. Memory bound: a writer spills
its buffers to sequenced files whenever buffered bytes exceed
``flush_bytes`` (64 MiB default), so actor memory is O(flush_bytes)
regardless of epoch discovery volume; the final ``flush`` writes the
remainder. File count stays O(partitions x spills).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray

DEFAULT_FLUSH_BYTES = 64 * 1024 * 1024


@ray.remote(num_cpus=0)
class PartitionWriter:
    def __init__(self, writer_id: int, flush_bytes: int = DEFAULT_FLUSH_BYTES):
        self.writer_id = writer_id
        self.flush_bytes = flush_bytes
        self.out_dir: str | None = None
        self.prefix = "discovered"
        self.buffers: dict[int, list[pa.Table]] = {}
        self.buffered_bytes = 0
        self.seq = 0

    def begin_epoch(self, out_dir: str, prefix: str = "discovered") -> None:
        self.out_dir = out_dir
        self.prefix = prefix
        self.buffers = {}
        self.buffered_bytes = 0
        self.seq = 0

    def append(self, part_id: int, t: pa.Table) -> int:
        self.buffers.setdefault(part_id, []).append(t)
        self.buffered_bytes += t.nbytes
        if self.buffered_bytes >= self.flush_bytes:
            self._spill()
        return t.num_rows

    def append_parts(self, parts: list) -> int:
        """One RPC carrying every (part_id, table) pair this writer owns
        from one sender chunk. The split stays on the SENDER (an
        on-budget map task) — writer actors are zero-CPU buffers and
        must not absorb compute the scheduler can't account for."""
        n = 0
        for part_id, t in parts:
            self.buffers.setdefault(int(part_id), []).append(t)
            self.buffered_bytes += t.nbytes
            n += t.num_rows
        if self.buffered_bytes >= self.flush_bytes:
            self._spill()
        return n

    def _spill(self) -> list[str]:
        assert self.out_dir is not None
        os.makedirs(self.out_dir, exist_ok=True)
        out = []
        for p, tables in sorted(self.buffers.items()):
            t = pa.concat_tables(tables).combine_chunks()
            if t.num_rows == 0:
                continue
            path = os.path.join(
                self.out_dir,
                f"{self.prefix}-p{p:04d}-w{self.writer_id:02d}"
                f"-f{self.seq:04d}.parquet",
            )
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
            out.append(path)
        self.buffers = {}
        self.buffered_bytes = 0
        self.seq += 1
        return out

    def flush(self) -> list[str]:
        return self._spill()


def make_writers(num_writers: int,
                 flush_bytes: int = DEFAULT_FLUSH_BYTES) -> list:
    return [
        PartitionWriter.remote(i, flush_bytes) for i in range(num_writers)
    ]


def send_partitioned(writers: list, parts, table: pa.Table,
                     part_col_values) -> None:
    """Route a table's rows to their partition owners; blocks until
    buffered (per-task delivery guarantee). ONE RPC per writer touched
    per chunk (not per partition — a chunk's discoveries scatter across
    ~all partitions, and per-partition RPCs were measured as the
    dominant term of the send stage)."""
    import numpy as np

    arr = np.asarray(part_col_values)
    # ONE stable sort + take, then zero-copy slices per partition —
    # replaces a full-table boolean filter per partition (measured 2.7×
    # on the split at 128 partitions; the stable sort preserves row
    # order within each partition, so writer output is unchanged)
    order = np.argsort(arr, kind="stable")
    st = table.take(pa.array(order))
    sarr = arr[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(sarr)) + 1))
    lens = np.diff(np.concatenate((starts, [len(sarr)])))
    by_owner: dict[int, list] = {}
    for s, ln in zip(starts, lens):
        p = int(sarr[s])
        by_owner.setdefault(p % len(writers), []).append(
            (p, st.slice(int(s), int(ln)))
        )
    refs = [
        writers[w].append_parts.remote(parts)
        for w, parts in by_owner.items()
    ]
    ray.get(refs)
