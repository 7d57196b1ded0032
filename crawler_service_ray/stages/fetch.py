"""Fetch/expand: look up admitted frontier URLs in the bucketed corpus.

The Ray analog of the reference's per-directory listing fetch
(`/root/reference/crawlers/globus_base_preserved.py:277`
``transfer.operation_ls`` with retry at ``:271-304``; funcX remote listing
`crawlers/local_funcx.py:122-169`): a stateful actor-pool ``map_batches``
stage (SURVEY.md §2.3 ST1) whose per-actor state — the corpus handle and a
bucket cache — is built once in ``__init__``, with per-batch work fully
vectorized over Arrow.

Locality: the corpus is laid out as ``bucket=BBB/part.parquet`` with
``bucket = url_hash % num_buckets`` (sources/corpus.py), so a batch touches
only the buckets its URLs hash into; each bucket is read once per actor and
cached (LRU-capped). At real scale this is the remote GET; the bucket reads
model row-group-pruned Lance/parquet point lookups.

Output: one row per admitted URL — status 200 + verbatim ``spans`` when the
doc exists, 404 + empty spans otherwise (the reference drops failed dirs to
``failed_dirs.json`` `:473-477`; here failures are first-class rows). Span
sequences are copied zero-copy via ``take`` — the row-for-row span-sequence
equality invariant holds by construction.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.corpus import SPANS_TYPE, bucket_path, corpus_meta
from ..urls import hash_urls

FETCHED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
        ("fetch_epoch", pa.int32()),
        ("host_rank", pa.int32()),
        ("virtual_ts_ms", pa.int64()),
        ("status", pa.int16()),
        ("spans", SPANS_TYPE),
        ("n_text_spans", pa.int32()),
        ("n_media_spans", pa.int32()),
        ("n_links", pa.int32()),
        ("bytes", pa.int64()),
    ]
)


class CorpusFetcher:
    """Callable class for ``map_batches(..., concurrency=N)``."""

    def __init__(self, corpus_dir: str, epoch: int, max_cached_buckets: int = 64):
        self.corpus_dir = corpus_dir
        self.epoch = epoch
        self.num_buckets = corpus_meta(corpus_dir)["num_buckets"]
        self.max_cached = max_cached_buckets
        # bucket -> (dict url->row_idx, table); LRU
        self._cache: OrderedDict[int, tuple[dict, pa.Table]] = OrderedDict()

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _bucket(self, b: int) -> tuple[dict, pa.Table]:
        hit = self._cache.get(b)
        if hit is not None:
            self._cache.move_to_end(b)
            return hit
        tbl = pq.read_table(bucket_path(self.corpus_dir, b))
        index = {u: i for i, u in enumerate(tbl["doc_id"].to_pylist())}
        self._cache[b] = (index, tbl)
        if len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)
        return self._cache[b]

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        urls = t["url"].to_numpy(zero_copy_only=False)
        if n == 0:
            return pa.Table.from_pylist([], schema=FETCHED_SCHEMA)
        buckets = (hash_urls(urls) % np.uint64(self.num_buckets)).astype(np.int64)
        # row index into the bucket table, -1 = miss (404)
        src_row = np.full(n, -1, dtype=np.int64)
        spans_chunks: list[pa.Array] = []
        order: list[np.ndarray] = []
        for b in np.unique(buckets):
            index, tbl = self._bucket(int(b))
            sel = np.nonzero(buckets == b)[0]
            rows = np.array([index.get(u, -1) for u in urls[sel]], dtype=np.int64)
            src_row[sel] = rows
            hit_sel = sel[rows >= 0]
            if hit_sel.size:
                spans_chunks.append(
                    t_spans_take(tbl, rows[rows >= 0])
                )
                order.append(hit_sel)
        status = np.where(src_row >= 0, 200, 404).astype(np.int16)
        # assemble spans in original row order: hits get their doc spans,
        # misses get an empty list
        spans = _assemble_spans(n, order, spans_chunks)
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False)
        mlen = pc.utf8_length(flat.field("media_ref")).to_numpy(
            zero_copy_only=False
        )
        n_text = np.bincount(parents[kinds == "text"], minlength=n)
        n_media = np.bincount(parents[kinds == "media"], minlength=n)
        n_links = np.bincount(parents[kinds == "link"], minlength=n)
        nbytes = np.bincount(parents, weights=(tlen + mlen), minlength=n)
        return pa.Table.from_arrays(
            [
                t["url"].combine_chunks(),
                t["url"].combine_chunks(),
                t["host"].combine_chunks(),
                t["priority"].combine_chunks(),
                t["depth"].combine_chunks(),
                pa.array(np.full(n, self.epoch, dtype=np.int32)),
                t["host_rank"].combine_chunks(),
                t["virtual_ts_ms"].combine_chunks(),
                pa.array(status, type=pa.int16()),
                spans,
                pa.array(n_text.astype(np.int32)),
                pa.array(n_media.astype(np.int32)),
                pa.array(n_links.astype(np.int32)),
                pa.array(nbytes.astype(np.int64)),
            ],
            schema=FETCHED_SCHEMA,
        )


def t_spans_take(tbl: pa.Table, rows: np.ndarray) -> pa.Array:
    arr = tbl["spans"].combine_chunks()
    return arr.take(pa.array(rows, type=pa.int64()))


def _assemble_spans(
    n: int, order: list[np.ndarray], chunks: list[pa.Array]
) -> pa.ListArray:
    """Scatter per-bucket span arrays back to original row positions;
    missing rows become empty lists."""
    if not order:
        return pa.array([[] for _ in range(n)], type=SPANS_TYPE)
    concat = (
        chunks[0]
        if len(chunks) == 1
        else pa.concat_arrays([c.cast(SPANS_TYPE) for c in chunks])
    )
    pos = np.concatenate(order)
    # take-index per output row: hits -> position in concat, miss -> None
    take_idx = np.full(n, -1, dtype=np.int64)
    take_idx[pos] = np.arange(len(pos))
    taken = concat.take(
        pa.array(np.where(take_idx >= 0, take_idx, 0), type=pa.int64())
    )
    # blank out the misses (turn their copied lists into empty lists)
    if (take_idx < 0).any():
        offsets = taken.offsets.to_numpy(zero_copy_only=False).copy()
        lengths = np.diff(offsets)
        lengths[take_idx < 0] = 0
        new_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=new_offsets[1:])
        # rebuild values: keep only spans of hit rows
        keep_mask = np.repeat(take_idx >= 0, np.diff(offsets))
        values = taken.values.filter(pa.array(keep_mask))
        taken = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int64()).cast(pa.int32()), values
        )
    return taken.cast(SPANS_TYPE)
