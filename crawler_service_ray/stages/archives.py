"""Nested-content expansion: compressed spans → member documents.

The Ray analog of the reference's recursive archive decompression
(`/root/reference/legacy/decompressor.py:13-75` extract;
`legacy/posix_crawler.py:114-147` ``recursive_compress_check`` fixed
point; `:150-185,232` second metadata pass over extracted content;
`:131-134` the already-extracted set): a fetched document whose spans
include ``kind="compressed"`` expands IN-EPOCH into member documents with
their own spans. Members are appended to the epoch's fetched output
(``src="archive"``), are enriched and link-extracted like any fetched
doc (their link spans feed the frontier — the reference's re-scan), and
may themselves contain compressed spans — the loop runs to fixed point
within the batch.

Exactly-once extraction across the whole crawl: archive refs are probed
against the sharded seen service under the ``xarch|`` namespace (so
archive keys can never collide with URL keys); a shared archive
referenced by many pages is extracted by whichever fetch wins the probe,
and because member rows are a pure function of the archive payload the
fetched table is byte-identical regardless of the winner (the
local/dataset equivalence tests pin this).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..urls import hash_urls, hosts_of
from ..sources.corpus import SPANS_TYPE
from .fetch import FETCHED_SCHEMA, span_stat_columns

ARCHIVE_NS = "xarch|"


def _member_table(urls: list[str], spans: pa.ListArray, epoch: int) -> pa.Table:
    """Fetched-schema rows for extracted members. Every column is a pure
    function of (archive payload, epoch) — race-free under concurrent
    extraction. Politeness fields are sentinels (extraction is local
    compute, not a fetch): host_rank=-1, virtual_ts_ms=0."""
    n = len(urls)
    u = np.array(urls, dtype=object)
    n_text, n_media, n_links, nbytes = span_stat_columns(spans, n)
    return pa.Table.from_arrays(
        [
            pa.array(u, type=pa.string()),
            pa.array(u, type=pa.string()),
            pa.array(hosts_of(u), type=pa.string()),
            pa.array(np.zeros(n, dtype=np.float32)),
            pa.array(np.full(n, epoch, dtype=np.int32)),
            pa.array(np.full(n, epoch, dtype=np.int32)),
            pa.array(np.full(n, -1, dtype=np.int32)),
            pa.array(np.zeros(n, dtype=np.int64)),
            pa.array(np.zeros(n, dtype=np.int16)),
            pa.array(np.full(n, 200, dtype=np.int16)),
            pa.array(np.full(n, "archive", dtype=object), type=pa.string()),
            spans,
            pa.array(n_text.astype(np.int32)),
            pa.array(n_media.astype(np.int32)),
            pa.array(n_links.astype(np.int32)),
            pa.array(nbytes.astype(np.int64)),
        ],
        schema=FETCHED_SCHEMA,
    )


def expand_archives(
    fetched: pa.Table, shards: list, epoch: int, metrics_cb=None
) -> pa.Table:
    """Expand every not-yet-extracted compressed span of a fetched batch
    into member rows, to fixed point (nested archives). Returns the batch
    with member rows appended.

    Counters (parity-checked vs the oracle): ``archives_expanded`` = refs
    extracted here; ``archives_dup`` = occurrences of already-extracted
    refs; ``members_extracted`` = member rows emitted.
    """
    from ..state.seen import probe_shards

    out = [fetched]
    spans_src = fetched["spans"].combine_chunks()
    n_new_total = n_dup_total = n_members_total = 0
    while len(spans_src) > 0:
        flat = spans_src.flatten()
        is_c = pc.equal(flat.field("kind"), "compressed")
        n_occ = int(pc.sum(pc.cast(is_c, pa.int64())).as_py() or 0)
        if n_occ == 0:
            break
        arefs = flat.field("media_ref").filter(is_c).to_pylist()
        payloads = flat.field("text").filter(is_c).to_pylist()
        uniq: dict[str, str] = {}
        for a, p in zip(arefs, payloads):
            uniq.setdefault(a, p)
        keys = np.array([ARCHIVE_NS + a for a in uniq], dtype=object)
        is_new = probe_shards(shards, hash_urls(keys))
        new_items = [
            (a, uniq[a]) for a, nw in zip(uniq, is_new) if nw
        ]
        n_new_total += len(new_items)
        n_dup_total += n_occ - len(new_items)
        if not new_items:
            break
        urls: list[str] = []
        spans_py: list[list[dict]] = []
        for aref, payload in new_items:
            doc = json.loads(payload)
            for mem in doc["members"]:
                urls.append(f"{aref}#{mem['name']}")
                spans_py.append(mem["spans"])
        member_spans = pa.array(spans_py, type=SPANS_TYPE)
        tbl = _member_table(urls, member_spans, epoch)
        n_members_total += len(urls)
        out.append(tbl)
        spans_src = member_spans  # fixed point: nested archives
    if metrics_cb is not None and (n_new_total or n_dup_total):
        metrics_cb("archives_expanded", n_new_total)
        metrics_cb("archives_dup", n_dup_total)
        metrics_cb("members_extracted", n_members_total)
    if len(out) == 1:
        return fetched
    return pa.concat_tables(out).combine_chunks()
