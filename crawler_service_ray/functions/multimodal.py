"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata; the
decode / feature-extract / resize / frame-sample steps run as actor-pool
``map_batches`` stages. The actual codec libraries are NOT in this
container (environment constraint), so the codec call is stubbed behind a
deterministic fake (``FakeCodec``) while everything Ray-side — schema,
batch sizing for large binary rows, actor signature, output layout — is
real and tested. Swap ``FakeCodec`` for PIL/ffmpeg bindings in a real
deployment; the stage contract does not change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def media_table_from_fetched(t: pa.Table) -> pa.Table:
    """Extract media spans from fetched docs into a media table with a
    synthetic binary payload (deterministic bytes derived from the ref —
    stands in for the fetched object)."""
    spans = t["spans"].combine_chunks()
    flat = spans.flatten()
    parents = pc.list_parent_indices(spans)
    is_media = pc.equal(flat.field("kind"), "media")
    refs = flat.field("media_ref").filter(is_media)
    owners = t["doc_id"].combine_chunks().take(parents.filter(is_media))
    refs_np = refs.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(refs_np, dtype=object))
    payloads = [
        (int(x) % 251 + 1).to_bytes(1, "little") * (int(x) % 4096 + 64)
        for x in h
    ]
    mtype = np.where(
        pd.Series(refs_np).str.endswith(".bin").to_numpy(), "image/fake",
        "application/octet-stream",
    )
    return pa.Table.from_arrays(
        [
            refs,
            owners,
            pa.array(payloads, type=pa.binary()),
            pa.array(mtype, type=pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class FakeCodec:
    """Deterministic stand-in for an image/audio decoder.

    A real deployment replaces ``decode`` with PIL/libav calls; raising
    ``NotImplementedError`` for types the fake does not model keeps the
    failure surface identical to a codec error.
    """

    def decode(self, payload: bytes, media_type: str) -> dict:
        if media_type == "image/fake":
            h = int(pd.util.hash_array(np.array([payload], dtype=object))[0])
            return {
                "width": 64 + h % 1920,
                "height": 64 + (h >> 16) % 1080,
                "n_frames": 1 + (h >> 32) % 4,
            }
        raise NotImplementedError(f"no codec for {media_type}")


class MediaFeatures:
    """Actor-pool stage: codec loaded once per actor (ST3 analog,
    `/root/reference/crawlers/local_funcx.py:128` loads `magic` once);
    per batch decodes payloads and emits typed feature columns. Batches
    must stay SMALL for large binary rows — callers pass batch_size
    sized by bytes, not rows."""

    def __init__(self):
        self.codec = FakeCodec()

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        mtypes = t["media_type"].to_pylist()
        width = np.zeros(len(payloads), dtype=np.int32)
        height = np.zeros(len(payloads), dtype=np.int32)
        frames = np.zeros(len(payloads), dtype=np.int32)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, (p, m) in enumerate(zip(payloads, mtypes)):
            try:
                f = self.codec.decode(p, m)
                width[i], height[i], frames[i] = (
                    f["width"], f["height"], f["n_frames"],
                )
                ok[i] = True
            except NotImplementedError:
                ok[i] = False
        return pa.Table.from_arrays(
            [
                t["media_ref"].combine_chunks(),
                t["doc_id"].combine_chunks(),
                pa.array([len(p) for p in payloads], type=pa.int64()),
                pa.array(width),
                pa.array(height),
                pa.array(frames),
                pa.array(ok),
            ],
            names=[
                "media_ref", "doc_id", "payload_bytes", "width", "height",
                "n_frames", "decoded",
            ],
        )


def media_features(ds: rd.Dataset, batch_size: int = 256) -> rd.Dataset:
    """fetched-docs Dataset → per-media feature rows. Small batch_size:
    binary payloads make rows wide, so blocks are bounded by bytes."""
    media = ds.map_batches(
        media_table_from_fetched, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return media.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
