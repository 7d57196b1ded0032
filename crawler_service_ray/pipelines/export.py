"""Training-data export: the end-to-end "curate a corpus to disk" pass.

Composes the oracle-checked curation kernels — quality/language scoring,
exact first-wins dedup, deterministic train/val/test assignment — and
writes hive-partitioned parquet (``split=…/lang_pred=…``) with an atomic
rename + manifest so reruns skip finished work. This is the consumer-side
analog of the reference's drain-to-JSONL endpoint
(`/root/reference/application.py:198-296`) reshaped for training
pipelines: partitioned columnar output instead of a paginated queue.

Two sources:
- :func:`export_corpus` — a documents parquet shard (scores computed
  here with the oracle-checked kernels);
- :func:`export_run` — a finished crawl run directory (the flagship
  pipeline's output): text reassembled from the interleaved span lists,
  quality/language read from the crawl's own enrichment columns — crawl
  → curate → training data with no re-scoring pass.

Resumability model: the whole export commits atomically (tmp dir →
rename, manifest last), matching the crawl's tmp-epoch pattern; a rerun
with a complete manifest returns it without touching Ray. At 100 TB the
unit of atomicity is one input shard — run one export per shard
directory and skip shards whose manifest exists (the CLI takes the shard
as ``--sf-dir`` / ``--from-run``); within a shard Ray Data streams, so
worker failures retry per-task, and only a driver loss re-runs the shard.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd

from ..functions import dedup, text

# media-pair count above which the media/ table's aggregate merge is
# hash-partitioned instead of driver-collected (the grouped_agg
# ≲10^6-key rule, applied with headroom because distinct media_ref
# scales with the corpus). Module-level so tests can exercise the
# partitioned path at fixture scale.
MEDIA_MERGE_DRIVER_MAX = 500_000


def _assign_split(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic 80/10/10 split. Integer ids use the same Knuth
    multiplicative hash as the oracle-checked ``split_assign`` query;
    string ids (crawl URLs) use the 64-bit content hash — both are pure
    functions of the id, invariant to parallelism and reruns.

    Integer ids must be nonnegative (< 2^63): the uint64 cast wraps
    negative values differently from the SQL oracle's signed ``%`` (see
    ``cap_per_group``'s precondition note) — true for every id source
    this engine produces."""
    ids = df["doc_id"]
    if pd.api.types.is_integer_dtype(ids):
        iv = ids.to_numpy().astype(np.uint64)
        h = ((iv % np.uint64(2**32)) * np.uint64(2654435761)) \
            % np.uint64(2**32) % np.uint64(10)
    else:
        h = pd.util.hash_array(
            ids.to_numpy(dtype=object)).astype(np.uint64) % np.uint64(10)
    df = df.copy()
    df["split"] = np.where(h < 8, "train",
                           np.where(h < 9, "val", "test")).astype(object)
    return df


def _assign_split_arrow(t):
    """Arrow-format twin of :func:`_assign_split` for the multimodal
    path, where the batch carries a nested ``segments`` column that must
    not round-trip through the pandas block codec. Same hash, same
    labels — only the doc_id column is pulled into numpy."""
    import pyarrow as pa

    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    if ids.dtype.kind in "iu":
        iv = ids.astype(np.uint64)
        h = ((iv % np.uint64(2**32)) * np.uint64(2654435761)) \
            % np.uint64(2**32) % np.uint64(10)
    else:
        h = pd.util.hash_array(
            ids.astype(object)).astype(np.uint64) % np.uint64(10)
    split = np.where(h < 8, "train", np.where(h < 9, "val", "test"))
    return t.append_column("split", pa.array(split, type=pa.string()))


def _load_merges(bpe_merges) -> list[tuple[str, str]] | None:
    """Resolve the ``bpe_merges`` export argument — a merges DataFrame
    (from ``bpe_train_merges``) or a parquet path (from the `train-bpe`
    CLI) — to the rank-ordered (left, right) list the encode kernel
    applies. None means whitespace tokens."""
    if bpe_merges is None:
        return None
    if isinstance(bpe_merges, str):
        import pyarrow.parquet as pq

        bpe_merges = pq.read_table(bpe_merges).to_pandas()
    m = bpe_merges.sort_values("rank")
    return [(str(lt), str(rt)) for lt, rt in zip(m["left"], m["right"])]


def _update_lsh_index(
    out_dir: str,
    index_dir: str,
    manifest: dict,
    manifest_path: str,
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    num_shards: int = 16,
) -> dict:
    """The daily-crawl dedup loop: report this export's near-dups
    against a PERSISTENT cross-run LSH index, then fold the export's
    docs into it — so each crawl is deduped against every crawl before
    it at O(delta) banding cost (`dedup.minhash_dedup_incremental`
    path-prunes untouched index shards).

    The index directory holds the band shards (``shard=*``, maintained
    by ``minhash_index_write``) plus ``docs/`` — the (doc_id, text)
    store needed to verify candidate pairs' true Jaccard; one parquet
    file per indexed run, named by the run tag so a retried export
    overwrites instead of duplicating. Appends are tagged with the run
    dir, making the whole phase idempotent: re-running a crashed export
    recomputes the same pairs and never double-indexes. Pair output
    lands in ``<out_dir>/near_dups/`` (id_a, id_b, jaccard) and the
    manifest gains an ``lsh`` block with delta/cross/in-delta counts.

    First run against an empty index bootstraps it: pairs are the
    delta's in-delta near-dups (`minhash_lsh_pairs`)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..functions.dedup import (
        minhash_dedup_incremental,
        minhash_index_write,
        minhash_lsh_pairs,
    )

    delta = rd.read_parquet(os.path.join(out_dir, "data")) \
        .select_columns(["doc_id", "text"]).materialize()
    n_delta = delta.count()
    run_tag = manifest.get("run_dir") or manifest.get("sf_dir") or out_dir
    docs_dir = os.path.join(index_dir, "docs")
    bootstrap = not os.path.exists(
        os.path.join(index_dir, "index_meta.json"))

    if bootstrap:
        pairs = minhash_lsh_pairs(delta, num_perm=num_perm, bands=bands,
                                  threshold=threshold).to_pandas()
    else:
        import glob as _glob

        base_files = sorted(_glob.glob(os.path.join(docs_dir,
                                                    "*.parquet")))
        base_docs = rd.read_parquet(base_files)
        pairs = minhash_dedup_incremental(
            delta, index_dir, base_docs, threshold=threshold,
        ).to_pandas()

    nd_dir = os.path.join(out_dir, "near_dups")
    os.makedirs(nd_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pairs, preserve_index=False),
                   os.path.join(nd_dir, "pairs.parquet"))

    delta_ids = set(delta.to_pandas()["doc_id"])
    in_delta = int((pairs["id_a"].isin(delta_ids)
                    & pairs["id_b"].isin(delta_ids)).sum()) \
        if len(pairs) else 0

    # fold the delta into the index: bands (tagged, idempotent) + texts
    # (deterministic filename per run tag, so retries overwrite)
    if bootstrap:
        minhash_index_write(delta, index_dir, num_perm=num_perm,
                            bands=bands, num_shards=num_shards)
    else:
        minhash_index_write(delta, index_dir, num_perm=num_perm,
                            bands=bands, num_shards=num_shards,
                            append=True, tag=run_tag)
    os.makedirs(docs_dir, exist_ok=True)
    fname = hashlib.sha1(run_tag.encode()).hexdigest()[:16] + ".parquet"
    tmp = os.path.join(docs_dir, "." + fname + ".tmp")
    delta.to_pandas().to_parquet(tmp, index=False)
    os.replace(tmp, os.path.join(docs_dir, fname))

    manifest["lsh"] = {
        "index_dir": os.path.abspath(index_dir),
        "bootstrap": bootstrap,
        "delta_docs": int(n_delta),
        "near_dup_pairs": int(len(pairs)),
        "in_delta_pairs": in_delta,
        "cross_pairs": int(len(pairs)) - in_delta,
        "threshold": threshold,
    }
    return _write_manifest(manifest, manifest_path)


def _write_manifest(manifest: dict, manifest_path: str) -> dict:
    os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(manifest_path + ".tmp", manifest_path)
    return manifest


def _dedup_split_write(
    kept,
    out_dir: str,
    base: dict,
    packed: bool,
    pack_capacity: int,
    manifest_path: str,
    multimodal: bool = False,
    bpe: bool = False,
    shuffle_shards: int | None = None,
) -> dict:
    """Shared tail: exact dedup (columns ride as passengers) → split →
    partitioned write (+ optional packed table) → manifest. ``kept`` is
    a materialized Dataset with at least (doc_id, text, lang_pred);
    with ``multimodal=True`` it also carries (segments, n_media,
    n_tokens) and the export additionally (a) keeps the interleaved
    ``segments`` column in ``data/``, (b) writes a ``media/`` table of
    corpus-deduped refs (media_ref, n_uses, first_doc), (c) accounts
    media in the manifest, and (d) packs INTERLEAVED sequences (media
    refs preserved in document order) instead of text-only payloads.

    ``shuffle_shards=N`` prepends a ``shard=`` hive level to ``data/``:
    each surviving doc's shard is its contiguous range of the global
    hash order (`balanced_hash_shards` — a bin-count collect plus one
    streaming pass, NO exchange), so the written layout IS a
    reproducible global shuffle — the same doc lands in the same shard
    on any rerun at any parallelism, shard sizes are balanced to within
    one hash bin, and a consumer reading ``shard=0..N-1`` in order
    streams the corpus in shuffled order without ``random_shuffle``'s
    nondeterministic all-to-all."""
    if kept.count() == 0:
        # an earlier export into this out_dir may have left data/ and
        # packed/ behind; a 0-row manifest must not sit next to stale
        # partitions a hive reader would still see
        shutil.rmtree(os.path.join(out_dir, "data"), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "packed"), ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "media"), ignore_errors=True)
        return _write_manifest(
            {**base, "rows_written": 0, "partitions": {}}, manifest_path)

    # winners carry their full row through the dedup shuffle as
    # passenger columns — one exchange instead of dedup + re-join. The
    # multimodal path uses the Arrow form throughout: the segments
    # list<struct> rides every stage as Arrow buffers (Ray's pandas
    # codec cannot round-trip nested columns, and per-row Python
    # materialization was the old path's hot loop).
    passengers = [c for c in kept.schema().names if c != "doc_id"]
    if multimodal:
        survivors = dedup.exact_dedup_arrow(
            kept, text_col="text", id_col="doc_id", keep_cols=passengers)
        final = survivors.map_batches(_assign_split_arrow,
                                      batch_format="pyarrow")
    else:
        survivors = dedup.exact_dedup(
            kept, text_col="text", id_col="doc_id", keep_cols=passengers)
        final = survivors.map_batches(_assign_split,
                                      batch_format="pandas")
    if packed or multimodal:
        # the doc table, the media table and the packed table all
        # consume `final`; materialize so the dedup chain executes once
        final = final.materialize()

    data_dir = os.path.join(out_dir, "data")
    tmp_dir = os.path.join(out_dir, ".tmp_data")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    data_out, part_cols = final, ["split", "lang_pred"]
    if shuffle_shards:
        from ..functions.relational import balanced_hash_shards

        data_out = balanced_hash_shards(final, "doc_id", shuffle_shards)
        part_cols = ["shard"] + part_cols
    data_out.write_parquet(tmp_dir, partition_cols=part_cols)
    os.replace(tmp_dir, data_dir)

    # a rerun with narrower flags must not leave a previous export's
    # sibling tables beside the fresh manifest (same hazard as the
    # 0-row path): the manifest must account for everything on disk
    if not multimodal:
        shutil.rmtree(os.path.join(out_dir, "media"), ignore_errors=True)
    if not packed:
        shutil.rmtree(os.path.join(out_dir, "packed"), ignore_errors=True)

    if multimodal:
        # corpus-level media dedup: explode (media_ref, doc_id) pairs —
        # only those pairs shuffle, never payloads — and aggregate to one
        # row per distinct ref with its use count and first-owner doc
        from ..functions.relational import grouped_agg

        def media_pairs(t):
            # vectorized Arrow explode: flatten the segment lists once,
            # keep media entries, repeat doc ids by parent index — no
            # per-row Python over segments
            import pyarrow as pa
            import pyarrow.compute as pc

            segs = t.column("segments")
            flat = pc.list_flatten(segs).combine_chunks()
            parents = pc.list_parent_indices(segs).to_numpy(
                zero_copy_only=False)
            kinds = flat.field("kind").to_numpy(zero_copy_only=False)
            m = kinds == "media"
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "media_ref": flat.field("media_ref").filter(
                    pa.array(m)),
                "doc_id": pa.array(ids[parents[m]],
                                   type=t.schema.field("doc_id").type),
            })

        # distinct media_ref scales with the corpus: size the merge
        # from the input so the media-table aggregate NEVER collects on
        # the driver at scale (Σ n_media bounds the pair count; free on
        # the materialized dataset). grouped_agg's partial-count
        # auto-switch remains the backstop for misestimates.
        from ..functions.relational import AUTO_MERGE_ROWS_PER_PART

        n_pairs = int(final.sum("n_media") or 0)
        mp = (None if n_pairs <= MEDIA_MERGE_DRIVER_MAX
              else max(2, -(-n_pairs // AUTO_MERGE_ROWS_PER_PART)))
        media_tbl = grouped_agg(
            final.map_batches(media_pairs, batch_format="pyarrow"),
            ["media_ref"],
            {"n_uses": ("doc_id", "count"), "first_doc": ("doc_id", "min")},
            merge_partitions=mp,
        )
        # second dedup tier: payload features + content-hash
        # canonicalization over the UNIQUE refs (payload work once per
        # distinct ref; distinct refs serving identical bytes collapse
        # to a canonical_ref)
        from ..functions.multimodal import (
            MediaRefFeatures,
            media_content_dedup,
        )

        media_dir = os.path.join(out_dir, "media")
        tmp_m = os.path.join(out_dir, ".tmp_media")
        shutil.rmtree(tmp_m, ignore_errors=True)
        shutil.rmtree(media_dir, ignore_errors=True)
        os.makedirs(tmp_m, exist_ok=True)
        media_tbl = media_tbl.materialize()
        if media_tbl.count() > 0:
            media_tbl = media_content_dedup(media_tbl.map_batches(
                MediaRefFeatures, batch_format="pandas", batch_size=2048,
                concurrency=(1, 4), max_restarts=0,
            ))
            media_tbl.write_parquet(tmp_m)
        else:
            # all-text corpus: commit an empty table WITH schema so
            # readers (and the manifest pass below) never hit a
            # schemaless directory; first_doc's type must match what a
            # media-bearing export of the SAME source would write
            # (doc_id is int for table shards, string for crawl runs)
            import pyarrow as pa
            import pyarrow.parquet as pq

            sch = final.schema()
            t = sch.types[list(sch.names).index("doc_id")]
            is_int = (pa.types.is_integer(t) if isinstance(t, pa.DataType)
                      else np.issubdtype(t, np.integer))
            id_type = pa.int64() if is_int else pa.string()
            pq.write_table(
                pa.table({
                    "media_ref": pa.array([], type=pa.string()),
                    "n_uses": pa.array([], type=pa.int64()),
                    "first_doc": pa.array([], type=id_type),
                    "content_hash": pa.array([], type=pa.string()),
                    "payload_bytes": pa.array([], type=pa.int64()),
                    "media_type": pa.array([], type=pa.string()),
                    "decoded": pa.array([], type=pa.bool_()),
                    "canonical_ref": pa.array([], type=pa.string()),
                }),
                os.path.join(tmp_m, "empty.parquet"),
            )
        os.replace(tmp_m, media_dir)

    if packed:
        def tag_group(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                __grp=df["split"].astype(str) + "\x1f"
                + df["lang_pred"].astype(str))

        def untag(df: pd.DataFrame) -> pd.DataFrame:
            parts = df["__grp"].str.split("\x1f")
            df = df.drop(columns="__grp")
            df["split"] = parts.str[0]
            df["lang_pred"] = parts.str[1]
            return df

        def tag_group_arrow(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            comb = pc.binary_join_element_wise(
                pc.cast(t.column("split"), pa.string()),
                pc.cast(t.column("lang_pred"), pa.string()), "\x1f")
            return t.append_column("__grp", comb)

        def untag_arrow(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            parts = pc.split_pattern(t.column("__grp"), "\x1f")
            t = t.drop_columns(["__grp"])
            t = t.append_column(
                "split", pc.cast(pc.list_element(parts, 0), pa.string()))
            return t.append_column(
                "lang_pred",
                pc.cast(pc.list_element(parts, 1), pa.string()))

        if multimodal:
            # interleaved sequences: media refs ride in document order;
            # arrow-format stages end-to-end (nested segments column)
            tagged = final.map_batches(tag_group_arrow,
                                       batch_format="pyarrow")
            seqs = text.pack_interleaved(
                tagged, capacity=pack_capacity, group_col="__grp",
                tokens_col="n_tokens",
            ).map_batches(untag_arrow, batch_format="pyarrow")
        else:
            tagged = final.map_batches(tag_group, batch_format="pandas")
            seqs = text.pack_payloads(
                tagged, capacity=pack_capacity, group_col="__grp",
                tokens_col="n_tokens" if bpe else None,
            ).map_batches(untag, batch_format="pandas")
        packed_dir = os.path.join(out_dir, "packed")
        tmp_p = os.path.join(out_dir, ".tmp_packed")
        shutil.rmtree(tmp_p, ignore_errors=True)
        shutil.rmtree(packed_dir, ignore_errors=True)
        os.makedirs(tmp_p, exist_ok=True)
        seqs.write_parquet(tmp_p, partition_cols=["split", "lang_pred"])
        os.replace(tmp_p, packed_dir)

    # partition sizes from the written files (what a consumer will see)
    import pyarrow.dataset as pads

    written = pads.dataset(data_dir, partitioning="hive")
    tbl = written.to_table(columns=["split", "lang_pred"])
    sizes = (
        tbl.to_pandas().groupby(["split", "lang_pred"]).size().sort_index()
    )
    manifest = {
        **base,
        "rows_written": int(sizes.sum()),
        "partitions": {f"{s}/{lg}": int(n) for (s, lg), n in sizes.items()},
    }
    if shuffle_shards:
        sc = (pd.Series(written.to_table(columns=["shard"])["shard"]
                        .to_numpy(zero_copy_only=False))
              .astype("int64").value_counts().sort_index())
        manifest["shuffle_shards"] = shuffle_shards
        manifest["shards"] = {str(k): int(v) for k, v in sc.items()}
    if multimodal:
        mt = pads.dataset(os.path.join(out_dir, "media")).to_table(
            columns=["media_ref", "n_uses", "content_hash"])
        manifest["media_unique"] = int(mt.num_rows)
        manifest["media_occurrences"] = int(
            pd.Series(mt["n_uses"].to_numpy(zero_copy_only=False)).sum())
        manifest["media_content_unique"] = int(
            len(pd.unique(mt["content_hash"].to_numpy(
                zero_copy_only=False))))
    if packed:
        pcols = ["split", "lang_pred", "n_docs", "seq_tokens"]
        if multimodal:
            pcols.append("n_media")
        pt = pads.dataset(
            os.path.join(out_dir, "packed"), partitioning="hive"
        ).to_table(columns=pcols)
        pdf = pt.to_pandas()
        manifest["pack_capacity"] = pack_capacity
        manifest["tokenizer"] = "bpe" if bpe else "whitespace"
        manifest["sequences"] = {
            f"{s}/{lg}": int(n) for (s, lg), n in
            pdf.groupby(["split", "lang_pred"]).size().sort_index().items()
        }
        manifest["packed_docs"] = int(pdf["n_docs"].sum())
        manifest["packed_tokens"] = int(pdf["seq_tokens"].sum())
        if multimodal:
            manifest["packed_media"] = int(pdf["n_media"].sum())
    return _write_manifest(manifest, manifest_path)


def export_corpus(
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    resume: bool = True,
    packed: bool = False,
    pack_capacity: int = 2048,
    multimodal: bool = False,
    bpe_merges=None,
    shuffle_shards: int | None = None,
) -> dict:
    """Filter → dedup → split → write hive-partitioned parquet from a
    documents shard.

    With ``packed=True`` a second table ``packed/`` is written: the
    surviving documents greedily packed into ``pack_capacity``-token
    sequences per (split, lang) group — split boundaries are never
    crossed, so train sequences cannot leak val/test text — one row per
    sequence (seq text + doc count + token sum), same hive partitioning.

    ``bpe_merges`` (a merge table from ``bpe_train_merges`` or a parquet
    path from the `train-bpe` CLI) switches the per-doc ``n_tokens``
    accounting — and therefore what ``pack_capacity`` MEANS — from
    whitespace tokens to real BPE tokenizer tokens, applied in the same
    scoring pass (`bpe_doc_token_counts`, unique-words-per-batch encode,
    no extra exchange). The manifest records ``tokenizer``.

    With ``multimodal=True`` each document is first re-derived as an
    interleaved text+media segment sequence (`interleaved_docs` — the
    deterministic derivation the mm_* oracle queries pin) and the
    export carries segments / media table / media accounting exactly
    like `export_run`'s multimodal path.

    Returns the manifest: input/kept/written row counts and per
    (split, lang) partition sizes. With ``resume=True`` a complete
    manifest short-circuits the whole export.
    """
    manifest_path = os.path.join(out_dir, "export_manifest.json")
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)

    from .queries import read_table

    mlist = _load_merges(bpe_merges)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_in = docs.count()
    if multimodal:
        from ..functions.multimodal import interleaved_docs

        docs = interleaved_docs(docs)

    def score(t):
        # arrow-format stage: the scoring kernels run on a two-column
        # pandas view (text + id only); the nested segments column is
        # never pulled out of Arrow
        import pyarrow as pa

        tdf = pd.DataFrame({
            "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
            "text": t.column("text").to_numpy(zero_copy_only=False),
        })
        q = text.quality_features(tdf)
        lang = text.LangId()(tdf)
        qs = q["quality_score"].to_numpy()
        lp = lang["lang_pred"].to_numpy()
        cols = {
            "doc_id": t.column("doc_id"),
            "text": t.column("text"),
            "quality_score": pa.array(qs, type=pa.float64()),
            "n_words": pa.array(
                q["n_words"].to_numpy().astype("int64")),
            "lang_pred": pa.array(lp, type=pa.string()),
        }
        if multimodal:
            cols["segments"] = t.column("segments")
            cols["n_media"] = t.column("n_media")
            cols["n_tokens"] = t.column("n_tokens")
        if mlist is not None:
            # pack budgets in real tokenizer tokens: overrides the
            # word-count n_tokens on the multimodal path, adds the
            # column on the text-only path
            cols["n_tokens"] = pa.array(
                text.bpe_doc_token_counts(tdf["text"], mlist)[1])
        out = pa.table(cols)
        keep = qs >= min_quality
        if langs is not None:
            keep &= pd.Series(lp).isin(langs).to_numpy()
        return out.filter(pa.array(keep))

    # one scoring pass: materialize the (shard-sized) filtered rows so
    # the emptiness probe and the dedup reuse the same blocks
    kept = docs.map_batches(score, batch_format="pyarrow").materialize()
    base = {"sf_dir": os.path.abspath(sf_dir), "rows_in": int(n_in),
            "min_quality": min_quality, "langs": langs}
    if isinstance(bpe_merges, str):
        base["bpe_merges"] = os.path.abspath(bpe_merges)
    return _dedup_split_write(kept, out_dir, base, packed, pack_capacity,
                              manifest_path, multimodal=multimodal,
                              bpe=mlist is not None,
                              shuffle_shards=shuffle_shards)


def export_run(
    run_dir: str,
    out_dir: str,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    resume: bool = True,
    packed: bool = False,
    pack_capacity: int = 2048,
    multimodal: bool = True,
    bpe_merges=None,
    lsh_index: str | None = None,
    lsh_threshold: float = 0.7,
    shuffle_shards: int | None = None,
) -> dict:
    """Crawl → curate → training data: export a finished crawl run.

    Text is reassembled from each fetched doc's interleaved span list
    (already in offset order — span-sequence equality vs the reference
    is pytest-pinned, so the concatenation is deterministic);
    quality_score / lang_pred come from the crawl's own enrichment
    columns, so no re-scoring pass runs. doc_id is the URL; the split
    hash is the 64-bit string hash (same invariance guarantees as the
    integer path).

    With ``multimodal=True`` (default) the export PRESERVES the media
    modality the crawl fetched: each doc keeps its interleaved
    ``segments`` (text + media spans in document order; link spans are
    navigation, not content, and drop), a corpus-deduped ``media/``
    table is written, media counts land in the manifest, and
    ``packed=True`` packs interleaved sequences — the reference's
    family blob likewise preserves every file kind in order
    (`/root/reference/crawlers/globus_base_preserved.py:320-346`).
    ``multimodal=False`` restores the text-only export.

    ``bpe_merges`` switches token accounting to real BPE tokenizer
    tokens exactly as in :func:`export_corpus` — ``pack_capacity``
    then budgets BPE tokens.

    ``lsh_index`` chains the run into the cross-run dedup lifecycle:
    the export's near-dups against every PREVIOUSLY indexed run are
    reported (``near_dups/`` + manifest ``lsh`` block) and the run's
    docs are folded into the persistent band index — see
    :func:`_update_lsh_index`.
    """
    manifest_path = os.path.join(out_dir, "export_manifest.json")
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)

    from ..functions.multimodal import SEGMENT_STRUCT
    from .crawl import fetched_dataset

    mlist = _load_merges(bpe_merges)
    docs = fetched_dataset(run_dir)
    n_in = docs.count()

    def reassemble(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        spans = t.column("spans")
        flat = pc.list_flatten(spans).combine_chunks()
        parents = pc.list_parent_indices(spans).to_numpy(
            zero_copy_only=False)
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        texts = flat.field("text").to_numpy(zero_copy_only=False)
        mask = kinds == "text"
        joined = (
            pd.Series(texts[mask])
            .groupby(parents[mask]).agg(" ".join)
        )
        n = t.num_rows
        text_vals = np.full(n, "", dtype=object)
        text_vals[joined.index.to_numpy()] = joined.to_numpy()
        qs = t.column("quality_score").to_numpy(zero_copy_only=False)
        lp = t.column("lang_pred").to_numpy(zero_copy_only=False)
        text_arr = pa.array(text_vals, type=pa.string())
        cols = {
            "doc_id": t.column("url"),
            "text": text_arr,
            "quality_score": t.column("quality_score"),
            "lang_pred": t.column("lang_pred"),
        }
        if multimodal:
            refs = flat.field("media_ref").to_numpy(zero_copy_only=False)
            offs = flat.field("offset").to_numpy(zero_copy_only=False)
            # content spans only, document order: links are navigation
            # and compressed spans are archive pointers whose members
            # already export as their own docs
            seg = (kinds == "text") | (kinds == "media")
            sp, sk = parents[seg], kinds[seg]
            is_txt = sk == "text"
            seg_flat = pa.StructArray.from_arrays(
                [
                    pa.array(sk, type=pa.string()),
                    pa.array(np.where(is_txt, texts[seg], ""),
                             type=pa.string()),
                    pa.array(np.where(is_txt, "", refs[seg]),
                             type=pa.string()),
                    pa.array(offs[seg], type=pa.int32()),
                ],
                fields=list(SEGMENT_STRUCT),
            )
            # offsets: kept flat spans with parent < i (parents ascend).
            # The ListArray stays Arrow from here to the parquet write —
            # never round-tripped through Python lists
            cols["segments"] = pa.ListArray.from_arrays(
                pa.array(np.searchsorted(sp, np.arange(n + 1)),
                         type=pa.int32()),
                seg_flat,
            )
            cols["n_media"] = pa.array(np.bincount(
                sp[sk == "media"], minlength=n).astype("int64"))
            cols["n_tokens"] = pa.array(
                pc.count_substring_regex(text_arr, pattern=r"\S+")
                .to_numpy().astype("int64"))
        if mlist is not None:
            # real tokenizer tokens for the pack budget (overrides the
            # RE2 whitespace count on the multimodal path, adds the
            # column on the text-only path)
            cols["n_tokens"] = pa.array(text.bpe_doc_token_counts(
                pd.Series(text_vals), mlist)[1])
        out = pa.table(cols)
        keep = qs >= min_quality
        if langs is not None:
            keep &= pd.Series(lp).isin(langs).to_numpy()
        return out.filter(pa.array(keep))

    kept = docs.map_batches(reassemble, batch_format="pyarrow").materialize()
    base = {"run_dir": os.path.abspath(run_dir), "rows_in": int(n_in),
            "min_quality": min_quality, "langs": langs}
    if isinstance(bpe_merges, str):
        base["bpe_merges"] = os.path.abspath(bpe_merges)
    manifest = _dedup_split_write(kept, out_dir, base, packed,
                                  pack_capacity, manifest_path,
                                  multimodal=multimodal,
                                  bpe=mlist is not None,
                                  shuffle_shards=shuffle_shards)
    if lsh_index and manifest.get("rows_written", 0) > 0:
        manifest = _update_lsh_index(out_dir, lsh_index, manifest,
                                     manifest_path,
                                     threshold=lsh_threshold)
    return manifest
