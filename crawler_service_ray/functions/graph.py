"""Iterative graph algorithms over edge Datasets.

The reference engine has no graph surface; this module exists because a
web-scale crawl *produces* a link graph, and ranking / structure queries
over that graph (PageRank for crawl prioritization, components for dup
clusters — the latter lives in :mod:`..functions.dedup`) are standard
follow-on pipelines. Everything here is dataset-native: per-iteration
work is two hash-partitioned exchanges (rank⋈edges on src, contribution
reduce on dst) via ``grouped_apply`` — no driver-side adjacency, no
global matrix, so the 100-TB link graph never leaves the object store.

Reference provenance: the crawl frontier that feeds this graph is
`/root/reference/crawlers/globus_base_preserved.py:320-346` (family
expansion = the edge generator); ranking is net-new capability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def pagerank(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
    num_partitions: int = 16,
    broadcast_threshold: int = 5_000_000,
    personalization: rd.Dataset | None = None,
) -> rd.Dataset:
    """Fixed-iteration PageRank over a directed edge list.

    ``edges`` must be distinct ``(src, dst)`` pairs (int64 node ids).
    Returns ``(node, pagerank)`` for every node that appears in either
    column after ``iters`` synchronous power iterations with uniform
    initialization ``1/N`` and teleport ``(1-damping)/N``.

    ``personalization`` (a dataset with a ``node`` column) switches to
    PERSONALIZED PageRank — the crawl-prioritization form ("rank pages
    by random walks restarting at the trusted seed hosts"): teleport
    mass ``(1-damping)/k`` lands ONLY on the k seed nodes present in
    the graph (seeds outside the graph are ignored), initialization is
    the seed distribution, and every other node starts at 0. The seed
    id set ships once via ``ray.put`` as one sorted int64 array and is
    probed per block — it must fit in the object store (fine for any
    realistic seed list; the rank table itself can still take the
    exchange path). With ``personalization=None`` the teleport vector
    is uniform and the iteration is bit-identical to the classic form.

    Semantics note (pinned by the SQL oracle): dangling-node mass is NOT
    redistributed — a node with no out-edges simply leaks its damped
    mass, exactly like the per-iteration SQL ``LEFT JOIN`` formulation.
    On a symmetric edge list there are no dangling nodes and total rank
    is conserved at 1 (asserted in tests).

    Two execution shapes, chosen by node count (both tested for parity):

    * **Broadcast ranks** (``n_nodes ≤ broadcast_threshold``): the rank
      vector is one float per node — ``ray.put`` it once per iteration
      and stream the (big, never-moving) edge set through
      ``map_batches``; each block emits per-dst partial sums and ONE
      small combiner exchange per iteration reduces them. Edges shuffle
      zero times after the degree pass. This is the same small-side
      discipline as ``broadcast_join``: a 10^9-edge graph with a 10^6
      node table iterates without moving the edges.
    * **Exchange** (huge node tables): rank rows co-partition with
      edges on ``src`` (scatter ``rank/outd`` to ``dst``), then
      contributions co-partition with the node list on ``node``
      (sum + teleport) — two hash exchanges per iteration, nothing on
      the driver. Skewed in-degree (the web's power law) is absorbed by
      the per-partition pre-aggregation combiner before each exchange.
    """
    from .relational import grouped_agg, grouped_apply, resolve_broadcast

    from .relational import distinct

    # the edge list feeds the node pass, the degree pass and the
    # iteration input — pin it once or every consumer re-executes the
    # caller's upstream (read/transform/distinct) from scratch
    edges = edges.materialize()

    # node list = union of the degree aggregates' key sets. The degree
    # aggs pre-reduce per block, so the exchanges move ≤ nodes × blocks
    # partial rows — ~an order less than shuffling 2×|E| raw node
    # halves; everything stays distributed until the path is chosen
    deg_ds = grouped_agg(edges, [src], {"outd": (dst, "count")},
                         merge_partitions=num_partitions).materialize()
    ind_ds = grouped_agg(edges, [dst], {"ind": (src, "count")},
                         merge_partitions=num_partitions).materialize()
    nodes_ds = distinct(
        deg_ds.map_batches(
            lambda df: pd.DataFrame({"node": df[src]}),
            batch_format="pandas",
        ).union(ind_ds.map_batches(
            lambda df: pd.DataFrame({"node": df[dst]}),
            batch_format="pandas",
        )),
        ["node"], merge_partitions=num_partitions,
    ).materialize()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "pagerank": pd.Series([], dtype="float64"),
        }))
    base = (1.0 - damping) / n_nodes

    seed_ref = None
    n_seeds = 0
    if personalization is not None:
        seed_arr = np.sort(distinct(
            personalization.map_batches(
                lambda df: pd.DataFrame({"node": df["node"]}),
                batch_format="pandas"), ["node"],
        ).to_pandas()["node"].to_numpy(dtype="int64"))
        seed_ref = ray.put(seed_arr)

        # k = |seeds ∩ graph nodes| — one streaming membership count,
        # nothing but per-block ints back to the driver
        def count_in(df: pd.DataFrame, _ref=seed_ref) -> pd.DataFrame:
            from .relational import resolve_broadcast as _rb
            s = _rb(_ref)
            a = df["node"].to_numpy(dtype="int64")
            idx = np.searchsorted(s, a)
            hit = (idx < len(s)) & (s[np.minimum(idx, len(s) - 1)] == a)
            return pd.DataFrame({"k": [np.int64(hit.sum())]})

        n_seeds = int(nodes_ds.map_batches(
            count_in, batch_format="pandas").to_pandas()["k"].sum())
        if n_seeds == 0:
            raise ValueError(
                "pagerank: personalization set shares no node with the "
                "graph — the teleport distribution would be empty")

    def _tele_of(node_vals: np.ndarray) -> np.ndarray:
        """Per-node teleport mass: uniform, or seed-restricted."""
        if seed_ref is None:
            return np.full(len(node_vals), base)
        from .relational import resolve_broadcast as _rb
        s = _rb(seed_ref)
        idx = np.searchsorted(s, node_vals)
        hit = (idx < len(s)) & (s[np.minimum(idx, len(s) - 1)] == node_vals)
        return np.where(hit, (1.0 - damping) / n_seeds, 0.0)

    if n_nodes <= broadcast_threshold:
        # node table fits the driver by construction of this branch —
        # out-degrees are ≤ n_nodes rows, collected once
        deg_df = deg_ds.to_pandas()
        node_arr = np.sort(nodes_ds.to_pandas()["node"].to_numpy())
        inv_outd = pd.Series(
            1.0 / deg_df["outd"].to_numpy(dtype="float64"),
            index=deg_df[src].to_numpy(),
        )
        # up to broadcast_threshold entries — ship via object store once,
        # not pickled into every task's closure
        inv_ref = ray.put(inv_outd)

        def attach_w(df: pd.DataFrame, _ref=inv_ref) -> pd.DataFrame:
            w = resolve_broadcast(_ref).reindex(df[src].to_numpy()).to_numpy()
            return pd.DataFrame({"src": df[src], "dst": df[dst], "w": w})

        e = edges.map_batches(attach_w, batch_format="pandas").materialize()
        tele_vec = _tele_of(node_arr.astype("int64"))
        # init = teleport distribution / (1-d): uniform -> 1/N, seeds ->
        # 1/k on seeds and 0 elsewhere
        ranks = pd.Series(tele_vec / (1.0 - damping), index=node_arr)

        for _ in range(iters):
            ref = ray.put(ranks)

            def scatter_block(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                r = resolve_broadcast(_ref)
                contrib = (r.reindex(df["src"].to_numpy()).to_numpy()
                           * df["w"].to_numpy())
                g = (pd.DataFrame({"node": df["dst"], "contrib": contrib})
                     .groupby("node", sort=False)["contrib"].sum()
                     .reset_index())
                return g

            # partials are ≤ n_nodes × blocks rows; the default
            # driver-collect merge makes each iteration ONE execution
            part = e.map_batches(scatter_block, batch_format="pandas")
            tot = grouped_agg(part, ["node"],
                              {"contrib": ("contrib", "sum")}).to_pandas()
            contrib = (pd.Series(tot["contrib"].to_numpy(),
                                 index=tot["node"].to_numpy())
                       .reindex(node_arr).fillna(0.0).to_numpy())
            ranks = pd.Series(tele_vec + damping * contrib, index=node_arr)

        return rd.from_pandas(pd.DataFrame({
            "node": node_arr, "pagerank": ranks.to_numpy(),
        }))

    return _pagerank_exchange(edges, nodes_ds, src, dst, damping, iters,
                              num_partitions, n_nodes, _tele_of)


def _pagerank_exchange(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    src: str,
    dst: str,
    damping: float,
    iters: int,
    num_partitions: int,
    n_nodes: int,
    tele_of,
) -> rd.Dataset:
    """The huge-node-table path: two hash exchanges per iteration, rank
    state never on the driver. See :func:`pagerank` for semantics."""
    from .relational import grouped_apply

    def attach_deg(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["outd"] = (
            part.groupby(src, sort=False)[dst].transform("size")
            .astype("float64")
        )
        return part

    e = grouped_apply(
        edges, [src], attach_deg, num_partitions=num_partitions
    ).materialize()

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        t = tele_of(df["node"].to_numpy(dtype="int64"))
        return df.assign(pagerank=t / (1.0 - damping))

    ranks = nodes.map_batches(init_rank, batch_format="pandas").materialize()

    def tag_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"], "__dst": -1, "__w": df["pagerank"],
             "__k": "r"}
        )

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        # __w carries 1/outd so the scatter is a single multiply
        return pd.DataFrame(
            {"node": df[src], "__dst": df[dst], "__w": 1.0 / df["outd"],
             "__k": "e"}
        )

    def scatter(part: pd.DataFrame) -> pd.DataFrame:
        lab = part.loc[part["__k"] == "r", ["node", "__w"]].rename(
            columns={"__w": "rank"}
        )
        ed = part.loc[part["__k"] == "e", ["node", "__dst", "__w"]]
        m = ed.merge(lab, on="node", how="inner")
        contrib = m["rank"].to_numpy() * m["__w"].to_numpy()
        out = pd.DataFrame({"node": m["__dst"], "contrib": contrib})
        # pre-aggregate per dst before the exchange (combiner): the
        # power-law in-degree fan-in collapses inside the partition
        g = out.groupby("node", sort=False)["contrib"].sum().reset_index()
        return g

    def tag_node(df: pd.DataFrame) -> pd.DataFrame:
        # node rows carry their own teleport mass (uniform or
        # seed-restricted) so the reduce never needs a global vector
        t = tele_of(df["node"].to_numpy(dtype="int64"))
        return pd.DataFrame(
            {"node": df["node"], "contrib": 0.0, "__n": True, "__tele": t}
        )

    def tag_contrib(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__n=False, __tele=0.0)

    def reduce_rank(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("node", sort=False).agg(
            contrib=("contrib", "sum"), __tele=("__tele", "sum"),
        ).reset_index()
        present = part.loc[part["__n"], "node"]
        g = g[g["node"].isin(set(present))]
        return pd.DataFrame(
            {
                "node": g["node"],
                "pagerank": g["__tele"].to_numpy()
                + damping * g["contrib"].to_numpy(),
            }
        )

    for _ in range(iters):
        both = ranks.map_batches(tag_rank, batch_format="pandas").union(
            e.map_batches(tag_edge, batch_format="pandas")
        )
        contribs = grouped_apply(
            both, ["node"], scatter, num_partitions=num_partitions
        )
        both2 = nodes.map_batches(tag_node, batch_format="pandas").union(
            contribs.map_batches(tag_contrib, batch_format="pandas")
        )
        ranks = grouped_apply(
            both2, ["node"], reduce_rank, num_partitions=num_partitions
        ).materialize()

    return ranks


def bfs_depths(
    edges: rd.Dataset,
    sources: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 6,
    num_partitions: int = 16,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Multi-source BFS: min hop-distance from any source node.

    ``edges`` is a directed ``(src, dst)`` int64 edge list (need not be
    distinct — duplicates cost bandwidth, not correctness); ``sources``
    is a dataset with a ``node`` column. Returns ``(node, depth)`` for
    every node reachable within ``max_depth`` hops, depth = the minimum
    number of edges from any source (sources themselves at depth 0).
    This is the crawl-analysis primitive the frontier itself embodies
    (epoch number == BFS depth from the seed list — compare
    `pipelines/crawl.py`'s epoch superstep): seed-distance over the
    harvested link graph answers "how deep did the crawl reach X".

    Two execution shapes, same discipline as :func:`pagerank`:

    * **Broadcast frontier** (reached set ≤ ``broadcast_threshold``):
      the edge set is pinned once and NEVER moves; each round
      ``ray.put``s the current frontier as one sorted int64 array,
      streams the edges through ``map_batches`` (per-block sorted-array
      membership + per-block dedup of candidate dsts), and merges the
      ≤ nodes × blocks candidate partials with the same driver-collect
      ``distinct`` the aggregate family uses. Per round: one streaming
      pass over the edges, zero edge shuffles. The driver holds only
      the visited int64 array — the same "node table fits" regime as
      pagerank's broadcast branch.
    * **Exchange** (huge reached sets): frontier rows co-partition with
      the edges on ``src`` (one tagged-union exchange emits candidate
      ``(dst, d+1)`` rows, deduped per partition), then candidates
      co-partition with the depth state on ``node`` (min-depth wins).
      Two hash exchanges per round, nothing on the driver; the edge
      side of the scatter exchange re-ships each round — the honest
      cost of not fitting the frontier anywhere, bounded by
      ``max_depth`` rounds.

    Both paths produce identical output (pinned by pytest parity vs a
    single-node BFS reference).
    """
    from .relational import distinct

    empty = pd.DataFrame({
        "node": pd.Series([], dtype="int64"),
        "depth": pd.Series([], dtype="int64"),
    })
    # count before mapping: an all-empty dataset loses its schema through
    # map_batches (0-row object blocks), so the projection would KeyError
    if sources.count() == 0:
        return rd.from_pandas(empty)
    edges = edges.materialize()
    srcs = distinct(
        sources.map_batches(
            lambda df: pd.DataFrame({"node": df["node"]}),
            batch_format="pandas",
        ),
        ["node"],
    ).materialize()

    if broadcast_threshold > 0:
        return _bfs_broadcast(edges, srcs, src, dst, max_depth,
                              broadcast_threshold)
    return _bfs_exchange(edges, srcs, src, dst, max_depth, num_partitions)


def _bfs_broadcast(
    edges: rd.Dataset,
    srcs: rd.Dataset,
    src: str,
    dst: str,
    max_depth: int,
    broadcast_threshold: int,
) -> rd.Dataset:
    from .relational import distinct, resolve_broadcast

    frontier = np.sort(srcs.to_pandas()["node"].to_numpy(dtype="int64"))
    visited = frontier.copy()
    out_nodes = [frontier]
    out_depths = [np.zeros(len(frontier), dtype="int64")]

    for d in range(1, max_depth + 1):
        ref = ray.put(frontier)

        def expand(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            f = resolve_broadcast(_ref)
            s = df[src].to_numpy(dtype="int64")
            # sorted-array membership: idx clamp + equality check
            idx = np.searchsorted(f, s)
            hit = (idx < len(f)) & (f[np.minimum(idx, len(f) - 1)] == s)
            cand = pd.unique(df[dst].to_numpy(dtype="int64")[hit])
            return pd.DataFrame({"node": cand})

        cand = distinct(
            edges.map_batches(expand, batch_format="pandas"), ["node"]
        ).to_pandas()["node"].to_numpy(dtype="int64")
        new = np.setdiff1d(cand, visited)  # sorted result
        if len(new) == 0:
            break
        visited = np.union1d(visited, new)
        if len(visited) > broadcast_threshold:
            raise ValueError(
                f"bfs_depths: reached set grew past broadcast_threshold="
                f"{broadcast_threshold}; rerun with broadcast_threshold=0 "
                "(exchange path) for graphs whose reached set cannot sit "
                "on the driver"
            )
        out_nodes.append(new)
        out_depths.append(np.full(len(new), d, dtype="int64"))
        frontier = new

    return rd.from_pandas(pd.DataFrame({
        "node": np.concatenate(out_nodes),
        "depth": np.concatenate(out_depths),
    }))


def _bfs_exchange(
    edges: rd.Dataset,
    srcs: rd.Dataset,
    src: str,
    dst: str,
    max_depth: int,
    num_partitions: int,
) -> rd.Dataset:
    from .relational import grouped_apply

    state = srcs.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"].astype("int64"),
            "depth": np.zeros(len(df), dtype="int64"),
        }),
        batch_format="pandas",
    ).materialize()
    n_state = state.count()

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df[src].astype("int64"),
            "__dst": df[dst].astype("int64"),
            "__f": False,
        })

    e_tagged = edges.map_batches(tag_edge, batch_format="pandas")

    for d in range(1, max_depth + 1):
        d_prev = d - 1

        def tag_frontier(df: pd.DataFrame, _d=d_prev) -> pd.DataFrame:
            f = df.loc[df["depth"] == _d, "node"]
            return pd.DataFrame({
                "node": f.astype("int64"),
                "__dst": np.full(len(f), -1, dtype="int64"),
                "__f": True,
            })

        def scatter(part: pd.DataFrame, _d=d) -> pd.DataFrame:
            fset = part.loc[part["__f"], "node"].to_numpy(dtype="int64")
            if len(fset) == 0:
                return pd.DataFrame({
                    "node": pd.Series([], dtype="int64"),
                    "depth": pd.Series([], dtype="int64"),
                })
            fset = np.sort(fset)
            ed = part.loc[~part["__f"]]
            s = ed["node"].to_numpy(dtype="int64")
            idx = np.searchsorted(fset, s)
            hit = ((idx < len(fset))
                   & (fset[np.minimum(idx, len(fset) - 1)] == s))
            cand = pd.unique(ed["__dst"].to_numpy(dtype="int64")[hit])
            return pd.DataFrame({
                "node": cand,
                "depth": np.full(len(cand), _d, dtype="int64"),
            })

        both = state.map_batches(tag_frontier, batch_format="pandas").union(
            e_tagged
        )
        cands = grouped_apply(both, ["node"], scatter,
                              num_partitions=num_partitions)

        def min_depth(part: pd.DataFrame) -> pd.DataFrame:
            g = (part.groupby("node", sort=False)["depth"].min()
                 .reset_index())
            return g

        state = grouped_apply(
            state.union(cands), ["node"], min_depth,
            num_partitions=num_partitions,
        ).materialize()
        n_new = state.count()
        if n_new == n_state:
            break
        n_state = n_new

    return state


def _run_pair_indices(pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ordered-pair indices over runs. ``pos`` is each row's
    offset within its run; returns (i, j) with i < j inside the same
    run — L*(L-1)/2 pairs per length-L run, no Python loop."""
    j = np.repeat(np.arange(len(pos)), pos)
    seg_starts = np.cumsum(pos) - pos
    off = np.arange(int(pos.sum()), dtype=np.int64) \
        - np.repeat(seg_starts, pos)
    i = j - pos[j] + off
    return i, j


def _triangle_count_broadcast(edges: rd.Dataset, num_partitions: int) -> int:
    """Small-edge-set fast path: O(m) relabel/orient on the driver, the
    O(m^1.5) wedge counting distributed over src buckets with the
    packed oriented-edge array broadcast ONCE via ray.put (the J1/J4
    broadcast-small-side pattern). Nodes are relabeled by (degree, id)
    rank, so orientation and out-neighbor ordering collapse to plain
    integer comparisons and an oriented edge packs into one uint64."""
    from .relational import resolve_broadcast

    df = edges.to_pandas()
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    if len(nodes) >= 2**32:
        raise ValueError("broadcast path supports < 2^32 distinct nodes")
    deg = np.bincount(inv)
    order = np.lexsort((nodes, deg))          # (degree, id) ascending
    rank = np.empty(len(nodes), dtype=np.uint64)
    rank[order] = np.arange(len(nodes), dtype=np.uint64)
    ru, rv = rank[inv[: len(u)]], rank[inv[len(u):]]
    src = np.where(ru < rv, ru, rv)
    dst = np.where(ru < rv, rv, ru)
    o = np.lexsort((dst, src))
    packed = (src[o] << np.uint64(32)) | dst[o]   # ascending by constr.
    src_sorted = src[o]
    dst_sorted = dst[o]

    pe_ref = ray.put(packed)
    sd_ref = ray.put((src_sorted, dst_sorted))
    refs = [pe_ref, sd_ref]
    chunk_pairs = 1 << 23

    def count_bucket(b: pd.DataFrame) -> pd.DataFrame:
        pe = resolve_broadcast(refs[0])
        s_all, d_all = resolve_broadcast(refs[1])
        total = 0
        for pid in b["id"].to_numpy():
            sel = (s_all % np.uint64(num_partitions)) == np.uint64(pid)
            s, d = s_all[sel], d_all[sel]
            if len(s) == 0:
                continue
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            lens = np.diff(np.r_[starts, len(s)])
            pc = lens * (lens - 1) // 2
            # chunk whole runs so wedge arrays stay ~64 MB regardless
            # of hub skew (a mega-hub run is still one chunk, but the
            # orientation bounds any run to ~sqrt(2m))
            r0 = 0
            while r0 < len(starts):
                r1, acc = r0, 0
                while r1 < len(starts) and (acc == 0
                                            or acc + pc[r1] <= chunk_pairs):
                    acc += int(pc[r1])
                    r1 += 1
                lo = starts[r0]
                hi = starts[r1] if r1 < len(starts) else len(s)
                pos = np.arange(hi - lo) - np.repeat(
                    starts[r0:r1] - lo, lens[r0:r1])
                i, j = _run_pair_indices(pos)
                w = (d[lo:hi][i] << np.uint64(32)) | d[lo:hi][j]
                idx = np.searchsorted(pe, w)
                idx[idx == len(pe)] = 0  # any valid slot; equality check
                total += int((pe[idx] == w).sum())
                r0 = r1
        return pd.DataFrame({"n": [np.int64(total)]})

    parts = rd.range(num_partitions, override_num_blocks=num_partitions) \
        .map_batches(count_bucket, batch_format="pandas").to_pandas()
    return int(parts["n"].sum())


def triangle_count(
    edges: rd.Dataset,
    num_partitions: int = 16,
    broadcast_max_edges: int = 5_000_000,
) -> int:
    """Exact triangle count of an undirected simple graph given as
    canonical edges (``u < v``, distinct). The classic degree-ordered
    orientation bounds skew: orient every edge from its
    (degree, id)-smaller endpoint, so no node's OUT-degree exceeds
    ~sqrt(2m) regardless of hubs, and total wedge fan-out is O(m^1.5)
    instead of Σ deg² (which a web-scale hub graph would blow up).

    Two regimes. At or below ``broadcast_max_edges`` the packed edge
    set broadcasts once and only the wedge compute distributes
    (`_triangle_count_broadcast` — zero exchanges past the input).
    Above it, the fully partitioned path: (1) degree partials (grouped
    count over both endpoints), (2) two bucketed joins shipping degrees
    onto the edges (the node table is corpus-scale — never broadcast),
    (3) one co-partition of wedges with oriented edges counting matches
    in-partition; only per-partition counts reach the driver. Wedge
    generation is vectorized run arithmetic per source block — no
    Python loop over nodes.

    In the partitioned path the three multiply-consumed datasets
    (edges, degrees, oriented edges) are materialized: each feeds two
    downstream exchanges, and Ray Data lineage would otherwise
    re-execute the whole upstream pipeline per consumer (measured 8×
    wall on the co-purchase graph). All three are edge/node-sized
    working sets — the object store spills them if they outgrow memory.
    """
    from .relational import bucketed_hash_join, grouped_agg

    edges = edges.materialize()
    if edges.count() <= broadcast_max_edges:
        return _triangle_count_broadcast(edges, num_partitions)

    def both_ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["u"].to_numpy(),
                                    df["v"].to_numpy()]),
        })

    deg = grouped_agg(
        edges.map_batches(both_ends, batch_format="pandas"),
        ["node"], {"deg": ("node", "count")},
        merge_partitions=num_partitions,
    ).materialize()
    eu = bucketed_hash_join(
        edges, deg.map_batches(
            lambda d: d.rename(columns={"node": "u", "deg": "du"}),
            batch_format="pandas"),
        on=["u"], num_buckets=num_partitions,
    )
    euv = bucketed_hash_join(
        eu, deg.map_batches(
            lambda d: d.rename(columns={"node": "v", "deg": "dv"}),
            batch_format="pandas"),
        on=["v"], num_buckets=num_partitions,
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # int64 casts: the bucketed join's tagged concat upcasts the
        # degree columns to float64 (NaN-capable frames union)
        u = df["u"].to_numpy().astype(np.int64)
        v = df["v"].to_numpy().astype(np.int64)
        du = df["du"].to_numpy().astype(np.int64)
        dv = df["dv"].to_numpy().astype(np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame({
            "src": np.where(fwd, u, v),
            "dst": np.where(fwd, v, u),
            "ddst": np.where(fwd, dv, du),
        })

    oriented = euv.map_batches(orient, batch_format="pandas").materialize()

    def wedges_of(part: pd.DataFrame) -> pd.DataFrame:
        # all ordered out-neighbor pairs per src: sort by (src, rank of
        # dst in the SAME orientation order) then vectorized run pairs
        if len(part) == 0:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        p = part.sort_values(
            ["src", "ddst", "dst"], kind="mergesort")
        src = p["src"].to_numpy()
        dst = p["dst"].to_numpy()
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        lens = np.diff(np.r_[starts, len(src)])
        # for a run of length L: L*(L-1)/2 pairs (i<j), generated by
        # repeating each index j (its position in the run) times
        pos = np.arange(len(src)) - np.repeat(starts, lens)
        a_idx = np.repeat(np.arange(len(src)), pos)  # j repeated pos_j times
        # the i index for each pair: offsets within each j's prefix,
        # vectorized (arange minus each j-segment's start offset)
        seg_starts = np.cumsum(pos) - pos
        off = np.arange(pos.sum(), dtype=np.int64) - np.repeat(seg_starts, pos)
        i_idx = a_idx - pos[a_idx] + off
        # pair = (dst[i], dst[j]) with i earlier in orientation order,
        # so the wedge (a,b) is itself oriented a->b
        return pd.DataFrame({"a": dst[i_idx], "b": dst[a_idx]})

    # co-partition wedges with oriented edges by the closing pair and
    # count matches per partition — counts only cross the wire
    def key_mod(df: pd.DataFrame, c1: str, c2: str) -> np.ndarray:
        h = (df[c1].to_numpy().astype(np.uint64) * np.uint64(2654435761)
             + df[c2].to_numpy().astype(np.uint64) * np.uint64(40503))
        return (h % np.uint64(num_partitions)).astype("int64")

    # a src's out-edges can span read blocks — co-partition by src hash
    # BEFORE pair generation or cross-block wedges are silently missed
    wedges = oriented.map_batches(
        lambda d: d.assign(__sp=(d["src"].to_numpy().astype(np.uint64)
                                 * np.uint64(0x9E3779B97F4A7C15)
                                 % np.uint64(num_partitions)).astype("int64")),
        batch_format="pandas",
    ).groupby("__sp").map_groups(
        lambda g: wedges_of(g.drop(columns="__sp")),
        batch_format="pandas",
    ).map_batches(lambda d: d.assign(__gp=key_mod(d, "a", "b"),
                                     __w=np.int64(1)),
                  batch_format="pandas")
    closing = oriented.map_batches(
        lambda d: pd.DataFrame({"a": d["src"], "b": d["dst"]}),
        batch_format="pandas").map_batches(
        lambda d: d.assign(__gp=key_mod(d, "a", "b"),
                           __w=np.int64(0)),
        batch_format="pandas")

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["__w"] == 1]
        e = g[g["__w"] == 0]
        merged = w.merge(e[["a", "b"]].drop_duplicates(), on=["a", "b"])
        return pd.DataFrame({"n": [np.int64(len(merged))]})

    parts = wedges.union(closing).groupby("__gp").map_groups(
        count_part, batch_format="pandas").to_pandas()
    return int(parts["n"].sum())


def sssp_bounded(
    edges: rd.Dataset,
    sources: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_hops: int = 4,
    num_partitions: int = 16,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Bounded-hop weighted single/multi-source shortest paths
    (Bellman-Ford, exactly ``max_hops`` relaxation rounds).

    ``edges`` is a directed ``(src, dst, weight)`` int64 edge list
    (duplicates cost bandwidth, not correctness — min wins); ``sources``
    has a ``node`` column, distance 0. Returns ``(node, dist)`` for
    every node reachable within ``max_hops`` edges, ``dist`` = the
    minimum total weight over any such path. Semantics are the
    unrolled K-round relaxation — the same contract an unrolled SQL
    CTE states — so the result is deterministic at any parallelism and
    needs no convergence test. This is the weighted sibling of
    :func:`bfs_depths` (crawl analysis: hop-bounded cheapest route to a
    URL when edges carry latency/priority costs).

    Two execution shapes, same discipline as :func:`bfs_depths`:

    * **Broadcast** (reached set ≤ ``broadcast_threshold``): the edge
      set is pinned once and NEVER moves; each round ``ray.put``s the
      changed-node frontier as sorted (nodes, dists) arrays, streams
      the edges through ``map_batches`` (sorted-array probe + per-block
      min per dst), and min-merges the ≤ nodes × blocks partials on the
      driver. Relaxing only last-round-improved nodes is the textbook
      Bellman-Ford frontier optimization: an unchanged node's
      out-relaxations were already applied in the round it last
      improved and distances are monotone, so round-K output is
      bit-identical to full relaxation.
    * **Exchange** (huge reached sets): the dist table co-partitions
      with the edges on ``src`` (one tagged-union exchange emits
      ``(dst, dist+w)`` candidates, min-reduced per partition), then
      candidates co-partition with the state on ``node`` (min wins).
      Exactly ``max_hops`` rounds; nothing on the driver.

    Both paths produce identical output (pinned by pytest parity and a
    single-node Bellman-Ford reference in tests/test_graph.py).
    """
    from .relational import distinct

    empty = pd.DataFrame({
        "node": pd.Series([], dtype="int64"),
        "dist": pd.Series([], dtype="int64"),
    })
    if sources.count() == 0:
        return rd.from_pandas(empty)
    edges = edges.materialize()
    srcs = distinct(
        sources.map_batches(
            lambda df: pd.DataFrame({"node": df["node"]}),
            batch_format="pandas"),
        ["node"],
    ).materialize()

    if broadcast_threshold > 0:
        return _sssp_broadcast(edges, srcs, src, dst, weight, max_hops,
                               broadcast_threshold)
    return _sssp_exchange(edges, srcs, src, dst, weight, max_hops,
                          num_partitions)


def _sssp_broadcast(
    edges: rd.Dataset,
    srcs: rd.Dataset,
    src: str,
    dst: str,
    weight: str,
    max_hops: int,
    broadcast_threshold: int,
) -> rd.Dataset:
    from .relational import resolve_broadcast

    nodes = np.sort(srcs.to_pandas()["node"].to_numpy(dtype="int64"))
    dists = np.zeros(len(nodes), dtype="int64")
    f_nodes, f_dists = nodes, dists  # frontier = improved last round

    for _ in range(max_hops):
        if len(f_nodes) == 0:
            break
        ref = ray.put((f_nodes, f_dists))

        def relax(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            fn, fd = resolve_broadcast(_ref)
            s = df[src].to_numpy(dtype="int64")
            idx = np.searchsorted(fn, s)
            hit = (idx < len(fn)) & (fn[np.minimum(idx, len(fn) - 1)] == s)
            d = df[dst].to_numpy(dtype="int64")[hit]
            nd = fd[idx[hit]] + df[weight].to_numpy(dtype="int64")[hit]
            # per-block min per dst bounds what leaves the block to
            # O(distinct dsts) rows
            g = pd.DataFrame({"node": d, "dist": nd}).groupby(
                "node", sort=False)["dist"].min().reset_index()
            return g

        parts = edges.map_batches(relax, batch_format="pandas").to_pandas()
        if len(parts) == 0:
            break
        cand = parts.groupby("node", sort=False)["dist"].min().reset_index()
        c_nodes = cand["node"].to_numpy(dtype="int64")
        c_dists = cand["dist"].to_numpy(dtype="int64")
        # merge min with current state; frontier = strictly improved
        pos = np.searchsorted(nodes, c_nodes)
        known = (pos < len(nodes)) & (
            nodes[np.minimum(pos, len(nodes) - 1)] == c_nodes)
        improved_known = known & (c_dists < np.where(
            known, dists[np.minimum(pos, len(nodes) - 1)], 0))
        new_mask = ~known
        if improved_known.any():
            dists[pos[improved_known]] = c_dists[improved_known]
        f_nodes = np.concatenate([c_nodes[improved_known],
                                  c_nodes[new_mask]])
        f_dists = np.concatenate([c_dists[improved_known],
                                  c_dists[new_mask]])
        order = np.argsort(f_nodes, kind="stable")
        f_nodes, f_dists = f_nodes[order], f_dists[order]
        if new_mask.any():
            nodes = np.concatenate([nodes, c_nodes[new_mask]])
            dists = np.concatenate([dists, c_dists[new_mask]])
            order = np.argsort(nodes, kind="stable")
            nodes, dists = nodes[order], dists[order]
        if len(nodes) > broadcast_threshold:
            raise ValueError(
                f"sssp_bounded: reached set grew past broadcast_threshold="
                f"{broadcast_threshold}; rerun with broadcast_threshold=0 "
                "(exchange path) for graphs whose dist table cannot sit "
                "on the driver")

    return rd.from_pandas(pd.DataFrame({"node": nodes, "dist": dists}))


def _sssp_exchange(
    edges: rd.Dataset,
    srcs: rd.Dataset,
    src: str,
    dst: str,
    weight: str,
    max_hops: int,
    num_partitions: int,
) -> rd.Dataset:
    from .relational import grouped_apply

    state = srcs.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"].astype("int64"),
            "dist": np.zeros(len(df), dtype="int64"),
        }),
        batch_format="pandas",
    ).materialize()

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df[src].astype("int64"),
            "__dst": df[dst].astype("int64"),
            "__w": df[weight].astype("int64"),
            "__f": False,
        })

    e_tagged = edges.map_batches(tag_edge, batch_format="pandas")

    for _ in range(max_hops):
        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": df["node"].astype("int64"),
                "__dst": np.full(len(df), -1, dtype="int64"),
                "__w": df["dist"].astype("int64"),
                "__f": True,
            })

        def scatter(part: pd.DataFrame) -> pd.DataFrame:
            st = part.loc[part["__f"]]
            if len(st) == 0:
                return pd.DataFrame({
                    "node": pd.Series([], dtype="int64"),
                    "dist": pd.Series([], dtype="int64"),
                })
            sn = st["node"].to_numpy(dtype="int64")
            sd = st["__w"].to_numpy(dtype="int64")
            order = np.argsort(sn, kind="stable")
            sn, sd = sn[order], sd[order]
            ed = part.loc[~part["__f"]]
            s = ed["node"].to_numpy(dtype="int64")
            idx = np.searchsorted(sn, s)
            hit = (idx < len(sn)) & (sn[np.minimum(idx, len(sn) - 1)] == s)
            nd = sd[idx[hit]] + ed["__w"].to_numpy(dtype="int64")[hit]
            g = pd.DataFrame({
                "node": ed["__dst"].to_numpy(dtype="int64")[hit],
                "dist": nd,
            }).groupby("node", sort=False)["dist"].min().reset_index()
            return g

        both = state.map_batches(tag_state, batch_format="pandas").union(
            e_tagged)
        cands = grouped_apply(both, ["node"], scatter,
                              num_partitions=num_partitions)

        def min_dist(part: pd.DataFrame) -> pd.DataFrame:
            return (part.groupby("node", sort=False)["dist"].min()
                    .reset_index())

        state = grouped_apply(
            state.union(cands), ["node"], min_dist,
            num_partitions=num_partitions,
        ).materialize()

    return state


def hits(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    num_partitions: int = 16,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """HITS hubs & authorities over a directed edge list (Kleinberg's
    mutual-reinforcement ranking — the link-analysis complement of
    :func:`pagerank`: authorities are pages good hubs point AT, hubs
    are pages that point at good authorities; on a directed bipartite
    graph the two sides get genuinely different scores, which PageRank's
    single vector cannot express).

    ``edges`` must be distinct ``(src, dst)`` int64 pairs. Init
    ``hub = 1`` on every node; each iteration runs the two half-steps
    ``auth = Aᵀ·hub`` then ``hub = A·auth``, each L2-normalized (the
    norm is one scalar-partials pass — only per-block floats reach the
    driver). Returns ``(node, hub, auth)`` for every node, zeros where
    a node never receives mass — exactly the unrolled
    JOIN-GROUP-BY-normalize SQL formulation, so the oracle replays it
    layer by layer.

    Same two execution shapes as :func:`pagerank`:

    * **Broadcast** (``n_nodes ≤ broadcast_threshold``): score vectors
      ship once per half-step via ``ray.put``; the (big, never-moving)
      edge set streams through ``map_batches`` emitting per-target
      partial sums; ONE small combiner exchange per half-step. Edges
      shuffle zero times.
    * **Exchange** (huge node tables): each half-step tags the score
      table and the edge set, co-partitions on the from-node, emits
      per-target pre-aggregated contributions, and merges them with a
      second hash exchange — nothing node-scale on the driver.
      Intermediate score tables carry only nonzero rows (zero scores
      scatter nothing and contribute nothing to the norm); the full
      node coverage is restored by two final LEFT bucket joins.
    """
    from .relational import (bucketed_hash_join, distinct, grouped_agg,
                             grouped_apply, resolve_broadcast)

    edges = edges.materialize()
    srcs = distinct(
        edges.map_batches(lambda d: pd.DataFrame({"node": d[src]}),
                          batch_format="pandas"),
        ["node"], merge_partitions=num_partitions).materialize()
    dsts = distinct(
        edges.map_batches(lambda d: pd.DataFrame({"node": d[dst]}),
                          batch_format="pandas"),
        ["node"], merge_partitions=num_partitions)
    nodes_ds = distinct(srcs.union(dsts), ["node"],
                        merge_partitions=num_partitions).materialize()
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "hub": pd.Series([], dtype="float64"),
            "auth": pd.Series([], dtype="float64"),
        }))

    if n_nodes <= broadcast_threshold:
        node_arr = np.sort(
            nodes_ds.to_pandas()["node"].to_numpy(dtype="int64"))
        hub = pd.Series(np.ones(len(node_arr)), index=node_arr)

        def half(vec: pd.Series, frm: str, to: str) -> pd.Series:
            ref = ray.put(vec)

            def scatter(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                v = resolve_broadcast(_ref)
                contrib = v.reindex(df[frm].to_numpy()).fillna(0.0)
                g = (pd.DataFrame({"node": df[to].to_numpy(),
                                   "s": contrib.to_numpy()})
                     .groupby("node", sort=False)["s"].sum().reset_index())
                return g

            part = edges.map_batches(scatter, batch_format="pandas")
            tot = grouped_agg(part, ["node"],
                              {"s": ("s", "sum")}).to_pandas()
            out = (pd.Series(tot["s"].to_numpy(),
                             index=tot["node"].to_numpy())
                   .reindex(node_arr).fillna(0.0))
            z = float(np.sqrt((out.to_numpy() ** 2).sum()))
            return out / z if z > 0 else out

        auth = hub * 0.0
        for _ in range(iters):
            auth = half(hub, src, dst)
            hub = half(auth, dst, src)
        return rd.from_pandas(pd.DataFrame({
            "node": node_arr,
            "hub": hub.to_numpy(),
            "auth": auth.to_numpy(),
        }))

    # ---- exchange path: nothing node-scale on the driver ----
    def _l2(ds_scores: rd.Dataset) -> float:
        p = ds_scores.map_batches(
            lambda d: pd.DataFrame(
                {"ss": [float((d["s"].to_numpy() ** 2).sum())]}),
            batch_format="pandas").to_pandas()
        return float(np.sqrt(p["ss"].sum()))

    def _scatter(scores: rd.Dataset, frm: str, to: str) -> rd.Dataset:
        def tag_score(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": d["node"], "__to": -1,
                                 "__s": d["s"], "__k": "r"})

        def tag_edge(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": d[frm], "__to": d[to],
                                 "__s": 0.0, "__k": "e"})

        def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
            lab = part.loc[part["__k"] == "r", ["node", "__s"]]
            ed = part.loc[part["__k"] == "e", ["node", "__to"]]
            m = ed.merge(lab, on="node", how="inner")
            g = (pd.DataFrame({"node": m["__to"], "s": m["__s"]})
                 .groupby("node", sort=False)["s"].sum().reset_index())
            return g

        both = scores.map_batches(tag_score, batch_format="pandas").union(
            edges.map_batches(tag_edge, batch_format="pandas"))
        part = grouped_apply(both, ["node"], reduce_part,
                             num_partitions=num_partitions)
        return grouped_agg(part, ["node"], {"s": ("s", "sum")},
                           merge_partitions=num_partitions).materialize()

    def _scale(ds_scores: rd.Dataset, inv: float) -> rd.Dataset:
        return ds_scores.map_batches(
            lambda d, _i=inv: d.assign(s=d["s"].to_numpy() * _i),
            batch_format="pandas").materialize()

    hub_ds = nodes_ds.map_batches(
        lambda d: pd.DataFrame({"node": d["node"],
                                "s": np.ones(len(d))}),
        batch_format="pandas").materialize()
    auth_ds = None
    for _ in range(iters):
        raw_a = _scatter(hub_ds, src, dst)
        za = _l2(raw_a)
        auth_ds = _scale(raw_a, 1.0 / za if za > 0 else 0.0)
        raw_h = _scatter(auth_ds, dst, src)
        zh = _l2(raw_h)
        hub_ds = _scale(raw_h, 1.0 / zh if zh > 0 else 0.0)

    out = bucketed_hash_join(
        nodes_ds,
        hub_ds.map_batches(lambda d: d.rename(columns={"s": "hub"}),
                           batch_format="pandas"),
        on="node", num_buckets=num_partitions, how="left")
    out = bucketed_hash_join(
        out,
        auth_ds.map_batches(lambda d: d.rename(columns={"s": "auth"}),
                            batch_format="pandas"),
        on="node", num_buckets=num_partitions, how="left")
    return out.map_batches(
        lambda d: pd.DataFrame({
            "node": d["node"].astype("int64"),
            "hub": d["hub"].fillna(0.0).astype("float64"),
            "auth": d["auth"].fillna(0.0).astype("float64"),
        }),
        batch_format="pandas")


def degree_assortativity(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 16,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Degree assortativity coefficient — the Pearson correlation of
    endpoint degrees over the edge list (Newman 2002): positive means
    hubs link to hubs (social-network shape), negative means hubs link
    to leaves (the web/crawl shape — and the shape that tells a
    partitioner hub-adjacent edges will concentrate in few partitions).
    On a symmetric edge list out-degree = degree and every undirected
    edge is counted once per direction, matching the standard
    definition.

    Distributed shape: one degree aggregate (partial counts per
    block), then — same size gate as :func:`pagerank` — either the
    degree table ships ONCE via ``ray.put`` and a single streaming
    pass over the never-moving edges reduces each block straight to
    moment partials (``n_nodes ≤ broadcast_threshold``), or TWO
    bucketed hash joins attach the degree to each endpoint with the
    degree table co-partitioned by node hash (huge node tables —
    nothing node-scale on the driver). Each block reduces to six
    Pearson moment partials; only scalars reach the driver. Returns
    ``(n_edges, assortativity)``; NaN when degenerate (all degrees
    equal). Both paths tested for parity."""
    from .relational import (bucketed_hash_join, grouped_agg,
                             resolve_broadcast)

    edges = edges.materialize()
    deg = grouped_agg(edges, [src], {"d": (dst, "count")},
                      merge_partitions=num_partitions)
    degn = deg.map_batches(
        lambda t, _s=src: pd.DataFrame({
            "node": t[_s].astype("int64"),
            "d": t["d"].astype("float64")}),
        batch_format="pandas").materialize()

    if degn.count() <= broadcast_threshold:
        dd = degn.to_pandas()
        dser = pd.Series(dd["d"].to_numpy(), index=dd["node"].to_numpy())
        ref = ray.put(dser)

        def moments_bc(t: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            dv = resolve_broadcast(_ref)
            x = dv.reindex(t[src].to_numpy()).to_numpy(dtype="float64")
            y = dv.reindex(t[dst].to_numpy()).to_numpy(dtype="float64")
            # every endpoint has an out-degree on a symmetric edge
            # list; an asymmetric dst-only node contributes NaN —
            # drop the edge like the join path's inner join would
            keep = ~(np.isnan(x) | np.isnan(y))
            x, y = x[keep], y[keep]
            return pd.DataFrame({
                "n": [np.int64(len(x))],
                "sx": [float(x.sum())], "sy": [float(y.sum())],
                "sxx": [float((x * x).sum())],
                "syy": [float((y * y).sum())],
                "sxy": [float((x * y).sum())],
            })

        p = edges.map_batches(
            moments_bc, batch_format="pandas").to_pandas()
        return _assort_from_moments(p)

    left = edges.map_batches(
        lambda t: pd.DataFrame({"node": t[src].astype("int64"),
                                "__other": t[dst].astype("int64")}),
        batch_format="pandas")
    j1 = bucketed_hash_join(left, degn, on="node",
                            num_buckets=num_partitions)
    j1 = j1.map_batches(
        lambda t: pd.DataFrame({"node": t["__other"], "dx": t["d"]}),
        batch_format="pandas")
    j2 = bucketed_hash_join(j1, degn, on="node",
                            num_buckets=num_partitions)

    def moments(t: pd.DataFrame) -> pd.DataFrame:
        x = t["dx"].to_numpy(dtype="float64")
        y = t["d"].to_numpy(dtype="float64")
        return pd.DataFrame({
            "n": [np.int64(len(t))],
            "sx": [float(x.sum())], "sy": [float(y.sum())],
            "sxx": [float((x * x).sum())], "syy": [float((y * y).sum())],
            "sxy": [float((x * y).sum())],
        })

    p = j2.map_batches(moments, batch_format="pandas").to_pandas()
    return _assort_from_moments(p)


def _assort_from_moments(p: pd.DataFrame) -> rd.Dataset:
    """Fold the per-block Pearson moment partials of
    :func:`degree_assortativity` into the final scalar row."""
    n = float(p["n"].sum())
    if n == 0:
        return rd.from_pandas(pd.DataFrame({
            "n_edges": pd.Series([], dtype="int64"),
            "assortativity": pd.Series([], dtype="float64"),
        }))
    sx, sy = p["sx"].sum(), p["sy"].sum()
    cov = n * p["sxy"].sum() - sx * sy
    den = float(np.sqrt((n * p["sxx"].sum() - sx * sx)
                        * (n * p["syy"].sum() - sy * sy)))
    r = cov / den if den > 0 else float("nan")
    return rd.from_pandas(pd.DataFrame({"n_edges": [np.int64(n)],
                                        "assortativity": [r]}))


def kcore(
    edges: rd.Dataset,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
    num_partitions: int = 16,
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """Bounded-round k-core peeling — the density filter a link-graph
    pipeline runs to separate the web's connected "core" from leaf
    spray before spending PageRank/HITS iterations on it (a node
    outside the 2-core can never be on a cycle; a crawler's spam-farm
    heuristic is "big component, tiny core").

    ``edges`` must be a SYMMETRIC distinct ``(src, dst)`` int64 edge
    list (both directions present, no self-loops), so degree(v) = the
    row count with ``src == v``. Semantics are exactly ``max_rounds``
    unrolled peeling rounds: with A₀ = all nodes,

        deg_r(v) = |{(v,u) ∈ E : v ∈ A_{r−1}, u ∈ A_{r−1}}|
        A_r      = {v : deg_r(v) ≥ k}

    returning ``(node, deg)`` = deg_R over A_{R−1} for nodes in A_R.
    A_r ⊆ A_{r−1} (deg_r only counts alive rows), so reaching a fixed
    point early is exact and the loop stops there — when it converges
    within the round budget (asserted by the query's pytest at test
    scale), ``deg`` IS the in-core degree and the node set IS the
    k-core; otherwise it is a sound over-approximation (the true core
    is a subset), same contract as :func:`sssp_bounded`'s hop bound.

    Two execution shapes, the :func:`bfs_depths` discipline:

    * **Broadcast** (alive set ≤ ``broadcast_threshold``): the edge set
      is pinned once and NEVER moves; each round ships the alive set as
      ONE sorted int64 array via ``ray.put``, streams the edges through
      ``map_batches`` (sorted-array membership on both endpoints +
      per-block ``np.unique`` degree partials), and merges ≤ alive ×
      blocks partial rows with the auto-switching ``grouped_agg``. The
      driver holds only the alive array — pagerank's "node table fits"
      regime.
    * **Exchange** (``broadcast_threshold=0``): per round the surviving
      edges co-partition twice — once with the alive set on ``dst``
      (drop edges into dead nodes), once on ``src`` where the same
      partition both filters and counts, so the round's degree table is
      born already filtered to deg ≥ k. Nothing node-scale touches the
      driver; the edge re-ship per round is the honest cost of an alive
      set too big to pin, bounded by ``max_rounds`` and by the
      monotonically SHRINKING survivor set.

    Both paths produce identical output (pytest parity).
    """
    from .relational import grouped_agg

    if broadcast_threshold > 0:
        return _kcore_broadcast(edges, k, src, dst, max_rounds,
                                broadcast_threshold)
    return _kcore_exchange(edges, k, src, dst, max_rounds, num_partitions)


def _kcore_broadcast(
    edges: rd.Dataset,
    k: int,
    src: str,
    dst: str,
    max_rounds: int,
    broadcast_threshold: int,
) -> rd.Dataset:
    from .relational import grouped_agg, resolve_broadcast

    edges = edges.materialize()
    alive: np.ndarray | None = None  # None = round 1, everyone alive
    deg_pd = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                           "deg": pd.Series([], dtype="int64")})

    for _ in range(max_rounds):
        ref = ray.put(alive) if alive is not None else None

        def degree_partial(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            s = df[src].to_numpy(dtype="int64")
            if _ref is not None:
                a = resolve_broadcast(_ref)
                if len(a) == 0:
                    s = s[:0]
                else:
                    d = df[dst].to_numpy(dtype="int64")
                    i = np.searchsorted(a, s)
                    j = np.searchsorted(a, d)
                    ok = ((i < len(a))
                          & (a[np.minimum(i, len(a) - 1)] == s)
                          & (j < len(a))
                          & (a[np.minimum(j, len(a) - 1)] == d))
                    s = s[ok]
            node, cnt = np.unique(s, return_counts=True)
            return pd.DataFrame({"node": node,
                                 "deg": cnt.astype("int64")})

        deg_pd = grouped_agg(
            edges.map_batches(degree_partial, batch_format="pandas"),
            ["node"], {"deg": ("deg", "sum")},
        ).to_pandas()
        if "deg" not in deg_pd.columns:
            # every block filtered to zero rows: an all-empty pandas
            # dataset loses its schema through Ray — the core is empty
            deg_pd = pd.DataFrame({
                "node": pd.Series([], dtype="int64"),
                "deg": pd.Series([], dtype="int64"),
            })
        deg_pd = deg_pd[deg_pd["deg"] >= k]
        new_alive = np.sort(deg_pd["node"].to_numpy(dtype="int64"))
        if len(new_alive) > broadcast_threshold:
            raise ValueError(
                f"kcore: alive set ({len(new_alive)}) exceeds "
                f"broadcast_threshold={broadcast_threshold}; rerun with "
                "broadcast_threshold=0 (exchange path)"
            )
        if alive is not None and len(new_alive) == len(alive):
            break  # fixed point: A_r == A_{r-1}, further rounds identical
        alive = new_alive

    out = deg_pd.sort_values("node").reset_index(drop=True)
    # sum partials merge as float64; degrees are exact small ints
    out = out.assign(node=out["node"].astype("int64"),
                     deg=out["deg"].astype("int64"))
    return rd.from_pandas(out)


def _kcore_exchange(
    edges: rd.Dataset,
    k: int,
    src: str,
    dst: str,
    max_rounds: int,
    num_partitions: int,
) -> rd.Dataset:
    from .relational import grouped_apply

    surv = edges.map_batches(
        lambda df: pd.DataFrame({"src": df[src].astype("int64"),
                                 "dst": df[dst].astype("int64")}),
        batch_format="pandas",
    ).materialize()
    alive: rd.Dataset | None = None  # None = round 1
    n_alive = -1
    deg: rd.Dataset | None = None

    def _tag_alive(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "__n": df["node"].astype("int64"),
            "src": np.full(len(df), -1, dtype="int64"),
            "dst": np.full(len(df), -1, dtype="int64"),
            "__a": True,
        })

    for _ in range(max_rounds):
        if alive is not None:
            # pass 1: co-partition on dst — drop edges into dead nodes
            def tag_edge_dst(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "__n": df["dst"].astype("int64"),
                    "src": df["src"].astype("int64"),
                    "dst": df["dst"].astype("int64"),
                    "__a": False,
                })

            def filter_dst(part: pd.DataFrame) -> pd.DataFrame:
                a = np.sort(part.loc[part["__a"], "__n"]
                            .to_numpy(dtype="int64"))
                ed = part.loc[~part["__a"]]
                if len(a) == 0:
                    return ed.iloc[:0][["src", "dst"]]
                d = ed["__n"].to_numpy(dtype="int64")
                i = np.searchsorted(a, d)
                ok = (i < len(a)) & (a[np.minimum(i, len(a) - 1)] == d)
                return ed.loc[ok, ["src", "dst"]]

            surv = grouped_apply(
                alive.map_batches(_tag_alive, batch_format="pandas").union(
                    surv.map_batches(tag_edge_dst, batch_format="pandas")),
                ["__n"], filter_dst, num_partitions=num_partitions,
            )

        # pass 2: co-partition on src — filter src-alive AND count in the
        # same partition; the degree table is born filtered to deg >= k
        def tag_edge_src(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "__n": df["src"].astype("int64"),
                "src": df["src"].astype("int64"),
                "dst": df["dst"].astype("int64"),
                "__a": False,
            })

        def count_src(part: pd.DataFrame, _first=(alive is None),
                      _k=k) -> pd.DataFrame:
            ed = part.loc[~part["__a"]]
            if not _first:
                a = np.sort(part.loc[part["__a"], "__n"]
                            .to_numpy(dtype="int64"))
                if len(a) == 0:
                    ed = ed.iloc[:0]
                else:
                    s = ed["__n"].to_numpy(dtype="int64")
                    i = np.searchsorted(a, s)
                    ok = ((i < len(a))
                          & (a[np.minimum(i, len(a) - 1)] == s))
                    ed = ed.loc[ok]
            g = (ed.groupby("__n", sort=False).size()
                 .reset_index(name="deg"))
            g = g[g["deg"] >= _k]
            return pd.DataFrame({"node": g["__n"].astype("int64"),
                                 "deg": g["deg"].astype("int64")})

        tagged = surv.map_batches(tag_edge_src, batch_format="pandas")
        if alive is not None:
            tagged = alive.map_batches(
                _tag_alive, batch_format="pandas").union(tagged)
        deg = grouped_apply(tagged, ["__n"], count_src,
                            num_partitions=num_partitions).materialize()

        alive = deg.map_batches(
            lambda df: pd.DataFrame({"node": df["node"].astype("int64")}),
            batch_format="pandas",
        ).materialize()
        n_new = alive.count()
        if n_new == n_alive:
            break
        n_alive = n_new

    assert deg is not None
    return deg
