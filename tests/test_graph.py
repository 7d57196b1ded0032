"""PageRank: both execution paths vs a single-node numpy reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _numpy_pagerank(edges: pd.DataFrame, damping=0.85, iters=5):
    nodes = np.union1d(edges["src"].unique(), edges["dst"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outd = edges.groupby("src").size()
    r = np.full(n, 1.0 / n)
    s = np.array([idx[v] for v in edges["src"]])
    d = np.array([idx[v] for v in edges["dst"]])
    w = (1.0 / outd.reindex(edges["src"]).to_numpy())
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, d, r[s] * w)
        r = (1 - damping) / n + damping * contrib
    return pd.Series(r, index=nodes)


@pytest.fixture(scope="module")
def edge_df():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    df = pd.DataFrame({"src": src, "dst": dst})
    df = df[df["src"] != df["dst"]].drop_duplicates()
    return df.reset_index(drop=True)


def _run(edge_df, **kw):
    import ray.data as rd

    from crawler_service_ray.functions.graph import pagerank

    out = pagerank(rd.from_pandas(edge_df), **kw).to_pandas()
    return pd.Series(out["pagerank"].to_numpy(), index=out["node"].to_numpy())


def test_broadcast_path_matches_numpy(ray_session, edge_df):
    got = _run(edge_df)
    ref = _numpy_pagerank(edge_df)
    got = got.reindex(ref.index)
    assert np.allclose(got.to_numpy(), ref.to_numpy(), atol=1e-12)


def test_exchange_path_matches_numpy(ray_session, edge_df):
    # force the huge-node-table path
    got = _run(edge_df, broadcast_threshold=0, num_partitions=4)
    ref = _numpy_pagerank(edge_df)
    got = got.reindex(ref.index)
    assert len(got) == len(ref)
    assert np.allclose(got.to_numpy(), ref.to_numpy(), atol=1e-12)


def test_symmetric_graph_conserves_mass(ray_session, edge_df):
    sym = pd.concat(
        [edge_df, edge_df.rename(columns={"src": "dst", "dst": "src"})],
        ignore_index=True,
    ).drop_duplicates()
    got = _run(sym)
    assert abs(got.sum() - 1.0) < 1e-9


def test_dangling_nodes_leak_mass(ray_session):
    # 0->1, 0->2: nodes 1,2 are dangling sinks; their mass leaks (the
    # documented LEFT-JOIN semantics the SQL oracle pins)
    df = pd.DataFrame({"src": [0, 0], "dst": [1, 2]})
    got = _run(df, iters=2)
    assert got.sum() < 1.0
    # rank(1) == rank(2) by symmetry
    assert abs(got[1] - got[2]) < 1e-15


# ---------------------------------------------------------------------------
# BFS depths: both execution paths vs a single-node reference
# ---------------------------------------------------------------------------

def _python_bfs(edges: pd.DataFrame, sources, max_depth):
    adj: dict[int, list[int]] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(s), []).append(int(d))
    depth = {int(s): 0 for s in sources}
    frontier = list(depth)
    for d in range(1, max_depth + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return pd.Series(depth).sort_index()


def _run_bfs(edge_df, sources, **kw):
    import ray.data as rd

    from crawler_service_ray.functions.graph import bfs_depths

    e = rd.from_pandas(edge_df.astype({"src": "int64", "dst": "int64"}))
    s = rd.from_pandas(pd.DataFrame({"node": np.asarray(sources, "int64")}))
    got = bfs_depths(e, s, **kw).to_pandas()
    if got.empty:  # Ray's to_pandas drops columns on 0-row datasets
        return pd.Series([], dtype="int64")
    return pd.Series(
        got["depth"].to_numpy(), index=got["node"].to_numpy()
    ).sort_index()


@pytest.mark.parametrize("kw", [
    {},  # broadcast-frontier path
    {"broadcast_threshold": 0, "num_partitions": 4},  # exchange path
])
def test_bfs_matches_python(ray_session, edge_df, kw):
    ref = _python_bfs(edge_df, [0, 7], max_depth=4)
    got = _run_bfs(edge_df, [0, 7], max_depth=4, **kw)
    assert got.index.tolist() == ref.index.tolist()
    assert got.to_numpy().tolist() == ref.to_numpy().tolist()


def test_bfs_depth_cap_and_unreachable(ray_session):
    # chain 0->1->2->3 plus an island 9->10: cap at 2 hops from {0}
    df = pd.DataFrame({"src": [0, 1, 2, 9], "dst": [1, 2, 3, 10]})
    got = _run_bfs(df, [0], max_depth=2)
    assert got.to_dict() == {0: 0, 1: 1, 2: 2}
    got_x = _run_bfs(df, [0], max_depth=2, broadcast_threshold=0,
                     num_partitions=3)
    assert got_x.to_dict() == {0: 0, 1: 1, 2: 2}


def test_bfs_empty_sources(ray_session, edge_df):
    got = _run_bfs(edge_df, [], max_depth=3)
    assert len(got) == 0


# ---------------------------------------------------------------------------
# Triangle count: degree-ordered orientation vs brute force
# ---------------------------------------------------------------------------

def _brute_triangles(edges: pd.DataFrame) -> int:
    es = {(int(u), int(v)) for u, v in zip(edges["u"], edges["v"])}
    nodes = sorted({x for e in es for x in e})
    cnt = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    cnt += 1
    return cnt


def _canon_edges(rng, n_nodes, n_draws):
    u = rng.integers(0, n_nodes, n_draws)
    v = rng.integers(0, n_nodes, n_draws)
    df = pd.DataFrame({"u": np.minimum(u, v), "v": np.maximum(u, v)})
    return df[df["u"] != df["v"]].drop_duplicates().reset_index(drop=True)


@pytest.mark.parametrize("seed,n_nodes,n_draws", [
    (3, 25, 220),   # dense: many triangles
    (11, 60, 150),  # sparse
])
def test_triangle_count_matches_brute_force(ray_session, seed, n_nodes,
                                            n_draws):
    import ray.data as rd

    from crawler_service_ray.functions.graph import triangle_count

    df = _canon_edges(np.random.default_rng(seed), n_nodes, n_draws)
    got = triangle_count(rd.from_pandas(df), num_partitions=4)
    assert got == _brute_triangles(df)


def test_triangle_count_known_graphs(ray_session):
    import ray.data as rd

    from crawler_service_ray.functions.graph import triangle_count

    # K4 has 4 triangles; adding a pendant edge changes nothing
    k4 = pd.DataFrame({"u": [0, 0, 0, 1, 1, 2, 3],
                       "v": [1, 2, 3, 2, 3, 3, 9]})
    assert triangle_count(rd.from_pandas(k4), num_partitions=3) == 4
    # a triangle-free path
    path = pd.DataFrame({"u": [0, 1, 2], "v": [1, 2, 3]})
    assert triangle_count(rd.from_pandas(path), num_partitions=2) == 0


# ---------------------------------------------------------------------------
# sssp_bounded
# ---------------------------------------------------------------------------

def _python_sssp(edges: pd.DataFrame, sources, max_hops: int):
    """Single-node K-round Bellman-Ford reference (full relaxation)."""
    dist = {int(s): 0 for s in sources}
    e = list(zip(edges["src"].astype(int), edges["dst"].astype(int),
                 edges["w"].astype(int)))
    for _ in range(max_hops):
        prev = dict(dist)
        # K-round semantics: relax against the PREVIOUS round's table
        cur = {}
        for s, d, w in e:
            if s in prev:
                nd = prev[s] + w
                if d not in cur or nd < cur[d]:
                    cur[d] = nd
        dist = dict(prev)
        for d, nd in cur.items():
            if d not in dist or nd < dist[d]:
                dist[d] = nd
    return dist


@pytest.fixture(scope="module")
def wedge_df():
    rng = np.random.default_rng(13)
    src = rng.integers(0, 50, 400)
    dst = rng.integers(0, 50, 400)
    w = rng.integers(1, 20, 400)
    df = pd.DataFrame({"src": src, "dst": dst, "w": w})
    df = df[df["src"] != df["dst"]]
    # min per (src,dst): duplicates allowed in the operator, but the
    # python reference wants one weight per edge for clarity
    return (df.groupby(["src", "dst"], as_index=False)["w"].min()
            .reset_index(drop=True))


@pytest.mark.parametrize("kw", [
    {},                                            # broadcast path
    {"broadcast_threshold": 0, "num_partitions": 4},  # exchange path
])
def test_sssp_matches_python(ray_session, wedge_df, kw):
    import ray.data as rd

    from crawler_service_ray.functions.graph import sssp_bounded

    sources = pd.DataFrame({"node": [0, 7, 23]})
    got = sssp_bounded(rd.from_pandas(wedge_df),
                       rd.from_pandas(sources), max_hops=3, **kw)
    got = got.to_pandas().set_index("node")["dist"].astype(int).to_dict()
    ref = _python_sssp(wedge_df, [0, 7, 23], max_hops=3)
    assert got == ref


def test_sssp_weights_beat_hops(ray_session):
    """A 2-hop cheap route must beat a 1-hop expensive edge."""
    import ray.data as rd

    from crawler_service_ray.functions.graph import sssp_bounded

    edges = pd.DataFrame({
        "src": [0, 0, 1],
        "dst": [2, 1, 2],
        "w": [100, 1, 1],
    })
    out = sssp_bounded(rd.from_pandas(edges),
                       rd.from_pandas(pd.DataFrame({"node": [0]})),
                       max_hops=4).to_pandas()
    d = out.set_index("node")["dist"].to_dict()
    assert d == {0: 0, 1: 1, 2: 2}


def test_sssp_hop_bound_cuts_route(ray_session):
    """With max_hops=1 the cheap 2-hop route is invisible."""
    import ray.data as rd

    from crawler_service_ray.functions.graph import sssp_bounded

    edges = pd.DataFrame({
        "src": [0, 0, 1],
        "dst": [2, 1, 2],
        "w": [100, 1, 1],
    })
    out = sssp_bounded(rd.from_pandas(edges),
                       rd.from_pandas(pd.DataFrame({"node": [0]})),
                       max_hops=1).to_pandas()
    d = out.set_index("node")["dist"].to_dict()
    assert d == {0: 0, 1: 1, 2: 100}


def test_sssp_empty_sources(ray_session, wedge_df):
    import ray.data as rd

    from crawler_service_ray.functions.graph import sssp_bounded

    out = sssp_bounded(
        rd.from_pandas(wedge_df),
        rd.from_pandas(pd.DataFrame({"node": pd.Series([], dtype="int64")})),
        max_hops=3).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# personalized pagerank
# ---------------------------------------------------------------------------

def _numpy_ppr(edges: pd.DataFrame, seeds, damping=0.85, iters=5):
    nodes = np.union1d(edges["src"].unique(), edges["dst"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    seeds = [s for s in seeds if s in idx]
    tele = np.zeros(n)
    for s in seeds:
        tele[idx[s]] = (1 - damping) / len(seeds)
    outd = edges.groupby("src").size()
    r = tele / (1 - damping)
    si = np.array([idx[v] for v in edges["src"]])
    di = np.array([idx[v] for v in edges["dst"]])
    w = (1.0 / outd.reindex(edges["src"]).to_numpy())
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] * w)
        r = tele + damping * contrib
    return pd.Series(r, index=nodes)


@pytest.mark.parametrize("kw", [
    {},                                            # broadcast path
    {"broadcast_threshold": 0, "num_partitions": 4},  # exchange path
])
def test_ppr_matches_numpy(ray_session, edge_df, kw):
    import ray.data as rd

    from crawler_service_ray.functions.graph import pagerank

    seeds = pd.DataFrame({"node": [0, 5, 11]})
    got = pagerank(rd.from_pandas(edge_df),
                   personalization=rd.from_pandas(seeds), **kw).to_pandas()
    got = pd.Series(got["pagerank"].to_numpy(),
                    index=got["node"].to_numpy())
    ref = _numpy_ppr(edge_df, [0, 5, 11])
    got = got.reindex(ref.index)
    assert np.allclose(got.to_numpy(), ref.to_numpy(), atol=1e-12)


def test_ppr_mass_concentrates_near_seeds(ray_session):
    """On two disconnected components, the seedless one gets zero."""
    import ray.data as rd

    from crawler_service_ray.functions.graph import pagerank

    edges = pd.DataFrame({
        "src": [0, 1, 10, 11],
        "dst": [1, 0, 11, 10],
    })
    out = pagerank(rd.from_pandas(edges),
                   personalization=rd.from_pandas(
                       pd.DataFrame({"node": [0]}))).to_pandas()
    r = out.set_index("node")["pagerank"].to_dict()
    assert r[10] == 0.0 and r[11] == 0.0
    assert r[0] > 0.0 and r[1] > 0.0


def test_ppr_rejects_disjoint_seeds(ray_session, edge_df):
    import ray.data as rd

    from crawler_service_ray.functions.graph import pagerank

    with pytest.raises(ValueError, match="no node"):
        pagerank(rd.from_pandas(edge_df),
                 personalization=rd.from_pandas(
                     pd.DataFrame({"node": [99999]})))
