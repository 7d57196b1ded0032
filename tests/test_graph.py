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
