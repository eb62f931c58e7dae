"""Sharded graph iteration (graph_sharded.py): output identity with the
numpy conformance twins, plus the VERDICT-r4 'done' criteria — no single
O(|V|) ray.put object during iteration and per-shard state bounded by
~|V|/R."""
import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd

from peterman_search_engine_ray.pipelines.graph_sharded import (
    bfs_sharded, hits_sharded, lpa_sharded, pagerank_sharded)
from peterman_search_engine_ray.pipelines.pagerank import (
    bfs_levels_ray, hits_numpy, lpa_numpy, pagerank_numpy, synth_edges)


@pytest.fixture(scope="module")
def graph(ray_session):
    tbl = synth_edges(np.arange(400))
    return tbl, tbl.to_pandas(), rd.from_arrow(tbl).repartition(4)


def test_pagerank_sharded_matches_numpy(graph):
    tbl, edges, ds = graph
    a = pagerank_numpy(edges, num_iterations=25)
    b = pagerank_sharded(ds, num_iterations=25, num_parts=4)
    a["score"] = a["score"].round(9)
    b["score"] = b["score"].round(9)
    pd.testing.assert_frame_equal(
        a.sort_values("node").reset_index(drop=True),
        b.sort_values("node").reset_index(drop=True))


def test_pagerank_sharded_topk_and_personalized(graph):
    tbl, edges, ds = graph
    seeds = np.array([2, 5, 9], dtype=np.int64)
    a = pagerank_numpy(edges, num_iterations=20, teleport_ids=seeds)
    a["score"] = a["score"].round(9)
    want = (a.sort_values(["score", "node"], ascending=[False, True])
            .head(20).reset_index(drop=True))
    got = pagerank_sharded(ds, num_iterations=20, num_parts=4,
                           teleport_ids=seeds, k=20)
    assert got["node"].tolist() == want["node"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)


def test_pagerank_sharded_no_node_scale_put(graph, monkeypatch):
    """The r4 scale flag: iterations must not broadcast an O(|V|) score
    vector via ray.put, per-shard state must be ~|V|/R, and the top-k
    path must gather only R*k driver rows."""
    tbl, edges, ds = graph
    n_nodes = len(np.unique(np.concatenate(
        [edges["src"].to_numpy(), edges["dst"].to_numpy()])))
    put_sizes = []
    real_put = ray.put

    def spy_put(obj, **kw):
        if isinstance(obj, np.ndarray):
            put_sizes.append(obj.size)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    stats = {}
    got = pagerank_sharded(ds, num_iterations=10, num_parts=4, k=5,
                           stats=stats)
    assert len(got) == 5
    # no numpy array anywhere near |V| was ever ray.put by the driver
    assert all(s < n_nodes // 2 for s in put_sizes)
    # shards are balanced: each holds ~|V|/R nodes
    assert stats["n_shards"] == 4
    assert stats["total_nodes"] == n_nodes
    assert stats["max_shard_nodes"] <= -(-n_nodes // 4) + 1
    # driver gathered only the R*k top-k partial rows
    assert stats["driver_rows_gathered"] <= 4 * 5


def test_lpa_sharded_matches_numpy(graph):
    tbl, edges, ds = graph
    a = lpa_numpy(edges, rounds=2)
    b = lpa_sharded(ds, rounds=2, num_parts=4)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b)
    # community-size path == driver-side histogram of the full result
    want = (a.groupby("label", as_index=False).size()
            .rename(columns={"label": "community"})
            .sort_values(["size", "community"], ascending=[False, True])
            .head(10).reset_index(drop=True).astype(np.int64))
    got = lpa_sharded(ds, rounds=2, num_parts=4, community_k=10)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_hits_sharded_matches_numpy(graph):
    tbl, edges, ds = graph
    a = hits_numpy(edges, iters=2)
    b = hits_sharded(ds, iters=2, num_parts=4)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b)
    want = (a.sort_values(["authority", "node"], ascending=[False, True])
            .head(20).reset_index(drop=True))
    got = hits_sharded(ds, iters=2, num_parts=4, k=20)
    pd.testing.assert_frame_equal(got, want)


def test_bfs_sharded_matches_ray(graph):
    tbl, edges, ds = graph
    a = bfs_levels_ray(ds, 0, max_level=3)
    b = bfs_sharded(ds, 0, max_level=3, num_parts=4)
    pd.testing.assert_frame_equal(a, b)
    # early-exhaustion: a 3-node path stops when the frontier dries up
    tiny = rd.from_pandas(pd.DataFrame({"src": [0, 1], "dst": [1, 2]}))
    got = bfs_sharded(tiny, 0, max_level=5, num_parts=4)
    assert got["level"].tolist() == [0, 1, 2]
    assert got["n_nodes"].tolist() == [1, 1, 1]
