"""Weighted shortest paths: planted graphs where the weighted route
differs from the hop-shortest route, K-cap semantics, hub-source tie
rule, strategy flip (broadcast vs shuffle) bit-equality, partition
invariance, and a quadratic Bellman-Ford reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.sssp import sssp


def _graph(tri, nodes, blocks=1):
    a = np.array([t[0] for t in tri], np.int64)
    b = np.array([t[1] for t in tri], np.int64)
    w = np.array([t[2] for t in tri], np.int64)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )
    )
    nd = ray.data.from_arrow(pa.table({"node": pa.array(np.asarray(nodes, np.int64))}))
    if blocks > 1:
        edges = edges.repartition(blocks)
        nd = nd.repartition(min(blocks, len(nodes)))
    return edges, nd


def _run(edges, nodes, **kw):
    out = sssp(edges, nodes, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_weighted_route_beats_hop_route():
    # hub 1 (degree 3). direct edge 1-4 costs 10; detour 1-2-3-4
    # costs 3 — Bellman-Ford with K=4 must find the detour.
    tri = [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    edges, nodes = _graph(tri, [1, 2, 3, 4, 9])
    out = _run(edges, nodes).set_index("node")["wdist"]
    assert out[1] == 0
    assert out[2] == 1 and out[3] == 2
    assert out[4] == 3  # not 10
    assert out[9] == -1


def test_k_cap_limits_path_length():
    # chain of weight-1 edges; hub = node 2. with k=2 only nodes
    # within 2 hops resolve.
    tri = [(i, i + 1, 1) for i in range(1, 9)]
    edges, nodes = _graph(tri, list(range(1, 10)))
    out = _run(edges, nodes, k=2).set_index("node")["wdist"]
    assert out[2] == 0 and out[1] == 1 and out[3] == 1 and out[4] == 2
    assert (out[[5, 6, 7, 8, 9]] == -1).all()
    # with the default k=4 two more nodes resolve
    out4 = _run(*_graph(tri, list(range(1, 10)))).set_index("node")["wdist"]
    assert out4[6] == 4 and out4[7] == -1


def test_k_cap_can_miss_cheaper_long_route():
    # k=2: cheap 3-hop route 1-2-3-4 (cost 3) needs 3 edges, so the
    # expensive direct edge (10) wins under the K constraint.
    tri = [(1, 4, 10), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    edges, nodes = _graph(tri, [1, 2, 3, 4])
    out = _run(edges, nodes, k=2).set_index("node")["wdist"]
    assert out[4] == 10


def test_strategy_flip_bit_equal_and_partition_invariant():
    rng = np.random.RandomState(23)
    n = 120
    tri = set()
    while len(tri) < 260:
        a, b = rng.randint(1, n + 1, 2)
        if a != b:
            tri.add((min(a, b), max(a, b)))
    tri = [(a, b, int(rng_w)) for (a, b), rng_w in
           zip(sorted(tri), rng.randint(1, 9, len(tri)))]
    nodes = list(range(1, n + 1)) + [5000]
    e3, n3 = _graph(tri, nodes, blocks=3)
    e7, n7 = _graph(tri, nodes, blocks=7)
    a = _run(e3, n3, strategy="broadcast", k=3)
    b = _run(e7, n7, strategy="shuffle", k=3, num_buckets=4)
    pd.testing.assert_frame_equal(a, b)
    assert (a["wdist"] == -1).any()  # node 5000 isolated


def test_vs_quadratic_bellman_ford():
    rng = np.random.RandomState(29)
    n = 90
    tri = set()
    while len(tri) < 180:
        a, b = rng.randint(1, n + 1, 2)
        if a != b:
            tri.add((min(a, b), max(a, b)))
    tri = [(a, b, int(w)) for (a, b), w in
           zip(sorted(tri), rng.randint(1, 12, len(tri)))]
    K = 4
    # dense reference: K rounds of full relaxation
    deg = np.zeros(n + 1, np.int64)
    for a, b, _ in tri:
        deg[a] += 1
        deg[b] += 1
    src = int(np.lexsort((np.arange(n + 1), -deg))[0])
    INF = 1 << 60
    dist = np.full(n + 1, INF, np.int64)
    dist[src] = 0
    for _ in range(K):
        nd = dist.copy()
        for a, b, w in tri:
            nd[b] = min(nd[b], dist[a] + w)
            nd[a] = min(nd[a], dist[b] + w)
        dist = nd
    edges, ndset = _graph(tri, list(range(1, n + 1)), blocks=4)
    out = _run(edges, ndset).set_index("node")["wdist"]
    for node in range(1, n + 1):
        want = -1 if dist[node] >= INF else dist[node]
        assert out[node] == want, node
