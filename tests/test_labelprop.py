"""Strategy-flip + semantics pins for stages/labelprop.py (oracle
parity runs in test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.labelprop import label_prop


def _graph(edges, node_ids):
    a = np.array([e[0] for e in edges] + [e[1] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges] + [e[0] for e in edges], dtype=np.int64)
    e = ray.data.from_arrow(pa.table({"src": pa.array(a), "dst": pa.array(b)}))
    n = ray.data.from_arrow(pa.table({"node": pa.array(node_ids, pa.int64())}))
    return e, n


def _labels(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return dict(zip(df["node"], df["community"]))


def test_min_label_k_rounds_and_isolated():
    # chain 10-11-12-13-14-15-16 plus isolated 99: with k=3 the far
    # end (16) only sees min 13; isolated keeps its own id.
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16)]
    e, n = _graph(edges, list(range(10, 17)) + [99])
    got = _labels(label_prop(e, n, k=3, strategy="broadcast"))
    assert got[99] == 99
    assert got[10] == 10 and got[13] == 10
    assert got[16] == 13  # 3 hops away from 13, 6 from 10
    # k large enough -> whole chain converges to 10
    got_full = _labels(label_prop(e, n, k=6, strategy="broadcast"))
    assert all(got_full[i] == 10 for i in range(10, 17))


def test_broadcast_equals_shuffle():
    rng = np.random.default_rng(11)
    ids = np.arange(200, dtype=np.int64) * 7 + 3
    edges = [
        (int(ids[i]), int(ids[j]))
        for i, j in rng.integers(0, 200, size=(300, 2))
        if i != j
    ]
    e, n = _graph(edges, ids)
    a = _labels(label_prop(e, n, k=4, strategy="broadcast"))
    b = _labels(label_prop(e, n, k=4, strategy="shuffle", num_buckets=8))
    assert a == b


def test_query_flip_matches_oracle():
    """The registered query's graph, forced down the shuffle path,
    still matches the oracle (the auto default is broadcast at sf)."""
    from robosat_ray.pipelines.queries import ORACLES, points_dataset
    from robosat_ray.stages.dbscan import eps_pairs
    from tests.util import assert_frames_match, duck

    sf = "/root/testdata/sf0.001"
    pts = points_dataset(sf).select_columns(["doc_id", "lon", "my"]).materialize()
    pairs = eps_pairs(pts)

    def both_dir(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dir, batch_format="pyarrow")
    got = label_prop(
        edges, pts.select_columns(["doc_id"]), id_col="doc_id",
        strategy="shuffle", num_buckets=8,
    )
    con = duck(sf)
    want = con.sql(ORACLES["label_prop"]).df()
    con.close()
    assert_frames_match(got, want)
