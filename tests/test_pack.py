"""Sequence packing: distributed prefix-scan == naive driver cumsum,
plus placement semantics (boundary straddling, partition invariance)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.pack import SEQ_LEN, pack_sequences


def _mk_docs(ids, texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "text": pa.array(list(texts), pa.string()),
            }
        )
    )


def test_scan_equals_naive_cumsum(ray_session):
    rng = np.random.default_rng(3)
    n = 1200
    ids = rng.permutation(n * 3)[:n].astype(np.int64)  # sparse, shuffled
    texts = [" ".join(["w"] * int(rng.integers(1, 400))) for _ in range(n)]
    out = (
        pack_sequences(_mk_docs(ids, texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    order = np.argsort(ids)
    ntok = np.array([t.count(" ") + 1 for t in texts], dtype=np.int64)[order]
    offs = np.cumsum(ntok) - ntok
    assert (out["doc_id"].to_numpy() == ids[order]).all()
    assert (out["n_tokens"].to_numpy() == ntok).all()
    assert (out["tok_offset"].to_numpy() == offs).all()
    assert (out["first_seq"].to_numpy() == offs // SEQ_LEN).all()
    assert (out["last_seq"].to_numpy() == (offs + ntok - 1) // SEQ_LEN).all()


def test_boundary_straddle(ray_session):
    """A doc crossing a SEQ_LEN boundary spans both sequences; one
    ending exactly at the boundary does not."""
    texts = [
        " ".join(["a"] * SEQ_LEN),      # doc 0: exactly fills seq 0
        " ".join(["b"] * (SEQ_LEN + 1)),  # doc 1: spans seqs 1-2
        "c",                              # doc 2: lands in seq 2
    ]
    out = (
        pack_sequences(_mk_docs([0, 1, 2], texts))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out.loc[0, "first_seq"], out.loc[0, "last_seq"]) == (0, 0)
    assert (out.loc[1, "first_seq"], out.loc[1, "last_seq"]) == (1, 2)
    assert out.loc[1, "n_seqs"] == 2
    assert (out.loc[2, "first_seq"], out.loc[2, "last_seq"]) == (2, 2)


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(9)
    n = 800
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(["x"] * int(rng.integers(1, 100))) for _ in range(n)]
    cols = ["doc_id", "n_tokens", "tok_offset", "first_seq", "last_seq", "n_seqs"]

    def run(ds):
        df = pack_sequences(ds).to_pandas()
        return df[cols].sort_values("doc_id").reset_index(drop=True)

    a = run(_mk_docs(ids, texts))
    b = run(_mk_docs(ids, texts).repartition(19))
    pd.testing.assert_frame_equal(a, b)
