"""Repeated-span detection spec tests (oracle parity covers the chain)."""

import numpy as np
import pyarrow as pa
import ray.data

from robosat_ray.stages.spans import SPAN_W, _span_hashes, dup_spans


def test_span_hash_is_position_independent():
    """The same 16-token span hashes identically wherever it appears."""
    span = " ".join(f"t{i}" for i in range(SPAN_W))
    h1, _ = _span_hashes(["prefix " + span])
    h2, _ = _span_hashes([span + " suffix"])
    assert h1[-1] == h2[0]


def test_short_docs_emit_no_spans():
    h, d = _span_hashes(["a b c", ""])
    assert len(h) == 0 and len(d) == 0


def test_partition_invariance(ray_session):
    texts = [
        ("x" + str(i % 7) + " ") * 2 + " ".join(f"w{j}" for j in range(30))
        for i in range(60)
    ]
    tab = pa.table(
        {"doc_id": pa.array(np.arange(60, dtype=np.int64)), "text": texts}
    )
    a = dup_spans(ray.data.from_arrow(tab).repartition(2), k=10)
    b = dup_spans(ray.data.from_arrow(tab).repartition(13), k=10)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert (a["n_docs"] >= 2).all()
    assert len(a) > 0  # the shared 30-token tail guarantees dup spans
