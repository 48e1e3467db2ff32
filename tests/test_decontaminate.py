"""Benchmark decontamination: constructed-contamination semantics
beyond the oracle parity sweep (the sweep's natural corpus has almost
no 13-gram overlap, so pin the detector on planted overlap here)."""

import numpy as np
import pyarrow as pa
import ray.data

from robosat_ray.stages.decontaminate import (
    DECON_BENCH_MOD,
    DECON_W,
    decontaminate,
)


def _mk_docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_planted_overlap_is_flagged(ray_session):
    bench_sentence = " ".join(f"tok{i}" for i in range(DECON_W))
    rows = [
        (0, bench_sentence + " trailer"),  # benchmark doc (0 % MOD == 0)
        (1, "clean words only " * 10),  # train, clean
        (2, "prefix " + bench_sentence + " suffix"),  # train, contaminated
        (3, "short doc"),  # train, < W tokens
    ]
    assert 0 % DECON_BENCH_MOD == 0
    out = (
        decontaminate(_mk_docs(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]  # benchmark doc excluded
    assert out.loc[1, "contaminated"] == 0
    assert out.loc[2, "contaminated"] == 1 and out.loc[2, "n_hits"] >= 1
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "contaminated"] == 0


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=int(rng.integers(5, 60)))))
        for i in range(400)
    ]
    cols = ["doc_id", "n_grams", "n_hits", "contaminated"]

    def run(ds):
        df = decontaminate(ds).to_pandas()
        return df[cols].sort_values("doc_id").reset_index(drop=True)

    a = run(_mk_docs(rows))
    b = run(_mk_docs(rows).repartition(17))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
