"""Prediction-pipeline components: quantize, halo stitch, scorer,
softvote, metrics formulas."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from robosat_ray.stages.metrics import finalize_metrics
from robosat_ray.stages.scorer import (
    Scorer,
    dequantize_probs,
    halo_explode,
    quantize_probs,
    stitch_group,
)


def test_quantize_roundtrip():
    p = np.linspace(0, 1, 1000)
    q = quantize_probs(p)
    assert q.min() == 0 and q.max() == 255
    back = dequantize_probs(q)
    assert np.abs(back - p).max() <= 1.0 / 255 + 1e-12
    assert (np.diff(q.astype(np.int64)) >= 0).all()  # monotone


def test_metrics_formulas():
    # hand-checkable: 10x10 grid, label = left half, pred = top half
    out = finalize_metrics(tn=25, fp=25, fn=25, tp=25)
    assert out["iou_fg"] == pytest.approx(25 / 75)
    assert out["mcc"] == pytest.approx(0.0)
    perfect = finalize_metrics(tn=50, fp=0, fn=0, tp=50)
    assert perfect["miou"] == 1.0 and perfect["mcc"] == pytest.approx(1.0)


def test_halo_stitch_places_neighbors():
    size, overlap = 4, 2
    mk = lambda v: (np.full((size, size), v, dtype=np.uint8)).tobytes()
    batch = pa.table(
        {
            "tile_x": pa.array([5, 6], pa.int64()),
            "tile_y": pa.array([5, 5], pa.int64()),
            "size": pa.array([size, size], pa.int64()),
            "data": pa.array([mk(1), mk(2)], pa.binary()),
        }
    )
    ex = halo_explode(batch, overlap).to_pandas()
    g = ex[(ex.center_x == 5) & (ex.center_y == 5)]
    buf = stitch_group(g, overlap)
    m = np.frombuffer(buf["data"].iloc[0], dtype=np.uint8).reshape(size + 4, size + 4)
    assert (m[2:6, 2:6] == 1).all()  # own tile at core
    assert (m[2:6, 6:8] == 2).all()  # east neighbor's left edge in the halo
    assert (m[0:2, :] == 0).all()  # missing north neighbor = nodata


def test_scorer_deterministic_and_bounded():
    size, overlap = 8, 2
    buf = np.zeros((size + 4, size + 4), dtype=np.uint8)
    buf[4:8, 4:8] = 1
    batch = pa.table(
        {
            "tile_x": pa.array([0], pa.int64()),
            "tile_y": pa.array([0], pa.int64()),
            "size": pa.array([size], pa.int64()),
            "data": pa.array([buf.tobytes()], pa.binary()),
        }
    )
    s = Scorer(kernel_size=3, overlap=overlap)
    out1 = s(batch).column("data")[0].as_py()
    out2 = Scorer(kernel_size=3, overlap=overlap)(batch).column("data")[0].as_py()
    assert out1 == out2  # deterministic across instances
    q = np.frombuffer(out1, dtype=np.uint8)
    assert len(q) == size * size
    # interior of the square scores high, far background low
    qi = q.reshape(size, size)
    assert qi[3, 3] > 200 and qi[0, 7] < 60


def test_predict_pipeline_identity_recovery(ray_session):
    """With a sharp model, predictions over clean labels recover the
    labels almost exactly -> near-perfect metrics."""
    from robosat_ray.pipelines.queries import q_segmentation_metrics

    m = q_segmentation_metrics("/root/testdata/sf0.001")
    row = m.iloc[0]
    assert row["miou"] > 0.9
    assert row["tp"] > 0 and row["tn"] > 0
