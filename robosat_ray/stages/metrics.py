"""Segmentation metrics aggregate (SURVEY.md A2; reference
robosat/metrics.py:27-84: running tn/fn/fp/tp per batch, mIoU /
foreground-IoU / Matthews correlation finalizers).

Engine shape: per-batch partial confusion counts -> ds.aggregate(Sum)
-> pure finalizers. Inputs are (label, pred) mask pairs carried in one
row (the prediction pipeline keeps labels alongside predictions, so no
extra join is needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def partial_confusion(batch: pa.Table) -> pa.Table:
    labels = batch.column("label_data").to_pylist()
    preds = batch.column("pred_data").to_pylist()
    tn = fp = fn = tp = 0
    for ldat, pdat in zip(labels, preds):
        y = np.frombuffer(ldat, dtype=np.uint8) != 0
        p = np.frombuffer(pdat, dtype=np.uint8) != 0
        tp += int(np.count_nonzero(y & p))
        tn += int(np.count_nonzero(~y & ~p))
        fp += int(np.count_nonzero(~y & p))
        fn += int(np.count_nonzero(y & ~p))
    return pa.table(
        {
            "tn": pa.array([tn], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
        }
    )


def finalize_metrics(tn: int, fp: int, fn: int, tp: int) -> dict:
    """Reference finalizers (metrics.py): per-class IoU, mean IoU,
    foreground IoU, Matthews correlation coefficient."""
    iou_fg = tp / (tp + fp + fn) if (tp + fp + fn) else 0.0
    iou_bg = tn / (tn + fp + fn) if (tn + fp + fn) else 0.0
    denom = np.sqrt(float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    mcc = ((tp * tn) - (fp * fn)) / denom if denom > 0 else 0.0
    return {
        "tn": tn,
        "fp": fp,
        "fn": fn,
        "tp": tp,
        "iou_fg": iou_fg,
        "iou_bg": iou_bg,
        "miou": (iou_fg + iou_bg) / 2.0,
        "mcc": float(mcc),
    }


def segmentation_metrics(pairs_ds) -> pd.DataFrame:
    """pairs_ds rows: (label_data: binary, pred_data: binary) masks.
    -> single-row DataFrame of confusion counts + metric finalizers."""
    from ray.data.aggregate import Sum

    partials = pairs_ds.map_batches(partial_confusion, batch_format="pyarrow")
    agg = partials.aggregate(
        Sum("tn", alias_name="tn"),
        Sum("fp", alias_name="fp"),
        Sum("fn", alias_name="fn"),
        Sum("tp", alias_name="tp"),
    )
    out = finalize_metrics(int(agg["tn"]), int(agg["fp"]), int(agg["fn"]), int(agg["tp"]))
    return pd.DataFrame([out])
