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


def epoch_loss(prob_pairs_ds) -> pd.DataFrame:
    """A7 (reference tools/train.py epoch running-mean losses):
    global mean binary cross-entropy of the softvote probability
    against the label, computed as an algebraic aggregate —
    per-batch (q0, q1, label) combo COUNTS (bincount) -> groupby Sum
    -> a <=131k-row driver finalize over the distinct combos. The
    float loss is evaluated once per combo, not per pixel, so the
    pipeline ships only integer counts."""
    from ray.data.aggregate import Sum

    from robosat_ray.geo.raster import binary_views

    def partial(batch: pa.Table) -> pa.Table:
        labs = binary_views(batch.column("label_data"))
        q0s = binary_views(batch.column("q0_data"))
        q1s = binary_views(batch.column("q1_data"))
        keys_all = []
        for lab, q0, q1 in zip(labs, q0s, q1s):
            y = (np.frombuffer(lab, np.uint8) != 0).astype(np.int64)
            key = (
                np.frombuffer(q0, np.uint8).astype(np.int64) * 512
                + np.frombuffer(q1, np.uint8).astype(np.int64) * 2
                + y
            )
            keys_all.append(key)
        if not keys_all:
            return pa.table({"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        flat = np.concatenate(keys_all)
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"key": pa.array(uniq), "n": pa.array(cnt)})

    partials = prob_pairs_ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("key").aggregate(Sum("n", alias_name="n")).to_pandas()
    from robosat_ray.stages.scorer import _ANCHORS

    key = agg["key"].to_numpy()
    n = agg["n"].to_numpy()
    order = np.argsort(key)
    key, n = key[order], n[order]
    q0 = key // 512
    q1 = (key // 2) % 256
    y = key % 2
    p = (_ANCHORS[q0] + _ANCHORS[q1]) / 2.0
    loss = np.where(y == 1, -np.log(p), -np.log(1.0 - p))
    total = int(n.sum())
    n_fg = int(n[y == 1].sum())
    mean = float(np.round((n * loss).sum() / total, 8))
    return pd.DataFrame(
        [{"n_pixels": total, "n_fg": n_fg, "loss_mean": mean}]
    ).astype({"n_pixels": np.int64, "n_fg": np.int64})


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
