"""Mergeable log2-binned quantile sketch (the DDSketch idea — Masson,
Rim & Lee, VLDB 2019 — with base-2 buckets so every step is integer-
exact and SQL-replayable).

A relative-error quantile sketch for positive integers: value v maps
to bucket floor(log2(max(v, 1))), so any quantile is answered to
within a factor of 2 (gamma = 2; DDSketch's gamma ~ 1.02 refines the
same construction — base 2 keeps the bin function EXACT in both numpy
(frexp exponent) and DuckDB (integer compare against a 2^b LUT), which
is what makes the oracle bit-for-bit instead of libm-dependent).

Scale shape: per-batch (group, bin) count partials (vectorized
bincount over a dense group x 63-bin lattice) -> ONE tiny groupby Sum
over at most |groups| x 63 rows -> driver finalize on that bounded
table. No per-value shuffle, counts merge associatively — the sketch
property that matters at 10^12 rows. Quantile rule (mirrored in
oracle.QUANTILE_SKETCH): the result bin for quantile q is the smallest
bin with cum * 1_000_000 >= q_micro * n (pure int64 compare), reported
with its [2^bin, 2^(bin+1) - 1] value bounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_BINS = 63  # int64-positive value range
Q_MICROS = (500_000, 900_000, 990_000)  # p50 / p90 / p99


def log2_bins(v: np.ndarray) -> np.ndarray:
    """floor(log2(max(v, 1))) for int64 v — exact via the frexp
    exponent (v = m * 2^e with m in [0.5, 1), so e - 1 is the floor
    log; no libm log2 rounding at the 2^k boundaries)."""
    v = np.maximum(np.asarray(v, np.int64), 1)
    _, e = np.frexp(v.astype(np.float64))
    return (e - 1).astype(np.int64)


def quantile_sketch(ds, group_col: str, value_col: str, q_micros=Q_MICROS):
    """ds -> DataFrame (group, q_micro, n, bin, lo, hi): per group the
    log2-bucket quantile answer for each requested quantile."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        vals = batch.column(value_col).to_numpy()
        codes, uniq = pd.factorize(np.asarray(groups, dtype=object), sort=False)
        bins = log2_bins(vals)
        flat = np.bincount(codes * N_BINS + bins, minlength=len(uniq) * N_BINS)
        flat = flat.reshape(len(uniq), N_BINS)
        gi, bi = np.nonzero(flat)
        return pa.table(
            {
                group_col: pa.array(np.asarray(uniq, dtype=object)[gi], pa.string()),
                "bin": pa.array(bi.astype(np.int64)),
                "n": pa.array(flat[gi, bi].astype(np.int64)),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )  # bounded: |groups| x 63 rows
    out = {group_col: [], "q_micro": [], "n": [], "bin": [], "lo": [], "hi": []}
    for g, gdf in merged.groupby(group_col, sort=True):
        gdf = gdf.sort_values("bin")
        bins = gdf["bin"].to_numpy(np.int64)
        cnts = gdf["n"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        total = int(cum[-1])
        for qm in q_micros:
            k = int(np.searchsorted(cum * 1_000_000, qm * total))
            b = int(bins[k])
            out[group_col].append(g)
            out["q_micro"].append(qm)
            out["n"].append(total)
            out["bin"].append(b)
            out["lo"].append(1 << b)
            out["hi"].append((1 << (b + 1)) - 1)
    return pd.DataFrame(out).astype(
        {"q_micro": np.int64, "n": np.int64, "bin": np.int64, "lo": np.int64, "hi": np.int64}
    )
