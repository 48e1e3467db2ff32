"""Distributed ordinary-least-squares fit via algebraic sufficient
statistics — the "fit a linear quality model over the whole corpus"
pipeline step (the closed-form cousin of the fasttext-style quality
classifiers used in LLM data curation; cf. reference quality gates in
/root/reference/robosat/tools/, which threshold hand-tuned ratios —
here the weights come from the data itself).

Model: n_alpha ~ b0 + b1 * n_tokens + b2 * n_chars over the document
quality features (stages/quality.py semantics, already oracle-twinned).
Docs whose alphabetic mass diverges most from the length-based
expectation (|residual| top-k) are curation outliers: boilerplate,
markup dumps, repeated-punctuation spam.

Exactness contract (mirrored by oracle.OLS_FIT / oracle.OLS_RESIDUALS):
- sufficient statistics (n, Sx1, Sx2, Sy, S11, S12, S22, S1y, S2y,
  Syy) are EXACT integers: per-block int64 partials (one row per
  block), accumulated on the driver in Python ints (unbounded); the
  SQL twin uses HUGEINT sums. Zero float until the solve.
- the 3x3 normal-equation solve uses Cramer's rule with ONE fixed
  expression tree evaluated in IEEE float64 from the integer sums —
  the SQL twin spells out the identical tree, so both sides round
  identically (the house float-exactness pattern, cf. hexbin).
- betas are published as int64 micros: floor(beta * 1e6). Residuals
  are then PURE int64 arithmetic: resid_micro = 1e6*y - (b0_micro +
  b1_micro*x1 + b2_micro*x2) — no per-doc float anywhere.

Scale shape: fit = one streaming pass (10 int64s per block to the
driver, zero shuffle); residual top-k = one more streaming pass with
per-block top-k partials merged on the driver (k-bounded). The only
data-scale state is the narrow (doc_id, x1, x2, y) feature table,
which is re-derived streaming from the corpus, never materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

OLS_K = 20
MICRO = 1_000_000


def _features(docs_ds):
    """(doc_id, text) -> (doc_id, y=n_alpha, x1=n_tokens, x2=n_chars),
    the integer quality features (quality_batch semantics)."""
    from robosat_ray.stages.quality import quality_batch

    def narrow(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        return pa.table(
            {
                "doc_id": q.column("doc_id"),
                "y": q.column("n_alpha"),
                "x1": q.column("n_tokens"),
                "x2": q.column("n_chars"),
            }
        )

    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        narrow, batch_format="pyarrow"
    )


_SUM_COLS = ("n", "sx1", "sx2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")


def _partials(batch: pa.Table) -> pa.Table:
    y = batch.column("y").to_numpy()
    x1 = batch.column("x1").to_numpy()
    x2 = batch.column("x2").to_numpy()
    vals = (
        len(y),
        int(x1.sum()), int(x2.sum()), int(y.sum()),
        int((x1 * x1).sum()), int((x1 * x2).sum()), int((x2 * x2).sum()),
        int((x1 * y).sum()), int((x2 * y).sum()), int((y * y).sum()),
    )
    return pa.table(
        {c: pa.array([v], pa.int64()) for c, v in zip(_SUM_COLS, vals)}
    )


def ols_sums(docs_ds) -> dict:
    """One streaming pass -> exact Python-int sufficient statistics."""
    sums = dict.fromkeys(_SUM_COLS, 0)
    feats = _features(docs_ds)
    for b in feats.map_batches(_partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows == 0:
            continue
        for c in _SUM_COLS:
            sums[c] += int(b.column(c).to_numpy().sum())
    return sums


def cramer3_micro(s: dict) -> tuple[int, int, int]:
    """Solve the normal equations A @ beta = v for the model
    y ~ b0 + b1*x1 + b2*x2, A = [[n,sx1,sx2],[sx1,s11,s12],
    [sx2,s12,s22]], v = [sy,s1y,s2y], via Cramer's rule in float64.
    THE EXPRESSION TREE BELOW IS THE CONTRACT — oracle._ols_cte()
    spells out the identical tree in SQL so both sides round
    identically. -> (b0_micro, b1_micro, b2_micro) int64 floors."""
    f = np.float64
    n, sx1, sx2 = f(s["n"]), f(s["sx1"]), f(s["sx2"])
    sy, s11, s12 = f(s["sy"]), f(s["s11"]), f(s["s12"])
    s22, s1y, s2y = f(s["s22"]), f(s["s1y"]), f(s["s2y"])
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    assert det != 0.0, "singular normal equations (collinear features)"
    d0 = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    )
    d1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    )
    d2 = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    )
    return (
        int(np.floor(d0 / det * f(MICRO))),
        int(np.floor(d1 / det * f(MICRO))),
        int(np.floor(d2 / det * f(MICRO))),
    )


def ols_fit(docs_ds):
    """-> 1-row Dataset (n_docs, b0_micro, b1_micro, b2_micro)."""
    import ray.data

    s = ols_sums(docs_ds)
    b0, b1, b2 = cramer3_micro(s)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([s["n"]], pa.int64()),
                "b0_micro": pa.array([b0], pa.int64()),
                "b1_micro": pa.array([b1], pa.int64()),
                "b2_micro": pa.array([b2], pa.int64()),
            }
        )
    )


def ols_residuals(docs_ds, k: int = OLS_K):
    """Fit, then top-k docs by |resid_micro| (desc), tie doc_id asc.
    resid_micro = MICRO*y - (b0_micro + b1_micro*x1 + b2_micro*x2):
    integer arithmetic end-to-end once the betas are micros.
    -> Dataset (doc_id, resid_micro), k rows. Second streaming pass;
    per-block top-k partials, k-bounded driver merge."""
    import ray
    import ray.data

    from robosat_ray.functions.topk import topk_indices

    s = ols_sums(docs_ds)
    betas = cramer3_micro(s)
    bref = ray.put(betas)

    def block_topk(batch: pa.Table, _b=bref) -> pa.Table:
        b0, b1, b2 = ray.get(_b)
        ids = batch.column("doc_id").to_numpy()
        y = batch.column("y").to_numpy()
        x1 = batch.column("x1").to_numpy()
        x2 = batch.column("x2").to_numpy()
        resid = MICRO * y - (b0 + b1 * x1 + b2 * x2)
        # k smallest of (-|resid|, doc_id) == k largest |resid|, tie id asc
        idx = topk_indices(-np.abs(resid).astype(np.float64), ids, k)
        return pa.table(
            {
                "doc_id": pa.array(ids[idx]),
                "resid_micro": pa.array(resid[idx]),
            }
        )

    parts = (
        _features(docs_ds)
        .map_batches(block_topk, batch_format="pyarrow")
        .to_pandas()
    )
    ids = parts["doc_id"].to_numpy(dtype=np.int64)
    resid = parts["resid_micro"].to_numpy(dtype=np.int64)
    idx = topk_indices(-np.abs(resid).astype(np.float64), ids, k)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids[idx]),
                "resid_micro": pa.array(resid[idx]),
            }
        )
    )
