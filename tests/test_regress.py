"""OLS fit via algebraic sufficient statistics: planted exact linear
model (zero residuals, known betas), planted outlier recovery, Cramer
solve vs numpy lstsq, and partition invariance of the streaming sums."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.regress import (
    MICRO,
    cramer3_micro,
    ols_fit,
    ols_residuals,
    ols_sums,
)


def _docs_from_feats(y, x1, x2, blocks=1):
    """Build a documents-shaped dataset whose quality features are
    exactly (y, x1, x2): text with x1 space-separated tokens, y
    alphabetic chars, x2 total chars. Uses 'a'*k tokens padded with
    '.' filler so n_alpha=y, n_tokens=x1, n_chars=x2."""
    rows = []
    for i, (yy, t, c) in enumerate(zip(y, x1, x2)):
        # t tokens -> t-1 separating spaces; distribute yy alpha chars
        # over the tokens, pad the last token with '.' to reach c chars
        base = ["a"] * t
        extra = yy - t
        base[0] += "a" * extra
        txt = " ".join(base)
        pad = c - len(txt)
        assert pad >= 0, "x2 must cover tokens+spaces"
        txt += "." * pad
        assert len(txt) == c
        rows.append({"doc_id": i, "text": txt})
    ds = ray.data.from_pandas(pd.DataFrame(rows))

    def arrowify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": batch.column("text")}
        )

    ds = ds.map_batches(arrowify, batch_format="pyarrow")
    if blocks > 1:
        ds = ds.repartition(blocks)
    return ds


def _feats(n, seed=7):
    rng = np.random.RandomState(seed)
    x1 = rng.randint(2, 12, n).astype(np.int64)  # tokens
    y = x1 + rng.randint(1, 40, n).astype(np.int64)  # alpha chars >= tokens
    # chars >= alpha + (x1 - 1) spaces, plus filler
    x2 = y + (x1 - 1) + rng.randint(0, 25, n).astype(np.int64)
    return y, x1, x2


def test_exact_linear_model_zero_residuals():
    """y = 2*x1 + 1*x2 - (x1 - 1) planted exactly: n_alpha relates to
    tokens/chars linearly with NO noise -> integer betas recovered
    exactly and all residuals 0... here we plant y = x2 - x1 + 1 by
    construction (all-alpha single-space text with no filler)."""
    rng = np.random.RandomState(3)
    x1 = rng.randint(2, 10, 60).astype(np.int64)
    extra = rng.randint(0, 30, 60).astype(np.int64)
    y = x1 + extra
    x2 = y + x1 - 1  # no filler: chars = alpha + spaces
    ds = _docs_from_feats(y, x1, x2)
    fit = ols_fit(ds).to_pandas().iloc[0]
    assert fit["n_docs"] == 60
    # exact relation y = 1 - x1 + x2 -> betas (1, -1, 1) in micros
    assert fit["b0_micro"] in (MICRO, MICRO - 1)
    assert fit["b1_micro"] in (-MICRO, -MICRO - 1)
    assert fit["b2_micro"] in (MICRO, MICRO - 1)
    res = ols_residuals(ds, k=5).to_pandas()
    # floor-of-float betas leave at most a few micros of residual
    assert (res["resid_micro"].abs() <= 60).all()


def test_outlier_recovery():
    """One doc with far more filler-vs-alpha imbalance than the rest
    must rank first by |residual|."""
    y, x1, x2 = _feats(80)
    x2 = x2.copy()
    # moderate so the point's own leverage doesn't fold the plane
    # around it (a +5000 bump makes OLS fit THROUGH the outlier)
    x2[17] += 300
    ds = _docs_from_feats(y, x1, x2)
    res = ols_residuals(ds, k=3).to_pandas()
    assert res.iloc[0]["doc_id"] == 17


def test_cramer_matches_lstsq():
    y, x1, x2 = _feats(200, seed=11)
    ds = _docs_from_feats(y, x1, x2)
    s = ols_sums(ds)
    b = np.array(cramer3_micro(s), np.float64) / MICRO
    X = np.column_stack([np.ones(len(y)), x1, x2]).astype(np.float64)
    ref, *_ = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)
    assert np.allclose(b, ref, atol=2e-6)


def test_partition_invariance():
    y, x1, x2 = _feats(120, seed=23)
    a = ols_fit(_docs_from_feats(y, x1, x2, blocks=1)).to_pandas()
    b = ols_fit(_docs_from_feats(y, x1, x2, blocks=13)).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    ra = ols_residuals(_docs_from_feats(y, x1, x2, blocks=1)).to_pandas()
    rb = ols_residuals(_docs_from_feats(y, x1, x2, blocks=13)).to_pandas()
    pd.testing.assert_frame_equal(ra, rb)
