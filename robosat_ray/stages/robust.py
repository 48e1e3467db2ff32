"""Per-group robust statistics — exact median, exact MAD (median
absolute deviation), and the 3-MAD outlier count, the robust
alternative to mean/std that survives heavy-tailed price/metric
columns. Composes the exact-quantile histogram machinery
(stages/quantiles.group_quantiles) twice plus one counting pass —
three streaming scans, no raw-row shuffle anywhere.

Spec (mirrored bit-for-bit in oracle.ROBUST_STATS, all integer):
- cents = floor(price * 100 + 0.5)  (the price_quantiles convention)
- median = smallest value whose per-group running count reaches
  ceil(n/2)  (the quantiles.py q=50 rule)
- mad = the same rule applied to |cents - median(group)|
- outlier iff |cents - median| > 3 * mad  (integer compare; the
  1.4826 normal-consistency factor is presentation, not decision)

Scale shape: each pass is the histogram algorithm (bounded by
buckets x groups, not rows) or a pure map + in-batch partial count;
the medians/MADs broadcast as a tiny per-group dict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GROUP = "l_returnflag"


def _cents(b: pa.Table) -> pa.Table:
    q = np.floor(
        b.column("l_extendedprice").to_numpy() * 100.0 + 0.5
    ).astype(np.int64)
    return pa.table({GROUP: b.column(GROUP), "cents": pa.array(q)})


def robust_stats(lineitem_ds):
    """-> (l_returnflag, n_rows, median_cents, mad_cents, n_outliers)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from robosat_ray.stages.quantiles import group_quantiles

    cents = lineitem_ds.select_columns(
        [GROUP, "l_extendedprice"]
    ).map_batches(_cents, batch_format="pyarrow")

    med_df = group_quantiles(cents, GROUP, "cents", qs=(50,)).to_pandas()
    med = dict(zip(med_df[GROUP], med_df["value"].astype(np.int64)))
    med_ref = ray.put(med)

    def absdev(b: pa.Table, _ref=med_ref) -> pa.Table:
        import pandas as pd

        m = ray.get(_ref)
        g = b.column(GROUP).to_numpy(zero_copy_only=False)
        v = b.column("cents").to_numpy()
        # factorize + per-UNIQUE gather: no per-row Python
        codes, uniq = pd.factorize(g, sort=False)
        base = np.array([m[u] for u in uniq], dtype=np.int64)[codes]
        return pa.table(
            {GROUP: b.column(GROUP), "cents": pa.array(np.abs(v - base))}
        )

    mad_df = group_quantiles(
        cents.map_batches(absdev, batch_format="pyarrow"), GROUP, "cents", qs=(50,)
    ).to_pandas()
    mad = dict(zip(mad_df[GROUP], mad_df["value"].astype(np.int64)))
    mad_ref = ray.put((med, mad))

    def flag(b: pa.Table, _ref=mad_ref) -> pa.Table:
        import pandas as pd

        m, d = ray.get(_ref)
        g = b.column(GROUP).to_numpy(zero_copy_only=False)
        v = b.column("cents").to_numpy()
        codes, uniq = pd.factorize(g, sort=False)
        base = np.array([m[u] for u in uniq], dtype=np.int64)[codes]
        mads = np.array([d[u] for u in uniq], dtype=np.int64)[codes]
        out = (np.abs(v - base) > 3 * mads).astype(np.int64)
        return pa.table(
            {GROUP: b.column(GROUP), "is_out": pa.array(out)}
        )

    counts = (
        cents.map_batches(flag, batch_format="pyarrow")
        .groupby(GROUP)
        .aggregate(Count(alias_name="n_rows"), Sum("is_out", alias_name="n_outliers"))
        .to_pandas()
    )
    counts["median_cents"] = counts[GROUP].map(med).astype(np.int64)
    counts["mad_cents"] = counts[GROUP].map(mad).astype(np.int64)
    counts["n_rows"] = counts["n_rows"].astype(np.int64)
    counts["n_outliers"] = counts["n_outliers"].astype(np.int64)
    return counts[
        [GROUP, "n_rows", "median_cents", "mad_cents", "n_outliers"]
    ]
