"""Exact distributed quantiles over a quantized numeric column.

Scale shape: the data-sized pass is an algebraic (group, value) ->
count aggregation (combine inside map_batches happens implicitly via
Ray's partial aggregation); the quantile pick then runs over the
COMPRESSED (group, value, count) table — small even at 100 TB when the
value domain is bounded (integer cents here). No per-group sort of raw
rows, no single worker ever holds a group's rows.

Quantile definition (mirrored exactly by the SQL oracle, integer
arithmetic only): q-quantile = smallest value whose running count
reaches ceil(q * n) within its group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_QS = (25, 50, 75, 95)  # percent, kept integer end-to-end


def group_quantiles(ds, group_col: str, value_col: str, qs=DEFAULT_QS):
    """ds must carry an int64 `value_col` (quantize floats upstream).
    -> Dataset (group, q_pct, value): one row per group x quantile."""
    from ray.data.aggregate import Count

    counts = ds.groupby([group_col, value_col]).aggregate(Count(alias_name="n"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="stable")
        vals = g[value_col].to_numpy()
        cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            # ceil(q/100 * total) in pure ints: (q*total + 99) // 100
            target = (int(q) * total + 99) // 100
            idx = int(np.searchsorted(cum, target))
            out_q.append(int(q))
            out_v.append(int(vals[idx]))
        return pd.DataFrame(
            {
                group_col: np.repeat(g[group_col].iloc[0], len(qs)),
                "q_pct": np.array(out_q, dtype=np.int64),
                "value": np.array(out_v, dtype=np.int64),
            }
        )

    return counts.groupby(group_col).map_groups(pick, batch_format="pandas")
