"""Pin the scanline dissolve area against brute-force rasterization."""

import numpy as np
import pandas as pd


def test_region_area_vs_raster():
    from robosat_ray.stages.union_area import _region_area

    rng = np.random.default_rng(12)
    for _ in range(15):
        n = int(rng.integers(1, 25))
        x0 = rng.integers(0, 40, n).astype(np.int64)
        w = rng.integers(1, 15, n).astype(np.int64)
        y0 = rng.integers(0, 40, n).astype(np.int64)
        h = rng.integers(1, 15, n).astype(np.int64)
        df = pd.DataFrame(
            {"g": np.zeros(n, np.int64), "x0": x0, "y0": y0,
             "x1": x0 + w, "y1": y0 + h}
        )
        got = int(_region_area(df)["area"].iloc[0])
        grid = np.zeros((60, 60), dtype=bool)
        for i in range(n):
            grid[x0[i]:x0[i] + w[i], y0[i]:y0[i] + h[i]] = True
        assert got == int(grid.sum()), df.to_dict("list")


def test_region_area_touching_rects_merge():
    from robosat_ray.stages.union_area import _region_area

    # two rects sharing an edge: union area = sum (no double count,
    # no gap) — pins the touching-intervals-merge rule
    df = pd.DataFrame(
        {"g": [3, 3], "x0": [0, 0], "y0": [0, 5], "x1": [10, 10],
         "y1": [5, 9]}
    )
    assert int(_region_area(df)["area"].iloc[0]) == 90
