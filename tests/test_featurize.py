"""Featurize pipeline: mask -> vector -> mask round trips, denoise
behavior, and the rasterize stage end-to-end (reference parity shape:
tests/tools/test_rasterize.py's covered/empty tile assertions)."""

import numpy as np
import pyarrow as pa

from robosat_ray.geo.raster import fill_rings
from robosat_ray.stages.featurize import featurize_mask


def test_featurize_rect_mask_exact_geometry():
    mask = np.zeros((64, 64), dtype=np.uint8)
    mask[10:30, 20:50] = 1
    polys = featurize_mask(mask, tx=655, ty=1583, z=12)
    assert len(polys) == 1
    (lon, my) = polys[0]["rings"][0]
    # tile 655 z12: west + [20,50]/64 * width
    n = 4096.0
    west = 655 / n * 360.0 - 180.0
    width = 360.0 / n
    assert np.isclose(lon.min(), west + 20 / 64 * width)
    assert np.isclose(lon.max(), west + 50 / 64 * width)
    assert polys[0]["area_px"] == 20 * 30


def test_featurize_denoise_drops_speckle():
    mask = np.zeros((64, 64), dtype=np.uint8)
    mask[10:30, 10:30] = 1
    mask[50, 50] = 1
    polys = featurize_mask(mask, 0, 0, 12, denoise_px=5)
    assert len(polys) == 1


def test_featurize_hole_preserved():
    mask = np.zeros((64, 64), dtype=np.uint8)
    mask[8:40, 8:40] = 1
    mask[16:32, 16:32] = 0
    polys = featurize_mask(mask, 0, 0, 12)
    assert len(polys) == 1
    assert len(polys[0]["rings"]) == 2
    assert polys[0]["area_px"] == 32 * 32 - 16 * 16


def test_rasterize_featurize_roundtrip_via_stage(ray_session):
    """rasterize footprints -> featurize masks -> burned area equals
    mask foreground (pixel-exact for axis-aligned rects)."""
    from robosat_ray.stages.featurize import featurize
    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_dataset

    sf = "/root/testdata/sf0.001"
    masks = rasterize(footprints_dataset(sf), size=64)
    mpd = masks.to_pandas()
    feats = featurize(rasterize(footprints_dataset(sf), size=64)).to_pandas()
    per_tile = feats.groupby(["tile_x", "tile_y"])["area_px"].sum()
    for r in mpd.itertuples():
        got = per_tile.get((r.tile_x, r.tile_y), 0.0)
        assert got == r.fg, (r.tile_x, r.tile_y, got, r.fg)


def test_rasterize_left_outer_zero_tiles(ray_session):
    """tiles_ds adds all-zero masks for uncovered tiles (reference
    rasterize.py:120-124 left-outer semantics)."""
    import ray.data

    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_dataset

    sf = "/root/testdata/sf0.001"
    extra = ray.data.from_items([{"tile_x": 1, "tile_y": 1}, {"tile_x": 2, "tile_y": 2}])
    masks = rasterize(footprints_dataset(sf), size=64, tiles_ds=extra).to_pandas()
    z11 = masks[(masks.tile_x == 1) & (masks.tile_y == 1)]
    assert len(z11) == 1 and z11.iloc[0]["fg"] == 0
    data = np.frombuffer(z11.iloc[0]["data"], dtype=np.uint8)
    assert (data == 0).all()


def test_edge_serialization_equals_bruteforce_boundary(ray_session):
    """featurize_edges rows == the brute-force boundary-edge set of
    each 8-connected mask component (pixel has an out-of-component
    4-neighbor across the edge), on a mask with a hole, a diagonal
    touch, and multiple components."""
    import pandas as pd
    import ray.data

    from robosat_ray.geo.contours import label_components
    from robosat_ray.geo.raster import binary_views  # noqa: F401 (stage dep)
    from robosat_ray.stages.featurize import featurize, featurize_edges

    size = 64
    mask = np.zeros((size, size), dtype=np.uint8)
    mask[5:20, 5:25] = 1
    mask[9:15, 10:20] = 0          # hole
    mask[20, 25] = 1               # diagonal touch to the big rect
    mask[40:44, 40:41] = 1         # thin separate component
    mask[50, 50] = 1               # single pixel
    tx, ty, z = 655, 1583, 12

    masks = ray.data.from_arrow(
        pa.table(
            {
                "tile_x": pa.array([tx], pa.int64()),
                "tile_y": pa.array([ty], pa.int64()),
                "size": pa.array([size], pa.int64()),
                "data": pa.array([mask.tobytes()], pa.binary()),
            }
        )
    )
    got = (
        featurize_edges(featurize(masks), z=z, size=size)
        .to_pandas()
        .sort_values(["ckey", "y0", "x0", "y1", "x1"])
        .reset_index(drop=True)
    )

    labels, n = label_components(mask, connectivity=8)
    rows = []
    for lab in range(1, n + 1):
        comp = labels == lab
        edges = set()
        js, is_ = np.nonzero(comp)
        for j, i in zip(js, is_):
            if j == 0 or not comp[j - 1, i]:
                edges.add((i, j, i + 1, j))
            if j == size - 1 or not comp[j + 1, i]:
                edges.add((i, j + 1, i + 1, j + 1))
            if i == 0 or not comp[j, i - 1]:
                edges.add((i, j, i, j + 1))
            if i == size - 1 or not comp[j, i + 1]:
                edges.add((i + 1, j, i + 1, j + 1))
        ck = min(y0 * 1024 + x0 for (x0, y0, _, _) in edges)
        for (x0, y0, x1, y1) in edges:
            rows.append((tx, ty, ck, x0, y0, x1, y1))
    want = (
        pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "ckey", "x0", "y0", "x1", "y1"]
        )
        .sort_values(["ckey", "y0", "x0", "y1", "x1"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want)


def test_edge_serialization_partition_invariant(ray_session):
    """The boundary-edge rows must be identical whatever the mask
    block structure (distributed invariant, SURVEY §5.2)."""
    import pandas as pd

    from robosat_ray.stages.featurize import featurize, featurize_edges
    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_dataset

    sf = "/root/testdata/sf0.001"

    def run(nblocks):
        masks = rasterize(footprints_dataset(sf), size=64)
        if nblocks:
            masks = masks.repartition(nblocks)
        df = featurize_edges(featurize(masks), size=64).to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(None), run(11))
