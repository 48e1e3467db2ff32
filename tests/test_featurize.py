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
