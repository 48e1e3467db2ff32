"""Vector-tile emission: footprints -> per-tile REAL Mapbox Vector
Tile bytes (codecs/mvt.py) -> stats recomputed from the DECODED bytes,
so the oracle (which derives the same numbers from the source table's
quantized corners) gates the whole encode->decode container path —
the same round-trip pattern as mask_png / pbf_extract.

Scale shape: flat-map explode to covered tiles (one row per
footprint x tile), ONE groupby-bucket-of-tile shuffle, per-tile encode
+ decode inside the group (numpy boundary scan, no pandas
sub-groupby). Output is one stats row per tile; the MVT payload bytes
themselves are the natural sink artifact (a slippy-map server's tile
store) and are produced-then-parsed here rather than shipped onward.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.geo import tiles as T

_VS_MIX = 8191  # vsum = sum(qx * _VS_MIX + qy) over decoded vertices


def _explode(batch: pa.Table, z: int) -> pa.Table:
    minx = batch.column("minx").to_numpy()
    miny = batch.column("miny").to_numpy()
    maxx = batch.column("maxx").to_numpy()
    maxy = batch.column("maxy").to_numpy()
    tx0, ty0, tx1, ty1 = T.tile_range(minx, miny, maxx, maxy, z)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    reps = (tx1 - tx0 + 1).astype(np.int64) * ny
    row = np.repeat(np.arange(len(minx)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    import pyarrow.compute as pc

    return pa.table(
        {
            "tile_x": pa.array(tx0[row] + offs // ny[row]),
            "tile_y": pa.array(ty0[row] + offs % ny[row]),
            "feature_id": pc.take(batch.column("feature_id"), pa.array(row)),
            "kind": pc.take(batch.column("kind"), pa.array(row)),
            "minx": pa.array(minx[row]),
            "miny": pa.array(miny[row]),
            "maxx": pa.array(maxx[row]),
            "maxy": pa.array(maxy[row]),
        }
    )


def _tile_groups(group: pd.DataFrame, z: int, extent: int):
    """Bucket group -> yields (tx, ty, features list) per tile with
    tile-local quantized rect rings (numpy boundary scan; op order of
    the quantization mirrored in the oracle:
    qx = floor(((x + 180)/360 * N - tx) * extent + 0.5))."""
    N = float(1 << z)
    txa = group["tile_x"].to_numpy(np.int64)
    tya = group["tile_y"].to_numpy(np.int64)
    fid = group["feature_id"].to_numpy(np.int64)
    kind = group["kind"].to_numpy()
    minx = group["minx"].to_numpy(np.float64)
    miny = group["miny"].to_numpy(np.float64)
    maxx = group["maxx"].to_numpy(np.float64)
    maxy = group["maxy"].to_numpy(np.float64)
    order = np.lexsort((fid, tya, txa))
    txa, tya, fid, kind = txa[order], tya[order], fid[order], kind[order]
    minx, miny, maxx, maxy = minx[order], miny[order], maxx[order], maxy[order]
    qx0 = np.floor(((minx + 180.0) / 360.0 * N - txa) * float(extent) + 0.5).astype(np.int64)
    qx1 = np.floor(((maxx + 180.0) / 360.0 * N - txa) * float(extent) + 0.5).astype(np.int64)
    qy0 = np.floor((miny * N - tya) * float(extent) + 0.5).astype(np.int64)
    qy1 = np.floor((maxy * N - tya) * float(extent) + 0.5).astype(np.int64)
    m = len(txa)
    change = np.empty(m, dtype=bool)
    if m:
        change[0] = True
        change[1:] = (txa[1:] != txa[:-1]) | (tya[1:] != tya[:-1])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], m)
    for s, e in zip(starts, ends):
        feats = [
            {
                "id": int(fid[i]),
                "rings": [
                    (
                        np.array([qx0[i], qx1[i], qx1[i], qx0[i]], np.int64),
                        np.array([qy0[i], qy0[i], qy1[i], qy1[i]], np.int64),
                    )
                ],
                "tags": {"kind": str(kind[i])},
            }
            for i in range(s, e)
        ]
        yield int(txa[s]), int(tya[s]), feats


def _tagged_explode(feet_ds, z: int):
    from robosat_ray.functions.hashing import hash_bucket2

    def tag(b: pa.Table) -> pa.Table:
        ex = _explode(b, z)
        return ex.append_column(
            "bucket",
            pa.array(
                hash_bucket2(
                    ex.column("tile_x").to_numpy(), ex.column("tile_y").to_numpy(), 64
                )
            ),
        )

    return feet_ds.map_batches(tag, batch_format="pyarrow")


def mvt_tile_stats(feet_ds, z: int = C.Z_JOIN, extent: int = 4096):
    """-> Dataset (tile_x, tile_y, n_features, n_vertices, vsum,
    id_sum, n_building) — every stat computed from DECODED MVT bytes."""
    from robosat_ray.codecs.mvt import decode_mvt, encode_mvt

    def encode_decode_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = {
            "tile_x": [], "tile_y": [], "n_features": [], "n_vertices": [],
            "vsum": [], "id_sum": [], "n_building": [],
        }
        for tx, ty, feats in _tile_groups(group, z, extent):
            buf = encode_mvt("footprints", feats, extent=extent)
            lay = decode_mvt(buf)[0]
            assert lay["name"] == "footprints" and lay["extent"] == extent
            nv = 0
            vs = 0
            ids = 0
            nb = 0
            for f in lay["features"]:
                rx, ry = f["rings"][0]
                nv += len(rx)
                vs += int((rx * _VS_MIX + ry).sum())
                ids += int(f["id"])
                nb += int(f["tags"]["kind"] == "building")
            out["tile_x"].append(tx)
            out["tile_y"].append(ty)
            out["n_features"].append(len(lay["features"]))
            out["n_vertices"].append(nv)
            out["vsum"].append(vs)
            out["id_sum"].append(ids)
            out["n_building"].append(nb)
        return pd.DataFrame({k: np.array(v, dtype=np.int64) for k, v in out.items()})

    return (
        _tagged_explode(feet_ds, z)
        .groupby("bucket")
        .map_groups(encode_decode_bucket, batch_format="pandas")
    )


def mvt_tile_payloads(feet_ds, z: int = C.Z_JOIN, extent: int = 4096):
    """-> Dataset (tile_x, tile_y, data: binary) of real MVT payloads —
    the tile-store artifact; pair with runtime.resume.write_slippy_tree
    for the reference's on-disk {z}/{x}/{y} layout."""
    from robosat_ray.codecs.mvt import encode_mvt

    def encode_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out_x, out_y, out_b = [], [], []
        for tx, ty, feats in _tile_groups(group, z, extent):
            out_x.append(tx)
            out_y.append(ty)
            out_b.append(encode_mvt("footprints", feats, extent=extent))
        return pd.DataFrame(
            {
                "tile_x": np.array(out_x, dtype=np.int64),
                "tile_y": np.array(out_y, dtype=np.int64),
                "data": pd.Series(out_b, dtype=object),
            }
        )

    return (
        _tagged_explode(feet_ds, z)
        .groupby("bucket")
        .map_groups(encode_bucket, batch_format="pandas")
    )
