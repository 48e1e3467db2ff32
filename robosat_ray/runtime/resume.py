"""Checkpointed partitioned output + resume.

Layout: `{root}/part={id}/data.parquet` + `{root}/part={id}/_SUCCESS`
(a JSON manifest: rows, order-insensitive checksum). Writes are atomic
(temp file + rename). A rerun skips partitions whose manifest exists —
the engine's replacement for the reference's file-existence resume
(robosat/tools/download.py:48-49) and read-modify-max merge
(tools/rasterize.py:131-133), which our idempotent partition overwrite
makes unnecessary.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from robosat_ray.runtime.lineage import batch_checksum


def partition_id(key: np.ndarray, num_partitions: int) -> np.ndarray:
    """Mixed hash partitioning. NOTE: a bare `(key * odd) % 2^k`
    degenerates to `key % 2^k` (any odd multiplier is ≡ some unit mod
    2^k, and 2654435761 ≡ 1 mod 16) — clustered keys (city tiles)
    then land in a handful of partitions. The xor-shift folds the
    high bits back in before the modulus."""
    h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def done_partitions(root: str) -> set[int]:
    out = set()
    if not os.path.isdir(root):
        return out
    for name in os.listdir(root):
        if name.startswith("part=") and os.path.exists(
            os.path.join(root, name, "_SUCCESS")
        ):
            out.add(int(name.split("=", 1)[1]))
    return out


PARTITION_LAYOUT = "mix64-v2"  # bump when partition_id changes


def _check_layout(root: str, key_col: str, num_partitions: int, resume: bool):
    """Resume is only safe when the partition layout (hash version,
    partition count, key) matches the checkpoint's: a silent layout
    change would drop rows into 'already done' partitions. The stamp
    makes the mismatch a hard error instead of corruption."""
    want = {
        "layout": PARTITION_LAYOUT,
        "num_partitions": num_partitions,
        "key_col": key_col,
    }
    path = os.path.join(root, "_LAYOUT")
    if os.path.exists(path):
        with open(path) as f:
            have = json.load(f)
        if have != want and resume:
            raise ValueError(
                f"checkpoint layout mismatch: dir has {have}, run wants {want} "
                "— resume would silently drop/duplicate rows. Use a fresh "
                "output root or resume=False to overwrite."
            )
    with open(path, "w") as f:
        json.dump(want, f)


def write_partitioned(
    ds,
    root: str,
    key_col: str,
    num_partitions: int = 64,
    resume: bool = True,
) -> pd.DataFrame:
    """Write `ds` as hash-partitioned parquet with per-partition
    manifests; skips already-completed partitions when resume=True.
    Returns the manifest table (part, rows, checksum, skipped)."""
    os.makedirs(root, exist_ok=True)
    _check_layout(root, key_col, num_partitions, resume)
    done = done_partitions(root) if resume else set()

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy()
        return batch.append_column(
            "__part", pa.array(partition_id(keys, num_partitions))
        )

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("__part")[0].as_py())
        if part in done:
            return pa.table({"part": pa.array([part], pa.int64()),
                             "rows": pa.array([-1], pa.int64()),
                             "checksum": pa.array([0], pa.int64()),
                             "skipped": pa.array([True])})
        body = group.drop_columns(["__part"])
        pdir = os.path.join(root, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        ck = batch_checksum(body) & 0x7FFFFFFFFFFFFFFF
        manifest = {"part": part, "rows": len(body), "checksum": ck}
        mtmp = os.path.join(pdir, "._SUCCESS.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(pdir, "_SUCCESS"))
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([len(body)], pa.int64()),
                         "checksum": pa.array([ck], pa.int64()),
                         "skipped": pa.array([False])})

    res = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_group, batch_format="pyarrow")
    )
    return res.to_pandas()


def read_partitioned(root: str):
    """Streaming read of a partitioned output (completed parts only)."""
    import ray.data

    paths = [
        os.path.join(root, f"part={p}", "data.parquet")
        for p in sorted(done_partitions(root))
    ]
    ds = ray.data.read_parquet(paths)
    # drop the hive-style `part` column Arrow infers from the dir name
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds


def write_slippy_tree(
    tiles_ds,
    root: str,
    z: int,
    ext: str,
    data_col: str = "data",
    resume: bool = True,
) -> pd.DataFrame:
    """Rows (tile_x, tile_y, <data_col>: binary) -> a REAL slippy-map
    tile tree `{root}/{z}/{x}/{y}.{ext}` — the reference's on-disk
    output layout (robosat/tools/rasterize.py + tiles.py write/read
    exactly this z/x/y scheme). Writes are atomic (temp + rename);
    resume=True skips tiles whose file already exists (the reference's
    file-existence resume, robosat/tools/download.py:48-49). Runs
    distributed as one map_batches over the tile rows (each tile is an
    independent file; on a cluster `root` is the shared store).
    Returns the manifest (tile_x, tile_y, n_bytes, skipped)."""
    os.makedirs(os.path.join(root, str(z)), exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        txs = batch.column("tile_x").to_numpy()
        tys = batch.column("tile_y").to_numpy()
        datas = batch.column(data_col).to_pylist()
        nb = np.zeros(len(txs), dtype=np.int64)
        skipped = np.zeros(len(txs), dtype=bool)
        for i, (tx, ty, d) in enumerate(zip(txs, tys, datas)):
            xdir = os.path.join(root, str(z), str(int(tx)))
            path = os.path.join(xdir, f"{int(ty)}.{ext}")
            if resume and os.path.exists(path):
                skipped[i] = True
                nb[i] = os.path.getsize(path)
                continue
            os.makedirs(xdir, exist_ok=True)
            tmp = os.path.join(xdir, f".{int(ty)}.{ext}.tmp")
            with open(tmp, "wb") as f:
                f.write(d)
            os.replace(tmp, path)
            nb[i] = len(d)
        return pa.table(
            {
                "tile_x": batch.column("tile_x"),
                "tile_y": batch.column("tile_y"),
                "n_bytes": pa.array(nb),
                "skipped": pa.array(skipped),
            }
        )

    return tiles_ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()


def read_slippy_tree(root: str, z: int, ext: str) -> pd.DataFrame:
    """Walk `{root}/{z}/{x}/{y}.{ext}` back into rows (tile_x, tile_y,
    data) — the reference's loader direction (robosat/tiles.py slippy
    walk)."""
    rows = {"tile_x": [], "tile_y": [], "data": []}
    zdir = os.path.join(root, str(z))
    for xname in sorted(os.listdir(zdir), key=int):
        xdir = os.path.join(zdir, xname)
        for yname in sorted(os.listdir(xdir)):
            if not yname.endswith(f".{ext}") or yname.startswith("."):
                continue
            with open(os.path.join(xdir, yname), "rb") as f:
                rows["tile_x"].append(int(xname))
                rows["tile_y"].append(int(yname.split(".", 1)[0]))
                rows["data"].append(f.read())
    return pd.DataFrame(
        {
            "tile_x": np.array(rows["tile_x"], dtype=np.int64),
            "tile_y": np.array(rows["tile_y"], dtype=np.int64),
            "data": pd.Series(rows["data"], dtype=object),
        }
    )


def verify_manifests(root: str) -> pd.DataFrame:
    """Re-read each completed partition and check rows+checksum against
    its manifest (resume-equals-single-run evidence)."""
    rows = []
    for p in sorted(done_partitions(root)):
        pdir = os.path.join(root, f"part={p}")
        with open(os.path.join(pdir, "_SUCCESS")) as f:
            man = json.load(f)
        t = pq.read_table(os.path.join(pdir, "data.parquet"))
        ck = batch_checksum(t) & 0x7FFFFFFFFFFFFFFF
        rows.append(
            {
                "part": p,
                "rows_ok": len(t) == man["rows"],
                "checksum_ok": ck == man["checksum"],
            }
        )
    return pd.DataFrame(rows)
