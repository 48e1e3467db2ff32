"""Lineage: every stage can emit per-batch records (stage name, rows
in/out, an order-insensitive content checksum) into a collector actor
— the engine's replacement for the reference's tqdm counters
(robosat/tools/cover.py:29 etc.), made a real queryable table per the
north rule.

The checksum is XOR of 64-bit row hashes, so it is associative /
commutative: the lineage of a stage is reproducible regardless of
block order or partitioning — comparing two runs' (stage, rows,
checksum) triples verifies a resume produced identical data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def batch_checksum(batch: pa.Table, columns: list[str] | None = None) -> int:
    """Order-insensitive 64-bit checksum of a batch (XOR of per-row
    hashes of the selected columns' string forms)."""
    cols = columns or batch.column_names
    acc = np.zeros(len(batch), dtype=np.uint64)
    for c in cols:
        col = batch.column(c)
        s = col.cast(pa.string()) if col.type != pa.string() else col
        vals = s.to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    __import__("hashlib").md5(
                        (c + "\x00" + (v if v is not None else "\x01")).encode()
                    ).digest()[:8],
                    "little",
                )
                for v in vals
            ),
            dtype=np.uint64,
            count=len(vals),
        )
        acc ^= h * np.uint64(0x9E3779B97F4A7C15)
    out = np.uint64(0)
    for v in acc:
        out ^= v
    return int(out)


def _get_collector():
    import ray

    return LineageCollector.options(
        name="robosat_ray_lineage", get_if_exists=True, lifetime="detached"
    ).remote()


def lineage_collector():
    return _get_collector()


def with_lineage(ds, stage: str, checksum_columns: list[str] | None = None):
    """Wrap a Dataset with a pass-through stage that records one
    lineage row per batch into the named collector actor."""
    import ray

    collector = _get_collector()

    def record(batch: pa.Table) -> pa.Table:
        collector.add.remote(
            {
                "stage": stage,
                "rows": len(batch),
                "bytes": batch.nbytes,
                "checksum": batch_checksum(batch, checksum_columns),
            }
        )
        return batch

    return ds.map_batches(record, batch_format="pyarrow")


def lineage_table() -> pd.DataFrame:
    """Per-stage lineage summary: batches, rows, bytes, combined
    checksum (XOR over batch checksums)."""
    import ray

    rows = ray.get(_get_collector().snapshot.remote())
    if not rows:
        return pd.DataFrame({"stage": [], "batches": [], "rows": [], "bytes": [], "checksum": []})
    df = pd.DataFrame(rows)
    out = (
        df.groupby("stage")
        .agg(
            batches=("rows", "size"),
            rows=("rows", "sum"),
            bytes=("bytes", "sum"),
        )
        .reset_index()
    )
    cks = df.groupby("stage")["checksum"].apply(
        lambda s: int(np.bitwise_xor.reduce(np.array(s, dtype=np.uint64)))
    )
    out["checksum"] = out["stage"].map(cks)
    return out


def reset_lineage():
    import ray

    ray.get(_get_collector().reset.remote())


def _define_collector():
    import ray

    @ray.remote(num_cpus=0)
    class _LineageCollector:
        def __init__(self):
            self._rows = []

        def add(self, record: dict):
            self._rows.append(record)

        def snapshot(self):
            return list(self._rows)

        def reset(self):
            self._rows = []

    return _LineageCollector


class _Lazy:
    _cls = None

    def __getattr__(self, item):
        if _Lazy._cls is None:
            _Lazy._cls = _define_collector()
        return getattr(_Lazy._cls, item)


LineageCollector = _Lazy()
