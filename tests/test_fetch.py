"""S5/T7: rate-limited tile fetcher actor pool — transport, retry,
token-bucket behavior, and end-to-end Dataset fetch."""

import os
import time

import numpy as np
import pyarrow as pa
import pytest

from robosat_ray.stages.fetch import TileFetcher, TokenBucket, fetch_tiles


def _tile_dir(tmp_path, z=12):
    root = tmp_path / "tiles"
    for tx, ty in [(1, 2), (1, 3), (5, 5)]:
        d = root / str(z) / str(tx)
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{ty}.png").write_bytes(f"tile-{tx}-{ty}".encode())
    return str(root)


def test_token_bucket_enforces_rate():
    clock = [0.0]
    slept = [0.0]

    def fake_clock():
        return clock[0]

    def fake_sleep(s):
        slept[0] += s
        clock[0] += s

    b = TokenBucket(rate=10.0, burst=2, clock=fake_clock, sleep=fake_sleep)
    for _ in range(12):
        b.take()
    # 2 burst tokens free; 10 more at 10/s => >= 1.0s of simulated wait
    assert slept[0] >= 0.99, slept[0]


def test_fetcher_reads_and_404s(tmp_path, ray_session):
    import ray.data

    root = _tile_dir(tmp_path)
    tiles = ray.data.from_arrow(
        pa.table({"tile_x": pa.array([1, 1, 9], pa.int64()),
                  "tile_y": pa.array([2, 3, 9], pa.int64())})
    )
    out = fetch_tiles(tiles, root, z=12, rate_per_s=10_000).to_pandas()
    out = out.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    assert list(out["status"]) == [200, 200, 404]
    assert out["data"][0] == b"tile-1-2"
    assert out["data"][1] == b"tile-1-3"
    assert out["data"][2] == b""
    assert (out["z"] == 12).all()


def test_fetcher_retries_transient_errors(tmp_path):
    calls = {"n": 0}

    def flaky(tx, ty):
        calls["n"] += 1
        if calls["n"] < 3:
            return 503, b""
        return 200, b"ok"

    f = TileFetcher(str(tmp_path), z=12, transport=flaky, rate_per_s=10_000)
    out = f(pa.table({"tile_x": pa.array([0], pa.int64()),
                      "tile_y": pa.array([0], pa.int64())}))
    assert out.column("status").to_pylist() == [200]
    assert out.column("data").to_pylist() == [b"ok"]
    assert calls["n"] == 3


def test_fetcher_gives_up_after_max_retries(tmp_path):
    def always_down(tx, ty):
        return 503, b""

    f = TileFetcher(str(tmp_path), z=12, transport=always_down,
                    rate_per_s=10_000, max_retries=2)
    out = f(pa.table({"tile_x": pa.array([0], pa.int64()),
                      "tile_y": pa.array([0], pa.int64())}))
    assert out.column("status").to_pylist() == [503]
