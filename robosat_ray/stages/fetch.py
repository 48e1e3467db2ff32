"""Tile fetcher stage (SURVEY.md S5 + T7; reference
robosat/tools/download.py:28-77 — requests.Session per worker, rate
limiting, retry, slippy z/x/y URL scheme).

Engine shape: a map_batches ACTOR pool. Each actor owns a transport
session and a token-bucket rate limiter built once in __init__ (the
T7 pattern); __call__ fetches a batch of tiles and emits
(tile_x, tile_y, z, status, data). The sandbox has no network, so the
default transport is the filesystem (file://{root}/{z}/{x}/{y}.png —
the same slippy layout the reference downloads into); `_transport` is
the single swap-in point for an HTTP session. Rate limiting is real
and enforced per actor: N actors x rate_per_s = the cluster-wide
request budget, which is how a polite crawler is provisioned at
10^12-tile scale (per-actor budgets need no coordination)."""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa


class TokenBucket:
    """Classic token bucket: `rate` tokens/sec, `burst` capacity.
    take() blocks until a token is available — bounding the steady-
    state request rate of the owning actor."""

    def __init__(self, rate: float, burst: int, clock=time.monotonic, sleep=time.sleep):
        self.rate = float(rate)
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.clock = clock
        self.sleep = sleep
        self.last = clock()

    def take(self):
        while True:
            now = self.clock()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self.sleep(max((1.0 - self.tokens) / self.rate, 1e-4))


class TileFetcher:
    """Actor-pool callable: fetch slippy tiles with rate limiting and
    bounded retry. Missing tiles are rows with status=404 and empty
    data (the reference skips-and-logs; a row keeps lineage exact)."""

    def __init__(
        self,
        root: str,
        z: int,
        ext: str = "png",
        rate_per_s: float = 200.0,
        burst: int = 20,
        max_retries: int = 3,
        transport=None,
    ):
        self.root = root
        self.z = z
        self.ext = ext
        self.bucket = TokenBucket(rate_per_s, burst)
        self.max_retries = max_retries
        self._fetch = transport or self._transport

    def _transport(self, tx: int, ty: int):
        """Filesystem transport (swap in an HTTP session here: build
        it in __init__, issue session.get(url) per call)."""
        path = os.path.join(self.root, str(self.z), str(tx), f"{ty}.{self.ext}")
        try:
            with open(path, "rb") as f:
                return 200, f.read()
        except FileNotFoundError:
            return 404, b""
        except OSError:
            return 503, b""  # retryable

    def __call__(self, batch: pa.Table) -> pa.Table:
        txs = batch.column("tile_x").to_numpy()
        tys = batch.column("tile_y").to_numpy()
        status = np.empty(len(txs), dtype=np.int64)
        datas = []
        for i, (tx, ty) in enumerate(zip(txs, tys)):
            code, data = 0, b""
            for attempt in range(self.max_retries + 1):
                self.bucket.take()
                code, data = self._fetch(int(tx), int(ty))
                if code != 503:
                    break
                time.sleep(min(0.05 * (2 ** attempt), 1.0))
            status[i] = code
            datas.append(data)
        return pa.table(
            {
                "tile_x": pa.array(txs),
                "tile_y": pa.array(tys),
                "z": pa.array(np.full(len(txs), self.z, dtype=np.int64)),
                "status": pa.array(status),
                "data": pa.array(datas, pa.binary()),
            }
        )


def fetch_tiles(
    tiles_ds,
    root: str,
    z: int,
    concurrency=(1, 4),
    rate_per_s: float = 200.0,
    **kwargs,
):
    """tiles (tile_x, tile_y) -> fetched (tile_x, tile_y, z, status,
    data) via the rate-limited actor pool."""
    return tiles_ds.map_batches(
        TileFetcher,
        fn_constructor_kwargs={"root": root, "z": z, "rate_per_s": rate_per_s, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
