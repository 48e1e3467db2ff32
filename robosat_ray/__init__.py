"""robosat_ray — a from-scratch Ray-Data-native tiling + spatial-join engine.

Re-expresses the query/data-processing capabilities of mapbox/robosat
(reference at /root/reference, studied for *what* it computes, not *how*)
as streaming ray.data.Dataset stages over zero-copy Arrow batches:

- Web-Mercator slippy-tile math, cover, rasterize (robosat/tiles.py,
  tools/cover.py, tools/rasterize.py semantics)
- point-in-polygon spatial join, kNN match, IoU dedupe, buffered
  union-merge (tools/merge.py, tools/dedupe.py semantics)
- mask -> vector featurize: morphology, contours, Douglas-Peucker
  (robosat/features/ semantics)
- large-scale training-data ops: exact/minhash/simhash dedup, ANN,
  text quality / language id / token stats

All geometry kernels are implemented from scratch in numpy (no shapely /
mercantile / cv2 in this environment). See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"


def _disable_thp() -> None:
    """Disable transparent huge pages for this process (and children
    forked after import). OpenBLAS madvises MADV_HUGEPAGE on its GEMM
    buffer pool; under fragmented memory every worker's first matmul
    then stalls in kernel direct compaction + 2MB folio zeroing
    (observed: 98% system time, 10x wall-time collapse). Data engines
    conventionally run THP-disabled for exactly this reason; the TLB
    win THP offers is negligible next to the compaction storms. The
    prctl is per-process, needs no privileges, and is inherited by
    raylet/workers started after it — importing this package inside a
    Ray worker covers that worker before any BLAS pool is faulted."""
    import sys

    if not sys.platform.startswith("linux"):
        return
    try:
        import ctypes

        PR_SET_THP_DISABLE = 41
        ctypes.CDLL(None).prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0)
    except Exception:
        pass  # best effort: a denied prctl only loses the mitigation


_disable_thp()
