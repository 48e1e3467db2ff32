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
