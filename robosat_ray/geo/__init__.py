"""From-scratch numpy geometry/raster kernels (no shapely/mercantile/cv2).

Modules:
- tiles: slippy-map / Web-Mercator tile math (ref: robosat/tiles.py)
- polygon: shoelace area, orientation, ray-casting PIP, bbox
- clip: convex clipping, exact polygon-intersection area, IoU
- strtree: STR-packed bbox tree (ref: robosat/spatial/core.py:80-100)
- simplify: Douglas-Peucker (ref: robosat/features/core.py:112-124)
- raster: scanline polygon fill (ref: rasterio.features.rasterize use
  at robosat/tools/rasterize.py:64-83)
- contours: marching-squares border following + hierarchy
  (ref: cv2.findContours use at robosat/features/core.py:95-108)
- morphology: binary open/close (ref: robosat/features/core.py:65-92)
- graph: union-find connected components (ref: robosat/graph/core.py)
"""
