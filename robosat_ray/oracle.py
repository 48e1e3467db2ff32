"""DuckDB oracle SQL, mirroring the engine's deterministic synthesis
EXACTLY (same integer hash chains, same IEEE op order — verified
bit-identical numpy vs DuckDB). Single source of truth for the SQL
fragments used by __ray_entry__.oracle_sql().
"""

from __future__ import annotations

from robosat_ray import constants as C

_CITY_LON = "[" + ", ".join(repr(v) for v in C.CITY_LON) + "]"
_CITY_MY = "[" + ", ".join(repr(v) for v in C.CITY_MY) + "]"
_N = float(1 << C.Z_JOIN)  # 4096.0
_NI = 1 << C.Z_JOIN


def points_cte() -> str:
    """Derived page-points table from `documents` (mirrors
    synth.pages.page_coords + constants)."""
    return f"""
pts AS (
  SELECT doc_id,
         '{C.URL_PREFIX}' || doc_id AS url,
         CASE WHEN doc_id % 10 < 6 THEN
           list_extract({_CITY_LON}, CAST(doc_id % 8 AS INTEGER) + 1)
             + (((doc_id * {C.H1_MUL}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_LON_SPAN!r}
         ELSE ((doc_id * {C.H1_MUL}) % {C.MOD32}) / {float(C.MOD32)!r} * 360.0 - 180.0 END AS lon,
         CASE WHEN doc_id % 10 < 6 THEN
           list_extract({_CITY_MY}, CAST(doc_id % 8 AS INTEGER) + 1)
             + (((doc_id * {C.H2_MUL} + {C.H2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_MY_SPAN!r}
         ELSE {C.BG_MY_LO!r} + ((doc_id * {C.H2_MUL} + {C.H2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} * {C.BG_MY_RANGE!r} END AS my
  FROM documents
)"""


def feet_cte() -> str:
    """Derived footprint-rect table from `part` (mirrors
    synth.footprints.footprint_rects)."""
    return f"""
feet AS (
  SELECT p_partkey AS feature_id,
         list_extract(['building', 'road', 'water', 'parking'], CAST(p_partkey % 4 AS INTEGER) + 1) AS kind,
         cx - hw AS minx, cy - hh AS miny, cx + hw AS maxx, cy + hh AS maxy
  FROM (
    SELECT p_partkey,
           CASE WHEN p_partkey % 10 < 6 THEN
             list_extract({_CITY_LON}, CAST(p_partkey % 8 AS INTEGER) + 1)
               + (((p_partkey * {C.G1_MUL} + {C.G1_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_LON_SPAN!r}
           ELSE ((p_partkey * {C.G1_MUL} + {C.G1_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} * 360.0 - 180.0 END AS cx,
           CASE WHEN p_partkey % 10 < 6 THEN
             list_extract({_CITY_MY}, CAST(p_partkey % 8 AS INTEGER) + 1)
               + (((p_partkey * {C.G2_MUL} + {C.G2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_MY_SPAN!r}
           ELSE {C.BG_MY_LO!r} + (((p_partkey * {C.G2_MUL} + {C.G2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r}) * {C.BG_MY_RANGE!r} END AS cy,
           CAST({C.FOOT_HW_BASE!r} AS DOUBLE) + (p_size % 10) * CAST({C.FOOT_HW_STEP!r} AS DOUBLE) AS hw,
           CAST({C.FOOT_HH_BASE!r} AS DOUBLE) + (p_size % 10) * CAST({C.FOOT_HH_STEP!r} AS DOUBLE) AS hh
    FROM part
  )
)"""


def tile_x(expr: str) -> str:
    return f"CAST(floor(({expr} + 180.0) / 360.0 * {_N!r}) AS BIGINT)"


def tile_y(expr: str) -> str:
    return f"CAST(floor({expr} * {_N!r}) AS BIGINT)"


def cell(lon_expr: str, my_expr: str) -> str:
    return f"({tile_x(lon_expr)} * {_NI} + {tile_y(my_expr)})"


EXTRACT_TEXT = f"""
SELECT '{C.URL_PREFIX}' || doc_id AS url, text FROM documents
"""

TILE_ASSIGN = f"""
WITH {points_cte()}
SELECT url, doc_id, {tile_x('lon')} AS tile_x, {tile_y('my')} AS tile_y,
       {cell('lon', 'my')} AS cell
FROM pts
"""

# Bing quadkey cell encoding at z=12 (digit at level L = 2*y_bit +
# x_bit of bit z-L; numeric form = the base-4 string as an integer) —
# mirrors geo/tiles.quadkey / quadkey_str bit-for-bit.
QUADKEYS = f"""
WITH {points_cte()},
t AS (SELECT doc_id, {tile_x('lon')} AS tx, {tile_y('my')} AS ty FROM pts)
SELECT doc_id, tx AS tile_x, ty AS tile_y,
       CAST((((ty >> 0) & 1) * 2 + ((tx >> 0) & 1)) * 1 + (((ty >> 1) & 1) * 2 + ((tx >> 1) & 1)) * 4 + (((ty >> 2) & 1) * 2 + ((tx >> 2) & 1)) * 16 + (((ty >> 3) & 1) * 2 + ((tx >> 3) & 1)) * 64 + (((ty >> 4) & 1) * 2 + ((tx >> 4) & 1)) * 256 + (((ty >> 5) & 1) * 2 + ((tx >> 5) & 1)) * 1024 + (((ty >> 6) & 1) * 2 + ((tx >> 6) & 1)) * 4096 + (((ty >> 7) & 1) * 2 + ((tx >> 7) & 1)) * 16384 + (((ty >> 8) & 1) * 2 + ((tx >> 8) & 1)) * 65536 + (((ty >> 9) & 1) * 2 + ((tx >> 9) & 1)) * 262144 + (((ty >> 10) & 1) * 2 + ((tx >> 10) & 1)) * 1048576 + (((ty >> 11) & 1) * 2 + ((tx >> 11) & 1)) * 4194304 AS BIGINT) AS quadkey,
       CAST(((ty >> 11) & 1) * 2 + ((tx >> 11) & 1) AS VARCHAR) || CAST(((ty >> 10) & 1) * 2 + ((tx >> 10) & 1) AS VARCHAR) || CAST(((ty >> 9) & 1) * 2 + ((tx >> 9) & 1) AS VARCHAR) || CAST(((ty >> 8) & 1) * 2 + ((tx >> 8) & 1) AS VARCHAR) || CAST(((ty >> 7) & 1) * 2 + ((tx >> 7) & 1) AS VARCHAR) || CAST(((ty >> 6) & 1) * 2 + ((tx >> 6) & 1) AS VARCHAR) || CAST(((ty >> 5) & 1) * 2 + ((tx >> 5) & 1) AS VARCHAR) || CAST(((ty >> 4) & 1) * 2 + ((tx >> 4) & 1) AS VARCHAR) || CAST(((ty >> 3) & 1) * 2 + ((tx >> 3) & 1) AS VARCHAR) || CAST(((ty >> 2) & 1) * 2 + ((tx >> 2) & 1) AS VARCHAR) || CAST(((ty >> 1) & 1) * 2 + ((tx >> 1) & 1) AS VARCHAR) || CAST(((ty >> 0) & 1) * 2 + ((tx >> 0) & 1) AS VARCHAR) AS qk
FROM t
"""

# Hierarchical quadkey rollup: page + distinct-tile counts per level-8
# parent cell (mirrors pipelines/queries.q_quadkey_agg).
QUADKEY_AGG = f"""
WITH {points_cte()},
t AS (SELECT CAST((((ty >> 0) & 1) * 2 + ((tx >> 0) & 1)) * 1 + (((ty >> 1) & 1) * 2 + ((tx >> 1) & 1)) * 4 + (((ty >> 2) & 1) * 2 + ((tx >> 2) & 1)) * 16 + (((ty >> 3) & 1) * 2 + ((tx >> 3) & 1)) * 64 + (((ty >> 4) & 1) * 2 + ((tx >> 4) & 1)) * 256 + (((ty >> 5) & 1) * 2 + ((tx >> 5) & 1)) * 1024 + (((ty >> 6) & 1) * 2 + ((tx >> 6) & 1)) * 4096 + (((ty >> 7) & 1) * 2 + ((tx >> 7) & 1)) * 16384 + (((ty >> 8) & 1) * 2 + ((tx >> 8) & 1)) * 65536 + (((ty >> 9) & 1) * 2 + ((tx >> 9) & 1)) * 262144 + (((ty >> 10) & 1) * 2 + ((tx >> 10) & 1)) * 1048576 + (((ty >> 11) & 1) * 2 + ((tx >> 11) & 1)) * 4194304 AS BIGINT) AS qk
      FROM (SELECT {tile_x('lon')} AS tx, {tile_y('my')} AS ty FROM pts))
SELECT qk >> 8 AS qk8,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT qk) AS BIGINT) AS n_tiles
FROM t GROUP BY 1
"""

COVER = f"""
WITH {feet_cte()}
SELECT DISTINCT
  {tile_x('f.minx')} + gx.i AS tile_x,
  {tile_y('f.miny')} + gy.j AS tile_y
FROM feet f
CROSS JOIN generate_series(0, 8) gx(i)
CROSS JOIN generate_series(0, 8) gy(j)
WHERE gx.i <= {tile_x('f.maxx')} - {tile_x('f.minx')}
  AND gy.j <= {tile_y('f.maxy')} - {tile_y('f.miny')}
"""

SPATIAL_JOIN = f"""
WITH {points_cte()}, {feet_cte()}
SELECT p.url, p.doc_id, f.feature_id, f.kind, {cell('p.lon', 'p.my')} AS cell
FROM pts p JOIN feet f
  ON p.lon >= f.minx AND p.lon <= f.maxx AND p.my >= f.miny AND p.my <= f.maxy
"""

JOIN_AGG = f"""
WITH {points_cte()}, {feet_cte()}
SELECT f.kind, COUNT(*) AS n_hits, COUNT(DISTINCT p.doc_id) AS n_docs
FROM pts p JOIN feet f
  ON p.lon >= f.minx AND p.lon <= f.maxx AND p.my >= f.miny AND p.my <= f.maxy
GROUP BY f.kind
"""

KNN = f"""
WITH {points_cte()}
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.doc_id AS query_id, p.doc_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.doc_id
           ORDER BY (p.lon - q.lon) * (p.lon - q.lon)
                  + ((p.my - q.my) * 360.0) * ((p.my - q.my) * 360.0),
                    p.doc_id
         ) AS rank
  FROM pts q, pts p
  WHERE q.doc_id % {C.KNN_STRIDE} = 0 AND p.doc_id <> q.doc_id
) WHERE rank <= {C.KNN_K}
"""

def preds_cte() -> str:
    """Predicted (jittered) rects from `part` (mirrors
    synth.footprints.predicted_rects: shift = [0.2,0.8,2.5][k%3]*hw)."""
    return f"""
preds AS (
  SELECT feature_id AS pred_id,
         minx + shift AS minx, miny, maxx + shift AS maxx, maxy
  FROM (
    SELECT f.*, CAST(list_extract([0.2, 0.8, 2.5], CAST(f.feature_id % 3 AS INTEGER) + 1) AS DOUBLE)
           * (CAST({C.FOOT_HW_BASE!r} AS DOUBLE) + (p.p_size % 10) * CAST({C.FOOT_HW_STEP!r} AS DOUBLE)) AS shift
    FROM feet f JOIN part p ON p.p_partkey = f.feature_id
  )
)"""


# Reference union rule (robosat/tools/dedupe.py:56-67): keep a pred
# iff no positively-intersecting reference shape, or
# IoU(pred, union(intersectors)) < threshold. Union area of axis-
# aligned rects via x-slab scanline + y-interval islands; the
# pred-clipped variant of the same scanline gives |pred ∩ U|.
DEDUPE = f"""
WITH {feet_cte()}, {preds_cte()},
pairs AS (
  SELECT p.pred_id, p.minx AS px0, p.miny AS py0, p.maxx AS px1, p.maxy AS py1,
         f.minx AS fx0, f.miny AS fy0, f.maxx AS fx1, f.maxy AS fy1
  FROM preds p JOIN feet f
    ON f.minx < p.maxx AND p.minx < f.maxx
   AND f.miny < p.maxy AND p.miny < f.maxy
),
slabs AS (
  SELECT pred_id, x AS x0,
         LEAD(x) OVER (PARTITION BY pred_id ORDER BY x) AS x1
  FROM (SELECT DISTINCT pred_id, fx0 AS x FROM pairs
        UNION SELECT DISTINCT pred_id, fx1 FROM pairs)
),
cover AS (
  -- DISTINCT: tie-free island windows (see MERGE_RING_CELLS yint)
  SELECT DISTINCT s.pred_id, s.x0, s.x1, f.fy0, f.fy1,
         f.px0, f.py0, f.px1, f.py1
  FROM slabs s JOIN pairs f
    ON f.pred_id = s.pred_id AND f.fx0 <= s.x0 AND f.fx1 >= s.x1
  WHERE s.x1 IS NOT NULL
),
marked AS (
  SELECT *, CASE WHEN fy0 > COALESCE(MAX(fy1) OVER (
           PARTITION BY pred_id, x0 ORDER BY fy0, fy1
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), fy0 - 1.0)
         THEN 1 ELSE 0 END AS brk
  FROM cover
),
grp AS (
  SELECT *, SUM(brk) OVER (PARTITION BY pred_id, x0 ORDER BY fy0, fy1
           ROWS UNBOUNDED PRECEDING) AS g
  FROM marked
),
seg AS (
  SELECT pred_id, x0, x1, g, MIN(fy0) AS y0, MAX(fy1) AS y1,
         MIN(px0) AS px0, MIN(py0) AS py0, MIN(px1) AS px1, MIN(py1) AS py1
  FROM grp GROUP BY pred_id, x0, x1, g
),
areas AS (
  SELECT pred_id,
         SUM((x1 - x0) * (y1 - y0)) AS area_u,
         SUM(GREATEST(LEAST(x1, px1) - GREATEST(x0, px0), 0)
           * GREATEST(LEAST(y1, py1) - GREATEST(y0, py0), 0)) AS inter_u,
         MIN((px1 - px0) * (py1 - py0)) AS area_p
  FROM seg GROUP BY pred_id
)
SELECT p.pred_id FROM preds p
LEFT JOIN areas a ON a.pred_id = p.pred_id
WHERE a.pred_id IS NULL
   OR a.inter_u / (a.area_p + a.area_u - a.inter_u) < {C.DEDUPE_IOU_THRESHOLD!r}
"""

MERGE_COMPONENTS = f"""
WITH RECURSIVE {feet_cte()},
edges AS (
  SELECT a.feature_id AS fa, b.feature_id AS fb
  FROM feet a JOIN feet b ON a.feature_id <> b.feature_id
   AND a.minx - {C.MERGE_EPS_X!r} <= b.maxx + {C.MERGE_EPS_X!r}
   AND b.minx - {C.MERGE_EPS_X!r} <= a.maxx + {C.MERGE_EPS_X!r}
   AND a.miny - {C.MERGE_EPS_Y!r} <= b.maxy + {C.MERGE_EPS_Y!r}
   AND b.miny - {C.MERGE_EPS_Y!r} <= a.maxy + {C.MERGE_EPS_Y!r}
),
reach(n, l) AS (
  SELECT feature_id, feature_id FROM feet
  UNION
  SELECT e.fb, r.l FROM reach r JOIN edges e ON e.fa = r.n WHERE r.l < e.fb
)
SELECT n AS feature_id, MIN(l) AS component_id FROM reach GROUP BY n
"""

# A5 invariants: per component, member count + extent + exact rect-
# union area via the same x-slab + y-island scanline as DEDUPE,
# quantized to an int64 at 1e-10 so engine/DuckDB summation orders
# cannot flip a compared bit.
MERGE_UNIONS = f"""
WITH RECURSIVE {feet_cte()},
edges AS (
  SELECT a.feature_id AS fa, b.feature_id AS fb
  FROM feet a JOIN feet b ON a.feature_id <> b.feature_id
   AND a.minx - {C.MERGE_EPS_X!r} <= b.maxx + {C.MERGE_EPS_X!r}
   AND b.minx - {C.MERGE_EPS_X!r} <= a.maxx + {C.MERGE_EPS_X!r}
   AND a.miny - {C.MERGE_EPS_Y!r} <= b.maxy + {C.MERGE_EPS_Y!r}
   AND b.miny - {C.MERGE_EPS_Y!r} <= a.maxy + {C.MERGE_EPS_Y!r}
),
reach(n, l) AS (
  SELECT feature_id, feature_id FROM feet
  UNION
  SELECT e.fb, r.l FROM reach r JOIN edges e ON e.fa = r.n WHERE r.l < e.fb
),
comp AS (SELECT n AS feature_id, MIN(l) AS component_id FROM reach GROUP BY n),
m AS (
  SELECT c.component_id, f.minx, f.miny, f.maxx, f.maxy
  FROM comp c JOIN feet f ON f.feature_id = c.feature_id
),
slabs AS (
  SELECT component_id, x AS x0,
         LEAD(x) OVER (PARTITION BY component_id ORDER BY x) AS x1
  FROM (SELECT DISTINCT component_id, minx AS x FROM m
        UNION SELECT DISTINCT component_id, maxx FROM m)
),
cover AS (
  -- DISTINCT: tie-free island windows (see MERGE_RING_CELLS yint)
  SELECT DISTINCT s.component_id, s.x0, s.x1, r.miny AS y0, r.maxy AS y1
  FROM slabs s JOIN m r
    ON r.component_id = s.component_id AND r.minx <= s.x0 AND r.maxx >= s.x1
  WHERE s.x1 IS NOT NULL
),
marked AS (
  SELECT *, CASE WHEN y0 > COALESCE(MAX(y1) OVER (
           PARTITION BY component_id, x0 ORDER BY y0, y1
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), y0 - 1.0)
         THEN 1 ELSE 0 END AS brk
  FROM cover
),
grp AS (
  SELECT *, SUM(brk) OVER (PARTITION BY component_id, x0 ORDER BY y0, y1
           ROWS UNBOUNDED PRECEDING) AS g
  FROM marked
),
seg AS (
  SELECT component_id, x0, x1, g, MIN(y0) AS y0, MAX(y1) AS y1
  FROM grp GROUP BY component_id, x0, x1, g
),
areas AS (
  SELECT component_id, SUM((x1 - x0) * (y1 - y0)) AS area_u
  FROM seg GROUP BY component_id
),
agg AS (
  SELECT component_id, COUNT(*) AS n_members,
         MIN(minx) AS minx, MIN(miny) AS miny,
         MAX(maxx) AS maxx, MAX(maxy) AS maxy
  FROM m GROUP BY component_id
)
SELECT a.component_id, CAST(a.n_members AS BIGINT) AS n_members,
       a.minx, a.miny, a.maxx, a.maxy,
       CAST(ROUND(ar.area_u * 1e10) AS BIGINT) AS union_area_q
FROM agg a JOIN areas ar USING (component_id)
"""

def _snap_map_sql(vals: str, orig: str) -> str:
    """SQL mirror of geo/rectilinear._snap_vals as a (component, v) ->
    snapped-value MAP: snap each distinct value to the nearest original
    coordinate of the same component within a 1e-12 relative tolerance,
    preferring the smallest original >= v (the engine's
    searchsorted-hi-first rule). Join-based (no correlated subqueries)
    so DuckDB evaluates it once per distinct value."""
    return f"""
  SELECT r.component_id, r.v,
         COALESCE(MIN(o.o) FILTER (WHERE o.o >= r.v),
                  MAX(o.o) FILTER (WHERE o.o < r.v), r.v) AS sv
  FROM {vals} r LEFT JOIN {orig} o
    ON o.component_id = r.component_id
   AND ABS(r.v - o.o) <= 1e-12 * GREATEST(CAST(1.0 AS DOUBLE), ABS(r.v))
  GROUP BY r.component_id, r.v
"""


_TX = 2.0 * C.MERGE_EPS_X
_TY = 2.0 * C.MERGE_EPS_Y

# Hash-hard serialization of the merged ring geometry
# (stages/merge.merge_ring_cells): candidate compressed-grid cells
# (member bbox cuts, their ±2t closing offsets — snapped & clipped
# exactly like closing_grid) with each cell's membership in the
# CLOSED (dilate-then-erode) rect union, derived here from the set
# rule — a candidate cell is OUTSIDE iff some uncovered cell of the
# dilated union's grid, re-dilated by (tx, ty), contains it (erosion
# via complement, the same formulation closing_grid implements). The
# engine derives the identical rows by even-odd-testing the cells
# against its traced output rings, so a match pins the rings.
MERGE_RING_CELLS = f"""
WITH RECURSIVE {feet_cte()},
edges AS (
  SELECT a.feature_id AS fa, b.feature_id AS fb
  FROM feet a JOIN feet b ON a.feature_id <> b.feature_id
   AND a.minx - {C.MERGE_EPS_X!r} <= b.maxx + {C.MERGE_EPS_X!r}
   AND b.minx - {C.MERGE_EPS_X!r} <= a.maxx + {C.MERGE_EPS_X!r}
   AND a.miny - {C.MERGE_EPS_Y!r} <= b.maxy + {C.MERGE_EPS_Y!r}
   AND b.miny - {C.MERGE_EPS_Y!r} <= a.maxy + {C.MERGE_EPS_Y!r}
),
reach(n, l) AS (
  SELECT feature_id, feature_id FROM feet
  UNION
  SELECT e.fb, r.l FROM reach r JOIN edges e ON e.fa = r.n WHERE r.l < e.fb
),
comp AS MATERIALIZED (SELECT n AS feature_id, MIN(l) AS component_id FROM reach GROUP BY n),
m0 AS MATERIALIZED (
  SELECT c.component_id, f.minx, f.miny, f.maxx, f.maxy
  FROM comp c JOIN feet f ON f.feature_id = c.feature_id
),
-- verification-size cap (engine: MERGE_CELLS_MEMBER_CAP): the cell
-- serialization is quadratic in member count, so giant components are
-- pinned by MERGE_UNIONS/MERGE_COMPONENTS instead
m AS MATERIALIZED (
  SELECT m0.* FROM m0
  JOIN (SELECT component_id FROM m0 GROUP BY component_id
        HAVING COUNT(*) <= 256) k USING (component_id)
),
ox AS MATERIALIZED (SELECT component_id, minx AS o FROM m UNION SELECT component_id, maxx FROM m),
oy AS MATERIALIZED (SELECT component_id, miny AS o FROM m UNION SELECT component_id, maxy FROM m),
frx AS MATERIALIZED (
  SELECT component_id, MIN(minx - {_TX!r}) + {_TX!r} AS g0r,
         MAX(maxx + {_TX!r}) - {_TX!r} AS g1r
  FROM m GROUP BY component_id
),
fry AS MATERIALIZED (
  SELECT component_id, MIN(miny - {_TY!r}) + {_TY!r} AS g0r,
         MAX(maxy + {_TY!r}) - {_TY!r} AS g1r
  FROM m GROUP BY component_id
),
dxe AS MATERIALIZED (
  SELECT * FROM (
    SELECT component_id, v AS x0,
           LEAD(v) OVER (PARTITION BY component_id ORDER BY v) AS x1
    FROM (SELECT DISTINCT component_id, minx - {_TX!r} AS v FROM m
          UNION SELECT DISTINCT component_id, maxx + {_TX!r} FROM m)
  ) WHERE x1 IS NOT NULL AND x1 > x0
),
dye AS MATERIALIZED (
  SELECT * FROM (
    SELECT component_id, v AS y0,
           LEAD(v) OVER (PARTITION BY component_id ORDER BY v) AS y1
    FROM (SELECT DISTINCT component_id, miny - {_TY!r} AS v FROM m
          UNION SELECT DISTINCT component_id, maxy + {_TY!r} FROM m)
  ) WHERE y1 IS NOT NULL AND y1 > y0
),
unc AS MATERIALIZED (
  SELECT x.component_id, x.x0, x.x1, y.y0, y.y1
  FROM dxe x JOIN dye y USING (component_id)
  WHERE NOT EXISTS (
    SELECT 1 FROM m r WHERE r.component_id = x.component_id
      AND r.minx - {_TX!r} <= x.x0 AND x.x1 <= r.maxx + {_TX!r}
      AND r.miny - {_TY!r} <= y.y0 AND y.y1 <= r.maxy + {_TY!r})
),
uncr AS MATERIALIZED (
  SELECT component_id, x0 - {_TX!r} AS rx0, x1 + {_TX!r} AS rx1,
         y0 - {_TY!r} AS ry0, y1 + {_TY!r} AS ry1
  FROM unc
),
cxr AS (
  SELECT component_id, minx AS v FROM m
  UNION SELECT component_id, maxx FROM m
  UNION SELECT component_id, (minx - {_TX!r}) - {_TX!r} FROM m
  UNION SELECT component_id, (maxx + {_TX!r}) + {_TX!r} FROM m
),
cyr AS (
  SELECT component_id, miny AS v FROM m
  UNION SELECT component_id, maxy FROM m
  UNION SELECT component_id, (miny - {_TY!r}) - {_TY!r} FROM m
  UNION SELECT component_id, (maxy + {_TY!r}) + {_TY!r} FROM m
),
sxv AS MATERIALIZED (
  SELECT DISTINCT component_id, v FROM (
    SELECT component_id, v FROM cxr
    UNION ALL SELECT component_id, rx0 FROM uncr
    UNION ALL SELECT component_id, rx1 FROM uncr
    UNION ALL SELECT component_id, g0r FROM frx
    UNION ALL SELECT component_id, g1r FROM frx)
),
syv AS MATERIALIZED (
  SELECT DISTINCT component_id, v FROM (
    SELECT component_id, v FROM cyr
    UNION ALL SELECT component_id, ry0 FROM uncr
    UNION ALL SELECT component_id, ry1 FROM uncr
    UNION ALL SELECT component_id, g0r FROM fry
    UNION ALL SELECT component_id, g1r FROM fry)
),
sxm AS MATERIALIZED ({_snap_map_sql('sxv', 'ox')}),
sym AS MATERIALIZED ({_snap_map_sql('syv', 'oy')}),
fsx AS MATERIALIZED (
  SELECT f.component_id, a.sv AS g0, b.sv AS g1
  FROM frx f
  JOIN sxm a ON a.component_id = f.component_id AND a.v = f.g0r
  JOIN sxm b ON b.component_id = f.component_id AND b.v = f.g1r
),
fsy AS MATERIALIZED (
  SELECT f.component_id, a.sv AS g0, b.sv AS g1
  FROM fry f
  JOIN sym a ON a.component_id = f.component_id AND a.v = f.g0r
  JOIN sym b ON b.component_id = f.component_id AND b.v = f.g1r
),
cxe AS MATERIALIZED (
  SELECT * FROM (
    SELECT component_id, v AS x0,
           LEAD(v) OVER (PARTITION BY component_id ORDER BY v) AS x1
    FROM (SELECT DISTINCT c.component_id, GREATEST(f.g0, LEAST(f.g1, s.sv)) AS v
          FROM cxr c
          JOIN sxm s ON s.component_id = c.component_id AND s.v = c.v
          JOIN fsx f ON f.component_id = c.component_id WHERE f.g0 < f.g1)
  ) WHERE x1 IS NOT NULL AND x1 > x0
),
cye AS MATERIALIZED (
  SELECT * FROM (
    SELECT component_id, v AS y0,
           LEAD(v) OVER (PARTITION BY component_id ORDER BY v) AS y1
    FROM (SELECT DISTINCT c.component_id, GREATEST(f.g0, LEAST(f.g1, s.sv)) AS v
          FROM cyr c
          JOIN sym s ON s.component_id = c.component_id AND s.v = c.v
          JOIN fsy f ON f.component_id = c.component_id WHERE f.g0 < f.g1)
  ) WHERE y1 IS NOT NULL AND y1 > y0
),
uncs AS MATERIALIZED (
  SELECT t.component_id,
         GREATEST(fx.g0, LEAST(fx.g1, a.sv)) AS sx0,
         GREATEST(fx.g0, LEAST(fx.g1, b.sv)) AS sx1,
         GREATEST(fy.g0, LEAST(fy.g1, c2.sv)) AS sy0,
         GREATEST(fy.g0, LEAST(fy.g1, d2.sv)) AS sy1
  FROM uncr t
  JOIN sxm a ON a.component_id = t.component_id AND a.v = t.rx0
  JOIN sxm b ON b.component_id = t.component_id AND b.v = t.rx1
  JOIN sym c2 ON c2.component_id = t.component_id AND c2.v = t.ry0
  JOIN sym d2 ON d2.component_id = t.component_id AND d2.v = t.ry1
  JOIN fsx fx ON fx.component_id = t.component_id
  JOIN fsy fy ON fy.component_id = t.component_id
),
-- island-merge the removal rects in x within each (sy0, sy1) band:
-- endpoints lie on candidate cuts, so touching/overlapping intervals
-- union losslessly at cell granularity (MERGE_UNIONS scanline shape)
ub1 AS (
  SELECT *, CASE WHEN sx0 > COALESCE(MAX(sx1) OVER (
       PARTITION BY component_id, sy0, sy1 ORDER BY sx0, sx1
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), sx0 - 1.0)
     THEN 1 ELSE 0 END AS brk
  FROM (SELECT DISTINCT component_id, sy0, sy1, sx0, sx1 FROM uncs)
),
ub2 AS (
  SELECT *, SUM(brk) OVER (PARTITION BY component_id, sy0, sy1
       ORDER BY sx0, sx1 ROWS UNBOUNDED PRECEDING) AS g
  FROM ub1
),
uncb AS MATERIALIZED (
  SELECT component_id, sy0, sy1, MIN(sx0) AS sx0, MAX(sx1) AS sx1
  FROM ub2 GROUP BY component_id, sy0, sy1, g
),
-- per candidate y-cell: overlapping removal intervals, island-merged
yint AS (
  -- DISTINCT: duplicate intervals would tie on the island windows'
  -- ORDER BY, and brk/SUM are two separate window evaluations whose
  -- tie orders the engine may pick independently (observed
  -- nondeterminism under memory pressure); deduping makes the order
  -- keys strictly increasing, hence tie-free and deterministic
  SELECT DISTINCT y.component_id, y.y0, y.y1, u.sx0, u.sx1
  FROM cye y JOIN uncb u
    ON u.component_id = y.component_id AND u.sy0 <= y.y0 AND y.y1 <= u.sy1
),
yi1 AS (
  SELECT *, CASE WHEN sx0 > COALESCE(MAX(sx1) OVER (
       PARTITION BY component_id, y0 ORDER BY sx0, sx1
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), sx0 - 1.0)
     THEN 1 ELSE 0 END AS brk
  FROM yint
),
yi2 AS (
  SELECT *, SUM(brk) OVER (PARTITION BY component_id, y0
       ORDER BY sx0, sx1 ROWS UNBOUNDED PRECEDING) AS g
  FROM yi1
),
yisl AS MATERIALIZED (
  SELECT component_id, y0, MIN(sx0) AS ix0, MAX(sx1) AS ix1
  FROM yi2 GROUP BY component_id, y0, g
),
cells AS (
  SELECT x.component_id, x.x0, x.x1, y.y0, y.y1
  FROM cxe x JOIN cye y USING (component_id)
)
SELECT c.component_id,
  CAST(floor(c.x0 * 1e10 + 0.5) AS BIGINT) AS x0q,
  CAST(floor(c.y0 * 1e10 + 0.5) AS BIGINT) AS y0q,
  CAST(floor(c.x1 * 1e10 + 0.5) AS BIGINT) AS x1q,
  CAST(floor(c.y1 * 1e10 + 0.5) AS BIGINT) AS y1q,
  CAST(CASE WHEN EXISTS (
    SELECT 1 FROM yisl i WHERE i.component_id = c.component_id
      AND i.y0 = c.y0 AND i.ix0 <= c.x0 AND c.x1 <= i.ix1)
  THEN 0 ELSE 1 END AS BIGINT) AS inside
FROM cells c
"""

_RS = 64  # oracle rasterization size (pixel grid per tile)

# Featurize invariants, per 8-connected mask component: pixel count
# (the corner-polygon shoelace == pixel count) and world bbox
# (west + I0*fx ... exactly the engine's px->world affine). Components
# are computed over per-rect pixel SPANS (a rect's covered pixels form
# a solid box) with an 8-connectivity touch relation + recursive
# min-label CTE — equivalent to pixel-level CC of the union.
_FEATURIZE_PREFIX = """
WITH RECURSIVE {feet},
cov AS (
  SELECT f.*, {tx_minx} + gx.i AS tx, {ty_miny} + gy.j AS ty
  FROM feet f
  CROSS JOIN generate_series(0, 8) gx(i)
  CROSS JOIN generate_series(0, 8) gy(j)
  WHERE gx.i <= {tx_maxx} - {tx_minx}
    AND gy.j <= {ty_maxy} - {ty_miny}
),
pxf AS (
  SELECT c.tx, c.ty, c.feature_id, gi.i, gj.j
  FROM cov c
  CROSS JOIN generate_series(0, {rs1}) gi(i)
  CROSS JOIN generate_series(0, {rs1}) gj(j)
  WHERE (c.tx + (gi.i + 0.5) / {rsf}) / {nf} * 360.0 - 180.0 >= c.minx
    AND (c.tx + (gi.i + 0.5) / {rsf}) / {nf} * 360.0 - 180.0 < c.maxx
    AND (c.ty + (gj.j + 0.5) / {rsf}) / {nf} >= c.miny
    AND (c.ty + (gj.j + 0.5) / {rsf}) / {nf} < c.maxy
),
spans AS (
  SELECT tx, ty, feature_id, MIN(i) AS i0, MAX(i) AS i1,
         MIN(j) AS j0, MAX(j) AS j1
  FROM pxf GROUP BY tx, ty, feature_id
),
edges AS (
  SELECT a.tx, a.ty, a.feature_id AS fa, b.feature_id AS fb
  FROM spans a JOIN spans b
    ON a.tx = b.tx AND a.ty = b.ty AND a.feature_id <> b.feature_id
   AND b.i0 <= a.i1 + 1 AND a.i0 <= b.i1 + 1
   AND b.j0 <= a.j1 + 1 AND a.j0 <= b.j1 + 1
),
reach(tx, ty, n, l) AS (
  SELECT tx, ty, feature_id, feature_id FROM spans
  UNION
  SELECT e.tx, e.ty, e.fb, r.l
  FROM reach r JOIN edges e ON e.tx = r.tx AND e.ty = r.ty AND e.fa = r.n
  WHERE r.l < e.fb
),
comp AS (
  SELECT tx, ty, n AS feature_id, MIN(l) AS cid
  FROM reach GROUP BY tx, ty, n
),
cpx AS (
  SELECT DISTINCT p.tx, p.ty, c.cid, p.i, p.j
  FROM pxf p JOIN comp c
    ON c.tx = p.tx AND c.ty = p.ty AND c.feature_id = p.feature_id
)"""

FEATURIZE_STATS_TEMPLATE = _FEATURIZE_PREFIX + """,
stats AS (
  SELECT tx, ty, cid, COUNT(*) AS area_px,
         MIN(i) AS i0, MAX(i) AS i1, MIN(j) AS j0, MAX(j) AS j1
  FROM cpx GROUP BY tx, ty, cid
)
SELECT tx AS tile_x, ty AS tile_y, CAST(area_px AS BIGINT) AS area_px,
  (tx / {nf} * 360.0 - 180.0)
    + i0 * ((((tx + 1) / {nf} * 360.0 - 180.0) - (tx / {nf} * 360.0 - 180.0)) / {rsf}) AS minx,
  (ty / {nf}) + j0 * ((((ty + 1) / {nf}) - (ty / {nf})) / {rsf}) AS miny,
  (tx / {nf} * 360.0 - 180.0)
    + (i1 + 1) * ((((tx + 1) / {nf} * 360.0 - 180.0) - (tx / {nf} * 360.0 - 180.0)) / {rsf}) AS maxx,
  (ty / {nf}) + (j1 + 1) * ((((ty + 1) / {nf}) - (ty / {nf})) / {rsf}) AS maxy
FROM stats
"""

# Ring-geometry check up to second-order pixel moments: the engine
# round-trips its OUTPUT rings (world coords) through the inverse
# affine and an even-odd fill, then takes integer moments of the
# filled pixel set per component; the oracle takes the same moments
# over the recursive-CTE component pixels. Matching all six moments
# pins shape (incl. holes), position and spread — not just bbox/area.
FEATURIZE_MOMENTS_TEMPLATE = _FEATURIZE_PREFIX + """
SELECT tx AS tile_x, ty AS tile_y,
  CAST(COUNT(*) AS BIGINT) AS n_px,
  CAST(SUM(i) AS BIGINT) AS si, CAST(SUM(j) AS BIGINT) AS sj,
  CAST(SUM(i * i) AS BIGINT) AS sii, CAST(SUM(j * j) AS BIGINT) AS sjj,
  CAST(SUM(i * j) AS BIGINT) AS sij
FROM cpx GROUP BY tx, ty, cid
"""

# Prediction pipeline (halo -> box-conv scorers k=3,5 -> sigmoid ->
# quantize -> softvote average -> threshold) reduced to exact SQL:
# every pred pixel is a function of the two integer window counts
# (c3, c5) over the GLOBAL set-pixel grid (halo stitching zero-fills
# absent tiles, edge-pad never reaches the core), so a 260-row lookup
# table of quantization buckets reproduces the float chain bit-for-bit
# (all combos verified >= 4.5e-5 from every anchor boundary; the
# avg>=0.5 compare uses the identical IEEE expression both sides).
_SEG_PREFIX = """
WITH {feet},
cov AS (
  SELECT f.*, {tx_minx} + gx.i AS tx, {ty_miny} + gy.j AS ty
  FROM feet f
  CROSS JOIN generate_series(0, 8) gx(i)
  CROSS JOIN generate_series(0, 8) gy(j)
  WHERE gx.i <= {tx_maxx} - {tx_minx}
    AND gy.j <= {ty_maxy} - {ty_miny}
),
tiles AS (SELECT DISTINCT tx, ty FROM cov),
px AS (
  SELECT DISTINCT c.tx * {rs} + gi.i AS gx, c.ty * {rs} + gj.j AS gy
  FROM cov c
  CROSS JOIN generate_series(0, {rs1}) gi(i)
  CROSS JOIN generate_series(0, {rs1}) gj(j)
  WHERE (c.tx + (gi.i + 0.5) / {rsf}) / {nf} * 360.0 - 180.0 >= c.minx
    AND (c.tx + (gi.i + 0.5) / {rsf}) / {nf} * 360.0 - 180.0 < c.maxx
    AND (c.ty + (gj.j + 0.5) / {rsf}) / {nf} >= c.miny
    AND (c.ty + (gj.j + 0.5) / {rsf}) / {nf} < c.maxy
),
offs AS (
  SELECT dx.v AS dx, dy.v AS dy
  FROM generate_series(-2, 2) dx(v) CROSS JOIN generate_series(-2, 2) dy(v)
),
contrib AS (
  SELECT p.gx + o.dx AS gx, p.gy + o.dy AS gy,
         CASE WHEN ABS(o.dx) <= 1 AND ABS(o.dy) <= 1 THEN 1 ELSE 0 END AS in3
  FROM px p CROSS JOIN offs o
),
cnts AS (
  SELECT c.gx, c.gy, SUM(c.in3) AS c3, COUNT(*) AS c5
  FROM contrib c
  JOIN tiles t ON t.tx = c.gx // {rs} AND t.ty = c.gy // {rs}
  GROUP BY c.gx, c.gy
),
anchors AS (
  SELECT i, CASE WHEN i = 255 THEN CAST(1.0 AS DOUBLE)
                 ELSE i * (CAST(1.0 AS DOUBLE) / CAST(255.0 AS DOUBLE)) END AS a
  FROM generate_series(0, 255) t(i)
),
lut AS (
  SELECT v3.v AS c3, v5.v AS c5,
    (SELECT COUNT(*) - 1 FROM anchors
      WHERE a <= CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        + exp(CAST(-6.0 AS DOUBLE) * (v3.v / CAST(9.0 AS DOUBLE) - CAST(0.5 AS DOUBLE))))) AS b3,
    (SELECT COUNT(*) - 1 FROM anchors
      WHERE a <= CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        + exp(CAST(-6.0 AS DOUBLE) * (v5.v / CAST(25.0 AS DOUBLE) - CAST(0.5 AS DOUBLE))))) AS b5
  FROM generate_series(0, 9) v3(v) CROSS JOIN generate_series(0, 25) v5(v)
)"""

SEGMENTATION_METRICS_TEMPLATE = _SEG_PREFIX + """,
vals AS (
  SELECT (s.gx IS NOT NULL) AS label,
         (l.b3 * (CAST(1.0 AS DOUBLE) / CAST(255.0 AS DOUBLE))
          + l.b5 * (CAST(1.0 AS DOUBLE) / CAST(255.0 AS DOUBLE)))
         / CAST(2.0 AS DOUBLE) >= CAST(0.5 AS DOUBLE) AS pred
  FROM cnts c
  JOIN lut l ON l.c3 = c.c3 AND l.c5 = c.c5
  LEFT JOIN px s ON s.gx = c.gx AND s.gy = c.gy
),
conf AS (
  SELECT
    CAST(SUM(CASE WHEN label AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN NOT label AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN label AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN NOT label AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn_in,
    CAST(COUNT(*) AS BIGINT) AS n_cand
  FROM vals
),
final AS (
  SELECT tp, fp, fn,
         (SELECT COUNT(*) FROM tiles) * {rs} * {rs} - n_cand + tn_in AS tn
  FROM conf
)
SELECT tn, fp, fn, tp,
  CASE WHEN tp + fp + fn > 0
       THEN CAST(tp AS DOUBLE) / CAST(tp + fp + fn AS DOUBLE) ELSE 0.0 END AS iou_fg,
  CASE WHEN tn + fp + fn > 0
       THEN CAST(tn AS DOUBLE) / CAST(tn + fp + fn AS DOUBLE) ELSE 0.0 END AS iou_bg,
  (CASE WHEN tp + fp + fn > 0
        THEN CAST(tp AS DOUBLE) / CAST(tp + fp + fn AS DOUBLE) ELSE 0.0 END
   + CASE WHEN tn + fp + fn > 0
          THEN CAST(tn AS DOUBLE) / CAST(tn + fp + fn AS DOUBLE) ELSE 0.0 END) / 2.0 AS miou,
  CASE WHEN sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                 * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) > 0
       THEN CAST(tp * tn - fp * fn AS DOUBLE)
            / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                   * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))
       ELSE 0.0 END AS mcc
FROM final
"""

# A7 epoch loss: global mean binary cross-entropy of the softvote
# probability vs the label — same CTE core; the LUT supplies the
# probability per (c3, c5) combo, pixels aggregate to combo counts
# before any float math (matching the engine's algebraic shape).
EPOCH_LOSS_TEMPLATE = _SEG_PREFIX + """,
combos AS (
  SELECT l.b3 AS q0, l.b5 AS q1,
         CASE WHEN s.gx IS NOT NULL THEN 1 ELSE 0 END AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cnts c
  JOIN lut l ON l.c3 = c.c3 AND l.c5 = c.c5
  LEFT JOIN px s ON s.gx = c.gx AND s.gy = c.gy
  GROUP BY 1, 2, 3
),
zero AS (
  SELECT l.b3 AS q0, l.b5 AS q1, 0 AS y,
         (SELECT COUNT(*) FROM tiles) * {rs} * {rs}
           - (SELECT SUM(n) FROM combos) AS n
  FROM lut l WHERE l.c3 = 0 AND l.c5 = 0
),
allc AS (SELECT * FROM combos UNION ALL SELECT * FROM zero),
lossed AS (
  SELECT y, n,
    CASE WHEN y = 1
         THEN -ln((a0.a + a1.a) / CAST(2.0 AS DOUBLE))
         ELSE -ln(CAST(1.0 AS DOUBLE) - (a0.a + a1.a) / CAST(2.0 AS DOUBLE)) END AS lossv
  FROM allc
  JOIN anchors a0 ON a0.i = allc.q0
  JOIN anchors a1 ON a1.i = allc.q1
)
SELECT CAST(SUM(n) AS BIGINT) AS n_pixels,
       CAST(SUM(n) FILTER (WHERE y = 1) AS BIGINT) AS n_fg,
       ROUND(SUM(n * lossv) / CAST(SUM(n) AS DOUBLE), 8) AS loss_mean
FROM lossed
"""

SEGMENTATION_METRICS = SEGMENTATION_METRICS_TEMPLATE.format(
    feet=feet_cte(),
    tx_minx=tile_x("f.minx"),
    ty_miny=tile_y("f.miny"),
    tx_maxx=tile_x("f.maxx"),
    ty_maxy=tile_y("f.maxy"),
    rs=_RS,
    rs1=_RS - 1,
    rsf=repr(float(_RS)),
    nf=repr(_N),
)

EPOCH_LOSS = EPOCH_LOSS_TEMPLATE.format(
    feet=feet_cte(),
    tx_minx=tile_x("f.minx"),
    ty_miny=tile_y("f.miny"),
    tx_maxx=tile_x("f.maxx"),
    ty_maxy=tile_y("f.maxy"),
    rs=_RS,
    rs1=_RS - 1,
    rsf=repr(float(_RS)),
    nf=repr(_N),
)

FEATURIZE_STATS = FEATURIZE_STATS_TEMPLATE.format(
    feet=feet_cte(),
    tx_minx=tile_x("f.minx"),
    ty_miny=tile_y("f.miny"),
    tx_maxx=tile_x("f.maxx"),
    ty_maxy=tile_y("f.maxy"),
    rs1=_RS - 1,
    rsf=repr(float(_RS)),
    nf=repr(_N),
)

# Canonical boundary-edge serialization of the featurize ring
# geometry: a unit edge of the pixel grid is a boundary edge of a
# component iff its in-component side pixel has an out-of-component
# 4-neighbor across it. The engine decomposes its OUTPUT rings into
# the same canonical rows (stages/featurize.py:_edges_batch), so the
# sorted value-hash pins the full geometry. ckey = the component's
# lexicographically-(y,x)-smallest boundary corner (y*1024 + x) —
# unique per component (two 8-connected components can never share a
# corner) and always the first endpoint of some canonical edge.
FEATURIZE_EDGES_TEMPLATE = _FEATURIZE_PREFIX + """,
dirs(dx, dy) AS (VALUES (0, -1), (0, 1), (-1, 0), (1, 0)),
bed AS (
  SELECT c.tx, c.ty, c.cid,
         c.i + (CASE WHEN d.dx = 1 THEN 1 ELSE 0 END) AS x0,
         c.j + (CASE WHEN d.dy = 1 THEN 1 ELSE 0 END) AS y0,
         c.i + (CASE WHEN d.dx = 1 THEN 1 ELSE 0 END)
             + (CASE WHEN d.dy <> 0 THEN 1 ELSE 0 END) AS x1,
         c.j + (CASE WHEN d.dy = 1 THEN 1 ELSE 0 END)
             + (CASE WHEN d.dx <> 0 THEN 1 ELSE 0 END) AS y1
  FROM cpx c JOIN dirs d ON TRUE
  WHERE NOT EXISTS (
    SELECT 1 FROM cpx nb
    WHERE nb.tx = c.tx AND nb.ty = c.ty AND nb.cid = c.cid
      AND nb.i = c.i + d.dx AND nb.j = c.j + d.dy)
),
ck AS (
  SELECT tx, ty, cid, MIN(y0 * 1024 + x0) AS ckey
  FROM bed GROUP BY tx, ty, cid
)
SELECT e.tx AS tile_x, e.ty AS tile_y, k.ckey,
       CAST(e.x0 AS BIGINT) AS x0, CAST(e.y0 AS BIGINT) AS y0,
       CAST(e.x1 AS BIGINT) AS x1, CAST(e.y1 AS BIGINT) AS y1
FROM bed e JOIN ck k ON k.tx = e.tx AND k.ty = e.ty AND k.cid = e.cid
"""

FEATURIZE_MOMENTS = FEATURIZE_MOMENTS_TEMPLATE.format(
    feet=feet_cte(),
    tx_minx=tile_x("f.minx"),
    ty_miny=tile_y("f.miny"),
    tx_maxx=tile_x("f.maxx"),
    ty_maxy=tile_y("f.maxy"),
    rs1=_RS - 1,
    rsf=repr(float(_RS)),
    nf=repr(_N),
)

FEATURIZE_EDGES = FEATURIZE_EDGES_TEMPLATE.format(
    feet=feet_cte(),
    tx_minx=tile_x("f.minx"),
    ty_miny=tile_y("f.miny"),
    tx_maxx=tile_x("f.maxx"),
    ty_maxy=tile_y("f.maxy"),
    rs1=_RS - 1,
    rsf=repr(float(_RS)),
    nf=repr(_N),
)

RASTERIZE_FG = f"""
WITH {feet_cte()},
cov AS (
  SELECT f.*, {tile_x('f.minx')} + gx.i AS tx, {tile_y('f.miny')} + gy.j AS ty
  FROM feet f
  CROSS JOIN generate_series(0, 8) gx(i)
  CROSS JOIN generate_series(0, 8) gy(j)
  WHERE gx.i <= {tile_x('f.maxx')} - {tile_x('f.minx')}
    AND gy.j <= {tile_y('f.maxy')} - {tile_y('f.miny')}
),
tiles AS (SELECT DISTINCT tx, ty FROM cov),
px AS (
  SELECT DISTINCT c.tx, c.ty, gi.i, gj.j
  FROM cov c
  CROSS JOIN generate_series(0, {_RS - 1}) gi(i)
  CROSS JOIN generate_series(0, {_RS - 1}) gj(j)
  WHERE (c.tx + (gi.i + 0.5) / {float(_RS)!r}) / {_N!r} * 360.0 - 180.0 >= c.minx
    AND (c.tx + (gi.i + 0.5) / {float(_RS)!r}) / {_N!r} * 360.0 - 180.0 < c.maxx
    AND (c.ty + (gj.j + 0.5) / {float(_RS)!r}) / {_N!r} >= c.miny
    AND (c.ty + (gj.j + 0.5) / {float(_RS)!r}) / {_N!r} < c.maxy
)
SELECT t.tx AS tile_x, t.ty AS tile_y, COALESCE(p.cnt, 0) AS fg
FROM tiles t LEFT JOIN (
  SELECT tx, ty, COUNT(*) AS cnt FROM px GROUP BY tx, ty
) p ON p.tx = t.tx AND p.ty = t.ty
"""

# mask_png: the rasterize masks ROUND-TRIPPED through the reference's
# paletted-PNG layout (tools/masks.py:62-69 — mode-P file, denim/orange
# palette); the engine recomputes fg and a positional pixel checksum
# from the DECODED class indices, so the oracle (which derives the same
# two numbers straight from the pixel-center rule) gates the whole
# encode->decode container path bit-exactly.
MASK_PNG = f"""
WITH {feet_cte()},
cov AS (
  SELECT f.*, {tile_x('f.minx')} + gx.i AS tx, {tile_y('f.miny')} + gy.j AS ty
  FROM feet f
  CROSS JOIN generate_series(0, 8) gx(i)
  CROSS JOIN generate_series(0, 8) gy(j)
  WHERE gx.i <= {tile_x('f.maxx')} - {tile_x('f.minx')}
    AND gy.j <= {tile_y('f.maxy')} - {tile_y('f.miny')}
),
tiles AS (SELECT DISTINCT tx, ty FROM cov),
px AS (
  SELECT DISTINCT c.tx, c.ty, gi.i, gj.j
  FROM cov c
  CROSS JOIN generate_series(0, {_RS - 1}) gi(i)
  CROSS JOIN generate_series(0, {_RS - 1}) gj(j)
  WHERE (c.tx + (gi.i + 0.5) / {float(_RS)!r}) / {_N!r} * 360.0 - 180.0 >= c.minx
    AND (c.tx + (gi.i + 0.5) / {float(_RS)!r}) / {_N!r} * 360.0 - 180.0 < c.maxx
    AND (c.ty + (gj.j + 0.5) / {float(_RS)!r}) / {_N!r} >= c.miny
    AND (c.ty + (gj.j + 0.5) / {float(_RS)!r}) / {_N!r} < c.maxy
)
SELECT t.tx AS tile_x, t.ty AS tile_y,
       CAST(COALESCE(p.cnt, 0) AS BIGINT) AS fg,
       CAST(COALESCE(p.ps, 0) AS BIGINT) AS pixsum
FROM tiles t LEFT JOIN (
  SELECT tx, ty, COUNT(*) AS cnt, SUM(j * {_RS} + i) AS ps
  FROM px GROUP BY tx, ty
) p ON p.tx = t.tx AND p.ty = t.ty
"""

# mvt_tiles: footprints -> per-tile REAL Mapbox Vector Tile bytes
# (codecs/mvt.py) -> stats recomputed from the DECODED geometry/tags.
# The oracle derives the same numbers straight from the source table's
# tile-local quantized corners (qx/qy op order mirrored bit-for-bit),
# so a match gates the whole MVT encode->decode container path.
MVT_TILES = f"""
WITH {{feet}},
cov AS (
  SELECT f.*, {{tx_minx}} + gx.i AS tx, {{ty_miny}} + gy.j AS ty
  FROM feet f
  CROSS JOIN generate_series(0, 8) gx(i)
  CROSS JOIN generate_series(0, 8) gy(j)
  WHERE gx.i <= {{tx_maxx}} - {{tx_minx}}
    AND gy.j <= {{ty_maxy}} - {{ty_miny}}
),
corners AS (
  SELECT c.tx, c.ty, c.feature_id, c.kind,
         CASE k.k WHEN 0 THEN c.minx WHEN 1 THEN c.maxx WHEN 2 THEN c.maxx ELSE c.minx END AS x,
         CASE k.k WHEN 0 THEN c.miny WHEN 1 THEN c.miny WHEN 2 THEN c.maxy ELSE c.maxy END AS y
  FROM cov c CROSS JOIN generate_series(0, 3) k(k)
),
q AS (
  SELECT tx, ty, feature_id, kind,
         CAST(FLOOR(((x + 180.0) / 360.0 * {_N!r} - tx) * 4096.0 + 0.5) AS BIGINT) AS qx,
         CAST(FLOOR((y * {_N!r} - ty) * 4096.0 + 0.5) AS BIGINT) AS qy
  FROM corners
)
SELECT tx AS tile_x, ty AS tile_y,
       CAST(COUNT(DISTINCT feature_id) AS BIGINT) AS n_features,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(qx * 8191 + qy) AS BIGINT) AS vsum,
       CAST(SUM(feature_id) // 4 AS BIGINT) AS id_sum,
       CAST(COUNT(DISTINCT CASE WHEN kind = 'building' THEN feature_id END) AS BIGINT) AS n_building
FROM q GROUP BY tx, ty
""".format(
    feet=feet_cte(),
    tx_minx=tile_x("f.minx"),
    tx_maxx=tile_x("f.maxx"),
    ty_miny=tile_y("f.miny"),
    ty_maxy=tile_y("f.maxy"),
)

# pbf_extract: the synthesized footprints that survive the reference's
# building/parking way predicates (osm/building.py:30-37,
# osm/parking.py:25-30 — the synth corpus carries no filtered
# subtypes), on the exact 1e-7-degree grid the PBF container stores.
PBF_EXTRACT = f"""
WITH {feet_cte()}
SELECT feature_id, kind,
       CAST(FLOOR(minx * 1e7 + 0.5) AS BIGINT) AS minx_d7,
       CAST(FLOOR(miny * 1e7 + 0.5) AS BIGINT) AS miny_d7,
       CAST(FLOOR(maxx * 1e7 + 0.5) AS BIGINT) AS maxx_d7,
       CAST(FLOOR(maxy * 1e7 + 0.5) AS BIGINT) AS maxy_d7
FROM feet WHERE kind IN ('building', 'parking')
"""

CLASS_WEIGHTS = f"""
WITH fgq AS ({RASTERIZE_FG}),
totals AS (
  SELECT SUM(fg) AS c1, SUM({_RS * _RS} - fg) AS c0 FROM fgq
)
SELECT CAST(0 AS BIGINT) AS class_idx, CAST(c0 AS BIGINT) AS pixel_count,
       CAST(FLOOR(1000000.0 / ln(1.02 + CAST(c0 AS DOUBLE) / (c0 + c1)) + 0.5) AS BIGINT) AS weight_micro FROM totals
UNION ALL
SELECT 1, CAST(c1 AS BIGINT), CAST(FLOOR(1000000.0 / ln(1.02 + CAST(c1 AS DOUBLE) / (c0 + c1)) + 0.5) AS BIGINT) FROM totals
"""

# reference tools/compare.py:44-49: keep tiles whose foreground share
# is inside a range (engine filters on the rasterize fg column)
COMPARE_FILTER = f"""
WITH fgq AS ({RASTERIZE_FG})
SELECT tile_x, tile_y, fg FROM fgq
WHERE fg > 0 AND fg <= {_RS * _RS} * 0.25
"""

# reference tools/subset.py:26-30: keep tiles whose id is in a side
# set — here: tiles covered by at least one 'building' footprint
SUBSET = f"""
WITH fgq AS ({RASTERIZE_FG}),
{feet_cte()},
bt AS (
  SELECT DISTINCT {tile_x('f.minx')} + gx.i AS tile_x,
                  {tile_y('f.miny')} + gy.j AS tile_y
  FROM feet f
  CROSS JOIN generate_series(0, 8) gx(i)
  CROSS JOIN generate_series(0, 8) gy(j)
  WHERE f.kind = 'building'
    AND gx.i <= {tile_x('f.maxx')} - {tile_x('f.minx')}
    AND gy.j <= {tile_y('f.maxy')} - {tile_y('f.miny')}
)
SELECT q.tile_x, q.tile_y, q.fg FROM fgq q
JOIN bt ON bt.tile_x = q.tile_x AND bt.tile_y = q.tile_y
"""


# Case/whitespace-normalized exact dedup: identical normalization
# chain both sides (lower -> collapse \s+ runs -> trim spaces -> md5).
NORMALIZED_DEDUP = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS norm_hash,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents
GROUP BY 1
"""

EXACT_DEDUP = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""

# float sums rounded to 6 decimals on BOTH sides: summation order
# differs between Ray partial aggregation and DuckDB
EVENTS_WINDOW = """
SELECT user_id, epoch_us(ts) // 3600000000 AS window_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""

# TPC-H-Q3-style multi-join aggregate; revenue quantized to integer
# cents per row (FLOOR(x*100 + 0.5), identical IEEE expression to the
# engine's np.floor) so the SUM is an exact int64 — no float-order
# parity concern across partial aggregation.
ORDER_REVENUE = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n.n_name
"""

# ROLLUP(day, event_type) with sentinel keys (-1 / '(all)') instead
# of NULLs so the hash compare is representation-independent; the
# synthetic events carry no natural NULLs for either key.
EVENTS_ROLLUP = """
WITH base AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT COALESCE(day, -1) AS day,
       COALESCE(event_type, '(all)') AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM base GROUP BY ROLLUP(day, event_type)
"""

# Per-column profiling stats, micro-quantized so min/max/sum/mean are
# int64-exact (mirrors stages/profile.py:table_stats).
_STATS_COL = """
SELECT '{c}' AS "column",
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null,
       CAST(MIN(CAST(FLOOR({c} * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS min_micro,
       CAST(MAX(CAST(FLOOR({c} * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS max_micro,
       CAST(SUM(CAST(FLOOR({c} * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(SUM(CAST(FLOOR({c} * 1000000.0 + 0.5) AS BIGINT))
            // GREATEST(COUNT({c}), 1) AS BIGINT) AS mean_micro
FROM lineitem
"""
TABLE_STATS = " UNION ALL ".join(
    _STATS_COL.format(c=c)
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
)

# Semi-join with a Bloom runtime filter in the engine; Bloom has no
# false negatives and the copartition verify is exact, so the result
# IS the plain semi-join.
RECENT_LINEITEMS = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate < TIMESTAMP '1998-01-01')
GROUP BY l_returnflag
"""

EVENTS_CUBE = """
WITH base AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT COALESCE(day, -1) AS day,
       COALESCE(event_type, '(all)') AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM base GROUP BY CUBE(day, event_type)
"""

# TPC-H-Q5 shape: local-supplier revenue per nation in one region;
# the c_nationkey = s_nationkey predicate is the cross-side filter
# the engine applies after its two broadcast joins.
LOCAL_SUPPLIER_REVENUE = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""

# Exact quantiles, integer arithmetic only (mirrors stages/quantiles:
# q-quantile = smallest value whose running count reaches
# ceil(q*total/100) = (q*total + 99) // 100)
PRICE_QUANTILES = """
WITH v AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents
  FROM lineitem
),
c AS (
  SELECT l_returnflag, price_cents, COUNT(*) AS n FROM v GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, price_cents,
         SUM(n) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                      ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER (PARTITION BY l_returnflag) AS total
  FROM c
)
SELECT l_returnflag, q.q AS q_pct, MIN(price_cents) AS value
FROM cum, (SELECT UNNEST([25, 50, 75, 95]) AS q) q
WHERE cum_n >= (q.q * total + 99) // 100
GROUP BY l_returnflag, q.q
"""

# Pivot-as-aggregate: per-user event-type counts + purchase cents
EVENTS_PIVOT = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(COALESCE(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
            FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchase_cents
FROM events GROUP BY user_id
"""

# As-of attribution join: DuckDB native ASOF LEFT JOIN; right side
# deduped per (user, ts) to max event_id so tie resolution is
# deterministic on both sides. match_value rounded to 6 dp on both
# sides (single copied value — rounding is parity insurance only).
EVENTS_ASOF = """
WITH p AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
         MAX(event_id) AS veid,
         CAST(floor(MAX_BY(value, event_id) * 1e6 + 0.5) AS BIGINT) AS vval
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, p.tsu AS ts_us,
       COALESCE(v.veid, -1) AS match_event_id,
       COALESCE(v.vval, CAST(0 AS BIGINT)) AS match_value_micro,
       COALESCE(p.tsu - v.tsu, -1) AS lag_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.tsu >= v.tsu
"""

# Sliding-interval range join; values quantized per row to int64
# micro-units with the identical IEEE expression the engine uses, so
# the window sums are exact integers on both sides (no
# summation-order or rounding-mode parity hazard)
EVENTS_RANGE_JOIN = f"""
WITH p AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vmicro
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       CAST(COUNT(c.tsu) AS BIGINT) AS n_prior,
       CAST(COALESCE(SUM(c.vmicro), 0) AS BIGINT) AS sum_prior_micro
FROM p LEFT JOIN c ON p.user_id = c.user_id
   AND c.tsu >= p.tsu - {3_600_000_000}
   AND c.tsu < p.tsu
GROUP BY 1, 2
"""

# Gap-based sessionization: all-integer (no float parity concerns);
# islands via LAG + running SUM of breaks, same (ts, event_id) order
# as the engine's sorted-bucket kernel.
EVENTS_SESSIONS = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts FROM events
),
marked AS (
  SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= {30 * 60 * 1_000_000}
            THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS s
  FROM marked
)
SELECT user_id, CAST(MIN(ts) AS BIGINT) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(ts) - MIN(ts) AS BIGINT) AS duration_us
FROM sid GROUP BY user_id, s
"""

# Deterministic hash sampling: bounded-operand hash so HUGEINT SQL
# and numpy uint64 agree at any key magnitude.
SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang FROM documents
WHERE ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761 + 7) % 4294967296)
      < {int(0.2 * 4294967296)}
"""

# Quality-weighted deterministic sampling: P(keep) == alpha ratio,
# realized as integer threshold (n_alpha * 2^32 // n_chars) vs the
# stable key hash. Mirrors stages/sampling.py:weighted_sample.
SAMPLE_WEIGHTED = """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha
  FROM documents
)
SELECT doc_id, n_chars, n_alpha
FROM q
WHERE ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761 + 7) % 4294967296)
      < (n_alpha * 4294967296) // GREATEST(n_chars, 1)
"""

TOP_DOCS_PER_LANG = """
SELECT lang, doc_id, n_chars, rank FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
) WHERE rank <= 5
"""

EVENTS_RUNNING = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER w, 6) AS running_value,
       ROW_NUMBER() OVER w AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

TOP_TILES = f"""
WITH {points_cte()}
SELECT tile_x, tile_y, n FROM (
  SELECT {tile_x('lon')} AS tile_x, {tile_y('my')} AS tile_y, COUNT(*) AS n
  FROM pts GROUP BY 1, 2
) ORDER BY n DESC, tile_x, tile_y LIMIT 10
"""

TOKEN_COUNT = """
SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
       length(text) AS n_chars
FROM documents
"""

# Manber mod-p rolling-hash fingerprints; powers of B precomputed mod
# M so every SQL term stays far inside int64 (max codepoint * 2^31 * k)
def _fp_sql() -> str:
    from robosat_ray.stages.text_ops import FP_B, FP_K, FP_M, FP_P

    pows = "[" + ", ".join(str(pow(FP_B, FP_K - 1 - j, FP_M)) for j in range(FP_K)) + "]"
    # window starts generated PER DOCUMENT (range over its own length),
    # so no fixed upper bound silently truncates long documents
    return f"""
SELECT DISTINCT doc_id, fp FROM (
  SELECT p.doc_id, p.i,
         CAST(SUM(CAST(ord(substr(p.text, CAST(p.i + j.j AS INTEGER), 1)) AS BIGINT)
             * list_extract({pows}, CAST(j.j AS INTEGER) + 1)) % {FP_M} AS BIGINT) AS fp
  FROM (
    SELECT doc_id, text,
           unnest(range(1, length(text) - {FP_K - 2})) AS i
    FROM documents
  ) p
  CROSS JOIN generate_series(0, {FP_K - 1}) j(j)
  GROUP BY p.doc_id, p.i
) WHERE fp % {FP_P} = 0
"""


DOC_FINGERPRINTS = _fp_sql()

QUALITY = """
SELECT doc_id,
       length(text) AS n_chars,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       len(string_split_regex(text, '[ ]+')) AS n_tokens,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / CAST(GREATEST(length(text), 1) AS DOUBLE) AS alpha_ratio,
       CAST(length(text) AS DOUBLE)
         / CAST(GREATEST(len(string_split_regex(text, '[ ]+')), 1) AS DOUBLE) AS avg_token_len
FROM documents
"""

# Embedding-cosine near-dup (dedup family): base vectors + scaled
# variants (cosine-identical by scale invariance); exact all-pairs
# threshold join. Margin between variant pairs (1.0) and the corpus's
# max off-pair cosine (~0.51) makes float-kernel differences
# irrelevant at threshold 0.8.
EMB_DUP = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
vars AS (
  SELECT -(v + 1) AS vec_id,
         list_transform(embedding, x -> x * f) AS embedding
  FROM (
    SELECT vec_id AS v,
           CAST(1.0 AS DOUBLE) + (CAST(vec_id % 5 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(100.0 AS DOUBLE) AS f,
           CAST(embedding AS DOUBLE[]) AS embedding
    FROM embeddings WHERE vec_id % 7 = 0
  )
),
alls AS (SELECT * FROM base UNION ALL SELECT * FROM vars)
SELECT a.vec_id AS a, b.vec_id AS b
FROM alls a JOIN alls b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {C.EMB_DUP_THRESHOLD!r}
"""

_U64 = "18446744073709551616"

# BPE-ish pretoken counts; the alternation is lookahead-free and its
# branches are first-char-disjoint, so RE2 and Python re count the
# same non-overlapping matches.
BPE_TOKENS = """
SELECT doc_id,
  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe,
  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+')) AS BIGINT) AS n_alpha_runs,
  CAST(len(regexp_extract_all(text, ' ?[0-9]+')) AS BIGINT) AS n_digit_runs,
  CAST(len(regexp_extract_all(text, ' ?[^A-Za-z0-9 ]+')) AS BIGINT) AS n_punct_runs
FROM documents
"""

# TF-IDF-shape rarity score, logarithm-free so it stays integer-exact:
# tokens feature-hashed into 2^18 buckets (md5 low 8 bytes LE ==
# md5_number mod 2^64, the SimHash convention), df per BUCKET,
# idf_milli = (1000 * N_docs) // df; doc score = mean bucket idf over
# its DISTINCT tokens (floor division). Mirrors text_ops.doc_rarity
# bit-for-bit, including the capped-by-construction hashed vocabulary.
DOC_RARITY = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tb AS (
  SELECT doc_id, t,
         CAST((((md5_number(t) % {_U64}) + {_U64}) % {_U64}) % 262144 AS BIGINT) AS b
  FROM pairs
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (
  SELECT b, (1000 * n.n_docs) // COUNT(DISTINCT doc_id) AS idf_milli
  FROM tb, n GROUP BY b, n.n_docs
),
ds AS (
  SELECT tb.doc_id, COUNT(*) AS n_distinct, SUM(i.idf_milli) AS s
  FROM tb JOIN idf i ON i.b = tb.b
  GROUP BY tb.doc_id
)
SELECT doc_id,
       CAST(n_distinct AS BIGINT) AS distinct_tokens,
       CAST(s // n_distinct AS BIGINT) AS rarity_milli
FROM ds
"""

# Hyperplane-LSH near-dup, full plan in SQL: integer-quantized
# vectors x md5-derived integer planes -> exact int64 sign bits ->
# 4 x 16-bit band keys -> band-collision candidates -> cosine verify.
# Mirrors stages/ann.py:emb_dup_pairs_lsh bit-for-bit on buckets.
EMB_DUP_LSH = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
vars AS (
  SELECT -(v + 1) AS vec_id,
         list_transform(embedding, x -> x * f) AS embedding
  FROM (
    SELECT vec_id AS v,
           CAST(1.0 AS DOUBLE) + (CAST(vec_id % 5 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(100.0 AS DOUBLE) AS f,
           CAST(embedding AS DOUBLE[]) AS embedding
    FROM embeddings WHERE vec_id % 7 = 0
  )
),
alls AS (SELECT * FROM base UNION ALL SELECT * FROM vars),
dims AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(FLOOR(unnest(embedding) * 1048576.0) AS BIGINT) AS qv
  FROM alls
),
w AS MATERIALIZED (
  SELECT p.p, d.d,
         CAST((((md5_number('lshw-' || p.p || '-' || d.d) % {_U64}) + {_U64}) % {_U64}) % 16 AS BIGINT) - 8 AS wv
  FROM generate_series(0, 63) p(p) CROSS JOIN generate_series(0, {C.EMB_DIM - 1}) d(d)
),
dots AS MATERIALIZED (
  SELECT e.vec_id, w.p, SUM(e.qv * w.wv) AS dot
  FROM dims e JOIN w ON w.d = e.d
  GROUP BY e.vec_id, w.p
),
bandk AS MATERIALIZED (
  SELECT vec_id, p // 16 AS band,
         SUM(CASE WHEN dot > 0 THEN CAST(power(2, p % 16) AS BIGINT) ELSE 0 END) AS bkey
  FROM dots GROUP BY vec_id, p // 16
),
bandc AS MATERIALIZED (
  SELECT vec_id, band, bkey FROM bandk
  QUALIFY row_number() OVER (PARTITION BY band, bkey ORDER BY vec_id) <= 200
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM bandc x JOIN bandc y
    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
)
SELECT c.a, c.b
FROM cand c
JOIN alls va ON va.vec_id = c.a
JOIN alls vb ON vb.vec_id = c.b
WHERE list_cosine_similarity(va.embedding, vb.embedding) >= {C.EMB_DUP_THRESHOLD!r}
"""

# Media feature chain (synth media -> md5-seeded Weyl fake decode ->
# 16x16 nearest-neighbor resize -> mean/std/entropy) mirrored exactly:
# the decode is integer HUGEINT arithmetic, moments are integer sums,
# mean/std use identical IEEE expressions, entropy rounds to 8dp (log2
# is 1-ulp divergent).
_DECODE_MUL_SQL = "11400714819323198485"
MEDIA_FEATURES = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 AS INTEGER) + 1) AS kind,
         32 + (doc_id % 4) * 16 AS w,
         32 + (doc_id % 3) * 16 AS h,
         ((md5_number(text) % 18446744073709551616) + 18446744073709551616) % 18446744073709551616 AS seed
  FROM documents
),
px AS (
  SELECT media_id, kind,
    CAST(((seed + ((((gy.v * h) // 16) * w + ((gx.v * w) // 16)) + 1) * {_DECODE_MUL_SQL})
          % 18446744073709551616) // 72057594037927936 AS BIGINT) AS val
  FROM m
  CROSS JOIN generate_series(0, 15) gy(v)
  CROSS JOIN generate_series(0, 15) gx(v)
),
mom AS (
  SELECT media_id, kind,
         CAST(SUM(val) AS BIGINT) AS sx, CAST(SUM(val * val) AS BIGINT) AS sxx
  FROM px GROUP BY media_id, kind
),
cnts AS (SELECT media_id, val, COUNT(*) AS c FROM px GROUP BY media_id, val),
ent AS (
  SELECT media_id,
         ROUND(SUM(-((CAST(c AS DOUBLE) / CAST(256 AS DOUBLE))
               * log2(CAST(c AS DOUBLE) / CAST(256 AS DOUBLE)))), 8) AS entropy
  FROM cnts GROUP BY media_id
)
SELECT mom.media_id, mom.kind,
       CAST(sx AS DOUBLE) / CAST(256 AS DOUBLE) AS mean,
       sqrt(GREATEST(CAST(sxx AS DOUBLE) / CAST(256 AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(256 AS DOUBLE))
              * (CAST(sx AS DOUBLE) / CAST(256 AS DOUBLE)), CAST(0 AS DOUBLE))) AS std,
       ent.entropy
FROM mom JOIN ent USING (media_id)
"""

# JPEG media chain (synth blocky media -> REAL baseline-JPEG encode ->
# from-scratch decode -> 16x16 resize -> mean/std/entropy): the blocky
# tensor (one Weyl value per 8x8 block) lives in the subspace where an
# all-ones-quant baseline JPEG is exactly lossless (codecs/jpeg.py), so
# the decoded pixels are replayed here without modeling the container:
# sampled pixel (gy, gx) reads block ((gy*h//16)//8, (gx*w//16)//8).
JPEG_FEATURES = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 AS INTEGER) + 1) AS kind,
         32 + (doc_id % 4) * 16 AS w,
         32 + (doc_id % 3) * 16 AS h,
         ((md5_number(text) % 18446744073709551616) + 18446744073709551616) % 18446744073709551616 AS seed
  FROM documents
),
px AS (
  SELECT media_id, kind,
    CAST(((seed + (((((gy.v * h) // 16) // 8) * (w // 8) + (((gx.v * w) // 16) // 8)) + 1) * {_DECODE_MUL_SQL})
          % 18446744073709551616) // 72057594037927936 AS BIGINT) AS val
  FROM m
  CROSS JOIN generate_series(0, 15) gy(v)
  CROSS JOIN generate_series(0, 15) gx(v)
),
mom AS (
  SELECT media_id, kind,
         CAST(SUM(val) AS BIGINT) AS sx, CAST(SUM(val * val) AS BIGINT) AS sxx
  FROM px GROUP BY media_id, kind
),
cnts AS (SELECT media_id, val, COUNT(*) AS c FROM px GROUP BY media_id, val),
ent AS (
  SELECT media_id,
         ROUND(SUM(-((CAST(c AS DOUBLE) / CAST(256 AS DOUBLE))
               * log2(CAST(c AS DOUBLE) / CAST(256 AS DOUBLE)))), 8) AS entropy
  FROM cnts GROUP BY media_id
)
SELECT mom.media_id, mom.kind,
       CAST(sx AS DOUBLE) / CAST(256 AS DOUBLE) AS mean,
       sqrt(GREATEST(CAST(sxx AS DOUBLE) / CAST(256 AS DOUBLE)
            - (CAST(sx AS DOUBLE) / CAST(256 AS DOUBLE))
              * (CAST(sx AS DOUBLE) / CAST(256 AS DOUBLE)), CAST(0 AS DOUBLE))) AS std,
       ent.entropy
FROM mom JOIN ent USING (media_id)
"""

# Mergeable log2-binned quantile sketch (DDSketch construction, base-2
# buckets) mirrored exactly: bin = floor(log2(max(v,1))) computed with
# an INTEGER compare against a 2^b LUT (no libm log2 at 2^k
# boundaries); quantile rule = smallest bin with cum * 1e6 >= qm * n,
# pure int64 — see stages/qsketch.py.
QUANTILE_SKETCH = """
WITH lut AS (
  SELECT b.v AS bin, CAST(power(2, b.v) AS BIGINT) AS lo
  FROM generate_series(0, 62) b(v)
),
binned AS (
  SELECT lang,
         (SELECT MAX(l.bin) FROM lut l WHERE l.lo <= GREATEST(d.n_chars, 1)) AS bin
  FROM documents d
),
counts AS (
  SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n FROM binned GROUP BY lang, bin
),
cums AS (
  SELECT lang, bin, n,
         CAST(SUM(n) OVER (PARTITION BY lang ORDER BY bin) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS total
  FROM counts
),
qs AS (SELECT unnest([500000, 900000, 990000]) AS q_micro),
hit AS (
  SELECT c.lang, q.q_micro, c.total AS n, MIN(c.bin) AS bin
  FROM cums c JOIN qs q ON c.cum * 1000000 >= q.q_micro * c.total
  GROUP BY c.lang, q.q_micro, c.total
)
SELECT lang, CAST(q_micro AS BIGINT) AS q_micro, n, bin,
       CAST(power(2, bin) AS BIGINT) AS lo,
       CAST(power(2, bin + 1) AS BIGINT) - 1 AS hi
FROM hit
"""

# SimHash (Charikar 2002) mirrored exactly: token hash = low 8 bytes
# of md5 little-endian == md5_number(t) mod 2^64 (HUGEINT, sign-fixed);
# per-bit vote sum over token counts; bit 63 masked off like the
# engine's `& 0x7FFFFFFFFFFFFFFF`.
SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
h AS (
  SELECT doc_id, n,
         ((md5_number(tok) % {_U64}) + {_U64}) % {_U64} AS th
  FROM cnt
),
bits AS (
  SELECT doc_id, b.b,
         SUM(n * (2 * CAST((th // CAST(power(2, b.b) AS HUGEINT)) % 2 AS BIGINT) - 1)) AS v
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS b) b
  GROUP BY doc_id, b.b
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN sh s USING (doc_id)
"""

# Language-ID stopword heuristic mirrored exactly: words =
# [a-zäöüéèêàçñ]+ over lower(text); pred = the unique argmax language
# by stopword hit count (ties or zero hits -> 'und'); stop_ratio =
# max hits / word count.
_PROFILE_VALUES = ", ".join(
    f"('{lang}', '{w}')"
    for lang in ("de", "en", "es", "fr")
    for w in sorted(
        {
            "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
            "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "von"],
            "fr": ["le", "la", "et", "les", "des", "est", "pas", "pour", "que", "dans"],
            "es": ["el", "la", "que", "de", "los", "es", "una", "por", "con", "para"],
        }[lang]
    )
)
LANGID = f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-zäöüéèêàçñ]+')) AS w
  FROM documents
),
wc AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
prof(lang, w) AS (VALUES {_PROFILE_VALUES}),
langs AS (SELECT DISTINCT lang FROM prof),
hit AS (
  SELECT w.doc_id, p.lang, COUNT(*) AS n
  FROM words w JOIN prof p ON p.w = w.w
  GROUP BY w.doc_id, p.lang
),
full_hits AS (
  SELECT d.doc_id, l.lang, COALESCE(h.n, 0) AS n
  FROM documents d CROSS JOIN langs l
  LEFT JOIN hit h ON h.doc_id = d.doc_id AND h.lang = l.lang
),
winh AS (
  SELECT doc_id, lang, n, MAX(n) OVER (PARTITION BY doc_id) AS mx
  FROM full_hits
),
agg AS (
  SELECT doc_id, MAX(n) AS mx,
         COUNT(*) FILTER (WHERE n = mx) AS n_at_max,
         MIN(lang) FILTER (WHERE n = mx) AS best
  FROM winh GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN wc.n_words IS NULL THEN 'und'
            WHEN a.mx > 0 AND a.n_at_max = 1 THEN a.best
            ELSE 'und' END AS pred_lang,
       CASE WHEN wc.n_words IS NULL THEN 0.0
            ELSE CAST(a.mx AS DOUBLE) / CAST(wc.n_words AS DOUBLE) END AS stop_ratio
FROM documents d
JOIN agg a USING (doc_id)
LEFT JOIN wc USING (doc_id)
"""

# Shared CTE body: the variants corpus + exact shingle-set Jaccard
# pair mining (the ground truth the engine's MinHash-LSH plan must
# reproduce). Used by NEAR_DUP (pairs) and DUP_CLUSTERS (connected
# components over the pairs).
_DUP_PAIRS_BODY = """docs_all AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, 'zzvariant' || substr(text, strpos(text, ' '))
  FROM documents WHERE doc_id % 5 = 0
),
toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM docs_all),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))) AS s
  FROM toks WHERE len(l) >= 3
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
dup_pairs AS (
  SELECT i.a, i.b
  FROM inter i
  JOIN cnt ca ON ca.doc_id = i.a
  JOIN cnt cb ON cb.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i) >= 0.5
)"""

# Standalone exact n-gram Jaccard join: candidate pairs from
# cap-truncated shingle posting lists (row_number <= cap per shingle,
# ordered by doc_id — the engine's per-run truncation), scored with
# FULL sets; jac_ppm uses int64 floor division on both sides.
NGRAM_JACCARD = """
WITH docs_all AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, 'zzvariant' || substr(text, strpos(text, ' '))
  FROM documents WHERE doc_id % 5 = 0
),
toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM docs_all),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))) AS s
  FROM toks WHERE len(l) >= 3
),
shc AS (
  SELECT doc_id, s FROM sh
  QUALIFY row_number() OVER (PARTITION BY s ORDER BY doc_id) <= 50
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM shc x JOIN shc y ON x.s = y.s AND x.doc_id < y.doc_id
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT c.a, c.b,
       CAST(i.i AS BIGINT) AS n_inter,
       CAST(ca.n + cb.n - i.i AS BIGINT) AS n_union,
       CAST((i.i * 1000000) // (ca.n + cb.n - i.i) AS BIGINT) AS jac_ppm
FROM cand c
JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN cnt ca ON ca.doc_id = c.a
JOIN cnt cb ON cb.doc_id = c.b
"""

NEAR_DUP = f"""
WITH {_DUP_PAIRS_BODY}
SELECT a, b FROM dup_pairs
"""

# Delta dedup (incremental ingest): NEW shard (zzvariant copies of
# doc_id % 3 == 0) near-dup-joined AGAINST the prior corpus — the
# asymmetric analog of NEAR_DUP; same exact-Jaccard rule, cross-side
# pairs only. Mirrors stages/neardup.py:delta_dup_pairs_ds (the LSH
# recall argument is the same as NEAR_DUP's: >1-1e-9 at the variants'
# j ~ 0.8, so the exact join IS the engine's answer).
DELTA_DUP = """
WITH refd AS (SELECT doc_id, text FROM documents),
newd AS (
  SELECT doc_id + 10000000 AS doc_id,
         'zzvariant' || substr(text, strpos(text, ' ')) AS text
  FROM documents WHERE doc_id % 3 = 0
),
rtoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM refd),
ntoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM newd),
rsh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))) AS s
  FROM rtoks WHERE len(l) >= 3
),
nsh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))) AS s
  FROM ntoks WHERE len(l) >= 3
),
rcnt AS (SELECT doc_id, COUNT(*) AS n FROM rsh GROUP BY doc_id),
ncnt AS (SELECT doc_id, COUNT(*) AS n FROM nsh GROUP BY doc_id),
inter AS (
  SELECT r.doc_id AS ref_id, n.doc_id AS new_id, COUNT(*) AS i
  FROM rsh r JOIN nsh n ON r.s = n.s
  GROUP BY 1, 2
)
SELECT i.ref_id, i.new_id
FROM inter i
JOIN rcnt cr ON cr.doc_id = i.ref_id
JOIN ncnt cn ON cn.doc_id = i.new_id
WHERE CAST(i.i AS DOUBLE) / (cr.n + cn.n - i.i) >= 0.5
"""

# Connected components over the near-dup pair graph via a recursive
# reachability CTE (UNION-distinct => finite state => terminates);
# cluster id = min reachable doc_id; docs outside every pair are
# their own size-1 cluster. Mirrors stages/neardup.py:dup_clusters.
DUP_CLUSTERS = f"""
WITH RECURSIVE {_DUP_PAIRS_BODY},
edges AS (SELECT a, b FROM dup_pairs UNION SELECT b AS a, a AS b FROM dup_pairs),
reach(node, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.m FROM edges e JOIN reach r ON r.node = e.b
),
lab AS (SELECT node, MIN(m) AS cluster_id FROM reach GROUP BY node),
sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       FROM lab GROUP BY cluster_id)
SELECT d.doc_id,
       COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(s.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
       CAST(CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM docs_all d
LEFT JOIN lab l ON l.node = d.doc_id
LEFT JOIN sz s ON s.cluster_id = COALESCE(l.cluster_id, d.doc_id)
"""

# Gopher-style repetition signals, integer-exact: per-doc token
# counts, modal-token count, duplicate token-trigram count, and ppm
# ratios via int64 floor division (mirrors
# stages/quality.py:repetition_batch bit-for-bit).
REP_SIGNALS = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT doc_id, unnest(l) AS t FROM base),
cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
agg AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
               MAX(c) AS top_n
        FROM cnt GROUP BY doc_id),
tris AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l) - 1),
                i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS tg
  FROM base WHERE len(l) >= 3
),
tagg AS (SELECT doc_id, COUNT(*) AS n_tri, COUNT(DISTINCT tg) AS n_tri_d
         FROM tris GROUP BY doc_id)
SELECT a.doc_id,
       CAST(a.n_tokens AS BIGINT) AS n_tokens,
       CAST(a.n_distinct AS BIGINT) AS distinct_tokens,
       CAST(a.top_n AS BIGINT) AS top_token_n,
       CAST(COALESCE(t.n_tri, 0) - COALESCE(t.n_tri_d, 0) AS BIGINT) AS dup_trigrams,
       CAST(a.top_n * 1000000 // a.n_tokens AS BIGINT) AS top_token_ppm,
       CAST(a.n_distinct * 1000000 // a.n_tokens AS BIGINT) AS distinct_ppm,
       CAST(CASE WHEN COALESCE(t.n_tri, 0) > 0
                 THEN (t.n_tri - t.n_tri_d) * 1000000 // t.n_tri
                 ELSE 0 END AS BIGINT) AS dup_trigram_ppm
FROM agg a LEFT JOIN tagg t USING (doc_id)
"""

ANN = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id % {C.ANN_STRIDE} = 0)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
         ) AS rank
  FROM q, embeddings e WHERE e.vec_id <> q.qid
) WHERE rank <= {C.ANN_K}
"""


def _ivf_sql(n_lists: int, iters: int, nprobe: int, k: int, stride: int, sample_limit: int) -> str:
    """The ENTIRE IVF chain as one SQL statement: deterministic
    even-spacing centroid init over the vec_id-ordered sample, `iters`
    Lloyd iterations unrolled as CTE blocks (argmax assignment with
    lowest-cid tie-break == np.argmax; empty clusters keep their
    previous centroid, exactly stages/ann.py:train_centroids), full
    assignment, union of per-query nprobe lists, cosine top-k over the
    pruned candidates. Every arithmetic step in DOUBLE."""
    its = []
    for i in range(iters):
        its.append(f""",
dots{i} AS MATERIALIZED (
  SELECT s.vec_id, c.cid, SUM(s.v * c.v) AS dot
  FROM sdims s JOIN cent{i} c ON c.d = s.d
  GROUP BY s.vec_id, c.cid
),
asgn{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM dots{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) = 1
),
mean{i} AS MATERIALIZED (
  SELECT a.cid, s.d, AVG(s.v) AS mv
  FROM asgn{i} a JOIN sdims s ON s.vec_id = a.vec_id
  GROUP BY a.cid, s.d
),
nrm{i} AS MATERIALIZED (SELECT cid, SQRT(SUM(mv * mv)) AS nm FROM mean{i} GROUP BY cid),
cent{i + 1} AS MATERIALIZED (
  SELECT c.cid, c.d,
         CASE WHEN m.mv IS NOT NULL AND n.nm > 0 THEN m.mv / n.nm ELSE c.v END AS v
  FROM cent{i} c
  LEFT JOIN mean{i} m ON m.cid = c.cid AND m.d = c.d
  LEFT JOIN nrm{i} n ON n.cid = c.cid
)""")
    return f"""
WITH edims AS MATERIALIZED (
  SELECT vec_id, d, CAST(v AS DOUBLE) AS v FROM (
    SELECT vec_id, unnest(embedding) AS v,
           generate_subscripts(embedding, 1) AS d
    FROM embeddings)
),
enorm AS MATERIALIZED (SELECT vec_id, SQRT(SUM(v * v)) AS nm FROM edims GROUP BY vec_id),
ndims AS MATERIALIZED (SELECT e.vec_id, e.d, e.v / n.nm AS v FROM edims e JOIN enorm n USING (vec_id)),
spos AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS pos
  FROM embeddings ORDER BY vec_id LIMIT {sample_limit}
),
scount AS MATERIALIZED (SELECT COUNT(*) AS m FROM spos),
sdims AS MATERIALIZED (SELECT p.vec_id, n.d, n.v FROM spos p JOIN ndims n USING (vec_id)),
cent0 AS MATERIALIZED (
  SELECT g.c AS cid, n.d, n.v
  FROM generate_series(0, {n_lists - 1}) g(c)
  CROSS JOIN scount
  JOIN spos p ON p.pos = CAST(FLOOR(g.c * scount.m / {float(n_lists)!r}) AS BIGINT)
  JOIN ndims n ON n.vec_id = p.vec_id
){"".join(its)},
adots AS MATERIALIZED (
  SELECT n.vec_id, c.cid, SUM(n.v * c.v) AS dot
  FROM ndims n JOIN cent{iters} c ON c.d = n.d
  GROUP BY n.vec_id, c.cid
),
assign AS MATERIALIZED (
  SELECT vec_id, cid FROM adots
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) = 1
),
allowed AS MATERIALIZED (
  SELECT DISTINCT cid FROM (
    SELECT vec_id, cid FROM adots WHERE vec_id % {stride} = 0
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) <= {nprobe}
  )
),
q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % {stride} = 0),
cand AS MATERIALIZED (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN allowed al ON al.cid = a.cid
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_cosine_similarity(q.qe, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM q, cand c WHERE c.vec_id <> q.qid
) WHERE rank <= {k}
"""


ANN_IVF = _ivf_sql(
    n_lists=16, iters=8, nprobe=6, k=C.ANN_K, stride=C.ANN_STRIDE, sample_limit=400
)


# Product-quantization ANN on the integer lattice, the ENTIRE chain
# in one SQL statement (the ANN_IVF pattern): shifted lattice
# quantization, per-subspace unrolled integer Lloyd (argmin-L2 with
# lowest-cid ties, floor-div means, empty clusters keep previous),
# 4-bit codes, integer ADC distance sums to a 100-deep shortlist,
# then EXACT cosine re-rank of the shortlist (the IVFADC + re-rank
# deployment shape) — the ADC stage is int64 end to end, the re-rank
# is the same float cosine the exact ANN oracle already pins.
ANN_PQ = """
WITH rawd AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
enorm AS MATERIALIZED (
  SELECT vec_id, SQRT(SUM(v * v)) AS nm FROM rawd GROUP BY vec_id
),
qdims AS MATERIALIZED (
  SELECT r.vec_id, r.d, r.d // 8 AS m,
         CAST(FLOOR((r.v / n.nm + 1.0) * 1048576.0) AS BIGINT) AS qv
  FROM rawd r JOIN enorm n USING (vec_id)
),
spos AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS pos
  FROM embeddings ORDER BY vec_id LIMIT 400
),
scount AS MATERIALIZED (SELECT COUNT(*) AS n FROM spos),
sdims AS MATERIALIZED (
  SELECT p.vec_id, q.m, q.d, q.qv FROM spos p JOIN qdims q USING (vec_id)
),
cent0 AS MATERIALIZED (
  SELECT g.c AS cid, q.m, q.d, q.qv AS cv
  FROM generate_series(0, 15) g(c)
  CROSS JOIN scount
  JOIN spos p ON p.pos = CAST(FLOOR(g.c * scount.n / 16.0) AS BIGINT)
  JOIN qdims q ON q.vec_id = p.vec_id
),
pqd0 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent0 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa0 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd0
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums0 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa0 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent1 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent0 c
  LEFT JOIN sums0 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd1 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent1 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa1 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd1
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums1 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa1 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent2 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent1 c
  LEFT JOIN sums1 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd2 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent2 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa2 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd2
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums2 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa2 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent3 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent2 c
  LEFT JOIN sums2 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd3 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent3 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa3 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd3
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums3 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa3 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent4 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent3 c
  LEFT JOIN sums3 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd4 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent4 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa4 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd4
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums4 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa4 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent5 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent4 c
  LEFT JOIN sums4 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd5 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent5 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa5 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd5
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums5 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa5 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent6 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent5 c
  LEFT JOIN sums5 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd6 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent6 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa6 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd6
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums6 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa6 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent7 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent6 c
  LEFT JOIN sums6 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
pqd7 AS MATERIALIZED (
  SELECT s.vec_id, s.m, c.cid, SUM((s.qv - c.cv) * (s.qv - c.cv)) AS d2
  FROM sdims s JOIN cent7 c ON c.m = s.m AND c.d = s.d
  GROUP BY s.vec_id, s.m, c.cid
),
pqa7 AS MATERIALIZED (
  SELECT vec_id, m, cid FROM pqd7
  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
sums7 AS MATERIALIZED (
  SELECT a.m, a.cid, s.d, SUM(s.qv) AS sv, COUNT(*) AS cnt
  FROM pqa7 a JOIN sdims s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY a.m, a.cid, s.d
),
cent8 AS MATERIALIZED (
  SELECT c.m, c.cid, c.d,
         CASE WHEN u.sv IS NOT NULL THEN u.sv // u.cnt ELSE c.cv END AS cv
  FROM cent7 c
  LEFT JOIN sums7 u ON u.m = c.m AND u.cid = c.cid AND u.d = c.d
),
codes AS MATERIALIZED (
  SELECT vec_id, m, cid FROM (
    SELECT e.vec_id, e.m, c.cid, SUM((e.qv - c.cv) * (e.qv - c.cv)) AS d2
    FROM qdims e JOIN cent8 c ON c.m = e.m AND c.d = e.d
    GROUP BY e.vec_id, e.m, c.cid
  ) QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) = 1
),
qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 97 = 0),
tbl AS MATERIALIZED (
  SELECT qd.vec_id AS qid, c.m, c.cid,
         SUM((qd.qv - c.cv) * (qd.qv - c.cv)) AS d2
  FROM qdims qd JOIN qs ON qs.qid = qd.vec_id
  JOIN cent8 c ON c.m = qd.m AND c.d = qd.d
  GROUP BY qd.vec_id, c.m, c.cid
),
adist AS MATERIALIZED (
  SELECT t.qid, k.vec_id, SUM(t.d2) AS dist
  FROM codes k JOIN tbl t ON t.m = k.m AND t.cid = k.cid
  GROUP BY t.qid, k.vec_id
),
cand AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rr
    FROM adist WHERE vec_id <> qid
  ) WHERE rr <= 100
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT c.qid AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY c.qid
           ORDER BY list_cosine_similarity(eq.embedding, ev.embedding) DESC,
                    c.vec_id
         ) AS rank
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings ev ON ev.vec_id = c.vec_id
) WHERE rank <= 5
"""


# SimHash hamming-distance near-dup pairs. The oracle uses the SAME
# pigeonhole-banded plan as the engine (4 x 16-bit bands over the
# 63-bit fingerprint; hamming <= 3 < 4 bands => at least one band
# agrees), so candidacy is exact and the SQL stays O(collisions)
# instead of O(N^2) at sweep scales.
SIMHASH_DUP = f"""
WITH sh AS ({SIMHASH}),
bands AS (
  SELECT doc_id, simhash, b.b AS band,
         (simhash // CAST(power(2, b.b * 16) AS BIGINT)) % 65536 AS band_val
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
),
bandc AS (
  -- mirror the engine's _SIMDUP_RUN_CAP: each equal-(band, band_val)
  -- run truncates deterministically to its 1000 smallest doc_ids
  SELECT doc_id, simhash, band, band_val FROM bands
  QUALIFY row_number() OVER (PARTITION BY band, band_val ORDER BY doc_id) <= 1000
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bandc a JOIN bandc b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""


# Ordered window functions over the events log (stages/window.py).
# Values quantized per row to integer micro-units with the identical
# IEEE expression the engine computes, so frame sums are exact int64.
EVENTS_WINDOW_FNS = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vmicro
  FROM events
)
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS rn,
       LAG(vmicro, 1, 0) OVER w AS lag_vmicro,
       LEAD(vmicro, 1, 0) OVER w AS lead_vmicro,
       CAST(SUM(vmicro) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll3_vmicro,
       RANK() OVER (PARTITION BY user_id ORDER BY vmicro DESC)
         AS value_rank
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# TPC-H-Q1-shaped pricing summary over lineitem: per-row quantization
# to integer cents (identical IEEE expression as the engine's numpy
# kernel) makes every SUM an exact int64 — order-free across partial
# aggregation, no float-summation-order hazard.
PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_qty_c,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_base_c,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# Generic anti-join (broadcast distinct-key strategy): lapsed
# customers -- no order placed since mid-2000.
CUST_NO_ORDERS = """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-07-01'
)
"""

# Generic semi-join (co-partition shuffle strategy): parts with at
# least one max-quantity (50) shipment.
ACTIVE_PARTS = """
SELECT p_partkey, p_size FROM part
WHERE p_partkey IN (
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 50
)
"""

# Hopping (sliding) windows: each event joins its window_us/hop_us
# member windows; value quantized to integer micro-units per row
# (identical IEEE expr to the engine's np.floor) for an exact Sum.
HOPPING_WINDOW = """
SELECT (epoch_us(ts) // 3600000000 - i.i) * 3600000000 AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_micro
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
GROUP BY 1
"""

# Exact per-day distinct users (the engine computes it bucket-partial;
# the rule is plain COUNT(DISTINCT)).
DAILY_USERS = """
SELECT epoch_us(ts) // 86400000000 AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""

# HyperLogLog register table (p=12, m=4096) over distinct user ids:
# value hash = low 8 md5 bytes little-endian == md5_number % 2^64
# (the proven simhash identity); register = h % m; rho = leading
# zeros of the remaining 52-bit field + 1, computed with an integer
# powers-of-two comparison count (no float log).
HLL_USERS = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
h AS (
  SELECT ((md5_number(CAST(user_id AS VARCHAR)) % {_U64}) + {_U64}) % {_U64} AS h
  FROM u
),
r AS (SELECT CAST(h % 4096 AS BIGINT) AS register_idx, h // 4096 AS w FROM h),
b AS (
  SELECT register_idx,
         CASE WHEN w = 0 THEN 53
              ELSE 53 - (SELECT COUNT(*) FROM (SELECT unnest(generate_series(0, 51)) AS e) p
                         WHERE CAST(power(2, p.e) AS HUGEINT) <= w)
         END AS rho
  FROM r
)
SELECT register_idx, CAST(MAX(rho) AS BIGINT) AS rho FROM b GROUP BY register_idx
"""

# TPC-H-Q13-style: distribution of customers by their non-urgent
# order count (0 included via the LEFT join).
ORDER_COUNTS_DIST = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS n_cust FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
"""

# Broadcast STRING-key join: documents joined to a tiny script-family
# dimension on the lang code, per-family totals.
LANG_FAMILIES = """
SELECT f.family, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(d.text)) AS BIGINT) AS sum_chars
FROM documents d
JOIN (VALUES ('de','latin'),('en','latin'),('es','latin'),
             ('fr','latin'),('zh','cjk')) f(lang, family)
  ON d.lang = f.lang
GROUP BY f.family
"""

# Count-Min sketch of corpus token frequencies, exactly mirrored:
# cell (d, w) = SUM of counts of tokens with md5_number('cms<d>-'||t)
# mod 2^64 mod width == w (stages/text_ops.cms_sketch).
CMS_SKETCH = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS t FROM documents
),
cnt AS (SELECT t, COUNT(*) AS n FROM toks GROUP BY t),
cells AS (
  SELECT d.d,
         CAST((((md5_number('cms' || CAST(d.d AS VARCHAR) || '-' || c.t) % {_U64})
               + {_U64}) % {_U64}) % 8192 AS BIGINT) AS w,
         c.n
  FROM cnt c CROSS JOIN generate_series(0, 3) d(d)
)
SELECT CAST(d AS BIGINT) AS d, w, CAST(SUM(n) AS BIGINT) AS total
FROM cells GROUP BY d, w
"""

# Heavy hitters: k most frequent tokens corpus-wide, deterministic
# count DESC / token ASC tiebreak.
TOP_TOKENS = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS total,
       CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS BIGINT) AS rank
FROM (
  SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS token FROM documents
) t
GROUP BY token
ORDER BY total DESC, token LIMIT 20
"""

# Percentile-gated quality filter: docs at/above the corpus P25 alpha
# micro-ratio; threshold by the engine's integer quantile rule
# (smallest value whose running count reaches ceil(q*n/100)).
QUALITY_FILTER = """
WITH q AS (
  SELECT doc_id,
         CAST(FLOOR(1000000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / GREATEST(length(text), 1) + 0.5) AS BIGINT) AS ratio_micro
  FROM documents
),
c AS (SELECT ratio_micro, COUNT(*) AS n FROM q GROUP BY 1),
cum AS (
  SELECT ratio_micro,
         SUM(n) OVER (ORDER BY ratio_micro ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER () AS total
  FROM c
),
thr AS (SELECT MIN(ratio_micro) AS t FROM cum WHERE cum_n >= (25 * total + 99) // 100)
SELECT q.doc_id, q.ratio_micro FROM q, thr WHERE q.ratio_micro >= thr.t
"""

# Sliding-window token chunking (64-token windows, stride 48): chunk
# j = tokens[j*48 : j*48+64) == 1-based inclusive DuckDB list slice
# ts[j*48+1 : j*48+64].
CHUNKS = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ts FROM documents
),
n AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
j AS (
  SELECT doc_id, ts,
         unnest(generate_series(0,
            CAST(CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END AS BIGINT))) AS j
  FROM n
)
SELECT doc_id, j AS chunk_id,
       array_to_string(ts[j*48+1 : j*48+64], ' ') AS chunk,
       CAST(len(ts[j*48+1 : j*48+64]) AS BIGINT) AS n_tokens
FROM j
"""


def _pii_sql() -> str:
    from robosat_ray.stages.scrub import EMAIL_RE, EMAIL_TOKEN, PHONE_RE, PHONE_TOKEN

    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact: user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(t, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
         '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones
FROM aug
"""


# PII scrubbing: plant one deterministic email + phone per doc, then
# redact with the SAME RE2 patterns the engine passes to Arrow's
# count/replace_substring_regex kernels (DuckDB's regexp functions
# are RE2 as well — the scrubbed text must match byte-for-byte).
PII_SCRUB = _pii_sql()

# Adjacent-token collocations: top-25 bigrams by count, tiebreak
# bigram ASC (mirrors stages/text_ops.top_bigrams).
TOP_BIGRAMS = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ts FROM documents
),
idx AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tok
),
bi AS (SELECT ts[i] || ' ' || ts[i + 1] AS bigram FROM idx)
SELECT bigram, CAST(count(*) AS BIGINT) AS total,
       CAST(row_number() OVER (ORDER BY count(*) DESC, bigram ASC) AS BIGINT) AS rank
FROM bi
GROUP BY bigram
ORDER BY total DESC, bigram ASC
LIMIT 25
"""


def _postings_sql() -> str:
    from robosat_ray.stages.text_ops import POSTING_K

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS token
  FROM documents
),
pairs AS (SELECT DISTINCT token, doc_id FROM tok)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string(
         list_transform((list_sort(list(doc_id)))[1:{POSTING_K}],
                        x -> CAST(x AS VARCHAR)), ',') AS head
FROM pairs
GROUP BY token
"""


# Inverted index: exact df + first-POSTING_K posting head per token
# (mirrors stages/text_ops.postings — head caps the OUTPUT, df is
# exact).
POSTINGS = _postings_sql()


# End-to-end corpus cleaning: exact dedup -> normalized dedup ->
# 25th-percentile quality gate computed over the SURVIVORS (mirrors
# stages/clean.clean_corpus; same md5 keys, same int64 micro-ratio,
# same exact-quantile pick rule as QUALITY_FILTER).
CLEAN_CORPUS = """
WITH k AS (
  SELECT doc_id,
         md5(text) AS text_hash,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS norm_hash,
         CAST(FLOOR(1000000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / GREATEST(length(text), 1) + 0.5) AS BIGINT) AS ratio_micro
  FROM documents
),
ex AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_exact,
         MIN(norm_hash) AS norm_hash, MIN(ratio_micro) AS ratio_micro
  FROM k GROUP BY text_hash
),
nx AS (
  SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_norm FROM ex GROUP BY norm_hash
),
kept AS (
  SELECT e.doc_id, e.n_exact, nx.n_norm, e.ratio_micro
  FROM ex e JOIN nx ON e.doc_id = nx.keep_id
),
c AS (SELECT ratio_micro, COUNT(*) AS n FROM kept GROUP BY 1),
cum AS (
  SELECT ratio_micro,
         SUM(n) OVER (ORDER BY ratio_micro ROWS UNBOUNDED PRECEDING) AS cum_n,
         SUM(n) OVER () AS total
  FROM c
),
thr AS (SELECT MIN(ratio_micro) AS t FROM cum WHERE cum_n >= (25 * total + 99) // 100)
SELECT kept.doc_id, CAST(kept.n_exact AS BIGINT) AS n_exact,
       CAST(kept.n_norm AS BIGINT) AS n_norm, kept.ratio_micro
FROM kept, thr WHERE kept.ratio_micro >= thr.t
"""


def _geohash_sql() -> str:
    # 30-bit interleave, lon bit HIGH in each pair (public geohash bit
    # order), then 6 base32 chars — mirrors geo/tiles.geohash_cells /
    # geohash_str bit-for-bit
    code = " + ".join(
        f"(((gx >> {b}) & 1) * {2 ** (2 * b + 1)} + ((gy >> {b}) & 1) * {2 ** (2 * b)})"
        for b in range(15)
    )
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = " || ".join(
        f"substr('{alpha}', CAST((gh_int >> {25 - 5 * i}) & 31 AS INTEGER) + 1, 1)"
        for i in range(6)
    )
    return f"""
WITH {points_cte()},
g AS (
  SELECT doc_id,
         CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * 32768.0), 0.0), 32767.0) AS BIGINT) AS gx,
         CAST(LEAST(GREATEST(FLOOR((1.0 - my) * 32768.0), 0.0), 32767.0) AS BIGINT) AS gy
  FROM pts
),
code AS (SELECT doc_id, CAST({code} AS BIGINT) AS gh_int FROM g)
SELECT doc_id, gh_int, {chars} AS gh FROM code
"""


# Geohash cell encoding (6-char base32, lon-first bit interleave)
# over the engine plane — the third public cell system next to z/x/y
# tiles and Bing quadkeys.
GEOHASH = _geohash_sql()


def _hilbert_sql(order: int) -> str:
    # the identical per-level rotate/reflect walk geo/tiles.hilbert_d
    # runs vectorized, expressed as a recursive CTE over levels: rx/ry
    # from (x & s), d += s*s*((3*rx) xor ry), then reflect-and-swap
    # when ry = 0. The s = 0 row carries the final index.
    s0 = 1 << (order - 1)
    return f"""
WITH RECURSIVE {points_cte()},
t AS (SELECT doc_id, {tile_x('lon')} AS tx, {tile_y('my')} AS ty FROM pts),
walk AS (
  SELECT doc_id, tx AS ox, ty AS oy, tx AS x, ty AS y,
         CAST(0 AS BIGINT) AS d, CAST({s0} AS BIGINT) AS s
  FROM t
  UNION ALL
  SELECT doc_id, ox, oy,
         CASE WHEN (y & s) > 0 THEN x
              WHEN (x & s) > 0 THEN s - 1 - y
              ELSE y END AS x,
         CASE WHEN (y & s) > 0 THEN y
              WHEN (x & s) > 0 THEN s - 1 - x
              ELSE x END AS y,
         d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                         (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)) AS d,
         s // 2 AS s
  FROM walk WHERE s >= 1
)
SELECT doc_id, ox AS tile_x, oy AS tile_y, d AS h
FROM walk WHERE s = 0
"""


# Hilbert-curve tile index at the join zoom (locality-preserving
# alternative to the Morton/quadkey order; mirrors
# geo/tiles.hilbert_d level-for-level).
HILBERT = _hilbert_sql(12)


def _hexbin_sql() -> str:
    from robosat_ray.geo.tiles import HEX_SIZE, SQRT3_3

    return f"""
WITH {points_cte()},
g AS (SELECT doc_id, lon AS x, my * 360.0 - 180.0 AS y FROM pts),
f AS (
  SELECT doc_id,
         ({SQRT3_3!r} * x - y / 3.0) / {HEX_SIZE!r} AS cx,
         (2.0 / 3.0 * y) / {HEX_SIZE!r} AS cz
  FROM g
),
c AS (SELECT doc_id, cx, cz, -cx - cz AS cy FROM f),
rr AS (
  SELECT doc_id, cx, cy, cz,
         FLOOR(cx + 0.5) AS rx, FLOOR(cy + 0.5) AS ry, FLOOR(cz + 0.5) AS rz
  FROM c
),
fx AS (
  SELECT doc_id,
         CASE WHEN ABS(rx - cx) > ABS(ry - cy) AND ABS(rx - cx) > ABS(rz - cz)
              THEN -ry - rz ELSE rx END AS q,
         CASE WHEN NOT (ABS(rx - cx) > ABS(ry - cy) AND ABS(rx - cx) > ABS(rz - cz))
                   AND NOT (ABS(ry - cy) > ABS(rz - cz))
              THEN -rx - ry ELSE rz END AS r
  FROM rr
)
SELECT CAST(q AS BIGINT) AS hq, CAST(r AS BIGINT) AS hr,
       CAST(count(*) AS BIGINT) AS n_pages
FROM fx GROUP BY 1, 2
"""


# Hex binning (pointy-top axial grid, H3's planar analog): per-hex
# page counts; the cube-rounding fix chain mirrors
# geo/tiles.hexbin_axial float-op-for-float-op.
HEXBIN = _hexbin_sql()


def _pagerank_sql(iters: int) -> str:
    from robosat_ray.stages.pagerank import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_R0,
        PR_TELEPORT,
    )

    step = (
        "it{k} AS (SELECT e.dst AS node, "
        f"CAST({PR_TELEPORT} + ({PR_DAMP_NUM} * SUM(p.r // d.sdeg)) // {PR_DAMP_DEN} AS BIGINT) AS r "
        "FROM it{p} p JOIN deg d ON d.src = p.node JOIN edges e ON e.src = p.node "
        "GROUP BY e.dst)"
    )
    its = ",\n".join(step.format(k=k, p=k - 1) for k in range(1, iters + 1))
    return f"""
WITH {points_cte()}, {feet_cte()},
je AS (
  SELECT p.doc_id AS d, f.feature_id AS f
  FROM pts p JOIN feet f
    ON p.lon >= f.minx AND p.lon <= f.maxx AND p.my >= f.miny AND p.my <= f.maxy
),
edges AS (
  SELECT d * 2 AS src, f * 2 + 1 AS dst FROM je
  UNION ALL
  SELECT f * 2 + 1 AS src, d * 2 AS dst FROM je
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS sdeg FROM edges GROUP BY 1),
it0 AS (SELECT src AS node, CAST({PR_R0} AS BIGINT) AS r FROM deg),
{its}
SELECT node, r AS rank_micro FROM it{iters}
"""


# Fixed-iteration integer PageRank over the doc<->footprint join graph
# (iterative-algorithm surface; mirrors stages/pagerank.pagerank_micro
# — the unrolled CTE chain IS the engine's superstep loop).
PAGERANK = _pagerank_sql(6)


def _triangles_sql() -> str:
    from robosat_ray.stages.text_ops import TRI_TOP_K

    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ts FROM documents
),
flat AS (SELECT unnest(ts) AS token FROM tok),
tot AS (SELECT token, count(*) AS total FROM flat GROUP BY token),
top AS (
  SELECT token FROM tot
  QUALIFY row_number() OVER (ORDER BY total DESC, token ASC) <= {TRI_TOP_K}
),
idx AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tok),
bi AS (
  SELECT LEAST(ts[i], ts[i + 1]) AS a, GREATEST(ts[i], ts[i + 1]) AS b
  FROM idx WHERE ts[i] <> ts[i + 1]
),
e AS (
  SELECT DISTINCT a, b FROM bi
  WHERE a IN (SELECT token FROM top) AND b IN (SELECT token FROM top)
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT x AS token FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT token, CAST(count(*) AS BIGINT) AS n_tri FROM members GROUP BY token
"""


# Triangle counts on the token co-occurrence graph (top-K nodes,
# adjacent-bigram edges) — mirrors stages/text_ops.token_triangles
# (a<b<c enumeration == diag(A^3)/2 per member).
TOKEN_TRIANGLES = _triangles_sql()


def _bm25_sql() -> str:
    """Log-free BM25 (k1=6/5, b=3/4 cleared of denominators), integer
    end to end — mirrors stages/retrieval.bm25_topk bit-for-bit:
    idf_milli = min((1000*N)//df, cap), A = min((1000*L)//N, cap),
    tfc = min(tf, 255),
    term_milli = (44*idf*tfc*A) // (20*A*tfc + 6*A + 18000*dl).
    All quantities positive, so DuckDB // == numpy floor-div."""
    from robosat_ray.stages.retrieval import (
        BM25_AVGDL_CAP_MILLI,
        BM25_IDF_CAP_MILLI,
        BM25_K,
        BM25_QUERY,
        BM25_TF_CAP,
    )

    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
dl AS MATERIALIZED (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
st AS MATERIALIZED (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         (SELECT COUNT(*) FROM toks) AS L
),
av AS (SELECT n, LEAST((1000 * L) // n, {BM25_AVGDL_CAP_MILLI}) AS a FROM st),
qt AS (SELECT unnest([{terms}]) AS t),
df AS (
  SELECT t, COUNT(DISTINCT doc_id) AS df FROM toks
  WHERE t IN (SELECT t FROM qt) GROUP BY t
),
idf AS (
  SELECT df.t, LEAST((1000 * av.n) // df.df, {BM25_IDF_CAP_MILLI}) AS idf
  FROM df, av
),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM toks
  WHERE t IN (SELECT t FROM qt) GROUP BY doc_id, t
),
term AS (
  SELECT tf.doc_id,
         (44 * idf.idf * LEAST(tf.tf, {BM25_TF_CAP}) * av.a)
         // (20 * av.a * LEAST(tf.tf, {BM25_TF_CAP}) + 6 * av.a + 18000 * dl.dl) AS tm
  FROM tf JOIN idf ON idf.t = tf.t JOIN dl ON dl.doc_id = tf.doc_id, av
),
score AS (SELECT doc_id, SUM(tm) AS score_milli FROM term GROUP BY doc_id)
SELECT doc_id, CAST(score_milli AS BIGINT) AS score_milli, rank FROM (
  SELECT doc_id, score_milli,
         row_number() OVER (ORDER BY score_milli DESC, doc_id) AS rank
  FROM score
) WHERE rank <= {BM25_K}
"""


# Ranked retrieval: integer-exact BM25 top-k over the fixed query —
# mirrors stages/retrieval.bm25_topk.
BM25 = _bm25_sql()


# URL parse + registered-domain aggregation — mirrors stages/urls.py:
# the URL fixture is rebuilt expression-for-expression from documents
# (pure functions of doc_id and lang), then PARSED back with the same
# RE2 grammar (DuckDB's regexp engine is RE2 like Arrow's), so the
# parser itself is what parity checks.
URL_STATS = """
WITH built AS (
  SELECT
    (CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END) || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
    || 'site' || CAST(doc_id % 23 AS VARCHAR)
    || (['.com', '.org', '.net', '.io', '.co.uk'])[(doc_id % 5) + 1]
    || (CASE WHEN doc_id % 4 > 0 THEN '/p' || CAST(doc_id % 17 AS VARCHAR) ELSE '' END)
    || (CASE WHEN doc_id % 4 > 1 THEN '/p' || CAST((doc_id + 1) % 17 AS VARCHAR) ELSE '' END)
    || (CASE WHEN doc_id % 4 > 2 THEN '/p' || CAST((doc_id + 2) % 17 AS VARCHAR) ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0
         THEN '?q=' || lang || '&p=' || CAST(doc_id % 13 AS VARCHAR) ELSE '' END)
    AS url,
    lang
  FROM documents
),
parsed AS (
  SELECT
    regexp_extract(
      regexp_replace(regexp_extract(url, '^https?://([^/?]+)', 1), '^www\\.', ''),
      '([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$', 1) AS regdom,
    CASE WHEN regexp_extract(url, '^(https?)://', 1) = 'https' THEN 1 ELSE 0 END AS is_https,
    CASE WHEN regexp_matches(url, '\\?') THEN 1 ELSE 0 END AS has_query,
    len(regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1))
      - len(replace(regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1), '/', '')) AS depth,
    lang
  FROM built
)
SELECT regdom AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(is_https) AS BIGINT) AS n_https,
       CAST(SUM(has_query) AS BIGINT) AS n_query,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM parsed GROUP BY regdom
"""


def _kmeans_sql(k: int, iters: int, src: str = "embeddings") -> str:
    """Full-corpus integer Lloyd unrolled as CTE blocks (the ANN_IVF
    oracle pattern, but integer-exact end to end) — mirrors
    stages/cluster.kmeans_assignments bit-for-bit: floor(x*1e6)
    lattice, k-smallest-vec_id init, argmin-L2 with lowest-j ties,
    elementwise floor-div means ((s - mod)/n so negative sums floor
    like numpy //), empty clusters keep their previous centroid."""
    its = []
    for i in range(iters):
        its.append(f""",
dist{i} AS MATERIALIZED (
  SELECT q.vec_id, c.j, SUM((q.val - c.val) * (q.val - c.val)) AS d2
  FROM qd q JOIN cent{i} c ON c.d = q.d
  GROUP BY q.vec_id, c.j
),
asgn{i} AS MATERIALIZED (
  SELECT vec_id, j FROM dist{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) = 1
),
upd{i} AS MATERIALIZED (
  SELECT a.j, q.d, SUM(q.val) AS s, COUNT(*) AS n
  FROM asgn{i} a JOIN qd q USING (vec_id)
  GROUP BY a.j, q.d
),
cent{i + 1} AS MATERIALIZED (
  SELECT c.j, c.d,
         COALESCE((u.s - (((u.s % u.n) + u.n) % u.n)) // u.n, c.val) AS val
  FROM cent{i} c LEFT JOIN upd{i} u ON u.j = c.j AND u.d = c.d
)""")
    return f"""
WITH qd AS MATERIALIZED (
  SELECT vec_id, d,
         CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS val
  FROM (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d
        FROM {src})
),
init AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
  FROM {src} ORDER BY vec_id LIMIT {k}
),
cent0 AS MATERIALIZED (
  SELECT i.j, q.d, q.val FROM init i JOIN qd q USING (vec_id)
){"".join(its)},
fdist AS (
  SELECT q.vec_id, c.j, SUM((q.val - c.val) * (q.val - c.val)) AS d2
  FROM qd q JOIN cent{iters} c ON c.d = q.d
  GROUP BY q.vec_id, c.j
)
SELECT vec_id, CAST(j AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
FROM fdist
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) = 1
"""


# Distributed full-corpus KMeans (integer Lloyd, broadcast-model
# iteration) — mirrors stages/cluster.kmeans_assignments.
KMEANS = _kmeans_sql(k=10, iters=3)


# Bloom-filter semi-join (deterministic FPs included) — mirrors
# stages/bloom.py: bit positions = md5_64('bl<i>-' || key) mod 32768,
# membership = every position present in the built bit set.
def _bloom_sql() -> str:
    from robosat_ray.stages.bloom import BLOOM_M

    def pos(i: str, key: str) -> str:
        return (
            f"CAST(((md5_number('bl{i}-' || CAST({key} AS VARCHAR)) % {_U64}) + {_U64})"
            f" % {_U64} % {BLOOM_M} AS BIGINT)"
        )

    return f"""
WITH bits AS MATERIALIZED (
  SELECT DISTINCT b FROM (
    SELECT {pos('0', 'o_orderkey')} AS b FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT {pos('1', 'o_orderkey')} AS b FROM orders WHERE o_orderpriority = '1-URGENT'
  )
),
probe AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem
  WHERE {pos('0', 'l_orderkey')} IN (SELECT b FROM bits)
    AND {pos('1', 'l_orderkey')} IN (SELECT b FROM bits)
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_pass,
       CAST(SUM(qty) AS BIGINT) AS sum_qty
FROM probe GROUP BY l_returnflag
"""


BLOOM_JOIN = _bloom_sql()


def _dup_spans_sql() -> str:
    """Repeated-span detection twin — mirrors stages/spans.py: md5_64
    token hashes, SPAN_W-step wraparound-mod-2^64 polynomial fold
    (HUGEINT intermediates: acc*B < 2^104), 1/SPAN_SAMPLE_MOD anchor
    sample, group-by-hash (n_docs, n_occ), tie-deterministic top-k."""
    from robosat_ray.stages.spans import SPAN_SAMPLE_MOD, SPAN_TOP_K, SPAN_W

    b = 1099511628211
    expr = "list_extract(ths, CAST(p.i AS INTEGER))"
    for j in range(1, SPAN_W):
        expr = (
            f"((({expr}) * {b} + list_extract(ths, CAST(p.i + {j} AS INTEGER)))"
            f" % {_U64})"
        )
    return f"""
WITH docs_all AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, 'zzvariant' || substr(text, strpos(text, ' '))
  FROM documents WHERE doc_id % 5 = 0
),
toks AS MATERIALIZED (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           t -> ((md5_number(t) % {_U64}) + {_U64}) % {_U64}) AS ths
  FROM docs_all
),
spans AS MATERIALIZED (
  SELECT p.doc_id, {expr} AS h
  FROM (SELECT doc_id, ths, unnest(range(1, len(ths) - {SPAN_W - 2})) AS i
        FROM toks WHERE len(ths) >= {SPAN_W}) p
),
anchors AS (SELECT doc_id, h FROM spans WHERE h % {SPAN_SAMPLE_MOD} = 0),
grp AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
  FROM anchors GROUP BY h
)
SELECT CAST(CASE WHEN h >= 9223372036854775808 THEN h - {_U64} ELSE h END AS BIGINT)
         AS span_hash,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_occ AS BIGINT) AS n_occ,
       rank
FROM (
  SELECT h, n_docs, n_occ,
         row_number() OVER (
           ORDER BY n_docs DESC, n_occ DESC,
                    CASE WHEN h >= 9223372036854775808 THEN h - {_U64} ELSE h END
         ) AS rank
  FROM grp WHERE n_docs >= 2
) WHERE rank <= {SPAN_TOP_K}
"""


# Cross-document repeated-span detection (Lee et al. substring-dedup
# signal) — mirrors stages/spans.dup_spans.
DUP_SPANS = _dup_spans_sql()


# Chain-rule event debounce (streaming telemetry dedup): an event is
# kept only if >= 60 s after the last KEPT event of the same
# (user_id, event_type); dropped events do not reset the clock. The
# recursive CTE's working set is exactly the per-key frontier (one
# row per key per round) — the same frontier algorithm
# stages/debounce.py runs vectorized. Ties at identical ts order by
# event_id, mirroring the engine's composite sort.
DEBOUNCE = """
WITH RECURSIVE ev AS MATERIALIZED (
  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS rn
  FROM events
),
keep AS (
  SELECT user_id, event_type, tus, event_id, rn FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.tus, e.event_id, e.rn
  FROM (
    SELECT e.*, row_number() OVER (
             PARTITION BY e.user_id, e.event_type ORDER BY e.rn
           ) AS pick
    FROM keep k JOIN ev e
      ON e.user_id = k.user_id AND e.event_type = k.event_type
    WHERE e.tus >= k.tus + 60000000
  ) e WHERE e.pick = 1
)
SELECT t.user_id, t.event_type, t.n_events, k.n_kept, k.kept_id_sum
FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY user_id, event_type
) t
JOIN (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(event_id) AS BIGINT) AS kept_id_sum
  FROM keep GROUP BY user_id, event_type
) k USING (user_id, event_type)
"""


def _decontaminate_sql() -> str:
    """Benchmark-decontamination twin — mirrors stages/decontaminate.py:
    the spans.py polynomial window fold at DECON_W=13, benchmark =
    (doc_id % MOD == 0 AND doc_id < MAX_ID) fixture, per-train-doc
    window/hit counts + 0/1 flag."""
    from robosat_ray.stages.decontaminate import (
        DECON_BENCH_MAX_ID,
        DECON_BENCH_MOD,
        DECON_W,
    )

    b = 1099511628211
    expr = "list_extract(ths, CAST(p.i AS INTEGER))"
    for j in range(1, DECON_W):
        expr = (
            f"((({expr}) * {b} + list_extract(ths, CAST(p.i + {j} AS INTEGER)))"
            f" % {_U64})"
        )
    bench_pred = f"doc_id % {DECON_BENCH_MOD} = 0 AND doc_id < {DECON_BENCH_MAX_ID}"
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           t -> ((md5_number(t) % {_U64}) + {_U64}) % {_U64}) AS ths
  FROM documents
),
spans AS MATERIALIZED (
  SELECT p.doc_id, {expr} AS h
  FROM (SELECT doc_id, ths, unnest(range(1, len(ths) - {DECON_W - 2})) AS i
        FROM toks WHERE len(ths) >= {DECON_W}) p
),
bench AS (SELECT DISTINCT h FROM spans WHERE {bench_pred}),
hits AS (
  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM spans s
  WHERE NOT ({bench_pred.replace('doc_id', 's.doc_id')})
    AND s.h IN (SELECT h FROM bench)
  GROUP BY s.doc_id
)
SELECT t.doc_id,
       CAST(greatest(len(t.ths) - {DECON_W - 1}, 0) AS BIGINT) AS n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
WHERE NOT (t.doc_id % {DECON_BENCH_MOD} = 0 AND t.doc_id < {DECON_BENCH_MAX_ID})
"""


# Benchmark decontamination (GPT-3-style 13-gram train/eval overlap) —
# mirrors stages/decontaminate.decontaminate.
DECONTAMINATE = _decontaminate_sql()


# Training-sequence packing (concat-and-chunk placement) — mirrors
# stages/pack.py: global doc_id-ordered token prefix sum sliced into
# SEQ_LEN sequences. The window frame IS the scan pass A+B performs
# distributed.
PACK = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
       tok_offset // 2048 AS first_seq,
       (tok_offset + n_tokens - 1) // 2048 AS last_seq,
       (tok_offset + n_tokens - 1) // 2048 - tok_offset // 2048 + 1 AS n_seqs
FROM c
"""


# Per-domain contribution cap (RefinedWeb-style curation) — mirrors
# stages/domain_cap.py: the URL_STATS fixture/parse chain, MMIX-LCG
# rank hash in HUGEINT (== the engine's uint64 wraparound), top
# DOMAIN_CAP per registered domain.
DOMAIN_CAP = f"""
WITH built AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END) || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
    || 'site' || CAST(doc_id % 23 AS VARCHAR)
    || (['.com', '.org', '.net', '.io', '.co.uk'])[(doc_id % 5) + 1]
    AS url
  FROM documents
),
parsed AS (
  SELECT doc_id,
    regexp_extract(
      regexp_replace(regexp_extract(url, '^https?://([^/?]+)', 1), '^www\\.', ''),
      '([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$', 1) AS regdom,
    (CAST(doc_id AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
      % {_U64} AS rh
  FROM built
)
SELECT doc_id, regdom,
       CAST(row_number() OVER (PARTITION BY regdom ORDER BY rh, doc_id)
            AS BIGINT) AS dom_rank
FROM parsed
QUALIFY dom_rank <= 3
"""


# Incremental snapshot ingestion (dedup-against-the-corpus) — mirrors
# stages/ingest.py: the deterministic re-crawl fixture, corpus-hash
# anti-join, within-shard min-id dedup. WHERE (the anti-join) runs
# before the window count, but rejection is all-or-none per hash, so
# the surviving groups' counts equal the full shard counts — same as
# the engine's bucket scan.
INGEST = """
WITH snap AS (
  SELECT doc_id + 10000000 AS doc_id, text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 10000000, 'rev2 ' || text
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id + 20000000, 'rev2 ' || text
  FROM documents WHERE doc_id % 21 = 1
),
sh AS (SELECT doc_id, md5(text) AS text_hash FROM snap),
old AS (SELECT DISTINCT md5(text) AS th FROM documents)
SELECT s.doc_id, s.text_hash,
       CAST(COUNT(*) OVER (PARTITION BY s.text_hash) AS BIGINT) AS n_shard_dups
FROM sh s
WHERE s.text_hash NOT IN (SELECT th FROM old)
QUALIFY row_number() OVER (PARTITION BY s.text_hash ORDER BY s.doc_id) = 1
"""


# Exact rank / percentile normalization of the quality score —
# mirrors stages/rank.py (RANK() ties, integer-micro percentile; the
# score expression is QUALITY_FILTER's ratio_micro).
QUALITY_RANK = """
WITH t AS (
  SELECT doc_id,
         CAST(FLOOR(1000000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / GREATEST(length(text), 1) + 0.5) AS BIGINT) AS score
  FROM documents
)
SELECT doc_id, score,
       CAST(RANK() OVER (ORDER BY score) AS BIGINT) AS rank,
       CAST((RANK() OVER (ORDER BY score) - 1) * 1000000
            // GREATEST((SELECT COUNT(*) FROM t) - 1, 1) AS BIGINT) AS pct_micro
FROM t
"""


# Funnel analysis (signup -> view -> purchase, each step within 24 h
# of the previous matched step) — mirrors stages/funnel.py: earliest
# qualifying event per step, -1 sentinels keep columns int64.
FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
),
s1 AS (SELECT user_id, MIN(t) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
s2 AS (
  SELECT e.user_id, MIN(e.t) AS t2
  FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.t > s1.t1 AND e.t <= s1.t1 + 86400000000
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.t) AS t3
  FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.t > s2.t2 AND e.t <= s2.t2 + 86400000000
  GROUP BY 1
),
allu AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
       CAST(COALESCE(t1, -1) AS BIGINT) AS t1_us,
       CAST(COALESCE(t2, -1) AS BIGINT) AS t2_us,
       CAST(COALESCE(t3, -1) AS BIGINT) AS t3_us
FROM allu u
LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


# Weekly cohort retention triangle — mirrors stages/cohort.py:
# cohort = first signup week, activity = distinct (user, week), k >= 0.
COHORT = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 604800000000 AS w FROM events
),
c AS (SELECT user_id, MIN(w) AS cw FROM e WHERE event_type = 'signup' GROUP BY 1),
a AS (SELECT DISTINCT user_id, w FROM e)
SELECT c.cw AS cohort_week, a.w - c.cw AS k,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM c JOIN a USING (user_id)
WHERE a.w >= c.cw
GROUP BY 1, 2
"""


def _phash_dup_sql() -> str:
    """Image perceptual-hash dedup twin — mirrors stages/phash.py:
    the media synth pixel formula (MEDIA_FEATURES' Weyl chain) sampled
    on the 8x9 dHash grid, the one-bad-pixel perturbed copies, 63-bit
    difference hash via LEAD, then the SIMHASH_DUP banding + run-cap
    + hamming verify structure."""
    val = f"CAST(((seed + (flat + 1) * {_DECODE_MUL_SQL}) % {_U64}) // 72057594037927936 AS BIGINT)"
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, FALSE AS pert,
         ((md5_number(text) % {_U64}) + {_U64}) % {_U64} AS seed,
         32 + (doc_id % 4) * 16 AS w, 32 + (doc_id % 3) * 16 AS h
  FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + 10000000, TRUE,
         ((md5_number(text) % {_U64}) + {_U64}) % {_U64},
         32 + (doc_id % 4) * 16, 32 + (doc_id % 3) * 16
  FROM documents WHERE doc_id % 6 = 0
),
grid AS (
  SELECT media_id, gy.v AS y, gx.v AS x, pert, seed, w, h,
         ((gy.v * h) // 8) * w + ((gx.v * w) // 9) AS flat
  FROM m CROSS JOIN generate_series(0, 7) gy(v)
         CROSS JOIN generate_series(0, 8) gx(v)
),
vals AS (
  SELECT media_id, y, x,
         CASE WHEN pert AND flat = seed % (w * h)
              THEN ({val} + 7) % 256 ELSE {val} END AS val
  FROM grid
),
bits AS (
  SELECT media_id, y, x, val,
         LEAD(val) OVER (PARTITION BY media_id, y ORDER BY x) AS nxt
  FROM vals
),
sh AS (
  SELECT media_id AS doc_id,
         CAST(SUM(CASE WHEN x < 8 AND y * 8 + x < 63 AND val > nxt
              THEN CAST(power(2, y * 8 + x) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY media_id
),
bands AS (
  SELECT doc_id, simhash, b.b AS band,
         (simhash // CAST(power(2, b.b * 16) AS BIGINT)) % 65536 AS band_val
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
),
bandc AS (
  SELECT doc_id, simhash, band, band_val FROM bands
  QUALIFY row_number() OVER (PARTITION BY band, band_val ORDER BY doc_id) <= 1000
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bandc a JOIN bandc b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""


# Image perceptual-hash near-dup (decode -> dHash -> banded hamming)
# — mirrors stages/phash.phash_dup_pairs.
PHASH_DUP = _phash_dup_sql()


def _semdedup_sql() -> str:
    """SemDeDup twin — mirrors stages/semdedup.py: the KMEANS oracle
    chain as the cluster assignment, the normalize-then-floor coarse
    unit lattice (scale 1024), exact integer tau=0.8 test
    (25*dot^2 >= 16*|a|^2*|b|^2, dot > 0), min-partner keep rule."""
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
),
vars AS (
  SELECT -(v + 1) AS vec_id,
         list_transform(embedding, x -> x * f) AS embedding
  FROM (
    SELECT vec_id AS v,
           CAST(1.0 AS DOUBLE) + (CAST(vec_id % 5 AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(100.0 AS DOUBLE) AS f,
           CAST(embedding AS DOUBLE[]) AS embedding
    FROM embeddings WHERE vec_id % 7 = 0
  )
),
alls AS MATERIALIZED (SELECT * FROM base UNION ALL SELECT * FROM vars),
asgn AS MATERIALIZED ({_kmeans_sql(k=10, iters=3, src="alls")}),
unn AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS d
  FROM alls
),
nrm AS MATERIALIZED (
  SELECT vec_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS s
  FROM unn GROUP BY vec_id
),
qn AS MATERIALIZED (
  SELECT u.vec_id, u.d,
         CAST(FLOOR((CAST(u.v AS DOUBLE) / sqrt(n.s)) * 1024.0) AS BIGINT) AS q
  FROM unn u JOIN nrm n USING (vec_id)
),
na AS MATERIALIZED (SELECT vec_id, SUM(q * q) AS n2 FROM qn GROUP BY vec_id),
pair AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb, SUM(qa.q * qb.q) AS dot
  FROM asgn a JOIN asgn b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN qn qa ON qa.vec_id = a.vec_id
  JOIN qn qb ON qb.vec_id = b.vec_id AND qb.d = qa.d
  GROUP BY a.vec_id, b.vec_id
),
dup AS (
  SELECT va, vb FROM pair
  JOIN na x ON x.vec_id = va JOIN na y ON y.vec_id = vb
  WHERE dot > 0 AND 25 * dot * dot >= 16 * x.n2 * y.n2
),
edges AS (SELECT va AS v, vb AS w FROM dup UNION ALL SELECT vb, va FROM dup),
stats AS (SELECT v AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
                 MIN(w) AS mn FROM edges GROUP BY v)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       COALESCE(s.n_dups, 0) AS n_dups,
       CAST(CASE WHEN s.vec_id IS NULL OR s.mn > a.vec_id THEN 1 ELSE 0 END
            AS BIGINT) AS keep
FROM asgn a LEFT JOIN stats s USING (vec_id)
"""


# SemDeDup (cluster-then-compare semantic dedup) — mirrors
# stages/semdedup.semdedup.
SEMDEDUP = _semdedup_sql()


# Late-arrival accounting — mirrors stages/events.late_events: the
# per-user watermark is the running max event-time over PRIOR arrivals
# (arrival order = event_id); first arrival is never late.
LATE_EVENTS = """
SELECT event_id, user_id,
       CAST(GREATEST(COALESCE(MAX(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ) - epoch_us(ts), 0), 0) AS BIGINT) AS late_by_us
FROM events
"""


# Changelog compaction (upsert/CDC) — mirrors stages/events.
# compact_state: latest event per (user_id, event_type), ties by
# highest event_id, value in the EVENTS_WINDOW_FNS micro convention.
COMPACT_STATE = """
SELECT user_id, event_type,
       event_id AS last_event_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_tus,
       CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS last_value_micro
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
) = 1
"""


# Per-group robust statistics (exact median, exact MAD, 3-MAD outlier
# count) — mirrors stages/robust.robust_stats: the quantiles.py q=50
# rule applied twice, integer compares throughout.
ROBUST_STATS = """
WITH v AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
med AS (
  SELECT l_returnflag, MIN(cents) AS m FROM (
    SELECT l_returnflag, cents,
           SUM(COUNT(*)) OVER (PARTITION BY l_returnflag ORDER BY cents
                               ROWS UNBOUNDED PRECEDING) AS cum_n,
           SUM(COUNT(*)) OVER (PARTITION BY l_returnflag) AS total
    FROM v GROUP BY 1, 2
  ) WHERE cum_n >= (50 * total + 99) // 100
  GROUP BY l_returnflag
),
dev AS (
  SELECT v.l_returnflag, ABS(v.cents - med.m) AS adev
  FROM v JOIN med USING (l_returnflag)
),
mad AS (
  SELECT l_returnflag, MIN(adev) AS d FROM (
    SELECT l_returnflag, adev,
           SUM(COUNT(*)) OVER (PARTITION BY l_returnflag ORDER BY adev
                               ROWS UNBOUNDED PRECEDING) AS cum_n,
           SUM(COUNT(*)) OVER (PARTITION BY l_returnflag) AS total
    FROM dev GROUP BY 1, 2
  ) WHERE cum_n >= (50 * total + 99) // 100
  GROUP BY l_returnflag
)
SELECT v.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(med.m) AS BIGINT) AS median_cents,
       CAST(MIN(mad.d) AS BIGINT) AS mad_cents,
       CAST(SUM(CASE WHEN ABS(v.cents - med.m) > 3 * mad.d THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM v JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
GROUP BY v.l_returnflag
"""


# Temperature-balanced mixture sampling (p ∝ sqrt(n) with exact
# largest-remainder allocation) — mirrors stages/mixture.mix_sample:
# the DOMAIN_CAP fixture/rank chain with per-domain variable caps.
MIX_SAMPLE = f"""
WITH built AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END) || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
    || 'site' || CAST(doc_id % 23 AS VARCHAR)
    || (['.com', '.org', '.net', '.io', '.co.uk'])[(doc_id % 5) + 1]
    AS url
  FROM documents
),
parsed AS (
  SELECT doc_id,
    regexp_extract(
      regexp_replace(regexp_extract(url, '^https?://([^/?]+)', 1), '^www\\.', ''),
      '([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$', 1) AS regdom,
    (CAST(doc_id AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
      % {_U64} AS rh
  FROM built
),
cnt AS (SELECT regdom, CAST(COUNT(*) AS BIGINT) AS n FROM parsed GROUP BY 1),
w AS (SELECT regdom, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt FROM cnt),
tot AS (SELECT SUM(wt) AS W FROM w),
base AS (
  SELECT regdom, n, (200 * wt) // W AS b, (200 * wt) % W AS r
  FROM w, tot
),
extra AS (SELECT 200 - SUM(b) AS e FROM base),
ranked AS (
  SELECT regdom, n, b,
         row_number() OVER (ORDER BY r DESC, regdom) AS rn
  FROM base
),
alloc AS (
  SELECT regdom,
         LEAST(b + CASE WHEN rn <= (SELECT e FROM extra) THEN 1 ELSE 0 END, n)
           AS a
  FROM ranked
),
rankd AS (
  SELECT doc_id, regdom,
         CAST(row_number() OVER (PARTITION BY regdom ORDER BY rh, doc_id)
              AS BIGINT) AS dom_rank
  FROM parsed
)
SELECT r.doc_id, r.regdom, r.dom_rank
FROM rankd r JOIN alloc USING (regdom)
WHERE r.dom_rank <= alloc.a
"""


def _span_clean_sql() -> str:
    """Exact-substring-removal twin — mirrors stages/spans.py
    remove_dup_spans: the DUP_SPANS anchor chain kept per-OCCURRENCE
    (doc_id, i), duplicated = >=2 total occurrences, canonical = first
    by (doc_id, i); every other occurrence blanks tokens
    [i, i+SPAN_W-1]; docs are re-joined from their kept tokens."""
    from robosat_ray.stages.spans import SPAN_SAMPLE_MOD, SPAN_W

    b = 1099511628211
    expr = "list_extract(ths, CAST(p.i AS INTEGER))"
    for j in range(1, SPAN_W):
        expr = (
            f"((({expr}) * {b} + list_extract(ths, CAST(p.i + {j} AS INTEGER)))"
            f" % {_U64})"
        )
    return f"""
WITH docs_all AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, 'zzvariant' || substr(text, strpos(text, ' '))
  FROM documents WHERE doc_id % 5 = 0
),
toks AS MATERIALIZED (
  SELECT doc_id,
         string_split(text, ' ') AS ts,
         list_transform(string_split(text, ' '),
           t -> ((md5_number(t) % {_U64}) + {_U64}) % {_U64}) AS ths
  FROM docs_all
),
anchors AS MATERIALIZED (
  SELECT doc_id, i, h FROM (
    SELECT p.doc_id, p.i, {expr} AS h
    FROM (SELECT doc_id, ths, unnest(range(1, len(ths) - {SPAN_W - 2})) AS i
          FROM toks WHERE len(ths) >= {SPAN_W}) p
  ) WHERE h % {SPAN_SAMPLE_MOD} = 0
),
dup AS (SELECT h FROM anchors GROUP BY h HAVING COUNT(*) >= 2),
removals AS MATERIALIZED (
  SELECT doc_id, i FROM (
    SELECT a.doc_id, a.i,
           row_number() OVER (PARTITION BY a.h ORDER BY a.doc_id, a.i) AS rn
    FROM anchors a JOIN dup USING (h)
  ) WHERE rn > 1
),
tokpos AS (
  SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS p FROM toks
),
kept AS (
  SELECT tp.doc_id, tp.t, tp.p
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM removals r
    WHERE r.doc_id = tp.doc_id AND tp.p >= r.i AND tp.p < r.i + {SPAN_W}
  )
),
agg AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.ts) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


# Exact-substring removal (Lee et al. 2022 rewrite step) — mirrors
# stages/spans.remove_dup_spans over the dup_spans variant corpus.
SPAN_CLEAN = _span_clean_sql()


def _dbscan_sql() -> str:
    """Grid-DBSCAN twin (stages/dbscan.py contract): quantized-plane
    eps-pairs via a blocked self-join, core = degree+1 >= minPts,
    min-label CC over core-core edges as a recursive CTE, border =
    min core-neighbor cluster label, noise label -1."""
    n = float(1 << C.DB_Q)
    r, r2, mp = C.DB_R, C.DB_R * C.DB_R, C.DB_MINPTS
    return f"""
WITH RECURSIVE {points_cte()},
q AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * {n!r}) AS BIGINT) AS xq,
         CAST(floor(my * {n!r}) AS BIGINT) AS yq
  FROM pts
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM q a JOIN q b
    ON b.xq BETWEEN a.xq - {r} AND a.xq + {r}
   AND b.yq BETWEEN a.yq - {r} AND a.yq + {r}
   AND (a.xq - b.xq) * (a.xq - b.xq) + (a.yq - b.yq) * (a.yq - b.yq) <= {r2}
   AND a.doc_id < b.doc_id
),
deg AS (
  SELECT id, COUNT(*) AS d FROM (
    SELECT a AS id FROM pairs UNION ALL SELECT b AS id FROM pairs
  ) GROUP BY id
),
core AS (SELECT id AS doc_id FROM deg WHERE d + 1 >= {mp}),
ced AS (
  SELECT p.a, p.b FROM pairs p
  WHERE p.a IN (SELECT doc_id FROM core) AND p.b IN (SELECT doc_id FROM core)
),
ced2 AS (SELECT a, b FROM ced UNION ALL SELECT b AS a, a AS b FROM ced),
reach AS (
  SELECT doc_id AS id, doc_id AS l FROM core
  UNION
  SELECT e.b AS id, r.l AS l FROM reach r JOIN ced2 e ON e.a = r.id
),
lbl AS (SELECT id AS doc_id, MIN(l) AS label FROM reach GROUP BY id),
bord AS (
  SELECT x.nc AS doc_id, MIN(l.label) AS label FROM (
    SELECT p.b AS nc, p.a AS c FROM pairs p
    WHERE p.a IN (SELECT doc_id FROM core)
      AND p.b NOT IN (SELECT doc_id FROM core)
    UNION ALL
    SELECT p.a AS nc, p.b AS c FROM pairs p
    WHERE p.b IN (SELECT doc_id FROM core)
      AND p.a NOT IN (SELECT doc_id FROM core)
  ) x JOIN lbl l ON l.doc_id = x.c GROUP BY x.nc
)
SELECT q.doc_id,
       CASE WHEN lbl.label IS NOT NULL THEN 'core'
            WHEN bord.label IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(lbl.label, bord.label, -1) AS label
FROM q
LEFT JOIN lbl USING (doc_id)
LEFT JOIN bord USING (doc_id)
"""


# Grid-DBSCAN over the page points — mirrors stages/dbscan.dbscan.
DBSCAN = _dbscan_sql()


# Skyline / Pareto front on (max alpha-quality micro score, max token
# count) — mirrors stages/skyline.skyline. Metrics reuse the QUALITY
# and TOKEN_COUNT expressions; `//` is DuckDB's integer floor division
# (both operands nonnegative BIGINT, identical to numpy's).
SKYLINE = """
WITH m AS (
  SELECT doc_id,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
           * 1000000 // GREATEST(length(text), 1) AS score_micro,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT t.doc_id, t.score_micro, t.n_tokens FROM m t
WHERE NOT EXISTS (
  SELECT 1 FROM m o
  WHERE o.score_micro >= t.score_micro AND o.n_tokens >= t.n_tokens
    AND (o.score_micro > t.score_micro OR o.n_tokens > t.n_tokens))
"""


def _bfs_sql() -> str:
    """BFS twin (stages/bfs.py contract): the dbscan eps-pair graph,
    source = max-degree hub (tie min node), BFS_K-superstep wave as a
    recursive CTE with UNION dedup (state bounded at nodes x K), min
    depth per node, -1 for unreached / isolated points."""
    from robosat_ray.stages.bfs import BFS_K

    n = float(1 << C.DB_Q)
    r, r2 = C.DB_R, C.DB_R * C.DB_R
    return f"""
WITH RECURSIVE {points_cte()},
q AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * {n!r}) AS BIGINT) AS xq,
         CAST(floor(my * {n!r}) AS BIGINT) AS yq
  FROM pts
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM q a JOIN q b
    ON b.xq BETWEEN a.xq - {r} AND a.xq + {r}
   AND b.yq BETWEEN a.yq - {r} AND a.yq + {r}
   AND (a.xq - b.xq) * (a.xq - b.xq) + (a.yq - b.yq) * (a.yq - b.yq) <= {r2}
   AND a.doc_id < b.doc_id
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT src AS node, count(*) AS dg FROM edges GROUP BY 1),
s AS (SELECT node AS sn FROM deg ORDER BY dg DESC, node LIMIT 1),
wave AS (
  SELECT sn AS node, CAST(0 AS BIGINT) AS d FROM s
  UNION
  SELECT e.dst AS node, wave.d + 1 AS d
  FROM wave JOIN edges e ON e.src = wave.node WHERE wave.d < {BFS_K}
),
md AS (SELECT node, MIN(d) AS dist FROM wave GROUP BY node)
SELECT q.doc_id, COALESCE(md.dist, -1) AS dist
FROM q LEFT JOIN md ON md.node = q.doc_id
"""


# BFS hop distances over the eps-pair graph — mirrors
# stages/bfs.bfs_hops composed with stages/dbscan.eps_pairs.
BFS_HOPS = _bfs_sql()


# Hashed bigram LM fluency (CCNet-style, logarithm-free): unigram and
# adjacent-bigram occurrence counts feature-hashed into 2^18 buckets.
# Token hash th = md5_number(t) mod 2^64 (low-8-LE convention);
# unigram bucket = th % 2^18; bigram bucket =
# ((th1 * 1099511628211 + th2) mod 2^64) % 2^18 (the spans.py FNV
# fold, HUGEINT intermediates: th*B < 2^104).
# p_milli = (1000 * bigram_cnt) // unigram_cnt(t1) per pair,
# fluency_milli = floor-mean over the doc's bigrams (0 when none).
# Mirrors stages/lm.lm_fluency bit-for-bit, including the
# capped-by-construction hashed vocabulary.
LM_SCORE = f"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS o,
         ((md5_number(unnest(string_split(text, ' '))) % {_U64}) + {_U64}) % {_U64} AS th
  FROM documents
),
tb AS (
  SELECT doc_id, o, th, CAST(th % 262144 AS BIGINT) AS ub FROM toks
),
uc AS (SELECT ub, COUNT(*) AS c FROM tb GROUP BY ub),
big AS (
  SELECT a.doc_id, a.ub,
         CAST(((a.th * 1099511628211 + b.th) % {_U64}) % 262144 AS BIGINT) AS bb
  FROM tb a JOIN tb b ON b.doc_id = a.doc_id AND b.o = a.o + 1
),
bc AS (SELECT bb, COUNT(*) AS c FROM big GROUP BY bb),
sc AS (
  SELECT big.doc_id, COUNT(*) AS nb, SUM((1000 * bc.c) // uc.c) AS s
  FROM big JOIN uc ON uc.ub = big.ub JOIN bc ON bc.bb = big.bb
  GROUP BY big.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(sc.s // sc.nb, 0) AS BIGINT) AS fluency_milli
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
"""


def _sssp_sql() -> str:
    """SSSP twin (stages/sssp.py contract): the eps-pair graph with
    integer weights w = 1 + d2 (quantized squared distance), source =
    max-degree hub (tie min node), SSSP_K Bellman-Ford rounds UNROLLED
    as K groupby-min levels (the pagerank/kmeans unrolled-CTE house
    pattern — state bounded at nodes per level, no recursion), -1 for
    nodes unreached within K hops / isolated points."""
    from robosat_ray.stages.sssp import SSSP_K

    n = float(1 << C.DB_Q)
    r, r2 = C.DB_R, C.DB_R * C.DB_R
    prev = "r0"
    levels = []
    for i in range(1, SSSP_K + 1):
        levels.append(
            f"""r{i} AS (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM {prev}
    UNION ALL
    SELECT e.dst AS node, {prev}.d + e.w AS d
    FROM {prev} JOIN edges e ON e.src = {prev}.node
  ) GROUP BY node
)"""
        )
        prev = f"r{i}"
    lvl_sql = ",\n".join(levels)
    return f"""
WITH {points_cte()},
q AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * {n!r}) AS BIGINT) AS xq,
         CAST(floor(my * {n!r}) AS BIGINT) AS yq
  FROM pts
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         (a.xq - b.xq) * (a.xq - b.xq) + (a.yq - b.yq) * (a.yq - b.yq) AS d2
  FROM q a JOIN q b
    ON b.xq BETWEEN a.xq - {r} AND a.xq + {r}
   AND b.yq BETWEEN a.yq - {r} AND a.yq + {r}
   AND (a.xq - b.xq) * (a.xq - b.xq) + (a.yq - b.yq) * (a.yq - b.yq) <= {r2}
   AND a.doc_id < b.doc_id
),
edges AS (
  SELECT a AS src, b AS dst, 1 + d2 AS w FROM pairs
  UNION ALL
  SELECT b, a, 1 + d2 FROM pairs
),
deg AS (SELECT src AS node, count(*) AS dg FROM edges GROUP BY 1),
s AS (SELECT node AS sn FROM deg ORDER BY dg DESC, node LIMIT 1),
r0 AS (SELECT sn AS node, CAST(0 AS BIGINT) AS d FROM s),
{lvl_sql}
SELECT q.doc_id, CAST(COALESCE({prev}.d, -1) AS BIGINT) AS wdist
FROM q LEFT JOIN {prev} ON {prev}.node = q.doc_id
"""


# Weighted shortest paths over the eps-pair graph — mirrors
# stages/sssp.sssp composed with stages/dbscan.eps_pairs(with_d2).
SSSP = _sssp_sql()


def _label_prop_sql() -> str:
    """Label-propagation twin (stages/labelprop.py contract): the
    eps-pair graph, l_0(n) = n for EVERY point (isolated points are
    their own community), LP_K synchronous min-label rounds UNROLLED
    as K groupby-min levels; community = l_K."""
    from robosat_ray.stages.labelprop import LP_K

    n = float(1 << C.DB_Q)
    r, r2 = C.DB_R, C.DB_R * C.DB_R
    prev = "r0"
    levels = []
    for i in range(1, LP_K + 1):
        levels.append(
            f"""r{i} AS (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT node, lbl FROM {prev}
    UNION ALL
    SELECT e.dst AS node, {prev}.lbl AS lbl
    FROM {prev} JOIN edges e ON e.src = {prev}.node
  ) GROUP BY node
)"""
        )
        prev = f"r{i}"
    lvl_sql = ",\n".join(levels)
    return f"""
WITH {points_cte()},
q AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * {n!r}) AS BIGINT) AS xq,
         CAST(floor(my * {n!r}) AS BIGINT) AS yq
  FROM pts
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM q a JOIN q b
    ON b.xq BETWEEN a.xq - {r} AND a.xq + {r}
   AND b.yq BETWEEN a.yq - {r} AND a.yq + {r}
   AND (a.xq - b.xq) * (a.xq - b.xq) + (a.yq - b.yq) * (a.yq - b.yq) <= {r2}
   AND a.doc_id < b.doc_id
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
r0 AS (SELECT doc_id AS node, doc_id AS lbl FROM q),
{lvl_sql}
SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community FROM {prev}
"""


# K-round min-label communities over the eps-pair graph — mirrors
# stages/labelprop.label_prop composed with stages/dbscan.eps_pairs.
LABEL_PROP = _label_prop_sql()


def _tile_pyramid_sql() -> str:
    """Pyramid twin (q_tile_pyramid contract): leaf-cell page counts
    at Z_JOIN, rolled up to every zoom level via ancestor fan-out."""
    z_top = C.Z_JOIN
    return f"""
WITH {points_cte()},
leaf AS (
  SELECT {tile_x('lon')} AS tx, {tile_y('my')} AS ty,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
)
SELECT g.z,
       leaf.tx // (1 << ({z_top} - g.z)) AS tx,
       leaf.ty // (1 << ({z_top} - g.z)) AS ty,
       CAST(SUM(n) AS BIGINT) AS n_pages
FROM leaf, generate_series(0, {z_top}) g(z)
GROUP BY 1, 2, 3
"""


# Full tile-pyramid rollup — mirrors q_tile_pyramid.
TILE_PYRAMID = _tile_pyramid_sql()


# Audience-overlap matrix — mirrors stages/audience.audience_overlap:
# distinct-user Jaccard components per unordered event-type pair.
AUDIENCE_OVERLAP = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM ut GROUP BY 1),
i AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS isz
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.ta, i.tb, i.isz AS inter_users, na.c + nb.c - i.isz AS union_users
FROM i
JOIN n na ON na.event_type = i.ta
JOIN n nb ON nb.event_type = i.tb
ORDER BY 1, 2
"""


# Exact tau-Jaccard set-similarity self-join, brute force: the engine
# (stages/ppjoin.py) mines candidates with the PPJoin prefix filter,
# which is COMPLETE by the pigeonhole principle, so the ground truth
# is the plain all-pairs join over hashed unique token sets — no cap
# or heuristic to mirror. tau = 9/10: keep 19*inter >= 9*(nA + nB).
# Scoped to the doc_id % 10 == 0 subset (see stages/ppjoin.py spec).
PPJOIN = f"""
WITH docs_all AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 10000000, 'zzvariant' || substr(text, strpos(text, ' '))
  FROM documents WHERE doc_id % 10 = 0
),
tok AS (
  SELECT DISTINCT doc_id,
         (((md5_number(t) % {_U64}) + {_U64}) % {_U64}) AS th
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM docs_all)
),
n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
i AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS isz
  FROM tok x JOIN tok y ON x.th = y.th AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, i.isz AS inter_sz, na.n + nb.n - i.isz AS union_sz
FROM i
JOIN n na ON na.doc_id = i.a
JOIN n nb ON nb.doc_id = i.b
WHERE 19 * i.isz >= 9 * (na.n + nb.n)
ORDER BY 1, 2
"""


def _kcore_sql() -> str:
    """K-core twin (stages/kcore.py contract): the eps-pair graph,
    PEEL_ROUNDS peel rounds UNROLLED as survivor-set levels (a_i =
    a_{i-1} nodes with degree >= CORE_K within a_{i-1}; the monotone
    twin of the sssp/pagerank unrolled house pattern — state bounded
    at nodes per level, no recursion). Output: in_core 0/1 membership
    of the final survivor set, core_deg = degree within it (0 for a
    survivor that lost every neighbor in the last round), -1 for
    peeled / isolated nodes."""
    from robosat_ray.stages.kcore import CORE_K, PEEL_ROUNDS

    n = float(1 << C.DB_Q)
    r, r2 = C.DB_R, C.DB_R * C.DB_R
    prev = "a0"
    levels = []
    for i in range(1, PEEL_ROUNDS + 1):
        levels.append(
            f"""a{i} AS (
  SELECT e.src AS node FROM edges e
  JOIN {prev} s ON e.src = s.node
  JOIN {prev} t ON e.dst = t.node
  GROUP BY e.src HAVING count(*) >= {CORE_K}
)"""
        )
        prev = f"a{i}"
    lvl_sql = ",\n".join(levels)
    return f"""
WITH {points_cte()},
q AS (
  SELECT doc_id,
         CAST(floor((lon + 180.0) / 360.0 * {n!r}) AS BIGINT) AS xq,
         CAST(floor(my * {n!r}) AS BIGINT) AS yq
  FROM pts
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM q a JOIN q b
    ON b.xq BETWEEN a.xq - {r} AND a.xq + {r}
   AND b.yq BETWEEN a.yq - {r} AND a.yq + {r}
   AND (a.xq - b.xq) * (a.xq - b.xq) + (a.yq - b.yq) * (a.yq - b.yq) <= {r2}
   AND a.doc_id < b.doc_id
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
a0 AS (SELECT DISTINCT src AS node FROM edges),
{lvl_sql},
cd AS (
  SELECT e.src AS node, count(*) AS cdeg FROM edges e
  JOIN {prev} s ON e.src = s.node
  JOIN {prev} t ON e.dst = t.node
  GROUP BY e.src
)
SELECT q.doc_id,
       CAST(CASE WHEN {prev}.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
       CAST(CASE WHEN {prev}.node IS NULL THEN -1
                 ELSE COALESCE(cd.cdeg, 0) END AS BIGINT) AS core_deg
FROM q
LEFT JOIN {prev} ON {prev}.node = q.doc_id
LEFT JOIN cd ON cd.node = q.doc_id
"""


# Fixed-round k-core peeling over the eps-pair graph — mirrors
# stages/kcore.kcore composed with stages/dbscan.eps_pairs.
KCORE = _kcore_sql()


# --- OLS quality-model fit (stages/regress.py contract) ---
# Sufficient statistics in HUGEINT (exact, like the engine's
# Python-int driver accumulate), Cramer 3x3 in DOUBLE with the
# IDENTICAL expression tree as regress.cramer3_micro (the contract:
# both sides round bit-identically), betas floored to int64 micros.
_OLS_CTE = """
feat AS (
  SELECT doc_id,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS y,
         CAST(len(string_split_regex(text, '[ ]+')) AS BIGINT) AS x1,
         CAST(length(text) AS BIGINT) AS x2
  FROM documents
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x1 AS HUGEINT)) AS sx1,
         SUM(CAST(x2 AS HUGEINT)) AS sx2,
         SUM(CAST(y  AS HUGEINT)) AS sy,
         SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
         SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
         SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
         SUM(CAST(x1 AS HUGEINT) * y)  AS s1y,
         SUM(CAST(x2 AS HUGEINT) * y)  AS s2y
  FROM feat
),
d AS (
  SELECT CAST(n AS DOUBLE) AS n, CAST(sx1 AS DOUBLE) AS sx1,
         CAST(sx2 AS DOUBLE) AS sx2, CAST(sy AS DOUBLE) AS sy,
         CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
         CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y,
         CAST(s2y AS DOUBLE) AS s2y
  FROM s
),
dets AS (
  SELECT
    n * (s11 * s22 - s12 * s12)
      - sx1 * (sx1 * s22 - s12 * sx2)
      + sx2 * (sx1 * s12 - s11 * sx2) AS det,
    sy * (s11 * s22 - s12 * s12)
      - sx1 * (s1y * s22 - s12 * s2y)
      + sx2 * (s1y * s12 - s11 * s2y) AS d0,
    n * (s1y * s22 - s12 * s2y)
      - sy * (sx1 * s22 - s12 * sx2)
      + sx2 * (sx1 * s2y - s1y * sx2) AS d1,
    n * (s11 * s2y - s1y * s12)
      - sx1 * (sx1 * s2y - s1y * sx2)
      + sy * (sx1 * s12 - s11 * sx2) AS d2
  FROM d
),
b AS (
  SELECT CAST(FLOOR(d0 / det * 1000000.0) AS BIGINT) AS b0_micro,
         CAST(FLOOR(d1 / det * 1000000.0) AS BIGINT) AS b1_micro,
         CAST(FLOOR(d2 / det * 1000000.0) AS BIGINT) AS b2_micro
  FROM dets
)
"""

# One-row model fit: n_alpha ~ b0 + b1*n_tokens + b2*n_chars.
OLS_FIT = f"""
WITH {_OLS_CTE}
SELECT CAST(s.n AS BIGINT) AS n_docs, b.b0_micro, b.b1_micro, b.b2_micro
FROM s, b
"""

# Top-k curation outliers by |integer residual|, tie doc_id asc.
OLS_RESIDUALS = f"""
WITH {_OLS_CTE}
SELECT feat.doc_id,
       1000000 * feat.y
         - (b.b0_micro + b.b1_micro * feat.x1 + b.b2_micro * feat.x2)
         AS resid_micro
FROM feat, b
ORDER BY ABS(1000000 * feat.y
         - (b.b0_micro + b.b1_micro * feat.x1 + b.b2_micro * feat.x2)) DESC,
         feat.doc_id ASC
LIMIT 20
"""


# TPC-H-Q2-shaped argmin-per-group join-back (q_cheapest_supplier):
# two-key argmin (price_cents, suppkey) encoded into one BIGINT
# (price_cents * 2^20 + suppkey), exactly the engine's reduction.
CHEAPEST_SUPPLIER = """
WITH li AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM lineitem
),
m AS (
  SELECT l_partkey AS p_partkey,
         MIN(price_cents * 1048576 + l_suppkey) AS enc
  FROM li GROUP BY 1
)
SELECT m.p_partkey,
       enc // 1048576 AS min_price_cents,
       enc % 1048576 AS s_suppkey,
       s.s_name
FROM m JOIN supplier s ON s.s_suppkey = enc % 1048576
"""


def _idw_sql() -> str:
    """IDW interpolation to tile centers — mirrors
    stages/interp.idw_tile_interp: ONE float floor() quantizes each
    page onto the global 256px-per-tile pixel lattice with the
    IDENTICAL expression tree ((lon+180)/360*4096 then *256), then
    weights / sums / the final milli ratio are pure integer ops
    (HUGEINT sums == the engine's exact Python-int finisher)."""
    from robosat_ray.stages.interp import IDW_WSCALE

    cxx = "((px // 256) + dx) * 256 + 128"
    cyy = "((py // 256) + dy) * 256 + 128"
    return f"""
WITH {points_cte()},
p AS (
  SELECT CAST(floor((pts.lon + 180.0) / 360.0 * {_N!r} * 256.0) AS BIGINT) AS px,
         CAST(floor(pts.my * {_N!r} * 256.0) AS BIGINT) AS py,
         d.n_chars AS v
  FROM pts JOIN documents d USING (doc_id)
),
nbr AS (
  SELECT dx, dy
  FROM (VALUES (-1), (0), (1)) AS dxs(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) AS dys(dy)
),
c AS (
  SELECT (px // 256) + dx AS qx, (py // 256) + dy AS qy,
         {IDW_WSCALE} // ((px - ({cxx})) * (px - ({cxx}))
                        + (py - ({cyy})) * (py - ({cyy})) + 1) AS w,
         v,
         CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END AS own
  FROM p CROSS JOIN nbr
)
SELECT qx AS tile_x, qy AS tile_y,
       CAST(SUM(own) AS BIGINT) AS n_own,
       CAST(SUM(w) AS BIGINT) AS wsum,
       CAST((SUM(w * v) * 1000) // SUM(w) AS BIGINT) AS idw_milli
FROM c
GROUP BY 1, 2
HAVING SUM(own) > 0
"""


# IDW surface estimate over the occupied tile lattice — mirrors
# stages/interp.idw_tile_interp (3x3 halo contributions, integer
# weights, exact floor-ratio finisher).
IDW_INTERP = _idw_sql()


def _colloc_sql() -> str:
    """Collocation lift — mirrors stages/text_ops.colloc_lift: the
    same tokenizer as TOP_BIGRAMS, lift as ONE HUGEINT floor division
    (== the engine's Python-int numerator), min-count floor, tiebreak
    lift_ppm DESC then bigram ASC."""
    from robosat_ray.stages.text_ops import COLLOC_MIN_COUNT

    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ts FROM documents
),
idx AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tok
),
bc AS (
  SELECT ts[i] AS l, ts[i + 1] AS r, CAST(count(*) AS HUGEINT) AS c
  FROM idx GROUP BY 1, 2
),
uc AS (
  SELECT token, CAST(count(*) AS HUGEINT) AS c
  FROM (SELECT unnest(ts) AS token FROM tok) GROUP BY 1
),
tot AS (SELECT SUM(c) AS t FROM uc),
nbi AS (SELECT SUM(c) AS nb FROM bc)
SELECT bc.l || ' ' || bc.r AS bigram,
       CAST(bc.c AS BIGINT) AS total,
       CAST((bc.c * tot.t * tot.t * 1000000) // (nbi.nb * lx.c * rx.c)
            AS BIGINT) AS lift_ppm,
       CAST(row_number() OVER (
         ORDER BY (bc.c * tot.t * tot.t * 1000000) // (nbi.nb * lx.c * rx.c) DESC,
                  bc.l || ' ' || bc.r ASC) AS BIGINT) AS rank
FROM bc
JOIN uc lx ON lx.token = bc.l
JOIN uc rx ON rx.token = bc.r
CROSS JOIN tot CROSS JOIN nbi
WHERE bc.c >= {COLLOC_MIN_COUNT}
ORDER BY lift_ppm DESC, bigram ASC
LIMIT 25
"""


# Collocation lift (exact integer PMI-family score) — mirrors
# stages/text_ops.colloc_lift.
COLLOC_LIFT = _colloc_sql()


def _nearest_foot_sql() -> str:
    """Nearest-footprint map matching — mirrors
    stages/mapmatch.nearest_footprint: footprint centers recomputed
    from scratch (NOT (minx+maxx)/2 — IEEE does not round back),
    both sides quantized to micro ints on the knn (lon, my*360)
    plane, candidates ring-bounded to the 3x3 tile neighborhood of
    the page, winner = min (d2q, feature_id)."""
    return f"""
WITH {points_cte()},
fcent AS (
  SELECT p_partkey AS feature_id,
         list_extract(['building', 'road', 'water', 'parking'], CAST(p_partkey % 4 AS INTEGER) + 1) AS kind,
         CASE WHEN p_partkey % 10 < 6 THEN
           list_extract({_CITY_LON}, CAST(p_partkey % 8 AS INTEGER) + 1)
             + (((p_partkey * {C.G1_MUL} + {C.G1_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_LON_SPAN!r}
         ELSE ((p_partkey * {C.G1_MUL} + {C.G1_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} * 360.0 - 180.0 END AS cx,
         CASE WHEN p_partkey % 10 < 6 THEN
           list_extract({_CITY_MY}, CAST(p_partkey % 8 AS INTEGER) + 1)
             + (((p_partkey * {C.G2_MUL} + {C.G2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_MY_SPAN!r}
         ELSE {C.BG_MY_LO!r} + (((p_partkey * {C.G2_MUL} + {C.G2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r}) * {C.BG_MY_RANGE!r} END AS cy
  FROM part
),
fq AS (
  SELECT feature_id, kind,
         CAST(floor(cx * 1000000.0) AS BIGINT) AS cxq,
         CAST(floor(cy * 360.0 * 1000000.0) AS BIGINT) AS cyq,
         {tile_x('cx')} AS ftx, {tile_y('cy')} AS fty
  FROM fcent
),
pq AS (
  SELECT doc_id,
         CAST(floor(lon * 1000000.0) AS BIGINT) AS xq,
         CAST(floor(my * 360.0 * 1000000.0) AS BIGINT) AS yq,
         {tile_x('lon')} AS tx, {tile_y('my')} AS ty
  FROM pts
),
cand AS (
  SELECT p.doc_id, f.feature_id, f.kind,
         (p.xq - f.cxq) * (p.xq - f.cxq) + (p.yq - f.cyq) * (p.yq - f.cyq) AS d2q
  FROM pq p JOIN fq f
    ON f.ftx BETWEEN p.tx - 1 AND p.tx + 1
   AND f.fty BETWEEN p.ty - 1 AND p.ty + 1
)
SELECT doc_id, feature_id, kind, d2q
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY d2q, feature_id) AS rn
  FROM cand
)
WHERE rn = 1
"""


# Nearest-footprint map matching (bounded-ring NN join) — mirrors
# stages/mapmatch.nearest_footprint.
NEAREST_FOOT = _nearest_foot_sql()


# TPC-H-Q14-shaped promo revenue share: revenue in exact integer
# cents (the pricing_summary floor idiom), share as ONE HUGEINT floor
# division == the engine's Python-int 1-row finisher.
PROMO_SHARE = """
WITH f AS (
  SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev,
         p_type = 'PROMO' AS ispromo
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
)
SELECT CAST(SUM(CASE WHEN ispromo THEN rev ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       CAST((SUM(CASE WHEN ispromo THEN rev ELSE 0 END) * 1000000) // SUM(rev)
            AS BIGINT) AS promo_share_micro
FROM f
"""


def _event_transitions_sql() -> str:
    """Markov transitions — mirrors stages/events.event_transitions:
    lead() per user ordered by (ts, event_id), pairs kept only when
    the gap stays under the session break (sessionize's rule negated)."""
    from robosat_ray.stages.events import SESSION_GAP_US

    return f"""
WITH w AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS gap
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type, CAST(count(*) AS BIGINT) AS n
FROM w
WHERE nxt IS NOT NULL AND gap < {SESSION_GAP_US}
GROUP BY 1, 2
"""


# Same-session event-type transition counts (sequence mining) —
# mirrors stages/events.event_transitions.
EVENT_TRANSITIONS = _event_transitions_sql()


# Market-basket co-occurrence: distinct part pairs per order, top-25
# by count (tie part_a, part_b asc) — mirrors q_basket_pairs.
BASKET_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n,
       CAST(row_number() OVER (
         ORDER BY count(*) DESC, a.l_partkey, b.l_partkey) AS BIGINT) AS rank
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n DESC, part_a, part_b
LIMIT 25
"""


def _zonal_sql() -> str:
    """Zonal statistics — mirrors q_zonal_stats: the flagship PIP
    join (inclusive rect edges, identical predicate to SPATIAL_JOIN)
    grouped per footprint zone with the page payload attached."""
    return f"""
WITH {points_cte()}, {feet_cte()},
j AS (
  SELECT p.doc_id, f.feature_id
  FROM pts p JOIN feet f
    ON p.lon >= f.minx AND p.lon <= f.maxx
   AND p.my >= f.miny AND p.my <= f.maxy
)
SELECT j.feature_id,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
       MIN(j.doc_id) AS min_doc,
       MAX(j.doc_id) AS max_doc
FROM j JOIN documents d USING (doc_id)
GROUP BY 1
"""


# Per-footprint-zone page statistics (zonal stats) — mirrors
# q_zonal_stats.
ZONAL_STATS = _zonal_sql()


# Per-doc keyword (argmax tf * idf_milli, tie token ASC) — mirrors
# stages/text_ops.doc_keywords; same hashed-bucket idf as DOC_RARITY.
DOC_KEYWORDS = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf,
         CAST((((md5_number(t) % {_U64}) + {_U64}) % {_U64}) % 262144 AS BIGINT) AS b
  FROM tok GROUP BY doc_id, t
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (
  SELECT b, (1000 * n.n_docs) // COUNT(DISTINCT doc_id) AS idf_milli
  FROM tf, n GROUP BY b, n.n_docs
),
sc AS (
  SELECT tf.doc_id, tf.t, tf.tf * i.idf_milli AS score
  FROM tf JOIN idf i ON i.b = tf.b
)
SELECT doc_id, t AS keyword, CAST(score AS BIGINT) AS tfidf_milli
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t ASC) AS rn
  FROM sc
)
WHERE rn = 1
"""


# Per-user union of overlapping [ts, ts + value-seconds) intervals —
# mirrors stages/events.interval_union: island break where a start
# exceeds the running max of all previous ends in the user partition.
INTERVAL_UNION = """
WITH iv AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) AS s,
         CAST(epoch_us(ts) AS BIGINT)
           + GREATEST(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT), 0) AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -4611686018427387904)
         THEN 1 ELSE 0 END AS brk
  FROM iv
),
g AS (
  SELECT user_id, s, e,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
),
i AS (SELECT user_id, isl, MIN(s) AS st, MAX(e) AS en FROM g GROUP BY user_id, isl)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(en - st) AS BIGINT) AS covered_micro
FROM i GROUP BY user_id
"""


# Edit-distance near-dup pairs — mirrors stages/neardup.edit_dup_pairs_ds:
# block on (lang, first-8 chars), cap each block to its 256 smallest
# doc_ids (same contract as SIMHASH_DUP's QUALIFY), exact Levenshtein
# over the first-64-char slices.
EDIT_DUP = """
WITH b AS (
  SELECT doc_id, lang, substr(text, 1, 8) AS pfx, substr(text, 1, 64) AS s64
  FROM documents
),
c AS (
  SELECT * FROM b
  QUALIFY row_number() OVER (PARTITION BY lang, pfx ORDER BY doc_id) <= 256
)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(levenshtein(x.s64, y.s64) AS BIGINT) AS dist
FROM c x JOIN c y ON x.lang = y.lang AND x.pfx = y.pfx AND x.doc_id < y.doc_id
WHERE levenshtein(x.s64, y.s64) <= 8
"""


# TPC-H-Q15-shape top supplier(s) by 1996Q1 revenue (ties kept) —
# mirrors q_top_supplier; same per-row cents quantization as
# ORDER_REVENUE(1014).
TOP_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_rev_cents
FROM r JOIN supplier s USING (s_suppkey)
WHERE r.total_rev_cents = (SELECT MAX(total_rev_cents) FROM r)
"""


# Per-user CUSUM alerts — mirrors stages/events.cusum_alerts: the
# closed form s_i = P_i - min(0, cummin P_i) replaces the recursion,
# so plain window functions express it exactly.
CUSUM_ALERTS = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) - 6000 AS z
  FROM events
),
p AS (
  SELECT user_id, ts, event_id, z,
         SUM(z) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS cp
  FROM e
),
q AS (
  SELECT user_id, cp,
         MIN(cp) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS cm
  FROM p
),
s AS (SELECT user_id, cp - LEAST(cm, 0) AS stat FROM q)
SELECT user_id,
       CAST(SUM(CASE WHEN stat > 40000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
       CAST(MAX(stat) AS BIGINT) AS max_stat
FROM s GROUP BY user_id
"""


# Per-user exact-rational OLS slope — mirrors stages/events.user_trend
# (x = day - 19700, y = cents; DuckDB's HUGEINT moments cast back to
# BIGINT, overflow would fail loudly on both sides).
USER_TREND = """
WITH e AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 - 19700 AS BIGINT) AS x,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM e GROUP BY user_id
"""


# Per-user time-weighted average value (LOCF integral) as an exact
# rational — mirrors stages/events.twap.
TWAP = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_id,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT user_id, cents,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dt
  FROM e
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(dt * cents), 0) AS BIGINT) AS twap_num,
       CAST(COALESCE(SUM(dt), 0) AS BIGINT) AS twap_den
FROM d GROUP BY user_id
"""


# Reciprocal-rank fusion of the quality micro-score rank and the
# length rank — mirrors stages/rank.rrf_fusion (same score expr as
# QUALITY_RANK; integer division only).
RRF_FUSION = """
WITH s AS (
  SELECT doc_id,
         CAST(FLOOR(1000000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / GREATEST(length(text), 1) + 0.5) AS BIGINT) AS q,
         CAST(n_chars AS BIGINT) AS l
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(RANK() OVER (ORDER BY q DESC) AS BIGINT) AS rank_q,
         CAST(RANK() OVER (ORDER BY l DESC) AS BIGINT) AS rank_l
  FROM s
),
f AS (
  SELECT doc_id, rank_q, rank_l,
         CAST(1000000000 // (60 + rank_q)
            + 1000000000 // (60 + rank_l) AS BIGINT) AS rrf
  FROM r
)
SELECT doc_id, rank_q, rank_l, rrf
FROM f
QUALIFY row_number() OVER (ORDER BY rrf DESC, doc_id) <= 50
"""


# Entity resolution: EDIT_DUP match pairs -> connected components ->
# canonical labels — mirrors stages/neardup.entity_clusters (same
# reach/lab/sz shape as DUP_CLUSTERS).
ENTITY_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({EDIT_DUP}),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach(node, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.m FROM edges e JOIN reach r ON r.node = e.b
),
lab AS (SELECT node, MIN(m) AS cluster_id FROM reach GROUP BY node),
sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       FROM lab GROUP BY cluster_id)
SELECT d.doc_id,
       COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(s.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
       CAST(CASE WHEN COALESCE(l.cluster_id, d.doc_id) = d.doc_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d
LEFT JOIN lab l ON l.node = d.doc_id
LEFT JOIN sz s ON s.cluster_id = COALESCE(l.cluster_id, d.doc_id)
"""


# Leakage-safe split — DUP_CLUSTERS labels + the SAMPLE_STRATIFIED
# Knuth-hash threshold applied to the CLUSTER id.
SAFE_SPLIT = f"""
SELECT doc_id, cluster_id,
       CASE WHEN ((CAST(cluster_id % 4294967296 AS HUGEINT) * 2654435761 + 7)
                  % 4294967296) < {int(0.1 * 4294967296)}
            THEN 'val' ELSE 'train' END AS split
FROM ({DUP_CLUSTERS}) t
"""


# IVF retrieval quality vs the exact scan — recall@k per query, the
# eval-harness composition of ANN (ground truth) and ANN_IVF.
ANN_RECALL = f"""
WITH brute AS ({ANN}),
ivf AS ({ANN_IVF})
SELECT b.query_id,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS BIGINT) AS k
FROM brute b
LEFT JOIN ivf i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
GROUP BY b.query_id
"""


# SCD type-2 state intervals — mirrors stages/timeline.scd2: every
# event becomes a validity interval per (user_id, event_type); the
# open interval is pinned to timeline.SCD2_OPEN_US (2100-01-01).
SCD2 = """
SELECT user_id, event_type, event_id AS state_event_id,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(COALESCE(lead(epoch_us(ts)) OVER (
              PARTITION BY user_id, event_type ORDER BY ts, event_id),
            4102444800000000) AS BIGINT) AS valid_to_us,
       CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS value_micro
FROM events
"""


# Hourly grid resample + forward fill — mirrors stages/timeline.gap_fill:
# generate_series over each user's [ceil(min/h), floor(max/h)] hour
# span, ASOF-joined to the latest event at or before the hour boundary
# (same-instant ties collapsed to the highest event_id first).
GAP_FILL = """
WITH b AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vmicro
  FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id, epoch_us(ts) ORDER BY event_id DESC) = 1
),
sp AS (
  SELECT user_id,
         (MIN(tus) + 3599999999) // 3600000000 AS h0,
         MAX(tus) // 3600000000 AS h1
  FROM b GROUP BY 1
),
grid AS (
  SELECT user_id, CAST(UNNEST(generate_series(h0, h1)) AS BIGINT) AS hour_id
  FROM sp WHERE h1 >= h0
)
SELECT g.user_id, g.hour_id, b.event_id AS asof_event_id,
       b.vmicro AS value_micro
FROM grid g ASOF JOIN b
  ON g.user_id = b.user_id AND g.hour_id * 3600000000 >= b.tus
"""


# Exact dyadic EWMA (alpha = 1/2, trailing 16 events) — mirrors
# stages/timeline.ewma: integer weights 2^(15-k) keep both sides
# bit-exact; the bounded self-join is the SQL form of the window.
EWMA = """
WITH b AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vmicro,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT cur.event_id, cur.user_id,
       CAST(SUM(past.vmicro *
            (CAST(1 AS BIGINT) << CAST(15 - (cur.rn - past.rn) AS INTEGER)))
         AS BIGINT) AS ewma_num,
       CAST(SUM(CAST(1 AS BIGINT) << CAST(15 - (cur.rn - past.rn) AS INTEGER))
         AS BIGINT) AS ewma_den
FROM b cur JOIN b past
  ON cur.user_id = past.user_id AND past.rn BETWEEN cur.rn - 15 AND cur.rn
GROUP BY cur.event_id, cur.user_id
"""


def _session_paths_sql() -> str:
    """Session trigram paths — mirrors stages/timeline.session_paths:
    two leads per user ordered by (ts, event_id), kept only when both
    links stay under the session gap."""
    from robosat_ray.stages.events import SESSION_GAP_US

    return f"""
WITH w AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER win AS b2,
         lead(event_type, 2) OVER win AS c,
         lead(epoch_us(ts), 1) OVER win - epoch_us(ts) AS gap1,
         lead(epoch_us(ts), 2) OVER win
           - lead(epoch_us(ts), 1) OVER win AS gap2
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT a || '>' || b2 || '>' || c AS path, CAST(count(*) AS BIGINT) AS n
FROM w
WHERE c IS NOT NULL AND gap1 < {SESSION_GAP_US} AND gap2 < {SESSION_GAP_US}
GROUP BY 1
"""


SESSION_PATHS = _session_paths_sql()


def _moran_sql() -> str:
    """Global Moran's I integer components — mirrors
    stages/spatial_stats.moran_i: per-tile page counts at the join
    zoom, rook adjacency (ordered pairs), mean-centering folded into
    exact integers via z_i = N*n_i - S."""
    return f"""
WITH {points_cte()},
t AS (SELECT {cell('lon', 'my')} AS c, CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY 1),
tt AS (SELECT c // {_NI} AS tx, c % {_NI} AS ty, n FROM t),
adj AS (
  SELECT a.n AS ni, b.n AS nj
  FROM tt a
  JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) d(dx, dy) ON TRUE
  JOIN tt b ON b.tx = a.tx + d.dx AND b.ty = a.ty + d.dy
),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nt,
               CAST(SUM(n) AS HUGEINT) AS s,
               CAST(SUM(n * n) AS HUGEINT) AS sn2 FROM tt),
w AS (SELECT CAST(COUNT(*) AS HUGEINT) AS wp,
             CAST(COALESCE(SUM(ni * nj), 0) AS HUGEINT) AS p1,
             CAST(COALESCE(SUM(ni + nj), 0) AS HUGEINT) AS p2 FROM adj)
SELECT CAST(nt AS BIGINT) AS n_tiles,
       CAST(wp AS BIGINT) AS w_pairs,
       CAST(nt * nt * p1 - nt * s * p2 + s * s * wp AS BIGINT) AS moran_num,
       CAST(nt * nt * sn2 - nt * s * s AS BIGINT) AS moran_den
FROM tot, w
"""


MORAN = _moran_sql()


def _ship_overlap_sql() -> str:
    """Interval self-overlap twin (stages/overlap.py contract):
    integer-day intervals [s, s + 1 + int(qty) % 30], inclusive-end
    overlap pair count per supplier + the +1/-1 boundary sweep peak
    (the -1 lands at e + 1; '-1 before +1' on day ties)."""
    from robosat_ray.stages.overlap import DUR_MOD

    return f"""
WITH iv AS (
  SELECT l_suppkey AS suppkey,
         CAST(epoch(l_shipdate) AS BIGINT) // 86400 AS s,
         CAST(epoch(l_shipdate) AS BIGINT) // 86400
           + 1 + CAST(l_quantity AS BIGINT) % {DUR_MOD} AS e,
         row_number() OVER () AS rid
  FROM lineitem
),
p AS (
  SELECT a.suppkey, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
  FROM iv a JOIN iv b
    ON a.suppkey = b.suppkey AND a.rid < b.rid
   AND a.s <= b.e AND b.s <= a.e
  GROUP BY 1
),
ev AS (
  SELECT suppkey, s AS d, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT suppkey, e + 1 AS d, CAST(-1 AS BIGINT) AS delta FROM iv
),
run AS (
  SELECT suppkey,
         SUM(delta) OVER (PARTITION BY suppkey ORDER BY d, delta
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM ev
),
pk AS (SELECT suppkey, CAST(MAX(c) AS BIGINT) AS peak_concurrency
       FROM run GROUP BY 1),
n AS (SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n_intervals
      FROM iv GROUP BY 1)
SELECT n.suppkey, n.n_intervals,
       COALESCE(p.n_overlap_pairs, 0) AS n_overlap_pairs,
       pk.peak_concurrency
FROM n LEFT JOIN p USING (suppkey) JOIN pk USING (suppkey)
ORDER BY 1
"""


# Concurrent-shipments interval overlap join — mirrors
# stages/overlap.ship_overlap.
SHIP_OVERLAP = _ship_overlap_sql()


# TPC-H Q17 shape — mirrors stages/tpch.small_qty_revenue: rows with
# quantity strictly below 0.2x their part's average (5*q*cnt <
# sum_qty in exact integers; quantities are integral doubles).
SMALL_QTY_REVENUE = """
WITH pp AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5)
                         AS BIGINT)), 0) AS BIGINT) AS total_rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN pp USING (l_partkey)
WHERE 5 * CAST(l.l_quantity AS BIGINT) * pp.cnt < pp.sum_qty
"""


# TPC-H Q18 shape — mirrors stages/tpch.big_orders (threshold
# tpch.BIG_ORDER_QTY = 250 integral quantity units).
BIG_ORDERS = """
WITH w AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
)
SELECT o.o_orderkey, o.o_custkey, c.c_name,
       CAST(EPOCH_US(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
       CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
         AS o_totalprice_cents,
       w.sum_qty
FROM w JOIN orders o USING (o_orderkey)
       JOIN customer c ON o.o_custkey = c.c_custkey
"""


# TPC-H Q11 shape — mirrors stages/tpch.part_share: parts whose
# discounted-revenue share exceeds 1.5x the mean share, exact integer
# cross-multiplication (2*rev*n_parts > 3*total).
PART_SHARE = """
WITH pp AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0
                  + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1
),
g AS (SELECT COUNT(*) AS n_parts, SUM(rev_cents) AS total FROM pp)
SELECT pp.l_partkey, pp.rev_cents,
       CAST(pp.rev_cents * 10000 // g.total AS BIGINT) AS share_bp
FROM pp, g
WHERE 2 * pp.rev_cents * g.n_parts > 3 * g.total
"""


# TPC-H Q21 shape — mirrors stages/tpch.late_suppliers: a lineitem is
# late iff shipdate > orderdate + 80 days (tpch.LATE_DAYS); a supplier
# scores an order iff they were late on it, the order has >= 2 distinct
# suppliers, and exactly one distinct supplier was late.
LATE_SUPPLIERS = """
WITH j AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
os AS (SELECT ok, sk, MAX(late) AS late FROM j GROUP BY 1, 2),
og AS (SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late
       FROM os GROUP BY 1)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM os JOIN og USING (ok) JOIN supplier s ON os.sk = s.s_suppkey
WHERE os.late = 1 AND og.n_supp >= 2 AND og.n_late = 1
GROUP BY 1, 2
"""


def _hull_sql() -> str:
    """Brute-force convex-hull edge predicate — mirrors
    stages/hull.convex_hull_edges: (a, b) is a directed CCW hull edge
    iff every other distinct lattice point c in the group is strictly
    left of (a, b), or collinear WITHIN the segment. Centers recomputed
    from part exactly as synth.footprints.footprint_centers; lattice =
    (lon * 1e6, my * 1e8) floor(+0.5) quantization (hull.XSCALE/YSCALE)."""
    return f"""
WITH ctr AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 10 < 6 THEN CAST(p_partkey % 8 AS BIGINT)
              ELSE 8 + CAST(p_partkey % 4 AS BIGINT) END AS g,
         CASE WHEN p_partkey % 10 < 6 THEN
           list_extract({_CITY_LON}, CAST(p_partkey % 8 AS INTEGER) + 1)
             + (((p_partkey * {C.G1_MUL} + {C.G1_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_LON_SPAN!r}
         ELSE ((p_partkey * {C.G1_MUL} + {C.G1_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} * 360.0 - 180.0 END AS cx,
         CASE WHEN p_partkey % 10 < 6 THEN
           list_extract({_CITY_MY}, CAST(p_partkey % 8 AS INTEGER) + 1)
             + (((p_partkey * {C.G2_MUL} + {C.G2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r} - 0.5) * {C.CITY_MY_SPAN!r}
         ELSE {C.BG_MY_LO!r} + (((p_partkey * {C.G2_MUL} + {C.G2_ADD}) % {C.MOD32}) / {float(C.MOD32)!r}) * {C.BG_MY_RANGE!r} END AS cy
  FROM part
),
q AS (
  SELECT DISTINCT g,
         CAST(FLOOR(cx * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(cy * 100000000.0 + 0.5) AS BIGINT) AS y
  FROM ctr
)
SELECT a.g, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
FROM q a JOIN q b ON a.g = b.g AND (a.x <> b.x OR a.y <> b.y)
WHERE NOT EXISTS (
  SELECT 1 FROM q c
  WHERE c.g = a.g AND (c.x <> a.x OR c.y <> a.y) AND (c.x <> b.x OR c.y <> b.y)
    AND NOT (
      (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) > 0
      OR ((b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) = 0
          AND (c.x - a.x) * (b.x - a.x) + (c.y - a.y) * (b.y - a.y)
              BETWEEN 0 AND (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))
    )
)
"""


CONVEX_HULL = _hull_sql()


# Exact integer gram matrix over the quantized embedding lattice —
# mirrors stages/linalg.gram_matrix (QSCALE = 1e4).
GRAM_MATRIX = """
WITH q AS (
  SELECT vec_id, CAST(g.i AS BIGINT) - 1 AS i,
         CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 10000.0 + 0.5)
              AS BIGINT) AS qv
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


# 7-day rolling distinct active users — mirrors
# stages/retention.sliding_dau (interval-sweep algorithm); oracle is
# the brute-force day x user range join COUNT(DISTINCT).
SLIDING_DAU = """
WITH e AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM e)
SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS dau7
FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
"""


# Exact per-user rolling median (trailing 5 rows) — mirrors
# stages/events.rolling_median; med2 = 2 x median keeps even-window
# interpolation integral (2.0 * DOUBLE median of cent ints is exact
# below 2^52).
ROLLING_MEDIAN = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id,
       CAST(2.0 * median(cents) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS med2_cents
FROM e
"""


def _hits_sql(iters: int) -> str:
    """Unrolled integer HITS over the doc<->footprint bipartite graph
    — mirrors stages/pagerank.hits_scores."""
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"a{k} AS (SELECT e.dst AS node, CAST(SUM(h.v) AS BIGINT) AS v "
            f"FROM h{k-1} h JOIN edges e ON e.src = h.node GROUP BY 1)"
        )
        steps.append(
            f"h{k} AS (SELECT e.src AS node, CAST(SUM(a.v) AS BIGINT) AS v "
            f"FROM a{k} a JOIN edges e ON e.dst = a.node GROUP BY 1)"
        )
    its = ",\n".join(steps)
    return f"""
WITH {points_cte()}, {feet_cte()},
je AS (
  SELECT p.doc_id AS d, f.feature_id AS f
  FROM pts p JOIN feet f
    ON p.lon >= f.minx AND p.lon <= f.maxx AND p.my >= f.miny AND p.my <= f.maxy
),
edges AS (
  SELECT d * 2 AS src, f * 2 + 1 AS dst FROM je
  UNION ALL
  SELECT f * 2 + 1 AS src, d * 2 AS dst FROM je
),
h0 AS (SELECT src AS node, CAST(1 AS BIGINT) AS v FROM edges GROUP BY 1),
{its}
SELECT h.node, h.v AS hub, a.v AS auth
FROM h{iters} h JOIN a{iters} a USING (node)
"""


HITS = _hits_sql(3)


def _set_cover_sql(rounds: int) -> str:
    """Greedy coverage selection, unrolled level per round — mirrors
    stages/selection.set_cover (gain = distinct uncovered tokens;
    winner = max gain, min doc_id; zero-gain docs drop out)."""
    parts = [
        "tok AS (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token FROM documents)"
    ]
    prev_cov = None
    selects = []
    for r in range(1, rounds + 1):
        where = (
            f"WHERE token NOT IN (SELECT token FROM {prev_cov})"
            if prev_cov
            else ""
        )
        parts.append(
            f"g{r} AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain "
            f"FROM tok {where} GROUP BY 1)"
        )
        parts.append(
            f"w{r} AS (SELECT CAST({r} AS BIGINT) AS round, doc_id, gain "
            f"FROM g{r} QUALIFY row_number() OVER "
            f"(ORDER BY gain DESC, doc_id ASC) = 1)"
        )
        cov_prev = f" UNION SELECT token FROM {prev_cov}" if prev_cov else ""
        parts.append(
            f"c{r} AS (SELECT DISTINCT token FROM tok "
            f"WHERE doc_id IN (SELECT doc_id FROM w{r}){cov_prev})"
        )
        prev_cov = f"c{r}"
        selects.append(f"SELECT * FROM w{r}")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


SET_COVER = _set_cover_sql(4)


def _kmv_sql() -> str:
    from robosat_ray.stages.distinct import KMV_K

    return f"""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         CAST((((md5_number(CAST(user_id AS VARCHAR)) % {_U64}) + {_U64})
               % {_U64}) // 16 AS BIGINT) AS kh
  FROM u
),
d AS (SELECT DISTINCT event_type, kh FROM h)
SELECT event_type, kh FROM d
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY kh) <= {KMV_K}
"""


# K-minimum-values distinct sketch per event type — mirrors
# stages/distinct.kmv_sketch.
KMV_SKETCH = _kmv_sql()


def _seg_intersect_sql() -> str:
    """Road-crossing detection: each road's 3x-extended centerline
    diagonal vs every OTHER road's rect — mirrors
    stages/seg_intersect.seg_intersect (inclusive bbox overlap AND the
    separating-axis corner test on the integer lattice)."""
    cr = (
        "((r.bx - r.ax) * ({y} - r.ay) - (r.byy - r.ay) * ({x} - r.ax))"
    )
    c1 = cr.format(x="g.bminx", y="g.bminy")
    c2 = cr.format(x="g.bmaxx", y="g.bminy")
    c3 = cr.format(x="g.bminx", y="g.bmaxy")
    c4 = cr.format(x="g.bmaxx", y="g.bmaxy")
    return f"""
WITH {feet_cte()},
r AS (
  SELECT feature_id AS road_id,
         CAST(FLOOR((2.0 * minx - maxx) * 1000000.0 + 0.5) AS BIGINT) AS ax,
         CAST(FLOOR((2.0 * miny - maxy) * 100000000.0 + 0.5) AS BIGINT) AS ay,
         CAST(FLOOR((2.0 * maxx - minx) * 1000000.0 + 0.5) AS BIGINT) AS bx,
         CAST(FLOOR((2.0 * maxy - miny) * 100000000.0 + 0.5) AS BIGINT) AS byy
  FROM feet WHERE kind = 'road'
),
g AS (
  SELECT feature_id AS other_id,
         CAST(FLOOR(minx * 1000000.0 + 0.5) AS BIGINT) AS bminx,
         CAST(FLOOR(miny * 100000000.0 + 0.5) AS BIGINT) AS bminy,
         CAST(FLOOR(maxx * 1000000.0 + 0.5) AS BIGINT) AS bmaxx,
         CAST(FLOOR(maxy * 100000000.0 + 0.5) AS BIGINT) AS bmaxy
  FROM feet WHERE kind = 'road'
)
SELECT r.road_id, g.other_id
FROM r JOIN g
  ON r.road_id <> g.other_id
 AND r.ax <= g.bmaxx AND r.bx >= g.bminx
 AND r.ay <= g.bmaxy AND r.byy >= g.bminy
WHERE NOT ({c1} > 0 AND {c2} > 0 AND {c3} > 0 AND {c4} > 0)
  AND NOT ({c1} < 0 AND {c2} < 0 AND {c3} < 0 AND {c4} < 0)
"""


SEG_INTERSECT = _seg_intersect_sql()


def _rnn_sql() -> str:
    from robosat_ray.stages.ann import RNN_K, RNN_STRIDE

    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % {RNN_STRIDE} = 0),
tk AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id
         ) AS rk
  FROM q a JOIN q b ON a.vec_id <> b.vec_id
)
SELECT t1.qa AS a, t1.qb AS b
FROM tk t1 JOIN tk t2 ON t1.qa = t2.qb AND t1.qb = t2.qa
WHERE t1.rk <= {RNN_K} AND t2.rk <= {RNN_K} AND t1.qa < t1.qb
"""


# Reciprocal nearest neighbors (mutual top-k match) — mirrors
# stages/ann.rnn_pairs on the stride-subset universe.
RNN_MATCH = _rnn_sql()


# Merkle-style per-bucket table fingerprint — mirrors
# stages/text_ops.table_checksum (XOR of 63-bit md5 row hashes).
TABLE_CHECKSUM = f"""
SELECT doc_id % 64 AS bucket,
       bit_xor(CAST((((md5_number(CAST(doc_id AS VARCHAR) || '|' || text)
                       % {_U64}) + {_U64}) % {_U64})
                    % 9223372036854775808 AS BIGINT)) AS xor63,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents GROUP BY 1
"""


def _adaptive_grid_sql() -> str:
    """Equi-depth 16 x 16 adaptive tiling — mirrors
    stages/adaptive.adaptive_grid (NTILE over the composite
    (quantized coord, doc_id) integer key per axis)."""
    kx = ("(CAST(FLOOR(lon * 1000000.0 + 0.5) AS BIGINT) + 200000000)"
          " * 2147483648 + doc_id")
    ky = ("CAST(FLOOR(my * 100000000.0 + 0.5) AS BIGINT)"
          " * 2147483648 + doc_id")
    return f"""
WITH {points_cte()},
kx AS (SELECT doc_id, ntile(16) OVER (ORDER BY {kx}) AS bx FROM pts),
ky AS (SELECT doc_id, ntile(16) OVER (ORDER BY {ky}) AS by FROM pts)
SELECT CAST(kx.bx AS BIGINT) AS bx, CAST(ky.by AS BIGINT) AS by,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM kx JOIN ky USING (doc_id)
GROUP BY 1, 2
"""


ADAPTIVE_GRID = _adaptive_grid_sql()


# Exact integer Gini of the per-cell page distribution — mirrors
# stages/skew.skew_report.
SKEW_REPORT = f"""
WITH {points_cte()},
pc AS (
  SELECT {cell('lon', 'my')} AS cell, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1
),
rk AS (
  SELECT n, row_number() OVER (ORDER BY n, cell) AS r FROM pc
),
s AS (
  SELECT CAST(SUM(r * n) AS BIGINT) AS rx, CAST(SUM(n) AS BIGINT) AS x,
         CAST(MAX(n) AS BIGINT) AS mx, CAST(COUNT(*) AS BIGINT) AS k
  FROM rk
)
SELECT k AS n_cells, x AS total_pages,
       CAST(2 * rx - (k + 1) * x AS BIGINT) AS gini_num,
       CAST(k * x AS BIGINT) AS gini_den,
       CAST(mx * 10000 // x AS BIGINT) AS top_share_bp
FROM s
"""


# Per-source token-distribution L1 drift vs the global mixture —
# mirrors stages/drift.domain_drift (dense 256-bucket share vectors,
# per-million floor shares).
DOMAIN_DRIFT = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
tb AS (
  SELECT source,
         CAST(((md5_number(token) % 256) + 256) % 256 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ts FROM tb GROUP BY 1),
gb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS gc FROM tb GROUP BY 1),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM tb),
dense AS (
  SELECT s.source, s.ts, bb.b,
         COALESCE(tb.c, 0) AS c,
         COALESCE(gb.gc, 0) AS gc
  FROM srcs s
  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) bb
  LEFT JOIN tb ON tb.source = s.source AND tb.b = bb.b
  LEFT JOIN gb ON gb.b = bb.b
)
SELECT d.source, d.ts AS n_tokens,
       CAST(SUM(ABS(d.c * 1000000 // d.ts - d.gc * 1000000 // n.nt))
            AS BIGINT) AS drift_milli
FROM dense d, n
GROUP BY 1, 2
"""


def _bpe_merges_sql(rounds: int) -> str:
    """Greedy BPE merge training, unrolled per round — mirrors
    stages/bpe_train.bpe_merges (overlapping pair counts; replace is
    greedy left-to-right non-overlapping in both engines; ties break
    to the lexicographically smallest pair == numeric code order on
    the ASCII corpus)."""
    parts = ["d0 AS (SELECT text AS s FROM documents)"]
    selects = []
    for r in range(1, rounds + 1):
        parts.append(
            f"p{r} AS (SELECT substr(s, i, 2) AS pair, COUNT(*) AS c FROM "
            f"(SELECT s, unnest(generate_series(1, len(s) - 1)) AS i "
            f"FROM d{r-1}) GROUP BY 1)"
        )
        parts.append(
            f"w{r} AS (SELECT CAST({r} AS BIGINT) AS round, pair, "
            f"CAST(c AS BIGINT) AS cnt FROM p{r} "
            f"QUALIFY row_number() OVER (ORDER BY c DESC, pair ASC) = 1)"
        )
        parts.append(
            f"d{r} AS (SELECT replace(s, (SELECT pair FROM w{r}), chr({r})) "
            f"AS s FROM d{r-1})"
        )
        selects.append(f"SELECT * FROM w{r}")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


BPE_MERGES = _bpe_merges_sql(3)


# Exact union (dissolve) area of building rects per region — mirrors
# stages/union_area.union_area (x-strip scanline + per-strip y-interval
# union with the INTERVAL_UNION gaps-and-islands rule).
UNION_AREA = f"""
WITH {feet_cte()},
r AS (
  SELECT CASE WHEN feature_id % 10 < 6 THEN CAST(feature_id % 8 AS BIGINT)
              ELSE 8 + CAST(feature_id % 4 AS BIGINT) END AS g,
         CAST(FLOOR(minx * 1000000.0 + 0.5) AS BIGINT) AS x0,
         CAST(FLOOR(miny * 100000000.0 + 0.5) AS BIGINT) AS y0,
         CAST(FLOOR(maxx * 1000000.0 + 0.5) AS BIGINT) AS x1,
         CAST(FLOOR(maxy * 100000000.0 + 0.5) AS BIGINT) AS y1
  FROM feet WHERE kind = 'building'
),
b AS (SELECT DISTINCT g, x0 AS xb FROM r UNION SELECT DISTINCT g, x1 FROM r),
strips AS (
  SELECT g, xb AS xs,
         lead(xb) OVER (PARTITION BY g ORDER BY xb) AS xe
  FROM (SELECT DISTINCT g, xb FROM b)
),
cov AS (
  SELECT s.g, s.xs, s.xe, r.y0, r.y1
  FROM strips s JOIN r ON r.g = s.g AND r.x0 <= s.xs AND r.x1 >= s.xe
  WHERE s.xe IS NOT NULL
),
m AS (
  SELECT g, xs, xe, y0, y1,
         MAX(y1) OVER (PARTITION BY g, xs ORDER BY y0, y1
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prevmax
  FROM cov
),
runs AS (
  SELECT g, xs, xe, y0, y1,
         SUM(CASE WHEN prevmax IS NULL OR y0 > prevmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY g, xs ORDER BY y0, y1
                 ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
),
iu AS (
  SELECT g, xs, xe, MIN(y0) AS s0, MAX(y1) AS e0
  FROM runs GROUP BY g, xs, xe, isl
)
SELECT g, CAST(COALESCE(SUM((xe - xs) * (e0 - s0)), 0) AS BIGINT) AS area
FROM iu GROUP BY g
"""


# TPC-H Q4 shape — mirrors stages/tpch.priority_counts (EXISTS
# semi-join aggregate; a lineitem is late iff shipped > 60 days after
# the order date, tpch.Q4_LATE_DAYS).
PRIORITY_COUNTS = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY 1
"""


# Exact per-user mode of event_type (tie -> lexicographically smallest
# type) — mirrors stages/events.mode_per_user.
MODE_PER_USER = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS mode_type, n FROM c
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY n DESC, event_type ASC) = 1
"""


# Per-user first/last-touch journey summary — mirrors
# stages/events.user_journey ((ts, event_id) order).
USER_JOURNEY = """
WITH f AS (
  SELECT user_id, event_type AS first_type FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts, event_id) = 1
),
l AS (
  SELECT user_id, event_type AS last_type FROM events
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
a AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us
  FROM events GROUP BY 1
)
SELECT a.user_id, f.first_type, l.last_type, a.n_events, a.span_us
FROM a JOIN f USING (user_id) JOIN l USING (user_id)
"""
