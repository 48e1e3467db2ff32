"""Deterministic-synthesis and partitioning constants.

These constants are mirrored EXACTLY into the DuckDB oracle SQL
(robosat_ray/oracle.py). Every coordinate the oracle checks is derived
from integer hashes with IEEE-exact float ops (division by 2^32, one
multiply, one add), so numpy and DuckDB produce bit-identical doubles.

Coordinate system: points and footprints live in the (lon, my) plane
where ``lon`` is degrees in [-180, 180) and ``my`` is the normalized
Web-Mercator y in [0, 1) (0 = north edge of the mercator world,
1 = south edge — same orientation as slippy tile y). Geodetic latitude
is derived only for display: lat = atan(sinh(pi * (1 - 2*my))) deg.

Tile assignment at zoom z (slippy / Web-Mercator, as robosat's
mercantile usage at reference robosat/tiles.py:34, tools/cover.py:30):
  tx = floor((lon + 180) / 360 * 2^z),  ty = floor(my * 2^z)
"""

# zoom used for the headline spatial join / cover / cell partitioning
Z_JOIN = 12

# Knuth/xxhash-style odd multiplicative constants (public domain lore)
H1_MUL = 2654435761
H2_MUL = 2246822519
H2_ADD = 3266489917
G1_MUL = 2654435761
G1_ADD = 1013904223
G2_MUL = 2246822519
G2_ADD = 374761393
MOD32 = 4294967296  # 2**32

# 8 synthetic "cities" — dense clusters => hot tiles (skew/salting tests).
# my values chosen in (0.2, 0.8): away from mercator poles.
CITY_LON = [-122.0, -74.0, -0.125, 2.375, 13.375, 37.625, 139.75, 151.25]
CITY_MY = [0.375, 0.390625, 0.34375, 0.3359375, 0.328125, 0.3671875, 0.3984375, 0.59375]

# city cluster extents: ~2x2 tiles at Z_JOIN
CITY_LON_SPAN = 0.2      # degrees
CITY_MY_SPAN = 0.0005    # normalized mercator y

# background (non-city) my range — avoid poles
BG_MY_LO = 0.2
BG_MY_RANGE = 0.6

# footprint rectangle half extents: base + (p_size % 10) * step
FOOT_HW_BASE = 0.0005
FOOT_HW_STEP = 0.0005
FOOT_HH_BASE = 0.00001
FOOT_HH_STEP = 0.00001

FOOT_KINDS = ["building", "road", "water", "parking"]

# pages synthesis
URL_PREFIX = "https://example.org/doc/"
WARC_EPOCH_US = 1704067200000000  # 2024-01-01T00:00:00 UTC in microseconds

# spatial-join co-partition: number of hash buckets for the groupby
NUM_JOIN_BUCKETS = 64

# kNN / ANN query selection: rows with key % QUERY_STRIDE == 0 are queries
KNN_STRIDE = 499
KNN_K = 5
ANN_STRIDE = 97
ANN_K = 5

# dedupe: predicted = jittered copies of reference footprints
DEDUPE_IOU_THRESHOLD = 0.5

# merge: buffer threshold in the (lon, my) plane (x units; y scaled)
MERGE_EPS_X = 0.0004
MERGE_EPS_Y = 0.0000024

# embedding-cosine near-dup: threshold between the corpus's max
# off-pair cosine (~0.51) and the scaled-variant pairs (cosine 1.0)
EMB_DUP_THRESHOLD = 0.8
EMB_DIM = 64  # synth embeddings dimension (all scales)

# grid-DBSCAN over the page points (quantized plane, integer-exact):
# coords quantize at zoom DB_Q via the tile_x/tile_y floor chain; eps
# is DB_R grid units (squared-Euclidean test), a neighborhood counts
# the point itself, and minPts is DB_MINPTS. At sf0.01 the 8 city
# blobs (~582x524 units, ~37 points each) yield a core/border/noise
# mix; the uniform background is all noise.
DB_Q = 20
DB_R = 128
DB_MINPTS = 4
