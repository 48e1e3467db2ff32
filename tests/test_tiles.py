"""Tile-math kernels: round trips + parity with the reference's
mercantile semantics (slippy formulas; robosat/tiles.py usage)."""

import numpy as np

from robosat_ray.geo import tiles as T


def test_lat_my_roundtrip():
    lat = np.linspace(-84.0, 84.0, 1001)
    back = T.my_to_lat(T.lat_to_my(lat))
    np.testing.assert_allclose(back, lat, atol=1e-9)


def test_known_tile():
    # mercantile.tile(-122.4194, 37.7749, 12) == Tile(x=655, y=1583, z=12)
    tx, ty = T.lonlat_to_tile(np.array([-122.4194]), np.array([37.7749]), 12)
    assert (tx[0], ty[0]) == (655, 1583)
    # zoom 18 fixture tile from the reference tests covers its own center:
    # tests/fixtures use tile (69623, 104945, 18)
    w, s, e, n = T.tile_bounds_lonlat(np.array([69623]), np.array([104945]), 18)
    cx, cy = (w + e) / 2.0, (s + n) / 2.0
    tx, ty = T.lonlat_to_tile(cx, cy, 18)
    assert (tx[0], ty[0]) == (69623, 104945)


def test_tile_center_roundtrip_bulk():
    rng = np.random.default_rng(42)
    z = 12
    tx = rng.integers(0, 1 << z, 500)
    ty = rng.integers(0, 1 << z, 500)
    lon, my = T.pixel_to_lonmy(tx, ty, z, 0.5, 0.5)
    tx2, ty2 = T.lonmy_to_tile(lon, my, z)
    np.testing.assert_array_equal(tx, tx2)
    np.testing.assert_array_equal(ty, ty2)


def test_cell_id_roundtrip():
    z = 12
    tx = np.array([0, 1, 4095, 655])
    ty = np.array([0, 4095, 1, 1583])
    cx, cy = T.cell_to_tile(T.cell_id(tx, ty, z), z)
    np.testing.assert_array_equal(tx, cx)
    np.testing.assert_array_equal(ty, cy)


def test_k_ring():
    assert len(T.k_ring(5, 5, 12, 1)) == 9
    assert len(T.k_ring(0, 0, 12, 1)) == 4  # corner clipped
    assert (5, 5) in T.k_ring(5, 5, 12, 1)


def test_quadkey_matches_bing_reference_algorithm():
    """Vectorized quadkey == the published Bing Maps per-tile digit
    algorithm, numeric form == base-4 parse of the string."""
    import numpy as np

    from robosat_ray.geo.tiles import quadkey, quadkey_str

    def ref(tx, ty, z):
        s = ""
        for L in range(z, 0, -1):
            d = 0
            m = 1 << (L - 1)
            if tx & m:
                d += 1
            if ty & m:
                d += 2
            s += str(d)
        return s

    rng = np.random.default_rng(5)
    z = 12
    tx = rng.integers(0, 1 << z, 300)
    ty = rng.integers(0, 1 << z, 300)
    qs = quadkey_str(tx, ty, z)
    qn = quadkey(tx, ty, z)
    for a, b, s, n in zip(tx, ty, qs, qn):
        w = ref(int(a), int(b), z)
        assert s == w and int(n) == int(w, 4)
    # corners
    assert quadkey_str([0], [0], z)[0] == "0" * z
    assert quadkey_str([(1 << z) - 1], [(1 << z) - 1], z)[0] == "3" * z


def test_geohash_matches_bitwise_reference():
    """Vectorized geohash == per-row bit-by-bit reference (lon bit
    high, MSB-first, Niemeyer base32), and truncating the code by 5
    bits truncates the string by one char (prefix/hierarchy
    property)."""
    import numpy as np

    from robosat_ray.geo.tiles import GEOHASH_ALPHABET, geohash_cells, geohash_str

    rng = np.random.RandomState(7)
    lon = rng.uniform(-180.0, 180.0, 200)
    my = rng.uniform(0.0, 1.0, 200)
    codes = geohash_cells(lon, my)
    strs = geohash_str(codes)

    for i in range(len(lon)):
        gx = min(max(int(np.floor((lon[i] + 180.0) / 360.0 * 32768.0)), 0), 32767)
        gy = min(max(int(np.floor((1.0 - my[i]) * 32768.0)), 0), 32767)
        code = 0
        for b in range(14, -1, -1):
            code = (code << 1) | ((gx >> b) & 1)
            code = (code << 1) | ((gy >> b) & 1)
        assert code == codes[i]
        want = "".join(
            chr(GEOHASH_ALPHABET[(code >> (25 - 5 * j)) & 31]) for j in range(6)
        )
        assert want == strs[i]
    # 5-bit truncation == one-char prefix: points in the same parent
    # cell share the first 5 chars
    parents = codes >> 5
    for a in range(0, 40):
        for b in range(a + 1, 40):
            if parents[a] == parents[b]:
                assert strs[a][:5] == strs[b][:5]


def test_hilbert_bijective_and_unit_step():
    """Exhaustive at order 3: the index is a bijection onto 0..63 and
    consecutive indices are grid-adjacent (|dx|+|dy| == 1) — the
    locality property Morton lacks; plus per-row reference equality at
    the join order."""
    import numpy as np

    from robosat_ray.geo.tiles import hilbert_d

    n = 8
    xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    dd = hilbert_d(xx.ravel(), yy.ravel(), 3)
    assert sorted(dd) == list(range(n * n))
    pos = np.empty((n * n, 2), np.int64)
    pos[dd] = np.c_[xx.ravel(), yy.ravel()]
    assert (np.abs(np.diff(pos, axis=0)).sum(axis=1) == 1).all()

    def ref(order, x, y):
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = np.random.RandomState(3)
    xs = rng.randint(0, 4096, 200)
    ys = rng.randint(0, 4096, 200)
    got = hilbert_d(xs, ys, 12)
    assert all(got[i] == ref(12, int(xs[i]), int(ys[i])) for i in range(200))


def test_hexbin_assigns_nearest_center():
    """Every point's assigned hex center is the nearest center among
    the cell and its six neighbors (the defining Voronoi property of
    hex binning), on a dense random cloud including negative coords."""
    import numpy as np

    from robosat_ray.geo.tiles import HEX_SIZE, SQRT3_3, hexbin_axial

    rng = np.random.RandomState(11)
    x = rng.uniform(-180, 180, 3000)
    y = rng.uniform(-180, 180, 3000)
    q, r = hexbin_axial(x, y)
    sqrt3 = SQRT3_3 * 3.0
    cxc = HEX_SIZE * sqrt3 * (q + r / 2.0)
    cyc = HEX_SIZE * 1.5 * r
    d0 = (x - cxc) ** 2 + (y - cyc) ** 2
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nq, nr = q + dq, r + dr
        cxn = HEX_SIZE * sqrt3 * (nq + nr / 2.0)
        cyn = HEX_SIZE * 1.5 * nr
        assert (d0 <= (x - cxn) ** 2 + (y - cyn) ** 2 + 1e-9).all()
