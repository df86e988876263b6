"""Property-based tests (hypothesis) for the kernel primitives."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geowarp_spark.kernels.affine import Geotransform
from geowarp_spark.kernels.proj import get_projection
from geowarp_spark.kernels.scanline import segflip
from geowarp_spark.kernels.stats import js_round, reduce_windows
from geowarp_spark.grid.tiles import (
    cell_parent, latlng_to_cell, pack_cell, unpack_cell,
)

finite = st.floats(allow_nan=False, allow_infinity=False, width=32)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=30))
@settings(max_examples=200)
def test_js_round_matches_definition(xs):
    # floor(x + 0.5) is the JS Math.round contract
    got = js_round(np.array(xs))
    exp = [np.floor(x + 0.5) for x in xs]
    np.testing.assert_array_equal(got, exp)


@given(
    st.tuples(
        st.floats(min_value=-1e5, max_value=1e5),
        st.floats(min_value=0.1, max_value=100),
        st.floats(min_value=-5, max_value=5),
        st.floats(min_value=-1e5, max_value=1e5),
        st.floats(min_value=-5, max_value=5),
        st.floats(min_value=-100, max_value=-0.1),
    ),
    st.lists(st.floats(min_value=0, max_value=1000), min_size=2, max_size=2),
)
@settings(max_examples=200)
def test_geotransform_roundtrip(gt, pt):
    # skip nearly-singular transforms
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if abs(det) < 1e-3:
        return
    g = Geotransform(list(gt))
    x, y = g.forward(pt[0], pt[1])
    c, r = g.inverse(x, y)
    assert abs(c - pt[0]) < 1e-6 * max(1, abs(pt[0]))
    assert abs(r - pt[1]) < 1e-6 * max(1, abs(pt[1]))


@given(st.floats(min_value=-179.9, max_value=179.9),
       st.floats(min_value=-84.9, max_value=84.9),
       st.sampled_from([3857, 32615, 32733, 3031]))
@settings(max_examples=150)
def test_projection_roundtrip(lon, lat, epsg):
    if epsg == 3031 and lat > -55:
        lat = -60 - abs(lat) / 4  # polar stereo only sensible in the south
    if epsg in (32615, 32733):
        # transverse mercator is valid within ~+-20 deg of the central
        # meridian (Krueger series diverges beyond, like any TM impl)
        lon0 = -93.0 if epsg == 32615 else 15.0
        lon = lon0 + (lon % 40.0) - 20.0
    p = get_projection(epsg)
    x, y = p.forward(lon, lat)
    if not (np.isfinite(x) and np.isfinite(y)):
        return
    lon2, lat2 = p.inverse(x, y)
    # wrap longitudes
    dl = (float(lon2) - lon + 180) % 360 - 180
    assert abs(dl) < 1e-6
    assert abs(float(lat2) - lat) < 1e-6


@given(st.lists(st.integers(min_value=0, max_value=99), min_size=2, max_size=20),
       st.integers(min_value=0, max_value=99))
@settings(max_examples=200)
def test_segflip_is_complement(bounds, maxc):
    # build sorted disjoint segments within [0, maxc]
    bs = sorted(set(b for b in bounds if b <= maxc))
    segs = [[bs[i], bs[i + 1] - 1] for i in range(0, len(bs) - 1, 2) if bs[i] <= bs[i + 1] - 1]
    flipped = segflip(segs, 0, maxc)
    covered = set()
    for s0, s1 in segs + flipped:
        for c in range(s0, s1 + 1):
            assert c not in covered  # disjoint
            covered.add(c)
    assert covered == set(range(0, maxc + 1))  # exhaustive


@given(st.lists(st.integers(min_value=0, max_value=10), min_size=1, max_size=40))
@settings(max_examples=200)
def test_mode_matches_naive(vals):
    v = np.array([vals], dtype=float)
    m = np.ones_like(v, dtype=bool)
    got = reduce_windows(v, m, "mode")[0]
    # naive reference: max count, smallest tied value
    from collections import Counter

    c = Counter(vals)
    mx = max(c.values())
    exp = min(k for k, n in c.items() if n == mx)
    assert got == exp


@given(st.integers(min_value=0, max_value=20),
       st.integers(min_value=0, max_value=(1 << 20) - 1),
       st.integers(min_value=0, max_value=(1 << 20) - 1))
@settings(max_examples=200)
def test_cell_pack_roundtrip(z, x, y):
    n = 1 << z
    x, y = x % n, y % n
    c = pack_cell(z, x, y)
    z2, x2, y2 = unpack_cell(c)
    assert (z2, x2, y2) == (z, x, y)


@given(st.floats(min_value=-89.9, max_value=89.9),
       st.floats(min_value=-179.9, max_value=179.9),
       st.integers(min_value=1, max_value=20))
@settings(max_examples=200)
def test_cell_parent_contains_child(lat, lon, z):
    child = latlng_to_cell(np.array([lat]), np.array([lon]), z)
    parent_direct = latlng_to_cell(np.array([lat]), np.array([lon]), z - 1)
    assert cell_parent(child, 1)[0] == parent_direct[0]


@given(
    st.integers(min_value=1, max_value=4),      # bands
    st.integers(min_value=1, max_value=40),     # height
    st.integers(min_value=1, max_value=40),     # width
    st.sampled_from(["uint8", "uint16", "int16", "uint32", "float32"]),
    st.sampled_from(["strips", "tiles"]),
    st.sampled_from(["none", "deflate"]),
    st.booleans(),                              # predictor
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(b, h, w, dtype, layout, compression,
                                 predictor, seed):
    """Any (bands, dims, dtype, layout, compression, predictor) combo
    round-trips bit-exactly through the pure-Python TIFF codec —
    including edge tiles/strips that need padding and 1-px rasters."""
    from geowarp_spark.sources.tiff import read_tiff, write_tiff

    if predictor and dtype == "float32":
        predictor = False  # predictor 2 is integer-only (TIFF 6.0 §14)
    rng = np.random.default_rng(seed)
    if dtype == "float32":
        data = rng.random((b, h, w)).astype(np.float32)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, int(info.max) + 1, size=(b, h, w),
                            dtype=np.dtype(dtype))
    fx = {
        "raster_id": "prop", "srs": 3857,
        "bbox": [0.0, 0.0, float(w), float(h)],
        "geotransform": None, "width": w, "height": h, "bands": b,
        "dtype": dtype, "no_data": None, "data": data,
    }
    buf = write_tiff(fx, compression=compression, layout=layout,
                     rows_per_strip=7, tile_size=16, predictor=predictor)
    got = read_tiff(buf)
    np.testing.assert_array_equal(got["data"], data)
    assert got["dtype"] == dtype and got["srs"] == 3857
