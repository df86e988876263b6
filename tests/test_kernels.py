"""Kernel parity tests — semantics pinned to /root/reference/geowarp.js.

Each test encodes a behavior documented in SURVEY.md §2 with its
geowarp.js citation; goldens are hand-derived from the reference
semantics (not copied outputs — the reference fixtures are unavailable
offline, see FIXTURES.md).
"""

import numpy as np
import pytest

from geowarp_spark.kernels.affine import Geotransform
from geowarp_spark.kernels.bbox import BboxNaNError, intersect, reproject_bbox
from geowarp_spark.kernels.layout import from_brc, to_brc
from geowarp_spark.kernels.proj import get_projection, transformer
from geowarp_spark.kernels.scanline import rasterize_segments, segflip
from geowarp_spark.kernels.stats import js_round, reduce_windows
from geowarp_spark.kernels.warp import warp


def grid(b=1, h=4, w=4, dtype=np.uint8):
    return (np.arange(b * h * w) % 256).astype(dtype).reshape(b, h, w)


# ---------------------------------------------------------------- rounding


def test_js_round_half_up():
    # geowarp.js uses Math.round = half-toward-+inf, NOT banker's (F10)
    assert list(js_round(np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5]))) == [1, 2, 3, 0, -1, -2]


# ---------------------------------------------------------------- affine


def test_geotransform_roundtrip_skewed():
    # skewed geotransform like umbra_mount_yasur (test.js:705-709)
    gt = Geotransform([1e5, 2.0, 0.3, 2e5, 0.1, -1.5])
    cols = np.array([0.0, 10.5, 99.0])
    rows = np.array([0.0, 3.25, 42.0])
    x, y = gt.forward(cols, rows)
    c2, r2 = gt.inverse(x, y)
    np.testing.assert_allclose(c2, cols, atol=1e-9)
    np.testing.assert_allclose(r2, rows, atol=1e-9)


# ---------------------------------------------------------------- bbox


def test_reproject_bbox_nan_throw_and_skip():
    def t(xs, ys):
        xs = np.asarray(xs, dtype=float)
        return np.where(xs > 5, np.nan, xs), np.asarray(ys, dtype=float)

    with pytest.raises(BboxNaNError):
        reproject_bbox([0, 0, 10, 10], t, nan_strategy="throw")
    bb = reproject_bbox([0, 0, 10, 10], t, nan_strategy="skip")
    assert bb[0] == 0 and bb[2] <= 5


def test_intersect():
    assert intersect([0, 0, 2, 2], [1, 1, 3, 3]) == [1, 1, 2, 2]
    assert intersect([0, 0, 1, 1], [2, 2, 3, 3]) is None


# ---------------------------------------------------------------- layouts


@pytest.mark.parametrize("layout", [
    "[band][row][column]", "[band][row,column]", "[row,column,band]",
    "[row][column][band]", "[row,column][band]",
])
def test_layout_roundtrip(layout):
    block = grid(3, 4, 5)
    nested = from_brc(block, layout)
    back = to_brc(nested, layout, 3, 4, 5, dtype=np.uint8)
    np.testing.assert_array_equal(back, block)


# ---------------------------------------------------------------- scanline


def test_rasterize_square_and_flip():
    sq = {"type": "Polygon", "coordinates": [[[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]]}
    segs = rasterize_segments(sq, [0, 0, 4, 4], 4, 4)
    # pixel centers at .5 steps; rows 1..2 columns 1..2 inside
    assert segs[0] == [] and segs[3] == []
    assert segs[1] == [[1, 2]] and segs[2] == [[1, 2]]
    flipped = segflip(segs[1], 0, 3)
    assert flipped == [[0, 0], [3, 3]]


def test_rasterize_hole():
    donut = {"type": "Polygon", "coordinates": [
        [[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]],
        [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]],
    ]}
    segs = rasterize_segments(donut, [0, 0, 6, 6], 6, 6)
    assert segs[0] == [[0, 5]]
    assert segs[3] == [[0, 1], [4, 5]]  # hole excluded


# ---------------------------------------------------------------- stats


def test_mode_tie_smallest():
    # geowarp.js:65-86 + [0] at 860: ties -> smallest value
    v = np.array([[3.0, 3.0, 1.0, 1.0, 2.0]])
    m = np.ones_like(v, dtype=bool)
    assert reduce_windows(v, m, "mode")[0] == 1.0
    assert reduce_windows(v, m, "mode-max")[0] == 3.0
    assert reduce_windows(v, m, "mode-mean")[0] == 2.0
    assert reduce_windows(v, m, "mode-median")[0] == 2.0


def test_median_even_average():
    v = np.array([[1.0, 2.0, 4.0, 8.0]])
    m = np.ones_like(v, dtype=bool)
    assert reduce_windows(v, m, "median")[0] == 3.0  # mediana semantics


def test_empty_window_nan():
    v = np.array([[1.0, 2.0]])
    m = np.zeros_like(v, dtype=bool)
    assert np.isnan(reduce_windows(v, m, "median")[0])


# ---------------------------------------------------------------- warp: core


def test_near_identity():
    d = grid()
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=4, out_height=4, method="near")
    np.testing.assert_array_equal(r["block"][0], d[0])


def test_out_bands_reorder():
    # P2: out_bands [2,1,0] BGR reorder (geowarp.js:239,263; test.js:343)
    d = np.stack([np.full((2, 2), 10), np.full((2, 2), 20), np.full((2, 2), 30)]).astype(np.uint8)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
             in_height=2, in_width=2, out_width=2, out_height=2,
             method="near", out_bands=[2, 1, 0])
    assert r["block"][:, 0, 0].tolist() == [30, 20, 10]
    # read_bands defaults to uniq desc of out_bands (geowarp.js:37,235)
    assert r["read_bands"] == [2, 1, 0]


def test_nodata_mapping_and_round():
    # P3: in_no_data -> out_no_data; F10 rounding
    d = np.array([[[5.0, 99.0], [1.4, 2.5]]])
    r = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
             in_height=2, in_width=2, out_width=2, out_height=2,
             method="near", in_no_data=99, out_no_data=255, round_values=True)
    np.testing.assert_array_equal(r["block"][0], [[5, 255], [1, 3]])


def test_skip_no_data_any():
    # P4: skip pixel when ANY band is no-data -> stays out_no_data fill
    d = np.stack([np.array([[1, 99]]), np.array([[2, 3]])]).astype(float)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 1], in_srs=3857, out_srs=3857,
             in_height=1, in_width=2, out_width=2, out_height=1,
             method="near", in_no_data=99, out_no_data=0,
             skip_no_data_strategy="any")
    assert r["block"][0, 0, 0] == 1 and r["block"][0, 0, 1] == 0
    assert r["block"][1, 0, 1] == 0


def test_expr_band_math():
    # F11/F12: expr over read bands, e.g. rescale + extra band (test.js:430-440)
    d = np.array([[[100, 200]]], dtype=np.uint8)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 1], in_srs=3857, out_srs=3857,
             in_height=1, in_width=2, out_width=2, out_height=1, method="near",
             expr=lambda v: np.vstack([v[0] / 2.0, np.full(v.shape[1], 7.0)]))
    assert r["block"][0].tolist() == [[50.0, 100.0]]
    assert r["block"][1].tolist() == [[7.0, 7.0]]


def test_palette_expr():
    # F13: palette lookup (test.js:504-506)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=float)
    d = np.array([[[0, 1], [2, 1]]], dtype=np.uint8)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
             in_height=2, in_width=2, out_width=2, out_height=2, method="near",
             expr=lambda v: palette[v[0].astype(int)].T)
    assert r["block"][:, 0, 1].tolist() == [255, 0, 0]
    assert r["block"][:, 1, 0].tolist() == [0, 255, 0]


def test_out_of_bounds_fill():
    # P6: sampling outside input -> primary_in_no_data (geowarp.js:716-718)
    d = np.array([[[1, 2], [3, 4]]], dtype=float)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
             out_bbox=[0, 0, 4, 4], in_height=2, in_width=2,
             out_width=4, out_height=4, method="near", in_no_data=99, out_no_data=0)
    assert r["block"][0, 3, 3] == 0  # outside -> 99 -> mapped to out_no_data
    assert r["block"][0, 3, 0] == 3


def test_row_range():
    # P9: row_start/row_end render a stripe (geowarp.js:144-145)
    d = grid()
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=4, out_height=4,
             method="near", row_start=1, row_end=3, out_no_data=255)
    assert (r["block"][0][0] == 255).all() and (r["block"][0][3] == 255).all()
    np.testing.assert_array_equal(r["block"][0][1], d[0][1])


def test_resolution_replication():
    # L4: compute at fraction, replicate over footprint (geowarp.js:506-521)
    d = grid()
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=4, out_height=4,
             out_resolution=[0.5, 0.5], method="near")
    b = r["block"][0]
    assert b[0, 0] == b[0, 1] == b[1, 0] == b[1, 1]


def test_cutline_outside_strategy():
    # J1/U1: cutline keeps inside by default ("outside" strategy cuts outside)
    d = np.full((1, 4, 4), 9, dtype=np.uint8)
    sq = {"type": "Polygon", "coordinates": [[[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]]}
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=4, out_height=4,
             method="near", cutline=sq, cutline_srs=3857, out_no_data=0)
    b = r["block"][0]
    assert b[1, 1] == 9 and b[2, 2] == 9
    assert b[0, 0] == 0 and b[3, 3] == 0


def test_cutline_inside_strategy():
    d = np.full((1, 4, 4), 9, dtype=np.uint8)
    sq = {"type": "Polygon", "coordinates": [[[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]]}
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=4, out_height=4,
             method="near", cutline=sq, cutline_srs=3857,
             cutline_strategy="inside", out_no_data=0)
    b = r["block"][0]
    assert b[1, 1] == 0 and b[2, 2] == 0
    assert b[0, 0] == 9 and b[3, 3] == 9


def test_boxstats_all_methods():
    d = grid()
    expect = {
        "min": [[0, 2], [8, 10]],
        "max": [[5, 7], [13, 15]],
        "mean": [[2.5, 4.5], [10.5, 12.5]],
        "median": [[2.5, 4.5], [10.5, 12.5]],
        "mode": [[0, 2], [8, 10]],  # all distinct -> each count 1 -> smallest
    }
    for m, e in expect.items():
        r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
                 in_height=4, in_width=4, out_width=2, out_height=2, method=m)
        np.testing.assert_array_equal(r["block"][0], e), m


def test_custom_method_first():
    # A7: custom reducer "first" (test.js:248)
    d = grid()
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=2, out_height=2,
             method=lambda vals: vals[0])
    np.testing.assert_array_equal(r["block"][0], [[0, 2], [8, 10]])


def test_boxstats_nodata_excluded():
    # A8: valid-value filter; empty window -> primary_in_no_data
    d = np.array([[[99, 99], [99, 5]]], dtype=float)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
             in_height=2, in_width=2, out_width=1, out_height=1,
             method="mean", in_no_data=99, out_no_data=255)
    assert r["block"][0, 0, 0] == 5  # only valid value
    d2 = np.full((1, 2, 2), 99.0)
    r2 = warp(in_data=d2, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
              in_height=2, in_width=2, out_width=1, out_height=1,
              method="mean", in_no_data=99, out_no_data=255)
    assert r2["block"][0, 0, 0] == 255  # empty -> primary(99) -> mapped to 255


def test_nan_input_no_nan_output():
    # antarctica regression (test.js:818-862): NaN input, no NaN in output
    d = np.full((1, 8, 8), np.nan)
    d[0, :4, :4] = 7.0
    p3031 = get_projection(3031)
    xmin, ymin = p3031.forward(-10.0, -75.0)
    xmax, ymax = p3031.forward(10.0, -65.0)
    r = warp(in_data=d, in_bbox=[min(xmin, xmax), min(ymin, ymax), max(xmin, xmax), max(ymin, ymax)],
             in_srs=3031, out_srs=3857, in_height=8, in_width=8,
             out_width=16, out_height=16, method="near", out_no_data=0)
    assert not np.isnan(r["block"]).any()


def test_globe_3857_to_4326_out_of_projection():
    # whole-globe warp (test.js:864-926): boxes crossing projection bounds
    # are skipped (nan_strategy=throw per sample, geowarp.js:894-904)
    ext = np.pi * 6378137.0
    d = np.full((1, 16, 16), 42, dtype=np.uint8)
    r = warp(in_data=d, in_bbox=[-ext, -ext, ext, ext], in_srs=3857, out_srs=4326,
             out_bbox=[-180, -90, 180, 90], in_height=16, in_width=16,
             out_width=16, out_height=16, method="median", out_no_data=0)
    b = r["block"][0]
    assert (b[8] == 42).all()          # equator fully covered
    assert not np.isnan(b).any()


def test_skewed_geotransform():
    # umbra_mount_yasur-style skew (test.js:693-816): nonzero b,c terms
    gt = [100.0, 1.0, 0.25, 100.0, 0.1, -1.0]
    d = grid(1, 8, 8)
    r = warp(in_data=d, in_bbox=[100, 92, 110, 100], in_geotransform=gt,
             in_srs=3857, out_srs=3857, out_bbox=[100, 92, 110, 100],
             in_height=8, in_width=8, out_width=8, out_height=8,
             method="near", out_no_data=255)
    g = Geotransform(gt)
    # center of out pixel (4,4)
    x = 100 + 4 * (10 / 8) + (10 / 8) / 2
    y = 100 - 4 * (1.0) - 0.5
    c, rr = g.inverse(x, y)
    expected = d[0, int(np.floor(rr)), int(np.floor(c))]
    assert r["block"][0, 4, 4] == expected


def test_out_dtype_cast():
    d = grid()
    r = warp(in_data=d, in_bbox=[0, 0, 4, 4], in_srs=3857, out_srs=3857,
             in_height=4, in_width=4, out_width=2, out_height=2,
             method="mean", out_dtype="uint8", round_values=True)
    assert r["block"].dtype == np.uint8
    np.testing.assert_array_equal(r["block"][0], [[3, 5], [11, 13]])  # 2.5->3 half-up


def test_layout_output():
    d = grid(2, 2, 2)
    r = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
             in_height=2, in_width=2, out_width=2, out_height=2,
             method="near", out_layout="[row,column,band]")
    flat = r["data"]
    assert flat.shape == (8,)
    assert flat[0] == d[0, 0, 0] and flat[1] == d[1, 0, 0]


def test_vectorize_equals_near_on_upsample():
    # near-vectorize picks vectorize when ratio < 0.1 (R3, geowarp.js:583-604);
    # for an axis-aligned same-srs upsample both should paint identical blocks
    d = np.array([[[1, 2], [3, 4]]], dtype=np.uint8)
    rv = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
              in_height=2, in_width=2, out_width=32, out_height=32, method="vectorize")
    rn = warp(in_data=d, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
              in_height=2, in_width=2, out_width=32, out_height=32, method="near")
    np.testing.assert_array_equal(rv["block"], rn["block"])


def test_turbo_within_one_source_pixel():
    # R6: turbo interpolates the floored inverse mapping over a coarse grid
    # then rounds (geowarp.js:538-547) — approximate by design; the sampled
    # source pixel may shift by at most one index vs the exact path (the
    # reference's own tests only assert the most-common-pixel, test.js:264)
    d = grid(1, 16, 16)  # value = row*16 + col, so indices are recoverable
    r1 = warp(in_data=d, in_bbox=[0, 0, 16, 16], in_srs=3857, out_srs=3857,
              in_height=16, in_width=16, out_width=64, out_height=64, method="near")
    r2 = warp(in_data=d, in_bbox=[0, 0, 16, 16], in_srs=3857, out_srs=3857,
              in_height=16, in_width=16, out_width=64, out_height=64,
              method="near", turbo=True)
    r_exact, c_exact = r1["block"][0] // 16, r1["block"][0] % 16
    r_turbo, c_turbo = r2["block"][0] // 16, r2["block"][0] % 16
    assert np.abs(r_exact - r_turbo).max() <= 1
    assert np.abs(c_exact - c_turbo).max() <= 1


def test_turbo_all_kernels_parity():
    """R6 parity: turbo is honored by bilinear, box-stats and vectorize
    kernels too (the reference turbocharges forward AND inverse and uses
    them in every kernel, geowarp.js:551-580).  For an affine 3857->3857
    mapping the grid fit is exact up to float rounding, so turbo must
    reproduce the exact path within <= 1 source pixel of drift."""
    d = grid(1, 64, 64)
    common = dict(in_data=d, in_bbox=[0, 0, 64, 64], in_srs=3857, out_srs=3857,
                  in_height=64, in_width=64, out_width=96, out_height=96)
    for method in ("bilinear", "median", "max"):
        r_exact = warp(method=method, **common)["block"][0]
        r_turbo = warp(method=method, turbo=True, **common)["block"][0]
        # values are row*64+col: any drift beyond a neighboring source
        # pixel changes the value by > 65
        assert np.nanmax(np.abs(r_exact - r_turbo)) <= 65.0, method
    # vectorize (upsample region so the cost rule picks it)
    small = grid(1, 32, 32)
    vcommon = dict(in_data=small, in_bbox=[0, 0, 32, 32], in_srs=3857,
                   out_srs=3857, in_height=32, in_width=32,
                   out_width=512, out_height=512, method="vectorize")
    v_exact = warp(**vcommon)["block"][0]
    v_turbo = warp(turbo=True, **vcommon)["block"][0]
    assert np.nanmax(np.abs(v_exact - v_turbo)) <= 33.0


def test_turbo_nonlinear_projection_small_drift():
    """Turbo on a real reprojection (3857 tile over a 4326 source):
    sampled source indices drift by at most 1 px vs exact."""
    d = grid(1, 64, 64)
    common = dict(in_data=d, in_bbox=[10.0, 45.0, 11.0, 46.0], in_srs=4326,
                  out_srs=3857, in_height=64, in_width=64,
                  out_width=64, out_height=64, method="median")
    r_exact = warp(**common)["block"][0]
    r_turbo = warp(turbo=True, **common)["block"][0]
    re_, ce = r_exact // 64, r_exact % 64
    rt, ct = r_turbo // 64, r_turbo % 64
    assert np.nanmax(np.abs(re_ - rt)) <= 1
    assert np.nanmax(np.abs(ce - ct)) <= 1


def test_epsg_fallback_pyproj_or_error():
    """VERDICT r3 next #5: unknown EPSG codes auto-use pyproj when the
    cluster has it; without pyproj the error names both escape hatches.
    EPSG:2154 (Lambert-93) has no built-in pure-numpy implementation."""
    import pytest

    from geowarp_spark.kernels import proj

    if not proj._has_pyproj():
        with pytest.raises(ValueError, match="pyproj"):
            proj.get_projection(2154)
        pytest.skip("pyproj not installed — fallback path skips cleanly")
    p = proj.get_projection(2154)
    x, y = p.forward(np.array([2.0]), np.array([46.0]))
    lon, lat = p.inverse(x, y)
    assert abs(float(lon[0]) - 2.0) < 1e-9 and abs(float(lat[0]) - 46.0) < 1e-9
    # pickle-safety: only the EPSG code crosses the boundary
    import pickle

    p2 = pickle.loads(pickle.dumps(p))
    x2, y2 = p2.forward(np.array([2.0]), np.array([46.0]))
    assert float(x2[0]) == float(x[0]) and float(y2[0]) == float(y[0])


def test_builtin_epsg_never_uses_pyproj():
    """The pinned built-ins stay the default even when pyproj exists, so
    reference-pinned results never depend on the executors' PROJ build."""
    from geowarp_spark.kernels import proj

    for code in (4326, 3857, 3031, 32615, 32760, 26910):
        assert not isinstance(proj.get_projection(code), proj.PyprojProjection)


def test_warp_col_range_matches_full_on_kept_region():
    """r5 engine-internal col_start/col_end (chunk-ownership pruning for
    the chunks plan): inside the range the output equals the
    unrestricted warp bit-for-bit; outside it is fill — exactly the
    row-range contract, transposed."""
    import numpy as np

    from geowarp_spark.kernels.warp import warp
    from geowarp_spark.sources.fixtures import build_fixture

    fx = build_fixture("rgba_webmerc")
    kw = dict(in_data=fx["data"].astype(np.float64), in_bbox=fx["bbox"],
              in_srs=fx["srs"], in_height=fx["height"], in_width=fx["width"],
              in_no_data=fx["no_data"], out_bbox=[-1e6, -1e6, 0, 0],
              out_srs=3857, out_width=64, out_height=64, out_dtype=fx["dtype"])
    for method in ("median", "near", "bilinear", "max"):
        full = warp(**kw, method=method)["block"]
        sub = warp(**kw, method=method, row_start=10, row_end=40,
                   col_start=20, col_end=50)["block"]
        np.testing.assert_array_equal(sub[:, 10:40, 20:50],
                                      full[:, 10:40, 20:50])
        outside = np.ones((64, 64), bool)
        outside[10:40, 20:50] = False
        assert len(np.unique(sub[:, outside])) <= 2  # fill (+0 for int)


def test_reduce_median_matches_nanmedian():
    """r8: the sort+middle median fast path must equal np.nanmedian
    bit-for-bit on every mask shape (incl. all-invalid rows and even
    counts, whose two middle values are averaged)."""
    import warnings

    import numpy as np

    from geowarp_spark.kernels.stats import _reduce_simple

    rng = np.random.default_rng(7)
    for _ in range(10):
        n, k = 257, int(rng.integers(1, 33))
        v = rng.integers(-50, 255, size=(n, k)).astype(np.float64)
        v[rng.random((n, k)) < 0.3] += 0.25
        valid = rng.random((n, k)) < rng.random()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = np.nanmedian(np.where(valid, v, np.nan), axis=1)
        got = _reduce_simple(v, valid, "median")
        assert np.array_equal(want, got, equal_nan=True)
