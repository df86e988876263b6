"""Pinned golden outputs (FIXTURES.md §7).

Hashes computed once from the Phase-0 numpy kernel whose semantics are
pinned to the reference tables in SURVEY.md §2 (half-up rounding F10,
mode-tie-smallest A5, bilinear edge fallbacks, degenerate windows A9).
Any semantic drift in the kernels across rounds breaks these.

Regenerate (after an INTENTIONAL semantics change only):
    python tests/test_goldens.py regen
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowarp_spark.kernels.warp import warp  # noqa: E402
from geowarp_spark.sources.fixtures import FIXTURE_IDS, build_fixture  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")

# (fixture, method, out_srs, out_size, extra kwargs) — mirrors the
# reference test matrix axes (test.js:198-305): methods x sizes x
# out_bands x resolutions x turbo
CASES = [
    ("rgba_webmerc", "near", 4326, 64, {}),
    ("rgba_webmerc", "bilinear", 4326, 64, {"round_values": True}),
    ("rgba_webmerc", "median", 4326, 64, {}),
    ("rgba_webmerc", "mode", 4326, 64, {}),
    ("rgba_webmerc", "mode-median", 4326, 64, {}),
    ("rgba_webmerc", "near", 4326, 64, {"out_bands": [2, 1, 0]}),
    ("rgba_webmerc", "near", 4326, 64, {"out_resolution": [0.5, 0.5]}),
    ("rgb_smallscale", "near", 3857, 64, {}),
    ("rgb_smallscale", "min", 3857, 64, {}),
    ("rgb_smallscale", "max", 3857, 64, {}),
    ("rgb_smallscale", "mean", 3857, 64, {"round_values": True}),
    ("sat_utm", "near", 3857, 64, {}),
    ("sat_utm", "median", 3857, 64, {}),
    # vectorize is the upsampling path (R3 picks it only when out/in pixel
    # ratio < 0.1, geowarp.js:597): warp a small sub-bbox so each input
    # pixel paints many output pixels
    ("tiny_4326", "vectorize", 3857, 64,
     {"out_bbox": [1130000.0, 5670000.0, 1131000.0, 5671000.0]}),
    ("palette_utm", "near", 3857, 64, {}),
    ("skewed_sar", "near", 3857, 64, {}),
    ("skewed_sar", "bilinear", 3857, 64, {"round_values": True}),
    ("nan_polar", "near", 3857, 64, {"out_no_data": 0.0}),
    ("nan_polar", "median", 3857, 64, {"out_no_data": 0.0}),
    ("globe_3857", "median", 4326, 64, {"out_no_data": 0.0}),
    ("globe_3857", "near", 4326, 64, {"out_no_data": 0.0}),
    ("tiny_4326", "near", 3857, 64, {}),
    ("tiny_4326", "mode-mean", 3857, 64, {}),
]


def _key(fid, method, srs, size, extra):
    ek = ",".join(f"{k}={v}" for k, v in sorted(extra.items()))
    return f"{fid}|{method}|{srs}|{size}|{ek}"


def _run(fid, method, out_srs, size, extra):
    fx = build_fixture(fid)
    res = warp(
        in_data=fx["data"], in_bbox=fx["bbox"],
        in_geotransform=fx["geotransform"], in_srs=fx["srs"],
        in_height=fx["height"], in_width=fx["width"],
        in_no_data=fx["no_data"], out_srs=out_srs,
        out_width=size, out_height=size, method=method, **extra,
    )
    block = np.nan_to_num(res["block"].astype(np.float64), nan=-1.0)
    h = hashlib.md5(np.ascontiguousarray(block).tobytes()).hexdigest()
    # the reference's own oracle: most common pixel tuple (test.js:264-274)
    flat = block.reshape(block.shape[0], -1)
    px, counts = np.unique(flat.T, axis=0, return_counts=True)
    top = px[counts.argmax()].tolist()
    return h, top


def regen():
    out = {}
    for fid, method, srs, size, extra in CASES:
        h, top = _run(fid, method, srs, size, extra)
        out[_key(fid, method, srs, size, extra)] = {"md5": h, "top_pixel": top}
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} goldens")


def test_goldens():
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    for fid, method, srs, size, extra in CASES:
        k = _key(fid, method, srs, size, extra)
        h, top = _run(fid, method, srs, size, extra)
        assert k in goldens, f"missing golden {k}"
        assert goldens[k]["md5"] == h, f"block hash drift: {k}"
        assert goldens[k]["top_pixel"] == top, f"top-pixel drift: {k}"


def test_no_nan_in_nan_polar_output():
    # test.js:818-862 semantics: NaN input never leaks into output
    fx = build_fixture("nan_polar")
    res = warp(
        in_data=fx["data"], in_bbox=fx["bbox"], in_srs=fx["srs"],
        in_height=fx["height"], in_width=fx["width"],
        out_srs=3857, out_width=64, out_height=64, method="near",
        out_no_data=0.0,
    )
    assert not np.isnan(res["block"]).any()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
