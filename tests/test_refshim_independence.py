"""De-circularizing the refshim dependency shims (VERDICT r4 next #4).

The reference-execution pin runs the REAL geowarp.js with its npm deps
replaced by hand-written shims (tools/refshim/node_modules) that use the
same formulas as geowarp_spark.kernels — so a bug shared by shim and
kernel could hide from the pin.  These tests break the circle two ways:

1. DIVERGENCE property-tests: each shim is executed standalone under
   node and compared against a THIRD implementation written fresh in
   this file (numpy.median for mediana; a direct nested-structure
   interpreter for xdim's layout strings; Franklin's PNPOLY
   crossing-number test for dufour-peyton-intersection) — none of which
   import geowarp_spark.kernels.  A formula bug in a shim now has to
   fool an independent algorithm, not its own mirror.
2. INJECTED-BUG detection: a deliberately-broken shim copy (mediana's
   even-length rule, xdim's axis order, dufour's column rounding) must
   change the output of a real geowarp.js run — proving the pin
   pipeline is sensitive to dep byte-behavior, not just control flow.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

NODE = shutil.which("node")
pytestmark = pytest.mark.skipif(NODE is None, reason="node not available")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM_DIR = os.path.join(REPO, "tools", "refshim", "node_modules")
RUNNER = os.path.join(REPO, "tools", "refshim", "run_reference.js")


def _node(script: str, payload, node_path: str = SHIM_DIR):
    env = dict(os.environ, NODE_PATH=node_path)
    p = subprocess.run([NODE, "-e", script], input=json.dumps(payload).encode(),
                       capture_output=True, env=env)
    assert p.returncode == 0, p.stderr.decode()
    return json.loads(p.stdout.decode())


_STDIN_WRAP = """
let chunks = [];
process.stdin.on("data", d => chunks.push(d));
process.stdin.on("end", () => {{
  const input = JSON.parse(Buffer.concat(chunks).toString());
  {body}
}});
"""


# ------------------------------------------------------------- mediana


def test_mediana_shim_matches_numpy():
    """Shim median vs numpy.median (independent implementation) over
    random int/float arrays, odd and even lengths — pins the even-avg
    rule (SURVEY A4) against a third party, not the Python kernel."""
    rng = np.random.default_rng(5)
    arrays = []
    for n in list(range(1, 24)) + [101, 256]:
        arrays.append(rng.integers(-1000, 1000, size=n).tolist())
        arrays.append(np.round(rng.normal(0, 50, size=n), 6).tolist())
    script = _STDIN_WRAP.format(body="""
  const { calculate } = require("mediana");
  process.stdout.write(JSON.stringify(input.map(a => calculate(a))));
""")
    got = _node(script, arrays)
    want = [float(np.median(np.asarray(a))) for a in arrays]
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


# ---------------------------------------------------------------- xdim


def _nested_expected(arr: np.ndarray, layout: str):
    """Independent interpreter of the layout-string semantics, written
    from the documented rule only: each [..] group is one nesting level,
    axes inside a group are row-major (first listed slowest).  Does NOT
    import geowarp_spark.kernels.layout."""
    sizes = {"band": arr.shape[0], "row": arr.shape[1], "column": arr.shape[2]}
    groups = [g.split(",") for g in layout[1:-1].split("][")]

    def rec(gi, fixed):
        g = groups[gi]
        dims = [sizes[a] for a in g]
        out = []
        for flat in range(int(np.prod(dims))):
            vals, rem = {}, flat
            for a in reversed(g):
                vals[a] = rem % sizes[a]
                rem //= sizes[a]
            nf = {**fixed, **vals}
            if gi == len(groups) - 1:
                out.append(int(arr[nf["band"], nf["row"], nf["column"]]))
            else:
                out.append(rec(gi + 1, nf))
        return out

    return rec(0, {})


@pytest.mark.parametrize("layout", [
    "[band][row][column]", "[band][row,column]", "[row][column][band]",
    "[row,column,band]", "[row,column][band]",
])
def test_xdim_shim_matches_independent_interpreter(layout):
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 255, size=(3, 4, 5)).astype(np.int64)
    sizes = {"band": 3, "row": 4, "column": 5}
    script = _STDIN_WRAP.format(body="""
  const xdim = require("xdim");
  const { bands, layout, sizes, points, rect } = input;
  // build via prepareData + prepareUpdate (the write path geowarp uses)
  const { data } = xdim.prepareData({ layout, sizes,
      arrayTypes: new Array(sizes.band).fill("Array") });
  const update = xdim.prepareUpdate({ data, layout, sizes });
  for (let b = 0; b < sizes.band; b++)
    for (let r = 0; r < sizes.row; r++)
      for (let c = 0; c < sizes.column; c++)
        update({ point: { band: b, row: r, column: c },
                 value: bands[b][r * sizes.column + c] });
  // read back via prepareSelect (the read path) + clip
  const select = xdim.prepareSelect({ data, layout, sizes });
  const sel = points.map(p => select({ point: p }).value);
  const clipped = xdim.clip({ data, layout, sizes, rect }).data;
  process.stdout.write(JSON.stringify({ data, sel, clipped }));
""")
    points = [{"band": int(b), "row": int(r), "column": int(c)}
              for b, r, c in zip(rng.integers(0, 3, 8), rng.integers(0, 4, 8),
                                 rng.integers(0, 5, 8))]
    rect = {"band": [0, 2], "row": [1, 3], "column": [2, 4]}
    payload = {"bands": [arr[b].reshape(-1).tolist() for b in range(3)],
               "layout": layout, "sizes": sizes, "points": points,
               "rect": rect}
    got = _node(script, payload)
    # 1. the nested structure equals the independent interpreter's
    assert got["data"] == _nested_expected(arr, layout)
    # 2. point selects equal direct ndarray indexing
    assert got["sel"] == [int(arr[p["band"], p["row"], p["column"]])
                          for p in points]
    # 3. clip equals numpy slicing flattened band-major row-major
    want_clip = arr[0:3, 1:4, 2:5].reshape(-1).tolist()
    assert got["clipped"] == want_clip


# ------------------------------------------- dufour-peyton-intersection


def _pnpoly_mask(rings, bbox, width, height):
    """Franklin's PNPOLY crossing-number algorithm at pixel centers —
    an even-odd rasterizer with a DIFFERENT algorithm than the shim's
    scanline (per-pixel ray casting vs per-row edge intersection)."""
    xmin, ymin, xmax, ymax = bbox
    pw = (xmax - xmin) / width
    ph = (ymax - ymin) / height
    cx = xmin + (np.arange(width) + 0.5) * pw
    cy = ymax - (np.arange(height) + 0.5) * ph
    X, Y = np.meshgrid(cx, cy)
    inside = np.zeros((height, width), dtype=bool)
    for ring in rings:
        v = np.asarray(ring, dtype=np.float64)
        x0, y0 = v[:-1, 0], v[:-1, 1]
        x1, y1 = v[1:, 0], v[1:, 1]
        for i in range(len(x0)):
            if y0[i] == y1[i]:
                continue
            crosses = (y0[i] > Y) != (y1[i] > Y)
            xi = (x1[i] - x0[i]) * (Y - y0[i]) / (y1[i] - y0[i]) + x0[i]
            inside ^= crosses & (X < xi)
    return inside


@pytest.mark.parametrize("shape", ["convex", "star", "multiring"])
def test_dufour_shim_matches_pnpoly(shape):
    rng = np.random.default_rng({"convex": 1, "star": 2, "multiring": 3}[shape])
    bbox = [0.0, 0.0, 10.0, 10.0]
    W = H = 40

    def poly(cx, cy, rmin, rmax, n):
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(rmin, rmax, n)
        pts = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        return np.vstack([pts, pts[:1]]).tolist()

    if shape == "convex":
        rings = [poly(5, 5, 3.0, 3.0, 12)]
    elif shape == "star":
        ang = np.linspace(0, 2 * np.pi, 17)[:-1]
        rad = np.where(np.arange(16) % 2 == 0, 4.3, 1.7)
        pts = np.stack([5 + rad * np.cos(ang), 5 + rad * np.sin(ang)], axis=1)
        pts += rng.uniform(-0.05, 0.05, pts.shape)  # off-grid vertices
        rings = [np.vstack([pts, pts[:1]]).tolist()]
    else:  # outer ring + hole (even-odd: hole uncovers)
        rings = [poly(5, 5, 4.0, 4.0, 16), poly(5, 5, 1.5, 1.5, 10)]

    script = _STDIN_WRAP.format(body="""
  const { calculate } = require("dufour-peyton-intersection");
  const { rows } = calculate({
    raster_bbox: input.bbox, raster_width: input.w, raster_height: input.h,
    geometry: { type: "Polygon", coordinates: input.rings } });
  process.stdout.write(JSON.stringify(rows));
""")
    rows = _node(script, {"bbox": bbox, "w": W, "h": H, "rings": rings})
    got = np.zeros((H, W), dtype=bool)
    for r, segs in enumerate(rows):
        for c0, c1 in segs:
            got[r, c0:c1 + 1] = True
    want = _pnpoly_mask(rings, bbox, W, H)
    # random float vertices -> exact ties at pixel centers have measure
    # zero; demand exact agreement
    mism = int((got != want).sum())
    assert mism == 0, f"{mism} pixels differ between scanline shim and PNPOLY"
    assert want.sum() > 50  # the polygon genuinely covered pixels


# ------------------------------------------------- injected-bug probes


def _run_reference(spec, node_path=SHIM_DIR, allow_crash=False):
    env = dict(os.environ, NODE_PATH=node_path)
    p = subprocess.run([NODE, RUNNER], input=json.dumps(spec).encode(),
                       capture_output=True, env=env)
    if p.returncode != 0:
        assert allow_crash, p.stderr.decode()
        # a crashed reference run is a loudly-detected divergence
        return {"__crashed__": p.stderr.decode()[:200]}
    return json.loads(p.stdout.decode())


def _median_spec():
    # 4x4 -> 2x2: every output pixel aggregates a 2x2 window (even count,
    # distinct values) so the even-avg rule is on the hot path
    vals = [[10, 20, 1, 2,
             30, 40, 3, 4,
             5, 6, 50, 60,
             7, 8, 70, 80]]
    return {
        "in_data": vals, "in_bbox": [0, 0, 4, 4], "in_srs": 4326,
        "in_width": 4, "in_height": 4, "dtype": "Float64Array",
        "jobs": [{"z": 0, "x": 0, "y": 0, "out_bbox": [0, 0, 4, 4],
                  "out_srs": 4326, "out_width": 2, "out_height": 2,
                  "method": "median"}],
    }


@pytest.mark.parametrize("dep,patch", [
    ("mediana", ("(s[mid - 1] + s[mid]) / 2", "s[mid - 1]")),
    # select-only patch (read path swaps row/column): a symmetric
    # read+write patch would round-trip invisibly — the probe must break
    # exactly one side of the contract
    ("xdim", ("return ({ point }) => ({ value: data[point.band][point.row * width + point.column] });",
              "return ({ point }) => ({ value: data[point.band][point.column * width + point.row] });")),
    ("dufour-peyton-intersection",
     ("c0 = Math.max(c0, 0)", "c0 = Math.max(c0 + 1, 0)")),
])
def test_injected_shim_bug_is_caught(tmp_path, dep, patch):
    """A deliberately-wrong shim must CHANGE the geowarp.js output — the
    pin pipeline detects dep-level byte behavior, not only control flow.
    (If this failed, a shared shim/kernel bug could hide from the pin.)"""
    broken = tmp_path / "node_modules"
    shutil.copytree(SHIM_DIR, broken)
    old, new = patch
    f = {"mediana": "index.js", "xdim": "index.js",
         "dufour-peyton-intersection": "index.js"}[dep]
    path = broken / dep / f
    src = path.read_text()
    assert old in src, f"patch anchor missing in {dep}/{f}"
    path.write_text(src.replace(old, new, 1))

    if dep == "dufour-peyton-intersection":
        # cutline config exercises the rasterizer
        spec = _median_spec()
        spec["jobs"][0]["opts"] = {
            "cutline_srs": 4326,  # geowarp.js:357 has no default
            "cutline": {
                "type": "Polygon",
                "coordinates": [[[0.2, 0.2], [3.8, 0.3], [3.7, 3.8],
                                 [0.3, 3.7], [0.2, 0.2]]]}}
    else:
        spec = _median_spec()

    good = _run_reference(spec)
    bad = _run_reference(spec, node_path=str(broken), allow_crash=True)
    # caught = output differs OR the run crashes outright (either way the
    # pin comparison cannot silently pass)
    assert good != bad, f"injected {dep} bug was NOT caught by the pin path"

    # sanity: the healthy run's medians follow the even-avg rule
    if dep == "mediana":
        assert good["results"][0]["data"][0] == [25.0, 2.5, 6.5, 65.0]