"""Pin per-tile stats produced by EXECUTING THE REAL REFERENCE ENGINE
(/root/reference/geowarp.js, run via node with its npm deps replaced by
the shims in tools/refshim/node_modules — VERDICT r2 next #7).

Three configs:
  - SAME-SRS (rgba_webmerc 3857 -> z9 3857 tiles): no projection math at
    all, so the only float operations are affine arithmetic with
    identical operation order in V8 and numpy — bit-identity is a
    meaningful claim here, across all 11 resampling methods.
  - REPROJECTED (rgb_smallscale 4326 -> 3857 tiles, all 11 methods):
    additionally exercises V8-vs-numpy transcendental
    (sin/atanh/atan/exp) agreement; agreement is MEASURED and reported,
    pinned only if exact.
  - OPTIONS (20 variants, shared list in
    geowarp_spark/sources/reference_configs.py): cutline both
    strategies, out_resolution incl. non-dyadic, row ranges, band
    reorder, no-data skip/all, out_no_data, JS rounding, expr pipeline,
    forced vectorize, physical layouts on both kernel sides, turbo.

For each config this script:
  1. runs geowarp.js over every (tile, method) job;
  2. runs the Python serial kernel (geowarp_spark.kernels.warp) on the
     same jobs and REPORTS the per-tile CRC agreement — the real
     reference-parity statement;
  3. writes fixtures/expected_reference_{name}.parquet from the JS
     outputs (the driver query then checks the DISTRIBUTED engine
     against bytes the reference itself produced).

Honest scope (also in COVERAGE.md): the shims re-implement geowarp's
small npm deps with the same formulas the Python engine uses, so this
pins geowarp.js's CONTROL FLOW (kernel loops, rounding, clamping,
no-data, band selection, insertion), not the byte-behavior of the real
npm dep tree (offline: npm deps and GeoTIFF fixtures are unfetchable).

Usage: python tools/pin_reference.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geowarp_spark.grid.tiles import tile_to_bbox_3857  # noqa: E402
from geowarp_spark.kernels.affine import Geotransform  # noqa: E402
from geowarp_spark.kernels.bbox import reproject_bbox  # noqa: E402
from geowarp_spark.kernels.proj import transformer  # noqa: E402
from geowarp_spark.kernels.warp import warp  # noqa: E402
from geowarp_spark.operators.warp_tiles import fixture_chunk_records  # noqa: E402
from geowarp_spark.sources.fixtures import build_fixture  # noqa: E402
from pin_expected import _tile_grid, _tile_bbox_4326_jvm  # noqa: E402

FIXTURES_DIR = os.path.join(REPO, "fixtures")
SHIM_DIR = os.path.join(REPO, "tools", "refshim")

from geowarp_spark.sources.reference_configs import REFERENCE_METHODS as METHODS  # noqa: E402

# must mirror __spark_entry__.q_warp_reference / q_warp_reference_reproj
CONFIGS = {
    "same_srs": dict(raster_id="rgba_webmerc", zoom=9, out_size=64,
                     bbox=[-4.0, -4.0, 0.5, 0.5], methods=METHODS),
    "reproj": dict(raster_id="rgb_smallscale", zoom=10, out_size=64,
                   bbox=[80.0, 6.5, 81.2, 7.6], methods=METHODS),
}


from geowarp_spark.sources.reference_configs import (  # noqa: E402
    OPTIONS_BBOX, OPTIONS_OUT_SIZE, OPTIONS_ZOOM, options_variants, py_opts)


def tile_list(fx, bb4326, z):
    """Tiles hit by any chunk bbox — the same membership rule as
    pin_expected / the engine's broadcast plan."""
    recs = fixture_chunk_records(fx, chunk=256, halo=8)
    boxes = np.array([r["bbox_4326"] for r in recs], dtype=np.float64)
    x0, x1, y0, y1 = _tile_grid(bb4326, z)
    tiles = []
    for x in range(x0, x1 + 1):
        for y in range(y0, y1 + 1):
            tb = np.asarray(_tile_bbox_4326_jvm(x, y, z), dtype=np.float64)
            hit = ((boxes[:, 0] <= tb[2]) & (boxes[:, 2] >= tb[0])
                   & (boxes[:, 1] <= tb[3]) & (boxes[:, 3] >= tb[1]))
            if hit.any():
                tiles.append((x, y))
    return tiles


def run_reference(fx, jobs):
    dtype_map = {"uint8": "Uint8Array", "uint16": "Uint16Array",
                 "int16": "Int16Array", "float32": "Float32Array",
                 "float64": "Float64Array"}
    spec = {
        "in_data": [band.reshape(-1).tolist() for band in fx["data"]],
        "in_bbox": fx["bbox"],
        "in_srs": fx["srs"],
        "in_width": fx["width"],
        "in_height": fx["height"],
        "in_no_data": fx["no_data"],
        "in_geotransform": fx["geotransform"],  # None -> unskewed default
        "dtype": dtype_map[str(fx["data"].dtype)],
        "jobs": jobs,
    }
    env = dict(os.environ, NODE_PATH=os.path.join(SHIM_DIR, "node_modules"))
    proc = subprocess.run(
        ["node", os.path.join(SHIM_DIR, "run_reference.js")],
        input=json.dumps(spec).encode(), capture_output=True, env=env)
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{proc.stderr.decode()[:2000]}")
    return json.loads(proc.stdout)["results"]


def python_serial(fx, jobs):
    """The Python kernel on the same jobs (full-raster serial path)."""
    full_gt = fx["geotransform"] or Geotransform.from_bbox(
        fx["bbox"], fx["width"], fx["height"]).gt
    g = Geotransform(full_gt)
    h, w = fx["height"], fx["width"]
    cs = np.array([0.0, w, 0.0, w])
    rs = np.array([0.0, 0.0, h, h])
    gx, gy = g.forward(cs, rs)
    in_bbox = [gx.min(), gy.min(), gx.max(), gy.max()]
    out = []
    for job in jobs:
        kw = py_opts(job.get("opts", {}))
        if "in_no_data" not in kw:
            kw["in_no_data"] = fx["no_data"]
        method = job["method"]
        if method == "__custom_first__":  # named custom reducer (A7)
            method = lambda vals: vals[0]  # noqa: E731
        in_data = fx["data"].astype(np.float64)
        if "in_layout" in kw:
            # exercise the layout adapter path: hand the kernel the same
            # nested/interleaved physical structure the JS side gets
            from geowarp_spark.kernels.layout import from_brc

            in_data = from_brc(fx["data"], kw["in_layout"])
        res = warp(
            in_data=in_data,
            in_bbox=in_bbox,
            in_geotransform=list(full_gt),
            in_srs=fx["srs"],
            in_height=h, in_width=w,
            out_bbox=job["out_bbox"], out_srs=job["out_srs"],
            out_width=job["out_width"], out_height=job["out_height"],
            method=method,
            out_dtype=fx["dtype"],
            **kw,
        )
        out.append(res["block"])
    return out


def _pin(rows, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {
        "z": pa.array([r["z"] for r in rows], pa.int64()),
        "x": pa.array([r["x"] for r in rows], pa.int64()),
        "y": pa.array([r["y"] for r in rows], pa.int64()),
        "method": pa.array([r["method"] for r in rows], pa.string()),
        "bands": pa.array([r["bands"] for r in rows], pa.int64()),
        "valid_px": pa.array([r["valid_px"] for r in rows], pa.int64()),
        "payload_crc": pa.array([r["payload_crc"] for r in rows], pa.int64()),
    }
    if rows and "config" in rows[0]:
        cols["config"] = pa.array([r["config"] for r in rows], pa.string())
    path = os.path.join(FIXTURES_DIR, f"expected_reference_{name}.parquet")
    pq.write_table(pa.table(cols), path, compression="snappy")
    print(f"  pinned {len(rows)} rows -> {path}")


def _compare_and_rows(jobs, js, py, dt, out_size, tag_key=None):
    n_match = 0
    mismatched = []
    rows = []
    for job, jres, pblock in zip(jobs, js, py):
        jblock = np.array(jres["data"], dtype=dt).reshape(
            jres["bands"], out_size, out_size)
        crc_js = int(zlib.crc32(jblock.tobytes()) & 0xFFFFFFFF)
        crc_py = int(zlib.crc32(pblock.tobytes()) & 0xFFFFFFFF)
        if crc_js == crc_py:
            n_match += 1
        else:
            diff = (int((jblock != pblock).sum())
                    if jblock.shape == pblock.shape else -1)
            mismatched.append((job.get("config", job["method"]),
                               job["x"], job["y"], diff))
        row = {
            "z": job["z"], "x": job["x"], "y": job["y"],
            "method": job["method"],
            "bands": int(jblock.shape[0]),
            "valid_px": int(np.isfinite(jblock.astype(np.float64)).sum()),
            "payload_crc": crc_js,
        }
        if "config" in job:
            row["config"] = job["config"]
        rows.append(row)
    return rows, n_match, mismatched


def main():
    for name, cfg in CONFIGS.items():
        fx = build_fixture(cfg["raster_id"])
        z = cfg["zoom"]
        tiles = tile_list(fx, cfg["bbox"], z)
        jobs = []
        for method in cfg["methods"]:
            for (x, y) in tiles:
                jobs.append({
                    "z": z, "x": x, "y": y,
                    "out_bbox": [float(v) for v in tile_to_bbox_3857(x, y, z)],
                    "out_srs": 3857,
                    "out_width": cfg["out_size"], "out_height": cfg["out_size"],
                    "method": method,
                })
        js = run_reference(fx, jobs)
        py = python_serial(fx, jobs)
        rows, n_match, mismatched = _compare_and_rows(
            jobs, js, py, np.dtype(fx["dtype"]), cfg["out_size"])
        pct = 100.0 * n_match / max(1, len(jobs))
        print(f"{name}: {len(tiles)} tiles x {len(cfg['methods'])} methods = "
              f"{len(jobs)} warps; JS==numpy bit-identity {n_match}/{len(jobs)}"
              f" ({pct:.1f}%)")
        for m in mismatched[:10]:
            print(f"  MISMATCH config={m[0]} tile=({m[1]},{m[2]}) diff_px={m[3]}")
        if pct < 100.0:
            print(f"  NOT pinning {name} (agreement below 100%); see COVERAGE.md")
            continue
        _pin(rows, name)

    # the option surface: every variant over a small same-srs tile grid
    fx = build_fixture("rgba_webmerc")
    tiles = tile_list(fx, OPTIONS_BBOX, OPTIONS_ZOOM)
    jobs = []
    for tag, method, js_opts in options_variants():
        for (x, y) in tiles:
            jobs.append({
                "z": OPTIONS_ZOOM, "x": x, "y": y, "config": tag,
                "out_bbox": [float(v) for v in
                             tile_to_bbox_3857(x, y, OPTIONS_ZOOM)],
                "out_srs": 3857,
                "out_width": OPTIONS_OUT_SIZE, "out_height": OPTIONS_OUT_SIZE,
                "method": method, "opts": js_opts,
            })
    js = run_reference(fx, jobs)
    py = python_serial(fx, jobs)
    rows, n_match, mismatched = _compare_and_rows(
        jobs, js, py, np.dtype(fx["dtype"]), OPTIONS_OUT_SIZE)
    pct = 100.0 * n_match / max(1, len(jobs))
    print(f"options: {len(tiles)} tiles x {len(options_variants())} variants"
          f" = {len(jobs)} warps; JS==numpy bit-identity {n_match}/{len(jobs)}"
          f" ({pct:.1f}%)")
    for m in mismatched[:20]:
        print(f"  MISMATCH config={m[0]} tile=({m[1]},{m[2]}) diff_px={m[3]}")
    if pct == 100.0:
        _pin(rows, "options")
    else:
        print("  NOT pinning options (agreement below 100%); see COVERAGE.md")


if __name__ == "__main__":
    main()
