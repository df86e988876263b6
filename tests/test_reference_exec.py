"""Regression guard for the reference-execution harness: the ACTUAL
geowarp.js (node + tools/refshim shims) must keep agreeing with the
Python kernel bit-for-bit on a micro job.  The full grids are pinned by
tools/pin_reference.py; this test keeps the harness itself from rotting
(shim API drift, runner protocol changes) at a few seconds' cost."""

import shutil
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.mark.skipif(shutil.which("node") is None, reason="node not available")
def test_reference_execution_micro_parity():
    from pin_reference import python_serial, run_reference
    from geowarp_spark.grid.tiles import tile_to_bbox_3857
    from geowarp_spark.sources.fixtures import build_fixture

    fx = build_fixture("rgba_webmerc")
    jobs = []
    for method in ("near", "median"):
        jobs.append({
            "z": 9, "x": 254, "y": 254,
            "out_bbox": [float(v) for v in tile_to_bbox_3857(254, 254, 9)],
            "out_srs": 3857, "out_width": 32, "out_height": 32,
            "method": method,
        })
    js = run_reference(fx, jobs)
    py = python_serial(fx, jobs)
    for job, jres, pblock in zip(jobs, js, py):
        jblock = np.array(jres["data"], dtype=np.dtype(fx["dtype"])).reshape(
            jres["bands"], 32, 32)
        assert zlib.crc32(jblock.tobytes()) == zlib.crc32(pblock.tobytes()), job


@pytest.mark.skipif(shutil.which("node") is None, reason="node not available")
def test_reference_execution_custom_reducer_parity():
    """A7 custom reducer ('first' of the window's valid values in scan
    order, test.js:248) executed by the real geowarp.js — both engines
    call the injected function with the same filtered window, so the
    contract (not just builtin stats) is pinned."""
    from pin_reference import python_serial, run_reference
    from geowarp_spark.grid.tiles import tile_to_bbox_3857
    from geowarp_spark.sources.fixtures import build_fixture

    fx = build_fixture("rgba_webmerc")
    jobs = [{
        "z": 9, "x": 254 + i, "y": 254,
        "out_bbox": [float(v) for v in tile_to_bbox_3857(254 + i, 254, 9)],
        "out_srs": 3857, "out_width": 32, "out_height": 32,
        "method": "__custom_first__",
    } for i in range(3)]
    js = run_reference(fx, jobs)
    py = python_serial(fx, jobs)
    for job, jres, pblock in zip(jobs, js, py):
        jblock = np.array(jres["data"], dtype=np.dtype(fx["dtype"])).reshape(
            jres["bands"], 32, 32)
        assert zlib.crc32(jblock.tobytes()) == zlib.crc32(pblock.tobytes()), job


@pytest.mark.skipif(shutil.which("node") is None, reason="node not available")
def test_reference_execution_skewed_geotransform_parity():
    """Nonzero skew terms: the real geowarp.js warps the skewed_sar
    fixture through its injected 6-param affine (geowarp.js:304-306)
    bit-identically to the Python kernel — pins the skewed inverse and
    its interaction with sample-box snapping (test.js skew cases)."""
    from pin_reference import python_serial, run_reference
    from geowarp_spark.sources.fixtures import build_fixture

    fx = build_fixture("skewed_sar")  # srs 32760, gt skew terms 0.4 / 0.3
    xmin, ymin, xmax, ymax = fx["bbox"]
    w3, h3 = (xmax - xmin) / 3.0, (ymax - ymin) / 3.0
    jobs = []
    for method in ("near", "median", "bilinear"):
        for i in range(3):
            for j in range(3):
                jobs.append({
                    "z": 0, "x": i, "y": j,
                    "out_bbox": [xmin + i * w3, ymin + j * h3,
                                 xmin + (i + 1) * w3, ymin + (j + 1) * h3],
                    "out_srs": fx["srs"], "out_width": 32, "out_height": 32,
                    "method": method,
                })
    js = run_reference(fx, jobs)
    py = python_serial(fx, jobs)
    n_match = sum(
        zlib.crc32(np.array(jres["data"], dtype=np.dtype(fx["dtype"])).reshape(
            jres["bands"], 32, 32).tobytes()) == zlib.crc32(pblock.tobytes())
        for jres, pblock in zip(js, py))
    assert n_match == len(jobs), f"{n_match}/{len(jobs)} skewed warps identical"
