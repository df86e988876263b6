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
