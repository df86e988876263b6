"""Pin expected per-tile stats for the warp queries' DuckDB oracles.

The raster engine's outputs (q_warp_tiles / q_warp_*_chunks) are not
SQL-expressible, so the oracle is a PINNED EXPECTED TABLE computed here by
an INDEPENDENT SERIAL PATH — no Spark, no chunk stitching: each tile is
warped from the FULL fixture raster in one plain-Python loop (the style of
the reference's own expected-output oracle, test.js:264-274, which pins
the most-common pixel per warped tile).  The distributed engine must then
reproduce, per tile: band count, count of finite pixels, and the CRC-32
of the raw payload bytes (bit-for-bit).

That makes the driver's CORRECTNESS check a real statement:
  distributed chunked+halo-stitched execution  ==  serial full-raster warp
which is exactly the north rule's "tile assignments and tile pixel values
identical" requirement, replayable by DuckDB via read_parquet().

Determinism: fixtures are seeded (seed=42), the kernel is pure numpy with
no threading nondeterminism, and the tile set derives from the same
chunk-bbox-hit rule the broadcast-map plan uses — so this file writes the
same bytes on every run (verified by the idempotence check at the end).

Usage: python tools/pin_expected.py
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geowarp_spark.grid.tiles import (  # noqa: E402
    point_to_tile, tile_to_bbox_3857, tile_to_bbox_4326,
)
from geowarp_spark.kernels.affine import Geotransform  # noqa: E402
from geowarp_spark.kernels.bbox import reproject_bbox  # noqa: E402
from geowarp_spark.kernels.proj import transformer  # noqa: E402
from geowarp_spark.kernels.warp import warp  # noqa: E402
from geowarp_spark.operators.warp_tiles import fixture_chunk_records  # noqa: E402
from geowarp_spark.sources.fixtures import build_fixture  # noqa: E402

FIXTURES_DIR = os.path.join(REPO, "fixtures")

# must mirror the query configs in __spark_entry__.q_warp_* queries
CONFIGS = {
    "expected_warp_tiles": dict(
        raster_id="rgb_smallscale", zooms=[9, 10], method="near", out_size=128),
    "expected_warp_boxstats": dict(
        raster_id="rgba_webmerc", zooms=[8, 9], method="median", out_size=64),
    "expected_warp_bilinear": dict(
        raster_id="rgba_webmerc", zooms=[9], method="bilinear", out_size=64),
    # vectorize needs out px << in px (the near-vectorize cost rule,
    # geowarp.js:597): z14 tiles over the small-scale raster, restricted
    # to a sub-bbox so the tile count stays oracle-sized
    "expected_warp_vectorize": dict(
        raster_id="rgb_smallscale", zooms=[14], method="near-vectorize",
        out_size=256, bbox=[80.0, 7.0, 80.12, 7.12]),
    # cutline clipping + out_resolution sample replication under the same
    # serial oracle (geowarp.js:151-155 cutline, 174-179 out_resolution;
    # test.js:30-77 cutline inside/outside, 615-651 rescale) — the driver
    # query runs this through the CHUNK-ANCHORED plan
    "expected_warp_cutline": dict(
        raster_id="rgba_webmerc", zooms=[9], method="median", out_size=64,
        extra="cutline"),
    # overview-ingest oracle (round 5): the serial warp runs on the
    # DECIMATED raster — exactly what tiff_chunks_df(scale=2) feeds the
    # distributed plan when it selects the 1/2 overview IFD
    "expected_warp_overview": dict(
        raster_id="rgb_smallscale", zooms=[9], method="near", out_size=128,
        decimate=2),
    # JPEG-ingest oracle (round 6): the serial warp runs on the raster
    # DECODED from a compression-7 (baseline JPEG, JPEGTables) GeoTIFF —
    # exactly what tiff_chunks_df feeds the distributed plan.  Codec
    # correctness is pinned separately (spec-bound unit tests); this pin
    # makes distributed-ingest == serial-decode+warp a driver-visible row.
    "expected_warp_jpeg": dict(
        raster_id="rgb_smallscale", zooms=[9], method="near", out_size=128,
        jpeg=True),
    # composite-mosaic oracles (round 6): the serial warp of the WHOLE
    # raster under non-uniform-support methods — the distributed path
    # reassembles it from two unaligned half-rasters via mosaic_chunks
    # (pixel-level composite on the shared grid), so bilinear/median
    # windows straddling the raster seam must gather across it exactly
    "expected_warp_mosaic_bilinear": dict(
        raster_id="rgb_smallscale", zooms=[9, 10], method="bilinear",
        out_size=128),
    "expected_warp_mosaic_median": dict(
        raster_id="rgb_smallscale", zooms=[9, 10], method="median",
        out_size=128),
}


def _extra_kwargs(name):
    """Named extra-warp-kwargs sets (kept out of CONFIGS so the dict stays
    JSON-ish and the query side can import the same cutline geometry)."""
    if name == "cutline":
        from geowarp_spark.sources.fixtures import demo_cutline

        return dict(cutline=demo_cutline(), cutline_srs=3857,
                    cutline_strategy="outside", out_resolution=(0.5, 0.5))
    return {}


def _tile_grid(bb4326, z):
    """Same (x, y) ranges as operators.warp_tiles.tiles_df."""
    w, s, e, n = bb4326
    xa, ya = point_to_tile(np.array([w]), np.array([n]), z)
    xb, yb = point_to_tile(np.array([e]), np.array([s]), z)
    return int(xa[0]), int(xb[0]), int(ya[0]), int(yb[0])


def _tile_bbox_4326_jvm(x, y, z):
    """The JVM tile-bbox formula from tiles_df (tilebelt lat edges) —
    replicated in float64 numpy so the chunk-hit rule matches exactly."""
    n = 1 << z
    lat_n = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    lat_s = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    lon_w = x / n * 360.0 - 180.0
    lon_e = (x + 1) / n * 360.0 - 180.0
    return [lon_w, lat_s, lon_e, lat_n]


def serial_expected(raster_id, zooms, method, out_size, out_srs=3857,
                    bbox=None, extra=None, decimate=None, jpeg=False):
    extra_kw = _extra_kwargs(extra) if extra else {}
    fx = build_fixture(raster_id)
    if jpeg:
        # round-trip through the deterministic baseline-JPEG GeoTIFF
        # writer/reader; the distributed path ingests the same bytes
        from geowarp_spark.sources.tiff import read_tiff, write_tiff

        fx = read_tiff(write_tiff(fx, compression="jpeg", layout="tiles"),
                       raster_id=raster_id)
    if decimate:
        # nearest decimation + scaled geotransform — identical to
        # sources.tiff's overview layout (same origin, same bbox,
        # coarser pixels)
        d = np.ascontiguousarray(fx["data"][:, ::decimate, ::decimate])
        g0 = fx["geotransform"] or Geotransform.from_bbox(
            fx["bbox"], fx["width"], fx["height"]).gt
        nw, nh = int(d.shape[2]), int(d.shape[1])
        fx = dict(fx, data=d, width=nw, height=nh, geotransform=[
            g0[0], g0[1] * fx["width"] / nw, g0[2],
            g0[3], g0[4], g0[5] * fx["height"] / nh])
    inv = transformer(fx["srs"], 4326)
    bb4326 = bbox if bbox is not None else reproject_bbox(
        fx["bbox"], inv.transform, density=16, nan_strategy="skip")
    # tile membership uses the same chunk-bbox-hit rule as the engine, but
    # the WARP below uses the full raster — an independent assembly path
    recs = fixture_chunk_records(fx, chunk=256, halo=8)
    boxes = np.array([r["bbox_4326"] for r in recs], dtype=np.float64)

    full_gt = fx["geotransform"] or Geotransform.from_bbox(
        fx["bbox"], fx["width"], fx["height"]).gt
    g = Geotransform(full_gt)
    h, w = fx["height"], fx["width"]
    cs = np.array([0.0, w, 0.0, w])
    rs = np.array([0.0, 0.0, h, h])
    gx, gy = g.forward(cs, rs)
    in_bbox = [gx.min(), gy.min(), gx.max(), gy.max()]
    fdata = fx["data"].astype(np.float64)

    rows = []
    for z in zooms:
        x0, x1, y0, y1 = _tile_grid(bb4326, z)
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                tb = np.asarray(_tile_bbox_4326_jvm(x, y, z), dtype=np.float64)
                hit = ((boxes[:, 0] <= tb[2]) & (boxes[:, 2] >= tb[0])
                       & (boxes[:, 1] <= tb[3]) & (boxes[:, 3] >= tb[1]))
                if not hit.any():
                    continue
                out_bbox = (tile_to_bbox_3857(x, y, z) if out_srs == 3857
                            else tile_to_bbox_4326(x, y, z))
                res = warp(
                    in_data=fdata,
                    in_bbox=in_bbox,
                    in_geotransform=list(full_gt),
                    in_srs=fx["srs"],
                    in_height=h,
                    in_width=w,
                    in_no_data=fx["no_data"],
                    out_bbox=out_bbox,
                    out_srs=out_srs,
                    out_width=out_size,
                    out_height=out_size,
                    method=method,
                    out_dtype=fx["dtype"],
                    **extra_kw,
                )
                block = res["block"]
                rows.append({
                    "z": int(z), "x": int(x), "y": int(y),
                    "method": method,
                    "bands": int(block.shape[0]),
                    "valid_px": int(np.isfinite(block.astype(np.float64)).sum()),
                    "payload_crc": int(zlib.crc32(block.tobytes()) & 0xFFFFFFFF),
                })
    return rows


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(FIXTURES_DIR, exist_ok=True)
    for name, cfg in CONFIGS.items():
        rows = serial_expected(cfg["raster_id"], cfg["zooms"], cfg["method"],
                               cfg["out_size"], bbox=cfg.get("bbox"),
                               extra=cfg.get("extra"),
                               decimate=cfg.get("decimate"),
                               jpeg=cfg.get("jpeg", False))
        table = pa.table({
            "z": pa.array([r["z"] for r in rows], pa.int64()),
            "x": pa.array([r["x"] for r in rows], pa.int64()),
            "y": pa.array([r["y"] for r in rows], pa.int64()),
            "method": pa.array([r["method"] for r in rows], pa.string()),
            "bands": pa.array([r["bands"] for r in rows], pa.int64()),
            "valid_px": pa.array([r["valid_px"] for r in rows], pa.int64()),
            "payload_crc": pa.array([r["payload_crc"] for r in rows], pa.int64()),
        })
        path = os.path.join(FIXTURES_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="snappy")
        print(f"{name}: {len(rows)} tiles -> {path}")
        # idempotence: a second serial run must produce identical rows
        again = serial_expected(cfg["raster_id"], cfg["zooms"], cfg["method"],
                                cfg["out_size"], bbox=cfg.get("bbox"),
                                extra=cfg.get("extra"),
                                decimate=cfg.get("decimate"),
                                jpeg=cfg.get("jpeg", False))
        assert again == rows, f"{name}: serial run not deterministic!"


if __name__ == "__main__":
    main()
