"""Sinks: PNG/PPM debug writers (S4) and the production tile writer (S6).

The reference's tests write warped tiles as PNGs for visual inspection
(writePNGSync, test.js:23-26, gated by WRITE env).  No PIL exists in
this container, so ``write_png`` is a minimal self-contained PNG encoder
(stdlib zlib, 8-bit RGB/RGBA/gray) — enough for debug output.  The
production sink is ``save_tiles`` -> parquet/snapshot store
(plans.lineage), the Iceberg-append analog.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def write_png(path, block):
    """(B,H,W) uint8 block (B in {1,3,4}) -> PNG file."""
    block = np.asarray(block)
    if block.dtype != np.uint8:
        block = np.clip(np.nan_to_num(block.astype(np.float64)), 0, 255).astype(np.uint8)
    b, h, w = block.shape
    color_type = {1: 0, 3: 2, 4: 6}[b]
    raw = np.transpose(block, (1, 2, 0))  # H, W, B
    scanlines = b"".join(b"\x00" + raw[r].tobytes() for r in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(scanlines, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
    return path


def write_ppm(path, block):
    """(3,H,W) uint8 -> binary PPM (no deps at all)."""
    block = np.asarray(block, dtype=np.uint8)
    _, h, w = block.shape
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(np.transpose(block, (1, 2, 0)).tobytes())
    return path


def save_tiles_png(tiles_df, out_dir, limit=64):
    """Debug sink: collect up to `limit` tile rows and write z/x/y.png.
    Driver-side by design (small debug sets only) — the production path
    is plans.lineage.CheckpointStore.commit_tiles."""
    os.makedirs(out_dir, exist_ok=True)
    rows = tiles_df.limit(limit).collect()
    paths = []
    for r in rows:
        block = np.frombuffer(r["data"], dtype=r["dtype"]).reshape(
            r["bands"], r["height"], r["width"])
        if block.shape[0] not in (1, 3, 4):
            block = block[:3] if block.shape[0] > 4 else block[:1]
        p = os.path.join(out_dir, f"{r['z']}_{r['x']}_{r['y']}.png")
        write_png(p, block)
        paths.append(p)
    return paths


def read_window(chunks_df, bbox_4326):
    """Windowed scan (S2, readBoundingBox test.js:172-196): prune the
    chunk table to chunks overlapping a lon/lat bbox.  The predicate is a
    plain column comparison on the bbox_4326 array, so Catalyst pushes
    min/max pruning into the scan when the table is stored with bbox
    component columns (at Iceberg scale: partition by cover cell)."""
    from pyspark.sql import functions as F

    w, s, e, n = (float(v) for v in bbox_4326)
    return chunks_df.filter(
        (F.col("bbox_4326")[0] <= e) & (F.col("bbox_4326")[2] >= w)
        & (F.col("bbox_4326")[1] <= n) & (F.col("bbox_4326")[3] >= s)
    )
