"""Distributed warp: raster chunks x tile pyramid -> warped tile rows.

This is the Spark lift of the reference's per-tile usage pattern
(test.js:172-196: XYZ tile -> tileToBBOX -> windowed GeoTIFF read ->
geowarp(...)): the windowed read becomes a cell-binned equi-join between
the tile table and the raster-chunk table, and the warp call becomes a
numpy kernel inside ``applyInPandas`` over tile groups.

Scale design (north rule):
- the tile<->chunk assignment is an EQUI-join on cell ids (both sides
  explode the cells their bbox covers), so Catalyst shuffles on a key —
  no O(tiles x chunks) theta join;
- small chunk tables are broadcast instead (``join_strategy='broadcast'``,
  the J3/J4 broadcast-join path, geowarp tests' single-source case);
- each tile group stitches its matched chunk windows into one source
  array (chunks are grid-aligned sub-windows of the same raster, with
  halo duplication at ingest so box-stat windows never cross owners) and
  runs the numpy kernel once — all pixel math vectorized, no per-row
  Python.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..grid.tiles import latlng_to_cell, tile_to_bbox_3857, tile_to_bbox_4326
from ..kernels.affine import Geotransform
from ..kernels.bbox import boolean_intersects, reproject_bbox
from ..kernels.proj import transformer
from ..kernels.warp import warp

CHUNK_SCHEMA = StructType([
    StructField("raster_id", StringType()),
    StructField("srs", IntegerType()),
    StructField("geotransform", ArrayType(DoubleType())),  # full-raster gt
    StructField("row_off", IntegerType()),
    StructField("col_off", IntegerType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("bands", IntegerType()),
    StructField("dtype", StringType()),
    StructField("no_data", DoubleType()),
    StructField("bbox_4326", ArrayType(DoubleType())),
    StructField("data", BinaryType()),
])

TILE_OUT_SCHEMA = StructType([
    StructField("raster_id", StringType()),
    StructField("z", IntegerType()),
    StructField("x", LongType()),
    StructField("y", LongType()),
    StructField("method", StringType()),
    StructField("bands", IntegerType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("dtype", StringType()),
    StructField("data", BinaryType()),
    StructField("n_chunks", IntegerType()),
    StructField("valid_px", LongType()),
])


def fixture_chunk_records(fixture, chunk=256, halo=8):
    """Fixture dict -> list of chunk record dicts (CHUNK_SCHEMA fields,
    data as raw bytes).  Halo rows/cols are duplicated at ingest (SURVEY
    §7 hard-part 2) so any window reaching <= halo px past a chunk edge
    sees true values."""
    from ..sources.fixtures import chunk_fixture

    rows = []
    full_gt = fixture["geotransform"] or Geotransform.from_bbox(
        fixture["bbox"], fixture["width"], fixture["height"]
    ).gt
    inv = transformer(fixture["srs"], 4326)
    for ch in chunk_fixture(fixture, chunk=chunk, halo=halo):
        bb = ch["bbox"]
        bb4326 = reproject_bbox(bb, inv.transform, density=8, nan_strategy="skip")
        g = Geotransform(full_gt)
        # recover the halo-adjusted offsets from the chunk geotransform
        c0, r0 = g.inverse(ch["geotransform"][0], ch["geotransform"][3])
        rows.append({
            "raster_id": ch["raster_id"],
            "srs": int(ch["srs"]),
            "geotransform": [float(v) for v in full_gt],
            "row_off": int(round(float(r0))),
            "col_off": int(round(float(c0))),
            "height": ch["height"],
            "width": ch["width"],
            "bands": ch["bands"],
            "dtype": ch["dtype"],
            "no_data": None if ch["no_data"] is None else float(ch["no_data"]),
            "bbox_4326": [float(v) for v in bb4326],
            "data": ch["data"].tobytes(),
        })
    return rows


def chunks_to_df(spark: SparkSession, fixture, chunk=256, halo=8) -> DataFrame:
    """Fixture dict -> chunk DataFrame (CHUNK_SCHEMA)."""
    rows = fixture_chunk_records(fixture, chunk=chunk, halo=halo)
    return spark.createDataFrame(pd.DataFrame(rows), schema=CHUNK_SCHEMA)


def tiles_df(spark: SparkSession, zooms, bbox_4326=None) -> DataFrame:
    """Tile pyramid table (FIXTURES.md §3), generated DISTRIBUTED: the
    (x, y) grid per zoom comes from spark.range cross products and the
    bboxes from JVM math expressions (tilebelt formulas: linear in 3857,
    inverse-gudermannian for 4326 lat edges).  No driver-side loop — at
    z=15 the table is a billion rows and must never materialize on the
    driver."""
    from ..kernels.proj import WEB_MERCATOR_EXTENT

    E = WEB_MERCATOR_EXTENT
    per_zoom = []
    for z in zooms:
        n = 1 << z
        if bbox_4326 is None:
            x0, x1, y0, y1 = 0, n - 1, 0, n - 1
        else:
            from ..grid.tiles import point_to_tile

            w, s, e, nn = bbox_4326
            xa, ya = point_to_tile(np.array([w]), np.array([nn]), z)
            xb, yb = point_to_tile(np.array([e]), np.array([s]), z)
            x0, x1, y0, y1 = int(xa[0]), int(xb[0]), int(ya[0]), int(yb[0])
        nx = x1 - x0 + 1
        ny = y1 - y0 + 1
        t = (
            spark.range(nx * ny)
            .select(
                F.lit(z).cast("int").alias("z"),
                (F.lit(x0) + (F.col("id") / ny).cast("long")).alias("x"),
                (F.lit(y0) + F.col("id") % ny).alias("y"),
            )
        )
        size = 2.0 * E / n
        xmin = F.lit(-E) + F.col("x") * F.lit(size)
        ymax = F.lit(E) - F.col("y") * F.lit(size)
        lat_n = F.degrees(F.atan(F.sinh(F.lit(np.pi) * (1 - 2 * F.col("y") / F.lit(n)))))
        lat_s = F.degrees(F.atan(F.sinh(F.lit(np.pi) * (1 - 2 * (F.col("y") + 1) / F.lit(n)))))
        lon_w = F.col("x") / F.lit(n) * 360.0 - 180.0
        lon_e = (F.col("x") + 1) / F.lit(n) * 360.0 - 180.0
        t = t.select(
            "z", "x", "y",
            F.array(xmin, ymax - F.lit(size), xmin + F.lit(size), ymax).alias("bbox_3857"),
            F.array(lon_w, lat_s, lon_e, lat_n).alias("bbox_4326"),
        )
        per_zoom.append(t)
    out = per_zoom[0]
    for t in per_zoom[1:]:
        out = out.unionByName(t)
    return out


def _cover_cells_sql(bbox_col, z):
    """Cells (equirect z-grid) covered by a lon/lat bbox, as a Spark SQL
    array expression — JVM-side, no UDF."""
    n = 1 << z
    zp = z << 58
    x0 = f"CAST(least(greatest(floor(({bbox_col}[0] + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)"
    x1 = f"CAST(least(greatest(floor(({bbox_col}[2] + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)"
    y0 = f"CAST(least(greatest(floor((90.0 - {bbox_col}[3]) / 180.0 * {n}), 0), {n - 1}) AS BIGINT)"
    y1 = f"CAST(least(greatest(floor((90.0 - {bbox_col}[1]) / 180.0 * {n}), 0), {n - 1}) AS BIGINT)"
    return (
        f"flatten(transform(sequence({x0}, {x1}), cx -> "
        f"transform(sequence({y0}, {y1}), cy -> {zp}L + cx * {1 << 29}L + cy)))"
    )


def warp_tiles(tiles: DataFrame, chunks: DataFrame, *, method="near",
               out_size=256, out_srs=3857, join_strategy="cells",
               bin_z=6, out_dtype=None, turbo=False, **warp_kwargs) -> DataFrame:
    """tiles x chunks -> warped tile rows (TILE_OUT_SCHEMA).

    join_strategy:
      'cells'     — explode cover cells on both sides, equi-join (scales:
                    shuffle on cell id; AQE handles skewed cells)
      'broadcast' — broadcast the chunk table, overlap predicate
                    (single-raster / small-source case)
    """
    tile_key = "bbox_4326"
    if join_strategy == "cells":
        t = tiles.withColumn("cell", F.explode(F.expr(_cover_cells_sql(tile_key, bin_z))))
        c = chunks.withColumnRenamed("bbox_4326", "chunk_bbox_4326").withColumn(
            "cell", F.explode(F.expr(_cover_cells_sql("chunk_bbox_4326", bin_z)))
        )
        # duplicates (chunk matched through several cover cells) are
        # deduped inside the group kernel — avoids a second shuffle here
        joined = t.join(c, "cell").drop("cell")
    else:
        cond = (
            (F.col("t.bbox_4326")[0] <= F.col("c.bbox_4326")[2])
            & (F.col("t.bbox_4326")[2] >= F.col("c.bbox_4326")[0])
            & (F.col("t.bbox_4326")[1] <= F.col("c.bbox_4326")[3])
            & (F.col("t.bbox_4326")[3] >= F.col("c.bbox_4326")[1])
        )
        joined = tiles.alias("t").join(
            F.broadcast(chunks.alias("c")), cond
        ).select("t.*", *[F.col(f"c.{f.name}").alias(f.name) for f in CHUNK_SCHEMA
                          if f.name != "bbox_4326"],
                 F.col("c.bbox_4326").alias("chunk_bbox_4326"))

    method_name = method if isinstance(method, str) else "custom"

    def warp_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop_duplicates(subset=["row_off", "col_off"])
        first = pdf.iloc[0]
        recs = pdf.to_dict("records")
        row = _stitch_and_warp(
            recs, int(first["z"]), int(first["x"]), int(first["y"]),
            method, method_name, out_size, out_srs, out_dtype, turbo, warp_kwargs,
        )
        return pd.DataFrame([row])

    return joined.groupBy("raster_id", "z", "x", "y").applyInPandas(
        warp_group, schema=TILE_OUT_SCHEMA
    )


def _stitch_and_warp(recs, z, x, y, method, method_name, out_size, out_srs,
                     out_dtype, turbo, warp_kwargs):
    """Stitch matched chunk records into one grid-aligned source window
    and run the numpy kernel once (shared by the join and broadcast
    execution paths — bit-identical by construction)."""
    first = recs[0]
    srs = int(first["srs"])
    full_gt = list(first["geotransform"])
    g = Geotransform(full_gt)
    bands = int(first["bands"])
    dt = np.dtype(first["dtype"])
    r0 = min(int(r["row_off"]) for r in recs)
    c0 = min(int(r["col_off"]) for r in recs)
    r1 = max(int(r["row_off"]) + int(r["height"]) for r in recs)
    c1 = max(int(r["col_off"]) + int(r["width"]) for r in recs)
    mosaic = np.full((bands, r1 - r0, c1 - c0), np.nan)
    for rec in recs:
        block = np.frombuffer(rec["data"], dtype=dt).reshape(
            bands, int(rec["height"]), int(rec["width"])
        )
        rr = int(rec["row_off"]) - r0
        cc = int(rec["col_off"]) - c0
        mosaic[:, rr : rr + block.shape[1], cc : cc + block.shape[2]] = block

    sub_x0, sub_y0 = g.forward(float(c0), float(r0))
    sub_gt = [float(sub_x0), full_gt[1], full_gt[2], float(sub_y0), full_gt[4], full_gt[5]]
    cs = np.array([0.0, c1 - c0, 0.0, c1 - c0])
    rs = np.array([0.0, 0.0, r1 - r0, r1 - r0])
    gx, gy = Geotransform(sub_gt).forward(cs, rs)
    in_bbox = [gx.min(), gy.min(), gx.max(), gy.max()]

    out_bbox = tile_to_bbox_3857(x, y, z) if out_srs == 3857 else tile_to_bbox_4326(x, y, z)
    no_data = first["no_data"]
    res = warp(
        in_data=mosaic,
        in_bbox=in_bbox,
        in_geotransform=sub_gt,
        in_srs=srs,
        in_height=r1 - r0,
        in_width=c1 - c0,
        in_no_data=None if no_data is None or pd.isna(no_data) else float(no_data),
        out_bbox=out_bbox,
        out_srs=out_srs,
        out_width=out_size,
        out_height=out_size,
        method=method,
        out_dtype=out_dtype or str(dt),
        turbo=turbo,
        **warp_kwargs,
    )
    block = res["block"]
    return {
        "raster_id": first["raster_id"],
        "z": z, "x": x, "y": y,
        "method": method_name,
        "bands": int(block.shape[0]),
        "height": int(block.shape[1]),
        "width": int(block.shape[2]),
        "dtype": str(block.dtype),
        "data": block.tobytes(),
        "n_chunks": int(len(recs)),
        "valid_px": int(np.isfinite(block.astype(np.float64)).sum()),
    }


def warp_tiles_broadcast(tiles: DataFrame, chunk_records, *, method="near",
                         out_size=256, out_srs=3857, out_dtype=None,
                         turbo=False, **warp_kwargs) -> DataFrame:
    """Broadcast execution path: ship the (small) chunk set to every
    executor ONCE and mapInPandas over the tile table — zero shuffle of
    pixel payloads.  The cell equi-join path duplicates each matched
    chunk's payload per tile through the groupBy exchange (measured as
    the dominant cost: ~4 GB of Arrow traffic for a 1 MB source at z11);
    when the source fits in a broadcast this plan is strictly better.
    ``chunk_records``: list of dicts with CHUNK_SCHEMA fields (data=bytes).
    """
    spark = tiles.sparkSession
    bc = spark.sparkContext.broadcast(chunk_records)
    method_name = method if isinstance(method, str) else "custom"

    def gen(batches):
        recs = bc.value
        boxes = np.array([r["bbox_4326"] for r in recs], dtype=np.float64)
        for pdf in batches:
            rows = []
            for z, x, y, tb in zip(pdf["z"], pdf["x"], pdf["y"], pdf["bbox_4326"]):
                tb = np.asarray(tb, dtype=np.float64)
                hit = (
                    (boxes[:, 0] <= tb[2]) & (boxes[:, 2] >= tb[0])
                    & (boxes[:, 1] <= tb[3]) & (boxes[:, 3] >= tb[1])
                )
                idx = np.flatnonzero(hit)
                if idx.size == 0:
                    continue
                rows.append(_stitch_and_warp(
                    [recs[i] for i in idx], int(z), int(x), int(y),
                    method, method_name, out_size, out_srs, out_dtype,
                    turbo, warp_kwargs,
                ))
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(gen, schema=TILE_OUT_SCHEMA)


def warp_fixture_to_tiles(spark, fixture, zooms, method="near", out_size=256,
                          chunk=256, halo=8, join_strategy="cells", **kw) -> DataFrame:
    """Convenience: fixture -> chunks -> covering tiles -> warp.

    join_strategy 'broadcast_map' takes the zero-payload-shuffle path
    (source broadcast to executors, mapInPandas over tiles) — the right
    plan whenever the source raster fits in a broadcast."""
    inv = transformer(fixture["srs"], 4326)
    bb4326 = reproject_bbox(fixture["bbox"], inv.transform, density=16, nan_strategy="skip")
    tiles = tiles_df(spark, zooms, bbox_4326=bb4326)
    if join_strategy == "broadcast_map":
        recs = fixture_chunk_records(fixture, chunk=chunk, halo=halo)
        return warp_tiles_broadcast(tiles, recs, method=method,
                                    out_size=out_size, **kw)
    chunks = chunks_to_df(spark, fixture, chunk=chunk, halo=halo)
    return warp_tiles(tiles, chunks, method=method, out_size=out_size,
                      join_strategy=join_strategy, **kw)
