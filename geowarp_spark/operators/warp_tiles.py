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
    StructField("raster_height", IntegerType()),  # full-raster dims: edge
    StructField("raster_width", IntegerType()),   # chunks own the outside
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
            "raster_height": int(fixture["height"]),
            "raster_width": int(fixture["width"]),
            "data": ch["data"].tobytes(),
        })
    return rows


def chunks_to_df(spark: SparkSession, fixture, chunk=256, halo=8) -> DataFrame:
    """Fixture dict -> chunk DataFrame (CHUNK_SCHEMA)."""
    rows = fixture_chunk_records(fixture, chunk=chunk, halo=halo)
    return spark.createDataFrame(pd.DataFrame(rows), schema=CHUNK_SCHEMA)


PIECE_SCHEMA = StructType([
    StructField("vkr", IntegerType()),   # virtual chunk lattice index
    StructField("vkc", IntegerType()),
    StructField("raster_id", StringType()),
    StructField("pr0", IntegerType()),   # piece offset in VIRTUAL raster coords
    StructField("pc0", IntegerType()),
    StructField("ph", IntegerType()),
    StructField("pw", IntegerType()),
    StructField("dtype", StringType()),
    StructField("no_data", DoubleType()),
    StructField("data", BinaryType()),
])


def _mosaic_lattice(meta, chunk, halo, hole_no_data):
    """Geometry of the virtual mosaic lattice, shared by mosaic_chunks
    (the composite) and mosaic_meta_df (the analytic pair-discovery
    metadata) so the two can never drift: validates the per-raster
    metadata and returns the lattice parameters."""
    if len({m["srs"] for m in meta}) != 1 \
            or len({m["bands"] for m in meta}) != 1 \
            or len({m["dtype"] for m in meta}) != 1:
        raise ValueError(
            "mosaic_chunks requires uniform srs/bands/dtype across rasters; "
            f"got srs={sorted({m['srs'] for m in meta})} "
            f"bands={sorted({m['bands'] for m in meta})} "
            f"dtypes={sorted({m['dtype'] for m in meta})}")
    srs = int(meta[0]["srs"])
    bands = int(meta[0]["bands"])
    dt = np.dtype(meta[0]["dtype"])
    gt0 = [float(v) for v in meta[0]["geotransform"]]
    g0 = Geotransform(gt0)
    offs = {}
    for m in meta:
        gt = [float(v) for v in m["geotransform"]]
        for i in (1, 2, 4, 5):
            if abs(gt[i] - gt0[i]) > 1e-9 * max(1.0, abs(gt0[i])):
                raise ValueError(
                    "mosaic_chunks requires a shared grid: raster "
                    f"{m['raster_id']!r} geotransform linear part {gt} "
                    f"differs from {gt0}")
        c, r = g0.inverse(gt[0], gt[3])
        if abs(c - round(c)) > 1e-6 or abs(r - round(r)) > 1e-6:
            raise ValueError(
                f"mosaic_chunks: raster {m['raster_id']!r} origin is not an "
                f"integer pixel offset from the shared grid ({c}, {r})")
        offs[m["raster_id"]] = (int(round(r)), int(round(c)))
    r_min = min(v[0] for v in offs.values())
    c_min = min(v[1] for v in offs.values())
    doffs = {k: (v[0] - r_min, v[1] - c_min) for k, v in offs.items()}
    vh = max(doffs[m["raster_id"]][0] + int(m["raster_height"]) for m in meta)
    vw = max(doffs[m["raster_id"]][1] + int(m["raster_width"]) for m in meta)
    vx0, vy0 = g0.forward(float(c_min), float(r_min))
    vgt = [float(vx0), gt0[1], gt0[2], float(vy0), gt0[4], gt0[5]]

    nds = {m["raster_id"]:
           None if m["no_data"] is None or pd.isna(m["no_data"])
           else float(m["no_data"]) for m in meta}
    nd_set = set(nds.values())
    if len(nd_set) == 1 and None not in nd_set:
        hole_fill = out_nd = nd_set.pop()          # common sentinel
    elif np.issubdtype(dt, np.floating):
        hole_fill, out_nd = np.nan, None           # NaN is the sentinel
    elif hole_no_data is not None:
        hole_fill = out_nd = float(hole_no_data)
    else:
        raise ValueError(
            "mosaic_chunks: integer rasters without a common no_data "
            "sentinel need hole_no_data= to fill uncovered pixels")

    return {"srs": srs, "bands": bands, "dt": dt, "doffs": doffs,
            "vh": vh, "vw": vw, "vgt": vgt,
            "hole_fill": hole_fill, "out_nd": out_nd,
            "nkr": (vh + chunk - 1) // chunk,
            "nkc": (vw + chunk - 1) // chunk}


def mosaic_meta_df(spark: SparkSession, meta, *, chunk=256, halo=8,
                   raster_id="mosaic", hole_no_data=None) -> DataFrame:
    """Analytic pair-discovery metadata for a ``mosaic_chunks`` composite
    (r8): one row per virtual-lattice chunk position carrying exactly the
    (raster_id, row_off, col_off, bbox_4326) the composite's rows would
    carry — computed from the lattice geometry alone, WITHOUT executing
    the composite.  Pass as ``warp_tiles_chunks(..., chunks_meta=...)``
    so the composite has exactly ONE consumer (the payload join): the r8
    plan audit found the composite applyInPandas executed twice per
    action (metadata + payload), and checkpoint-based fixes either force
    a build-time job (AQE materializes the piece shuffle when the RDD is
    taken) or cache payload.

    The row set is a SUPERSET of the composite's (positions no piece
    covers emit a meta row but no composite row): superset pairs are
    dropped by the payload inner join, so the matched set — and the
    result — is identical.  Driver-side enumeration of nkr x nkc
    positions: use when the lattice is driver-small (the composite of a
    bench fixture, a few thousand chunks); at corpus scale derive the
    metadata distributed or let the operator read it from the composite.
    """
    lat = _mosaic_lattice(meta, chunk, halo, hole_no_data)
    vh, vw, vgt = lat["vh"], lat["vw"], lat["vgt"]
    inv4326 = transformer(lat["srs"], 4326)
    vgtG = Geotransform(vgt)
    rows = []
    for kr in range(lat["nkr"]):
        wr0 = max(0, kr * chunk - halo)
        wr1 = min(vh, (kr + 1) * chunk + halo)
        for kc in range(lat["nkc"]):
            wc0 = max(0, kc * chunk - halo)
            wc1 = min(vw, (kc + 1) * chunk + halo)
            # identical corner/bbox math to mosaic_chunks' composite()
            cs = np.array([wc0, wc1, wc0, wc1], dtype=np.float64)
            rs = np.array([wr0, wr0, wr1, wr1], dtype=np.float64)
            xs, ys = vgtG.forward(cs, rs)
            bb = [float(xs.min()), float(ys.min()),
                  float(xs.max()), float(ys.max())]
            bb4326 = reproject_bbox(bb, inv4326.transform, density=8,
                                    nan_strategy="skip")
            rows.append({"raster_id": raster_id, "row_off": wr0,
                         "col_off": wc0,
                         "bbox_4326": [float(v) for v in bb4326]})
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="raster_id string, row_off int, col_off int, "
               "bbox_4326 array<double>")


def mosaic_chunks(chunks: DataFrame, *, chunk=256, halo=8,
                  raster_id="mosaic", hole_no_data=None, meta=None,
                  persist=False) -> DataFrame:
    """Distributed pixel-level composite of grid-aligned rasters onto one
    virtual raster lattice -> a standard single-raster chunk table.

    ``warp_tiles(..., mosaic=True)`` resolves cross-raster precedence on
    OUT pixels, which is exact for uniform-support methods (near,
    vectorize) but lets box/bilinear windows straddling a raster seam
    gather from one raster only (the r5 documented deviation).  This
    operator composites FIRST, on the shared source grid — the GDAL
    mosaic rule: valid pixels win over fill, ties go to the highest
    raster_id (pieces applied in ascending raster_id order) — so the
    downstream chunks plan sees ONE raster and every resampling method
    treats source seams exactly like chunk seams (halos are rebuilt on
    the virtual lattice).  mosaic-of-halves == whole-raster is bit-exact
    for near, bilinear AND median (test_warp_mosaic_composite_all_methods);
    reference seam semantics: bilinear edge tree geowarp.js:793-833, box
    windows geowarp.js:893-950.

    Requirements (asserted from per-raster metadata — #rasters rows, no
    pixel data on the driver): all rasters share srs, bands, dtype, and
    the linear part of the geotransform, with origins an integer number
    of pixels apart.  Holes (virtual-extent pixels no raster covers, and
    every raster's own nodata pixels) need a representable fill: the
    rasters' common no_data sentinel if they have one, else NaN for
    float dtypes, else ``hole_no_data`` (required for integer dtypes
    without a common sentinel).  Virtual chunks nothing covers emit no
    row — tiles over pure holes warp from no chunks, same as outside the
    extent.

    Scale: piece emission is a narrow mapInPandas (each input chunk
    crops to the few virtual chunks its haloed windows intersect); the
    composite groupBy is the plan's one payload shuffle, proportional to
    mosaic area like any regrid, with explicit width (the same AQE
    small-partial coalescing gotcha as the merge stage).  Precedence
    needs no global sort — each virtual chunk orders its own pieces.

    ``meta`` (r8): optional pre-known per-raster metadata — a list of
    dicts/Rows with keys (raster_id, srs, geotransform, bands, dtype,
    no_data, raster_height, raster_width), one per raster.  Callers that
    BUILT the chunk table (and therefore already hold the metadata) pass
    it to skip the driver-side distinct().collect() job the operator
    otherwise runs at plan-construction time (~0.2 s per call at bench
    scale; at 100 TB it is a full metadata scan of the chunk table).
    Values must match what the collect would return — the same
    validation runs either way.

    ``persist`` (r8): lazily localCheckpoint the composite so one action
    computes it ONCE even when consumed twice.  Downstream chunk-anchored
    warps consume the composite twice per action (pair-discovery metadata
    + the payload join) unless given ``chunks_meta``, and Catalyst only
    dedupes the piece exchange underneath — the composite applyInPandas
    itself ran twice (r8 plan audit).  Caveats: the checkpoint caches to
    executor-local memory/disk (lost executors replay nothing), and
    taking the RDD forces AQE to materialize the piece shuffle at
    CONSTRUCTION time — a build-side job even if the caller never runs
    the composite.  Default OFF: the preferred shape is passing
    ``warp_tiles_chunks(..., chunks_meta=mosaic_meta_df(...))`` so the
    composite has exactly one consumer and stays fully lazy.
    """
    spark = chunks.sparkSession
    if meta is None:
        meta = chunks.select(
            "raster_id", "srs", "geotransform", "bands", "dtype", "no_data",
            "raster_height", "raster_width").distinct().collect()
    lat = _mosaic_lattice(meta, chunk, halo, hole_no_data)
    srs, bands, dt = lat["srs"], lat["bands"], lat["dt"]
    doffs, vh, vw, vgt = lat["doffs"], lat["vh"], lat["vw"], lat["vgt"]
    hole_fill, out_nd = lat["hole_fill"], lat["out_nd"]
    nkr, nkc = lat["nkr"], lat["nkc"]
    doffs_b = spark.sparkContext.broadcast(doffs)

    def gen_pieces(batches):
        dd = doffs_b.value
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                dr, dc = dd[rec["raster_id"]]
                arr = np.frombuffer(
                    rec["data"], dtype=np.dtype(rec["dtype"])).reshape(
                    int(rec["bands"]), int(rec["height"]), int(rec["width"]))
                vr0 = int(rec["row_off"]) + dr
                vc0 = int(rec["col_off"]) + dc
                vr1, vc1 = vr0 + arr.shape[1], vc0 + arr.shape[2]
                for kr in range(max(0, (vr0 - halo) // chunk),
                                min(nkr, (vr1 + halo + chunk - 1) // chunk)):
                    wr0 = max(0, kr * chunk - halo)
                    wr1 = min(vh, (kr + 1) * chunk + halo)
                    ir0, ir1 = max(wr0, vr0), min(wr1, vr1)
                    if ir0 >= ir1:
                        continue
                    for kc in range(max(0, (vc0 - halo) // chunk),
                                    min(nkc, (vc1 + halo + chunk - 1) // chunk)):
                        wc0 = max(0, kc * chunk - halo)
                        wc1 = min(vw, (kc + 1) * chunk + halo)
                        ic0, ic1 = max(wc0, vc0), min(wc1, vc1)
                        if ic0 >= ic1:
                            continue
                        piece = np.ascontiguousarray(
                            arr[:, ir0 - vr0:ir1 - vr0, ic0 - vc0:ic1 - vc0])
                        rows.append({
                            "vkr": kr, "vkc": kc,
                            "raster_id": rec["raster_id"],
                            "pr0": ir0, "pc0": ic0,
                            "ph": ir1 - ir0, "pw": ic1 - ic0,
                            "dtype": rec["dtype"],
                            "no_data": rec["no_data"],
                            "data": piece.tobytes(),
                        })
            if rows:
                yield pd.DataFrame(rows)

    inv4326 = transformer(srs, 4326)
    vgtG = Geotransform(vgt)

    def composite(pdf: pd.DataFrame) -> pd.DataFrame:
        kr, kc = int(pdf["vkr"].iloc[0]), int(pdf["vkc"].iloc[0])
        wr0 = max(0, kr * chunk - halo)
        wr1 = min(vh, (kr + 1) * chunk + halo)
        wc0 = max(0, kc * chunk - halo)
        wc1 = min(vw, (kc + 1) * chunk + halo)
        canvas = np.full((bands, wr1 - wr0, wc1 - wc0), np.nan)
        # ascending raster_id: later pieces (higher id) overwrite where
        # valid; within one raster overlapping halo pieces are identical
        # pixels, so tie order is value-neutral (sorted for determinism)
        pdf = pdf.sort_values(["raster_id", "pr0", "pc0"], kind="mergesort")
        for p in pdf.itertuples(index=False):
            block = np.frombuffer(p.data, dtype=np.dtype(p.dtype)).reshape(
                bands, int(p.ph), int(p.pw)).astype(np.float64)
            valid = np.isfinite(block)
            if p.no_data is not None and not pd.isna(p.no_data):
                valid &= block != float(p.no_data)
            view = canvas[:, int(p.pr0) - wr0:int(p.pr0) - wr0 + int(p.ph),
                          int(p.pc0) - wc0:int(p.pc0) - wc0 + int(p.pw)]
            view[...] = np.where(valid, block, view)
        data = np.where(np.isnan(canvas), hole_fill, canvas).astype(dt)
        cs = np.array([wc0, wc1, wc0, wc1], dtype=np.float64)
        rs = np.array([wr0, wr0, wr1, wr1], dtype=np.float64)
        xs, ys = vgtG.forward(cs, rs)
        bb = [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]
        bb4326 = reproject_bbox(bb, inv4326.transform, density=8,
                                nan_strategy="skip")
        return pd.DataFrame([{
            "raster_id": raster_id,
            "srs": srs,
            "geotransform": vgt,
            "row_off": wr0, "col_off": wc0,
            "height": wr1 - wr0, "width": wc1 - wc0,
            "bands": bands,
            "dtype": str(dt),
            "no_data": out_nd,
            "bbox_4326": [float(v) for v in bb4326],
            "raster_height": vh, "raster_width": vw,
            "data": data.tobytes(),
        }])

    n_parts = spark.sparkContext.defaultParallelism
    pieces = chunks.mapInPandas(gen_pieces, schema=PIECE_SCHEMA)
    # explicit-width exchange: composite partials are small per piece, so
    # AQE's advisory target would coalesce the shuffle to a few tasks
    pieces = pieces.repartition(n_parts, "vkr", "vkc")
    out = pieces.groupBy("vkr", "vkc").applyInPandas(
        composite, schema=CHUNK_SCHEMA)
    if persist:
        # lazy (eager=False): no job at construction time; the first
        # action materializes each partition once and both downstream
        # consumers read the cached RDD
        out = out.localCheckpoint(eager=False)
    return out


def tiles_df(spark: SparkSession, zooms, bbox_4326=None,
             rows_per_partition: int | None = None) -> DataFrame:
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
        size = 2.0 * E / n
        # scale-adaptive range width (r8, guide §2): spark.range defaults
        # to defaultParallelism partitions regardless of row count, so a
        # 245-row bench cover ran 64 near-empty tasks per pair-discovery
        # stage while a z15 cover still gets full parallelism.
        # ``rows_per_partition`` is for consumers whose per-ROW cost is
        # trivial (metadata joins: pass ~65536); the default keeps the
        # old full width because the broadcast-warp path computes a FULL
        # TILE WARP per row and needs every core even for small covers.
        if rows_per_partition:
            n_ptns = int(max(1, min(spark.sparkContext.defaultParallelism,
                                    (nx * ny + rows_per_partition - 1)
                                    // rows_per_partition)))
        else:
            n_ptns = spark.sparkContext.defaultParallelism
        # SQL-string expressions instead of Column-object composition
        # (r8): each pyspark Column operation is a py4j round trip, and
        # this function builds ~30 of them per zoom — 0.24 s per call at
        # 2 zooms, paid at every query construction.  The strings parse
        # in ONE round trip per select and produce the IDENTICAL
        # expression tree: double literals use repr() (shortest
        # round-trip form) with the D suffix, operator order is kept,
        # and the output was verified bit-identical to the Column form
        # over full tile tables at z4-z14 (0.056 s per call after).
        nD = f"CAST({n} AS INT)"
        t = (
            spark.range(0, nx * ny, numPartitions=n_ptns)
            .selectExpr(
                f"CAST({z} AS INT) AS z",
                f"{x0} + CAST(id / {ny} AS BIGINT) AS x",
                f"{y0} + id % {ny} AS y")
            .selectExpr(
                "z", "x", "y",
                f"array({-E!r}D + x * {size!r}D, "
                f"({E!r}D - y * {size!r}D) - {size!r}D, "
                f"({-E!r}D + x * {size!r}D) + {size!r}D, "
                f"{E!r}D - y * {size!r}D) AS bbox_3857",
                f"array(x / {nD} * 360.0D - 180.0D, "
                f"degrees(atan(sinh({np.pi!r}D * (1 - 2 * (y + 1) / {nD})))), "
                f"(x + 1) / {nD} * 360.0D - 180.0D, "
                f"degrees(atan(sinh({np.pi!r}D * (1 - 2 * y / {nD}))))) "
                "AS bbox_4326")
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
               out_size=256, out_srs=3857, join_strategy="chunks",
               bin_z=6, out_dtype=None, turbo=False, chunk=256, halo=8,
               chunks_meta: DataFrame | None = None,
               **warp_kwargs) -> DataFrame:
    """tiles x chunks -> warped tile rows (TILE_OUT_SCHEMA).

    join_strategy (default 'chunks' — the plan that is safe at ANY source
    size; at the DataFrame level the chunk-table size isn't knowable
    without an action, so the scale-safe plan is the default and the
    payload-duplicating 'cells' plan is strictly opt-in.  Callers that
    KNOW the source is small should use warp_fixture_to_tiles's 'auto',
    which picks broadcast from the measured fixture size):
      'chunks'    — chunk-anchored two-phase plan: payload crosses one
                    shuffle, partial tiles merge in an output-sized second
                    shuffle (the 100 TB path for non-broadcastable sources)
      'cells'     — explode cover cells on both sides, equi-join; the
                    matched chunk PAYLOADS are duplicated per tile through
                    the groupBy exchange — fine for small sources, WRONG
                    at scale (use 'chunks')
      'broadcast' — broadcast the chunk table, overlap predicate
                    (single-raster / small-source case)
    """
    if join_strategy == "chunks":
        return warp_tiles_chunks(
            tiles, chunks, method=method, out_size=out_size, out_srs=out_srs,
            bin_z=bin_z, out_dtype=out_dtype, turbo=turbo, chunk=chunk,
            halo=halo, chunks_meta=chunks_meta, **warp_kwargs)
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
    # an explicit in_no_data kwarg (e.g. a reference-parity config)
    # overrides the chunk table's per-raster sentinel
    warp_kwargs = dict(warp_kwargs)
    in_no_data = warp_kwargs.pop(
        "in_no_data",
        None if no_data is None or pd.isna(no_data) else float(no_data))
    res = warp(
        in_data=mosaic,
        in_bbox=in_bbox,
        in_geotransform=sub_gt,
        in_srs=srs,
        in_height=r1 - r0,
        in_width=c1 - c0,
        in_no_data=in_no_data,
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


PARTIAL_SCHEMA = StructType([
    StructField("raster_id", StringType()),
    StructField("z", IntegerType()),
    StructField("x", LongType()),
    StructField("y", LongType()),
    StructField("bands", IntegerType()),
    StructField("dtype", StringType()),      # payload dtype of `data`
    StructField("tgt_dtype", StringType()),  # dtype the merged tile materializes to
    StructField("r0", IntegerType()),   # owned-rect offset within the tile
    StructField("c0", IntegerType()),
    StructField("rh", IntegerType()),   # owned-rect height / width
    StructField("rw", IntegerType()),
    StructField("data", BinaryType()),  # cropped (B, rh, rw) payload
    StructField("mask", BinaryType()),  # packbits of the (rh, rw) owned mask
])


def warp_tiles_chunks(tiles: DataFrame, chunks: DataFrame, *, method="near",
                      out_size=256, out_srs=3857, bin_z=6, out_dtype=None,
                      turbo=False, chunk=256, halo=8, out_no_data=None,
                      mosaic=False, chunks_meta: DataFrame | None = None,
                      **warp_kwargs) -> DataFrame:
    """Chunk-anchored warp plan for sources too large to broadcast
    (VERDICT r1 'What's wrong' #3): the pixel payload crosses exactly ONE
    exchange, instead of being duplicated per matched tile.

    Plan:
      1. payload-free pair discovery — tile METADATA x chunk METADATA via
         the cover-cell equi-join + exact bbox-overlap filter (the same
         matched set as the broadcast plans);
      2. the tile keys are grouped per chunk (collect_list of (z,x,y) —
         a few bytes per tile) and joined back to the full chunk rows:
         this is the single shuffle the payload crosses;
      3. each chunk warps each matched tile FROM ITS OWN WINDOW ONLY and
         emits the owned sub-rectangle: the out pixels whose
         inverse-projected source centers land in the chunk's halo-free
         core.  Cores partition the raster, so every out pixel has at
         most one owner; halo rows duplicated at ingest guarantee the
         owner's window sees every sample a gather needs (requires the
         resampling footprint <= halo, which holds for near/bilinear
         always and for box-stats when in-pixels-per-out-sample <= halo);
      4. a second, OUTPUT-sized shuffle merges owned rects per tile
         (cropping keeps this exchange proportional to the pyramid size,
         not tiles x chunks).

    cutline / row_start / row_end compose freely: they mask out pixels in
    OUT space, deterministically per tile, so every chunk's partial holds
    the same fill there and ownership is unaffected.  out_resolution
    changes the grid ownership runs on: samples are computed on the
    scaled (hs, ws) grid and replicated to out_size (geowarp.js:506-521),
    so a replicated block must have ONE owner — ownership is derived at
    the SAMPLE centers and expanded with the same rounded edge maps
    _materialize uses (see _chunk_partials).

    ``mosaic=True``: merge partials from ALL rasters into ONE tile per
    (z, x, y) — the multi-source form (a corpus of GeoTIFFs -> one
    pyramid) the reference's single-raster API cannot express.  Each
    raster's chunk cores partition only that raster, so out pixels
    covered by several rasters get one owned partial PER raster;
    overlaps resolve deterministically by ascending raster_id (later id
    wins — a fixed, engine-independent precedence).  Where sources
    don't overlap and tile seams need no cross-source resampling
    support (always true for 'near'), the mosaic of raster PIECES is
    bit-identical to warping the undivided raster
    (test_warp_mosaic_of_halves_equals_whole).

    Proven bit-identical to the mosaic plans by
    test_warp_tiles_all_strategies_identical and
    test_warp_chunks_cutline_resolution_rowrange."""
    # ``chunks_meta`` (r8): an alternative source for the pair-discovery
    # columns, e.g. mosaic_meta_df's analytic lattice rows.  Must hold a
    # SUPERSET of the chunk table's (raster_id, row_off, col_off) keys
    # with the same bbox_4326 values — superset pairs drop out of the
    # payload inner join below, so results are identical, and the chunk
    # table itself gains a single consumer (one execution per action
    # even for computed chunk sources like mosaic_chunks composites).
    # Discovery is built as batched selectExpr/expr strings (r8): the
    # Column-by-Column form cost ~10 py4j round trips per plan, and the
    # frozen bench constructs these plans per mode per trial.
    t = tiles.selectExpr(
        "z", "x", "y", "bbox_4326",
        f"explode({_cover_cells_sql('bbox_4326', bin_z)}) AS cell")
    c = (chunks_meta if chunks_meta is not None else chunks).selectExpr(
        "raster_id", "row_off", "col_off",
        "bbox_4326 AS chunk_bbox_4326",
        f"explode({_cover_cells_sql('bbox_4326', bin_z)}) AS cell")
    overlap = F.expr(
        "bbox_4326[0] <= chunk_bbox_4326[2] AND "
        "bbox_4326[2] >= chunk_bbox_4326[0] AND "
        "bbox_4326[1] <= chunk_bbox_4326[3] AND "
        "bbox_4326[3] >= chunk_bbox_4326[1]")
    pairs = (
        t.join(c, "cell").filter(overlap)
        .select("raster_id", "row_off", "col_off", "z", "x", "y")
    )
    # collect_SET dedupes the pairs that shared several cover cells AND
    # groups them in the SAME shuffle — the old distinct() + groupBy +
    # collect_list chain paid two metadata exchanges for one (round-6
    # fixed-cost profile: each extra tiny-stage shuffle costs ~0.2-0.5 s
    # of pure scheduling at 32 cores).  Key-set order is nondeterministic
    # but output-neutral: owned rects are disjoint per tile, and the
    # mosaic merge sorts explicitly.
    #
    # EXPLICIT fixed-width exchange for the METADATA side (r8: the r6
    # round-robin repartition AFTER the aggregate paid a second exchange;
    # a hash repartition on the GROUP KEYS placed BEFORE the aggregate
    # satisfies the groupBy's clustered distribution, so the agg runs
    # in-place and one exchange does both jobs).  Rationale unchanged
    # from r6: the tile-key lists are a few KB, so AQE would coalesce
    # their exchange to ~1 partition and the whole per-chunk warp stage
    # would run in ONE task at any core count (measured: 2->8 cores gave
    # 1.04x before the explicit width; the r3 scaling gate catches
    # regressions).  repartition(n, cols) is user-specified — AQE never
    # coalesces it — and it moves only metadata, never pixel payload;
    # when the chunk side is too big to broadcast, the join re-exchanges
    # both sides on the join keys as before (the plan's single payload
    # crossing), so the scale path is unchanged.
    spark = chunks.sparkSession
    # width = CORE count, not spark.sql.shuffle.partitions: the partials
    # and merge stages are python-runner stages whose per-task cost is an
    # Arrow round-trip + numpy batch, so 3x-cores oversharding (the right
    # default for skewed JVM aggs, session.py) only multiplies scheduling
    # and worker round-trips (r3 leg: 96 vs 32 partitions = 122.9 s vs
    # 33.5 s; r6 fixed-cost profile: ~0.5 s on an empty-ish plan).
    n_parts = spark.sparkContext.defaultParallelism
    grouped = pairs.repartition(n_parts, "raster_id", "row_off", "col_off") \
        .groupBy("raster_id", "row_off", "col_off").agg(
            F.collect_set(F.struct("z", "x", "y")).alias("tile_keys"))
    withtiles = chunks.join(grouped, ["raster_id", "row_off", "col_off"])

    method_name = method if isinstance(method, str) else "custom"

    def gen_partials(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                rows.extend(_chunk_partials(
                    rec, method, out_size, out_srs, out_dtype, turbo,
                    chunk, halo, out_no_data, warp_kwargs, mosaic=mosaic))
            if rows:
                yield pd.DataFrame(rows)

    partials = withtiles.mapInPandas(gen_partials, schema=PARTIAL_SCHEMA)

    fill_out = np.nan if out_no_data is None else float(out_no_data)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if mosaic:
            # a mosaic group spans multiple rasters: mixed band counts or
            # target dtypes cannot merge onto one canvas — fail loudly
            # instead of reinterpreting another raster's payload bytes
            if pdf["bands"].nunique() != 1 or pdf["tgt_dtype"].nunique() != 1:
                raise ValueError(
                    "mosaic requires uniform bands/dtype across rasters; got "
                    f"bands={sorted(pdf['bands'].unique().tolist())} "
                    f"dtypes={sorted(pdf['tgt_dtype'].unique().tolist())} "
                    "— pass out_dtype= to cast, or mosaic per-dtype groups")
            # deterministic cross-raster precedence: apply partials in
            # ascending raster_id (ties broken by rect origin), so the
            # highest raster_id wins where sources overlap.  Within one
            # raster owned rects are disjoint, so this only orders the
            # cross-raster case.
            pdf = pdf.sort_values(["raster_id", "r0", "c0"],
                                  kind="mergesort")
        first = pdf.iloc[0]
        bands = int(first["bands"])
        dt = np.dtype(first["tgt_dtype"])
        canvas = np.full((bands, out_size, out_size), fill_out)
        for p in pdf.itertuples(index=False):
            rh, rw = int(p.rh), int(p.rw)
            mask = np.unpackbits(
                np.frombuffer(p.mask, dtype=np.uint8), count=rh * rw
            ).astype(bool).reshape(rh, rw)
            # decode with the partial's OWN payload dtype: in mosaic mode
            # integer targets ship float64 partials so nodata survives to
            # the precedence merge (see _chunk_partials)
            block = np.frombuffer(p.data, dtype=np.dtype(p.dtype)).reshape(
                bands, rh, rw)
            view = canvas[:, int(p.r0):int(p.r0) + rh, int(p.c0):int(p.c0) + rw]
            if mosaic:
                # GDAL mosaic rule: VALID pixels win over fill.  Edge
                # chunks own the outside halfplane of their raster (the
                # box-window edge semantics), so at source seams two
                # rasters both claim boundary pixels — one holding fill,
                # which must never clobber the other's real value.
                # Among valid overlaps, the raster_id sort above decides.
                bm = block[:, mask].astype(np.float64)
                validm = np.isfinite(bm)
                if out_no_data is not None:
                    validm &= bm != fill_out
                view[:, mask] = np.where(validm, bm, view[:, mask])
            else:
                view[:, mask] = block[:, mask].astype(np.float64)
        # same dtype materialization as kernels.warp._materialize
        data = canvas
        if np.issubdtype(dt, np.integer):
            data = np.nan_to_num(data, nan=0.0, posinf=0.0, neginf=0.0)
        data = data.astype(dt)
        return pd.DataFrame([{
            "raster_id": "mosaic" if mosaic else first["raster_id"],
            "z": int(first["z"]), "x": int(first["x"]), "y": int(first["y"]),
            "method": method_name,
            "bands": bands,
            "height": out_size, "width": out_size,
            "dtype": str(dt),
            "data": data.tobytes(),
            "n_chunks": int(len(pdf)),
            "valid_px": int(np.isfinite(data.astype(np.float64)).sum()),
        }])

    # explicit-width exchange for the merge: partial rects are ~64 KB
    # each, so AQE's 64 MB advisory target coalesces the merge shuffle
    # to a handful of tasks regardless of cores (measured: the merge ran
    # 3-way at local[8]).  repartition(n, cols) is user-specified — AQE
    # keeps its width — and it satisfies the groupBy's clustered
    # distribution, so Catalyst adds NO second exchange: the payload
    # still crosses exactly once.
    merge_keys = ["z", "x", "y"] if mosaic else ["raster_id", "z", "x", "y"]
    partials = partials.repartition(n_parts, *merge_keys)
    return partials.groupBy(*merge_keys).applyInPandas(
        merge, schema=TILE_OUT_SCHEMA)


def _chunk_partials(rec, method, out_size, out_srs, out_dtype, turbo,
                    chunk, halo, out_no_data, warp_kwargs, mosaic=False):
    """Warp every matched tile from ONE chunk's window; emit owned rects.

    Ownership: out SAMPLE centers (the scaled out_resolution grid the
    kernel actually computes on, then replicates — geowarp.js:506-521)
    are inverse-projected to global source image coords with the
    full-raster geotransform; the chunk owns samples landing in its
    halo-free core [k*chunk, (k+1)*chunk) (recovered from
    row_off/col_off: offsets are k*chunk - halo clipped at 0, and
    halo < chunk makes k unambiguous).  The sample-grid owned mask is
    expanded to the full out_size grid with the SAME js_round edge maps
    _materialize uses, so every pixel of a replicated sample block has
    exactly one owner.  cutline / row-range masking needs no ownership
    handling: masked pixels hold the fill value in every partial, owner
    included, which equals the full-raster path's fill."""
    from ..kernels.stats import js_round
    from ..kernels.warp import _scale_integer

    method_name = method if isinstance(method, str) else "custom"
    row_off, col_off = int(rec["row_off"]), int(rec["col_off"])
    kr = 0 if row_off == 0 else (row_off + halo) // chunk
    kc = 0 if col_off == 0 else (col_off + halo) // chunk
    # edge chunks own the outside halfplane too: box-stat windows of out
    # pixels whose CENTER falls just past the raster edge still clip into
    # the raster (geowarp.js:929 tests full-window containment, not the
    # center), and that value must come from exactly one partial
    rh_full, rw_full = int(rec["raster_height"]), int(rec["raster_width"])
    # single-raster: edge chunks own the outside halfplane too (box-stat
    # windows of out pixels whose CENTER lies just past the raster edge
    # still clip into the raster — geowarp.js:929 — and that value must
    # come from exactly one partial).  mosaic: "outside my raster"
    # belongs to OTHER rasters, so ownership clamps to this raster's
    # extent — otherwise an edge chunk's fill claims a neighbor source's
    # real pixels at the seam.
    lo_r, hi_r = (0, rh_full) if mosaic else (-np.inf, np.inf)
    lo_c, hi_c = (0, rw_full) if mosaic else (-np.inf, np.inf)
    own_r0 = lo_r if kr == 0 else kr * chunk
    own_r1 = hi_r if (kr + 1) * chunk >= rh_full else (kr + 1) * chunk
    own_c0 = lo_c if kc == 0 else kc * chunk
    own_c1 = hi_c if (kc + 1) * chunk >= rw_full else (kc + 1) * chunk

    g = Geotransform(list(rec["geotransform"]))
    srs = int(rec["srs"])
    inv = None if out_srs == srs else transformer(out_srs, srs)

    # the kernel's actual sample grid under out_resolution (identity when
    # out_resolution is the default (1, 1))
    xr, yr = warp_kwargs.get("out_resolution", (1.0, 1.0))
    ws_s, _, x_scale = _scale_integer(out_size, xr)
    hs_s, _, y_scale = _scale_integer(out_size, yr)

    tgt_dtype = str(np.dtype(out_dtype)) if out_dtype else str(np.dtype(rec["dtype"]))
    kernel_dtype = out_dtype
    if (mosaic and out_no_data is None
            and np.issubdtype(np.dtype(tgt_dtype), np.integer)):
        # integer fill materializes NaN to 0, indistinguishable from real
        # data in the merge's valid-over-fill precedence — warp in
        # float64 so nodata stays NaN until after precedence; the merge
        # casts to tgt_dtype with the same nan_to_num _materialize uses,
        # so the result is bit-identical to the whole-raster path (which
        # also materializes from a float64 canvas at the end)
        kernel_dtype = "float64"

    out = []
    for tk in rec["tile_keys"]:
        z, x, y = int(tk["z"]), int(tk["x"]), int(tk["y"])
        tb = tile_to_bbox_3857(x, y, z) if out_srs == 3857 else tile_to_bbox_4326(x, y, z)
        sw = (tb[2] - tb[0]) / out_size * x_scale
        sh = (tb[3] - tb[1]) / out_size * y_scale
        xs = tb[0] + (np.arange(ws_s) + 0.5) * sw
        ys = tb[3] - (np.arange(hs_s) + 0.5) * sh
        gx, gy = np.meshgrid(xs, ys)
        if inv is not None:
            px, py = inv.transform(gx.reshape(-1), gy.reshape(-1))
        else:
            px, py = gx.reshape(-1), gy.reshape(-1)
        cx, cy = g.inverse(np.asarray(px, dtype=np.float64),
                           np.asarray(py, dtype=np.float64))
        with np.errstate(invalid="ignore"):
            owned_s = (np.isfinite(cx) & np.isfinite(cy)
                       & (cx >= own_c0) & (cx < own_c1)
                       & (cy >= own_r0) & (cy < own_r1)).reshape(hs_s, ws_s)
        owned = owned_s
        if (hs_s, ws_s) != (out_size, out_size):
            # replicate sample ownership to the full pixel grid with the
            # exact edge maps _materialize uses (geowarp.js:506-521)
            col_edges = js_round(np.arange(ws_s + 1, dtype=np.float64) * x_scale).astype(np.int64)
            row_edges = js_round(np.arange(hs_s + 1, dtype=np.float64) * y_scale).astype(np.int64)
            col_map = np.clip(np.searchsorted(col_edges, np.arange(out_size), side="right") - 1,
                              0, ws_s - 1)
            row_map = np.clip(np.searchsorted(row_edges, np.arange(out_size), side="right") - 1,
                              0, hs_s - 1)
            owned = owned_s[row_map][:, col_map]
        if not owned.any():
            continue
        # restrict the kernel to the owned SAMPLE-row range: rows outside
        # row_start/row_end are fill in EVERY plan (the kernel masks them
        # before any gather), so intersecting the caller's row range with
        # the owned rows is bit-identical and skips the per-pair kernel
        # work a straddling tile would otherwise duplicate per chunk —
        # a tile spanning k chunk-rows costs ~1x instead of ~k x.
        # (gather kernels only window-gather kept rows; vectorize ignores
        # the row hint and keeps its own pruning, still correct.)
        srows = np.nonzero(owned_s.any(axis=1))[0]
        eff_start = max(int(warp_kwargs.get("row_start", 0) or 0), int(srows.min()))
        caller_end = warp_kwargs.get("row_end")
        eff_end = min(hs_s if caller_end is None else int(caller_end),
                      int(srows.max()) + 1)
        # column restriction (r5): same argument as rows — owned samples
        # are a rectangle-bounded set, samples outside it are discarded
        # by the owned-mask crop, so a column-straddling chunk skips the
        # other columns' box gathers too (col range is engine-internal;
        # no caller-facing col option exists in the reference)
        scols = np.nonzero(owned_s.any(axis=0))[0]
        pair_kwargs = dict(warp_kwargs, out_no_data=out_no_data,
                           row_start=eff_start, row_end=eff_end,
                           col_start=int(scols.min()),
                           col_end=int(scols.max()) + 1)
        if method in ("vectorize", "near-vectorize", "nearest-vectorize"):
            pair_kwargs = dict(warp_kwargs, out_no_data=out_no_data)
        row = _stitch_and_warp(
            [rec], z, x, y, method, method_name, out_size, out_srs,
            kernel_dtype, turbo, pair_kwargs,
        )
        block = np.frombuffer(row["data"], dtype=row["dtype"]).reshape(
            row["bands"], out_size, out_size)
        rr, cc = np.nonzero(owned)
        r0, r1 = int(rr.min()), int(rr.max()) + 1
        c0, c1 = int(cc.min()), int(cc.max()) + 1
        sub_mask = owned[r0:r1, c0:c1]
        out.append({
            "raster_id": rec["raster_id"],
            "z": z, "x": x, "y": y,
            "bands": int(row["bands"]),
            "dtype": row["dtype"],
            "tgt_dtype": tgt_dtype,
            "r0": r0, "c0": c0, "rh": r1 - r0, "rw": c1 - c0,
            "data": np.ascontiguousarray(block[:, r0:r1, c0:c1]).tobytes(),
            "mask": np.packbits(sub_mask).tobytes(),
        })
    return out


def warp_tiles_broadcast(tiles: DataFrame, chunk_records, *, method="near",
                         methods=None, out_size=256, out_srs=3857,
                         out_dtype=None, turbo=False, **warp_kwargs) -> DataFrame:
    """Broadcast execution path: ship the (small) chunk set to every
    executor ONCE and mapInPandas over the tile table — zero shuffle of
    pixel payloads.  The cell equi-join path duplicates each matched
    chunk's payload per tile through the groupBy exchange (measured as
    the dominant cost: ~4 GB of Arrow traffic for a 1 MB source at z11);
    when the source fits in a broadcast this plan is strictly better.
    ``chunk_records``: list of dicts with CHUNK_SCHEMA fields (data=bytes).
    ``methods``: run several resampling methods in ONE pass — one
    broadcast, one scan of the tile table, one stitch per (tile, method)
    — instead of unioning per-method jobs that each re-broadcast the same
    records (VERDICT r3 'wrong' #4).
    """
    spark = tiles.sparkSession
    bc = spark.sparkContext.broadcast(chunk_records)
    meths = list(methods) if methods is not None else [method]
    named = [(m, m if isinstance(m, str) else "custom") for m in meths]

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
                matched = [recs[i] for i in idx]
                for m, mname in named:
                    rows.append(_stitch_and_warp(
                        matched, int(z), int(x), int(y),
                        m, mname, out_size, out_srs, out_dtype,
                        turbo, warp_kwargs,
                    ))
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(gen, schema=TILE_OUT_SCHEMA)


TILE_OUT_CONFIG_SCHEMA = StructType(
    list(TILE_OUT_SCHEMA.fields) + [StructField("config", StringType())])


def warp_tiles_broadcast_variants(tiles: DataFrame, chunk_records, variants, *,
                                  out_size=256, out_srs=3857, out_dtype=None,
                                  turbo=False) -> DataFrame:
    """Option-surface sweep in ONE job: broadcast the chunk records once
    and warp every (config_tag, method, warp_kwargs) variant per matched
    tile inside a single mapInPandas pass (VERDICT r3 'wrong' #4: the
    per-variant union re-broadcast the same records 20x).  Emits
    TILE_OUT_SCHEMA plus a ``config`` tag column."""
    spark = tiles.sparkSession
    bc = spark.sparkContext.broadcast(chunk_records)
    vs = []
    for tag, m, kw in variants:
        kw = dict(kw)
        vs.append((tag, m, m if isinstance(m, str) else "custom",
                   bool(kw.pop("turbo", turbo)), kw))

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
                matched = [recs[i] for i in idx]
                for tag, m, mname, tb_v, kw in vs:
                    row = _stitch_and_warp(
                        matched, int(z), int(x), int(y), m, mname,
                        out_size, out_srs, out_dtype, tb_v, kw)
                    row["config"] = tag
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return tiles.mapInPandas(gen, schema=TILE_OUT_CONFIG_SCHEMA)


# broadcast the source when it fits comfortably in an executor broadcast;
# larger sources take the chunk-anchored plan (payload moves once).
# MEASURED (BENCH/crossover_r4.json, min-of-3 interleaved, 676-tile z9
# cover, 0.8-48 MB sources): broadcast wall ~= 0.37 s + 0.054 s/MB,
# chunks ~= 2.3 s + 0.125 s/MB — no wall-clock crossover below the
# memory bound on a single JVM (broadcast "shipping" there is just
# serialization), and the chunks penalty shrinks 5.8x -> 2.8x as the
# source grows.  The cap is therefore an executor-MEMORY budget, not a
# speed crossover: past ~64 MB the broadcast plan starts costing real
# executor heap x N_executors network copies on a cluster, while the
# chunks plan's constant factor is already within 3x and falling.
AUTO_BROADCAST_BYTES = 64 << 20


def warp_fixture_to_tiles(spark, fixture, zooms, method="near", out_size=256,
                          chunk=256, halo=8, join_strategy="auto", **kw) -> DataFrame:
    """Convenience: fixture -> chunks -> covering tiles -> warp.

    join_strategy:
      'auto'          — broadcast-map when the source fits
                        AUTO_BROADCAST_BYTES, else the chunk-anchored plan
                        (ADVICE r1: pick the plan automatically)
      'broadcast_map' — zero-payload-shuffle path (source broadcast to
                        executors, mapInPandas over tiles)
      'chunks'        — chunk-anchored two-phase plan (large sources)
      'cells' / 'broadcast' — the mosaic plans (see warp_tiles)
    """
    inv = transformer(fixture["srs"], 4326)
    bb4326 = reproject_bbox(fixture["bbox"], inv.transform, density=16, nan_strategy="skip")
    # chunk-anchored plans consume the tile table only for metadata pair
    # discovery (per-row cost trivial) — size its partitions by rows;
    # the broadcast paths warp per tile row and keep the full width
    rpp = 65536 if join_strategy in ("chunks", "cells") else None
    tiles = tiles_df(spark, zooms, bbox_4326=bb4326, rows_per_partition=rpp)
    if join_strategy == "auto":
        join_strategy = ("broadcast_map"
                         if fixture["data"].nbytes <= AUTO_BROADCAST_BYTES
                         else "chunks")
    if join_strategy == "broadcast_map":
        recs = fixture_chunk_records(fixture, chunk=chunk, halo=halo)
        return warp_tiles_broadcast(tiles, recs, method=method,
                                    out_size=out_size, **kw)
    chunks = chunks_to_df(spark, fixture, chunk=chunk, halo=halo)
    return warp_tiles(tiles, chunks, method=method, out_size=out_size,
                      join_strategy=join_strategy, chunk=chunk, halo=halo, **kw)
