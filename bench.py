"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...}}

The headline set covers the north-rule pipeline stages: geotag + cell
encode + PIP join (pages_pipeline), kNN join, cell rollup, dedup
(minhash), text quality, ANN similarity, box-stat warp of a raster to a
tile pyramid, and the salted skew-safe aggregation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_once(spark, sf_dir):
    import __spark_entry__ as em

    qs = em.queries()
    headline = [
        "pip_grid", "knn_cells", "cell_rollup", "salted_cells",
        "minhash", "simhash", "quality", "lang_id",
        "similarity_bruteforce", "similarity_lsh",
        "agg_minmax", "mode_family", "events_window",
        "warp_tiles", "warp_boxstats",
    ]
    times = {}
    counts = {}
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        counts[name] = n
    return times, counts


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from geowarp_spark.session import get_spark

    spark = get_spark(app_name="geowarp-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (JIT, Arrow init, parquet footer cache) — discarded
    import __spark_entry__ as em

    em.queries()["agg_minmax"](spark, sf_dir).count()

    times, counts = run_once(spark, sf_dir)
    total = round(sum(times.values()), 3)

    # joined-rows/sec + tiles/sec for the north-rule metric
    lineitem_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    tiles_n = counts.get("warp_tiles", 0) + counts.get("warp_boxstats", 0)
    join_sec = times["pip_grid"] + times["knn_cells"] + times["cell_rollup"] + times["salted_cells"]
    warp_sec = times["warp_tiles"] + times["warp_boxstats"]
    out = {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": int(cpus),
        "rows": {"lineitem": lineitem_n, "documents": docs_n},
        "throughput": {
            "joined_rows_per_sec": round(4 * docs_n / max(join_sec, 1e-9), 1),
            "tiles_per_sec": round(tiles_n / max(warp_sec, 1e-9), 1),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
