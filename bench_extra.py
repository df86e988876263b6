"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT part of the frozen driver bench (bench.py).  Subcommands:

  profile   — per headline query: query-CONSTRUCTION wall (driver-side
              python building the DataFrame) vs EXECUTION wall (the
              .count() the frozen bench times), plus the number of Spark
              jobs each phase launched (job-group bookkeeping).
  views     — microbenchmark of _views() re-registration cost.
  knn       — attribution of the knn_cells widening loop: wall per pass
              per driver action.

Usage: python bench_extra.py [profile|views|knn] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from geowarp_spark.session import get_spark

    spark = get_spark(app_name="geowarp-bench-extra",
                      master=f"local[{CPUS}]",
                      pretouch=os.environ.get("SPARK_GRAFT_PRETOUCH", "1") == "1")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _njobs(sc, group):
    return len(sc.statusTracker().getJobIdsForGroup(group))


def profile(trials=2):
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    spark = _spark()
    sc = spark.sparkContext
    qs = em.queries()
    qs["agg_minmax"](spark, SF).count()  # warm-up, as bench.py does

    headline = [
        "pip_grid", "knn_cells", "cell_rollup", "salted_cells",
        "minhash_full", "simhash_full", "quality", "lang_id",
        "similarity_bruteforce", "similarity_lsh",
        "agg_minmax", "mode_family", "events_window",
        "warp_tiles", "warp_boxstats_chunks",
    ]
    modes = ["single", "mosaic", "mosaic_bilinear", "mosaic_median"]

    out = {}
    for t in range(trials):
        for name in headline + [f"warp_tiles_chunks/{m}" for m in modes]:
            if "/" in name:
                base, mode = name.split("/")
            else:
                base, mode = name, None
            g = f"{name}-t{t}"
            sc.setJobGroup(g + "-build", name)
            t0 = time.time()
            df = qs[base](spark, SF)
            if mode is not None:
                df = df.filter(F.col("mode") == mode)
            t1 = time.time()
            jb = _njobs(sc, g + "-build")
            sc.setJobGroup(g + "-run", name)
            n = df.count()
            t2 = time.time()
            jr = _njobs(sc, g + "-run")
            rec = out.setdefault(name, {"build": [], "run": [],
                                        "jobs_build": jb, "jobs_run": jr,
                                        "rows": n})
            rec["build"].append(round(t1 - t0, 3))
            rec["run"].append(round(t2 - t1, 3))
    for name, rec in out.items():
        rec["build_min"] = min(rec["build"])
        rec["run_min"] = min(rec["run"])
    print(json.dumps(out, indent=1))
    spark.stop()


def views(trials=20):
    import __spark_entry__ as em

    spark = _spark()
    em._views(spark, SF)
    t0 = time.time()
    for _ in range(trials):
        em._views(spark, SF)
    sec = (time.time() - t0) / trials
    print(json.dumps({"views_sec_per_call": round(sec, 4)}))
    spark.stop()


def knn(trials=3):
    """Time the knn_cells query's actions with job descriptions so the
    per-pass cost is attributable (VERDICT r7 'wrong' #1)."""
    import __spark_entry__ as em

    spark = _spark()
    sc = spark.sparkContext
    qs = em.queries()
    qs["knn_cells"](spark, SF).count()  # warm
    walls = []
    for t in range(trials):
        g = f"knn-{t}"
        sc.setJobGroup(g, "knn_cells")
        t0 = time.time()
        qs["knn_cells"](spark, SF).count()
        walls.append(round(time.time() - t0, 3))
        print({"trial": t, "wall": walls[-1], "jobs": _njobs(sc, g)})
    print(json.dumps({"walls": walls}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "profile"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else {"profile": 2, "views": 20, "knn": 3}[cmd]
    {"profile": profile, "views": views, "knn": knn}[cmd](n)
