"""Round-5 diagnosis harness for the 8->32-core `salted_counts`
anti-scaling (VERDICT r4 'What's wrong' #1: stage 14.6s@8 -> 65.7s@32,
while pip/knn stages in the SAME job scale fine).

Observation driving the design: the r4 raw walls at 8 cores were
bimodal ([57, 111, 117, 123, 126]) while 32-core walls were uniformly
slow ([104..124]) — so the question is not "why is 32 slower" but
"what is the slow mode, and why does min-of-5 escape it only at 8".
scaling.py records per-stage times only for the min-wall trial; this
harness records EVERY trial, per variant, same JVM per leg so variants
share host weather.

Variants (all on the same 20M-point generated input as the join job):
  gen          force full point generation only (agg over lon/lat)
  direct       groupBy(cell).count() — no salt, one shuffle
  salted       salted_cell_counts as benched (cache + count)
  salted_nocache  salted without the .cache()
  jvm_burn     synthetic pure-JVM hash agg, same group cardinality,
               no docs join / no CASE exprs — host-bandwidth probe

Usage:
  python bench/profile_salted.py orchestrate     # legs at 8 and 32
  spark-submit ... profile_salted.py worker out.json   # one leg
Env: PROF_TRIALS (default 3), PROF_LEVELS (default "8,32"),
     PROF_AQE (default "true"), PROF_PARTS_MULT (default 1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICATION = int(os.environ.get("SCALING_REPLICATION", "4000"))


def _points(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_docs = docs.count()
    pts = (
        spark.range(0, n_docs * REPLICATION, 1, nparts)
        .withColumn("orig", F.expr(f"id DIV {REPLICATION}"))
        .join(F.broadcast(docs.select(F.col("doc_id").alias("orig"), "n_chars")), "orig")
        .select(F.col("id").alias("doc_id"), "n_chars")
    )
    lon = ("CASE WHEN doc_id % 10 < 7 THEN ((doc_id * 7919) % 20000) / 1000.0 - 10.0 "
           "ELSE ((doc_id * 9301 + 49297) % 360000) / 1000.0 - 180.0 END")
    lat = ("CASE WHEN doc_id % 10 < 7 THEN ((doc_id * 104729) % 20000) / 1000.0 + 30.0 "
           "ELSE ((doc_id * 1299709 + 7) % 180000) / 1000.0 - 90.0 END")
    return pts.withColumn("lon", F.expr(lon)).withColumn("lat", F.expr(lat))


def worker(out_path):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from geowarp_spark.grid.tiles import cell_sql_expr
    from geowarp_spark.operators.spatial import salted_cell_counts

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def timed(fn):
        t0 = time.time()
        v = fn()
        return round(time.time() - t0, 3), v

    pts = _points(spark, sf_dir)

    def v_gen():
        return pts.agg(F.sum("lon"), F.sum("lat")).collect()

    def v_direct():
        c = pts.withColumn("cell", F.expr(cell_sql_expr("lon", "lat", 12)))
        return c.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).count()

    def v_salted():
        counts = salted_cell_counts(pts, z=12).cache()
        n = counts.count()
        counts.unpersist()
        return n

    def v_salted_nocache():
        return salted_cell_counts(pts, z=12).count()

    def v_burn():
        # pure-JVM probe: same row count, similar group cardinality
        # (121905 cells x 16 salts ~= 1.95M), no docs join, no CASE —
        # a scattered-key two-stage hash agg on a bare range.
        n_groups = 121905
        df = (spark.range(0, 5000 * REPLICATION, 1, nparts)
              .select((F.col("id") * 2654435761 % n_groups).alias("cell"),
                      F.pmod(F.xxhash64("id"), F.lit(16)).alias("s")))
        p = df.groupBy("cell", "s").agg(F.count(F.lit(1)).alias("pn"))
        return p.groupBy("cell").agg(F.sum("pn").alias("n")).count()

    variants = [("gen", v_gen), ("direct", v_direct), ("salted", v_salted),
                ("salted_nocache", v_salted_nocache), ("jvm_burn", v_burn)]

    # warm-up: small representative run of each variant shape
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    warm = _points(spark, sf_dir).limit(200000)
    warm.withColumn("cell", F.expr(cell_sql_expr("lon", "lat", 12))).groupBy(
        "cell").count().count()

    res = {"master": sc.master, "shuffle_partitions": nparts, "stages": {}}
    trials = int(os.environ.get("PROF_TRIALS", "3"))
    walls = {name: [] for name, _ in variants}
    for _ in range(trials):
        for name, fn in variants:
            w, _v = timed(fn)
            walls[name].append(w)
    res["walls"] = walls
    # pull executor GC + task-time totals from the status API
    try:
        tracker = sc.statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        res["n_jobs"] = len(ids)
    except Exception:
        pass
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    spark.stop()


def orchestrate():
    import zipfile

    zpath = "/tmp/geowarp_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "geowarp_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    env = dict(os.environ, OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    levels = [int(x) for x in os.environ.get("PROF_LEVELS", "8,32").split(",")]
    aqe = os.environ.get("PROF_AQE", "true")
    mult = int(os.environ.get("PROF_PARTS_MULT", "1"))
    out_all = {}
    for cores in levels:
        out = f"/tmp/prof_salted_{cores}.json"
        cmd = [
            "spark-submit", "--master", f"local[{cores}]",
            "--conf", f"spark.sql.shuffle.partitions={mult * cores}",
            "--conf", f"spark.sql.adaptive.enabled={aqe}",
            "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.driver.memory=16g",
            "--py-files", zpath,
            os.path.abspath(__file__), "worker", out,
        ]
        print(f"leg local[{cores}] aqe={aqe} parts={mult * cores}", flush=True)
        subprocess.run(cmd, check=True, cwd=REPO, env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out) as f:
            out_all[cores] = json.load(f)
        print(json.dumps(out_all[cores]["walls"], indent=2), flush=True)
    print(json.dumps(out_all, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
    else:
        orchestrate()
