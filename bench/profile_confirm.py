"""Round-5 confirmation: cold-JVM C2-compilation contention explains the
8->32 salted_counts anti-scaling; warm-up + compiler-drain +
hugeMethodLimit=8000 removes it.

profile_firstrun.py showed (a) a NEW codegen class is fast in a warm JVM
(not per-class JIT), (b) jit_ms stays 7-20s/run for ~1 min of JVM life —
C2 threads compete with 32 busy workers, so the first heavy stages run
semi-compiled, and MORE worker threads make the warm-up phase SLOWER in
wall-clock (28-48s@32 vs 25s@8), (c) hugeMethodLimit=8000 (HotSpot's
DontCompileHugeMethods threshold) roughly halves steady-state wall — the
default fused whole-stage method never gets JIT-compiled at all.

This harness: per (level, variant) JVM -> warm-up, then optionally WAIT
for the compiler queue to drain while idle, then 4 timed gen+salted runs.
Prediction: drained+huge8000 runs are uniformly fast at BOTH levels and
32 >= 8-core throughput.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _jit_ms(sc):
    return sc._jvm.java.lang.management.ManagementFactory.getCompilationMXBean().getTotalCompilationTime()


def drain_compiler(sc, settle_ms=300, max_wait=60.0):
    """Idle-wait until JVM compilation activity settles: poll total
    compilation time until it stops advancing for ``settle_ms``."""
    t0 = time.time()
    last = _jit_ms(sc)
    quiet_since = time.time()
    while time.time() - t0 < max_wait:
        time.sleep(0.25)
        cur = _jit_ms(sc)
        if cur != last:
            last = cur
            quiet_since = time.time()
        elif (time.time() - quiet_since) * 1000 >= settle_ms:
            return round(time.time() - t0, 2)
    return round(time.time() - t0, 2)


def worker(out_path):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from geowarp_spark.operators.spatial import salted_cell_counts

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    drain = os.environ.get("PROF_DRAIN", "1") == "1"

    def points(replication):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "n_chars")
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        n_docs = docs.count()
        p = (
            spark.range(0, n_docs * replication, 1, nparts)
            .withColumn("orig", F.expr(f"id DIV {replication}"))
            .join(F.broadcast(docs.select(F.col("doc_id").alias("orig"),
                                          "n_chars")), "orig")
            .select(F.col("id").alias("doc_id"), "n_chars")
        )
        lon = ("CASE WHEN doc_id % 10 < 7 THEN ((doc_id * 7919) % 20000) / 1000.0 - 10.0 "
               "ELSE ((doc_id * 9301 + 49297) % 360000) / 1000.0 - 180.0 END")
        lat = ("CASE WHEN doc_id % 10 < 7 THEN ((doc_id * 104729) % 20000) / 1000.0 + 30.0 "
               "ELSE ((doc_id * 1299709 + 7) % 180000) / 1000.0 - 90.0 END")
        return p.withColumn("lon", F.expr(lon)).withColumn("lat", F.expr(lat))

    pts = points(4000)
    # representative warm-up (scale via PROF_WARM; 40 = the 1% scaling.py
    # uses, 400 = 10% — probes whether the residual first-full-shuffle
    # spike at 32 cores is adaptive sizing that a bigger warm-up absorbs)
    warm_rep = int(os.environ.get("PROF_WARM", "40"))
    small = points(warm_rep)
    small.agg(F.sum("lon"), F.sum("lat")).collect()
    salted_cell_counts(small, z=12).count()
    drain_s = drain_compiler(sc) if drain else 0.0

    def gc_ms():
        beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    runs = []
    for i in range(4):
        g0, t0 = gc_ms(), time.time()
        pts.agg(F.sum("lon"), F.sum("lat")).collect()
        g = time.time() - t0
        ggc = gc_ms() - g0
        g0, t0 = gc_ms(), time.time()
        salted_cell_counts(pts, z=12).count()
        s = time.time() - t0
        runs.append({"gen": round(g, 3), "salted": round(s, 3),
                     "gen_gc_ms": ggc, "salted_gc_ms": gc_ms() - g0})
        print(runs[-1], flush=True)
    with open(out_path, "w") as f:
        json.dump({"master": sc.master, "drain_wait_s": drain_s,
                   "runs": runs}, f, indent=2)
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
    env = dict(os.environ, OMP_NUM_THREADS="1")
    out_all = {}
    for cores in (8, 32):
        for variant, extra, drain in (
            ("plain", [], "0"),
            ("fixed", ["--conf", "spark.sql.codegen.hugeMethodLimit=8000"], "1"),
        ):
            out = f"/tmp/prof_confirm_{cores}_{variant}.json"
            cmd = ["spark-submit", "--master", f"local[{cores}]",
                   "--conf", f"spark.sql.shuffle.partitions={cores}",
                   "--conf", "spark.sql.adaptive.enabled=true",
                   "--conf", "spark.driver.memory=16g",
                   *extra, "--py-files", zpath,
                   os.path.abspath(__file__), "worker", out]
            print(f"== {cores} cores, {variant}", flush=True)
            subprocess.run(cmd, check=True, cwd=REPO,
                           env=dict(env, PROF_DRAIN=drain),
                           stdout=None, stderr=subprocess.DEVNULL)
            with open(out) as f:
                out_all[f"{cores}_{variant}"] = json.load(f)
    print(json.dumps(out_all, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
    else:
        orchestrate()
