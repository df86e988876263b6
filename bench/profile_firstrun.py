"""Round-5 follow-up: the profile_salted.py result showed the
salted_counts 'anti-scaling' is really a FIRST-EVALUATION effect —
gen (pure codegen arithmetic over 20M rows): 25s@8 / 48s@32 on the
first run, 2.4s/1.0s on repeats, while a same-cardinality pure-JVM
salted agg (jvm_burn) is ~1s at both levels.  This harness separates:

  H-A per-codegen-class: the generated whole-stage method is too big
      for HotSpot C2 (DontCompileHugeMethods, 8000-bytecode limit) and
      runs interpreted — a NEW query class with different constants is
      slow again even in a warm JVM; hugeMethodLimit=8000 fixes it.
  H-C global JVM warm (GC heap growth etc.) — only the very first
      heavy action is slow, a new query class is fast.

Runs at one level (default 32).  Prints per-run walls + GC deltas.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _pts(spark, mults):
    from pyspark.sql import functions as F
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_docs = docs.count()
    m1, m2, m3, m4 = mults
    pts = (
        spark.range(0, n_docs * 4000, 1, nparts)
        .withColumn("orig", F.expr("id DIV 4000"))
        .join(F.broadcast(docs.select(F.col("doc_id").alias("orig"), "n_chars")), "orig")
        .select(F.col("id").alias("doc_id"), "n_chars")
    )
    lon = (f"CASE WHEN doc_id % 10 < 7 THEN ((doc_id * {m1}) % 20000) / 1000.0 - 10.0 "
           f"ELSE ((doc_id * {m2} + 49297) % 360000) / 1000.0 - 180.0 END")
    lat = (f"CASE WHEN doc_id % 10 < 7 THEN ((doc_id * {m3}) % 20000) / 1000.0 + 30.0 "
           f"ELSE ((doc_id * {m4} + 7) % 180000) / 1000.0 - 90.0 END")
    return pts.withColumn("lon", F.expr(lon)).withColumn("lat", F.expr(lat))


def _gc_ms(sc):
    beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _jit_ms(sc):
    return sc._jvm.java.lang.management.ManagementFactory.getCompilationMXBean().getTotalCompilationTime()


def worker(out_path):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    res = {"conf": {
        "master": sc.master,
        "wholeStage": spark.conf.get("spark.sql.codegen.wholeStage", "true"),
        "hugeMethodLimit": spark.conf.get("spark.sql.codegen.hugeMethodLimit", "65535"),
    }, "runs": []}

    def run(tag, df):
        gc0, jit0, t0 = _gc_ms(sc), _jit_ms(sc), time.time()
        df.agg(F.sum("lon"), F.sum("lat")).collect()
        res["runs"].append({
            "tag": tag, "wall": round(time.time() - t0, 3),
            "gc_ms": _gc_ms(sc) - gc0, "jit_ms": _jit_ms(sc) - jit0,
        })
        print(res["runs"][-1], flush=True)

    base = (7919, 9301, 104729, 1299709)
    alt = (7927, 9311, 104723, 1299721)
    a = _pts(spark, base)
    run("q1_first", a)
    run("q1_second", a)
    run("q1_third", a)
    b = _pts(spark, alt)         # different constants -> new codegen class
    run("q2_newclass_first", b)
    run("q2_newclass_second", b)
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
    env = dict(os.environ, OMP_NUM_THREADS="1")
    cores = int(os.environ.get("PROF_CORES", "32"))
    variants = [
        ("default", []),
        ("huge8000", ["--conf", "spark.sql.codegen.hugeMethodLimit=8000"]),
        ("nocodegen", ["--conf", "spark.sql.codegen.wholeStage=false"]),
    ]
    out_all = {}
    for name, extra in variants:
        out = f"/tmp/prof_first_{name}.json"
        cmd = ["spark-submit", "--master", f"local[{cores}]",
               "--conf", f"spark.sql.shuffle.partitions={cores}",
               "--conf", "spark.sql.adaptive.enabled=true",
               "--conf", "spark.driver.memory=16g",
               *extra, "--py-files", zpath,
               os.path.abspath(__file__), "worker", out]
        print(f"== variant {name} @{cores} cores", flush=True)
        subprocess.run(cmd, check=True, cwd=REPO, env=env,
                       stdout=None, stderr=subprocess.DEVNULL)
        with open(out) as f:
            out_all[name] = json.load(f)
    print(json.dumps(out_all, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
    else:
        orchestrate()
