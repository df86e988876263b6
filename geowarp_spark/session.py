"""SparkSession builder tuned for the warp+tile workload.

Scale posture (SURVEY §4 "Our physical design"): AQE on with skew-join
handling (dense web-page clusters salt + re-split at runtime), Arrow
enabled for every pandas UDF hop, shuffle partitions sized to cores for
local runs (a 1000-executor cluster would set this to 2-3x total cores
via spark-submit conf, not code).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "geowarp-spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None,
              pretouch: bool | None = None) -> SparkSession:
    """``pretouch``: pre-size and pre-touch the driver heap
    (-Xms + -XX:+AlwaysPreTouch).  Root-caused in round 5
    (BENCH/BASELINE.md): with the default tiny -Xms, the FIRST
    full-scale JVM-side stage forces the kernel to commit+zero ~14 GB
    mid-query — 20-80 s of wall landing in whatever stage runs first,
    worse at higher thread counts (the r4 "8->32 anti-scaling" was
    exactly this).  Pre-touching moves that cost to JVM startup and
    also stabilizes steady-state (no G1 region growth mid-job).  Costs
    ~10 s startup + pins the heap, so it defaults ON for bench/scaling
    entry points (SPARK_GRAFT_PRETOUCH=1) and OFF for tests."""
    # set in the driver env too: in local mode python workers fork from
    # the driver-launched JVM and inherit this environment
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # 3x cores: grouped-UDF stages (applyInPandas warps) have skewed
        # per-group cost (z9 tiles cost ~4x z10), so over-partitioning
        # lets the scheduler load-balance the tail — measured 3.5x faster
        # than partitions == cores at local[32]
        try:
            n = int(master.split("[")[1].rstrip("]")) if "[" in master else int(cpus)
        except ValueError:
            n = 32
        shuffle_partitions = max(8, 3 * n)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # one BLAS/OMP thread per python worker: N workers x M-thread
        # OpenBLAS pools thrash the CPU (measured 2.5x slowdown at
        # local[32]); parallelism comes from Spark tasks, not BLAS
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    if pretouch is None:
        pretouch = os.environ.get("SPARK_GRAFT_PRETOUCH", "0") == "1"
    if pretouch:
        # UseParallelGC: G1's FIRST full-heap cycle (triggered by the
        # first full-scale shuffle's allocation burst) costs 20-35 s of
        # GC at 32 threads even on a pre-touched heap (bench/
        # profile_confirm.py gc_ms deltas: 34.6 s / 20.2 s in two
        # interleaved G1 legs vs 1.7 s / 4.8 s under ParallelGC, equal
        # or better steady state).  The throughput collector is the
        # right default for batch analytics; a latency-sensitive
        # deployment can override via extra_conf.
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        xms = os.environ.get("SPARK_GRAFT_XMS", "14g")
        b = (b.config("spark.driver.memory", mem)
             .config("spark.driver.extraJavaOptions",
                     f"-Xms{xms} -XX:+AlwaysPreTouch -XX:+UseParallelGC"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
