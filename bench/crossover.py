"""Chunks-vs-broadcast crossover measurement (VERDICT r3 next #8).

``warp_fixture_to_tiles(join_strategy='auto')`` picks the broadcast-map
plan when the source fits AUTO_BROADCAST_BYTES and the chunk-anchored
plan otherwise.  This tool turns that constant into a measured number:
the SAME warp workload (fixed z9 tile cover, near resampling) runs under
both plans at several source sizes, min-of-k interleaved trials (host
drifts 2-4x on a minutes scale — single runs are noise), and the output
records per-size walls, the chunks-plan overhead, and the fitted
fixed/variable cost split.

What the numbers mean at cluster scale: on local[N] both plans share one
JVM, so broadcast "shipping" is just serialization — the wall-clock
crossover here under-states broadcast's true cluster cost (N_executors
copies over the network + full-source memory per executor).  The
decision rule therefore stays memory-bound (a source bigger than
AUTO_BROADCAST_BYTES per executor is a non-starter regardless of speed),
and this measurement bounds the constant-factor penalty the chunks plan
pays when it must take over.

Usage: python bench/crossover.py [out_json]   (~5-10 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [512, 1024, 2048, 4096]          # px; 3-band uint8 -> 0.8..50 MB
STRATS = ["broadcast_map", "chunks"]
TRIALS = int(os.environ.get("CROSSOVER_TRIALS", "3"))
CHUNK = 256
ZOOMS = [9]          # fixed 676-tile cover of the +-1e6 m bbox
OUT_SIZE = 64


def make_fixture(n: int) -> dict:
    """Parametric 3-band blocky raster (seed 42), EPSG:3857, +-1e6 m —
    same shape family as rgba_webmerc, size-swept."""
    from geowarp_spark.sources.fixtures import _blocky, _fx, _rng

    rng = _rng()
    base = _blocky(rng, n, n, block=max(16, n // 16))
    data = np.stack([base, base // 2, base // 3]).astype(np.uint8)
    return _fx(f"xover_{n}", 3857, [-1e6, -1e6, 1e6, 1e6], data, no_data=None)


def run_leg(spark, fx, strat: str, chunks_path: str | None = None) -> tuple[float, int]:
    """One timed execution of the warp under ``strat``.

    The chunks leg reads its chunk rows from PARQUET (written once,
    untimed): that is the production shape — a non-broadcastable source
    is materialized/ingested distributively (parquet, binaryFile TIFF),
    never rebuilt per job via driver-side createDataFrame.  r4's
    crossover timed createDataFrame of the full source INSIDE every
    chunks leg (~4 s of driver Arrow conversion at 48 MB), which
    inflated the plan's apparent fixed cost; the broadcast leg keeps its
    per-job sc.broadcast() build, which genuinely is per-job."""
    from geowarp_spark.kernels.bbox import reproject_bbox
    from geowarp_spark.kernels.proj import transformer
    from geowarp_spark.operators.warp_tiles import (
        tiles_df, warp_fixture_to_tiles, warp_tiles)

    t0 = time.time()
    if strat == "chunks":
        inv = transformer(fx["srs"], 4326)
        bb = reproject_bbox(fx["bbox"], inv.transform, density=16,
                            nan_strategy="skip")
        tiles = tiles_df(spark, ZOOMS, bbox_4326=bb)
        chunks = spark.read.parquet(chunks_path)
        n = warp_tiles(tiles, chunks, method="near", out_size=OUT_SIZE,
                       join_strategy="chunks", chunk=CHUNK, halo=8).count()
    else:
        n = warp_fixture_to_tiles(spark, fx, zooms=ZOOMS, method="near",
                                  out_size=OUT_SIZE, chunk=CHUNK,
                                  join_strategy=strat).count()
    return time.time() - t0, n


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/crossover_r4.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from geowarp_spark.session import get_spark

    # pretouch + ParallelGC (round-5 root cause, session.py): without it
    # the r4 crossover's "fixed 2.3 s" was dominated by first-run heap
    # commit + G1's first full-heap cycle, not by the plan
    spark = get_spark(app_name="geowarp-crossover", master=f"local[{cpus}]",
                      pretouch=True)
    spark.sparkContext.setLogLevel("ERROR")

    fixtures = {n: make_fixture(n) for n in SIZES}
    sizes_bytes = {n: int(fixtures[n]["data"].nbytes) for n in SIZES}

    # one-time chunk materialization (untimed — the production
    # ingest-once shape; see run_leg docstring)
    from geowarp_spark.operators.warp_tiles import chunks_to_df
    chunk_paths = {}
    for n in SIZES:
        p = f"/tmp/xover_chunks_{n}"
        chunks_to_df(spark, fixtures[n], chunk=CHUNK, halo=8).write.mode(
            "overwrite").parquet(p)
        chunk_paths[n] = p

    # warm-up legs (JIT + python pool), discarded
    run_leg(spark, fixtures[SIZES[0]], "broadcast_map")
    run_leg(spark, fixtures[SIZES[0]], "chunks", chunk_paths[SIZES[0]])

    raw: dict[str, list[float]] = {f"{n}:{s}": [] for n in SIZES for s in STRATS}
    tiles_n = {}
    for t in range(TRIALS):
        for n in SIZES:
            for s in STRATS:
                wall, cnt = run_leg(spark, fixtures[n], s, chunk_paths[n])
                raw[f"{n}:{s}"].append(round(wall, 3))
                tiles_n[n] = cnt
                print(f"trial {t} size {n} ({sizes_bytes[n] >> 20} MB) "
                      f"{s}: {wall:.2f}s ({cnt} tiles)", flush=True)

    best = {k: min(v) for k, v in raw.items()}
    rows = []
    for n in SIZES:
        b = best[f"{n}:broadcast_map"]
        c = best[f"{n}:chunks"]
        rows.append({
            "size_px": n,
            "size_bytes": sizes_bytes[n],
            "tiles": tiles_n[n],
            "broadcast_sec": b,
            "chunks_sec": c,
            "chunks_overhead_sec": round(c - b, 3),
            "chunks_over_broadcast": round(c / b, 2),
        })

    # least-squares fixed+linear fit per plan: wall ~= a + b * MB
    mb = np.array([sizes_bytes[n] / 2**20 for n in SIZES])
    fits = {}
    for s in STRATS:
        walls = np.array([best[f"{n}:{s}"] for n in SIZES])
        A = np.vstack([np.ones_like(mb), mb]).T
        (a, b), *_ = np.linalg.lstsq(A, walls, rcond=None)
        fits[s] = {"fixed_sec": round(float(a), 3),
                   "sec_per_mb": round(float(b), 4)}
    bb, cc = fits["broadcast_map"], fits["chunks"]
    if cc["sec_per_mb"] < bb["sec_per_mb"]:
        x_mb = (cc["fixed_sec"] - bb["fixed_sec"]) / (
            bb["sec_per_mb"] - cc["sec_per_mb"])
        crossover = {"wall_clock_crossover_mb": round(x_mb, 1)}
    else:
        crossover = {"wall_clock_crossover_mb": None,
                     "note": "chunks slope >= broadcast slope in-range; "
                             "no wall-clock crossover below the memory bound "
                             "on this single-JVM host"}

    out = {
        "protocol": f"min of {TRIALS} interleaved trials, local[{cpus}], "
                    f"z{ZOOMS} cover, near, out_size={OUT_SIZE}, chunk={CHUNK}",
        "rows": rows,
        "raw": raw,
        "fits": fits,
        "crossover": crossover,
        "decision_rule": "AUTO_BROADCAST_BYTES stays memory-bound: "
                         "broadcast requires the full source resident per "
                         "executor, so the cap is an executor-memory budget; "
                         "this measurement records the constant-factor "
                         "penalty paid when the chunks plan takes over.",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"rows": rows, "fits": fits, "crossover": crossover}))
    spark.stop()


if __name__ == "__main__":
    main()
