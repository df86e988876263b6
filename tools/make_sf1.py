"""Synthesize an sf1-scale bench input from the driver's sf0.1 tables
(VERDICT r4 next #6: at sf0.1 most headline queries run <1s, so the
suite mostly measures fixed overheads).

/root/testdata is read-only and ships no sf1, so this replicates the
four FACT tables 10x deterministically (key offsets keep ids unique;
text/timestamps/vectors get tiny deterministic perturbations so dedup /
windows / ANN stay non-degenerate) and copies the small dims verbatim.
DuckDB does the heavy lifting — no Spark session, so it can run while
bench legs are idle.

Usage:  python tools/make_sf1.py [out_dir]     (default /tmp/geowarp_sf1)
Then:   SPARK_GRAFT_SF_DIR=/tmp/geowarp_sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10

DIMS = ["region", "nation", "customer", "supplier", "part", "orders"]


def main(out_dir: str = "/tmp/geowarp_sf1"):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    rep = f"(SELECT unnest(range({K})) AS k) reps"

    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + k * {n_docs} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE text || ' r' || CAST(k AS VARCHAR) END AS text,
                 lang, source,
                 CASE WHEN k = 0 THEN n_chars
                      ELSE n_chars + 2 + length(CAST(k AS VARCHAR)) END AS n_chars
          FROM read_parquet('{SRC}/documents.parquet'), {rep}
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """)

    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT vec_id + k * {n_vecs} AS vec_id,
                 CASE WHEN k = 0 THEN embedding
                      ELSE list_prepend(CAST(embedding[1] + k * 0.001 AS FLOAT),
                                        embedding[2:]) END AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), {rep}
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
    """)

    n_ev = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT event_id + k * {n_ev} AS event_id,
                 ts + to_seconds(k) AS ts,
                 user_id, event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'), {rep}
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
    """)

    max_ok = con.execute(
        f"SELECT max(l_orderkey) + 1 FROM read_parquet('{SRC}/lineitem.parquet')").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT l_orderkey + k * {max_ok} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet'), {rep}
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
    """)

    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    for t in ["documents", "embeddings", "events", "lineitem"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1 tables written to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/geowarp_sf1")
