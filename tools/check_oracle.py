"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + (sorted-column, order-insensitive) value hashes.

Usage: python tools/check_oracle.py [names...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def canon(df_pandas):
    """Sort columns by name, normalize values, hash order-insensitively."""
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = []
    for tup in pdf.itertuples(index=False):
        parts = []
        for v in tup:
            if v is None:
                parts.append("NULL")
            elif isinstance(v, float):
                parts.append(f"{v:.9g}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)


def main():
    import __spark_entry__ as entry_mod
    from geowarp_spark.session import get_spark

    names = sys.argv[1:] or None
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            ok += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            fail += 1
            continue
        sh, sn = canon(sdf)
        dh, dn = canon(ddf)
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        status = "OK" if (sh == dh and sn == dn and scols == dcols) else "MISMATCH"
        if status == "OK":
            ok += 1
        else:
            fail += 1
        print(f"{status} {name}: rows {sn}/{dn} cols {scols == dcols} hash {sh == dh}  ({time.time()-t0:.1f}s)")
        if status != "OK" and scols == dcols:
            import pandas as pd
            s_sorted = sdf[sorted(sdf.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
            d_sorted = ddf[sorted(ddf.columns)].astype(str).apply("|".join, axis=1).sort_values().tolist()
            sset, dset = set(s_sorted), set(d_sorted)
            only_s = list(sset - dset)[:3]
            only_d = list(dset - sset)[:3]
            if only_s:
                print("   spark-only:", only_s)
            if only_d:
                print("   duck-only :", only_d)
    print(f"\n{ok} ok, {fail} fail")
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
