"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
(same parquet, sf0.01 by default), then compares row count, schema width,
and order-insensitive values (exact where possible, tolerant for floats).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(("f", round(v, 9)))
            elif hasattr(v, "timestamp"):  # datetime
                vals.append(("t", v.replace(tzinfo=None).isoformat()))
            elif isinstance(v, (bytes, bytearray)):
                vals.append(("b", bytes(v).hex()))
            else:
                vals.append(("o", v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main():
    import duckdb

    import __spark_entry__ as E
    from gdal_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in
                     sdf.select(*sorted(sdf.columns)).collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:24s} SPARK-ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d} (rows-only, no oracle) {time.time()-t0:5.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            drows_raw = res.fetchall()
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            drows = [tuple(r[i] for i in order) for r in drows_raw]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR {e}"))
            print(f"{name:24s} DUCKDB-ERROR {e}")
            continue
        scols = sorted(sdf.columns)
        dcols = sorted(cols)
        ok_schema = [c.lower() for c in scols] == [c.lower() for c in dcols]
        sn, dn = normalize(srows), normalize(drows)
        ok_rows = len(sn) == len(dn)
        ok_vals = sn == dn
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "MISMATCH"
        print(f"{name:24s} {status:9s} spark={len(sn):6d} duck={len(dn):6d} "
              f"schema={'ok' if ok_schema else f'{scols} vs {dcols}'} {time.time()-t0:5.1f}s")
        if status != "OK":
            failures.append((name, "mismatch"))
            if ok_schema and ok_rows and not ok_vals:
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                for a, b in diff:
                    print(f"   spark: {a}\n   duck : {b}")
            elif not ok_rows:
                sset, dset = set(sn), set(dn)
                print(f"   only-spark: {list(sset - dset)[:2]}")
                print(f"   only-duck : {list(dset - sset)[:2]}")
    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES: {[f[0] for f in failures]}'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
