"""Local replica of the driver's correctness gate: run every queries() entry
via Spark AND its oracle_sql() via DuckDB on the same parquet tables, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):7d} spark={t_spark:6.1f}s  (no oracle — rows-only)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = time.time() - t0

        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        ok = True
        if sc != oc:
            ok = False
            print(f"FAIL {name}: columns spark={sc} duck={oc}")
        elif len(sr) != len(orr):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(orr)}")
        elif sr != orr:
            ok = False
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:5]
            print(f"FAIL {name}: values differ; first diffs:")
            for a, b in diffs:
                print(f"   spark={a}\n   duck ={b}")
        if ok:
            print(f"  {name:28s} rows={len(sr):7d} spark={t_spark:6.1f}s duck={t_duck:5.1f}s OK")
        else:
            failures.append(name)
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
