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


def spark_canon(dt) -> str:
    """Canonical type name for a Spark DataType (driver hash is type-aware:
    DuckDB SUM(BIGINT)->HUGEINT vs Spark long must be caught here)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "i64"
    if isinstance(dt, T.IntegerType):
        return "i32"
    if isinstance(dt, (T.ShortType, T.ByteType)):
        return "i32"
    if isinstance(dt, T.DoubleType):
        return "f64"
    if isinstance(dt, T.FloatType):
        return "f32"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.DecimalType):
        return f"dec({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_canon(dt.elementType)}>"
    if isinstance(dt, T.BinaryType):
        return "bin"
    return dt.simpleString()


def arrow_canon(t) -> str:
    """Canonical type name for an Arrow type (DuckDB result)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "i64"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "i32"
    if pa.types.is_decimal(t):
        # DuckDB HUGEINT surfaces as decimal128(38,0) — NOT i64
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or str(t) == "string_view"):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_canon(t.value_type)}>"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    return str(t)


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
        otab = con.execute(oracles[name]).arrow()
        ocols = otab.schema.names
        otypes = {f.name: arrow_canon(f.type) for f in otab.schema}
        orows = [tuple(r.values()) for r in otab.to_pylist()]
        t_duck = time.time() - t0

        stypes = {f.name: spark_canon(f.dataType) for f in sdf.schema.fields}
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        ok = True
        if sc != oc:
            ok = False
            print(f"FAIL {name}: columns spark={sc} duck={oc}")
        elif stypes != otypes:
            ok = False
            bad = {c: (stypes.get(c), otypes.get(c))
                   for c in set(stypes) | set(otypes)
                   if stypes.get(c) != otypes.get(c)}
            print(f"FAIL {name}: column TYPES differ (spark, duck): {bad}")
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
