"""Local mirror of the driver's correctness gate.

Runs selected `__spark_entry__.queries()` entries on Spark and their
`oracle_sql()` twins on DuckDB over the same parquet dir, then compares
row count, sorted column names, and a value hash (rows sorted, floats
rounded) — the same three checks CORRECTNESS_r{N}.json records.

Usage:
    python tools/oracle_check.py [query ...]        # default: all
    SF_DIR=/root/testdata/sf0.01 python tools/oracle_check.py repetition
"""
from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    wanted = sys.argv[1:]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = E.queries()
    oracles = E.oracle_sql()
    names = wanted or list(queries)
    failed = []
    for name in names:
        if name not in queries:
            print(f"{name}: NO SUCH QUERY")
            failed.append(name)
            continue
        sdf = queries[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (rows-only, no oracle)")
            spark.catalog.clearCache()
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash {sh}/{oh}"
        )
        if status == "FAIL":
            failed.append(name)
        spark.catalog.clearCache()

    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
