"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares against
oracle_sql() via DuckDB: row count, column names, and an order-insensitive
value comparison (exact string repr after column-name sort). Queries with
no oracle get a rows-only smoke run.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    import duckdb

    import __spark_entry__ as e
    from python_etl_rest_api_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, "
                  f"{t_spark:.1f}s)")
            continue
        t1 = time.time()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        t_duck = time.time() - t1
        sc, sr = norm_rows(scols, [tuple(r) for r in srows])
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs: {diffs}")
        else:
            print(f"OK    {name}: {len(sr)} rows "
                  f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
