#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir,
compare row count, sorted column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    body = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return names, body


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from validatelite_spark.session import get_spark
    spark = get_spark("oracle-check", cpus=8)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{spark_t:.1f}s]")
            continue
        t0 = time.time()
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        duck_t = time.time() - t0
        sn, sb = frame_signature(scols, srows)
        dn, db = frame_signature(dcols, drows)
        if sn != dn:
            print(f"FAIL  {name}: columns differ spark={sn} duck={dn}")
            failures += 1
        elif len(sb) != len(db):
            print(f"FAIL  {name}: rowcount spark={len(sb)} duck={len(db)}")
            failures += 1
        elif sb != db:
            diff = [i for i, (a, b) in enumerate(zip(sb, db)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted idx {diff}")
            for i in diff[:2]:
                print(f"      spark: {sb[i]}")
                print(f"      duck : {db[i]}")
            failures += 1
        else:
            print(f"ok    {name}: {len(sb)} rows "
                  f"[spark {spark_t:.1f}s, duck {duck_t:.1f}s]")
    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
