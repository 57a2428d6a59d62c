"""Driver-parity correctness check: run every __spark_entry__.queries()
entry on a VANILLA SparkSession (exactly like the driver harness — no
get_spark() builder confs) and compare against oracle_sql() via DuckDB,
order-insensitive, columns sorted by name.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter...]
Prints one line per query and a final summary; exit 1 on any failure.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    # Vanilla session, like the driver: no engine builder confs at all.
    spark = (
        SparkSession.builder.appName("correctness_check")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    from drill_spark.session import FIXTURE_TABLES

    for t in FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create or replace view {t} as select * from read_parquet('{p}')")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}

    n_pass = n_rows_only = n_fail = 0
    failures = []
    for name in qs:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            s_cols = [c.lower() for c in df.columns]
            s_rows = [tuple(r) for r in df.collect()]
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        sql = oracles.get(name)
        if sql is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        sm, dm = multiset(s_cols, s_rows), multiset(d_cols, d_rows)
        if len(sm) != len(dm):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(sm)} duck={len(dm)}")
            continue
        bad = [(a, b) for a, b in zip(sm, dm) if a != b]
        if bad:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: value mismatch (first 2): {bad[:2]}")
            continue
        n_pass += 1
        print(f"pass  {name}: {len(sm)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\nSUMMARY: {n_pass} hash-pass, {n_rows_only} rows-only, {n_fail} FAIL"
        + (f" -> {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
