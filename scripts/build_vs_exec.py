"""Split per-query cost into DataFrame BUILD (driver-side plan
construction, guide §5) vs EXECUTION (count action, the bench's
methodology). Steady-state: each query is built+run once untimed
first, so one-time fixture materialization and codegen are excluded.

Usage: python scripts/build_vs_exec.py [substr ...]   (no args = all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    subs = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from drill_spark.session import get_spark

    spark = get_spark("build_vs_exec", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sorted(
        k for k in qs if not subs or any(s in k for s in subs))

    rows = []
    for name in names:
        try:
            qs[name](spark, sf_dir).count()  # warm, untimed
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            rows.append((name, t1 - t0, t2 - t1))
        except Exception as e:
            print(f"ERR {name}: {e}", file=sys.stderr)
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':42s} {'build':>7s} {'exec':>7s}")
    for name, b, x in rows:
        print(f"{name:42s} {b:7.3f} {x:7.3f}")
    print(f"{'TOTAL':42s} {sum(r[1] for r in rows):7.3f} "
          f"{sum(r[2] for r in rows):7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
