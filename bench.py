"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints EXACTLY ONE line on stdout — the JSON result:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
Everything else (Spark/JVM chatter, progress, per-query errors) goes to
stderr, and the same JSON is also written to bench_result.json next to
this file, so the driver's parse can never be polluted.

value = total wall-clock seconds over the headline query set (each
query executed to completion via a count-collecting action; results
not materialized on the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # Hard stdout hygiene: anything the JVM/py4j/libraries print during the
    # run is shunted to stderr; only the final JSON line touches real stdout.
    real_stdout = sys.stdout
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from drill_spark.session import get_spark

    spark = get_spark("drill_spark_bench", cores=cpus)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm the JVM + parquet footers with one tiny action
    qs["tpch_q06"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench line parseable on failure
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "total_wall_clock_headline_queries",
            "value": round(sum(ok.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
            "cpus": cpus,
        }
    )
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"), "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"bench_result.json not written: {e}", file=sys.stderr)
    print(line, file=real_stdout)
    real_stdout.flush()


if __name__ == "__main__":
    main()
