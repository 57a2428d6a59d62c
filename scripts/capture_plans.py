"""Capture .explain("formatted") for named queries into plans/r14/.

Usage: python scripts/capture_plans.py [--final] <suffix> <query> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each query (suffix is
"before" / "after"). Uses the same vanilla-ish session as the bench
(get_spark) so plan shapes match what the driver measures.

--final executes the query (noop sink) first and appends the
POST-EXECUTION adaptive plan: with AQE on, exchange/stage reuse and
final join strategies only show up there — the pre-execution explain
prints ``isFinalPlan=false`` with zero ReusedExchange nodes even when
the runtime dedupes every duplicate stage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    final = False
    if args and args[0] == "--final":
        final = True
        args = args[1:]
    suffix = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from drill_spark.session import get_spark

    spark = get_spark("capture_plans", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    rc = 0
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            rc = 1
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            if final:
                spark.sparkContext.setJobDescription(f"plan:{name}")
                df.collect()  # drives THIS QueryExecution to its final plan
                plan += ("\n\n==== POST-EXECUTION FINAL ADAPTIVE PLAN "
                         "(AQE reuse/strategy changes visible) ====\n\n")
                plan += df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # capture the failure itself as evidence
            plan = f"ERROR building/explaining {name}: {e}"
            rc = 1
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
