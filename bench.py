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
    # Warm the JVM on the SMALLEST fixture dir (never the benched one):
    # whole-stage codegen, the Python/Arrow worker pool, and the
    # streaming machinery all pay a first-use compile/startup cost that
    # is not part of steady-state throughput. Warmup is not timed.
    warm_dir = sf_dir
    for cand in ("/root/testdata/sf0.001",):
        if os.path.isdir(cand) and os.path.abspath(cand) != os.path.abspath(sf_dir):
            warm_dir = cand
            break
    for wname in (
        "tpch_q06",            # parquet scan + agg codegen
        "ext_dedup_clusters",  # wide conditional agg + iterative join path
        "ext_ann_ivf",         # higher-order array exprs + window top-k
        "ext_multimodal_features",  # Python/Arrow worker pool spin-up
        "ext_stream_tumbling",  # streaming engine init
    ):
        if wname in qs:
            try:
                qs[wname](spark, warm_dir).count()
            except Exception as e:
                print(f"warmup {wname}: {e}", file=sys.stderr)

    # Two passes, best-of per query: single-shot timings on a shared
    # host swing 2-3x with neighbor load; the min of two runs is a far
    # more stable estimate of steady-state throughput and is applied
    # identically every round, so round-over-round deltas stay honest.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in sorted(qs):
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                df.count()
                elapsed = round(time.time() - t0, 3)
            except Exception as e:  # keep the bench line parseable on failure
                print(f"bench error in {name}: {e}", file=sys.stderr)
                elapsed = -1.0
            prev = timings.get(name)
            if prev is None or (0 <= elapsed < prev) or prev < 0:
                timings[name] = elapsed

    ok = {k: v for k, v in timings.items() if v >= 0}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # format scans build a /tmp fixture on first touch and grow as new
    # formats land — their own group keeps "op" comparable across rounds
    fmt_queries = {
        k for k in ok if k.startswith("op_") and k.endswith("_scan")
    }

    def _group(prefix: str) -> float:
        members = (
            fmt_queries
            if prefix == "fmt"
            else {k for k in ok if k.startswith(prefix)} - fmt_queries
        )
        return round(sum(ok[k] for k in members), 3)

    line = json.dumps(
        {
            "metric": "total_wall_clock_headline_queries",
            "value": round(sum(ok.values()), 3),
            "unit": "sec",
            "queries": timings,
            # family subtotals for round-over-round comparison (r1's
            # recorded total covered only op_/tpch_ — every ext_ entry
            # errored to -1 that round and contributed 0s)
            "groups": {
                "tpch": _group("tpch_"),
                "op": _group("op_"),
                "fmt": _group("fmt"),
                "ext": _group("ext_"),
            },
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
            "n_errored": len(timings) - len(ok),
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
