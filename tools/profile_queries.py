"""Per-query profiling harness for the optimization rounds (guide §1).

Times each declared query in isolation with the noop sink (so the sink
never pollutes the measurement), labels jobs for the UI, and captures
``explain("formatted")`` for the plan ledger under ``plans/<tag>/``.

Usage:
  python tools/profile_queries.py [--tag r06_before] [--reps 2] \
      [--sf-dir /root/testdata/sf0.1] [--explain-only] [query ...]

Prints one JSON line: {"queries": {name: [walls...]}, "sf_dir": ...}.
This is a measurement tool only — bench.py remains the frozen metric.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plans/<tag>/<query><suffix>.txt explain capture")
    ap.add_argument("--suffix", default="", help="filename suffix, e.g. _before/_after")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from semstreams_spark.session import get_spark

    spark = get_spark("profile_queries", cores=args.cores, shuffle_partitions=args.cores)
    qs = entry.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    plan_dir = None
    if args.tag:
        plan_dir = os.path.join(REPO, "plans", *args.tag.split("/"))
        os.makedirs(plan_dir, exist_ok=True)

    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(1 if args.explain_only else args.reps):
        for n in names:
            if rep == 0 and plan_dir is not None:
                # plan capture OUTSIDE the timed window (construction of
                # iterative queries runs actions; the timed rep below
                # re-constructs so its wall matches bench.py's protocol)
                df = qs[n](spark, args.sf_dir)
                p = os.path.join(plan_dir, f"{n}{args.suffix}.txt")
                with open(p, "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
                spark.catalog.clearCache()
            if args.explain_only:
                continue
            spark.sparkContext.setJobDescription(f"profile:{n}")
            t0 = time.monotonic()
            qs[n](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            walls[n].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        gc.collect()

    print(json.dumps({
        "queries": walls,
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
