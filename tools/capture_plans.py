"""Capture .explain("formatted") for declared queries into a directory.

Usage: python tools/capture_plans.py --out plans/r12 --suffix _before \
           [--only name1,name2] [--sf /root/testdata/sf0.01]

Each query's final DataFrame plan is written to <out>/<name><suffix>.txt.
Fixture-building side effects run as usual (the plan of the RETURNED frame is
what the driver executes / the judge audits).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from peerdb_spark import get_spark

    spark = get_spark(
        "capture_plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.only.split(",") if args.only else list(qs)
    os.makedirs(args.out, exist_ok=True)
    failures = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
            failures += 1
        with open(os.path.join(args.out, f"{name}{args.suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
