"""Min-merge several bench runs into a steady-state record.

Round-10 finding (SCALING.md): on this shared host, the CPU calibration
stays flat while individual queries hit multi-second DISK stalls in
random 5-10 minute windows — different queries spike in every run, and
the in-run confirmed-best protocol (<= 4 runs) cannot always outwait a
stall that spans all four attempts. The honest steady-state number for a
query is therefore the MIN across independent full runs; this tool
merges N bench stdout captures (or BENCH_local.json files) into
BENCH_steady.json with per-run calibrations preserved as provenance.

Usage: python tools/bench_merge.py out.json run1.json run2.out ...
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> dict:
    if path.endswith(".json"):
        d = json.load(open(path))
    else:  # stdout capture: the LAST json line is the contract record
        lines = [ln for ln in open(path) if ln.startswith("{")]
        d = json.loads(lines[-1])
    return d


def main() -> None:
    out_path, *ins = sys.argv[1:]
    runs = [load_queries(p) for p in ins]
    keys = set()
    for r in runs:
        keys |= set(r["queries"])
    merged = {
        k: min(r["queries"][k] for r in runs if k in r["queries"])
        for k in sorted(keys)
    }
    rec = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "queries": merged,
        "sf": runs[0].get("sf"),
        "protocol": f"min_over_{len(runs)}_full_runs_of_warm_best_confirmed",
        "runs": [
            {
                "source": p,
                "total": r.get("value"),
                "calibration_sec": r.get("calibration_sec"),
                "calibration_end_sec": r.get("calibration_end_sec"),
            }
            for p, r in zip(ins, runs)
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"total": rec["value"], "n": len(merged)}))


if __name__ == "__main__":
    main()
