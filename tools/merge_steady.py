"""Merge several BENCH_local.json runs into a steady per-query record
(min per query across runs — the BENCH_steady.json protocol).

Usage: python tools/merge_steady.py run1.json run2.json ... > BENCH_steady.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    # homogeneity guards (r12 ADVICE): a partial run or a run at another
    # scale factor would silently contaminate the steady mins
    sfs = {r.get("sf") for r in runs}
    assert len(sfs) == 1, f"runs span multiple scale factors: {sorted(sfs)}"
    keysets = [frozenset(r["queries"]) for r in runs]
    if len(set(keysets)) != 1:
        common = frozenset.intersection(*keysets)
        diffs = {
            sys.argv[1 + i]: sorted(ks ^ common)
            for i, ks in enumerate(keysets) if ks != common
        }
        raise AssertionError(f"runs disagree on query sets: {diffs}")
    queries: dict[str, float] = {}
    for r in runs:
        for k, v in r["queries"].items():
            queries[k] = min(queries.get(k, v), v)
    out = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: queries[k] for k in sorted(queries)},
        "sf": runs[0].get("sf"),
        "protocol": f"steady_min_merge_of_{len(runs)}_runs",
        "calibrations": [
            [r.get("calibration_sec"), r.get("calibration_end_sec")] for r in runs
        ],
    }
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
