#!/usr/bin/env python3
"""Merge N bench runs into one honest artifact.

Usage: merge_bench.py out.json run1.json [run2.json ...]

Every per-query entry and every total carries {runs, min, median}: the
min is the contention-free number cross-round comparisons want, the
median shows how far ambient noise sits from it, and the run count makes
min-of-N comparable across rounds (the r17 adjudication found a 14-run
min being compared against a 5-run min and read as a regression).
Only canary-valid runs should be passed in; the tool records per-run
validity verbatim when present.
"""
import json
import statistics
import sys


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    # incomparable inputs poison the min: refuse mixed scales outright
    # and refuse canary-invalid runs (the exact comparability bug the
    # r17 adjudication traced — pass only valid runs of ONE scale)
    sfs = {r.get("sf") for r in runs}
    assert len(sfs) == 1, f"runs span multiple scale factors: {sfs}"
    invalid = [p for p, r in zip(run_paths, runs)
               if r.get("canary", {}).get("valid") is False]
    assert not invalid, f"canary-invalid runs passed in: {invalid}"
    per_query: dict[str, list[float]] = {}
    totals: list[float] = []
    for r in runs:
        totals.append(r["total"])
        for q, sec in r["queries"].items():
            per_query.setdefault(q, []).append(sec)
    merged = {
        "runs": len(runs),
        "run_files": run_paths,
        "run_valid": [r.get("canary", {}).get("valid") for r in runs],
        "total": {
            "runs": len(totals),
            "min": min(totals),
            "median": statistics.median(totals),
        },
        "queries": {
            q: {
                "runs": len(v),
                "min": min(v),
                "median": statistics.median(v),
            }
            for q, v in sorted(per_query.items())
        },
        "sf": runs[0].get("sf"),
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {len(runs)} runs -> {out_path} "
          f"(total min {merged['total']['min']:.2f}s "
          f"median {merged['total']['median']:.2f}s)")


if __name__ == "__main__":
    main()
