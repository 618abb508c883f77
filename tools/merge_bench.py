#!/usr/bin/env python3
"""Standing-protocol merge: per-query median across N cold-JVM Bench runs
(each run's per-query value is already an in-run median-of-3), summed into
the standing total. Reproduces the committed bench_out.json artifact:

    python3 tools/merge_bench.py bench_full_run1.json bench_full_run2.json \
        bench_full_run3.json > bench_out.json
"""
import json
import statistics
import sys


def main(paths):
    runs = [json.load(open(p)) for p in paths]
    qsets = [set(r["queries"]) for r in runs]
    common = set.intersection(*qsets)
    union = set.union(*qsets)
    if common != union:
        print(f"WARN: runs disagree on query set: {sorted(union - common)}",
              file=sys.stderr)
    errs = sorted(q for r in runs for q, v in r["queries"].items()
                  if not isinstance(v, (int, float)))
    if errs:
        print(f"ERROR rows present: {errs}", file=sys.stderr)
    med = {q: statistics.median(r["queries"][q] for r in runs)
           for q in sorted(common)
           if all(isinstance(r["queries"][q], (int, float)) for r in runs)}
    out = {
        "metric": "total",
        "value": sum(med.values()),
        "unit": "sec",
        "reps": len(runs),
        "protocol": f"median-of-{len(runs)}",
        "queries": med,
        "errors": len(errs),
        "sf": runs[0].get("sf", ""),
    }
    json.dump(out, sys.stdout)
    print()
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
