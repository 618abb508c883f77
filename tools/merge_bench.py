#!/usr/bin/env python3
"""Standing-protocol merge: per-query median across N cold-JVM Bench runs
(each run's per-query value is already an in-run median-of-3), summed into
the standing total. Reproduces the committed bench_out.json artifact:

    python3 tools/merge_bench.py bench_full_run1.json bench_full_run2.json \
        bench_full_run3.json > bench_out.json

Fails hard (exit 2, no output) when the runs disagree on the query set or
any run carries an error row: a silently-shrunken query set would deflate
the standing total that compare_baseline.py judges against BASELINE.md.
Pass --allow-partial to merge anyway; the dropped queries then travel in
an explicit "excluded" field so the total is never quietly smaller, and
the exit code is 3 (merged-but-partial) so automation can still tell a
clean merge (0) from a partial one without parsing the artifact.
"""
import json
import statistics
import sys


def main(paths):
    allow_partial = "--allow-partial" in paths
    paths = [p for p in paths if p != "--allow-partial"]
    if not paths:
        print("usage: merge_bench.py [--allow-partial] run1.json "
              "[run2.json ...] > bench_out.json", file=sys.stderr)
        return 2
    runs = [json.load(open(p)) for p in paths]
    qsets = [set(r["queries"]) for r in runs]
    common = set.intersection(*qsets)
    union = set.union(*qsets)
    disagree = sorted(union - common)
    errs = sorted({q for r in runs for q, v in r["queries"].items()
                   if not isinstance(v, (int, float))})
    excluded = sorted(set(disagree) | set(errs))
    if excluded:
        why = []
        if disagree:
            why.append(f"runs disagree on query set: {disagree}")
        if errs:
            why.append(f"error rows present: {errs}")
        if not allow_partial:
            for w in why:
                print(f"ERROR: {w}", file=sys.stderr)
            print("ERROR: refusing to emit a silently-smaller total; "
                  "re-run the failed bench or pass --allow-partial "
                  "(excluded queries are then recorded in the artifact)",
                  file=sys.stderr)
            return 2
        for w in why:
            print(f"WARN: {w} (merged with --allow-partial; "
                  "see 'excluded' field)", file=sys.stderr)
        partial = True
    else:
        partial = False
    med = {q: statistics.median(r["queries"][q] for r in runs)
           for q in sorted(common)
           if all(isinstance(r["queries"][q], (int, float)) for r in runs)}
    # noise carries through as the per-query MEDIAN of the runs' window
    # ratios — aligned with the value median: one contended run out of
    # three is discarded by both medians, two or more contaminate both,
    # so a flagged merged row means its merged value is actually suspect.
    noise = {}
    if all("noise" in r for r in runs):
        noise = {q: statistics.median(r["noise"][q] for r in runs)
                 for q in med if all(q in r["noise"] for r in runs)}
    sentinels = [r["sentinel"] for r in runs if "sentinel" in r]
    out = {
        "metric": "total",
        "value": sum(med.values()),
        "unit": "sec",
        "reps": len(runs),
        "protocol": f"median-of-{len(runs)}",
        "queries": med,
        "errors": len(errs),
        "excluded": excluded,
        "sf": runs[0].get("sf", ""),
    }
    if noise:
        out["noise"] = noise
    if sentinels:
        out["sentinel"] = {
            "floors": [s["floor"] for s in sentinels],
            "maxes": [s["max"] for s in sentinels],
            "noisy_windows": [s["noisy_windows"] for s in sentinels],
        }
    json.dump(out, sys.stdout)
    print()
    # distinct nonzero exit for a merged-but-partial artifact (r15
    # advisory): --allow-partial used to exit 0, so automation keying on
    # the exit code could mistake a merge with dropped/error rows for a
    # clean one. 0 = clean, 2 = refused (no output), 3 = merged partial.
    return 3 if partial else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
