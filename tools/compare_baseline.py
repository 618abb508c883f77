#!/usr/bin/env python3
"""Compare a merged bench artifact against BASELINE.md's standing rows.

Standing row = the LAST occurrence of each query in BASELINE.md's
"| name | value | sec | 0.1 |" tables (later re-bases supersede earlier
rows). Over budget = measured > 2x the standing row (the judge's weak
threshold).

    python3 tools/compare_baseline.py bench_out.json [BASELINE.md]
"""
import json
import re
import sys


def standing_rows(path):
    rows = {}
    pat = re.compile(
        r"^\|\s*([A-Za-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*sec\s*\|\s*0\.1\s*\|")
    for line in open(path):
        m = pat.match(line)
        if m and m.group(1) != "total":
            rows[m.group(1)] = float(m.group(2))  # last occurrence wins
    return rows


def main(bench_path=None, baseline_path="BASELINE.md"):
    if bench_path is None:
        print("usage: compare_baseline.py bench_out.json [BASELINE.md]",
              file=sys.stderr)
        return 2
    bench = json.load(open(bench_path))["queries"]
    base = standing_rows(baseline_path)
    # a standing value of 0 would divide-by-zero below AND means the
    # baseline row is nonsense (no query runs in 0.00s at sf0.1)
    zeros = sorted(q for q, v in base.items() if v <= 0)
    if zeros:
        print(f"ERROR: standing rows with non-positive values: {zeros} "
              f"— fix {baseline_path}", file=sys.stderr)
        return 2
    both = sorted(set(bench) & set(base))
    missing = sorted(set(bench) - set(base))
    if not both:
        print(f"ERROR: no overlap between {bench_path} ({len(bench)} "
              f"queries) and {baseline_path} ({len(base)} standing rows) "
              "— wrong file, or the baseline table format drifted",
              file=sys.stderr)
        return 2
    total_b = sum(bench[q] for q in both)
    total_s = sum(base[q] for q in both)
    over = [(q, bench[q], base[q], bench[q] / base[q])
            for q in both if bench[q] > 2 * base[q]]
    over.sort(key=lambda r: -r[3])
    for q, b, s, r in over:
        print(f"OVER  {q}: {b:.2f}s vs standing {s:.2f}s = {r:.2f}x")
    worst = max(((q, bench[q] / base[q]) for q in both), key=lambda x: x[1])
    print(f"\n{len(both)} rows compared: sum {total_b:.1f}s vs standing "
          f"{total_s:.1f}s = {total_b / total_s:.2f}x; "
          f"{len(over)} over 2x budget; worst {worst[0]} {worst[1]:.2f}x")
    if missing:
        print(f"no standing row yet (new queries): {missing}")
    return 0


if __name__ == "__main__":
    # error, don't slice: a typo'd third argument (e.g. a misspelled
    # baseline path pushed to position 3 by a stray flag) must not be
    # silently dropped while the default BASELINE.md is compared instead
    if len(sys.argv) > 3:
        print("usage: compare_baseline.py bench_out.json [BASELINE.md]"
              f" — unexpected extra arguments: {sys.argv[3:]}",
              file=sys.stderr)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:3]))
