#!/usr/bin/env python3
"""Build the frozen per-query median artifact (BENCH_MEDIANS_r{N}.json)
from N full Bench logs — the regression reference the 1.5x-in-ALL-runs
rule reads next round.

Usage:
  python3 tools/bench_medians_json.py OUT.json "protocol text" HEAD run1.log run2.log [...]

Reads the {"query":...,"sec":...} lines of each log (sbt "[info] "
prefixes tolerated). Writes {protocol, head, totals, total_median,
n_queries, queries:{name:{runs,median}}} — the exact shape of
BENCH_MEDIANS_r15.json.
"""
import json
import statistics
import sys


def per_query(path):
    vals = {}
    with open(path) as f:
        for line in f:
            i = line.find("{")
            if i < 0:
                continue
            try:
                obj = json.loads(line[i:].strip())
            except json.JSONDecodeError:
                continue
            if "query" in obj and "sec" in obj:
                vals[obj["query"]] = float(obj["sec"])
    return vals


def main(out, protocol, head, paths):
    runs = [per_query(p) for p in paths]
    for p, r in zip(paths, runs):
        if not r:
            raise SystemExit(f"no per-query lines parsed from {p}")
    names = sorted(set().union(*[set(r) for r in runs]))
    queries = {}
    for n in names:
        xs = [round(r[n], 3) for r in runs if n in r]
        queries[n] = {"runs": xs, "median": round(statistics.median(xs), 3)}
    totals = [round(sum(r.values()), 2) for r in runs]
    art = {
        "protocol": protocol,
        "head": head,
        "totals": totals,
        "total_median": round(statistics.median(totals), 2),
        "n_queries": len(names),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(names)} queries, totals {totals}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:])
