#!/usr/bin/env python3
"""Merge N bench logs into a per-query median table (BASELINE.md r8 pin).

Usage: python3 tools/bench_median.py run1.log [run2.log ...]

Reads the {"query":...,"sec":...} per-query lines of each log (falling
back to {"recap":{...}} lines when a log only has the recap), prints a
markdown table of per-run seconds + median, sorted by median descending,
plus totals. The regression rule this table exists for: a query regresses
when it exceeds 1.5x its frozen median in ALL runs of a later round
(single-run excursions are container stalls — the documented failure mode
of this box).
"""
import json
import statistics
import sys


def per_query(path):
    vals = {}
    recap = {}
    with open(path) as f:
        for line in f:
            # sbt prefixes stdout with "[info] " — slice from the first brace
            i = line.find("{")
            if i < 0:
                continue
            line = line[i:].strip()
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "query" in obj and "sec" in obj:
                vals[obj["query"]] = float(obj["sec"])
            elif "recap" in obj:
                recap.update({k: float(v) for k, v in obj["recap"].items()})
    return vals or recap


def main(paths):
    runs = [per_query(p) for p in paths]
    names = sorted(set().union(*[set(r) for r in runs]))
    rows = []
    for n in names:
        xs = [r[n] for r in runs if n in r]
        rows.append((n, xs, statistics.median(xs)))
    rows.sort(key=lambda t: -t[2])
    hdr = " | ".join(f"run{i+1}" for i in range(len(runs)))
    print(f"| query | {hdr} | median |")
    print("|---|" + "---|" * (len(runs) + 1))
    for n, xs, med in rows:
        cells = " | ".join(f"{x:.3f}" for x in xs)
        print(f"| {n} | {cells} | {med:.3f} |")
    tot = " | ".join(f"{sum(r.values()):.1f}" for r in runs)
    med_tot = statistics.median([sum(r.values()) for r in runs])
    print(f"| **total** | {tot} | **{med_tot:.1f}** |")


if __name__ == "__main__":
    main(sys.argv[1:])
