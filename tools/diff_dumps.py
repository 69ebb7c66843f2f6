#!/usr/bin/env python3
"""Row-exact diff of two graft.Verify output dirs (refactor guard).

Usage: python3 tools/diff_dumps.py BEFORE_DIR AFTER_DIR [key ...]

For each key (default: every subdir of BEFORE), loads both parquet
results with DuckDB, sorts columns by name and rows by all columns, and
compares. Prints one line per differing key; exits non-zero if any
differ. NaN-safe (IS NOT DISTINCT FROM via EXCEPT ALL both ways).
"""
import os
import sys

import duckdb


def main(before, after, keys):
    if not keys:
        keys = sorted(d for d in os.listdir(before)
                      if os.path.isdir(os.path.join(before, d)))
    con = duckdb.connect()
    bad = []
    for k in keys:
        b = os.path.join(before, k, "*.parquet")
        a = os.path.join(after, k, "*.parquet")
        if not os.path.isdir(os.path.join(after, k)):
            bad.append((k, "missing in after"))
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{b}')").fetchall()]
        cols_a = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{a}')").fetchall()]
        if sorted(cols) != sorted(cols_a):
            bad.append((k, f"schema {sorted(cols)} vs {sorted(cols_a)}"))
            continue
        sel = ", ".join(f'"{c}"' for c in sorted(cols))
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT {sel} FROM read_parquet('{b}') "
            f"EXCEPT ALL SELECT {sel} FROM read_parquet('{a}'))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT {sel} FROM read_parquet('{a}') "
            f"EXCEPT ALL SELECT {sel} FROM read_parquet('{b}'))").fetchone()[0]
        if d1 or d2:
            bad.append((k, f"{d1} rows only-before, {d2} only-after"))
    for k, why in bad:
        print(f"DIFF {k}: {why}")
    print(f"{len(keys) - len(bad)}/{len(keys)} identical")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
