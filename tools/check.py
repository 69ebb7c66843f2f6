#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle (same duckdb the driver uses) and diff.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run.)
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Declared self-verdict manifest for the no-oracle keys (r19 verdict,
# "What's wrong" #1): the generic any-*_ok sweep below is vacuous for a
# key that silently DROPS a verdict column in a refactor — these columns
# are REQUIRED per key, and an absent one fails loudly. Every no-oracle
# key must appear here (r20: all 8 carry in-query integer verdicts).
REQUIRED_OK = {
    "q_bpe_merges": ["merge_ok"],
    "q_embed_dedup_incremental": ["pair_ok", "complete_ok"],
    "q_embed_neardup_bounded": ["pair_ok"],
    "q_semantic_dedup": ["cos_ok", "keeper_ok"],
    "q_semantic_dedup_bounded": ["cos_ok", "keeper_ok"],
    "q_vector_curation": ["dup_cos_ok", "store_ok"],
    "q_unified_curation": ["dup_cos_ok", "store_ok", "pack_ok"],
    "q_unified_late": ["dup_cos_ok", "store_ok", "pack_ok"],
}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passes = [], []
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            failures.append((name, "NO SPARK OUTPUT")); continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            failures.append((name, "EMPTY SPARK OUTPUT DIR")); continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            failures.append((name, f"SPARK PARQUET READ: {e}")); continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"ORACLE SQL ERROR: {str(e)[:200]}")); continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            failures.append((name, f"COLS spark={list(got.columns)} oracle={list(want.columns)}")); continue
        dt_mismatch = [f"{c}: spark={got[c].dtype} oracle={want[c].dtype}"
                       for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt_mismatch:
            print(f"DTYPE {name}: " + "; ".join(dt_mismatch))
        if len(got) != len(want):
            failures.append((name, f"ROWS spark={len(got)} oracle={len(want)}")); continue
        # row-order-insensitive compare (driver hashes after sorting)
        gs = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns), kind="mergesort").reset_index(drop=True)
        diffs = []
        for c in got.columns:
            a, b = gs[c], ws[c]
            try:
                import pandas as pd
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c}: {int(neq.sum())} rows differ, first at {i}: spark={a[i]!r} oracle={b[i]!r}")
        if diffs:
            failures.append((name, "; ".join(diffs)[:400]))
        else:
            passes.append((name, len(got)))
    # NO-ORACLE keys (r19): every output dir without an oracle entry is
    # still constrained by its in-query integer self-verdicts — any
    # column named *_ok must be all-1 (and never NULL). This is the
    # q_tokenize_stats treatment for the flow keys DuckDB can't twin:
    # a silently skipped verification / lost store row / packing
    # collision flips the column and fails THIS gate.
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            failures.append((name, "NO-ORACLE KEY: EMPTY OUTPUT DIR")); continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            failures.append((name, f"NO-ORACLE KEY READ: {e}")); continue
        required = REQUIRED_OK.get(name, [])
        missing = [c for c in required if c not in got.columns]
        if name not in REQUIRED_OK:
            failures.append((name, "NO-ORACLE KEY NOT IN REQUIRED_OK "
                             "MANIFEST (tools/check.py) — declare its "
                             "verdict columns")); continue
        if missing:
            failures.append((name, f"SELF-VERDICT COLUMNS MISSING: {missing}"))
            continue
        ok_cols = sorted(set(required) |
                         {c for c in got.columns if c.endswith("_ok")})
        bad = [f"{c}: {int((got[c] != 1).sum() + got[c].isna().sum())} rows != 1"
               for c in ok_cols
               if got[c].isna().any() or (got[c] != 1).any()]
        if bad:
            failures.append((name, "SELF-VERDICT " + "; ".join(bad)[:380]))
        else:
            passes.append((name, len(got)))
    # a no-oracle key whose output dir is MISSING entirely would
    # otherwise vanish from the gate (oracle keys get "NO SPARK OUTPUT";
    # the dir-driven loop above can't see an absent dir)
    seen = {n for n, _ in passes} | {n for n, _ in failures}
    for name in sorted(REQUIRED_OK):
        if name not in seen:
            failures.append((name, "NO-ORACLE KEY: NO OUTPUT DIR"))
    for n, r in passes:
        print(f"PASS {n} ({r} rows)")
    for n, msg in failures:
        print(f"FAIL {n}: {msg}")
    print(f"\n{len(passes)} passed, {len(failures)} failed")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
