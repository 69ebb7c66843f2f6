#!/usr/bin/env python3
"""Rounding-boundary audit, corrected per the round-9 verdict (#2): for
every ROUND-producing oracle column — INCLUDING the integer-basis-point
keys — measure the distance of the PRE-ROUND operand x 10^d to the nearest
x.5 rounding boundary. Auditing the final integer column (as the round-9
table did for q_domain_mix) is vacuous: an integer is trivially 0.5 from
any boundary, which is exactly how a genuinely flippable key passed that
audit twice.

A key is engine-proof on one of two arguments, and the table must say which:
  A. bit-identical operand — both engines compute the same IEEE operation
     chain on the same inputs (sqrt is REQUIRED correctly rounded by IEEE
     754, unlike pow; a single multiply/divide of exact integers is one
     correctly-rounded operation). Distance is then irrelevant but recorded.
  B. margin — operands may differ by ~ulp between engines, so the measured
     boundary distance must dwarf the ulp (>= 1e-8 grains here).

Float-output ROUND(_,4) keys were audited correctly in round 9 (class B,
worst margin 2.8e-8 at 1e-4 grain); this tool re-checks the three integer-bp
keys whose operands that audit never measured.

Usage: python3 tools/audit_round.py [sfdir ...]   (default: sf0.001 sf0.01)
"""
import sys, math
import duckdb

SF_DIRS = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# the exact pre-round operand of every CAST(ROUND(x) AS BIGINT) in the
# oracle map, in its full CTE context (kept in lockstep with
# CurationQueries.sql / ExtQueries.sql — update together)
OPERANDS = {
    "q_domain_mix (w_i = ROUND(sqrt(n_tokens)*1e6))": r"""
      WITH t AS (SELECT source, CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY source)
      SELECT sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 AS op FROM t""",
}

# q_funnel_rates / q_retention_rates: rather than duplicating their long
# CTE chains here (drift risk), strip the ROUND wrapper from the REAL
# oracle SQL mechanically and read the now-unrounded bp column.
def strip_round_bigint(sql: str) -> str:
    out = sql
    while True:
        i = out.find("CAST(ROUND(")
        if i < 0:
            return out
        j = i + len("CAST(ROUND(")
        depth, k = 1, j
        while depth:
            if out[k] == "(":
                depth += 1
            elif out[k] == ")":
                depth -= 1
            k += 1
        inner = out[j : k - 1]
        depth, m = 1, k  # continue to CAST's closing paren
        while depth:
            if out[m] == "(":
                depth += 1
            elif out[m] == ")":
                depth -= 1
            m += 1
        out = out[:i] + "(" + inner + ")" + out[m:]


def boundary_dist(values):
    ds = [abs(v - (math.floor(v) + 0.5)) for v in values if v is not None]
    return min(ds) if ds else float("nan")


def main():
    import json, subprocess, re
    # pull the real oracle SQL out of the latest verify dump if present,
    # else out of the Scala source via a crude string scan
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for sf in SF_DIRS:
        con = duckdb.connect()
        for t in tables:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        print(f"== {sf}")
        # 1. q_domain_mix operand (class A: sqrt is IEEE-correctly-rounded,
        #    *1e6 is one more correctly-rounded op — bit-identical JVM/C)
        ops = [r[0] for r in con.execute(
            OPERANDS["q_domain_mix (w_i = ROUND(sqrt(n_tokens)*1e6))"]).fetchall()]
        print(f"  q_domain_mix   w_i operand: min boundary dist = {boundary_dist(ops):.6g}  (class A: bit-identical)")
        # cross-check the class-A claim empirically: DuckDB sqrt vs Python
        # (C lib) sqrt, bit-for-bit over the actual token counts
        toks = [r[0] for r in con.execute(
            r"""WITH t AS (SELECT CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n
                FROM documents GROUP BY source) SELECT n FROM t""").fetchall()]
        for n in toks:
            db = con.execute(f"SELECT sqrt(CAST({n} AS DOUBLE))").fetchone()[0]
            assert db == math.sqrt(float(n)), f"sqrt bit mismatch at {n}"
        print(f"  q_domain_mix   sqrt bit-identity: {len(toks)}/{len(toks)} values bit-equal DuckDB vs libm")
        # 2/3. funnel + retention: strip ROUND from the real oracle SQL
        src = open("src/main/scala/graft/queries/ExtQueries.scala").read()
        for key, col_name in [("q_funnel_rates", "conv_bp"),
                              ("q_retention_rates", "retention_bp")]:
            # anchor on the SQL-map entry (body starts with a triple-quoted
            # string), not the queries-map lambda for the same key
            m = re.search(rf'"{key}" ->\s*\((""".*?""")\),\n', src, re.S)
            sql = "".join(re.findall(r'"""(.*?)"""', m.group(1), re.S))
            rows = con.execute(strip_round_bigint(sql)).fetchdf()
            d = boundary_dist(rows[col_name].dropna().tolist())
            print(f"  {key:<14} {col_name} operand: min boundary dist = {d:.6g}  (class A: one IEEE division of exact ints)")
        con.close()


if __name__ == "__main__":
    main()
