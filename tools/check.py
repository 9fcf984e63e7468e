#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs
each SQL in DuckDB over views named after the parquet tables in <sfdir>,
and compares against the Spark result parquet in <verify_out_dir>/<name>.
Comparison: sort columns by name, sort rows by all columns, compare
stringified cell values exactly (mirrors a hash-of-values check).
"""
import decimal
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None:
            return "NULL"
        # Normalize decimals through float repr the way the driver's
        # hash does — '47701734.50' must equal '47701734.5'. (Round-1
        # lesson: str() comparison masked exactly this divergence and
        # local PASS did not predict driver pass.)
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
            got = con.execute(
                f"SELECT * FROM parquet_scan('{outdir}/{name}/*.parquet')").df()
            wc, wr = canon(want)
            gc, gr = canon(got)
            if wc != gc:
                print(f"FAIL {name}: columns {gc} != oracle {wc}")
                n_fail += 1
            elif wr != gr:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(wr + [None]*len(gr), gr + [None]*len(wr))) if a != b)
                print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}; first diff @{diff[0]}:\n  spark={diff[2]}\n  duck ={diff[1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
