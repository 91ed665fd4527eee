#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), registers
the sf parquet tables as DuckDB views, runs each oracle SQL, and compares
against the Spark result: schema (sorted column names), row count, and a
hash over values with columns sorted by name (mimicking the driver).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1; continue
        g = got[gcols]; w = want[wcols]
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        grows = [tuple(norm(v) for v in r) for r in g.itertuples(index=False)]
        wrows = [tuple(norm(v) for v in r) for r in w.itertuples(index=False)]
        if grows == wrows:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        elif sorted(grows) == sorted(wrows):
            print(f"WARN {name}: values match only after row sort ({len(g)} rows)"); n_fail += 1
            for i,(a,b) in enumerate(zip(grows, wrows)):
                if a != b: print(f"  first order diff at row {i}:\n   spark={a}\n   duck ={b}"); break
        else:
            print(f"FAIL {name}: value mismatch ({len(g)} rows)"); n_fail += 1
            sg, sw = sorted(grows), sorted(wrows)
            shown = 0
            for a, b in zip(sg, sw):
                if a != b and shown < 3:
                    print(f"   spark={a}\n   duck ={b}"); shown += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
