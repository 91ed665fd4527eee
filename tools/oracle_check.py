#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), registers
the sf parquet tables as DuckDB views, runs each oracle SQL, and compares
against the Spark result: schema (sorted column names AND Arrow types — the
driver's hash is type-sensitive, e.g. decimal(28,4) vs decimal(38,4) FAILS
there), row count, and ordered values with columns sorted by name.

Both sides go through Arrow (not pandas fetchdf, which coerces decimals to
float64 and hides exactly the class of mismatch that cost 6 queries in r01).

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

def type_key(arrow_type):
    """Driver-comparable type label. STRICTLY EXACT for every type: int64 vs
    int32 or string vs large_string fails even though the values round-trip —
    deliberately stricter than the driver, so any engine-side type drift
    surfaces here first (queries cast to the canonical type explicitly)."""
    return str(arrow_type)

def fresh_con(sf_dir):
    """One connection per query: a big oracle that OOMs must not poison the
    allocator for every query after it (observed at sf1 — the first OOM
    turned the rest of the run into 'failed to allocate 8 bytes' noise),
    and per-query connections also release each query's peak memory."""
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_oracle_spill'")
    # hard cap well under RAM so a big oracle SPILLS to temp instead of
    # being OOM-killed (observed at sf10: the default 80%-of-RAM limit +
    # a concurrent JVM = kernel OOM kill at 102 GB RSS)
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main(sf_dir, out_dir, only=()):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    if only:  # subset gate (e.g. the sf1 heavy-tail run): check just these
        # a mistyped name must FAIL loudly — both intersection filters would
        # otherwise drop it silently and the gate could print a green
        # "0 fail" total having checked nothing (round-7 ADVICE)
        all_dumped = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                      if os.path.isdir(d)}
        for name in sorted(set(only) - (set(oracle) | all_dumped)):
            print(f"FAIL {name}: name in subset matches no oracle entry and no dumped result")
            n_fail += 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            con = fresh_con(sf_dir)
            try:
                got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
                want = con.execute(oracle[name]).fetch_arrow_table()
            finally:
                con.close()  # close on the failure path too (round-8 ADVICE)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1; continue
        gtypes = {c: type_key(got.schema.field(c).type) for c in gcols}
        wtypes = {c: type_key(want.schema.field(c).type) for c in wcols}
        tdiff = {c: (gtypes[c], wtypes[c]) for c in gcols if gtypes[c] != wtypes[c]}
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}"); n_fail += 1; continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {want.num_rows}"); n_fail += 1; continue
        try:
            g = got.select(gcols); w = want.select(wcols)
            grows = [tuple(norm(v) for v in r.values()) for r in g.to_pylist()]
            wrows = [tuple(norm(v) for v in r.values()) for r in w.to_pylist()]
        except Exception as e:  # e.g. duplicate column names make select ambiguous
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
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
                if a != b:
                    print(f"   spark={a}\n   duck ={b}"); shown += 1
                    if shown >= 3: break
    # coverage: a Spark dump with NO oracle entry would otherwise be
    # silently skipped and the gate would print a green total for an
    # unvalidated query (the CLAUDE.md every-query-needs-an-oracle rule)
    dumped = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    if only:
        dumped &= set(only)
    for name in sorted(dumped - set(oracle)):
        print(f"FAIL {name}: spark result has no oracle entry"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
