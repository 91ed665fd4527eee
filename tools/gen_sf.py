#!/usr/bin/env python3
"""Builder-side scale-up generator for the one-decade-up gate (round-7
verdict #7). Emits an sfN-shaped table set (same schemas, 10x sf0.1 row
counts at scale=1.0) into an OUT dir, mimicking the driver testdata's
distributions: word-soup documents with near-dup/exact-dup structure over
the SAME vocabulary as the real sf0.1 corpus, 64-dim labeled embeddings,
a 30-day event stream, and the TPC-H-ish star schema. Deterministic
(seed 42). This is builder tooling, not engine code — the engine under
test never imports it.

Usage: python3 tools/gen_sf.py <outDir> [scale=1.0]
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

SEED = 42
SF01 = "/root/testdata/sf0.1"


def write(out, name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"[gen] {name}: {table.num_rows} rows")


def gen_documents(out, rng, n_docs):
    # reuse the REAL corpus vocabulary so text operators see the same
    # token distribution family
    vocab = [r[0] for r in duckdb.sql(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM parquet_scan('{SF01}/documents.parquet')").fetchall()
        if r[0]]
    vocab = sorted(vocab)
    langs = np.array(["en", "de", "zh", "fr", "es"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    texts, lang_col, src_col = [], [], []
    n_words = rng.integers(8, 90, size=n_docs)
    base_ids = []
    for i in range(n_docs):
        r = rng.random()
        if i > 20 and r < 0.035:      # near-dup: copy an earlier doc, mutate 1-3 tokens
            j = int(rng.integers(0, i))
            toks = texts[j].split(" ")
            for _ in range(int(rng.integers(1, 4))):
                toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(toks))
        elif i > 20 and r < 0.045:    # exact dup
            texts.append(texts[int(rng.integers(0, i))])
        else:
            idx = rng.integers(0, len(vocab), size=int(n_words[i]))
            texts.append(" ".join(vocab[k] for k in idx))
        base_ids.append(i)
        lang_col.append(str(langs[rng.choice(5, p=lang_p)]))
        src_col.append(f"src{i % 20}")
    return pa.table({
        "doc_id": pa.array(base_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
        "source": pa.array(src_col, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng, n_vecs, dim=64, labels=10):
    lab = rng.integers(0, labels, size=n_vecs)
    centers = rng.normal(0, 1.0, size=(labels, dim))
    vecs = centers[lab] * 0.6 + rng.normal(0, 1.0, size=(n_vecs, dim))
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(lab.astype(np.int32), pa.int32()),
    })


def gen_events(rng, n_ev, n_users):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1000000 - 1, "us")
    ts = base + (rng.random(n_ev) * span.astype(np.int64)).astype("timedelta64[us]")
    ts.sort()
    types = np.array(["view", "click", "signup", "purchase", "error"])
    et = types[rng.integers(0, 5, size=n_ev)]
    value = np.round(rng.random(n_ev) * 100.0, 2)
    value = np.where(et == "purchase", np.round(value * 5.6, 2), value)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n_ev)]
    return pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, size=n_ev), pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def gen_star(out, rng, scale):
    n_orders = int(1500000 * scale)
    n_cust = int(150000 * scale)
    n_supp = int(10000 * scale)
    n_part = int(200000 * scale)
    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.random(n_cust) * 11000 - 1000, 2), pa.float64()),
        "c_mktsegment": pa.array(np.array(["BUILDING", "AUTOMOBILE", "MACHINERY",
                                           "HOUSEHOLD", "FURNITURE"])[rng.integers(0, 5, n_cust)]),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.random(n_supp) * 10000, 2), pa.float64()),
    }))
    adjs = ["large", "hot", "blue", "small", "dim", "cold", "red", "green"]
    nouns = ["ring", "bolt", "case", "drum", "gear", "pin", "disk", "tube"]
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD",
                                     "PROMO"])[rng.integers(0, 5, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + np.arange(n_part) * 0.1, 2), pa.float64()),
    }))
    odate = (np.datetime64("1995-01-01", "us")
             + (rng.random(n_orders) * (2404 * 86400e6)).astype("timedelta64[us]"))
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(np.round(1000 + rng.random(n_orders) * 499000, 2), pa.float64()),
        "o_orderdate": pa.array(odate),
        "o_orderpriority": pa.array(np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                                              "5-LOW"])[rng.integers(0, 5, n_orders)]),
    }))
    lines = rng.integers(1, 8, size=n_orders)
    okey = np.repeat(np.arange(n_orders), lines)
    n_li = len(okey)
    lno = np.concatenate([np.arange(1, l + 1) for l in lines])
    sdate = np.repeat(odate, lines) + (rng.random(n_li) * 95 * 86400e6).astype("timedelta64[us]")
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lno.astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(900 + rng.random(n_li) * 104100, 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2), pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate),
    }))


def main(out, scale=1.0):
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    write(out, "documents", gen_documents(out, rng, int(50000 * scale)))
    write(out, "embeddings", gen_embeddings(rng, int(20000 * scale)))
    write(out, "events", gen_events(rng, int(1000000 * scale), int(15000 * scale)))
    gen_star(out, rng, scale)


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
