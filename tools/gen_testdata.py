#!/usr/bin/env python3
"""Second-seed testdata generator (driver-side tooling only; NOT part
of the library).

Rebuilds the driver's synthetic star schema (TESTDATA.md — region
nation customer supplier part orders lineitem events documents
embeddings) from scratch with a caller-chosen seed and scale factor,
writing parquet files that are schema-identical (names, arrow physical
types, list element naming) to /root/testdata/sf*. Purpose: the
round-12 "second-seed oracle gate" — every CORRECTNESS pass to date is
conditioned on the driver's single seed-42 draw, and the SURVEY §8.0 r11-ledger
rational-round triage explicitly leans on "the fixed data misses the
boundary" for some classified non-exposures. Re-running the full
graft.Verify + check_oracle.py sweep on an independent draw (and a
different sf) structurally kills the passes-by-data-luck class the
same way check_oracle_types.py killed the type-parity class.

The distributions mirror the seed-42 profile (measured via DuckDB:
vocabulary sets, value ranges, per-order line counts, exponential
event values, unit-norm clustered embeddings) but every draw is fresh,
so ties, round-boundaries, quantile cut points, LIMIT tie-breaks and
empty-group edges all land elsewhere.

Usage: gen_testdata.py OUTDIR [--seed 43] [--sf 0.01]
"""
import argparse, json, math, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

p = argparse.ArgumentParser()
p.add_argument("outdir")
p.add_argument("--seed", type=int, default=43)
p.add_argument("--sf", type=float, default=0.01)
a = p.parse_args()
rng = np.random.default_rng(a.seed)
os.makedirs(a.outdir, exist_ok=True)

sf = a.sf
N_CUST = max(150, int(150000 * sf))
N_SUPP = max(10, int(10000 * sf))
N_PART = max(200, int(200000 * sf))
N_ORD = max(1500, int(1500000 * sf))
N_LINE_TARGET = max(6000, int(6000000 * sf))
N_EVT = max(1000, int(1000000 * sf))
N_USERS = max(15, int(15000 * sf))
N_DOC = max(500, int(50000 * sf))
N_EMB = max(500, int(20000 * sf))

DAY_US = 86400 * 1000000
EPOCH_1995 = 9131 * DAY_US  # 1995-01-01 is day 9131
EPOCH_2024 = 19723 * DAY_US  # 2024-01-01 is day 19723

def write(name, cols, schema):
    t = pa.table(cols, schema=schema)
    pq.write_table(t, f"{a.outdir}/{name}.parquet")
    print(f"  {name}: {t.num_rows} rows")

def ts_us(arr):
    return pa.array(np.asarray(arr, dtype="int64"), pa.timestamp("us"))

def money(lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)

# --- region / nation (fixed dimension shells, same as seed-42) -----
write("region",
      {"r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
       "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
      pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
write("nation",
      {"n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
       "n_name": [f"NATION_{i}" for i in range(25)],
       "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5)},
      pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                 ("n_regionkey", pa.int32())]))

# --- customer / supplier -------------------------------------------
SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer",
      {"c_custkey": pa.array(np.arange(N_CUST, dtype=np.int64)),
       "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
       "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32)),
       "c_acctbal": money(-999.99, 9999.99, N_CUST),
       "c_mktsegment": [SEGS[i] for i in rng.integers(0, 5, N_CUST)]},
      pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                 ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                 ("c_mktsegment", pa.string())]))
write("supplier",
      {"s_suppkey": pa.array(np.arange(N_SUPP, dtype=np.int64)),
       "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
       "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32)),
       "s_acctbal": money(-999.99, 9999.99, N_SUPP)},
      pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                 ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

# --- part -----------------------------------------------------------
ADJ = ["small", "large", "red", "blue", "hot", "cold", "shiny", "dim"]
NOUN = ["ring", "widget", "bolt", "anvil", "gear", "gizmo", "plate", "rod"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
adj_i = rng.integers(0, 8, N_PART); noun_i = rng.integers(0, 8, N_PART)
write("part",
      {"p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
       "p_name": [f"{ADJ[x]} {NOUN[y]}" for x, y in zip(adj_i, noun_i)],
       "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, N_PART)],
       "p_type": [TYPES[i] for i in rng.integers(0, 6, N_PART)],
       "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
       # seed-42 grid: 900.0..999.9 in tenths
       "p_retailprice": np.round(900.0 + rng.integers(0, 1000, N_PART) / 10.0, 1)},
      pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                 ("p_brand", pa.string()), ("p_type", pa.string()),
                 ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

# --- orders ---------------------------------------------------------
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUS = ["P", "F", "O"]
order_days = rng.integers(0, 2405, N_ORD)  # 1995-01-01 .. 2001-08-01
write("orders",
      {"o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
       "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD).astype(np.int64)),
       "o_orderstatus": [STATUS[i] for i in rng.integers(0, 3, N_ORD)],
       "o_totalprice": money(1000.0, 500000.0, N_ORD),
       "o_orderdate": ts_us(EPOCH_1995 + order_days * DAY_US),
       "o_orderpriority": [PRIO[i] for i in rng.integers(0, 5, N_ORD)]},
      pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                 ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                 ("o_orderdate", pa.timestamp("us")),
                 ("o_orderpriority", pa.string())]))

# --- lineitem (1..13 lines per order, ~4 avg, rows shuffled) --------
per_order = np.clip(1 + rng.poisson(3.0, N_ORD), 1, 13)
# trim to roughly the target without breaking the 1..13 contract
lo = np.repeat(np.arange(N_ORD, dtype=np.int64), per_order)
n_li = lo.size
linenum = np.concatenate([np.arange(1, k + 1, dtype=np.int32)
                          for k in per_order])
perm = rng.permutation(n_li)
ship_days = rng.integers(1, 2500, n_li)  # independent of orderdate (seed-42)
write("lineitem",
      {"l_orderkey": pa.array(lo[perm]),
       "l_partkey": pa.array(rng.integers(0, N_PART, n_li).astype(np.int64)),
       "l_suppkey": pa.array(rng.integers(0, N_SUPP, n_li).astype(np.int64)),
       "l_linenumber": pa.array(linenum[perm]),
       "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
       "l_extendedprice": money(900.0, 105000.0, n_li),
       "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
       "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
       "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, n_li)],
       "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, n_li)],
       "l_shipdate": ts_us(EPOCH_1995 + ship_days * DAY_US)},
      pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                 ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                 ("l_quantity", pa.float64()),
                 ("l_extendedprice", pa.float64()),
                 ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                 ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                 ("l_shipdate", pa.timestamp("us"))]))

# --- events (ts sorted by event_id, 30 days, exp-ish values) --------
ETYPES = ["click", "view", "purchase", "signup", "error"]
span_us = 30 * DAY_US
ts = np.sort(rng.integers(0, span_us, N_EVT)) + EPOCH_2024
write("events",
      {"event_id": pa.array(np.arange(N_EVT, dtype=np.int64)),
       "ts": ts_us(ts),
       "user_id": pa.array(rng.integers(0, N_USERS, N_EVT).astype(np.int64)),
       "event_type": [ETYPES[i] for i in rng.integers(0, 5, N_EVT)],
       "value": np.maximum(0.01, np.round(rng.exponential(50.0, N_EVT), 2)),
       "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EVT)]},
      pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                 ("user_id", pa.int64()), ("event_type", pa.string()),
                 ("value", pa.float64()), ("props", pa.string())]))

# --- documents (31-word shared vocab, 10..99 words) -----------------
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = np.array([0.44, 0.14, 0.15, 0.13, 0.14]); LANG_W /= LANG_W.sum()
texts, langs, srcs = [], [], []
for _ in range(N_DOC):
    nw = int(rng.integers(10, 100))
    texts.append(" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), nw)))
    langs.append(LANGS[rng.choice(5, p=LANG_W)])
    srcs.append(f"src{int(rng.integers(0, 20))}")
# plant near-duplicates like the seed-42 profile (~24 near-dup pairs at
# sf0.01: shared long n-grams, 1-3 word perturbations) so the dedup /
# sketch surfaces (dd_*, mm_phash, dd_cdc_chunks) see non-empty
# candidate sets on the alternate draw too
n_near = max(10, N_DOC // 50)
for tgt in rng.choice(np.arange(N_DOC // 2, N_DOC), n_near, replace=False):
    src_doc = int(rng.integers(0, N_DOC // 2))
    words = texts[src_doc].split(" ")
    for _ in range(int(rng.integers(1, 4))):
        words[int(rng.integers(0, len(words)))] = \
            VOCAB[int(rng.integers(0, len(VOCAB)))]
    texts[int(tgt)] = " ".join(words)
write("documents",
      {"doc_id": pa.array(np.arange(N_DOC, dtype=np.int64)),
       "text": texts, "lang": langs, "source": srcs,
       "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64))},
      pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]))

# --- embeddings (64-dim unit-norm, 10 label clusters) ---------------
DIM = 64
cent = rng.normal(0, 1, (10, DIM))
cent /= np.linalg.norm(cent, axis=1, keepdims=True)
labels = rng.integers(0, 10, N_EMB)
vecs = cent[labels] + rng.normal(0, 0.35, (N_EMB, DIM))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
vecs = vecs.astype(np.float32)
emb_type = pa.list_(pa.field("element", pa.float32()))
write("embeddings",
      {"vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
       "embedding": pa.array([v for v in vecs.tolist()], emb_type),
       "label": pa.array(labels.astype(np.int32))},
      pa.schema([("vec_id", pa.int64()), ("embedding", emb_type),
                 ("label", pa.int32())]))
print(f"wrote {a.outdir} (seed={a.seed}, sf={sf})")
