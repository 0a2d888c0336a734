#!/usr/bin/env python3
"""IEEE negative-zero gate (driver-side tooling only; NOT part of the
library). The driver's comparator hashes at the serialization layer,
where -0.0 != 0.0 bitwise — and the two engines DISAGREE on the sign
of a rounded tiny-negative cancellation: DuckDB round() keeps the sign
(-1e-15 -> -0.0) while Spark's round goes through BigDecimal, which
has no signed zero (-1e-15 -> +0.0). Any oracle whose rounded column
can cancel to a tiny negative (forced-zero curve endpoints: qini,
cusum, drawdown ...) is a latent hash-fail waiting for the data draw
that reaches the cancellation — ml_qini fired on the r12 second-seed
gate exactly this way.

This gate replays every oracle in DuckDB over the given tables AND
scans every Verify parquet dump, reporting each (query, column) that
emits a -0.0 anywhere. Fix = append `+ 0.0` to the DuckDB round site
(IEEE: -0.0 + 0.0 = +0.0; a no-op for every other value; the Spark
side never emits -0.0 from round and needs no change).

Usage: check_negzero.py [SF_DIR] [VERIFY_OUT]   (exit 1 on any hit)
"""
import sys, json, glob, math, struct
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def is_negzero(v):
    return isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0

hits = 0
for name in sorted(oracle):
    try:
        rel = con.execute(oracle[name])
        cols = [d[0] for d in rel.description]
        for row in rel.fetchall():
            bad = [cols[i] for i, v in enumerate(row) if is_negzero(v)]
            if bad:
                print(f"[NEGZ ] {name} (duck): {bad}")
                hits += 1
                break
    except Exception as e:
        print(f"[ERR  ] {name}: duckdb: {e}")
        hits += 1

for d in sorted(glob.glob(f"{outdir}/*")):
    if d.endswith(".json"):
        continue
    name = d.split("/")[-1]
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        continue
    rel = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    cols = [x[0] for x in rel.description]
    for row in rel.fetchall():
        bad = [cols[i] for i, v in enumerate(row) if is_negzero(v)]
        if bad:
            print(f"[NEGZ ] {name} (spark): {bad}")
            hits += 1
            break

print(f"{hits} negative-zero emitters" if hits else "ALL OK")
sys.exit(1 if hits else 0)
