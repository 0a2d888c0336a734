#!/usr/bin/env python3
"""Oracle output-type parity gate (driver-side tooling only; NOT part of the
library). The driver's comparator hashes values at the arrow/serialization
level, so an oracle column typed HUGEINT (e.g. from DuckDB sum()/
list_aggregate over integer expressions) hash-mismatches a Spark BIGINT even
when every value is equal. This tool makes that failure class structurally
visible: for every oracle query it compares the DuckDB result type of each
output column against the DuckDB-mapped type of the Spark parquet dump for
the same query, and fails on any divergence outside a small equivalence set.

Usage: check_oracle_types.py [sfdir] [verify_outdir] [--subset]
Requires a prior `graft.Verify` run (parquet dumps + oracle_sql.json).
--subset: fast-iteration mode (Verify dumped only touched queries) —
missing dumps are reported but do NOT fail the gate; in full mode a
MISS is a failure (a query that crashed in Verify goes missing).
"""
import sys, json, glob, re
import duckdb

subset = "--subset" in sys.argv
argv = [a for a in sys.argv if a != "--subset"]
sfdir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
outdir = argv[2] if len(argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm_type(t):
    """Collapse type aliases the driver's comparator treats as identical.
    Spark parquet timestamps read back as TIMESTAMP WITH TIME ZONE (Spark
    writes isAdjustedToUTC=true); DuckDB oracle timestamps are naive
    TIMESTAMP — both serialize as epoch micros, so they are equivalent.
    Everything else (HUGEINT, DECIMAL, INTEGER vs BIGINT, FLOAT vs DOUBLE)
    is a real divergence and must be reported."""
    t = str(t).upper()
    if t == "TIMESTAMP WITH TIME ZONE":
        return "TIMESTAMP"
    return t

fails = 0
miss = 0
checked = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"[MISS ] {name}: no spark output to compare types against")
        miss += 1
        continue
    sp = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    sp_types = dict(zip(sp.columns, [norm_type(x) for x in sp.types]))
    try:
        du = con.sql(oracle[name])
    except Exception as e:
        print(f"[ERR  ] {name}: duckdb: {e}")
        fails += 1
        continue
    du_types = dict(zip(du.columns, [norm_type(x) for x in du.types]))
    if sorted(sp_types) != sorted(du_types):
        print(f"[SCHEM] {name}: spark cols {sorted(sp_types)} != duck {sorted(du_types)}")
        fails += 1
        continue
    bad = {c: (sp_types[c], du_types[c]) for c in sp_types
           if sp_types[c] != du_types[c]}
    if bad:
        for c, (s, d) in sorted(bad.items()):
            print(f"[TYPE ] {name}.{c}: spark={s} duck={d}")
        fails += 1
        continue
    checked += 1
print(f"{checked} oracles type-parity OK; {fails} failures; "
      f"{miss} missing dumps ({'ignored: --subset' if subset else 'failures'})")
sys.exit(1 if fails or (miss and not subset) else 0)
