#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (driver-side tooling only;
NOT part of the library). Runs DuckDB on oracle_sql.json over the same parquet
tables and compares against Verify's parquet dumps: row count, column names,
and value-sorted row hash (doubles compared exactly — both sides round)."""
import sys, json, glob, math
import duckdb

# --subset: fast-iteration mode (Verify dumped only touched queries) —
# missing dumps don't fail; in full mode a MISS is a crashed query.
subset = "--subset" in sys.argv
argv = [a for a in sys.argv if a != "--subset"]
sfdir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
outdir = argv[2] if len(argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    return repr(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

fails = 0
names = sorted(set(list(oracle) + [g.split("/")[-1] for g in glob.glob(f"{outdir}/*") if not g.endswith(".json")]))
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"[MISS ] {name}: no spark output")
        if not subset: fails += 1
        continue
    sp_rel = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    sp_cols = [d[0] for d in sp_rel.description]; sp_rows = sp_rel.fetchall()
    if name not in oracle:
        print(f"[rows ] {name}: {len(sp_rows)} rows (no oracle)"); continue
    try:
        du_rel = con.execute(oracle[name])
        du_cols = [d[0] for d in du_rel.description]; du_rows = du_rel.fetchall()
    except Exception as e:
        print(f"[ERR  ] {name}: duckdb: {e}"); fails += 1; continue
    if sorted(sp_cols) != sorted(du_cols):
        print(f"[SCHEM] {name}: spark={sorted(sp_cols)} duck={sorted(du_cols)}"); fails += 1; continue
    if canon(sp_rows, sp_cols) != canon(du_rows, du_cols):
        print(f"[HASH ] {name}: spark {len(sp_rows)} rows != duck {len(du_rows)} rows")
        a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
        for x, y in list(zip(a, b))[:5]:
            if x != y: print(f"    spark={x}\n    duck ={y}")
        fails += 1; continue
    print(f"[OK   ] {name}: {len(sp_rows)} rows")
print("FAIL" if fails else "ALL OK")
sys.exit(1 if fails else 0)
