#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables, compare values.

Usage: python3 tools/check.py [sfdir] [outdir]
(Expects Verify to have been run already: outdir/<name>/ parquet dirs +
outdir/oracle_sql.json.)
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return float(v)
    if hasattr(v, "as_py"): v = v.as_py()
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return float(v)
    except Exception: pass
    return v

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_tbl = pq.read_table(files[0])
    try:
        duck = con.sql(oracle[name])
        duck_cols = [c.lower() for c in duck.columns]
        duck_rows = duck.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}"); fails += 1; continue
    s_cols = sorted(spark_tbl.column_names)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); fails += 1; continue
    # sort columns by name (driver behavior), then compare cell values
    s_idx = [spark_tbl.column_names.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    s_rows = [tuple(norm(spark_tbl.column(i)[r].as_py()) for i in s_idx)
              for r in range(spark_tbl.num_rows)]
    d_rows = [tuple(norm(row[i]) for i in d_idx) for row in duck_rows]
    if len(s_rows) != len(d_rows):
        print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}"); fails += 1; continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:")
        print(f"  cols : {s_cols}")
        print(f"  spark: {a}")
        print(f"  duck : {b}")
        fails += 1
    else:
        print(f"OK   {name}: {len(s_rows)} rows")
print(("ALL OK" if fails == 0 else f"{fails} FAILURES"))
sys.exit(1 if fails else 0)
