#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables, compare values.

Faithful to the driver's compare (the r2 lesson): both sides go through
pandas, columns sorted by name, rows sorted by all columns, and the
comparison is DTYPE-KIND-SENSITIVE — DuckDB HUGEINT surfaces as float64
(or object) while Spark writes int64, and the driver's hash treats those
as different even when the values are numerically equal. int32 vs int64
is fine (driver's b4 row_number matched in r2); int vs float is not.
Container-typed cells (list/ndarray/dict) crash the driver's row sort —
we report them as failures instead of silently passing.

Usage: python3 tools/check.py [sfdir] [outdir]
(Expects Verify to have been run already: outdir/<name>/ parquet dirs +
outdir/oracle_sql.json.)
"""
import os, sys, glob, json, math

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
# spill instead of bad_alloc on the quadratic oracles (the c65b
# brute-force mirror at sf1 allocates tens of GB of intermediates)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET max_temp_directory_size='100GB'")
# an explicit budget: the default (80% of RAM) OOMs with a hard
# "failed to allocate" instead of spilling when the OS page cache or a
# concurrent Spark JVM holds the rest of the machine (seen twice at
# sf1: the c65b compare passed solo, failed under contention).
# Derived from physical RAM (min(40GB, half of total), env-overridable)
# so a smaller host never gets a budget ABOVE DuckDB's own default —
# a hardcoded 40GB on a 32GB box would raise the ceiling and trade
# spilling for an OS OOM-kill.
_gb = min(40, max(1, (os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE"))
                  // (2 * 1024**3)))
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', f'{_gb}GB')}'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # amplified probe datasets (tools/gen_sf.py) write one file per
    # copy inside a <table>.parquet/ directory; DuckDB needs the glob
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional name filter for re-running a single heavy compare
if len(sys.argv) > 3:
    keep = set(sys.argv[3].split(","))
    unknown = sorted(keep - set(oracle))
    if unknown:  # a typo'd name must not produce a silent green run
        sys.exit(f"unknown query name(s) in filter: {unknown}")
    oracle = {k: v for k, v in oracle.items() if k in keep}


def kind(dtype):
    """Collapse a pandas dtype to the kind the driver's hash is sensitive
    to: i (any int width), f (float), b (bool), O (string/object), M (ts)."""
    k = dtype.kind
    return "i" if k in ("i", "u") else k


def load_spark(name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pq.read_table(files).to_pandas()


def cells_unsortable(df):
    """Columns whose cells are containers — these crash the driver."""
    bad = []
    for c in df.columns:
        if df[c].dtype.kind == "O" and len(df) > 0:
            v = df[c].iloc[0]
            if isinstance(v, (list, dict, np.ndarray)):
                bad.append(c)
    return bad


fails = 0
for name in sorted(oracle):
    s_df = load_spark(name)
    if s_df is None:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        d_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
        fails += 1; continue
    d_df.columns = [c.lower() for c in d_df.columns]
    s_cols, d_cols = sorted(s_df.columns), sorted(d_df.columns)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
        fails += 1; continue
    s_df, d_df = s_df[s_cols], d_df[d_cols]

    bad_cells = cells_unsortable(s_df) + cells_unsortable(d_df)
    if bad_cells:
        print(f"FAIL {name}: container-typed cells crash the driver: "
              f"{sorted(set(bad_cells))}")
        fails += 1; continue

    # dtype-kind compare (the r2 blind spot: HUGEINT -> float64 vs int64)
    kind_bad = [(c, s_df[c].dtype, d_df[c].dtype) for c in s_cols
                if kind(s_df[c].dtype) != kind(d_df[c].dtype)]
    if kind_bad:
        c, sk, dk = kind_bad[0]
        print(f"FAIL {name}: dtype kind differs on '{c}': "
              f"spark={sk} duck={dk} (+{len(kind_bad) - 1} more)"
              if len(kind_bad) > 1 else
              f"FAIL {name}: dtype kind differs on '{c}': spark={sk} duck={dk}")
        fails += 1; continue

    if len(s_df) != len(d_df):
        print(f"FAIL {name}: rows spark={len(s_df)} duck={len(d_df)}")
        fails += 1; continue

    s_df = s_df.sort_values(s_cols).reset_index(drop=True)
    d_df = d_df.sort_values(d_cols).reset_index(drop=True)
    bad_rows = []
    for c in s_cols:
        a, b = s_df[c], d_df[c]
        if kind(a.dtype) == "f" or kind(b.dtype) == "f":
            eq = (a.isna() & b.isna()) | (a == b) | \
                 (np.isclose(a.fillna(np.nan), b.fillna(np.nan),
                             rtol=0, atol=0, equal_nan=True))
        else:
            eq = (a.isna() & b.isna()) | (a == b)
        if not bool(eq.all()):
            i = int((~eq).idxmax())
            bad_rows.append((c, i, a.iloc[i], b.iloc[i]))
    if bad_rows:
        c, i, av, bv = bad_rows[0]
        print(f"FAIL {name}: values differ in '{c}' at row {i}: "
              f"spark={av!r} duck={bv!r} ({len(bad_rows)} col(s) affected)")
        fails += 1
    else:
        print(f"OK   {name}: {len(s_df)} rows")
print(("ALL OK" if fails == 0 else f"{fails} FAILURES"))
sys.exit(1 if fails else 0)
