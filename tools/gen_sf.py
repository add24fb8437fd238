#!/usr/bin/env python3
"""Deterministic scale-up of the driver's testdata for overflow sweeps.

Amplifies a source sf dir by an integer factor: each copy c of a fact
table gets its id column offset by c * (max_id + 1); every other column
is byte-identical. Dims copy through unchanged. The result is a valid
input for graft.Verify + tools/check.py at a scale the driver never
ships (sf1 ≈ 10x sf0.1), which is where the int64/double ceilings the
repo documents in docs/SCALE.md would first bite.

Usage:
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/emb500 500 --only embeddings

Writes only under the destination dir (never touches the source).
"""
import shutil, sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ID_COLS = {"events": "event_id", "documents": "doc_id", "embeddings": "vec_id"}
ALL = ["region", "nation", "customer", "supplier", "part", "orders",
       "lineitem", "events", "documents", "embeddings"]


def amplify(src, dst, table, factor):
    t = pq.read_table(f"{src}/{table}.parquet")
    idc = ID_COLS[table]
    stride = pc.max(t[idc]).as_py() + 1
    copies = []
    for c in range(factor):
        ids = pc.add(t[idc], pa.scalar(c * stride, type=t.schema.field(idc).type))
        copies.append(t.set_column(t.schema.get_field_index(idc), idc, ids))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{table}.parquet")
    print(f"  {table}: {t.num_rows} -> {out.num_rows} rows")


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    import os
    os.makedirs(dst, exist_ok=True)
    for t in ALL:
        if only and t not in only:
            continue
        if t in ID_COLS:
            amplify(src, dst, t, factor)
        else:
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
            print(f"  {t}: copied")


if __name__ == "__main__":
    main()
