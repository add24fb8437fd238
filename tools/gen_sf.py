#!/usr/bin/env python3
"""Deterministic scale-up of the driver's testdata for overflow sweeps.

Amplifies a source sf dir by an integer factor: each copy c of a fact
table gets its id column offset by c * (max_id + 1); every other column
is byte-identical. Dims copy through unchanged. The result is a valid
input for graft.Verify + tools/check.py at a scale the driver never
ships (sf1 ~= 10x sf0.1), which is where the int64/double ceilings the
repo documents in docs/SCALE.md would first bite.

--perturb: content-perturbing amplification for the similarity/dedup
regimes. Verbatim x-k copies make every doc/vector k-fold identical
twins — true near-dup pairs grow ~k^2-fold and recall audits degenerate
to tie-breaks, so scaling probes measure the amplifier, not the
operator (OVERFLOW_SWEEP_r9.md). With --perturb, copy 0 stays verbatim
and each copy c >= 1 is deterministically perturbed (numpy PCG64 seeded
by the copy index, so any two runs produce byte-identical output):
  documents  — ~5% token dropout per copy; n_chars recomputed.
  embeddings — i.i.d. uniform(-0.02, 0.02) added per dimension
               (cos to the source ~0.995: a near-dup, not a twin).
events/lineitem/orders keep verbatim amplification — duplicate
payloads with fresh ids are exactly what an event stream re-delivers.

--tpch: also amplify the TPC-H fact/dim tables (lineitem, orders,
customer, supplier, part) with REFERENTIAL INTEGRITY preserved: copy c
offsets each key domain by c * (max_key + 1) consistently across every
table that references it (l_orderkey and o_orderkey move together,
o_custkey and c_custkey together, ...), so each copy is a
self-contained TPC-H universe sharing the fixed nation/region dims and
every join keeps its selectivity. Without the flag these tables copy
through unchanged (the pre-r10 behavior — events/documents/embeddings
scale, TPC-H stays at the source sf).

Usage:
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1p 10 --perturb
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1j 10 --tpch --only lineitem,orders,customer
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/emb500 500 --only embeddings

Copies are streamed to the writer one at a time, so peak memory is one
source-table copy regardless of the factor. Writes only under the
destination dir (never touches the source).
"""
import shutil, sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ID_COLS = {"events": "event_id", "documents": "doc_id", "embeddings": "vec_id"}
ALL = ["region", "nation", "customer", "supplier", "part", "orders",
       "lineitem", "events", "documents", "embeddings"]

# --tpch key topology: table -> [(column, key domain)]; the domain's
# stride comes from the domain-owning table's max key + 1
TPCH_KEYS = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
                 ("l_suppkey", "suppkey")],
}
DOMAIN_OWNER = {"custkey": ("customer", "c_custkey"),
                "orderkey": ("orders", "o_orderkey"),
                "partkey": ("part", "p_partkey"),
                "suppkey": ("supplier", "s_suppkey")}

DROPOUT = 0.05      # token dropout rate per perturbed document copy
EMB_NOISE = 0.02    # uniform(-x, x) per embedding dimension


def perturb_documents(t, c):
    """Copy c >= 1 of the documents table: ~5% token dropout, seeded by
    the copy index so every run regenerates identical bytes."""
    rng = np.random.default_rng(10_000 + c)
    texts = t["text"].to_pylist()
    out = []
    for s in texts:
        toks = s.split(" ")
        keep = rng.random(len(toks)) >= DROPOUT
        kept = [tok for tok, k in zip(toks, keep) if k]
        out.append(" ".join(kept) if kept else toks[0])
    arr = pa.array(out, type=pa.string())
    t = t.set_column(t.schema.get_field_index("text"), "text", arr)
    n_chars = pa.array([len(s) for s in out],
                       type=t.schema.field("n_chars").type)
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n_chars)


def perturb_embeddings(t, c):
    """Copy c >= 1 of the embeddings table: small deterministic uniform
    noise per dimension — near-dups of the source, never twins."""
    rng = np.random.default_rng(20_000 + c)
    col = t["embedding"].combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False)
    noise = rng.uniform(-EMB_NOISE, EMB_NOISE, size=vals.shape)
    new_vals = pa.array((vals + noise).astype(np.float32),
                        type=col.values.type)
    arr = pa.LargeListArray.from_arrays(col.offsets, new_vals) \
        if pa.types.is_large_list(col.type) \
        else pa.ListArray.from_arrays(col.offsets, new_vals)
    return t.set_column(t.schema.get_field_index("embedding"),
                        "embedding", arr.cast(t.schema.field("embedding").type))


PERTURB = {"documents": perturb_documents, "embeddings": perturb_embeddings}


def _copy_writer(dst, table, c, schema):
    """One parquet FILE per copy, inside a `<table>.parquet/` directory.

    A single amplified file starves scan parallelism: the sf1
    documents table compresses to ~6 MB, so Spark's split sizing
    (min(maxPartitionBytes, max(openCost, bytes/cores))) hands the
    whole file to ~2 tasks even though the trigram explode over it
    fans out to ~15 M rows — the c46/c80 sf1 regression the r12 round
    documented as an artifact problem. One file per copy gives the
    scan `factor` natural splits, exactly what a real multi-batch
    ingest would have produced. Spark reads the directory
    transparently; tools/check.py globs it for DuckDB."""
    d = f"{dst}/{table}.parquet"
    import os
    os.makedirs(d, exist_ok=True)
    return pq.ParquetWriter(f"{d}/part-{c:05d}.parquet", schema)


def amplify(src, dst, table, factor, perturb):
    t = pq.read_table(f"{src}/{table}.parquet")
    idc = ID_COLS[table]
    stride = pc.max(t[idc]).as_py() + 1
    for c in range(factor):
        body = t if (c == 0 or not perturb or table not in PERTURB) \
            else PERTURB[table](t, c)
        ids = pc.add(body[idc], pa.scalar(c * stride, type=t.schema.field(idc).type))
        writer = _copy_writer(dst, table, c, t.schema)
        writer.write_table(
            body.set_column(body.schema.get_field_index(idc), idc, ids))
        writer.close()
    tag = " (perturbed)" if perturb and table in PERTURB and factor > 1 else ""
    print(f"  {table}: {t.num_rows} -> {t.num_rows * factor} rows"
          f" in {factor} files{tag}")


def amplify_tpch(src, dst, table, factor, strides):
    t = pq.read_table(f"{src}/{table}.parquet")
    for c in range(factor):
        body = t
        for col, domain in TPCH_KEYS[table]:
            typ = t.schema.field(col).type
            ids = pc.add(body[col], pa.scalar(c * strides[domain], type=typ))
            body = body.set_column(body.schema.get_field_index(col), col, ids)
        writer = _copy_writer(dst, table, c, t.schema)
        writer.write_table(body)
        writer.close()
    print(f"  {table}: {t.num_rows} -> {t.num_rows * factor} rows "
          f"in {factor} files (tpch keys offset)")


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    perturb = "--perturb" in sys.argv
    tpch = "--tpch" in sys.argv
    strides = {}
    if tpch:
        for domain, (owner, col) in DOMAIN_OWNER.items():
            strides[domain] = pc.max(
                pq.read_table(f"{src}/{owner}.parquet", columns=[col])[col]
            ).as_py() + 1
    import os
    os.makedirs(dst, exist_ok=True)
    for t in ALL:
        if only and t not in only:
            continue
        if t in ID_COLS:
            amplify(src, dst, t, factor, perturb)
        elif tpch and t in TPCH_KEYS:
            amplify_tpch(src, dst, t, factor, strides)
        else:
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
            print(f"  {t}: copied")


if __name__ == "__main__":
    main()
