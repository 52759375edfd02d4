#!/usr/bin/env python3
"""Scale a driver-generated sf fixture by an integer factor K.

Usage: python3 tools/make_sf.py <srcDir> <dstDir> <K>

Replicates each non-dim table K times with deterministic key shifts so
every copy joins within itself (join cardinalities scale linearly, as a
true larger sf would). Dims (region, nation) pass through. Text and
embedding copies are RECOMBINED rather than duplicated — a duplicated
corpus would blow the near-dup pair count quadratically inside identity
groups, which a genuinely larger corpus does not do:
  - documents copy k: first half of doc i + second half of doc (i+k)%N
    (≈50% shingle overlap with two originals — below near-dup range)
  - embeddings copy k: a per-copy seeded coordinate permutation with
    sign flips (same norm/distribution, decorrelated direction — a
    ROLL would keep high cosine with the original whenever adjacent
    dimensions are correlated, manufacturing near-dup pairs a real
    larger corpus would not have)

This is a measurement fixture for scaling runs (Bench), not an oracle
fixture: the DuckDB correctness gate stays on the driver-shipped sfs.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def stride(col):
    # key shift per copy: next power of ten above the max (keeps shifted
    # keys readable and collision-free)
    m = int(col.max()) if len(col) else 0
    s = 1
    while s <= m:
        s *= 10
    return s


def scaled(table, keycols, k, strides):
    import pandas as pd
    df = table.to_pandas()
    out = []
    for i in range(k):
        c = df.copy()
        for col in keycols:
            c[col] = c[col] + i * strides[col]
        out.append(c)
    return pd.concat(out, ignore_index=True)


def main():
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    import pandas as pd
    os.makedirs(dst, exist_ok=True)

    tables = {}
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        tables[name] = pq.read_table(f"{src}/{name}.parquet")

    strides = {}
    for name, cols in [("customer", ["c_custkey"]), ("supplier", ["s_suppkey"]),
                       ("part", ["p_partkey"]), ("orders", ["o_orderkey"]),
                       ("events", ["event_id", "user_id"]),
                       ("documents", ["doc_id"]), ("embeddings", ["vec_id"])]:
        df = tables[name].to_pandas()
        for c in cols:
            strides[c] = stride(df[c])
    strides["o_custkey"] = strides["c_custkey"]
    strides["l_orderkey"] = strides["o_orderkey"]
    strides["l_partkey"] = strides["p_partkey"]
    strides["l_suppkey"] = strides["s_suppkey"]

    plan = {
        "region": [], "nation": [],
        "customer": ["c_custkey"], "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"], "embeddings": ["vec_id"],
    }
    for name, keycols in plan.items():
        src_t = tables[name]
        if not keycols:
            df = src_t.to_pandas()
        else:
            df = scaled(src_t, keycols, k, strides)
            n = len(src_t)
            if name == "documents":
                texts = src_t.to_pandas()["text"].tolist()
                halves = [(t[: len(t) // 2], t[len(t) // 2:]) for t in texts]
                mixed = []
                for i in range(k):
                    for j in range(n):
                        mixed.append(halves[j][0] + halves[(j + i) % n][1])
                df["text"] = mixed
                df["n_chars"] = [len(t) for t in mixed]
            if name == "embeddings":
                vecs = [np.asarray(v, dtype=np.float32)
                        for v in src_t.to_pandas()["embedding"]]
                dim = len(vecs[0])
                out_vecs = []
                for i in range(k):
                    if i == 0:
                        out_vecs.extend(v.tolist() for v in vecs)
                        continue
                    rng = np.random.default_rng(42 + i)
                    perm = rng.permutation(dim)
                    signs = rng.choice([-1.0, 1.0], size=dim) \
                        .astype(np.float32)
                    out_vecs.extend((v[perm] * signs).tolist() for v in vecs)
                df["embedding"] = out_vecs
        out = pa.Table.from_pandas(df, schema=src_t.schema,
                                   preserve_index=False)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(name, len(out))


if __name__ == "__main__":
    main()
