#!/usr/bin/env python3
"""Scale a test-data dir by integer factor with referential integrity.

Usage: gen_scale.py <srcDir> <dstDir> <factor>

Construction (dev tooling only — the library never reads this script):
- region/nation are TPC-H dimensions and stay fixed.
- Fact/dim keys shift by copy * (max_key + 1), consistently across
  referencing tables (customer.c_custkey and orders.o_custkey shift by
  the same stride), so joins at sfN have exactly N x the sf matches.
- Timestamps, text and categorical columns are copied verbatim —
  events.ts keeps its TIMESTAMP(NANOS) physical type (SparkEntry.prep
  reads it via nanosAsLong).
- documents are copied verbatim: each doc gains factor-1 exact
  duplicates, which stress-exercises the dedup family at scale.
- embeddings are dimension-rolled per copy (np.roll by copy positions):
  rolled vectors are uncorrelated with their originals, so the scaled
  corpus has no near-identical vectors — keeping the closed-form
  assumptions of the seeded ANN oracles (a perturbed twin's 1-NN is its
  base) valid at every factor. A +eps perturbation instead would make
  each copy its twin's nearest neighbor and break them.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])

KEYS = {}  # table -> {col: stride_key}


def stride(table, col):
    t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
    return pc.max(t.column(col)).as_py() + 1


strides = {
    "cust": stride("customer", "c_custkey"),
    "ord": stride("orders", "o_orderkey"),
    "part": stride("part", "p_partkey"),
    "supp": stride("supplier", "s_suppkey"),
    "evt": stride("events", "event_id"),
    "user": stride("events", "user_id"),
    "doc": stride("documents", "doc_id"),
    "vec": stride("embeddings", "vec_id"),
}

SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

import os
os.makedirs(dst, exist_ok=True)

for t in ["region", "nation"]:
    pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
    print(f"{t}: copied fixed dimension")

for t, shifts in SHIFTS.items():
    base = pq.read_table(f"{src}/{t}.parquet")
    copies = []
    for i in range(factor):
        cols = []
        for name in base.column_names:
            col = base.column(name)
            if name in shifts and i > 0:
                col = pc.add(col, i * strides[shifts[name]]).cast(col.type)
            if t == "embeddings" and name == "embedding" and i > 0:
                combined = col.combine_chunks()
                vals = np.array(combined.values.to_numpy(zero_copy_only=False),
                                dtype=np.float32, copy=True)
                dim = len(combined[0])
                vals = np.roll(vals.reshape(-1, dim), i, axis=1).reshape(-1)
                col = pa.chunked_array([pa.ListArray.from_arrays(
                    combined.offsets, pa.array(vals, type=pa.float32()))]).cast(col.type)
            cols.append(col)
        copies.append(pa.table(cols, schema=base.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{t}.parquet")
    print(f"{t}: {base.num_rows} -> {out.num_rows}")
