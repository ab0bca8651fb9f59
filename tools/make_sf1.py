#!/usr/bin/env python3
"""Synthesize an sf1-scale fixture set from sf0.1 (10x duplicate +
key reseed) for local scale rehearsal (SCALE.md "sf1 rehearsal").

Keys of each copy k are offset by k * 1e9 so every cross-table join
key stays consistent (l_orderkey -> o_orderkey, o_custkey ->
c_custkey, ...) and copies never collide. region/nation are genuine
dimensions and are NOT duplicated. Text/embeddings are left byte-
identical across copies ON PURPOSE: 10 exact duplicates of every doc
and vector is the adversarial regime for the dedup/LSH family (hot
buckets, giant components) - exactly what the rehearsal must stress.

Schemas are preserved exactly (pyarrow, parquet 2.6 so events.ts
stays TIMESTAMP(NANOS)).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pathlib import Path

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "target/sf1")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10**9

# table -> columns that carry join keys (offset per copy)
KEYED = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = {"region", "nation"}  # genuine dimensions: never duplicated

DST.mkdir(parents=True, exist_ok=True)
for name, keys in KEYED.items():
    t = pq.read_table(SRC / f"{name}.parquet")
    if name in DIMS:
        out = t
    else:
        copies = []
        for k in range(COPIES):
            c = t
            for col in keys:
                i = c.schema.get_field_index(col)
                shifted = pc.add(c.column(col), pa.scalar(k * OFF,
                                 type=c.schema.field(col).type))
                c = c.set_column(i, c.schema.field(col), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
    # Split into row groups so Spark can parallelize the scan: pyarrow's
    # default single row group made every sf1 documents/events scan a
    # 1-thread serial read (the same lesson make_embsf1.py learned at
    # 500k vectors — a scan that cannot split is a serial program).
    # ~64 groups per table, floor 4096 rows, keeps groups in the
    # few-MB range the harness's maxPartitionBytes slices well.
    rg = max(4096, len(out) // 64)
    pq.write_table(out, DST / f"{name}.parquet", version="2.6",
                   row_group_size=rg)
    print(f"{name}: {len(t)} -> {len(out)} rows (rg={rg})")
