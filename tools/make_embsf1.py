#!/usr/bin/env python3
"""Synthesize a LARGE DISTINCT embedding fixture (default 500k x 64)
for the s-family scale rehearsal (SCALE.md): unlike make_sf1.py's
byte-identical duplication (the dup-adversarial regime), this corpus
stresses the DISTINCT-vector paths - LSH bucket balance, IVF cell
balance, coded-table size - at three orders of magnitude above the
oracle fixtures.

Structure: ~90% base vectors (seeded Gaussian, unit-ish scale), ~8%
near-duplicates (a base vector + small perturbation - LSH must catch
most), ~2% exact duplicates (collapse path). label = coarse source id
(0..4) so filtered/bitext queries have sides. Schema matches
/root/testdata/sf*/embeddings.parquet exactly.

Usage: python3 tools/make_embsf1.py [n] [dst]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pathlib import Path

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/embsf1")
DIM = 64
rng = np.random.default_rng(42)

n_base = int(N * 0.90)
n_near = int(N * 0.08)
n_exact = N - n_base - n_near

base = rng.standard_normal((n_base, DIM), dtype=np.float32)
# near-dups: perturb random base rows by ~5% relative noise
src_near = rng.integers(0, n_base, n_near)
near = base[src_near] + 0.05 * rng.standard_normal((n_near, DIM), dtype=np.float32)
# exact dups: verbatim copies
src_exact = rng.integers(0, n_base, n_exact)
exact = base[src_exact].copy()

emb = np.concatenate([base, near, exact]).astype(np.float32)
perm = rng.permutation(N)
emb = emb[perm]
vec_id = np.arange(N, dtype=np.int64)
label = (vec_id % 5).astype(np.int32)

DST.mkdir(parents=True, exist_ok=True)
tab = pa.table({
    "vec_id": pa.array(vec_id, pa.int64()),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(emb.reshape(-1), pa.float32()), DIM).cast(pa.list_(pa.float32())),
    "label": pa.array(label, pa.int32()),
})
# row_group_size matters: pyarrow's default writes ONE giant row group,
# and Spark can only parallelize a parquet SPLIT that contains a row-group
# start — the round-11 rehearsal ran every pre-shuffle stage as a single
# task (31 of 32 executor threads parked) until this was set. 16k rows
# ≈ 4 MB per group ≈ the maxPartitionBytes the harness scans with.
pq.write_table(tab, DST / "embeddings.parquet", row_group_size=16384)
print(f"wrote {N} x {DIM} vectors -> {DST}/embeddings.parquet "
      f"({n_base} base / {n_near} near / {n_exact} exact)")
