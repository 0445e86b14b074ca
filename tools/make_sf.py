#!/usr/bin/env python
"""Deterministic scale-up of a testdata sf directory (pyarrow only).

    python tools/make_sf.py --src /root/testdata/sf0.1 --dst /tmp/sf1 --factor 10

Replicates every fact table ``factor``x with key-space widening so the
scaled data keeps the SAME statistical shape instead of degenerate
duplication:

- all bigint entity keys shift by ``i * 10^9`` per replica, consistently
  across tables (orders.o_custkey moves with customer.c_custkey, lineitem
  moves with orders/part/supplier), so joins have identical selectivity;
- tiny dimensions (region, nation) are NOT replicated — exactly how a
  bigger TPC-H keeps its dims;
- documents: every WORD gets a per-replica suffix (``w`` → ``w~3``), so
  replica shingle sets are disjoint — duplicate/near-duplicate structure
  is preserved WITHIN each replica (if A≈B then A_i≈B_i) and no phantom
  cross-replica near-dups appear; n_chars is recomputed;
- embeddings: vectors rotate left by ``i`` positions (norm-preserving,
  deterministic) so no replica vector is an exact duplicate.

Used for the sf1 scale-evidence runs (correctness + bench at 10x the
driver's largest sf). Deterministic: same input → byte-identical rows.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFFSET = 1_000_000_000

# bigint key columns to shift per replica, per table
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]  # copied, not replicated


def _replica(table: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return table
    cols = {}
    for col in table.column_names:
        arr = table[col]
        if col in SHIFT.get(name, []):
            arr = pa.chunked_array(
                [pa.compute.add(c, i * KEY_OFFSET) for c in arr.chunks]
            )
        cols[col] = arr
    t = pa.table(cols)
    if name == "documents":
        texts = t["text"].to_pylist()
        suffixed = [
            " ".join(f"{w}~{i}" for w in (s or "").split(" ")) for s in texts
        ]
        t = t.set_column(
            t.column_names.index("text"), "text", pa.array(suffixed, pa.string())
        )
        t = t.set_column(
            t.column_names.index("n_chars"),
            "n_chars",
            pa.array([len(s) for s in suffixed], pa.int64()),
        )
    if name == "embeddings":
        vecs = t["embedding"].to_pylist()
        rolled = [
            np.roll(np.asarray(v, dtype=np.float32), -i).tolist() for v in vecs
        ]
        t = t.set_column(
            t.column_names.index("embedding"),
            "embedding",
            pa.array(rolled, pa.list_(pa.float32())),
        )
    return t


def scale_dir(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        table = pq.read_table(os.path.join(src, fname))
        if name in DIMS or factor == 1:
            out = table
        else:
            out = pa.concat_tables(
                [_replica(table, name, i) for i in range(factor)]
            )
        pq.write_table(
            out,
            os.path.join(dst, fname),
            row_group_size=256 * 1024,
            compression="snappy",
        )
        print(f"{name}: {table.num_rows} -> {out.num_rows}")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--dst", required=True)
    p.add_argument("--factor", type=int, default=10)
    args = p.parse_args()
    scale_dir(args.src, args.dst, args.factor)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
