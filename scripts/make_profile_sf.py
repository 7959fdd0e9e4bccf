#!/usr/bin/env python
"""Build a larger profiling dataset by replicating /root/testdata/sf0.1.

The driver's round-end measurement runs at a larger, driver-generated
scale factor (BENCH_r05.json records sf=1.0), but the sandbox only
ships sf<=0.1. For optimization work we need a local dataset of that
magnitude so per-query times are compute- rather than overhead-
dominated. This script replicates sf0.1 R times (default 10 ~ sf1.0)
with per-replica key offsets so join keys stay consistent and
cardinalities grow linearly, and with per-replica perturbations that
keep the *workload shape* linear:

- documents.text gets a per-replica Caesar substitution over letters
  (identity for replica 0), so each replica's shingle space is
  isomorphic to the original but essentially disjoint across replicas:
  near-dup pair counts grow ~linearly instead of exploding with exact
  cross-replica duplicates.
- embeddings get a per-replica circular shift of vector components
  (norm- and intra-replica-distance-preserving; cross-replica cosines
  decorrelate).

Profiling data only — bench.py numbers for the record still come from
$SPARK_GRAFT_SF_DIR; the driver uses its own generator. Never used by
any query path.
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_prof/sf1r"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> per-replica offset (chosen >> max key at sf0.1)
OFFSETS = {
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# dimension tables replicated once, unchanged
DIMS = {"nation.parquet", "region.parquet"}


def caesar_table(r: int) -> dict[int, str]:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    m = {}
    for s in (lower, upper):
        for i, ch in enumerate(s):
            m[ord(ch)] = s[(i + r) % 26]
    return m


def replicate(name: str) -> None:
    t = pq.read_table(os.path.join(SRC, name))
    if name in DIMS:
        pq.write_table(t, os.path.join(DST, name))
        print(f"{name}: dim copied ({t.num_rows} rows)")
        return
    parts = []
    for r in range(R):
        cols = {}
        for c in t.schema.names:
            col = t.column(c)
            if c in OFFSETS and r > 0:
                col = pc.add(col, OFFSETS[c] * r)
            elif name == "documents.parquet" and c == "text" and r > 0:
                tbl = caesar_table(r)
                col = pa.array(
                    [s.translate(tbl) if s is not None else None
                     for s in col.to_pylist()],
                    type=pa.string(),
                )
            elif name == "embeddings.parquet" and c == "embedding" and r > 0:
                vecs = [np.roll(np.asarray(v, dtype=np.float32), r).tolist()
                        if v is not None else None
                        for v in col.to_pylist()]
                col = pa.array(vecs, type=t.schema.field(c).type)
            cols[c] = col
        parts.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(DST, name), row_group_size=1_048_576)
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in sorted(os.listdir(SRC)):
        if name.endswith(".parquet"):
            replicate(name)
    print(f"done: {DST} (R={R})")


if __name__ == "__main__":
    main()
