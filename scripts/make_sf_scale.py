"""Build an sf1-scale corpus (default 10x sf0.1) for the full-registry
strict check + bench — the union-xN recipe of text_scale_sweep.py
generalized to every fact table, with per-copy key offsets chosen so
copies are DISJOINT UNIVERSES:

- orders.o_orderkey / lineitem.l_orderkey share the +copy*1e9 offset,
  so the order<->lineitem join pairs within a copy and never across;
- events.user_id (+copy*1e7) and event_id (+copy*1e9): every windowed
  per-user query (sessionize, as-of, time-weighted) partitions on
  user_id, so offsetting it introduces NO new (user, ts) ties — each
  copy reproduces exactly the x1 per-user streams;
- documents.doc_id / embeddings.vec_id: +copy*1e7 (the sweep's offset);
  planted dup groups replicate, id-range query filters (vec_id < 10)
  keep probing copy 0 only;
- dim tables (region nation customer supplier part) stay single-copy —
  facts grow, dims don't (the realistic scale-up), and fact FKs to dims
  are left un-offset so every copy shares them.

pyarrow-only (no Spark session) so column types — including the
timestamp[us] ts columns — survive byte-identically; the strict
check's DuckDB views and Spark reads then see the same schema they see
on driver-shipped data.

Usage: python scripts/make_sf_scale.py [out_dir] [copies]
       (default /tmp/sf1 10; then SF_DIR=/tmp/sf1 scripts/check_correctness.py
        and SPARK_GRAFT_SF_DIR=/tmp/sf1 bench.py)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DIMS = ["region", "nation", "customer", "supplier", "part"]
# table -> {column: per-copy offset}
FACTS = {
    "orders": {"o_orderkey": 10**9},
    "lineitem": {"l_orderkey": 10**9},
    "events": {"event_id": 10**9, "user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}


def scale_table(name: str, offsets: dict[str, int], out_dir: str, copies: int) -> int:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    parts = []
    for c in range(copies):
        part = t
        for col, off in offsets.items():
            idx = part.schema.get_field_index(col)
            shifted = pc.add(part.column(col), pa.scalar(c * off, part.schema.field(col).type))
            part = part.set_column(idx, part.schema.field(col), shifted)
        parts.append(part)
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"))
    return big.num_rows


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for d in DIMS:
        shutil.copy(os.path.join(SRC, f"{d}.parquet"), os.path.join(out_dir, f"{d}.parquet"))
        print(f"{d}: dim, single copy")
    for name, offsets in FACTS.items():
        n = scale_table(name, offsets, out_dir, copies)
        print(f"{name}: {n} rows ({copies}x)")


if __name__ == "__main__":
    main()
