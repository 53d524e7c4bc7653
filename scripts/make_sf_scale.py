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

VARIETY LANE (--variety, r13 — VERDICT r12 item 3): plain cloning makes
the PAIR-EMITTING text family's OUTPUT quadratic in clone multiplicity
(every cross-copy clone pair is a true near-dup), so the clone-lane sf1
bench re-flags ngram_jaccard_pairs every round for row inflation that
has nothing to do with the plan.  --variety applies the sweep's
recall-preserving per-copy mutations (text_scale_sweep.py, r9):

- documents: copy-keyed token BIJECTION (suffix every token of copy c>0
  with `~c`) — within-copy Jaccard/fingerprint relations are EXACTLY
  preserved (set ops are bijection-invariant), cross-copy pairs share
  zero tokens; n_chars recomputed;
- embeddings: copy-keyed SIGNED PERMUTATION (orthogonal, so within-copy
  inner products/cosines are exactly preserved; cross-copy clones
  decorrelate).

Both lanes ship the same row counts; BENCH_NOTES documents which lane a
committed artifact used.

pyarrow-only (no Spark session) so column types — including the
timestamp[us] ts columns — survive byte-identically; the strict
check's DuckDB views and Spark reads then see the same schema they see
on driver-shipped data.  (The variety mutations round-trip through
pandas for the two mutated tables only; their schemas are re-imposed.)

Usage: python scripts/make_sf_scale.py [out_dir] [copies] [--variety]
       (default /tmp/sf1 10; then SF_DIR=/tmp/sf1 scripts/check_correctness.py
        and SPARK_GRAFT_SF_DIR=/tmp/sf1 bench.py)
"""

from __future__ import annotations

import hashlib
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


def _mutate_documents(t: pa.Table, c: int) -> pa.Table:
    """Copy-keyed token bijection (text_scale_sweep._mutate_doc_copy):
    within-copy similarity exactly preserved, cross-copy Jaccard 0."""
    df = t.to_pandas()
    suf = f"~{c}"
    df["text"] = df["text"].map(
        lambda s: " ".join(tok + suf for tok in s.split())
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)


def _mutate_embeddings(t: pa.Table, c: int) -> pa.Table:
    """Copy-keyed signed permutation (text_scale_sweep._mutate_emb_copy):
    orthogonal, so within-copy cosines are exactly preserved."""
    import numpy as np

    df = t.to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    dim = mat.shape[1]
    a = 2 * ((c * 7) % (dim // 2)) + 1  # odd -> bijective multiplier
    idx = [(a * i + c) % dim for i in range(dim)]
    # Odd `a` is coprime to dim ONLY when dim is a power of two; for a
    # dim with odd factors (e.g. 384: c=1 gives a=15, gcd=3) the map
    # silently duplicates/drops coordinates and the permutation is no
    # longer orthogonal — which would corrupt the variety lane's
    # recall-preservation guarantee instead of failing (ADVICE r13).
    assert len(set(idx)) == dim, (
        f"index map not bijective for dim={dim}, a={a} — "
        "dim must be a power of two or the multiplier scheme must change"
    )
    signs = np.array(
        [
            -1.0
            if int(hashlib.md5(f"{c}:{i}".encode()).hexdigest(), 16) % 2
            else 1.0
            for i in range(dim)
        ],
        dtype=np.float32,
    )
    df["embedding"] = list(mat[:, idx] * signs)
    return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)


MUTATORS = {"documents": _mutate_documents, "embeddings": _mutate_embeddings}


def scale_table(
    name: str,
    offsets: dict[str, int],
    out_dir: str,
    copies: int,
    variety: bool = False,
) -> int:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    parts = []
    for c in range(copies):
        part = t
        if variety and c > 0 and name in MUTATORS:
            part = MUTATORS[name](part, c)
        for col, off in offsets.items():
            idx = part.schema.get_field_index(col)
            shifted = pc.add(part.column(col), pa.scalar(c * off, part.schema.field(col).type))
            part = part.set_column(idx, part.schema.field(col), shifted)
        parts.append(part)
    big = pa.concat_tables(parts)
    # Row groups are the PARALLELISM QUANTUM for both engines: Spark
    # assigns one task per row group and DuckDB one thread per row group,
    # so pyarrow's default (one giant group for anything under ~1M rows)
    # made every sf10 documents/embeddings scan effectively
    # SINGLE-THREADED in both engines — the silent cause of the r13/r14
    # sf10 grind (measured: the minhash DuckDB oracle alone ran >1 h at
    # ~1.5 cores).  Clamp so small tables get >=32-way parallelism and
    # huge tables keep sane metadata overhead.
    rg = min(1_048_576, max(16_384, big.num_rows // 64))
    pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"), row_group_size=rg)
    return big.num_rows


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--variety"]
    variety = "--variety" in sys.argv[1:]
    out_dir = args[0] if len(args) > 0 else "/tmp/sf1"
    copies = int(args[1]) if len(args) > 1 else 10
    os.makedirs(out_dir, exist_ok=True)
    for d in DIMS:
        shutil.copy(os.path.join(SRC, f"{d}.parquet"), os.path.join(out_dir, f"{d}.parquet"))
        print(f"{d}: dim, single copy")
    for name, offsets in FACTS.items():
        n = scale_table(name, offsets, out_dir, copies, variety=variety)
        lane = "variety" if variety and name in MUTATORS else "clone"
        print(f"{name}: {n} rows ({copies}x, {lane})")


if __name__ == "__main__":
    main()
