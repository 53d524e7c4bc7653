"""10x-documents flat-plan sweep for the text/extension query family
(the r5 brief's item 5): run duplicated_spans, bm25_search,
ccnet_perplexity (unigram NLL), dsir_select and semantic_dedup at sf0.1
and at a synthetic 10x-concat corpus, and report the wall-time ratio.

A flat plan's cost should scale ~linearly in rows once per-query plan
overhead is paid; a superlinear ratio (>~10x on 10x rows, beyond noise)
flags a hidden quadratic — self-join without banding, window over a hot
key, driver-bounded collect growing with the corpus.

The 10x corpus: documents unioned 10 times with doc_id offset by
10M x copy (ids stay unique and the planted dup groups replicate, so the
dedup queries find 10x the work, not new semantics); embeddings likewise
on vec_id (semantic_dedup's input).  Other tables are symlinked from
sf0.1 unchanged.

VARIETY MODE (SWEEP_VARIETY=1, r9 — VERDICT r8 item 2): plain cloning
makes the PAIR-EMITTING family's output quadratic in clone multiplicity
(every cross-copy clone pair is a true near-dup), so minhash/jaccard/
embedding-pair queries previously had no second-decade wall-time
evidence at all.  Variety mode applies a deterministic per-copy
mutation that is RECALL-PRESERVING for the planted within-copy dups
and eliminates cross-copy similarity:

- documents: a copy-keyed token BIJECTION (every token of copy c>0 gets
  the suffix `~c`).  A vocabulary bijection renames every shingle
  consistently, so the Jaccard similarity of any two documents WITHIN a
  copy is EXACTLY its copy-0 value (set intersections/unions are
  preserved under bijection) — planted near-dup groups keep their
  similarity, exact dups stay exact — while any cross-copy pair shares
  zero tokens.  n_chars is recomputed so the metadata stays consistent.
- embeddings: a copy-keyed SIGNED PERMUTATION (rotate the 64 dims by c,
  flip the sign of every (i+c)%5==0 coordinate).  Signed permutations
  are orthogonal, so within-copy inner products and cosines are EXACTLY
  preserved (planted similar pairs survive verbatim), while a vector
  and its cross-copy clone land far apart in cosine.

Result: each copy contributes exactly its own within-copy pairs, so for
the TEXT pair queries output grows EXACTLY linearly in copies (disjoint
vocabularies have Jaccard 0 — zero background) and the wall-time ratio
becomes a meaningful plan-scaling signal (SWEEP_VARIETY=1
SWEEP_COPIES=100 produced the recorded x100 rows in BENCH_NOTES'
"r10: x100 variety-mode sweep" table).

Measured limit (r9): embedding_similar_pairs' deliberately weak 0.45
threshold sits INSIDE the random-cosine tail of 64-dim geometry (its
own x1 pairs live in [0.45, 0.6); decorrelated cross-copy pairs reach
0.50), so for that one query quadratic background pairs are the
query's true semantics on ANY clone-free corpus — no mutation can
make its output linear.  Its second-decade evidence therefore comes
from the clone corpus instead, where the r8 duplicate-collapse keeps
pair COMPUTE multiplicity-independent and only the emitted rows grow
(BENCH_NOTES documents both).

Usage: python scripts/text_scale_sweep.py   (results -> stdout; r6 run
recorded in BENCH_NOTES.md)
       SWEEP_VARIETY=1 python scripts/text_scale_sweep.py  (pair family)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# xN dial: SWEEP_COPIES=100 gives the second decade of scale evidence
# (5M docs at the default sf0.1 base)
COPIES = int(os.environ.get("SWEEP_COPIES", "10"))
VARIETY = os.environ.get("SWEEP_VARIETY", "0") == "1"
OFFSET = 10_000_000
# the pair-emitting family: only sweepable under variety mode (plain
# clones inflate their OUTPUT quadratically in copy multiplicity)
PAIR_QUERIES = [
    "minhash_lsh_near_dups",
    "ngram_jaccard_pairs",
    "embedding_similar_pairs",
    # r12 (VERDICT r11 item 4): the heaviest text workload on the board
    # (15.1 s at sf1 = 6.9x on 10x rows, the suite's steepest ratio) —
    # per-doc signals, so rows grow exactly linearly in copies; variety
    # mode keeps the copies' gram vocabularies disjoint, so the
    # two-pass top-gram join sees no cross-copy gram growing hot.  The
    # LINEAR_BAND assert below turns the ratio into a gate.
    "repetition_signals",
]

# in-script linear-band gates (VERDICT r11 item 4): wall-time ratio on
# a COPIES-x corpus must stay within BAND x COPIES — a miss means the
# plan grew superlinear in rows (hidden quadratic / hot key), not noise.
# Queries listed here are timed under FULL-COLUMN evaluation (a
# sum-of-xxhash64 over every output column), not .count(): repetition's
# output is one row per doc, so count() lets Catalyst PRUNE the nine
# per-n fraction aggregates and times the groupBy skeleton only (a
# measured 0.56 s at x100 vs 34x that with the payload computed).
LINEAR_BAND = {"repetition_signals": 1.5}
QUERIES = [
    "duplicated_spans",
    "bm25_search",
    "ccnet_perplexity",
    "dsir_select",
    "semantic_dedup",
    # r8 additions: the scan-speed family (exact dedup, feature pass,
    # cached-model trigram scoring).  Pair-emitting queries with
    # duplication-inflated quadratic OUTPUT (minhash/jaccard) are
    # deliberately absent — their rows, not their plans, scale with
    # clone multiplicity (see BENCH_NOTES sf1 table).
    "exact_dedup_groups",
    "text_features",
    "trigram_lm_scores",
]


def _mutate_doc_copy(df, c):
    """Copy-keyed token bijection (variety mode): suffix every token of
    copy c>0 with ~c.  Bijective on the vocabulary, so within-copy
    Jaccard/fingerprint relations are exactly preserved; cross-copy
    pairs share zero tokens."""
    from pyspark.sql import functions as F

    if c == 0 or not VARIETY:
        return df
    mut = F.array_join(
        F.transform(
            F.split(F.trim("text"), " +"),
            lambda t: F.concat(t, F.lit(f"~{c}")),
        ),
        " ",
    )
    return df.withColumn("text", mut).withColumn("n_chars", F.length("text"))


def _mutate_emb_copy(df, c, dim=64):
    """Copy-keyed signed permutation (variety mode): coordinate i takes
    value sign(c,i) * embedding[(a_c*i + c) mod dim] with a_c odd (a
    bijection mod the power-of-two dim) and md5-parity sign flips.
    Signed permutations are orthogonal — within-copy inner products and
    cosines are EXACTLY preserved — while the index scrambling + ~half
    sign flips decorrelate cross-copy clones even for smooth/clustered
    vectors (a plain shift rotation left smooth clones correlated)."""
    import hashlib

    from pyspark.sql import functions as F

    if c == 0 or not VARIETY:
        return df
    a = 2 * ((c * 7) % (dim // 2)) + 1  # odd -> bijective multiplier
    cols = []
    for i in range(dim):
        j = (a * i + c) % dim
        sign = (
            -1.0
            if int(hashlib.md5(f"{c}:{i}".encode()).hexdigest(), 16) % 2
            else 1.0
        )
        cols.append(
            (F.element_at("embedding", j + 1) * F.lit(sign)).cast("float")
        )
    return df.withColumn("embedding", F.array(*cols))


def build_10x(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{t}.parquet"))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = [
        _mutate_doc_copy(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET)), i
        )
        for i in range(COPIES)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.parquet(os.path.join(out_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    eparts = [
        _mutate_emb_copy(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET)), i
        )
        for i in range(COPIES)
    ]
    bige = eparts[0]
    for p in eparts[1:]:
        bige = bige.unionByName(p)
    bige.write.parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    from classic_fcd_spark.queries import query_fn_map
    from classic_fcd_spark.session import get_spark

    spark = get_spark("text_scale_sweep")
    qmap = query_fn_map()
    # ccnet_perplexity is bench-only: resolve it from the bench module
    import bench as _bench

    pool = PAIR_QUERIES if VARIETY else QUERIES
    qmap.update({
        k: v for k, v in _bench._extra_workloads().items() if k in pool
    })

    queries = [q for q in pool if not sys.argv[1:] or q in sys.argv[1:]]
    work = tempfile.mkdtemp(prefix="sweep10x_")
    big_dir = os.path.join(work, f"sf{COPIES}x")
    t0 = time.perf_counter()
    build_10x(spark, big_dir)
    print(f"{COPIES}x corpus built in {time.perf_counter() - t0:.1f}s")

    results = {}
    for name in queries:
        fn = qmap[name]
        # warm both plans at the smallest SF (codegen paid once)
        try:
            fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:  # noqa: BLE001 — warm-up best effort
            pass
        times = {}
        for label, d in (("x1", SF_DIR), (f"x{COPIES}", big_dir)):
            best = None
            for _ in range(2):  # min-of-2 (the bench's noise policy)
                t0 = time.perf_counter()
                df = fn(spark, d)
                if name in LINEAR_BAND:
                    from pyspark.sql import functions as F

                    row = df.agg(
                        F.count("*").alias("n"),
                        # bit_xor, not sum: 500k hash longs overflow an
                        # ANSI-mode SUM
                        F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
                    ).collect()[0]
                    n = row["n"]
                else:
                    n = df.count()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            times[label] = (round(best, 2), n)
        big = f"x{COPIES}"
        ratio = round(times[big][0] / times["x1"][0], 2)
        results[name] = {
            "x1_s": times["x1"][0],
            f"{big}_s": times[big][0],
            "ratio": ratio,
            "x1_rows": times["x1"][1],
            f"{big}_rows": times[big][1],
        }
        print(name, results[name])
        if name in LINEAR_BAND:
            cap = LINEAR_BAND[name] * COPIES
            assert ratio <= cap, (
                f"{name}: x{COPIES} ratio {ratio} exceeds the linear "
                f"band {cap} — the plan is superlinear in rows"
            )

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
