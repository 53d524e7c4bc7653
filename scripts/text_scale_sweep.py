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

Usage: python scripts/text_scale_sweep.py   (results -> stdout; r6 run
recorded in BENCH_NOTES.md)
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
OFFSET = 10_000_000
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
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
        for i in range(COPIES)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.parquet(os.path.join(out_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    eparts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET))
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

    qmap.update({
        k: v for k, v in _bench._extra_workloads().items() if k in QUERIES
    })

    queries = [q for q in QUERIES if not sys.argv[1:] or q in sys.argv[1:]]
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
                n = fn(spark, d).count()
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

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
