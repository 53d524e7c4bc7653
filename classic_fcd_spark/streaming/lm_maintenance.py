"""Incremental trigram-LM maintenance: keep the language-model count
tables current as documents arrive, at per-batch cost — the LM twin of
the streaming postings index (streaming/postings.py) and the r8
verdict's item 5 (a new corpus previously refit from scratch: the x100
cold fit cost 20.8 s even though trigram/unigram counts are additive).

Design: the model state IS three integer count tables (uni/pair/tri —
operators/lm.TrigramProbModel), and counting is a homomorphism over
corpus union: counts(A ∪ B) = counts(A) + counts(B) keywise.  So each
micro-batch writes ITS OWN count tables into a `batch_pt=<batch_id>`
partition (exactly-once: a replayed batch overwrites its own partition,
the same idempotent-foreachBatch recipe as the postings/dedup twins),
and the load path sums across partitions — one small groupBy per table,
bounded by the hashed-vocabulary sizes (<= buckets, buckets^2, the
4M-trigram broadcast budget), never by the corpus.

Equivalence: the per-batch counting pipeline is the SAME ngram_buckets
explode + integer aggregation the batch fit runs, and integer sums are
associative, so the incrementally-maintained model is BIT-IDENTICAL to
a from-scratch fit over the accumulated corpus (asserted exactly in
tests/test_lm_maintenance.py, both at the table level and at the
e9-integer score level).

Scale: per-batch cost ∝ batch tokens (tokenize + three aggregations
over the batch only); the accumulated model never re-reads old
documents.  Delta-partition count grows with batches — compaction is
the postings story (sources/layout compaction pass, or periodically
rewriting the summed tables as a new epoch partition); at one
delta per block the sum stays a few thousand tiny files per day, and
the load-side sum is itself a candidate for scheduled materialization.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classic_fcd_spark.operators.dsir import ngram_buckets
from classic_fcd_spark.operators.lm import (
    TrigramProbModel,
    _pair_structs,
    _triple_structs,
)

TABLES = ("uni", "pair", "tri")


def write_lm_delta_batch(
    batch_docs: DataFrame,
    batch_id: int,
    model_dir: str,
    text_col: str = "text",
    buckets: int = 256,
) -> None:
    """Count THIS batch's uni/pair/tri n-grams (same pipeline as
    fit_trigram_prob_model, restricted to the batch) and write each
    table into its `batch_pt=<batch_id>` partition — overwrite, so
    micro-batch replay after failure is idempotent."""
    toks = batch_docs.select(
        ngram_buckets(text_col, 1, buckets).alias("bs")
    ).cache()
    try:
        uni = toks.select(F.explode("bs").alias("w")).groupBy("w").agg(
            F.count("*").alias("ucnt")
        )
        pair = (
            toks.select(_pair_structs(F.col("bs")).alias("p"))
            .select(F.col("p.c").alias("c"), F.col("p.w").alias("w"))
            .groupBy("c", "w")
            .agg(F.count("*").alias("pcnt"))
        )
        tri = (
            toks.filter(F.size("bs") >= 3)
            .select(_triple_structs(F.col("bs")).alias("t"))
            .select("t.c1", "t.c2", F.col("t.w").alias("w"))
            .groupBy("c1", "c2", "w")
            .agg(F.count("*").alias("tcnt"))
        )
        for name, df in (("uni", uni), ("pair", pair), ("tri", tri)):
            df.write.mode("overwrite").parquet(
                f"{model_dir}/{name}_delta/batch_pt={batch_id}"
            )
    finally:
        toks.unpersist()


def run_lm_maintenance_available_now(
    spark: Any,
    docs_dir: str,
    model_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    buckets: int = 256,
    on_batch=None,
) -> None:
    """Drain all available document files (one per micro-batch),
    maintaining the delta-partitioned count tables under one
    checkpoint (S2 catch-up semantics: a restart counts only files not
    yet merged)."""
    batch = spark.read.parquet(docs_dir)
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def sink(bdf: DataFrame, batch_id: int) -> None:
        write_lm_delta_batch(bdf, batch_id, model_dir, text_col, buckets)
        if on_batch is not None:
            on_batch(batch_id)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def load_trigram_model_incremental(
    spark: SparkSession,
    model_dir: str,
    buckets: int = 256,
    lams: tuple[float, float, float] = (0.2, 0.3, 0.5),
) -> TrigramProbModel:
    """Sum the per-batch deltas into the live model — integer sums over
    the bounded hashed-vocabulary keys, so this is model-sized work,
    independent of how many documents the deltas represent.  Derived
    tables (pctx/tctx) and the `ut` constant are recomputed exactly as
    operators/lm.load_trigram_prob_model does, so a maintained model
    scores bit-identically to a from-scratch fit of the same corpus."""
    uni = (
        spark.read.parquet(f"{model_dir}/uni_delta")
        .groupBy("w")
        .agg(F.sum("ucnt").alias("ucnt"))
    )
    pair = (
        spark.read.parquet(f"{model_dir}/pair_delta")
        .groupBy("c", "w")
        .agg(F.sum("pcnt").alias("pcnt"))
    )
    tri = (
        spark.read.parquet(f"{model_dir}/tri_delta")
        .groupBy("c1", "c2", "w")
        .agg(F.sum("tcnt").alias("tcnt"))
    )
    utot = uni.agg(F.sum("ucnt")).first()[0] or 0
    ut = float(utot) + float(buckets)
    pctx = pair.groupBy("c").agg(F.sum("pcnt").alias("pctx"))
    tctx = tri.groupBy("c1", "c2").agg(F.sum("tcnt").alias("tctx"))
    return TrigramProbModel(uni, pair, pctx, tri, tctx, ut, buckets, lams)
