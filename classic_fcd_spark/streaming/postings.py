"""Streaming inverted-index maintenance: keep the BM25 postings silver
current as documents arrive — the retrieval twin of the streaming
incremental-dedup index (streaming/incremental_dedup.py grows the band
table; this grows the postings table).

Contract: the document stream is APPEND-ONLY on the id (the curation
funnel's incremental-dedup stage upstream is what guarantees a doc id
arrives once).  Each micro-batch tokenizes only ITS documents — the
per-batch cost follows the batch, never the corpus — and appends their
(id, dl, term, tf) postings; corpus stats (N, avgdl) and query-term
document frequencies are derived from the postings table at query time
(operators/bm25.bm25_topk already reads both from the postings), so no
separate stats state needs maintaining.  Exactly-once at file
granularity comes from the streaming checkpoint: a restart re-reads no
already-committed input file, so no doc's postings append twice.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from classic_fcd_spark.operators.bm25 import bm25_postings


def run_postings_available_now(
    spark: Any,
    docs_dir: str,
    postings_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Drain all available document files (one per micro-batch) and
    append each batch's postings to `postings_dir`."""
    batch = spark.read.parquet(docs_dir)
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bm25_postings(bdf, id_col, text_col).write.mode("append").parquet(
            postings_dir
        )

    q = (
        src.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_postings(spark: Any, postings_dir: str) -> DataFrame:
    return spark.read.parquet(postings_dir)
