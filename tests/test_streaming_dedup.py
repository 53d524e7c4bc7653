"""Streaming incremental dedup: batch/stream duality + growing index.

The corpus is dropped as two files (old half, new half).  Draining the
stream must emit EXACTLY the pairs the one-shot batch operator finds for
new-half-vs-old-half (the stream's first batch has an empty index and
emits nothing), and the final on-disk index must cover every doc the
batch path would have banded.
"""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

_SPLIT = 250


class TestStreamingIncrementalDedup:
    @pytest.fixture(scope="class")
    def dirs(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("stream_dedup")
        docs = root / "docs"
        docs.mkdir()
        src = pq.read_table(os.path.join(SF_SMALL, "documents.parquet"))
        import pyarrow.compute as pc

        old = src.filter(pc.less(src["doc_id"], _SPLIT))
        new = src.filter(pc.greater_equal(src["doc_id"], _SPLIT))
        p1, p2 = docs / "drop1.parquet", docs / "drop2.parquet"
        pq.write_table(old, p1)
        pq.write_table(new, p2)
        # the file source orders micro-batches by modification time:
        # make the old half strictly older
        now = time.time()
        os.utime(p1, (now - 100, now - 100))
        os.utime(p2, (now, now))
        return str(docs), str(root / "index"), str(root / "chk")

    def test_stream_equals_batch_cross_split_and_index_complete(
        self, spark, dirs
    ):
        from classic_fcd_spark.operators.dedup import (
            banded_signatures,
            incremental_near_dups,
            word_shingles,
            ws_tokens,
        )
        from classic_fcd_spark.streaming.incremental_dedup import (
            run_streaming_dedup_available_now,
        )

        docs_dir, index_dir, chk = dirs
        got = run_streaming_dedup_available_now(spark, docs_dir, index_dir, chk)
        got_pairs = {
            (r["new_id"], r["dup_of"]): (r["inter"], r["uni"])
            for r in got
        }

        all_docs = spark.read.parquet(docs_dir)
        sh = all_docs.filter(F.size(ws_tokens("text")) >= 3).select(
            "doc_id", word_shingles("text").alias("shingles")
        )
        index_docs = sh.filter(F.col("doc_id") < _SPLIT)
        new_docs = sh.filter(F.col("doc_id") >= _SPLIT)
        expected = {
            (r["new_id"], r["dup_of"]): (r["inter"], r["uni"])
            for r in incremental_near_dups(
                new_docs,
                banded_signatures(index_docs, "doc_id", "shingles"),
                index_docs,
                "doc_id",
                "shingles",
            ).collect()
        }
        assert got_pairs == expected
        assert len(got_pairs) > 0  # the corpus must exercise the path

        # the grown index covers every bandable doc, same rows as a
        # one-shot batch banding of the full corpus
        idx = spark.read.parquet(index_dir)
        batch_idx = banded_signatures(sh, "doc_id", "shingles")
        assert (
            idx.select("doc_id", "band", "bh").distinct().count()
            == batch_idx.select("doc_id", "band", "bh").distinct().count()
        )
        assert idx.join(batch_idx, ["doc_id", "band", "bh"], "left_anti").count() == 0
