"""Streaming BM25 postings maintenance (streaming/postings.py): the
incrementally-grown index answers queries identically to a from-scratch
batch build, and a checkpointed restart appends only the new files'
postings (no double counting).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from classic_fcd_spark.operators.bm25 import bm25_topk
from classic_fcd_spark.streaming.postings import (
    read_postings,
    run_postings_available_now,
)

QUERIES = [(0, ["spark", "shuffle"]), (1, ["broadcast"])]

FILES = [
    [
        (0, "spark shuffles the sorted rows"),
        (1, "the broadcast join avoids the shuffle"),
    ],
    [
        (2, "broadcast broadcast tiny dims"),
        (3, "spark spark spark everywhere"),
    ],
    [
        (4, "rows and more rows in the shuffle"),
    ],
]


def _write_docs(path, rows, fname):
    ids, texts = zip(*rows)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": list(texts)}),
        f"{path}/{fname}",
    )


class TestStreamingPostings:
    def test_incremental_index_equals_batch_build(self, spark, tmp_path):
        docs_dir = tmp_path / "docs"
        docs_dir.mkdir()
        for i, rows in enumerate(FILES):
            _write_docs(str(docs_dir), rows, f"part-{i}.parquet")
        post_dir = str(tmp_path / "postings")
        run_postings_available_now(
            spark, str(docs_dir), post_dir, str(tmp_path / "ck")
        )
        all_docs = spark.read.parquet(str(docs_dir))
        streamed = sorted(
            map(
                tuple,
                bm25_topk(
                    all_docs, QUERIES, postings=read_postings(spark, post_dir)
                ).collect(),
            )
        )
        fresh = sorted(map(tuple, bm25_topk(all_docs, QUERIES).collect()))
        assert streamed == fresh
        assert len(streamed) > 0

    def test_restart_appends_only_new_files(self, spark, tmp_path):
        docs_dir = tmp_path / "docs2"
        docs_dir.mkdir()
        for i, rows in enumerate(FILES[:2]):
            _write_docs(str(docs_dir), rows, f"part-{i}.parquet")
        post_dir = str(tmp_path / "postings2")
        ck = str(tmp_path / "ck2")
        run_postings_available_now(spark, str(docs_dir), post_dir, ck)
        n_first = read_postings(spark, post_dir).count()
        # new file arrives; SAME checkpoint -> only its postings append
        _write_docs(str(docs_dir), FILES[2], "part-2.parquet")
        run_postings_available_now(spark, str(docs_dir), post_dir, ck)
        post = read_postings(spark, post_dir)
        assert post.count() > n_first
        # no doc's postings were written twice: (id, term) stays unique
        assert (
            post.groupBy("doc_id", "term").count().filter("count > 1").count() == 0
        )
        # and the grown index still answers like a fresh build
        all_docs = spark.read.parquet(str(docs_dir))
        a = sorted(map(tuple, bm25_topk(all_docs, QUERIES, postings=post).collect()))
        b = sorted(map(tuple, bm25_topk(all_docs, QUERIES).collect()))
        assert a == b


class TestIdempotentReplay:
    def test_replayed_batch_overwrites_not_appends(self, spark, tmp_path):
        """Simulate the crash-replay: the same batch written twice with
        the same batch_id must leave exactly one copy of its postings."""
        from classic_fcd_spark.streaming.postings import write_postings_batch

        docs = spark.createDataFrame(FILES[0], ["doc_id", "text"])
        out = str(tmp_path / "p")
        write_postings_batch(docs, 7, out)
        once = sorted(map(tuple, read_postings(spark, out).collect()))
        write_postings_batch(docs, 7, out)  # the replay
        twice = sorted(map(tuple, read_postings(spark, out).collect()))
        assert once == twice
        post = read_postings(spark, out)
        assert post.groupBy("doc_id", "term").count().filter("count > 1").count() == 0
