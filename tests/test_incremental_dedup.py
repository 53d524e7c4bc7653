"""Incremental (new-batch-vs-corpus) dedup contracts.

The production ingest path: the corpus stores its banded signature table
once; each new batch probes it.  Gates:

1. DuckDB oracle: the cross-split band-join + exact-Jaccard verify,
   recomputed independently in SQL over the same parquet.
2. Equivalence: incremental(new, index) must equal the cross-split
   subset of the full-batch minhash path — same banding, so finding
   fewer (or more) pairs than a monolithic re-dedup would be a bug.
3. Plan: the index side's raw shingles must be semi-join-pruned to
   candidates before exploding (corpus text cost ∝ collisions).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_MEDIUM

_SPLIT = 250  # doc_id < _SPLIT = indexed corpus; rest = new batch


@pytest.fixture(scope="module")
def incremental_rows(spark):
    from pyspark.sql import functions as F

    from classic_fcd_spark.operators.dedup import (
        banded_signatures,
        incremental_near_dups,
        word_shingles,
        ws_tokens,
    )
    from classic_fcd_spark.session import load_tables

    docs = load_tables(spark, SF_MEDIUM)["documents"]
    sh = docs.filter(F.size(ws_tokens("text")) >= 3).select(
        "doc_id", word_shingles("text").alias("shingles")
    )
    index_docs = sh.filter(F.col("doc_id") < _SPLIT)
    new_docs = sh.filter(F.col("doc_id") >= _SPLIT)
    index_banded = banded_signatures(index_docs, "doc_id", "shingles")
    out = incremental_near_dups(
        new_docs, index_banded, index_docs, "doc_id", "shingles"
    )
    return out, {
        (r["new_id"], r["dup_of"]): (r["inter"], r["uni"], round(r["jaccard"], 9))
        for r in out.collect()
    }


class TestIncrementalDedup:
    def test_matches_duckdb_oracle(self, incremental_rows):
        from classic_fcd_spark.operators.dedup import (
            duck_minhash_from_hashes,
            duck_shingle_hashes,
            duck_word_shingles,
        )

        _, got = incremental_rows
        sh = duck_word_shingles("text")
        toks = "regexp_split_to_array(trim(text), ' +')"
        q = f"""
        WITH sh AS (
            SELECT doc_id, {sh} AS shingles
            FROM read_parquet('{SF_MEDIUM}/documents.parquet')
            WHERE len({toks}) >= 3
        ), hashed AS (
            SELECT doc_id, shingles, {duck_shingle_hashes("shingles")} AS hs FROM sh
        ), sig AS (
            SELECT doc_id, shingles, {duck_minhash_from_hashes("hs")} AS sig FROM hashed
        ), banded AS (
            SELECT doc_id, b, md5(array_to_string(sig[(b*4+1):(b*4+4)], '|')) AS bh
            FROM sig, (SELECT unnest([0,1,2,3]) AS b)
        ), cand AS (
            SELECT DISTINCT n.doc_id AS new_id, x.doc_id AS dup_of
            FROM banded n JOIN banded x ON n.b = x.b AND n.bh = x.bh
            WHERE n.doc_id >= {_SPLIT} AND x.doc_id < {_SPLIT}
        )
        SELECT new_id, dup_of,
               len(list_intersect(a.shingles, b.shingles)) AS inter,
               len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles)) AS uni
        FROM cand JOIN sh a ON a.doc_id = new_id JOIN sh b ON b.doc_id = dup_of
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / (len(a.shingles) + len(b.shingles)
                   - len(list_intersect(a.shingles, b.shingles))) >= 0.8
        """
        expected = {
            (r[0], r[1]): (r[2], r[3], round(r[2] / r[3], 9))
            for r in duckdb.sql(q).fetchall()
        }
        assert got == expected

    def test_equals_cross_split_subset_of_full_batch(self, spark, incremental_rows):
        from classic_fcd_spark.queries.dedup import minhash_lsh_near_dups

        _, got = incremental_rows
        full = {
            (r["i"], r["j"]): (r["inter"], r["uni"], round(r["jaccard"], 9))
            for r in minhash_lsh_near_dups(spark, SF_MEDIUM).collect()
        }
        # full-batch emits i < j; the cross-split subset has i (index) <
        # _SPLIT <= j (new) — incremental reports them as (new_id, dup_of)
        cross = {
            (j, i): v for (i, j), v in full.items() if i < _SPLIT <= j
        }
        assert got == cross
        assert len(got) > 0  # the corpus must actually exercise the path

    def test_index_shingles_semi_join_pruned(self, incremental_rows):
        out, _ = incremental_rows
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan, plan[:2000]
