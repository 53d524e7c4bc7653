"""Benchmark decontamination: DuckDB cross-check of the n-gram overlap
report (oracle-style, inside pytest — the driver registry is capped at
50, so post-cap operators gate here), plus the self-containment property
and a plan assertion that the benchmark side broadcasts.
"""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from classic_fcd_spark.operators.decontamination import (
    contamination_report,
    decontaminate,
)
from classic_fcd_spark.operators.dedup import duck_word_shingles
from classic_fcd_spark.session import load_tables
from tests.conftest import SF_SMALL

N = 5  # tiny synthetic docs — 13-grams would barely exist at sf0.001


def _bench(docs):
    # deterministic "benchmark" slice: every 20th doc
    return docs.filter(F.col("doc_id") % 20 == 0)


class TestContaminationReport:
    def test_matches_duckdb_ngram_overlap(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        got = {
            r["doc_id"]: r["matched_ngrams"]
            for r in contamination_report(docs, _bench(docs), n=N).collect()
        }
        path = os.path.join(SF_SMALL, "documents.parquet")
        shingles = duck_word_shingles("text", N)
        want = {
            r[0]: r[1]
            for r in duckdb.sql(
                f"""
                WITH bg AS (
                    SELECT DISTINCT unnest({shingles}) AS gram
                    FROM read_parquet('{path}') WHERE doc_id % 20 = 0
                ),
                dg AS (
                    SELECT doc_id, unnest({shingles}) AS gram
                    FROM read_parquet('{path}')
                ),
                hits AS (
                    SELECT doc_id, count(*) AS m
                    FROM dg JOIN bg USING (gram) GROUP BY doc_id
                )
                SELECT d.doc_id, coalesce(m, 0)
                FROM read_parquet('{path}') d LEFT JOIN hits USING (doc_id)
                """
            ).fetchall()
        }
        assert got == want

    def test_benchmark_members_flag_themselves(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        bench = _bench(docs)
        rep = contamination_report(docs, bench, n=N)
        long_enough = bench.filter(F.size(F.split(F.trim("text"), " +")) >= N)
        missed = long_enough.join(
            rep.filter(~F.col("contaminated")), "doc_id", "left_semi"
        )
        assert missed.count() == 0

    def test_decontaminate_removes_exactly_the_flagged(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        bench = _bench(docs)
        flagged = {
            r["doc_id"]
            for r in contamination_report(docs, bench, n=N)
            .filter("contaminated")
            .collect()
        }
        kept = {r["doc_id"] for r in decontaminate(docs, bench, n=N).collect()}
        everyone = {r["doc_id"] for r in docs.select("doc_id").collect()}
        assert kept == everyone - flagged
        assert flagged  # non-trivial on this corpus

    def test_benchmark_side_broadcasts(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        plan = contamination_report(docs, _bench(docs), n=N)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
