"""Int8 embedding quantization: DuckDB cross-check of the absmax scheme,
round-trip error bounds, and cosine fidelity on the real embeddings.
"""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import functions as F

from classic_fcd_spark.operators.similarity import (
    dequantize_embedding,
    duck_quantize_sql,
    quantize_embedding,
)
from classic_fcd_spark.queries.similarity import DIM
from classic_fcd_spark.session import load_tables
from tests.conftest import SF_SMALL


class TestInt8Quantization:
    def test_matches_duckdb_quantization(self, spark):
        emb = load_tables(spark, SF_SMALL)["embeddings"]
        got = {
            r["vec_id"]: (r["qs"]["scale"], list(r["qs"]["q"]))
            for r in emb.select(
                "vec_id", quantize_embedding("embedding").alias("qs")
            ).collect()
        }
        path = os.path.join(SF_SMALL, "embeddings.parquet")
        want = {
            r[0]: (r[1]["scale"], list(r[1]["q"]))
            for r in duckdb.sql(
                f"SELECT vec_id, {duck_quantize_sql('embedding', DIM)} "
                f"FROM read_parquet('{path}')"
            ).fetchall()
        }
        assert set(got) == set(want)
        for vid in got:
            gs, gq = got[vid]
            ws, wq = want[vid]
            assert abs(gs - ws) < 1e-12, vid
            assert gq == wq, vid

    def test_round_trip_error_bounded(self, spark):
        emb = load_tables(spark, SF_SMALL)["embeddings"]
        q = emb.select("embedding", quantize_embedding("embedding").alias("qs"))
        both = q.select(
            "embedding",
            dequantize_embedding("qs").alias("deq"),
            F.col("qs")["scale"].alias("scale"),
        )
        rows = both.collect()
        assert rows
        for r in rows:
            bound = r["scale"] / 2 + 1e-9
            for a, b in zip(r["embedding"], r["deq"]):
                assert abs(float(a) - b) <= bound

    def test_cosine_fidelity(self, spark):
        emb = load_tables(spark, SF_SMALL)["embeddings"]
        rows = (
            emb.select("embedding", quantize_embedding("embedding").alias("qs"))
            .select("embedding", dequantize_embedding("qs").alias("deq"))
            .collect()
        )
        for r in rows:
            a = [float(x) for x in r["embedding"]]
            b = r["deq"]
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            if na > 0 and nb > 0:
                assert dot / (na * nb) > 0.999

    def test_zero_vector_safe(self, spark):
        df = spark.createDataFrame([(0, [0.0] * 4)], ["vec_id", "embedding"])
        r = (
            df.select(quantize_embedding("embedding").alias("qs"))
            .select("qs", dequantize_embedding("qs").alias("deq"))
            .collect()[0]
        )
        assert r["qs"]["scale"] == 0.0
        assert list(r["qs"]["q"]) == [0, 0, 0, 0]
        assert r["deq"] == [0.0, 0.0, 0.0, 0.0]
