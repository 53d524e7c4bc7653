"""Similarity-search query inventory over `embeddings`.

Brute-force cosine top-k (baseline), LSH bucketing (scale path), and
threshold pair search — oracle-checked with floor(cos*1e6) encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from classic_fcd_spark.operators.similarity import (
    bucket_sql,
    cosine,
    duck_cosine_sql,
    floor_e6,
    hyperplane_weights,
)
from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.session import load_tables

DIM = 64
_N_QUERIES = 10
_TOP_K = 5


# ---------------------------------------------------------------------------
# Brute-force cosine top-k.
# ---------------------------------------------------------------------------
@register(
    "ann_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT qid, c.vec_id AS nid,
               {duck_cosine_sql("qe", "c.embedding", DIM)} AS cos
        FROM q, embeddings c
        WHERE c.vec_id <> qid
    ), ranked AS (
        SELECT qid, nid, cos,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
        FROM scored
    )
    SELECT qid, nid, rnk, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
    FROM ranked WHERE rnk <= {_TOP_K}
    """,
    doc="ANN baseline: brute-force cosine top-k. The query set is tiny → "
    "broadcast; scoring is a JVM-side zip_with/aggregate fold (no UDF, "
    "no shuffle of the corpus); per-query top-k via window. At 100 TB "
    "the corpus scan partitions perfectly; use ann_lsh_buckets to prune.",
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb.select(F.col("vec_id").alias("nid"), "embedding"))
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cosine("qe", "embedding").alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "nid", "rnk", floor_e6(F.col("cos")).alias("cos_e6"))
    )


# ---------------------------------------------------------------------------
# LSH bucketing (random-hyperplane signs, md5-derived deterministic planes).
# ---------------------------------------------------------------------------
_WEIGHTS = hyperplane_weights(8, DIM)


@register(
    "ann_lsh_buckets",
    f"""
    WITH b AS (
        SELECT vec_id, {bucket_sql("embedding", _WEIGHTS, "duck")} AS bucket
        FROM embeddings
    )
    SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
    FROM b GROUP BY bucket
    """,
    doc="ANN scale path: 8-bit random-hyperplane LSH bucketing with "
    "deterministic md5-derived integer planes (shared literally with the "
    "oracle). Bucket assignment is a projection; ANN then probes only "
    "matching buckets — shuffle on bucket id, collision-bounded.",
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    return (
        emb.select(
            "vec_id", F.expr(bucket_sql("embedding", _WEIGHTS, "spark")).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


# ---------------------------------------------------------------------------
# Threshold pair search (embedding near-dup shape).
# ---------------------------------------------------------------------------
@register(
    "embedding_similar_pairs",
    f"""
    SELECT a.vec_id AS i, b.vec_id AS j,
           CAST(floor({duck_cosine_sql("a.embedding", "b.embedding", DIM)} * 1000000.0) AS BIGINT) AS cos_e6
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {duck_cosine_sql("a.embedding", "b.embedding", DIM)} >= 0.45
    """,
    doc="Embedding-cosine near-dup pairs (threshold 0.45 on this corpus): "
    "the all-pairs shape documents the exact semantics; at 100 TB the "
    "same predicate runs over ann_lsh_buckets candidates instead of the "
    "cross join.",
)
def embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir)["embeddings"]
    a = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("i") < F.col("j"))
    cos = cosine("ea", "eb")
    return pairs.filter(cos >= 0.45).select("i", "j", floor_e6(cos).alias("cos_e6"))
