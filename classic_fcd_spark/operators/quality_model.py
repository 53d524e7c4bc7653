"""Distributed training for the hashed linear quality classifier — the
fasttext-style recipe (Joulin et al. 2016, public literature; the
CCNet/LLaMA data pipelines train exactly this shape against a clean
reference corpus).

functions/text.linear_quality_score is the 100 TB-side SCORER: pure
column algebra over broadcast weights, no UDF, runs at scan speed.
This module supplies its weights end-to-end inside the engine:

  featurize — mean-pooled hashed bag-of-tokens: freq[b] = count of
              tokens hashing to bucket b / n_tokens.  The SAME md5
              bucket function as the scorer (hashed_bucket_sql), so a
              trained weight vector drops straight into
              linear_quality_score with NO translation: the scorer's
              sigmoid(mean-pooled logit) IS sigmoid(<w, freq>).
  train     — Spark MLlib LogisticRegression (L-BFGS, JVM-side) with
              fitIntercept=False and standardization=False so the
              fitted coefficients are directly the scorer's weights
              (an intercept or feature scaling would change the scoring
              function the column expression computes).

Scale shape: featurization is one explode + one (doc, bucket) groupBy —
linear, map-side combined; vector assembly is a JVM-side map-densify +
array_to_vector projection (no Python anywhere).  TRAINING corpora are
labeled samples of ~10^4-10^6 docs, not the 100 TB corpus — the corpus
only ever meets the column-algebra scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from classic_fcd_spark.functions.text import hashed_bucket_sql
from classic_fcd_spark.operators.dedup import ws_tokens


def hashed_freq_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "q",
) -> DataFrame:
    """(id, features): ml Vector of hashed token frequencies normalized
    by doc length — the exact dual of the scorer's mean-pooled logit
    (<w, features> = mean over tokens of w[bucket]).  Pure column
    algebra end to end: (doc, bucket) counts from one explode+groupBy,
    densified by a map lookup over the bucket range, converted with
    pyspark.ml.functions.array_to_vector (JVM-side) — no Python UDF."""
    from pyspark.ml.functions import array_to_vector

    toks = ws_tokens(text_col)
    # mirror the scorer's empty-doc guard (functions/text.py:226-228):
    # split('') yields [''] and would featurize an empty doc as weight
    # 1.0 on bucket(md5('')) while linear_quality_score scores it a
    # neutral 0.5 — training on that row would push a weight the scorer
    # never applies.  Empty docs carry no signal; drop them.
    ex = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), F.size(toks).alias("n"), F.explode(toks).alias("t")
    )
    bucket = F.expr(hashed_bucket_sql("t", n_buckets, salt)).cast("int")
    fmap = (
        ex.groupBy(id_col, "n", bucket.alias("b"))
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("b"), (F.col("c") / F.col("n")).alias("f"))
                )
            ).alias("fm")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(F.element_at(F.col("fm"), i), F.lit(0.0)),
    )
    return fmap.select(id_col, array_to_vector(dense).alias("features"))


def train_linear_quality(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "q",
    reg_param: float = 0.0,
    max_iter: int = 100,
) -> list[float]:
    """Fit the classifier on positive (keep) vs negative (drop) corpora;
    returns the weight list for functions/text.linear_quality_score.

    Fidelity contract (test-gated): for any document,
    sigmoid(<weights, features>) computed by MLlib's predictor equals
    linear_quality_score(text, weights) computed by the column
    expression — same buckets, same pooling, no intercept, no
    standardization rescaling."""
    from pyspark.ml.classification import LogisticRegression

    pos = hashed_freq_features(pos_docs, id_col, text_col, n_buckets, salt)
    neg = hashed_freq_features(neg_docs, id_col, text_col, n_buckets, salt)
    data = pos.select(F.lit(1.0).alias("label"), "features").unionByName(
        neg.select(F.lit(0.0).alias("label"), "features")
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        fitIntercept=False,
        standardization=False,
        regParam=reg_param,
        maxIter=max_iter,
    )
    model = lr.fit(data)
    return [float(w) for w in model.coefficients.toArray()]
