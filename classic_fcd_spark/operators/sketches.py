"""Sketch-based corpus statistics — the single-pass, mergeable summaries
a 100 TB pipeline runs instead of exact aggregation.

Exact COUNT(DISTINCT) and exact percentiles over 100 TB need a shuffle
of every distinct value (or a full sort); the sketch versions are
map-side-mergeable fixed-size state, so the whole summary is ONE scan +
one tiny merge:

- distinct content fingerprints per source → HyperLogLog++
  (Spark's approx_count_distinct; Heule et al. 2013, public) — fixed
  ~kB of state per group, rsd-tunable;
- token-length quantiles → Spark's percentile_approx
  (Greenwald-Khanna-style ε-approximate quantile summary, public) —
  rank error ≤ 1/accuracy, mergeable across partitions;
- means/extrema are trivially mergeable already.

These power the curation dashboards (mix owners watch per-source
distinct mass and length distributions drift) where exactness is not
worth a second pass.  Exactness contracts live in tests: HLL within
3·rsd of exact, quantiles within the documented rank error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from classic_fcd_spark.operators.dedup import ws_tokens


def source_sketch_stats(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    rsd: float = 0.02,
    quantile_accuracy: int = 1000,
) -> DataFrame:
    """Per-`group_col` single-pass summary:
    (group, n_docs, approx_distinct_docs, p50/p95/p99 token length,
    mean_tokens, max_tokens).

    `approx_distinct_docs` counts distinct bag-of-words fingerprints —
    the same content key the exact-dedup operator groups on, so
    n_docs - approx_distinct_docs estimates the exact-dup mass per
    source without the dedup shuffle."""
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens(text_col))))
    )
    n_toks = F.size(ws_tokens(text_col))
    return (
        docs.select(
            F.col(group_col).alias("grp"),
            fp.alias("fp"),
            n_toks.alias("n_toks"),
        )
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.approx_count_distinct("fp", rsd).alias("approx_distinct_docs"),
            F.percentile_approx(
                "n_toks", [0.5, 0.95, 0.99], quantile_accuracy
            ).alias("tok_quantiles"),
            F.avg("n_toks").alias("mean_tokens"),
            F.max("n_toks").alias("max_tokens"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "approx_distinct_docs",
            F.col("tok_quantiles")[0].alias("p50_tokens"),
            F.col("tok_quantiles")[1].alias("p95_tokens"),
            F.col("tok_quantiles")[2].alias("p99_tokens"),
            "mean_tokens",
            "max_tokens",
        )
    )
