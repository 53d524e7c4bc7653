"""Sequence packing for LLM training-data pipelines.

Training consumes fixed-size context windows; feeding one short document
per window wastes most of the budget.  The standard fix is packing, and
large-scale pipelines use two variants:

1. **Concat-and-cut** (GPT-style): documents are concatenated in a
   deterministic order and the stream is cut every ``budget`` tokens —
   documents MAY span window boundaries.  This is a pure prefix-sum:
   ``bin = floor(tokens_before / budget)`` — one window cumsum per
   shard, exactly one shuffle, scale-perfect.
2. **Greedy next-fit** (no document splitting): a document that does not
   fit opens a new bin.  Inherently sequential per shard, so it runs as
   an Arrow-batched ``applyInPandas`` per group — linear work, and
   shards are loader-sized by construction so a group always fits a
   worker (the brief's sanctioned escape hatch for semantics the
   built-in operators can't express).

Both are deterministic: same input order -> same bins on every re-run.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType


def pack_concat_and_cut(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-cut packing: ``bin_id`` / ``offset`` locate each
    document's start in the packed token stream of its group.

    ``offset`` is the start position within the bin; a document spans
    into later bins when ``offset + n_tokens > budget`` (flagged
    ``spans_boundary`` — the loader reads it across windows).  One
    cumsum window per group: a single shuffle on the group key."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return (
        df.withColumn("__before", before)
        # integer `div`, not double `/` + cast: double division is exact
        # only below 2^53 tokens per shard — a bound a 100 TB shard can
        # actually approach; `div` stays in long arithmetic at any size
        .withColumn("bin_id", F.expr(f"__before div {int(budget)}"))
        .withColumn("offset", F.col("__before") % budget)
        .withColumn(
            "spans_boundary",
            (F.col("offset") + F.col(tokens_col)) > F.lit(budget),
        )
        .drop("__before")
    )


def pack_greedy_next_fit(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Greedy next-fit without document splitting, per group.

    Output: (group, order, n_tokens, bin_id, offset, truncated) —
    ``truncated`` marks documents that alone exceed the budget (they get
    a bin of their own; the loader chunks them).  Arrow-batched
    per-group pandas walk: linear in shard size, no driver involvement.
    """
    out_schema = StructType(
        [
            df.schema[group_col],
            df.schema[order_col],
            StructField("n_tokens", LongType(), False),
            StructField("bin_id", LongType(), False),
            StructField("offset", LongType(), False),
            StructField("truncated", BooleanType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        bins, offs = [], []
        cur_bin, fill = -1, 0
        for t in pdf[tokens_col].astype("int64"):
            if cur_bin >= 0 and fill + t <= budget:
                offs.append(fill)
                fill += t
            else:
                cur_bin += 1
                offs.append(0)
                fill = t
            bins.append(cur_bin)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].values,
                order_col: pdf[order_col].values,
                "n_tokens": pdf[tokens_col].astype("int64").values,
                "bin_id": pd.Series(bins, dtype="int64").values,
                "offset": pd.Series(offs, dtype="int64").values,
                "truncated": (pdf[tokens_col].astype("int64") > budget).values,
            }
        )

    cols = [group_col, order_col, tokens_col]
    return df.select(*cols).groupBy(group_col).applyInPandas(pack, schema=out_schema)


def packing_stats(packed: DataFrame, group_col: str, budget: int) -> DataFrame:
    """Per-group packing efficiency: bins used, total docs/tokens, mean
    fill ratio — the numbers a data-mix owner actually monitors."""
    per_bin = packed.groupBy(group_col, "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"), F.count("*").alias("n_docs")
    )
    return per_bin.groupBy(group_col).agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        (
            F.sum(F.least(F.col("bin_tokens"), F.lit(budget))).cast("double")
            / (F.count("*") * budget)
        ).alias("fill_ratio"),
    )
