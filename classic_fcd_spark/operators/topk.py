"""Ranking / share-of-total operators.

References: richlist percentage = amount / total_supply
(src/collector/richlist.ts:15-37, A22), delegator weights = shares /
sum(shares) ordered (src/service/staking/getDelegators.ts:18-48, A21/W11),
validators ORDER BY voting power (src/service/staking/getValidators.ts:5-9).

Scale note: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
a per-partition top-k followed by a driver-side merge of k·partitions
rows, NOT a global sort.  That is the right plan at 100 TB.  The
share-of-total uses an unpartitioned window ONLY on the already-reduced
aggregate (rows = number of keys), never on raw fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_col: str, k: int, *tiebreak: str) -> DataFrame:
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*order).limit(k)


def with_share_of_total(
    df: DataFrame, value_col: str, out_col: str = "share"
) -> DataFrame:
    """amount / total as a fraction, via an empty-frame window (one pass,
    no collect of the scalar to the driver)."""
    w = Window.partitionBy()
    return df.withColumn(out_col, F.col(value_col) / F.sum(value_col).over(w))


def ranked(
    df: DataFrame,
    order_col: str,
    rank_col: str = "rank",
    partition_cols: list[str] | None = None,
    *tiebreak: str,
) -> DataFrame:
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.orderBy(*order)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w))
