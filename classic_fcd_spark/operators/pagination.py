"""Keyset pagination — the reference's hottest serving pattern.

Reference: WHERE id < :offset ORDER BY id DESC LIMIT n+1, with ``next``
set to the id of the n-th row (src/service/transaction/getTxList.ts:138-160,
L1 in SURVEY §2.6; limits {10,100} at src/controller/TransactionController.ts:165).

Spark-first: the filter + orderBy + limit pushes down (Catalyst
LimitPushDown, parquet min/max pruning on the key column), so each page is
a pruned scan, not a full sort.  The n+1 fetch to detect "has next page"
is preserved as the serving contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyset_page(
    df: DataFrame,
    key_col: str,
    limit: int,
    before: int | None = None,
    descending: bool = True,
) -> tuple[list, int | None]:
    """Serving-edge variant: return (page_rows, next_cursor).  The
    limit+1 collect is page-sized by construction — this is the terminal
    response materialization, so it returns ROWS, not a re-parallelized
    DataFrame (the r1 version round-tripped the page through
    createDataFrame for no consumer)."""
    rows = keyset_page_df(df, key_col, limit, before, descending).collect()
    next_cursor = None
    if len(rows) > limit:
        next_cursor = rows[limit - 1][key_col]
        rows = rows[:limit]
    return rows, next_cursor


def keyset_page_df(
    df: DataFrame,
    key_col: str,
    limit: int,
    before: int | None = None,
    descending: bool = True,
) -> DataFrame:
    """Pure-DataFrame variant (no driver collect) returning the n+1 rows;
    used by the correctness inventory where the result must stay a plan."""
    page = df
    if before is not None:
        page = page.filter(F.col(key_col) < before if descending else F.col(key_col) > before)
    order = F.col(key_col).desc() if descending else F.col(key_col).asc()
    return page.orderBy(order).limit(limit + 1)
