"""As-of (point-in-time) join.

Reference: "price one day before" — the latest price row at-or-before a
boundary timestamp, per denom (src/service/market/helper.ts:21-40, J10 in
SURVEY §2.3).  The reference runs one ORDER BY ... LIMIT 1 query per
lookup; at scale that is a correlated point query per row.

Spark-first design: union the two sides tagged left/right, sort within
each key partition once, and carry the most recent right-side value
forward with last(ignorenulls) — a single shuffle on the key, no
correlated subqueries, scales to arbitrarily many lookups per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key group.

    Right-side ties on timestamp resolve to the right row that sorts last
    (matching ORDER BY ts DESC LIMIT 1 with a deterministic tiebreak).
    """
    lcols = left.columns
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    ).select(  # align column order with l_tagged for unionByName
        *[F.col(c) for c in lcols], "__ts", "__side", *[f"__v_{v}" for v in value_cols]
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (__side=0) sort before left rows at the same timestamp, so a
    # right row dated exactly at left_ts IS visible to that left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for v in value_cols:
        out = out.withColumn(
            f"{v}{suffix}", F.last(f"__v_{v}", ignorenulls=True).over(w)
        )
    return (
        out.filter(F.col("__side") == 1)
        .drop("__ts", "__side", *[f"__v_{v}" for v in value_cols])
    )
