"""As-of (point-in-time) join.

Reference: "price one day before" — the latest price row at-or-before a
boundary timestamp, per denom (src/service/market/helper.ts:21-40, J10 in
SURVEY §2.3).  The reference runs one ORDER BY ... LIMIT 1 query per
lookup; at scale that is a correlated point query per row.

Spark-first design: union the two sides tagged left/right, sort within
each key partition once, and carry the most recent right-side row
forward with last(ignorenulls) — a single shuffle on the key, no
correlated subqueries, scales to arbitrarily many lookups per key.

The carried payload is a STRUCT of the value columns, not the bare
columns: last(ignorenulls) then skips only the left-side sentinel rows
(whole struct NULL) while a genuinely-NULL value *inside* the matched
right row propagates as NULL — exact ASOF semantics.
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
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key group.

    Right-side ties on timestamp resolve deterministically: by
    ``right_tiebreak`` columns when given, else by the value struct
    itself (field-wise comparison) — matching ORDER BY ts DESC LIMIT 1
    with a defined tiebreak, independent of partitioning order.
    """
    lcols = left.columns
    tiebreak = right_tiebreak or value_cols
    r_struct = F.struct(
        *[F.col(c).alias(f"__tb_{n}") for n, c in enumerate(tiebreak)],
        *[F.col(v).alias(v) for v in value_cols],
    )
    null_struct_ddl = ", ".join(
        [
            f"`__tb_{n}`: {right.schema[c].dataType.simpleString()}"
            for n, c in enumerate(tiebreak)
        ]
        + [f"`{v}`: {right.schema[v].dataType.simpleString()}" for v in value_cols]
    )
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(f"struct<{null_struct_ddl}>").alias("__vs"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__vs"),
    ).select(  # align column order with l_tagged for unionByName
        *[F.col(c) for c in lcols], "__ts", "__side", "__vs"
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (__side=0) sort before left rows at the same timestamp, so a
    # right row dated exactly at left_ts IS visible to that left row; among
    # right rows tied on __ts the greatest __vs (tiebreak-first struct) is
    # the one last() sees — a total, deterministic order.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__vs").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn("__vs_last", F.last("__vs", ignorenulls=True).over(w))
    for v in value_cols:
        out = out.withColumn(f"{v}{suffix}", F.col(f"__vs_last.{v}"))
    return out.filter(F.col("__side") == 1).drop("__ts", "__side", "__vs", "__vs_last")
