"""Ordered analytics: the reference computes all of these in JS loops over
arrays fetched from Postgres (SURVEY §2.5); here they are real Window specs,
which distribute (partitioned windows) instead of running on one node.

Scale note: unpartitioned ordered windows (cumulative series over *days*)
are safe because the row count equals the number of days/minutes — tiny.
Per-key windows (per denom / per validator / per account) partition by key
and therefore scale horizontally. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Running sum — reference: src/service/dashboard/getAccountGrowth.ts:6-55,
    getBlockRewards.ts:5-27, getTransactionVol.ts:5-36 (W1-W3)."""
    w = Window.orderBy(order_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def day_over_day(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Periodic (diff-from-previous) series — reference:
    src/service/dashboard/getRegisteredAccounts.ts:4-30 (W4), and the
    one-day price variation at src/service/market/getPrice.ts:92-116 (W6)."""
    w = Window.orderBy(order_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(order_col)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col, 1).over(w))


def moving_avg(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    trailing_rows: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing-N moving average — reference: the 10-day staking-return MA at
    src/service/dashboard/getStakingReturn.ts:15-43 (W5)."""
    w = Window.orderBy(order_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(order_col)
    w = w.rowsBetween(-(trailing_rows - 1), Window.currentRow)
    return df.withColumn(out_col, F.avg(value_col).over(w))


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | Column,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """DISTINCT ON equivalent: keep the newest row per key — reference:
    src/service/dashboard/getSeigniorageProceeds.ts:17-31 (W7),
    getGeneralInfo.ts:21-37 (W8), and the latest-vote-per-voter dedup at
    src/service/governance/helper/voteSummary.ts:124 (D6).

    ``tiebreak_cols`` make row_number deterministic when order_col ties.
    """
    order = [F.col(order_col).desc() if isinstance(order_col, str) else order_col]
    for c in tiebreak_cols or []:
        order.append(F.col(c).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    range_end: Column,
    out_col: str = "twavg",
) -> DataFrame:
    """Time-weighted average of a step function — the reference's hardest
    operator (SURVEY §2.5 W9): it reconstructs voting power backwards from
    now through delegation events in a JS loop
    (src/service/staking/helper.ts:142-211).

    Spark-first formulation: each event starts a segment that lasts until
    the next event (lead) or ``range_end``; the average weights each
    segment's value by its duration.  One shuffle on ``key_cols``; no
    driver-side iteration, so it scales to billions of events.

    Returns one row per key: key_cols + [out_col].
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    seg_end = F.coalesce(F.lead(ts_col, 1).over(w), range_end)
    seg_secs = F.col("__seg_end").cast("double") - F.col(ts_col).cast("double")
    return (
        df.withColumn("__seg_end", seg_end)
        .withColumn("__dur", seg_secs)
        .groupBy(*key_cols)
        .agg(
            (F.sum(F.col(value_col) * F.col("__dur")) / F.sum("__dur")).alias(out_col)
        )
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Gap-based sessionization: events of a key belong to one session
    until a silence longer than `gap_seconds` starts a new one — the
    standard web/product-analytics operator (and the batch twin of
    Structured Streaming's session_window, which this engine would use
    on the live path).

    Formulation: is_new = (ts - lag(ts)) > gap; session ordinal =
    running SUM of is_new per key — two stacked windows over ONE
    partitioning/ordering, so Catalyst plans a single sort + a single
    shuffle on the key.  Output adds `session_id` (ordinal within key,
    0-based): deterministic, join-backable onto the input row.

    Boundary convention matches Structured Streaming's session_window
    (verified empirically in tests/test_sessionize.py): an event arriving
    EXACTLY `gap_seconds` after the previous one still MERGES into the
    session — only a strictly longer silence splits — so the batch and
    streaming twins compute identical sessions.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col, 1).over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "long"
        ),
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Per-session rollup over sessionize: (key, session_id, start, end,
    n_events, duration_secs) — one extra map-side-combining aggregate on
    (key, session_id)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1_000_000.0
        ).alias("duration_secs"),
    )


# ---------------------------------------------------------------------------
# SCD2 history from a snapshot stream: collapse repeated per-entity
# snapshots (the reference polls validator/general_info state daily —
# src/collector/general: same shape) into change intervals
# (valid_from, valid_to], the warehouse "slowly changing dimension
# type 2" layout.  Storage shrinks from O(snapshots) to O(changes), and
# point-in-time enrichment becomes an interval join / as-of join against
# the collapsed table (operators/rangejoin.py, operators/asof.py).
#
# Plan shape: change detection is lag() per attribute and interval
# closing is lead() — BOTH over the same (key, ts) partitioning, so
# Catalyst plans ONE shuffle + one sort for the whole collapse.
# ---------------------------------------------------------------------------
def scd2_from_snapshots(
    snaps: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """(keys, attrs, valid_from, valid_to, is_current) — one row per
    (entity, attribute-state run).  A row is opened by the first
    snapshot where any attribute differs from the entity's previous
    snapshot (null-safe comparison: NULL -> value counts as a change);
    `valid_to` is the next change's timestamp (exclusive) or NULL for
    the open (current) run.  Deterministic given distinct snapshot
    timestamps per key — the snapshot-poller contract."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a, 1).over(w))
    first = F.lag(ts_col, 1).over(w).isNull()
    starts = (
        snaps.select(*key_cols, ts_col, *attr_cols)
        .withColumn("__chg", first | changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        starts.withColumn("valid_to", F.lead(ts_col, 1).over(w2))
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull())
    )
