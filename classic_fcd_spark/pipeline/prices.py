"""Price joins and currency conversion — the J6/F9/F10/A4/A6/A17 family.

Every dashboard and staking-return money number in the reference flows
through "join to the daily average price, then convert":

- A17 daily avg price: AVG(price) GROUP BY date, denom
  (src/service/dashboard/getPriceHistory.ts:16-33).
- F9 getUSDValue (src/collector/block/helper.ts:8-23):
    uusd  -> amount
    uluna -> amount * price(uusd)
    other -> amount / (price(denom) / price(uusd))
  and 0 when the needed prices are missing.
- F10 Luna normalization (src/collector/staking/
  rewardAndCommissionSum.ts:56-78): uluna -> amount, else amount/price.
- A6 market cap = issuance x USD value (src/collector/block/network.ts:94-98).

Numeric policy: prices are carried as integer micro-units (`*_e6`
bigint) and every division is integer floor-division.  Floating point
would not hash-match across engines (Spark's partial aggregation sums
doubles in nondeterministic order); integer arithmetic is exact,
deterministic, and matches the reference's BigNumber string math in
spirit (SURVEY §1.3 decimal policy).

Scale: the daily-avg-price table is (days x denoms) rows — broadcast it;
the reward/volume side stays partitioned and never shuffles for these
joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _day(col) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd")


def price_interval_buckets_e6(
    prices: DataFrame, interval_minutes: int
) -> DataFrame:
    """(w, avg_price_e6, n_quotes, min_dt): A18 candle interval buckets
    with the integer-e6 average policy — avg = SUM(price-cents) * 10^4
    div COUNT (order-free exact on any engine/partitioning).  The one
    implementation behind BOTH the gated fcd_price_buckets_15m query and
    the serving get_market_price endpoint, so the numeric policy cannot
    diverge between them."""
    return (
        prices.select(
            F.window("datetime", f"{interval_minutes} minutes").alias("w"),
            F.round(F.col("price") * 100).cast("long").alias("p2"),
            "datetime",
        )
        .groupBy("w")
        .agg(
            F.expr("CAST(SUM(p2) * 10000 div COUNT(*) AS BIGINT)").alias(
                "avg_price_e6"
            ),
            F.count("*").alias("n_quotes"),
            F.min("datetime").alias("min_dt"),
        )
    )


def daily_avg_price_e6(prices: DataFrame) -> DataFrame:
    """A17: average price per (day, denom), in exact integer micro-units.

    avg_e6 = floor(sum(price_e2) * 10^4 / n) — price_e2 is the price in
    hundredths (exact for the fixture's 2-decimal prices), so the average
    is computed entirely in integers: bit-identical on any engine and
    any partitioning.
    """
    return (
        prices.select(
            _day("datetime").alias("day"),
            "denom",
            F.round(F.col("price") * 100).cast("long").alias("price_e2"),
        )
        .groupBy("day", "denom")
        .agg(F.sum("price_e2").alias("sum_e2"), F.count("*").alias("n"))
        .select(
            "day",
            "denom",
            F.expr("CAST(sum_e2 * 10000 div n AS BIGINT)").alias("avg_e6"),
        )
    )


def minute_price_e6(prices: DataFrame) -> DataFrame:
    """Active price per exact minute (getAllActivePrices — src/collector/
    block/helper.ts:32-41), µ-unit encoded.  Same column contract as
    daily_avg_price_e6 so with_day_prices works at either grain."""
    return prices.select(
        F.date_format(F.date_trunc("minute", "datetime"), "yyyy-MM-dd HH:mm:ss").alias(
            "minute"
        ),
        "denom",
        (F.round(F.col("price") * 100).cast("long") * 10000).alias("avg_e6"),
    )


def with_day_prices(
    df: DataFrame, avg_prices: DataFrame, day_col: str = "day", denom_col: str = "denom"
) -> DataFrame:
    """J6: attach (p_denom_e6, p_uusd_e6) per (time bucket, denom) via two
    broadcast joins against the tiny price table (daily_avg_price_e6 or
    minute_price_e6 — whichever grain `day_col` names).  Left joins:
    uluna has no price row and must survive (F9 prices it via uusd)."""
    tcol = next(c for c in avg_prices.columns if c not in ("denom", "avg_e6"))
    p_denom = avg_prices.select(
        F.col(tcol).alias(day_col),
        F.col("denom").alias(denom_col),
        F.col("avg_e6").alias("p_denom_e6"),
    )
    p_uusd = avg_prices.filter(F.col("denom") == "uusd").select(
        F.col(tcol).alias(day_col), F.col("avg_e6").alias("p_uusd_e6")
    )
    return df.join(F.broadcast(p_denom), [day_col, denom_col], "left").join(
        F.broadcast(p_uusd), day_col, "left"
    )


def usd_value_e6(amount_col: str = "total") -> Column:
    """F9 getUSDValue as column algebra over the joined price columns.

    Expects `p_denom_e6` / `p_uusd_e6` in scope (see with_day_prices).
    Intermediates go through DECIMAL(38,0) — issuance-sized amounts times
    e6 prices overflow int64 (matches the oracle's HUGEINT cast).
    """
    a = f"CAST({amount_col} AS DECIMAL(38,0))"
    return F.expr(
        f"""CAST(CASE
            WHEN p_uusd_e6 IS NULL THEN 0
            WHEN denom = 'uusd'  THEN {a} * 1000000
            WHEN denom = 'uluna' THEN {a} * p_uusd_e6
            WHEN p_denom_e6 IS NOT NULL
                 THEN {a} * p_uusd_e6 * 1000000 div p_denom_e6
            ELSE 0 END AS BIGINT)"""
    )


def luna_value_e6(amount_col: str = "total") -> Column:
    """F10 Luna normalization: uluna passes through, everything else is
    divided by its own daily avg price.  Rows without a price are the
    caller's to drop (the reference skips them — stakingReturn.ts:63-65).
    """
    a = f"CAST({amount_col} AS DECIMAL(38,0))"
    return F.expr(
        f"""CAST(CASE
            WHEN denom = 'uluna' THEN {a} * 1000000
            ELSE {a} * 1000000 * 1000000 div p_denom_e6
            END AS BIGINT)"""
    )
