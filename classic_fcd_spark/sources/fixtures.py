"""Deterministic fcd-shaped fixtures (FIXTURES.md §1-§5).

Every value is a pure arithmetic/md5 function of the row index, so the
same rows can be regenerated in ANSI SQL (see DUCK_* constants) — that is
what lets the fcd domain pipeline be *oracle-checked*: Spark runs the
real path (nested JSON strings → from_json → explode → window), DuckDB
recomputes the aggregates straight from the arithmetic, and the results
must hash-match.

Shapes follow the reference (citations):
- blocks: src/orm/BlockEntity.ts:6-34 + decoded block_results reward
  events (src/lib/rpc.ts:58-91) with CSV '123ukrw,4uluna' amounts
  (src/collector/block/block.ts:116-130).
- txs: src/types/tx.d.ts:1-116 (msgs as {type, value-json}), success iff
  code NULL (src/lib/tx.ts:1-3).
- prices: src/orm/PriceEntity.ts:3-18 (per minute × denom).
- validators: src/orm/ValidatorInfoEntity.ts:11-106 (dimension).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Scale knob for the fcd fixture family: every row count (and every DUCK_*
# oracle CTE, which embeds the same constants at import) multiplies by
# this, so correctness holds at ANY scale — used to demonstrate the fcd
# plans stay flat at 10x (SPARK_GRAFT_FIXTURE_SCALE=10 bench run,
# BENCH_NOTES.md).
FIXTURE_SCALE = max(1, int(_os.environ.get("SPARK_GRAFT_FIXTURE_SCALE", "1")))

# ---------------------------------------------------------------------------
# Bronze-table semantics: in the medallion design these generators stand
# in for STORED bronze tables, so a generator is materialized once per
# session and every query reads the persisted table — regenerating the
# JSON-building projection per query would charge the bronze derivation
# to every downstream read (the reference's queries read Postgres tables,
# not the LCD decode).  Keyed by (session, generator, args); tiny per
# entry (≤ a few MB at scale 1), evicted when a new session appears.
# ---------------------------------------------------------------------------
_BRONZE_CACHE: dict = {}


def bronze_table(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, *args, **kwargs):
        key = (
            spark.sparkContext.applicationId,
            fn.__name__,
            args,
            tuple(sorted(kwargs.items())),
        )
        df = _BRONZE_CACHE.get(key)
        if df is None:
            # a dead/replaced session leaves stale persisted handles —
            # drop every entry not belonging to the current app
            for k in [k for k in _BRONZE_CACHE if k[0] != key[0]]:
                del _BRONZE_CACHE[k]
            df = fn(spark, *args, **kwargs).persist()
            _BRONZE_CACHE[key] = df
        return df

    return wrapped


FIXTURE_N_BLOCKS = 600 * FIXTURE_SCALE
BLOCK_SPACING_S = 450  # ~4 day-boundaries across the fixture (FIXTURES.md wants >=3)
CHAIN_ID = "fixture-1"
EPOCH_START = 1609459200  # 2021-01-01 00:00:00 UTC
DENOMS = ["uluna", "ukrw", "usdr", "uusd"]

# ---------------------------------------------------------------------------
# Shared arithmetic (Spark Column + DuckDB SQL string side by side; any
# change here must update both).
# ---------------------------------------------------------------------------


def _addr(i) -> F.Column:
    """Account address: 'terra1' + 38 hex chars derived from md5."""
    return F.concat(
        F.lit("terra1"),
        F.substring(F.md5(F.concat(F.lit("acct:"), i.cast("string"))), 1, 32),
        F.substring(F.md5(F.concat(F.lit("acct2:"), i.cast("string"))), 1, 6),
    )


def duck_addr(i_expr: str) -> str:
    return (
        f"'terra1' || substr(md5('acct:' || CAST({i_expr} AS VARCHAR)), 1, 32)"
        f" || substr(md5('acct2:' || CAST({i_expr} AS VARCHAR)), 1, 6)"
    )


def addr_str(i: int) -> str:
    """Python-side replica of _addr for fixed lookup parameters."""
    import hashlib

    h1 = hashlib.md5(f"acct:{i}".encode()).hexdigest()[:32]
    h2 = hashlib.md5(f"acct2:{i}".encode()).hexdigest()[:6]
    return f"terra1{h1}{h2}"


def tx_hash_str(i: int) -> str:
    """Python-side replica of the fixture tx hash md5('tx:i')."""
    import hashlib

    return hashlib.md5(f"tx:{i}".encode()).hexdigest()


def valaddr_str(i: int) -> str:
    """Python-side replica of _valaddr for fixed lookup parameters."""
    import hashlib

    h1 = hashlib.md5(f"val:{i}".encode()).hexdigest()[:32]
    h2 = hashlib.md5(f"val2:{i}".encode()).hexdigest()[:6]
    return f"terravaloper1{h1}{h2}"


def _valaddr(i) -> F.Column:
    return F.concat(
        F.lit("terravaloper1"),
        F.substring(F.md5(F.concat(F.lit("val:"), i.cast("string"))), 1, 32),
        F.substring(F.md5(F.concat(F.lit("val2:"), i.cast("string"))), 1, 6),
    )


def duck_valaddr(i_expr: str) -> str:
    return (
        f"'terravaloper1' || substr(md5('val:' || CAST({i_expr} AS VARCHAR)), 1, 32)"
        f" || substr(md5('val2:' || CAST({i_expr} AS VARCHAR)), 1, 6)"
    )


def _denom(i) -> F.Column:
    return F.element_at(F.array(*[F.lit(d) for d in DENOMS]), (i % 4 + 1).cast("int"))


def duck_denom(i_expr: str) -> str:
    return f"(['uluna','ukrw','usdr','uusd'])[(({i_expr}) % 4) + 1]"


# ---------------------------------------------------------------------------
# Blocks (with block_results reward events, CSV amounts — A1 input).
# ---------------------------------------------------------------------------
@bronze_table
def gen_blocks(spark: SparkSession, n: int = FIXTURE_N_BLOCKS) -> DataFrame:
    h = F.col("id")
    reward_amt = (h * 13 % 500 + 1).cast("string")
    reward_amt2 = (h * 11 % 300 + 1).cast("string")
    commission_amt = (h * 7 % 200 + 1).cast("string")
    return (
        spark.range(1, n + 1)
        .select(
            F.lit(CHAIN_ID).alias("chain_id"),
            h.alias("height"),
            F.timestamp_seconds(F.lit(EPOCH_START) + h * BLOCK_SPACING_S).alias("timestamp"),
            _valaddr(h % 20).alias("proposer"),
            F.array(
                F.struct(
                    _valaddr(h % 20).alias("validator"),
                    F.lit("rewards").alias("type"),
                    F.concat(
                        reward_amt, F.lit("ukrw,"), reward_amt2, F.lit("uluna")
                    ).alias("amount"),
                ),
                F.struct(
                    _valaddr((h + 1) % 20).alias("validator"),
                    F.lit("commission").alias("type"),
                    F.concat(commission_amt, F.lit("uusd")).alias("amount"),
                ),
            ).alias("reward_events"),
        )
    )


# ---------------------------------------------------------------------------
# Txs (nested LCD-style msgs as JSON strings — the real parse path).
# ---------------------------------------------------------------------------
@bronze_table
def gen_txs(spark: SparkSession, n: int = FIXTURE_N_BLOCKS) -> DataFrame:
    """One row per tx: block h contributes (h % 3) txs, tx index
    i = h * 3 + k (k < h % 3).  Msg mix by i % 5: 0,1 send; 2 multisend;
    3 delegate; 4 swap.  ~10% failed (code = 4 when i % 10 = 0)."""
    ks = F.when(
        F.col("id") % 3 > 0, F.sequence(F.lit(0), (F.col("id") % 3 - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    base = spark.range(1, n + 1).select(
        F.col("id").alias("h"), F.explode(ks).alias("k")
    )
    i = (F.col("h") * 3 + F.col("k")).alias("i")
    df = base.select("h", "k", i)
    i = F.col("i")
    amt = (i * 37 % 1000 + 1).cast("string")
    amt2 = (i * 37 % 1000 + 6).cast("string")  # amt + 5
    frm = _addr(i % 50)
    to = _addr((i * 7 + 1) % 50)
    to2 = _addr((i * 7 + 2) % 50)
    send_value = F.concat(
        F.lit('{"from_address":"'), frm,
        F.lit('","to_address":"'), to,
        F.lit('","amount":[{"denom":"'), _denom(i),
        F.lit('","amount":"'), amt, F.lit('"}]}'),
    )
    multi_value = F.concat(
        F.lit('{"inputs":[{"address":"'), frm,
        F.lit('","coins":[{"denom":"'), _denom(i),
        F.lit('","amount":"'), amt,
        F.lit('"},{"denom":"'), _denom(i + 1),
        F.lit('","amount":"'), amt2,
        F.lit('"}]}],"outputs":[{"address":"'), to,
        F.lit('","coins":[]},{"address":"'), to2, F.lit('","coins":[]}]}'),
    )
    delegate_value = F.concat(
        F.lit('{"delegator_address":"'), frm,
        F.lit('","validator_address":"'), _valaddr(i % 20),
        F.lit('","amount":{"denom":"uluna","amount":"'), amt, F.lit('"}}'),
    )
    swap_value = F.concat(
        F.lit('{"trader":"'), frm,
        F.lit('","offer_coin":{"denom":"'), _denom(i),
        F.lit('","amount":"'), amt,
        F.lit('"},"ask_denom":"'), _denom(i + 2), F.lit('"}'),
    )
    msg_type = (
        F.when(i % 5 < 2, F.lit("bank/MsgSend"))
        .when(i % 5 == 2, F.lit("bank/MsgMultiSend"))
        .when(i % 5 == 3, F.lit("staking/MsgDelegate"))
        .otherwise(F.lit("market/MsgSwap"))
    )
    msg_value = (
        F.when(i % 5 < 2, send_value)
        .when(i % 5 == 2, multi_value)
        .when(i % 5 == 3, delegate_value)
        .otherwise(swap_value)
    )
    # logs mirror the LCD tx shape (src/types/tx.d.ts): one log per msg,
    # swap msgs carry the 'swap' event with swap_coin/swap_fee "123denom"
    # attribute values (F19 input — src/collector/block/swap.ts:42-70);
    # failed txs have no logs at all (isSuccessfulTx gate).  Governance
    # activity (r10): successful non-swap txs with i % 11 == 3 carry a
    # proposal_deposit event whose proposal_id attribute (value i % 4)
    # is what detectAndUpdateProposal scans for
    # (src/collector/gov/collectProposal.ts:11-41 — ANY log attribute
    # with key 'proposal_id'); i % 11 == 7 carries a NON-numeric
    # proposal_id ("pid-…") that the reference's Number.isNaN(parseInt)
    # guard skips — the detection pipeline must too.
    swap_out_amt = (i * 23 % 800 + 1).cast("string")
    swap_fee_amt = (i * 3 % 50 + 1).cast("string")
    gov_event = F.concat(
        F.lit('[{"events":[{"type":"proposal_deposit","attributes":['),
        F.lit('{"key":"proposal_id","value":"'),
        F.when(i % 11 == 3, (i % 4).cast("string")).otherwise(
            F.concat(F.lit("pid-"), (i % 4).cast("string"))
        ),
        F.lit('"}]}]}]'),
    )
    logs_json = (
        F.when(i % 10 == 0, F.lit(None).cast("string"))
        .when(
            i % 5 == 4,
            F.concat(
                F.lit('[{"events":[{"type":"swap","attributes":['),
                F.lit('{"key":"swap_coin","value":"'), swap_out_amt, _denom(i + 2),
                F.lit('"},{"key":"swap_fee","value":"'), swap_fee_amt, _denom(i + 2),
                F.lit('"}]}]}]'),
            ),
        )
        .when((i % 11 == 3) | (i % 11 == 7), gov_event)
        .otherwise(F.lit('[{"events":[]}]'))
    )
    return df.select(
        F.lit(CHAIN_ID).alias("chain_id"),
        F.md5(F.concat(F.lit("tx:"), i.cast("string"))).alias("hash"),
        F.col("h").alias("height"),
        F.timestamp_seconds(F.lit(EPOCH_START) + F.col("h") * BLOCK_SPACING_S).alias("timestamp"),
        F.when(i % 10 == 0, F.lit(4)).cast("int").alias("code"),
        F.array(
            F.struct(msg_type.alias("type"), msg_value.alias("value"))
        ).alias("msgs"),
        F.array(
            F.struct(_denom(i + 3).alias("denom"), (i % 90 + 10).cast("string").alias("amount"))
        ).alias("fee"),
        logs_json.alias("logs_json"),
    )


# DuckDB CTE regenerating the tx index space (h, k, i) — prefix for the
# fcd oracle queries.
DUCK_TX_BASE = f"""
    txbase AS (
        SELECT h, k, h * 3 + k AS i
        FROM (SELECT unnest(range(1, {{n}} + 1)) AS h),
             (SELECT unnest(range(0, 3)) AS k)
        WHERE k < h % 3
    )
"""


# ---------------------------------------------------------------------------
# Minute prices (J6/A17 input) and validator dimension.
# ---------------------------------------------------------------------------
# 4500 minutes ≈ 3.125 days — covers every day the 600-block fixture spans
# (600 × 450 s), so every (day, denom) reward row finds a daily avg price;
# both sides scale by FIXTURE_SCALE so the ratio is scale-invariant.
FIXTURE_N_PRICE_MINUTES = 4500 * FIXTURE_SCALE


@bronze_table
def gen_prices(spark: SparkSession, n_minutes: int = FIXTURE_N_PRICE_MINUTES) -> DataFrame:
    """Minute prices per denom (src/orm/PriceEntity.ts:3-18).  uluna has no
    price row by design — the reference prices everything *in* Luna/USD and
    converts uluna itself via the uusd price (F9 in SURVEY §2.8)."""
    m = F.col("id")
    rows = spark.range(0, n_minutes).crossJoin(
        spark.createDataFrame([(d,) for d in DENOMS if d != "uluna"], ["denom"])
    )
    # positive deterministic walk: 1 + ((m*seed) % 100)/100
    seed = F.when(F.col("denom") == "ukrw", 17).when(F.col("denom") == "usdr", 29).otherwise(41)
    return rows.select(
        F.col("denom"),
        F.timestamp_seconds(F.lit(EPOCH_START) + m * 60).alias("datetime"),
        (F.lit(1.0) + (m * seed % 100).cast("double") / 100.0).alias("price"),
    )


# Mirrors the Spark arithmetic above for the DuckDB oracle; {n} = n_minutes.
DUCK_PRICES = """
    prices AS (
        SELECT denom,
               strftime(make_timestamp((1609459200 + m * 60) * 1000000), '%Y-%m-%d') AS day,
               100 + (m * seed) % 100 AS price_e2
        FROM (SELECT unnest(range(0, {n})) AS m),
             (SELECT * FROM (VALUES ('ukrw', 17), ('usdr', 29), ('uusd', 41)) AS t(denom, seed))
    )
"""

ISSUANCES = {
    # fixed per-denom total issuance (micro units) — stand-in for the LCD
    # /supply/total snapshot the reference reads (A6 market cap input).
    "uluna": 2_000_000_000,
    "ukrw": 800_000_000,
    "usdr": 50_000_000,
    "uusd": 900_000_000,
}


@bronze_table
def gen_issuances(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(d, a) for d, a in sorted(ISSUANCES.items())], ["denom", "issuance"]
    )


DUCK_ISSUANCES = """
    issuances AS (
        SELECT * FROM (VALUES ('ukrw', 800000000), ('uluna', 2000000000),
                              ('usdr', 50000000), ('uusd', 900000000)) AS t(denom, issuance)
    )
"""


# ---------------------------------------------------------------------------
# general_info minute snapshots (A10/A15/A16 inputs) — staking ratio and
# bonded tokens per minute (src/orm/GeneralInfoEntity.ts:3-36).
# ---------------------------------------------------------------------------
@bronze_table
def gen_general_info(spark: SparkSession, n_minutes: int = FIXTURE_N_PRICE_MINUTES) -> DataFrame:
    m = F.col("id")
    return spark.range(0, n_minutes).select(
        F.timestamp_seconds(F.lit(EPOCH_START) + m * 60).alias("datetime"),
        (300000 + m * 31 % 400000).alias("staking_ratio_e6"),
        (1000000 + m * 7919 % 500000).alias("bonded_tokens"),
        (m * 53 % 100000).alias("seigniorage"),
    )


DUCK_GENERAL = """
    general_info AS (
        SELECT m,
               strftime(make_timestamp((1609459200 + m * 60) * 1000000), '%Y-%m-%d') AS day,
               300000 + (m * 31) % 400000 AS staking_ratio_e6,
               1000000 + (m * 7919) % 500000 AS bonded_tokens,
               (m * 53) % 100000 AS seigniorage
        FROM (SELECT unnest(range(0, {n})) AS m)
    )
"""


# ---------------------------------------------------------------------------
# Governance: votes + delegations (J8/A20/D6 inputs).
# Voter pool overlaps validator accounts (v%7==0 -> validator account) and
# plain delegators, and each voter votes repeatedly (small voter space) so
# the latest-vote dedup is actually exercised.
# ---------------------------------------------------------------------------
FIXTURE_N_VOTES = 400 * FIXTURE_SCALE
FIXTURE_N_DELEGATIONS = 120 * FIXTURE_SCALE


@bronze_table
def gen_votes(spark: SparkSession, n: int = FIXTURE_N_VOTES) -> DataFrame:
    v = F.col("id")
    voter = F.when(v % 7 == 0, _addr(v % 20 + 1000)).otherwise(_addr(v % 40))
    return spark.range(0, n).select(
        v.alias("vote_id"),
        (v % 3).alias("proposal_id"),
        voter.alias("voter"),
        F.element_at(
            F.array(F.lit("Yes"), F.lit("No"), F.lit("NoWithVeto"), F.lit("Abstain")),
            (v % 4 + 1).cast("int"),
        ).alias("option"),
        F.timestamp_seconds(F.lit(EPOCH_START) + v * 30).alias("ts"),
    )


DUCK_VOTES = f"""
    votes AS (
        SELECT v AS vote_id, v % 3 AS proposal_id,
               CASE WHEN v % 7 = 0 THEN {duck_addr("(v % 20) + 1000")}
                    ELSE {duck_addr("v % 40")} END AS voter,
               (['Yes','No','NoWithVeto','Abstain'])[(v % 4) + 1] AS option
        FROM (SELECT unnest(range(0, {FIXTURE_N_VOTES})) AS v)
    )
"""


@bronze_table
def gen_delegations(spark: SparkSession, n: int = FIXTURE_N_DELEGATIONS) -> DataFrame:
    d = F.col("id")
    delegator = F.when(d % 5 == 0, _addr(d % 20 + 1000)).otherwise(_addr(d % 40))
    return spark.range(0, n).select(
        delegator.alias("delegator_address"),
        _valaddr(d % 20).alias("validator_address"),
        (d * 11 % 500 + 10).alias("shares"),
    )


DUCK_DELEGATIONS = f"""
    deleg AS (
        SELECT CASE WHEN d % 5 = 0 THEN {duck_addr("(d % 20) + 1000")}
                    ELSE {duck_addr("d % 40")} END AS delegator,
               {duck_valaddr("d % 20")} AS validator,
               d * 11 % 500 + 10 AS shares
        FROM (SELECT unnest(range(0, {FIXTURE_N_DELEGATIONS})) AS d)
    )
"""


FIXTURE_N_UNBONDINGS = 40


def gen_unbondings(spark: SparkSession, n: int = FIXTURE_N_UNBONDINGS) -> DataFrame:
    """In-flight unbondings in the LCD staking/unbonding_delegations
    shape the reference's getUndelegateSchedule flattens (W10,
    src/service/staking/helper.ts:115-140): one row per (delegator,
    validator) with an `entries` array of (creation_height,
    completion_time ISO string, balance).  Entry e of unbonding u
    completes at genesis + (u*13 + e*5) hours — deterministic
    arithmetic, DuckDB-regenerable via DUCK_UNBONDINGS."""
    u = F.col("id")

    def entry(e):
        return F.struct(
            (u * 7 + e * 3 + 100).cast("long").alias("creation_height"),
            F.date_format(
                F.timestamp_seconds(F.lit(1609459200) + (u * 13 + e * 5) * 3600),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("completion_time"),
            ((u * 17 + e * 11) % 900 + 1).cast("long").alias("balance"),
        )

    entries = F.transform(F.sequence(F.lit(0), (u % 3).cast("int")), entry)
    delegator = F.when(u % 4 == 0, _addr(u % 20 + 1000)).otherwise(_addr(u % 30))
    return spark.range(0, n).select(
        delegator.alias("delegator_address"),
        _valaddr(u % 20).alias("validator_address"),
        entries.alias("entries"),
    )


DUCK_UNBONDINGS = f"""
    unbond AS (
        SELECT CASE WHEN u % 4 = 0 THEN {duck_addr("(u % 20) + 1000")}
                    ELSE {duck_addr("u % 30")} END AS delegator,
               {duck_valaddr("u % 20")} AS validator,
               u * 7 + e * 3 + 100 AS creation_height,
               strftime(make_timestamp((1609459200 + (u * 13 + e * 5) * 3600)
                                       * 1000000),
                        '%Y-%m-%dT%H:%M:%SZ') AS completion_time,
               (u * 17 + e * 11) % 900 + 1 AS balance
        FROM (SELECT unnest(range(0, {FIXTURE_N_UNBONDINGS})) AS u)
        CROSS JOIN (SELECT unnest(range(0, 3)) AS e)
        WHERE e <= u % 3
    )
"""


# ---------------------------------------------------------------------------
# Proposals dim (governance read surface — getProposals.ts:24-36) and the
# on-chain listing used by the removeDeletedProposals anti-join (D1,
# src/collector/gov/removeDeletedProposals.ts:10-33): proposal 5 exists in
# the store but is gone from the chain and must disappear from results.
# ---------------------------------------------------------------------------
FIXTURE_N_PROPOSALS = 8

PROPOSAL_STATUSES = ["VotingPeriod", "DepositPeriod", "Passed", "Rejected"]
PROPOSAL_TYPES = [
    "gov/TextProposal",
    "treasury/TaxRateUpdateProposal",
    "treasury/RewardWeightUpdateProposal",
    "distribution/CommunityPoolSpendProposal",
    "params/ParameterChangeProposal",
    "custom/FancyProposal",  # unknown type: display falls through verbatim
]


@bronze_table
def gen_proposals(spark: SparkSession, n: int = FIXTURE_N_PROPOSALS) -> DataFrame:
    p = F.col("id")
    return spark.range(0, n).select(
        p.alias("proposal_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in PROPOSAL_STATUSES]), (p % 4 + 1).cast("int")
        ).alias("status"),
        F.element_at(
            F.array(*[F.lit(t) for t in PROPOSAL_TYPES]), (p * 5 % 6 + 1).cast("int")
        ).alias("ptype"),
        F.concat(F.lit("proposal-"), p.cast("string")).alias("title"),
        _addr(p + 500).alias("proposer"),
        (p * 1700 % 9000 + 100).alias("deposit_total"),
    )


# Per-proposal deposit rows (src/orm/ProposalEntity.ts deposits jsonb —
# each entry {depositor, amount: Coin[]}): 5 deposits per proposal,
# multi-coin every third deposit so the Coin[] shape is exercised.
FIXTURE_N_DEPOSITS = FIXTURE_N_PROPOSALS * 5


@bronze_table
def gen_deposits(spark: SparkSession, n: int = FIXTURE_N_DEPOSITS) -> DataFrame:
    d = F.col("id")
    depositor = F.when(d % 4 == 0, _addr(d % 20 + 1000)).otherwise(_addr(d % 30))
    base_coin = F.struct(
        F.lit("uluna").alias("denom"),
        (d * 700 % 5000 + 100).cast("string").alias("amount"),
    )
    extra_coin = F.struct(
        F.lit("ukrw").alias("denom"),
        (d * 1300 % 9000 + 500).cast("string").alias("amount"),
    )
    coins = F.when(d % 3 == 0, F.array(base_coin, extra_coin)).otherwise(
        F.array(base_coin)
    )
    return spark.range(0, n).select(
        d.alias("deposit_id"),
        (d % FIXTURE_N_PROPOSALS).alias("proposal_id"),
        depositor.alias("depositor"),
        coins.alias("amount"),
    )


@bronze_table
def gen_chain_proposal_ids(spark: SparkSession, n: int = FIXTURE_N_PROPOSALS) -> DataFrame:
    """The LCD's current on-chain proposal listing: id 5 was removed on
    chain (deposit-period expiry burns it) — the D1 delete target."""
    return spark.range(0, n).filter(F.col("id") % 7 != 5).select(
        F.col("id").alias("chain_proposal_id")
    )


DUCK_PROPOSALS = f"""
    proposals AS (
        SELECT p AS proposal_id,
               (['VotingPeriod','DepositPeriod','Passed','Rejected'])[(p % 4) + 1] AS status,
               (['gov/TextProposal','treasury/TaxRateUpdateProposal',
                 'treasury/RewardWeightUpdateProposal',
                 'distribution/CommunityPoolSpendProposal',
                 'params/ParameterChangeProposal','custom/FancyProposal'])[(p * 5 % 6) + 1] AS ptype,
               'proposal-' || CAST(p AS VARCHAR) AS title,
               {duck_addr("p + 500")} AS proposer,
               p * 1700 % 9000 + 100 AS deposit_total
        FROM (SELECT unnest(range(0, {FIXTURE_N_PROPOSALS})) AS p)
        WHERE p % 7 <> 5
    )
"""


def duck_validator_status(i_expr: str) -> str:
    """DuckDB twin of gen_validators' status column (below)."""
    return (
        f"CASE WHEN ({i_expr}) % 7 = 3 THEN 'jailed' "
        f"WHEN ({i_expr}) % 5 = 1 THEN 'inactive' "
        f"WHEN ({i_expr}) % 5 = 2 THEN 'unbonding' "
        f"WHEN ({i_expr}) % 5 = 3 THEN 'active' "
        f"ELSE 'unknown' END"
    )


@bronze_table
def gen_validators(spark: SparkSession, n: int = 20) -> DataFrame:
    """Validator dim.  `status` applies the reference's LCD→display
    mapping (src/collector/staking/validatorDetails.ts:23-44
    getValidatorStatus: jailed wins, then LCD code 1/2/3 →
    inactive/unbonding/active, else unknown) to deterministic raw
    fields (jailed = v%7==3, LCD code = v%5 so code 0 and 4 exercise
    the UNKNOWN branch)."""
    v = F.col("id")
    status = (
        F.when(v % 7 == 3, F.lit("jailed"))
        .when(v % 5 == 1, F.lit("inactive"))
        .when(v % 5 == 2, F.lit("unbonding"))
        .when(v % 5 == 3, F.lit("active"))
        .otherwise(F.lit("unknown"))
    )
    return spark.range(0, n).select(
        _valaddr(v).alias("operator_address"),
        _addr(v + 1000).alias("account_address"),
        F.concat(F.lit("validator-"), v.cast("string")).alias("moniker"),
        (v * 1000 + 5000).cast("decimal(38,10)").alias("voting_power"),
        (F.lit(0.01) + (v % 10).cast("double") / 100.0).alias("commission_rate"),
        status.alias("status"),
    )


# ---------------------------------------------------------------------------
# Skewed account_tx corpus — the exchange-wallet regime (VERDICT r10
# item 2).  The reference's hottest serving workload is one account
# holding a disproportionate share of account_tx (the reason for the
# forced bitmap-scan hack at src/service/transaction/getTxList.ts:
# 152-153); this fixture reproduces that shape for the skew bench and
# the partition-spread asserts: ONE exchange account on `hot_share` of
# all rows, the rest on a zipf-ish tail.
# ---------------------------------------------------------------------------
EXCHANGE_ACCT_I = 90_000  # outside the normal fixture account space


def gen_account_tx_skewed(
    spark: SparkSession,
    n_rows: int = 200_000,
    hot_share: float = 0.2,
    n_tail_accounts: int = 5_000,
) -> DataFrame:
    """account_tx-silver-shaped rows (account, hash, height, timestamp)
    where addr_str(EXCHANGE_ACCT_I) holds ~hot_share of the rows and the
    tail follows a deterministic zipf-ish decay (tail account j gets
    weight ∝ 1/(1+j) via an inverse-cdf index map — no randomness, so
    every run and both join variants see identical bytes)."""
    r = F.col("id")
    hot_mod = max(2, int(round(1.0 / hot_share)))
    # zipf-ish tail: map a uniform residue u in [0,1) to account index
    # floor(N^u) - 1 style decay (heavier mass at small indices)
    u = (r * 2654435761 % 1_000_003).cast("double") / 1_000_003.0
    tail_i = F.floor(
        F.pow(F.lit(float(n_tail_accounts)), u) - 1
    ).cast("long")
    acct_i = F.when(r % hot_mod == 0, F.lit(EXCHANGE_ACCT_I)).otherwise(tail_i)
    return spark.range(0, n_rows).select(
        _addr(acct_i).alias("account"),
        F.md5(F.concat(F.lit("tx:"), (r / 3).cast("long").cast("string"))).alias(
            "hash"
        ),
        (r / 3).cast("long").alias("height"),
        F.timestamp_seconds(
            F.lit(EPOCH_START) + (r / 3).cast("long") * BLOCK_SPACING_S
        ).alias("timestamp"),
    )


# ---------------------------------------------------------------------------
# Oracle-grade twin of the exchange regime (r13): the same one-hot-key
# shape in PURE INTEGER arithmetic — gen_account_tx_skewed's zipf tail
# goes through floor(pow(...)), which is libm-territory a cross-engine
# hash compare cannot sit on — plus the accounts DIMENSION the account
# page family enriches against (labels/segments/lifetime stats, the
# attributes the reference joins from its account tables behind
# src/service/transaction/getTxList.ts:152-153).  Both generators have
# a DUCK_* CTE twin below so the enriched page is driver-oracled.
# ---------------------------------------------------------------------------
FIXTURE_N_ACCOUNT_TX = 60_000 * FIXTURE_SCALE
ACCOUNT_TX_TAIL = 4_999  # tail universe; each ~0.016% of rows
ACCOUNTS_DIM_HOLE = 17  # dim misses every i % 17 == 3 (left-join proof)


@bronze_table
def gen_account_tx_page(
    spark: SparkSession, n_rows: int = FIXTURE_N_ACCOUNT_TX
) -> DataFrame:
    """account_tx fact where the exchange wallet holds exactly 20% of
    rows (r % 5 == 0) and the tail spreads uniformly over
    ACCOUNT_TX_TAIL accounts via a multiplicative-hash residue — every
    value is integer arithmetic both engines compute bit-identically
    (DUCK_ACCOUNT_TX_CTE is the SQL twin)."""
    r = F.col("id")
    tail_i = (r * 2654435761 % 1_000_003) % ACCOUNT_TX_TAIL
    acct_i = F.when(r % 5 == 0, F.lit(EXCHANGE_ACCT_I)).otherwise(tail_i)
    return spark.range(0, n_rows).select(
        _addr(acct_i).alias("account"),
        F.md5(F.concat(F.lit("atx:"), r.cast("string"))).alias("hash"),
        F.floor(r / 3).cast("long").alias("height"),
        F.timestamp_seconds(
            F.lit(EPOCH_START) + F.floor(r / 3) * BLOCK_SPACING_S
        ).alias("timestamp"),
    )


@bronze_table
def gen_accounts_dim(spark: SparkSession) -> DataFrame:
    """The accounts dimension: one row per tail account plus the
    exchange wallet, with arithmetic label/segment/lifetime attributes;
    every i % ACCOUNTS_DIM_HOLE == 3 index is MISSING so the
    enrichment's left semantics are observable in the oracle (the
    exchange index 90000 % 17 == 2 is present)."""
    i = F.col("id")
    ids = spark.range(0, ACCOUNT_TX_TAIL).union(
        spark.range(EXCHANGE_ACCT_I, EXCHANGE_ACCT_I + 1)
    )
    labels = F.array(
        F.lit("retail"), F.lit("whale"), F.lit("bot"), F.lit("contract")
    )
    return ids.filter(i % ACCOUNTS_DIM_HOLE != 3).select(
        _addr(i).alias("account"),
        F.when(i == EXCHANGE_ACCT_I, F.lit("exchange"))
        .otherwise(F.element_at(labels, (i % 4 + 1).cast("int")))
        .alias("label"),
        (i * 7 % 11).alias("segment"),
        (i * 13 % 997).alias("lifetime_txs"),
    )


DUCK_ACCOUNT_TX_CTE = f"""
    atx AS (
        SELECT r,
               CASE WHEN r % 5 = 0 THEN {EXCHANGE_ACCT_I}
                    ELSE ((r * 2654435761) % 1000003) % {ACCOUNT_TX_TAIL}
               END AS i
        FROM (SELECT unnest(range(0, {FIXTURE_N_ACCOUNT_TX})) AS r)
    )
"""

DUCK_ACCOUNTS_DIM_CTE = f"""
    accounts_dim AS (
        SELECT i,
               CASE WHEN i = {EXCHANGE_ACCT_I} THEN 'exchange'
                    ELSE (['retail','whale','bot','contract'])[(i % 4) + 1]
               END AS label,
               (i * 7) % 11 AS segment,
               (i * 13) % 997 AS lifetime_txs
        FROM (SELECT unnest(range(0, {ACCOUNT_TX_TAIL})) AS i
              UNION ALL SELECT {EXCHANGE_ACCT_I})
        WHERE i % {ACCOUNTS_DIM_HOLE} <> 3
    )
"""
