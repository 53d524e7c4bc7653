"""fcd serving read surfaces added in r3: proposals listing, general-info
daily history (seigniorage / staking ratio), and bank balance assembly.

Same oracle model as queries/fcd.py: fixtures are pure arithmetic, the
DuckDB oracle regenerates them in SQL, and a hash match proves the whole
Spark path (JSON parse → normalize → joins → windows → aggregates).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from classic_fcd_spark.functions.compat import (
    freed_rate,
    normalize_account,
    vesting_balance,
)
from classic_fcd_spark.functions.parsemsg import (
    proposal_status_display,
    proposal_type_display,
)
from classic_fcd_spark.operators.windows import latest_per_key
from classic_fcd_spark.queries.registry import register
from classic_fcd_spark.sources.fixtures import (
    DUCK_GENERAL,
    DUCK_PROPOSALS,
    DUCK_VOTES,
    FIXTURE_N_PRICE_MINUTES as NP,
    duck_addr,
    gen_chain_proposal_ids,
    gen_general_info,
    gen_proposals,
    gen_validators,
    gen_votes,
)

_VOTE_OPTIONS = ["Yes", "No", "NoWithVeto", "Abstain"]


# ---------------------------------------------------------------------------
# Proposals read surface: status/type display maps (F20), latest-vote
# tally (D6 + A20 count shape), non-voting validators (J9 left_anti),
# on-chain removal (D1 anti-delete).
# ---------------------------------------------------------------------------
@register(
    "fcd_proposals",
    f"""
    WITH {DUCK_PROPOSALS},
    {DUCK_VOTES},
    latest AS (
        SELECT proposal_id, voter, option FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY proposal_id, voter ORDER BY vote_id DESC) AS rn
            FROM votes
        ) WHERE rn = 1
    ),
    tallies AS (
        SELECT proposal_id,
               COUNT(*) FILTER (WHERE option = 'Yes')        AS yes,
               COUNT(*) FILTER (WHERE option = 'No')         AS no,
               COUNT(*) FILTER (WHERE option = 'NoWithVeto') AS no_with_veto,
               COUNT(*) FILTER (WHERE option = 'Abstain')    AS abstain
        FROM latest GROUP BY 1
    ),
    vals AS (SELECT {duck_addr("x + 1000")} AS acct
             FROM (SELECT unnest(range(0, 20)) AS x)),
    nonvoting AS (
        SELECT p.proposal_id, COUNT(*) AS n_nonvoting_validators
        FROM proposals p CROSS JOIN vals v
        WHERE NOT EXISTS (
            SELECT 1 FROM latest l
            WHERE l.proposal_id = p.proposal_id AND l.voter = v.acct
        )
        GROUP BY 1
    )
    SELECT p.proposal_id AS proposal_id, p.status AS status,
           CASE WHEN p.status = 'VotingPeriod' THEN 'Voting'
                WHEN p.status = 'DepositPeriod' THEN 'Deposit'
                ELSE p.status END AS status_display,
           CASE p.ptype
                WHEN 'gov/TextProposal' THEN 'Text Proposal'
                WHEN 'treasury/TaxRateUpdateProposal' THEN 'Tax-rate Update'
                WHEN 'treasury/RewardWeightUpdateProposal' THEN 'Reward-weight Update'
                WHEN 'distribution/CommunityPoolSpendProposal' THEN 'Community-pool Spend'
                WHEN 'params/ParameterChangeProposal' THEN 'Parameter-change'
                ELSE p.ptype END AS type_display,
           p.title AS title, p.proposer AS proposer,
           CAST(p.deposit_total AS BIGINT) AS deposit_total,
           COALESCE(yes, 0) AS yes, COALESCE(no, 0) AS no,
           COALESCE(no_with_veto, 0) AS no_with_veto,
           COALESCE(abstain, 0) AS abstain,
           COALESCE(nv.n_nonvoting_validators, 0) AS n_nonvoting_validators
    FROM proposals p
    LEFT JOIN tallies t ON p.proposal_id = t.proposal_id
    LEFT JOIN nonvoting nv ON p.proposal_id = nv.proposal_id
    """,
    doc="Proposals read surface (src/service/governance/getProposals.ts:"
    "24-36 + getProposal.ts:36-57): P8 status columns + F20 status/type "
    "display maps (proposalBasic.ts:14-36), D6 latest-vote-per-voter "
    "dedup, A20 count tally, J9 LEFT ANTI for validators that were "
    "delegated to but did not vote (getProposal.ts:36-57), and D1 "
    "on-chain-removal delete (removeDeletedProposals.ts:10-33) as a "
    "left_semi against the chain listing — proposal 5 exists in the "
    "store fixture but not on chain and must vanish.  Validator dim and "
    "chain listing are broadcast; votes shuffle once on (proposal, "
    "voter).",
)
def fcd_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    props = gen_proposals(spark)
    chain = gen_chain_proposal_ids(spark)
    # D1: drop proposals no longer on chain (the reference DELETEs them)
    kept = props.join(
        F.broadcast(chain),
        props["proposal_id"] == chain["chain_proposal_id"],
        "left_semi",
    )
    latest = latest_per_key(
        gen_votes(spark).select("proposal_id", "voter", "option", "vote_id"),
        ["proposal_id", "voter"],
        "vote_id",
    )
    tallies = (
        latest.groupBy("proposal_id")
        .pivot("option", _VOTE_OPTIONS)
        .agg(F.count(F.lit(1)))
        .select(
            "proposal_id",
            F.coalesce("Yes", F.lit(0)).alias("yes"),
            F.coalesce("No", F.lit(0)).alias("no"),
            F.coalesce("NoWithVeto", F.lit(0)).alias("no_with_veto"),
            F.coalesce("Abstain", F.lit(0)).alias("abstain"),
        )
    )
    # J9: validator accounts that did NOT vote on each kept proposal
    vals = gen_validators(spark).select(F.col("account_address").alias("acct"))
    pv = kept.select("proposal_id").crossJoin(F.broadcast(vals))
    nonvoting = (
        pv.join(
            latest.select(
                F.col("proposal_id").alias("l_pid"), F.col("voter").alias("l_voter")
            ),
            (pv["proposal_id"] == F.col("l_pid")) & (pv["acct"] == F.col("l_voter")),
            "left_anti",
        )
        .groupBy("proposal_id")
        .agg(F.count("*").alias("n_nonvoting_validators"))
    )
    return (
        kept.join(tallies, "proposal_id", "left")
        # left: a proposal every validator voted on has zero nonvoters
        # (proposal 0's voter arithmetic covers all 20 accounts)
        .join(nonvoting, "proposal_id", "left")
        .select(
            "proposal_id",
            "status",
            proposal_status_display("status").alias("status_display"),
            proposal_type_display("ptype").alias("type_display"),
            "title",
            "proposer",
            F.col("deposit_total").cast("bigint").alias("deposit_total"),
            *[
                F.coalesce(c, F.lit(0)).alias(c)
                for c in ["yes", "no", "no_with_veto", "abstain"]
            ],
            F.coalesce("n_nonvoting_validators", F.lit(0))
            .cast("long")
            .alias("n_nonvoting_validators"),
        )
    )


# ---------------------------------------------------------------------------
# W7: first-row-per-date over general_info — the seigniorage and
# staking-ratio history endpoints share this one shape.
# ---------------------------------------------------------------------------
@register(
    "fcd_general_info_daily",
    f"""
    WITH {DUCK_GENERAL.format(n=NP)}
    SELECT day, staking_ratio_e6, bonded_tokens, seigniorage FROM (
        SELECT day, staking_ratio_e6, bonded_tokens, seigniorage,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY m) AS rn
        FROM general_info
    ) WHERE rn = 1
    """,
    doc="W7 first-row-per-date over the general_info minute snapshots — "
    "the shared shape of getSeigniorageProceeds (src/service/dashboard/"
    "getSeigniorageProceeds.ts:17-31) and getStakingRatio "
    "(getStakingRatio.ts:17-32): DISTINCT ON (date) ORDER BY datetime, "
    "i.e. each day reports its earliest snapshot.  One shuffle on day; "
    "at scale the row_number window is bounded per day-partition.",
)
def fcd_general_info_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    gi = gen_general_info(spark).withColumn(
        "day", F.date_format("datetime", "yyyy-MM-dd")
    )
    first = latest_per_key(gi, ["day"], F.col("datetime").asc())
    return first.select("day", "staking_ratio_e6", "bonded_tokens", "seigniorage")


# ---------------------------------------------------------------------------
# Bank balance assembly: F16 normalize_account + F17 vesting math composed
# into the per-(account, denom) balance view.
# ---------------------------------------------------------------------------
_NOW_MS = 1650000000000  # fixed "latest block time" for determinism

# Four of the six account shapes (base, lazy columbus-5 with SECOND-valued
# schedules, graded columbus-1 with cliff schedules, module) — the unit
# suite covers the remaining two (lazy columbus-3/4).
_BALANCE_ACCOUNTS = [
    {
        "type": "core/Account",
        "value": {
            "address": "terra1base",
            "coins": [
                {"denom": "uluna", "amount": "100"},
                {"denom": "ukrw", "amount": "50"},
            ],
        },
    },
    {
        "type": "core/LazyGradedVestingAccount",
        "value": {
            "base_vesting_account": {
                "base_account": {"address": "terra1lazy5"},
                "original_vesting": [{"denom": "uluna", "amount": "1000"}],
                "delegated_free": [],
                "delegated_vesting": [{"denom": "uluna", "amount": "200"}],
            },
            "coins": [{"denom": "uluna", "amount": "500"}],
            "vesting_schedules": [
                {
                    "denom": "uluna",
                    "schedules": [
                        # seconds (LCD encoding); now_ms sits mid-window 1
                        {"start_time": "1600000000", "end_time": "1700000000", "ratio": "0.5"},
                        {"start_time": "1700000000", "end_time": "1800000000", "ratio": "0.5"},
                    ],
                }
            ],
        },
    },
    {
        "type": "core/GradedVestingAccount",
        "value": {
            "BaseVestingAccount": {
                "BaseAccount": {
                    "address": "terra1grad1",
                    "coins": [{"denom": "uluna", "amount": "100"}],
                },
                "original_vesting": [{"denom": "uluna", "amount": "80"}],
                "delegated_free": [],
                "delegated_vesting": [],
            },
            "vesting_schedules": [
                {
                    "denom": "uluna",
                    "schedules": [
                        {"cliff": "1600000000", "ratio": "0.25"},
                        {"cliff": "1700000000", "ratio": "0.75"},
                    ],
                }
            ],
        },
    },
    {
        "type": "supply/ModuleAccount",
        "value": {
            "BaseAccount": {
                "address": "terra1mod",
                "coins": [{"denom": "uusd", "amount": "40"}],
            },
            "name": "fee",
            "permissions": [],
        },
    },
]

# Hand-computed expectations (all values dyadic -> exact doubles):
# terra1lazy5: rate = 0.5*0.5 (mid window 1) + 0 (window 2 future) = 0.25,
#   freed = 250, vesting = 750, available = min(500, 500+200-750) = -50.
# terra1grad1: windows (genesis->1.6e12, 0.25) full + (1.6e12->1.7e12,
#   0.75) half = 0.625; freed = 50, vesting = 30, available = 70.
_BALANCE_ORACLE = """
    SELECT * FROM (VALUES
        ('terra1base',  'uluna', CAST(100 AS DOUBLE), CAST(100 AS DOUBLE),
         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)),
        ('terra1base',  'ukrw',  CAST(50 AS DOUBLE), CAST(50 AS DOUBLE),
         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)),
        ('terra1lazy5', 'uluna', CAST(500 AS DOUBLE), CAST(-50 AS DOUBLE),
         CAST(250 AS DOUBLE), CAST(750 AS DOUBLE), CAST(750 AS DOUBLE)),
        ('terra1grad1', 'uluna', CAST(100 AS DOUBLE), CAST(70 AS DOUBLE),
         CAST(50 AS DOUBLE), CAST(30 AS DOUBLE), CAST(30 AS DOUBLE)),
        ('terra1mod',   'uusd',  CAST(40 AS DOUBLE), CAST(40 AS DOUBLE),
         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE))
    ) AS t(address, denom, amount, available, freed_vesting, vesting, remaining_vesting)
"""


@register(
    "fcd_bank_balance",
    _BALANCE_ORACLE,
    doc="Bank balance assembly (src/service/bank/getBalance/index.ts + "
    "calculate.ts:36-101): F16 normalize_account over four of the six "
    "raw LCD shapes (base, lazy columbus-5 with second-valued schedules, "
    "graded columbus-1 cliff windows, module) → per-coin explode → F17 "
    "freed_rate at the latest block time → vesting_balance (available = "
    "min(amount, amount + delegated_vesting − vesting)).  The oracle is "
    "the hand-computed arithmetic (dyadic ratios → exact doubles), so a "
    "hash match proves the whole normalize→vesting→balance composition "
    "including the r3 seconds→ms unit fix.  Pure column algebra (HOF "
    "filter per denom, no explode of the schedule arrays) — per-account "
    "work, embarrassingly parallel at 100 TB.",
)
def fcd_bank_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame(
        [(json.dumps(a),) for a in _BALANCE_ACCOUNTS], ["raw"]
    )
    acc = raw.select(normalize_account("raw").alias("a"))
    rows = acc.select(
        F.col("a.address").alias("address"),
        F.col("a.original_vesting").alias("ov"),
        F.col("a.delegated_vesting").alias("dv"),
        F.col("a.vesting_schedules").alias("vs"),
        F.explode("a.coins").alias("c"),
    )
    denom = F.col("c.denom")
    amount = F.col("c.amount").cast("double")
    # per-denom lookups stay HOFs (F.get: NULL out-of-bounds, ANSI-safe)
    ov_amt = F.get(F.filter("ov", lambda x: x["denom"] == denom), 0)["amount"].cast("double")
    dv_amt = F.get(F.filter("dv", lambda x: x["denom"] == denom), 0)["amount"].cast("double")
    sch = F.get(F.filter("vs", lambda v: v["denom"] == denom), 0)["schedules"]
    rate = F.coalesce(freed_rate(sch, _NOW_MS), F.lit(0.0))
    bal = vesting_balance(
        amount,
        F.coalesce(ov_amt, F.lit(0.0)),
        F.coalesce(dv_amt, F.lit(0.0)),
        rate,
        sch.isNotNull(),
    )
    return rows.select(
        "address",
        denom.alias("denom"),
        amount.alias("amount"),
        bal["available"].alias("available"),
        bal["freed_vesting"].alias("freed_vesting"),
        bal["vesting"].alias("vesting"),
        bal["remaining_vesting"].alias("remaining_vesting"),
    )


# ---------------------------------------------------------------------------
# W10 — undelegation schedule (src/service/staking/helper.ts:115-140
# getUndelegateSchedule): flatten every unbonding's entries, graft the
# validator dim, order by releaseTime asc.  DRIVER-gated since the r10
# rotation (slot vacated by fcd_staking_view, whose oracle moved to the
# in-test gate).
# r9: carries validatorStatus per entry exactly as the reference does
# (helper.ts:124 reads validatorObj[addr].status into every entry).
# ---------------------------------------------------------------------------
from classic_fcd_spark.sources.fixtures import DUCK_UNBONDINGS, gen_unbondings  # noqa: E402

UNDELEGATION_SCHEDULE_ORACLE_SQL = f"""
    WITH {DUCK_UNBONDINGS},
    vals AS (
        SELECT {{valaddr}} AS validator,
               'validator-' || CAST(v AS VARCHAR) AS moniker,
               {{valstatus}} AS status
        FROM (SELECT unnest(range(0, 20)) AS v)
    )
    SELECT ub.delegator AS delegator_address,
           ub.validator AS validator_address,
           v.moniker AS validator_name,
           v.status AS validator_status,
           ub.completion_time AS release_time,
           ub.balance AS amount,
           ub.creation_height
    FROM unbond ub JOIN vals v ON v.validator = ub.validator
    """


def _undelegation_oracle_sql() -> str:
    from classic_fcd_spark.sources.fixtures import (
        duck_valaddr,
        duck_validator_status,
    )

    return UNDELEGATION_SCHEDULE_ORACLE_SQL.format(
        valaddr=duck_valaddr("v"), valstatus=duck_validator_status("v")
    )


@register(
    "fcd_undelegation_schedule",
    _undelegation_oracle_sql(),
    doc="W10 undelegation schedule (src/service/staking/helper.ts:115-140 "
    "getUndelegateSchedule): flatten every unbonding's entries, graft "
    "the validator dim incl. the r9 validatorStatus derivation "
    "(validatorDetails.ts:23-44), order by releaseTime.  In-test-gated "
    "r8/r9, driver-gated since the r10 rotation (displaced slot: "
    "fcd_staking_view -> in-test oracle).",
)
def fcd_undelegation_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flattened, validator-joined, releaseTime-ordered undelegation
    schedule over every in-flight unbonding (W10).  Explode is linear in
    entries; the validator dim rides a broadcast; the global order is
    the response contract (serving collects per-delegator subsets, which
    are response-bounded)."""
    from classic_fcd_spark.sources.fixtures import gen_validators

    flat = gen_unbondings(spark).select(
        "delegator_address", "validator_address", F.explode("entries").alias("e")
    )
    vals = gen_validators(spark).select(
        F.col("operator_address").alias("validator_address"),
        F.col("moniker").alias("validator_name"),
        F.col("status").alias("validator_status"),
    )
    return (
        flat.join(F.broadcast(vals), "validator_address")
        .select(
            "delegator_address",
            "validator_address",
            "validator_name",
            "validator_status",
            F.col("e.completion_time").alias("release_time"),
            F.col("e.balance").alias("amount"),
            F.col("e.creation_height").alias("creation_height"),
        )
        .orderBy("release_time", "validator_address", "creation_height")
    )
