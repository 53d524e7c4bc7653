"""Governance vote tally — J8 + A20 + D6 as one relational pipeline.

The reference (src/service/governance/helper/voteSummary.ts:15-152)
computes a proposal's tally imperatively:

1. `uniqBy(reverse(votes), 'voter')` — latest vote per voter (D6, :124).
2. Fetch each voter's delegations; walk them mutating a voting-power
   array (getVotersVotingPowerArr, :37-61): each delegation SUBTRACTS
   its shares from the delegated-to validator's bonded power (the
   delegator's own vote overrides the validator's) and ADDS them to the
   delegator's entry (created on first sight).
3. `tallying` (:15-35): sum votingPower by option; `getVoteCount`
   (:63-79): count by option.

Spark-first re-expression — the array walk is three bounded aggregates
and broadcast joins, per proposal (the reference processes one proposal
at a time; we do all proposals in one plan):

    power(p, a) = base(a) − sub(p, a) + add(p, a)
      base(a)   = validator bonded power when a is a validator account
      sub(p, a) = Σ shares delegated BY p's voters TO the validator
                  whose account is a
      add(p, a) = Σ shares delegated by a itself (voters only)

Scale: votes shuffle once on (proposal, voter) for the dedup window;
delegations shuffle once on delegator for the voter semi-join; the
validator dim (hundreds of rows) broadcasts everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from classic_fcd_spark.operators.windows import latest_per_key


def vote_tally(
    votes: DataFrame, delegations: DataFrame, validators: DataFrame
) -> DataFrame:
    """Per (proposal_id, option): power-weighted sum + vote count.

    votes:       (vote_id, proposal_id, voter, option, ts)
    delegations: (delegator_address, validator_address, shares)
    validators:  (operator_address, account_address, voting_power, ...)
    """
    latest = latest_per_key(
        votes, ["proposal_id", "voter"], "ts", tiebreak_cols=["vote_id"]
    )
    voters = latest.select("proposal_id", "voter")
    # only the voters' delegations participate (the reference fetches
    # delegations per voter — voteSummary.ts:119)
    vdeleg = voters.join(
        delegations, voters.voter == delegations.delegator_address
    ).select("proposal_id", "voter", "validator_address", "shares")

    add_p = vdeleg.groupBy("proposal_id", F.col("voter").alias("acct")).agg(
        F.sum("shares").alias("add_power")
    )
    sub_p = (
        vdeleg.groupBy("proposal_id", "validator_address")
        .agg(F.sum("shares").alias("sub_power"))
        .join(
            F.broadcast(
                validators.select("operator_address", F.col("account_address").alias("acct"))
            ),
            F.col("validator_address") == F.col("operator_address"),
        )
        .select("proposal_id", "acct", "sub_power")
    )
    base = validators.select(
        F.col("account_address").alias("acct"),
        F.col("voting_power").cast("long").alias("base_power"),
    )

    sub2 = sub_p.select(
        F.col("proposal_id").alias("sub_pid"),
        F.col("acct").alias("sub_acct"),
        "sub_power",
    )
    add2 = add_p.select(
        F.col("proposal_id").alias("add_pid"),
        F.col("acct").alias("add_acct"),
        "add_power",
    )
    powered = (
        latest.join(F.broadcast(base), latest.voter == base.acct, "left")
        .drop("acct")
        .join(
            sub2,
            (F.col("voter") == F.col("sub_acct"))
            & (F.col("proposal_id") == F.col("sub_pid")),
            "left",
        )
        .drop("sub_pid", "sub_acct")
        .join(
            add2,
            (F.col("voter") == F.col("add_acct"))
            & (F.col("proposal_id") == F.col("add_pid")),
            "left",
        )
        .drop("add_pid", "add_acct")
        .withColumn(
            "power",
            F.coalesce("base_power", F.lit(0))
            - F.coalesce("sub_power", F.lit(0))
            + F.coalesce("add_power", F.lit(0)),
        )
    )
    return powered.groupBy("proposal_id", "option").agg(
        F.sum("power").cast("long").alias("power_sum"),
        F.count("*").alias("n_votes"),
    )
