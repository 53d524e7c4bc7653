"""Golden-row e2e pins for the r7 serving wrappers (serving/detail.py):
the 11 routes the r6 manifest carried as `query` status.  Same pattern
as tests/test_serving_e2e.py — response-shape asserts plus pinned
values over the deterministic fixtures; claims / redelegate event
extraction (absent from the default fixture's msg mix) is exercised
with injected tx frames in the gen_txs schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from classic_fcd_spark.serving import detail as D
from classic_fcd_spark.sources.fixtures import addr_str, valaddr_str


class TestStakingReturnSeries:
    def test_shape_and_golden(self, spark):
        sr = D.get_staking_return(spark)
        assert len(sr) == 4  # the fixture's calendar days
        for row in sr:
            assert set(row) == {"datetime", "dailyReturn", "annualizedReturn"}
        # day 1: dailyReturn = (reward+airdrop)/avgStaking; the early-
        # window divisor is len+1=1, so annualized = daily * 365
        assert sr[0]["datetime"] == 1609459200000
        assert sr[0]["dailyReturn"] == "0.0773908772"
        assert sr[0]["annualizedReturn"] == "28.2476701971"
        assert sr[-1]["dailyReturn"] == "0.012198891"
        assert sr[-1]["annualizedReturn"] == "22.6870091034"

    def test_early_window_divisor(self, spark):
        # getStakingReturn.ts:27-30: before the 30-day window fills the
        # divisor is retArray.length + 1 — day 2 divides the 2-day sum
        # by 2
        from decimal import Decimal

        sr = D.get_staking_return(spark)
        d0 = Decimal(sr[0]["dailyReturn"])
        d1 = Decimal(sr[1]["dailyReturn"])
        want = (d0 + d1) / 2 * 365
        got = Decimal(sr[1]["annualizedReturn"])
        assert abs(got - want) < Decimal("0.000001")


class TestStakingReturnOracle:
    """Cross-engine gate for the 30-day staking-return MA (VERDICT r10
    item 6; getStakingReturn.ts:15-44): a DuckDB window recomputes
    {dailyReturn, annualizedReturn} with HUGEINT e24 fixed-point and the
    reference's exact early-window divisor (LEAST(rn, 30) = len+1 before
    the window fills), compared at the money scale (e10, trunc-toward-
    zero — DuckDB's `//`, matching _money's ROUND_DOWN)."""

    @staticmethod
    def _oracle_sql(rows) -> str:
        vals = ", ".join(f"('{d}', {r}, {a}, {s})" for d, r, a, s in rows)
        e24 = "CAST('1000000000000000000000000' AS HUGEINT)"
        e14 = "CAST('100000000000000' AS HUGEINT)"
        return f"""
        WITH inputs(day, reward, airdrop, staked) AS (VALUES {vals}),
        base AS (
            SELECT day,
                   CASE WHEN staked > 0
                        THEN CAST(reward + airdrop AS HUGEINT) * {e24}
                             // CAST(staked AS HUGEINT)
                        ELSE CAST(0 AS HUGEINT) END AS daily_e24,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM inputs
        ), win AS (
            SELECT day, daily_e24, rn,
                   SUM(daily_e24) OVER (ORDER BY day
                       ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS sum_e24
            FROM base
        )
        SELECT day, daily_e24 // {e14} AS daily_e10,
               CAST(sum_e24 AS HUGEINT) // LEAST(rn, 30) * 365
                 // {e14} AS annual_e10
        FROM win ORDER BY day
        """

    @staticmethod
    def _money_e10(s: str) -> int:
        from decimal import Decimal

        return int(Decimal(s).scaleb(10))

    def _compare(self, rows, series):
        import duckdb

        want = duckdb.sql(self._oracle_sql(rows)).fetchall()
        assert len(series) == len(want)
        for got, (_, daily_e10, annual_e10) in zip(series, want):
            assert self._money_e10(got["dailyReturn"]) == int(daily_e10)
            assert self._money_e10(got["annualizedReturn"]) == int(annual_e10)

    def test_endpoint_inputs_match_oracle(self, spark):
        rows = D._daily_staking_inputs(spark)
        self._compare(rows, D.get_staking_return(spark))

    def test_filled_window_matches_oracle(self):
        """The fixture spans 4 days, so the endpoint never fills the
        30-day window; a synthetic 40-day series (with a staked=0 day
        pinning the '0' branch) exercises the subtract-oldest steady
        state on both engines."""
        import datetime

        d0 = datetime.date(2021, 1, 1)
        rows = [
            (
                (d0 + datetime.timedelta(days=i)).isoformat(),
                (i * 7919) % 100000,
                (i + 1) * 1000 + 500,
                0 if i == 17 else 1000000 + (i * 31337) % 500000,
            )
            for i in range(40)
        ]
        self._compare(rows, D.staking_return_series(rows))


class TestProposalDetail:
    def test_shape_and_golden(self, spark):
        pd = D.get_proposal_detail(spark, 1)
        assert set(pd) == {
            "id", "proposer", "type", "status", "title", "deposit",
            "vote", "content", "tallyingParameters",
        }
        assert pd["id"] == "1" and pd["status"] == "Deposit"
        assert pd["content"] == []  # title/description-only fixture content
        assert pd["tallyingParameters"]["quorum"] == "0.400000000000000000"

    def test_unknown_and_chain_removed_raise(self, spark):
        with pytest.raises(KeyError, match="Proposal not found"):
            D.get_proposal_detail(spark, 999)
        # proposal 5 exists in the store but was removed on chain (the
        # D1 anti-join) — the detail view must 404 it too
        with pytest.raises(KeyError, match="Proposal not found"):
            D.get_proposal_detail(spark, 5)

    def test_validators_not_voted(self, spark):
        # proposal 4 is VotingPeriod with NO votes; account 1000
        # delegates only to validator 0 -> exactly that validator is
        # reported not-voted, in the generateValidatorResponse subset
        pd = D.get_proposal_detail(spark, 4, account=addr_str(1000))
        assert pd["validatorsNotVoted"] == [
            {
                "operatorAddress": valaddr_str(0),
                "accountAddress": addr_str(1000),
                "description": {"moniker": "validator-0"},
            }
        ]
        # proposal 0: every validator account voted (v%21 covers all 20
        # residues), so the same account has nothing outstanding
        pd0 = D.get_proposal_detail(spark, 0, account=addr_str(1000))
        assert pd0["validatorsNotVoted"] == []
        # non-voting statuses skip the account enrichment entirely
        assert "validatorsNotVoted" not in D.get_proposal_detail(
            spark, 1, account=addr_str(1000)
        )


class TestDelegationTxsPage:
    def test_golden_first_page(self, spark):
        body = D.get_delegation_txs(spark, valaddr_str(3), limit=5)
        assert set(body) == {"next", "limit", "events"}
        assert body["limit"] == 5 and len(body["events"]) == 5
        ev = body["events"][0]
        assert ev == {
            "id": 30,
            "chainId": "fixture-1",
            "height": "581",
            "txhash": "dca03fc0cf18fb3953b473f25ad17729",
            "type": "Delegate",
            "amount": {"denom": "uluna", "amount": "492"},
            "timestamp": "2021-01-04T00:37:30Z",
        }

    def test_keyset_walk_is_disjoint_and_exhaustive(self, spark):
        from classic_fcd_spark.queries.fcd import delegation_tx_filter
        from classic_fcd_spark.sources.fixtures import gen_txs

        total = gen_txs(spark).filter(
            delegation_tx_filter(valaddr_str(3))
        ).count()
        seen, offset = [], None
        while True:
            body = D.get_delegation_txs(
                spark, valaddr_str(3), limit=7, offset=offset
            )
            seen.extend(e["txhash"] for e in body["events"])
            if body["next"] is None:
                break
            offset = body["next"]
        assert len(seen) == total
        assert len(set(seen)) == total

    def test_redelegate_and_undelegate_events(self, spark):
        # the fixture msg mix has no redelegate/undelegate — inject two
        # txs in the gen_txs schema and pin the extractEvents mapping:
        # src-side redelegations and undelegations negate the amount
        txs = _mk_txs(
            spark,
            [
                (
                    "staking/MsgBeginRedelegate",
                    '{"delegator_address":"terra1d","validator_src_address":"%s",'
                    '"validator_dst_address":"terravaloper1other",'
                    '"amount":{"denom":"uluna","amount":"77"}}' % valaddr_str(3),
                ),
                (
                    "staking/MsgUndelegate",
                    '{"delegator_address":"terra1d","validator_address":"%s",'
                    '"amount":{"denom":"uluna","amount":"55"}}' % valaddr_str(3),
                ),
            ],
        )
        body = D.get_delegation_txs(spark, valaddr_str(3), limit=10, txs=txs)
        by_type = {e["type"]: e for e in body["events"]}
        assert by_type["Redelegate"]["amount"] == {"denom": "uluna", "amount": "-77"}
        assert by_type["Undelegate"]["amount"] == {"denom": "uluna", "amount": "-55"}


def _mk_txs(spark, typed_msgs, logs_json=None):
    """A tiny tx frame in the gen_txs schema: one tx per (type, value)."""
    rows = [
        (
            "fixture-1",
            f"testhash{i}",
            100 + i,
            i,
            None,
            [(t, v)],
            [("uluna", "10")],
            logs_json[i] if logs_json else '[{"events":[]}]',
        )
        for i, (t, v) in enumerate(typed_msgs)
    ]
    df = spark.createDataFrame(
        rows,
        "chain_id string, hash string, height long, _i long, code int, "
        "msgs array<struct<type:string,value:string>>, "
        "fee array<struct<denom:string,amount:string>>, logs_json string",
    )
    return df.withColumn(
        "timestamp", F.timestamp_seconds(F.lit(1609459200) + F.col("_i") * 60)
    ).drop("_i")


class TestClaimsPage:
    def _claim_txs(self, spark):
        op = valaddr_str(3)
        acct = addr_str(1003)  # validator-3's account (the dim pair)
        commission = (
            "distribution/MsgWithdrawValidatorCommission",
            '{"validator_address":"%s"}' % op,
        )
        reward = (
            "distribution/MsgWithdrawDelegationReward",
            '{"delegator_address":"%s","validator_address":"%s"}' % (acct, op),
        )
        other_delegator = (
            "distribution/MsgWithdrawDelegationReward",
            '{"delegator_address":"terra1stranger","validator_address":"%s"}' % op,
        )
        logs = [
            '[{"events":[{"type":"withdraw_commission","attributes":'
            '[{"key":"amount","value":"11uusd,7uluna"}]}]}]',
            '[{"events":[{"type":"withdraw_rewards","attributes":'
            '[{"key":"amount","value":"123uluna"}]}]}]',
            '[{"events":[{"type":"withdraw_rewards","attributes":'
            '[{"key":"amount","value":"999uluna"}]}]}]',
        ]
        return _mk_txs(spark, [commission, reward, other_delegator], logs)

    def test_parse_and_filter(self, spark):
        body = D.get_claims(
            spark, valaddr_str(3), limit=10, txs=self._claim_txs(spark)
        )
        assert set(body) == {"next", "limit", "claims"}
        # the stranger's reward withdrawal fails the delegator bracket
        # (getClaims.ts:154-161) — only the operator's own two claims
        assert len(body["claims"]) == 2
        by_type = {c["type"]: c for c in body["claims"]}
        # amounts split from the log event and DENOM_ORDER-sorted
        assert by_type["Commission"]["amounts"] == [
            {"denom": "uluna", "amount": "7"},
            {"denom": "uusd", "amount": "11"},
        ]
        assert by_type["Reward"]["amounts"] == [
            {"denom": "uluna", "amount": "123"}
        ]
        assert by_type["Reward"]["tx"] == by_type["Reward"]["txhash"]

    def test_next_probe(self, spark):
        body = D.get_claims(
            spark, valaddr_str(3), limit=1, txs=self._claim_txs(spark)
        )
        assert len(body["claims"]) == 1 and body["next"] is not None
        page2 = D.get_claims(
            spark,
            valaddr_str(3),
            limit=1,
            offset=body["next"],
            txs=self._claim_txs(spark),
        )
        assert len(page2["claims"]) == 1
        assert page2["claims"][0]["txhash"] != body["claims"][0]["txhash"]

    def test_default_fixture_has_no_claims(self, spark):
        body = D.get_claims(spark, valaddr_str(3), limit=5)
        assert body == {"next": None, "limit": 5, "claims": []}


class TestDelegatorsPage:
    def test_golden(self, spark):
        body = D.get_delegators_page(spark, valaddr_str(3), page=1, limit=4)
        assert set(body) == {"totalCnt", "page", "limit", "delegators"}
        assert body["totalCnt"] == 2
        d0 = body["delegators"][0]
        assert set(d0) == {"address", "amount", "weight"}
        assert d0["amount"] == "949" and d0["weight"] == "0.609114249"

    def test_paging_slices(self, spark):
        p1 = D.get_delegators_page(spark, valaddr_str(0), page=1, limit=2)
        p2 = D.get_delegators_page(spark, valaddr_str(0), page=2, limit=2)
        assert p1["totalCnt"] == p2["totalCnt"]
        a1 = {d["address"] for d in p1["delegators"]}
        a2 = {d["address"] for d in p2["delegators"]}
        assert not (a1 & a2)


class TestValidatorReturnByOp:
    def test_golden_single_operator(self, spark):
        out = D.get_validator_return_by_op(spark, valaddr_str(3))
        assert list(out) == [valaddr_str(3)]
        entry = out[valaddr_str(3)]
        assert entry == {
            "stakingReturn": "172.7679000912",
            "isNewValidator": True,
        }

    def test_all_operators_and_airdrop_additivity(self, spark):
        from decimal import Decimal

        from classic_fcd_spark.queries.fcd import _airdrop_annual_return

        out = D.get_validator_return_by_op(spark)
        assert len(out) == 20
        air = Decimal(
            int(_airdrop_annual_return(spark).collect()[0]["airdrop_annual_e12"])
        ) / Decimal(10**12)
        # every stakingReturn carries the airdrop addend (plus(...) in
        # getValidatorReturn.ts:37-41)
        assert all(Decimal(v["stakingReturn"]) > air for v in out.values())


class TestBankBalance:
    def test_golden_vesting_account(self, spark):
        body = D.get_account_balance(spark, "terra1lazy5")
        assert set(body) == {"balance", "vesting", "delegations", "unbondings"}
        assert body["balance"] == [
            {
                "denom": "uluna",
                "available": "-50",  # min(500, 500+200-750): more vesting
                "delegatedVesting": "200",  # than spendable -> negative, as
                "delegatable": "500",  # the reference's min() allows
                "freedVesting": "250",
                "unbonding": "0",
                "remainingVesting": "750",
            }
        ]
        assert body["vesting"] == [
            {
                "denom": "uluna",
                "total": "1000",
                "schedules": [
                    {
                        "amount": "500",
                        "startTime": 1600000000000,
                        "endTime": 1700000000000,
                        "ratio": 0.5,
                        "freedRate": 0.5,
                    },
                    {
                        "amount": "500",
                        "startTime": 1700000000000,
                        "endTime": 1800000000000,
                        "ratio": 0.5,
                        "freedRate": 0,
                    },
                ],
            }
        ]
        assert body["unbondings"] == []

    def test_base_account_no_vesting(self, spark):
        body = D.get_account_balance(spark, "terra1base")
        assert body["vesting"] == []
        denoms = [b["denom"] for b in body["balance"]]
        assert denoms == ["uluna", "ukrw"]  # DENOM_ORDER sort
        luna = body["balance"][0]
        assert luna["available"] == "100" and luna["delegatable"] == "100"

    def test_unknown_account_raises(self, spark):
        with pytest.raises(KeyError, match="Account not found"):
            D.get_account_balance(spark, "terra1nobody")


class TestTaxProceeds:
    def test_golden(self, spark):
        body = D.get_tax_proceeds(spark)
        assert set(body) == {"total", "taxProceeds"}
        assert body["total"] == "9048.0512550579"
        assert body["taxProceeds"][0] == {
            "denom": "ukrw",
            "amount": "5038",
            "adjustedAmount": "2753.0054644808",
        }
        for p in body["taxProceeds"]:
            assert set(p) == {"denom", "amount", "adjustedAmount"}


class TestTreasurySupply:
    def test_rich_list_pages(self, spark):
        p2 = D.get_rich_list(spark, "uluna", page=2, limit=3)
        assert [r["amount"] for r in p2] == ["97723", "96746", "95769"]
        assert all(set(r) == {"account", "amount"} for r in p2)
        # untracked denom -> empty list (empty RichListEntity result)
        assert D.get_rich_list(spark, "ukrw") == []
        with pytest.raises(ValueError):
            D.get_rich_list(spark, "uluna", page=0)

    def test_total_supply_currency_division(self, spark):
        assert D.get_total_supply(spark, "uluna") == "2000000000"
        assert D.get_total_supply(spark, "luna") == "2000"  # /1e6
        assert D.get_total_supply(spark, "unknown") == "0"

    def test_circulating_supply_subtracts_latest_unvested(self, spark):
        # 2_000_000_000 - 24_690 (the vesting.json newest uluna row)
        assert D.get_circulating_supply(spark, "uluna") == "1999975310"
        circ = D.get_circulating_supply(spark, "luna")
        assert circ == "1999.97531"
