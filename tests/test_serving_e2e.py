"""Serving-layer e2e pins (serving/endpoints.py + serving/api.py):
per-endpoint response-SHAPE assertions plus golden-row value pins over
the deterministic fixtures — the engine's analogue of the reference's
supertest e2e suite (src/e2etest/dashboard.spec.ts:22-50,
tx.spec.ts:6-16: assert the response object's fields and pinned values
for known inputs).
"""

from __future__ import annotations

import pytest

from classic_fcd_spark.serving import endpoints as E
from classic_fcd_spark.sources.fixtures import addr_str, valaddr_str


class TestGovernanceVotesPage:
    def test_shape_and_golden_page(self, spark):
        body = E.get_proposal_votes(spark, 1, page=1, limit=5)
        # shape: the GetProposalVotesReturn contract (getVotes.ts:32-37)
        assert set(body) == {"totalCnt", "page", "limit", "votes"}
        assert body["page"] == 1 and body["limit"] == 5
        assert len(body["votes"]) == 5
        for v in body["votes"]:
            assert set(v) == {"answer", "voter"}
            assert v["voter"]["accountAddress"].startswith("terra1")
        # golden: proposal 1 has 59 distinct voters after latest-vote
        # dedupe; newest-first page starts with vote_id 397's voter
        assert body["totalCnt"] == 59
        assert body["votes"][0]["answer"] == "No"
        assert (
            body["votes"][0]["voter"]["accountAddress"]
            == "terra1034d267bf939b62d93c27f4f0dfd7a9fcfdc26"
        )

    def test_validator_voter_is_enriched(self, spark):
        # the 5th vote on page 1 comes from validator-5's account: the
        # getAccountInfo join must attach operatorAddress + moniker
        body = E.get_proposal_votes(spark, 1, page=1, limit=5)
        voter = body["votes"][4]["voter"]
        assert voter["operatorAddress"] == valaddr_str(5)
        assert voter["moniker"] == "validator-5"
        # non-validator voters carry NO operator fields (the reference
        # spreads them conditionally)
        assert set(body["votes"][0]["voter"]) == {"accountAddress"}

    def test_option_filter_after_dedupe(self, spark):
        body = E.get_proposal_votes(spark, 1, option="Yes", page=1, limit=100)
        assert body["totalCnt"] == 15
        assert len(body["votes"]) == 15
        assert all(v["answer"] == "Yes" for v in body["votes"])

    def test_paging_is_disjoint_and_exhaustive(self, spark):
        seen = []
        for page in (1, 2, 3):
            body = E.get_proposal_votes(spark, 1, page=page, limit=25)
            seen.extend(v["voter"]["accountAddress"] for v in body["votes"])
        assert len(seen) == 59  # 25 + 25 + 9
        assert len(set(seen)) == 59  # no overlap between pages

    def test_unknown_proposal_raises(self, spark):
        with pytest.raises(KeyError, match="Proposal not found"):
            E.get_proposal_votes(spark, 999)


class TestGovernanceDepositsPage:
    def test_shape_and_golden_page(self, spark):
        body = E.get_proposal_deposits(spark, 2, page=1, limit=3)
        assert set(body) == {"totalCnt", "page", "limit", "deposits"}
        assert body["totalCnt"] == 5  # 5 deposits per proposal fixture
        assert len(body["deposits"]) == 3
        # newest-first (the reference reverses before paging): deposit_id
        # 34 -> 30 for proposal 2, amounts 34*700%5000+100 = 3900, ...
        assert body["deposits"][0]["deposit"] == [
            {"denom": "uluna", "amount": "3900"}
        ]
        assert body["deposits"][1]["deposit"] == [
            {"denom": "uluna", "amount": "3300"}
        ]
        # deposit_id 30 is a multi-coin deposit (id % 3 == 0)
        assert body["deposits"][2]["deposit"] == [
            {"denom": "uluna", "amount": "2700"},
            {"denom": "ukrw", "amount": "5900"},
        ]

    def test_second_page_and_bounds(self, spark):
        body = E.get_proposal_deposits(spark, 2, page=2, limit=3)
        assert body["totalCnt"] == 5 and len(body["deposits"]) == 2
        empty = E.get_proposal_deposits(spark, 2, page=3, limit=3)
        assert empty["deposits"] == []

    def test_unknown_proposal_raises(self, spark):
        with pytest.raises(KeyError, match="Proposal not found"):
            E.get_proposal_deposits(spark, 999)


class TestStakingAccountView:
    def test_shape_and_golden_values(self, spark):
        body = E.get_staking_account_view(spark, addr_str(3))
        assert set(body) == {
            "validators", "myDelegations", "delegationTotal", "undelegations",
        }
        # every validator appears, power-desc (L6 ordering)
        assert len(body["validators"]) == 20
        assert body["validators"][0]["description"]["moniker"] == "validator-19"
        assert body["validators"][0]["votingPower"] == "24000"
        # account addr_str(3) delegates to exactly validator-3 in the
        # fixture arithmetic; shares sum = 949
        assert body["delegationTotal"] == "949"
        assert body["myDelegations"] == [
            {
                "validatorName": "validator-3",
                "validatorAddress": valaddr_str(3),
                "amountDelegated": "949",
            }
        ]

    def test_my_delegation_grafted_onto_validator_row(self, spark):
        body = E.get_staking_account_view(spark, addr_str(3))
        mine = [v for v in body["validators"] if "myDelegation" in v]
        assert len(mine) == 1
        assert mine[0]["operatorAddress"] == valaddr_str(3)
        assert mine[0]["myDelegation"] == "949"

    def test_non_delegator_gets_empty_delegations(self, spark):
        body = E.get_staking_account_view(spark, addr_str(9999))
        assert body["myDelegations"] == []
        assert body["delegationTotal"] == "0"
        assert all("myDelegation" not in v for v in body["validators"])


class TestMarketPrice:
    def test_shape_and_golden_values(self, spark):
        body = E.get_market_price(spark, "ukrw", interval_minutes=15)
        assert set(body) == {
            "lastPrice",
            "oneDayVariation",
            "oneDayVariationRate",
            "prices",
        }
        # L5 contract: exactly 50 buckets, ascending for display
        assert len(body["prices"]) == 50
        dts = [p["datetime"] for p in body["prices"]]
        assert dts == sorted(dts)
        assert all(p["denom"] == "ukrw" for p in body["prices"])
        # golden pins (fixture arithmetic, integer-e6 averages)
        assert body["prices"][0] == {
            "denom": "ukrw",
            "price": 1.49,
            "datetime": 1609684200000,
        }
        assert body["prices"][-1]["price"] == 1.573333
        assert body["lastPrice"] == 1.83
        assert body["oneDayVariation"] == "0.6"
        assert body["oneDayVariationRate"] == "0.3278688524"

    def test_variation_matches_duckdb_oracle(self, spark):
        """Cross-engine gate for lastPrice / oneDayVariation / Rate
        (VERDICT r10 item 6; getPrice.ts:92-116 + helper.ts:21-40
        getOnedayBefore): DuckDB independently recomputes the fixture's
        closed-form price walk, takes the newest price and the newest
        at-or-before midnight-minus-one-minute, and derives the
        variation and its rate in exact e2/e10 integer arithmetic
        (`//` truncates toward zero, matching _money's ROUND_DOWN).
        Every denom is compared."""
        import duckdb
        from decimal import Decimal

        from classic_fcd_spark.sources.fixtures import (
            EPOCH_START,
            FIXTURE_N_PRICE_MINUTES,
        )

        n = FIXTURE_N_PRICE_MINUTES
        now_s = EPOCH_START + (n - 1) * 60
        day_cut = (now_s // 86400) * 86400 - 60
        oracle = duckdb.sql(f"""
            WITH p AS (
                SELECT denom, m, 100 + (m * seed) % 100 AS price_e2,
                       {EPOCH_START} + m * 60 AS epoch
                FROM (SELECT unnest(range(0, {n})) AS m),
                     (VALUES ('ukrw', 17), ('usdr', 29), ('uusd', 41))
                       AS t(denom, seed)
            ), last AS (
                SELECT denom, price_e2 AS last_e2 FROM p WHERE m = {n - 1}
            ), before AS (
                SELECT denom, max_by(price_e2, m) AS before_e2
                FROM p WHERE epoch <= {day_cut} GROUP BY denom
            )
            SELECT denom, last_e2, last_e2 - before_e2 AS var_e2,
                   CAST(last_e2 - before_e2 AS HUGEINT) * 10000000000
                     // last_e2 AS rate_e10
            FROM last JOIN before USING (denom) ORDER BY denom
        """).fetchall()
        assert len(oracle) == 3
        for denom, last_e2, var_e2, rate_e10 in oracle:
            body = E.get_market_price(spark, denom)
            assert round(body["lastPrice"] * 100) == int(last_e2)
            assert int(Decimal(body["oneDayVariation"]).scaleb(10)) == int(
                var_e2
            ) * 10**8
            assert int(
                Decimal(body["oneDayVariationRate"]).scaleb(10)
            ) == int(rate_e10)

    def test_interval_changes_bucketing(self, spark):
        m1 = E.get_market_price(spark, "ukrw", interval_minutes=1)
        m60 = E.get_market_price(spark, "ukrw", interval_minutes=60)
        assert len(m1["prices"]) == 50 and len(m60["prices"]) == 50
        # 1-minute buckets are raw prices; 60-minute buckets span 1 hour
        assert m1["prices"][1]["datetime"] - m1["prices"][0]["datetime"] == 60_000
        assert (
            m60["prices"][1]["datetime"] - m60["prices"][0]["datetime"] == 3_600_000
        )
        # lastPrice is bucketing-independent
        assert m1["lastPrice"] == m60["lastPrice"] == 1.83


class TestPriceHistory:
    def test_key_format_and_day_count(self, spark):
        hist = E.get_price_history(spark)
        # 4 fixture days x 3 priced denoms (uluna has no price row)
        assert len(hist) == 4 * 3
        assert all(
            k[:10].count("-") == 2 and k[10:] in {"ukrw", "usdr", "uusd"}
            for k in hist
        )
        for v in hist.values():
            assert 1.0 <= float(v) <= 2.0  # fixture walk range
        # day_count keeps the newest N days only
        last2 = E.get_price_history(spark, day_count=2)
        assert len(last2) == 2 * 3
        assert set(last2) <= set(hist)
        assert max(k[:10] for k in hist) == max(k[:10] for k in last2)


class TestSwapRate:
    def test_luna_base_returns_oracle_prices(self, spark):
        rows = {r["denom"]: r for r in E.get_denom_swap_rate(spark, "uluna")}
        # getSwapRate(prices, 'uluna') is the identity on prices
        assert set(rows) == {"ukrw", "usdr", "uusd"}
        assert rows["ukrw"]["swaprate"] == "1.83"
        assert rows["ukrw"]["oneDayVariation"] == "0.6"

    def test_cross_base_rates(self, spark):
        rows = {r["denom"]: r for r in E.get_denom_swap_rate(spark, "uusd")}
        # base uusd: uluna = 1/p_uusd, others = p_d/p_uusd
        assert set(rows) == {"ukrw", "usdr", "uluna"}
        assert rows["uluna"]["swaprate"] == "0.6289308176"
        assert rows["ukrw"]["swaprate"] == "1.1509433962"
        # variation fields present and money-shaped on every row
        for r in rows.values():
            assert set(r) == {
                "denom",
                "swaprate",
                "oneDayVariation",
                "oneDayVariationRate",
            }
            float(r["swaprate"])  # parseable money strings


class TestRouteManifest:
    def test_every_route_resolves(self):
        """serving/routes.py covers the reference's full @Get surface;
        every wrapper/query/operator spec must resolve to a real
        callable so renames break loudly."""
        from classic_fcd_spark.serving.routes import ROUTES, resolve

        statuses = {}
        for route, (status, spec) in ROUTES.items():
            statuses[status] = statuses.get(status, 0) + 1
            if status in ("wrapper", "query", "operator"):
                assert callable(resolve(spec)), route
        # the read surface is entirely wrapper- or operator-served since
        # r7 (zero `query` rows); only the three SURVEY-scoped-out
        # routes and the config constant are not
        assert statuses["oos"] == 3
        assert statuses["config"] == 1
        assert statuses.get("query", 0) == 0
        assert statuses["wrapper"] >= 31
        assert statuses["wrapper"] + statuses["operator"] >= 33


class TestListingEndpoints:
    def test_dashboard_general_info(self, spark):
        """dashboard.spec.ts:22-50's field pins: prices by denom,
        taxRate string, taxCaps array, issuances by denom, stakingPool
        with ratio/bonded/notBonded."""
        body = E.get_dashboard_general_info(spark)
        assert set(body) == {
            "prices",
            "taxRate",
            "taxCaps",
            "issuances",
            "stakingPool",
        }
        assert set(body["prices"]) == {"ukrw", "usdr", "uusd"}
        for v in body["prices"].values():
            float(v)  # money strings
        assert body["taxRate"] == "0.1"
        assert {c["denom"] for c in body["taxCaps"]} == {"ukrw", "*"}
        assert set(body["issuances"]) == {"ukrw", "uluna", "usdr", "uusd"}
        sp = body["stakingPool"]
        assert set(sp) == {"stakingRatio", "bondedTokens", "notBondedTokens"}
        # ratio reconstructs from bonded / (bonded + notBonded)
        bonded, nb = float(sp["bondedTokens"]), float(sp["notBondedTokens"])
        assert abs(bonded / (bonded + nb) - float(sp["stakingRatio"])) < 1e-4
        # golden: latest fixture snapshot
        assert body["prices"]["ukrw"] == "1.83"

    def test_last_hour_ops(self, spark):
        body = E.get_last_hour_ops_and_txs(spark)
        assert set(body) == {"last_1h_op", "last_1h_tx"}
        # ops >= txs by construction (MultiSend fan-out adds, never subtracts)
        assert body["last_1h_op"] >= body["last_1h_tx"] > 0

    def test_validators_listing(self, spark):
        body = E.get_validators_listing(spark)
        assert len(body) == 20
        # power-desc ordering, golden head row
        assert body[0]["description"]["moniker"] == "validator-19"
        assert body[0]["votingPower"]["weight"] == "24000"
        # rates sum to ~1 across the set
        total_rate = sum(float(v["votingPower"]["rate"]) for v in body)
        assert abs(total_rate - 1.0) < 1e-6
        for v in body:
            assert set(v) == {
                "operatorAddress",
                "accountAddress",
                "description",
                "votingPower",
                "commissionInfo",
            }
            assert v["operatorAddress"].startswith("terravaloper1")

    def test_proposals_listing(self, spark):
        body = E.get_proposals_listing(spark)
        # proposal 5 was removed on chain (the D1 anti-join)
        assert [p["id"] for p in body] == ["0", "1", "2", "3", "4", "6", "7"]
        for p in body:
            assert set(p) == {
                "id",
                "proposer",
                "type",
                "status",
                "title",
                "deposit",
                "vote",
            }
            c = p["vote"]["count"]
            assert p["vote"]["total"] == sum(c.values())
        # display maps applied (F20)
        assert body[0]["status"] in {"Voting", "Deposit", "Passed", "Rejected"}


class TestDashboardSubEndpoints:
    """The reference's per-series dashboard endpoints as response-shape
    wrappers (getAccountGrowth/getTransactionVol/getBlockRewards/
    getSeigniorageProceeds/getStakingRatio), with the dashboard.spec.ts
    field pins and fixture golden rows."""

    def test_account_growth_shape_and_contracts(self, spark):
        body = E.get_account_growth(spark)
        # dashboard.spec.ts:52-60: cumulative[0].datetime/totalAccountCount
        assert set(body) == {"cumulative", "periodic"}
        assert body["cumulative"] and body["periodic"]
        for item in body["cumulative"] + body["periodic"]:
            assert set(item) == {
                "datetime",
                "totalAccountCount",
                "activeAccountCount",
            }
        # the reference drops cumulative[0] and starts periodic at idx 1
        assert len(body["cumulative"]) == len(body["periodic"])
        # cumulative totals are non-decreasing
        tots = [c["totalAccountCount"] for c in body["cumulative"]]
        assert tots == sorted(tots)
        # golden: the fixture's 54 distinct accounts all register on
        # day 1 (first-seen), while actives accumulate day over day
        assert body["cumulative"][0] == {
            "datetime": 1609545600000,
            "totalAccountCount": 54,
            "activeAccountCount": 108,
        }
        # an account active on many days registers ONCE: the registered
        # total never exceeds the distinct account count
        assert body["cumulative"][-1]["totalAccountCount"] == 54

    def test_account_stat_endpoints(self, spark):
        active = E.get_active_accounts(spark)
        reg = E.get_registered_accounts(spark)
        assert set(active) == {"total", "periodic"}
        assert set(reg) == {"total", "periodic", "cumulative"}
        # totals agree: both are the final registered count
        assert active["total"] == reg["total"]
        # registered periodic/cumulative drop the first day (slice(1))
        assert len(reg["periodic"]) == len(active["periodic"]) - 1
        # cumulative is the running sum of registrations and ends at total
        for prev, cur, p in zip(
            reg["cumulative"], reg["cumulative"][1:], reg["periodic"][1:]
        ):
            assert cur["value"] == prev["value"] + p["value"]
        assert reg["cumulative"][-1]["value"] == reg["total"]
        # registrations can never exceed that day's actives
        by_day = {p["datetime"]: p["value"] for p in active["periodic"]}
        for p in reg["periodic"]:
            assert 0 <= p["value"] <= by_day[p["datetime"]]

    def test_transaction_vol_series(self, spark):
        body = E.get_transaction_vol(spark)
        assert set(body) == {"periodic", "cumulative"}
        denoms = [p["denom"] for p in body["periodic"]]
        assert denoms == ["ukrw", "uluna", "usdr", "uusd"]
        # per-denom: cumulative is the running plus() of periodic
        for per, cum in zip(body["periodic"], body["cumulative"]):
            run = 0
            for p, c in zip(per["data"], cum["data"]):
                run += int(p["txVolume"])
                assert int(c["txVolume"]) == run
                assert p["datetime"] == c["datetime"]
        # golden first point (ukrw day 1)
        assert body["periodic"][0]["data"][0] == {
            "datetime": 1609459200000,
            "txVolume": "20930",
        }

    def test_block_rewards_series(self, spark):
        body = E.get_block_rewards(spark)
        run = 0
        for p, c in zip(body["periodic"], body["cumulative"]):
            run += int(p["blockReward"])
            assert int(c["blockReward"]) == run
        assert body["cumulative"][-1]["blockReward"] == "298600"

    def test_seigniorage_and_staking_ratio(self, spark):
        seig = E.get_seigniorage_proceeds(spark)
        ratio = E.get_staking_ratio(spark)
        # newest first, one row per fixture day
        assert len(seig) == 4 and len(ratio) == 4
        dts = [s["datetime"] for s in seig]
        assert dts == sorted(dts, reverse=True)
        assert seig[0] == {
            "datetime": 1609718400000,
            "seigniorageProceeds": "28960",
        }
        assert ratio[0] == {"datetime": 1609718400000, "stakingRatio": 0.43392}
        for r in ratio:
            assert 0.0 <= r["stakingRatio"] <= 1.0


class TestTxAndDashboardShapePins:
    """The reference's tx.spec.ts:6-16 / dashboard.spec.ts:22-50 field
    pins, applied to the existing serving functions — response fields by
    name, plus a golden row each."""

    def test_tx_list_response_shape(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.pipeline.medallion import account_tx_silver
        from classic_fcd_spark.serving.api import get_tx_list
        from classic_fcd_spark.sources.fixtures import gen_txs

        txs = gen_txs(spark)
        at = account_tx_silver(txs)
        acct = (
            at.groupBy("account")
            .count()
            .orderBy(F.col("count").desc(), "account")
            .first()["account"]
        )
        body = get_tx_list(txs, at, acct, limit=5)
        assert set(body) == {"limit", "next", "txs"}
        assert len(body["txs"]) == 5
        for t in body["txs"]:
            # txObject field pins (tx.spec.ts): hash/height/timestamp/
            # success/msgs
            assert set(t) == {"hash", "height", "timestamp", "success", "msgs"}
            assert isinstance(t["height"], int)
            assert isinstance(t["success"], bool)
            assert all(set(m) == {"type", "value"} for m in t["msgs"])
        heights = [t["height"] for t in body["txs"]]
        assert heights == sorted(heights, reverse=True)

    def test_dashboard_history_columns(self, spark):
        from classic_fcd_spark.pipeline.medallion import (
            account_tx_silver,
            dashboard_gold,
            minute_rewards_silver,
        )
        from classic_fcd_spark.serving.api import get_dashboard_history
        from classic_fcd_spark.sources.fixtures import gen_blocks, gen_txs

        txs = gen_txs(spark)
        dash = dashboard_gold(
            txs, account_tx_silver(txs), minute_rewards_silver(gen_blocks(spark))
        )
        hist = get_dashboard_history(dash)
        # dashboard.spec field families: cumulative + per-day + MA
        for col in (
            "day",
            "cumulative_active",
            "cumulative_reward",
            "tx_count_ma3",
            "tx_count_diff",
        ):
            assert col in hist.columns
        rows = hist.orderBy("day").collect()
        assert len(rows) >= 3
        # cumulative columns are non-decreasing (dashboard.spec's
        # cumulative array contract)
        cums = [r["cumulative_active"] for r in rows]
        assert all(b >= a for a, b in zip(cums, cums[1:]))


class TestUndelegationSchedule:
    """W10 (helper.ts:115-140 getUndelegateSchedule): DuckDB-oracle
    equivalence for the flattened schedule, the releaseTime ordering
    contract, and the serving grafts added in r8.  Driver-gated since
    the r10 rotation; this gate stays as the ordering/graft twin."""

    def test_matches_duckdb_oracle_and_order(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd_read import (
            _undelegation_oracle_sql,
            fcd_undelegation_schedule,
        )

        rows = fcd_undelegation_schedule(spark, "").collect()
        got = sorted(tuple(r) for r in rows)
        want = sorted(
            tuple(r) for r in duckdb.sql(_undelegation_oracle_sql()).fetchall()
        )
        assert got == want
        assert len(got) == 79
        key = [
            (r["release_time"], r["validator_address"], r["creation_height"])
            for r in rows
        ]
        assert key == sorted(key)

    def test_staking_view_grafts_undelegations(self, spark):
        # addr_str(3) owns unbondings u=3 (validator 3) and u=33
        # (validator 13) in the fixture arithmetic
        body = E.get_staking_account_view(spark, addr_str(3))
        mine = body["undelegations"]
        assert {u["validatorAddress"] for u in mine} == {
            valaddr_str(3), valaddr_str(13),
        }
        rel = [u["releaseTime"] for u in mine]
        assert rel == sorted(rel)
        # r9: every entry carries the validator's status exactly as the
        # reference does (helper.ts:124); fixture mapping: v=3 -> jailed
        # (jailed wins), v=13 -> 13%5=3 -> active
        status_by_val = {u["validatorAddress"]: u["validatorStatus"] for u in mine}
        assert status_by_val == {
            valaddr_str(3): "jailed",
            valaddr_str(13): "active",
        }
        # the JS truthy-empty-array quirk: EVERY validator row carries
        # myUndelegation, empty where none applies
        assert all("myUndelegation" in v for v in body["validators"])
        per_val = {
            v["operatorAddress"]: v["myUndelegation"] for v in body["validators"]
        }
        assert [u["validatorAddress"] for u in per_val[valaddr_str(3)]] == [
            valaddr_str(3)
        ]
        assert per_val[valaddr_str(5)] == []

    def test_validator_status_mapping_branches(self, spark):
        """The fixture's status column walks every branch of the
        reference's getValidatorStatus (validatorDetails.ts:23-44):
        jailed short-circuits, LCD codes 1/2/3 map, others -> unknown."""
        from classic_fcd_spark.sources.fixtures import gen_validators

        by_moniker = {
            r["moniker"]: r["status"] for r in gen_validators(spark).collect()
        }
        assert by_moniker["validator-0"] == "unknown"  # code 0
        assert by_moniker["validator-1"] == "inactive"
        assert by_moniker["validator-2"] == "unbonding"
        assert by_moniker["validator-3"] == "jailed"  # jailed beats code 3
        assert by_moniker["validator-4"] == "unknown"  # code 4
        assert by_moniker["validator-8"] == "active"  # 8%5=3, not jailed

    def test_balance_serves_raw_unbondings(self, spark):
        from classic_fcd_spark.serving.detail import get_account_balance
        from classic_fcd_spark.queries.fcd_read import _BALANCE_ACCOUNTS  # noqa: F401

        # the synthetic balance accounts have no unbondings
        assert get_account_balance(spark, "terra1base")["unbondings"] == []


class TestStakingAccountViewOracle:
    """Cross-engine gate for the staking account view's delegationTotal
    and ordering math (VERDICT r11 item 2; getStaking.ts:74-90): DuckDB
    recomputes the per-validator share sums from the DUCK_DELEGATIONS
    fixture twin, the power-desc validator ordering, the amount-desc
    myDelegations ordering, and the reduce-plus total — compared against
    the endpoint's money strings exactly."""

    @staticmethod
    def _oracle(address: str):
        import duckdb

        from classic_fcd_spark.sources.fixtures import (
            DUCK_DELEGATIONS,
            duck_valaddr,
        )

        sql = f"""
        WITH {DUCK_DELEGATIONS},
        vals AS (
            SELECT {duck_valaddr("v")} AS op,
                   'validator-' || v AS moniker,
                   v * 1000 + 5000 AS power
            FROM (SELECT unnest(range(0, 20)) AS v)
        ),
        mine AS (
            SELECT validator AS op, CAST(SUM(shares) AS BIGINT) AS my_shares
            FROM deleg WHERE delegator = '{address}' GROUP BY validator
        )
        SELECT v.op, v.moniker, v.power, m.my_shares
        FROM vals v LEFT JOIN mine m USING (op)
        ORDER BY v.power DESC, v.op
        """
        return duckdb.sql(sql).fetchall()

    def _check(self, body: dict, want_rows: list):
        from decimal import Decimal

        # validator ordering + per-validator graft, power desc
        assert [v["operatorAddress"] for v in body["validators"]] == [
            r[0] for r in want_rows
        ]
        for got, (op, moniker, power, my_shares) in zip(
            body["validators"], want_rows
        ):
            assert got["description"]["moniker"] == moniker
            assert int(Decimal(got["votingPower"])) == power
            if my_shares is None:
                assert "myDelegation" not in got
            else:
                assert int(Decimal(got["myDelegation"])) == my_shares
        # myDelegations: amount desc then address asc, exact amounts
        mine = sorted(
            ((r[3], r[0], r[1]) for r in want_rows if r[3] is not None),
            key=lambda t: (-t[0], t[1]),
        )
        assert [
            (int(Decimal(d["amountDelegated"])), d["validatorAddress"],
             d["validatorName"])
            for d in body["myDelegations"]
        ] == mine
        # delegationTotal: the reduce-plus over my delegations
        assert int(Decimal(body["delegationTotal"])) == sum(t[0] for t in mine)

    def test_nonvalidator_delegator_matches_oracle(self, spark):
        self._check(
            E.get_staking_account_view(spark, addr_str(3)),
            self._oracle(addr_str(3)),
        )

    def test_validator_account_delegator_matches_oracle(self, spark):
        # the d%5==0 fixture branch: validator-account delegators sum
        # MANY delegation rows into one validator's my_shares
        self._check(
            E.get_staking_account_view(spark, addr_str(1000)),
            self._oracle(addr_str(1000)),
        )

    def test_multi_validator_ordering_matches_oracle(self):
        """The fixture maps each delegator to ONE validator, so the
        amount-desc ordering + total are exercised on a synthetic
        multi-validator row set fed straight into the pure assembly —
        DuckDB computes the expected order (shares ties break on
        address) and total."""
        import duckdb

        from classic_fcd_spark.serving.endpoints import _assemble_staking_view

        rows = [
            {"operator_address": f"terravaloper1{i:038d}", "moniker": f"v{i}",
             "voting_power": 9000 - i, "my_shares": s}
            for i, s in enumerate([500, None, 700, 500, None, 12, 700])
        ]
        body = _assemble_staking_view(rows, [])
        vals = ", ".join(
            f"('{r['operator_address']}', '{r['moniker']}', {r['my_shares']})"
            for r in rows
            if r["my_shares"] is not None
        )
        want = duckdb.sql(
            f"""
            WITH mine(op, moniker, shares) AS (VALUES {vals})
            SELECT op, moniker, shares FROM mine ORDER BY shares DESC, op
            """
        ).fetchall()
        assert [
            (d["validatorAddress"], d["validatorName"],
             int(d["amountDelegated"]))
            for d in body["myDelegations"]
        ] == [tuple(r) for r in want]
        total = duckdb.sql(
            f"WITH mine(op, moniker, shares) AS (VALUES {vals}) "
            "SELECT CAST(SUM(shares) AS BIGINT) FROM mine"
        ).fetchone()[0]
        assert int(body["delegationTotal"]) == total


class TestSwapRateOracle:
    """Cross-engine gate for the denom swap-rate probe (VERDICT r11
    item 2; getSwapRate.ts:19-40 + helper.ts:42-60).  Two halves:

    1. The SNAPSHOT derivation (latest price per denom now and at
       midnight-minus-one-minute) is recomputed in DuckDB from the
       minute-grid fixture arithmetic — the first-row-per-key window at
       two cutoffs, cross-engine.
    2. The MONEY math is an exact-rational integer oracle.  The fixture
       price double is 1.0 + x/100.0 — TWO roundings, so it can sit one
       ulp off the two-decimal value, and _money (like the reference's
       BigNumber(number)) reads the double's shortest repr; the oracle
       crosses that boundary explicitly (repr -> e17 scaled int) and
       then truncates the exact rationals toward zero at the e10 money
       scale with big-int arithmetic (the cross-base cross-products
       exceed HUGEINT's 128 bits, so the trunc runs on Python ints —
       still exact, engine-independent math).  The endpoint's 28-digit
       Decimal divisions are correctly rounded, so trunc-of-rational
       and trunc-of-quotient agree except within ~1e-28 of an e10 grid
       point — unreachable for the fixture's denominators (see the
       margin note inline)."""

    @staticmethod
    def _snapshots():
        """(now, before) price_e2 per denom, via DuckDB windows over the
        regenerated minute grid (the gen_prices arithmetic)."""
        import duckdb

        from classic_fcd_spark.sources.fixtures import (
            EPOCH_START,
            FIXTURE_N_PRICE_MINUTES,
        )

        n = FIXTURE_N_PRICE_MINUTES
        now_s = EPOCH_START + (n - 1) * 60
        day_cut = (now_s // 86400) * 86400 - 60
        rows = duckdb.sql(
            f"""
            WITH grid AS (
                SELECT denom, {EPOCH_START} + m * 60 AS ts,
                       100 + (m * seed) % 100 AS p_e2
                FROM (SELECT unnest(range(0, {n})) AS m),
                     (SELECT * FROM (VALUES ('ukrw', 17), ('usdr', 29),
                                            ('uusd', 41)) t(denom, seed))
            ),
            latest AS (
                SELECT denom, p_e2, ROW_NUMBER() OVER (
                    PARTITION BY denom ORDER BY ts DESC) AS rn
                FROM grid
            ),
            before AS (
                SELECT denom, p_e2, ROW_NUMBER() OVER (
                    PARTITION BY denom ORDER BY ts DESC) AS rn
                FROM grid WHERE ts <= {day_cut}
            )
            SELECT l.denom, l.p_e2 AS now_e2, b.p_e2 AS before_e2
            FROM latest l JOIN before b USING (denom)
            WHERE l.rn = 1 AND b.rn = 1
            """
        ).fetchall()
        return {r[0]: (r[1], r[2]) for r in rows}

    @staticmethod
    def _e17(e2: int) -> int:
        """The JS-Number/Spark-double boundary: the double the endpoint
        sees, read back through its shortest repr (what Decimal(str(x))
        and BigNumber(x) both consume), scaled to an exact e17 int
        (doubles in [1, 2) have <= 16 fractional repr digits)."""
        from decimal import Decimal

        return int(Decimal(str(1.0 + (e2 - 100) / 100.0)).scaleb(17))

    @staticmethod
    def _trunc_e10(num: int, den: int) -> int:
        """trunc-toward-zero of num/den at the e10 money scale (exact
        big-int arithmetic; matches _money's ROUND_DOWN quantize).
        Margin: a non-grid rational sits >= 1/(den*1e10) from any e10
        grid point, far above the endpoint's 28-digit division error."""
        s = -1 if (num < 0) != (den < 0) else 1
        return s * (abs(num) * 10**10 // abs(den))

    @staticmethod
    def _money_e10(s: str) -> int:
        from decimal import Decimal

        return int(Decimal(s).scaleb(10))

    def test_uluna_base_matches_oracle(self, spark):
        snaps = self._snapshots()
        got = {r["denom"]: r for r in E.get_denom_swap_rate(spark, "uluna")}
        assert set(got) == set(snaps)
        e17 = 10**17
        for d, (now_e2, before_e2) in snaps.items():
            nc, np_ = self._e17(now_e2), self._e17(before_e2)
            r = got[d]
            # identity on prices; variation = cur - prev (exact decimal
            # subtraction in the endpoint -> exact rational here);
            # rate = cur/prev - 1 = (cur - prev)/prev
            assert self._money_e10(r["swaprate"]) == self._trunc_e10(nc, e17)
            assert self._money_e10(r["oneDayVariation"]) == self._trunc_e10(
                nc - np_, e17
            )
            assert self._money_e10(r["oneDayVariationRate"]) == self._trunc_e10(
                nc - np_, np_
            )

    def test_cross_base_matches_oracle(self, spark):
        snaps = self._snapshots()
        base = "uusd"
        nb, nb0 = self._e17(snaps[base][0]), self._e17(snaps[base][1])
        got = {r["denom"]: r for r in E.get_denom_swap_rate(spark, base)}
        assert set(got) == (set(snaps) - {base}) | {"uluna"}
        for d, r in got.items():
            if d == "uluna":
                nd = nd0 = 10**17  # 1/p[base]: numerator is exactly 1
            else:
                nd, nd0 = self._e17(snaps[d][0]), self._e17(snaps[d][1])
            # cur = nd/nb, prev = nd0/nb0:
            #   variation = cur - prev = (nd*nb0 - nd0*nb) / (nb*nb0)
            #   varrate   = cur/prev-1 = (nd*nb0 - nd0*nb) / (nd0*nb)
            num = nd * nb0 - nd0 * nb
            assert self._money_e10(r["swaprate"]) == self._trunc_e10(nd, nb)
            assert self._money_e10(r["oneDayVariation"]) == self._trunc_e10(
                num, nb * nb0
            )
            assert self._money_e10(r["oneDayVariationRate"]) == self._trunc_e10(
                num, nd0 * nb
            )


class TestVotesPageOracle:
    """Cross-engine gate for the votes page's dedupe/filter/paging math
    (getVotes.ts:41-79): DuckDB recomputes, from the DUCK_VOTES fixture
    twin, (1) the LATEST vote per voter, (2) the option filter applied
    AFTER the dedupe, (3) totalCnt of the filtered set, (4) the
    newest-first drop/take page — compared against the endpoint's
    response exactly, page by page."""

    @staticmethod
    def _oracle(proposal_id: int, option, page: int, limit: int):
        import duckdb

        from classic_fcd_spark.sources.fixtures import DUCK_VOTES

        opt = f"WHERE option = '{option}'" if option else ""
        sql = f"""
        WITH {DUCK_VOTES},
        latest AS (
            SELECT vote_id, voter, option FROM (
                SELECT vote_id, voter, option, ROW_NUMBER() OVER (
                    PARTITION BY voter ORDER BY vote_id DESC) AS rn
                FROM votes WHERE proposal_id = {proposal_id}
            ) WHERE rn = 1
        ),
        filtered AS (SELECT * FROM latest {opt})
        SELECT (SELECT COUNT(*) FROM filtered) AS total_cnt, voter, option
        FROM filtered
        ORDER BY vote_id DESC
        LIMIT {limit} OFFSET {(page - 1) * limit}
        """
        rows = duckdb.sql(sql).fetchall()
        total = rows[0][0] if rows else duckdb.sql(
            f"WITH {DUCK_VOTES}, latest AS (SELECT voter, option FROM ("
            f"SELECT voter, option, ROW_NUMBER() OVER (PARTITION BY voter "
            f"ORDER BY vote_id DESC) AS rn FROM votes WHERE proposal_id = "
            f"{proposal_id}) WHERE rn = 1) SELECT COUNT(*) FROM latest {opt}"
        ).fetchone()[0]
        return total, [(r[1], r[2]) for r in rows]

    def _check_page(self, spark, pid, option, page, limit):
        body = E.get_proposal_votes(spark, pid, page=page, limit=limit,
                                    option=option)
        total, want = self._oracle(pid, option, page, limit)
        assert body["totalCnt"] == total
        assert [
            (v["voter"]["accountAddress"], v["answer"]) for v in body["votes"]
        ] == want

    def test_all_pages_match_oracle(self, spark):
        # walk every page of proposal 1 (limit 7 -> uneven last page)
        total, _ = self._oracle(1, None, 1, 7)
        pages = (total + 6) // 7 + 1  # one past the end: empty page
        for page in range(1, pages + 1):
            self._check_page(spark, 1, None, page, 7)

    def test_option_filter_after_dedupe_matches_oracle(self, spark):
        for option in ("Yes", "No", "NoWithVeto", "Abstain"):
            self._check_page(spark, 1, option, 1, 10)


class TestDepositsPageOracle:
    """Cross-engine gate for the deposits page (getDeposits.ts:30-57):
    DuckDB regenerates the deposits fixture arithmetic (the same
    expressions gen_deposits evaluates in Spark) and recomputes the
    newest-first drop/take page with the Coin[] amounts — totalCnt,
    page membership, order, and every coin amount compared exactly."""

    @staticmethod
    def _oracle(proposal_id: int, page: int, limit: int):
        import duckdb

        from classic_fcd_spark.sources.fixtures import (
            FIXTURE_N_DEPOSITS,
            FIXTURE_N_PROPOSALS,
            duck_addr,
        )

        sql = f"""
        WITH deps AS (
            SELECT d AS deposit_id, d % {FIXTURE_N_PROPOSALS} AS proposal_id,
                   CASE WHEN d % 4 = 0 THEN {duck_addr("(d % 20) + 1000")}
                        ELSE {duck_addr("d % 30")} END AS depositor,
                   CASE WHEN d % 3 = 0
                        THEN [CAST(d * 700 % 5000 + 100 AS VARCHAR),
                              CAST(d * 1300 % 9000 + 500 AS VARCHAR)]
                        ELSE [CAST(d * 700 % 5000 + 100 AS VARCHAR)] END
                       AS amounts
            FROM (SELECT unnest(range(0, {FIXTURE_N_DEPOSITS})) AS d)
        ),
        scoped AS (SELECT * FROM deps WHERE proposal_id = {proposal_id})
        SELECT (SELECT COUNT(*) FROM scoped) AS total_cnt, depositor, amounts
        FROM scoped ORDER BY deposit_id DESC
        LIMIT {limit} OFFSET {(page - 1) * limit}
        """
        rows = duckdb.sql(sql).fetchall()
        import duckdb as _d

        total = rows[0][0] if rows else _d.sql(
            f"SELECT COUNT(*) FROM (SELECT unnest(range(0, "
            f"{FIXTURE_N_DEPOSITS})) AS d) WHERE d % {FIXTURE_N_PROPOSALS} "
            f"= {proposal_id}"
        ).fetchone()[0]
        return total, [(r[1], list(r[2])) for r in rows]

    def test_pages_match_oracle(self, spark):
        for page in (1, 2, 3):
            body = E.get_proposal_deposits(spark, 2, page=page, limit=2)
            total, want = self._oracle(2, page, 2)
            assert body["totalCnt"] == total
            got = [
                (
                    d["depositor"]["accountAddress"],
                    [c["amount"] for c in d["deposit"]],
                )
                for d in body["deposits"]
            ]
            assert got == want


class TestBronzeSourcesSeam:
    """The r13 source-override seam contract (serving/endpoints.py
    bronze_sources): scoped swap-in of stored tables, restored on BOTH
    normal exit and exception — a leaked override would silently serve
    a stale corpus to every later endpoint call in the session."""

    def test_override_scopes_and_restores_on_exception(self, spark):
        import pytest as _pytest

        import classic_fcd_spark.serving.endpoints as E

        marker = spark.range(1).selectExpr("id AS sentinel")
        assert "txs" not in E._overrides()
        with _pytest.raises(RuntimeError, match="boom"):
            with E.bronze_sources(txs=marker):
                assert E._txs_bronze(spark) is marker
                raise RuntimeError("boom")
        assert "txs" not in E._overrides()
        # and the default path is back to fixture bronze
        assert E._txs_bronze(spark) is not marker

    def test_nested_scopes_restore_outer(self, spark):
        import classic_fcd_spark.serving.endpoints as E

        a = spark.range(1).selectExpr("id AS a")
        b = spark.range(1).selectExpr("id AS b")
        with E.bronze_sources(txs=a):
            with E.bronze_sources(txs=b, blocks=b):
                assert E._txs_bronze(spark) is b
                assert E._blocks_bronze(spark) is b
            assert E._txs_bronze(spark) is a
            assert "blocks" not in E._overrides()
        assert "txs" not in E._overrides()
