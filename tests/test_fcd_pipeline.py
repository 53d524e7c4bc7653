"""fcd medallion pipeline + serving tests.

The exact-value oracle for the pipeline lives in queries/fcd.py (DuckDB
regenerates the fixture arithmetically).  These tests add an independent
*Python* oracle for the serving contract: collect the bronze fixture,
recompute the expected answers with json/dict code, compare.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from classic_fcd_spark.pipeline.medallion import (
    account_tx_silver,
    block_rewards_silver,
    dashboard_gold,
    minute_rewards_silver,
)
from classic_fcd_spark.serving.api import (
    get_dashboard_history,
    get_tx_list,
    get_validator_returns,
)
from classic_fcd_spark.sources.fixtures import (
    gen_blocks,
    gen_txs,
    gen_validators,
)

N = 120  # small fixture for fast tests


class TestAccountTxExplode:
    def test_matches_python_json_walk(self, spark):
        """F4 parity: Spark's regex extraction over to_json(msgs) must find
        exactly the addresses a recursive Python JSON walk finds."""
        txs = gen_txs(spark, N)
        got = {
            (r["hash"], r["account"])
            for r in account_tx_silver(txs).collect()
        }
        expected = set()
        for r in txs.collect():
            addrs = set()

            def walk(v):
                if isinstance(v, str):
                    import re

                    for m in re.findall(r"terravaloper1[a-z0-9]{38}|terra1[a-z0-9]{38}", v):
                        addrs.add(m)
                elif isinstance(v, dict):
                    for x in v.values():
                        walk(x)
                elif isinstance(v, list):
                    for x in v:
                        walk(x)

            for m in r["msgs"]:
                walk(json.loads(m["value"]))
            expected |= {(r["hash"], a) for a in addrs}
        assert got == expected


class TestBlockRewards:
    def test_denom_maps_sum_to_total(self, spark):
        blocks = gen_blocks(spark, N)
        br = block_rewards_silver(blocks)
        # map totals must equal the flat minute rollup totals
        flat_total = (
            minute_rewards_silver(blocks).agg(F.sum("total")).collect()[0][0]
        )
        map_total = (
            br.select(F.explode("denom_map").alias("d", "v"))
            .agg(F.sum("v"))
            .collect()[0][0]
        )
        assert int(map_total) == int(flat_total)


class TestServing:
    def test_tx_list_contract(self, spark):
        txs = gen_txs(spark, N)
        at = account_tx_silver(txs)
        # most active account
        acct = (
            at.groupBy("account")
            .count()
            .orderBy(F.col("count").desc(), "account")
            .first()["account"]
        )
        page1 = get_tx_list(txs, at, acct, limit=5)
        assert len(page1["txs"]) == 5 and page1["next"] is not None
        keys1 = [(t["height"], t["hash"]) for t in page1["txs"]]
        assert keys1 == sorted(keys1, reverse=True)
        page2 = get_tx_list(txs, at, acct, limit=5, offset=page1["next"])
        keys2 = [(t["height"], t["hash"]) for t in page2["txs"]]
        # strict keyset: every page-2 key sorts below the page-1 cursor and
        # no key is skipped or repeated across the boundary
        assert all(k < tuple(page1["next"]) for k in keys2)
        assert not (set(keys1) & set(keys2))
        # every returned tx actually mentions the account
        for t in page1["txs"]:
            assert any(acct in m["value"] for m in t["msgs"])

    def test_dashboard_history_windows(self, spark):
        txs = gen_txs(spark, N)
        dash = dashboard_gold(
            txs, account_tx_silver(txs), minute_rewards_silver(gen_blocks(spark, N))
        )
        hist = get_dashboard_history(dash).orderBy("day").collect()
        running = 0
        for row in hist:
            running += row["active_accounts"]
            assert row["cumulative_active"] == running

    def test_validator_returns_annualization(self, spark):
        from classic_fcd_spark.pipeline.medallion import validator_returns_gold

        vr = validator_returns_gold(gen_blocks(spark, N), gen_validators(spark))
        out = get_validator_returns(vr, window_days=30).collect()
        assert out
        for r in out:
            assert r["is_new_validator"] == (r["n_days"] < 15)


class TestCompaction:
    def test_compact_msgs_strips_unrelated(self, spark):
        """P6: a tx with two msgs keeps only the one mentioning the
        address; raw_log blanks on success (getTxList.ts:64-127)."""
        from classic_fcd_spark.serving.api import compact_msgs

        rows = [
            (
                "h1",
                None,
                [
                    {"type": "bank/MsgSend", "value": '{"to":"terra1aaa"}'},
                    {"type": "bank/MsgSend", "value": '{"to":"terra1bbb"}'},
                ],
                '[{"events":[]}]',
            ),
            (
                "h2",
                4,
                [{"type": "bank/MsgSend", "value": '{"to":"terra1aaa"}'}],
                None,
            ),
        ]
        df = spark.createDataFrame(
            rows,
            "hash string, code int, "
            "msgs array<struct<type:string, value:string>>, logs_json string",
        )
        out = {r["hash"]: r for r in compact_msgs(df, "terra1aaa").collect()}
        assert len(out["h1"]["msgs"]) == 1
        assert out["h1"]["msgs"][0]["value"] == '{"to":"terra1aaa"}'
        assert out["h1"]["raw_log"] == ""  # success -> blanked
        assert len(out["h2"]["msgs"]) == 1  # failed tx keeps raw_log
        assert out["h2"]["raw_log"] == ""


class TestFcdReadSurfaces:
    """r3 serving read surfaces (queries/fcd_read.py) — semantic checks
    the oracle hash can't express on its own."""

    def test_proposals_chain_removal_and_zero_nonvoting(self, spark):
        from classic_fcd_spark.queries.fcd_read import fcd_proposals

        rows = {r["proposal_id"]: r for r in fcd_proposals(spark, "").collect()}
        # D1: proposal 5 is off-chain and must be deleted from the view
        assert 5 not in rows and len(rows) == 7
        # proposal 0's voter arithmetic covers all 20 validator accounts:
        # the J9 anti-join must yield an explicit zero, not a dropped row
        assert rows[0]["n_nonvoting_validators"] == 0
        # proposals without votes: all 20 validators are non-voting
        assert rows[3]["n_nonvoting_validators"] == 20
        assert rows[3]["yes"] == 0
        # F20 display maps
        assert rows[0]["status_display"] == "Voting"
        by_type = {r["type_display"] for r in rows.values()}
        assert "Text Proposal" in by_type
        assert "custom/FancyProposal" in by_type  # unknown passes through

    def test_general_info_daily_picks_earliest_snapshot(self, spark):
        from classic_fcd_spark.queries.fcd_read import fcd_general_info_daily

        rows = {r["day"]: r for r in fcd_general_info_daily(spark, "").collect()}
        # day 1 starts at minute m=0: seigniorage = 0, ratio = 300000
        assert rows["2021-01-01"]["seigniorage"] == 0
        assert rows["2021-01-01"]["staking_ratio_e6"] == 300000
        # every later day reports its first minute (m = k*1440), not an avg
        assert rows["2021-01-02"]["seigniorage"] == (1440 * 53) % 100000

    def test_bank_balance_negative_available_allowed(self, spark):
        from classic_fcd_spark.queries.fcd_read import fcd_bank_balance

        rows = {
            (r["address"], r["denom"]): r
            for r in fcd_bank_balance(spark, "").collect()
        }
        # calculate.ts's min() can go negative when vesting exceeds
        # liquid + delegated_vesting — preserved, not clamped
        assert rows[("terra1lazy5", "uluna")]["available"] == -50.0
        assert rows[("terra1grad1", "uluna")]["freed_vesting"] == 50.0


class TestStakingViewOracle:
    """fcd_staking_view left the driver window in r10 (slot rotated to
    fcd_undelegation_schedule); this is its oracle gate now — the same
    fixture-CTE DuckDB SQL that drove its green r2-r9 driver rows."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            STAKING_VIEW_ORACLE_SQL,
            fcd_staking_view,
        )

        got = {
            r["operator_address"]: (r["moniker"], r["voting_power"], r["my_shares"])
            for r in fcd_staking_view(spark, "").collect()
        }
        expected = {
            r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(STAKING_VIEW_ORACLE_SQL).fetchall()
        }
        assert got == expected
        assert len(got) == 20


class TestMarketCapOracle:
    """fcd_market_cap left the driver window in r5 (slot rotated to
    interval_joined_events); this is its oracle gate now — the same
    self-contained fixture-CTE DuckDB SQL that drove its green r2-r4
    driver rows."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import MARKET_CAP_ORACLE_SQL, fcd_market_cap
        from tests.conftest import SF_SMALL

        got = {
            (str(r["day"]), r["denom"]): (r["issuance"], r["market_cap_usd_e6"])
            for r in fcd_market_cap(spark, SF_SMALL).collect()
        }
        expected = {
            (str(r[0]), r[1]): (r[2], r[3])
            for r in duckdb.sql(MARKET_CAP_ORACLE_SQL).fetchall()
        }
        assert got == expected
        assert len(got) == 16


class TestDelegatorWeightsOracle:
    """fcd_delegator_weights left the driver window late in r5 (slot
    rotated to semantic_dedup); this is its oracle gate now — the same
    fixture-CTE DuckDB SQL that drove its green r2-r5 driver rows.  The
    share-of-total + ranking pattern stays driver-gated via
    fcd_richlist (A22/W11)."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            DELEGATOR_WEIGHTS_ORACLE_SQL,
            fcd_delegator_weights,
        )
        from tests.conftest import SF_SMALL

        got = {
            r["delegator"]: (r["shares"], r["weight_e6"], r["rnk"])
            for r in fcd_delegator_weights(spark, SF_SMALL).collect()
        }
        expected = {
            r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(DELEGATOR_WEIGHTS_ORACLE_SQL).fetchall()
        }
        assert got == expected
        assert len(got) == 2


class TestCumulativeRewardsOracle:
    """fcd_cumulative_rewards left the driver window in r6 (slot rotated
    to bm25_search); this is its oracle gate now — the same
    fixture-CTE DuckDB SQL that drove its green r2-r5 driver rows.  The
    W1/W2 cumulative-window pattern stays driver-gated via
    account_growth."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            CUMULATIVE_REWARDS_ORACLE_SQL,
            fcd_cumulative_rewards,
        )
        from tests.conftest import SF_SMALL

        got = {
            (r["day"], r["denom"]): (r["reward"], r["cumulative_reward"])
            for r in fcd_cumulative_rewards(spark, SF_SMALL).collect()
        }
        expected = {
            (r[0], r[1]): (r[2], r[3])
            for r in duckdb.sql(CUMULATIVE_REWARDS_ORACLE_SQL).fetchall()
        }
        assert got == expected
        # per-denom running sums must end at the full-series totals
        for denom in ("ukrw", "uluna"):
            series = sorted(
                (day, v) for (day, d2), v in got.items() if d2 == denom
            )
            assert series[-1][1][1] == sum(v[0] for _, v in series)


class TestVotesPageOracle:
    """fcd_votes_page left the driver window late in r5 (slot rotated to
    dsir_select); this is its oracle gate now.  The page contracts stay
    driver-gated via keyset_page_orders (L1) and fcd_price_buckets_15m
    (L5)."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            VOTES_PAGE_ORACLE_SQL,
            fcd_votes_page,
        )
        from tests.conftest import SF_SMALL

        got = [
            (r["vote_id"], r["voter"], r["option"])
            for r in fcd_votes_page(spark, SF_SMALL).collect()
        ]
        expected = [tuple(r) for r in duckdb.sql(VOTES_PAGE_ORACLE_SQL).fetchall()]
        assert got == expected
        assert len(got) == 10


class TestAvgStakingDailyOracle:
    """fcd_avg_staking_daily left the driver window in r8 (slot rotated
    to ccnet_perplexity); this is its oracle gate now — the same
    fixture-CTE DuckDB SQL that drove its green r2-r7 driver rows.  The
    daily integer-floor-average pattern stays driver-gated via
    fcd_dashboard (pricing_summary rotated to an in-test gate in r9)."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            AVG_STAKING_DAILY_ORACLE_SQL,
            fcd_avg_staking_daily,
        )
        from tests.conftest import SF_SMALL

        got = {
            str(r["day"]): (r["avg_staking_ratio_e6"], r["avg_bonded"])
            for r in fcd_avg_staking_daily(spark, SF_SMALL).collect()
        }
        expected = {
            str(r[0]): (r[1], r[2])
            for r in duckdb.sql(AVG_STAKING_DAILY_ORACLE_SQL).fetchall()
        }
        assert got == expected
        assert len(got) > 0


class TestValidatorAnnualReturnOracle:
    """fcd_validator_annual_return left the driver window in r9 (slot
    rotated to approx_top_tokens); this is its oracle gate now — the
    same fixture-CTE DuckDB SQL that drove its green driver rows.  The
    daily-return input (A13) stays driver-gated via
    fcd_validator_returns."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            VALIDATOR_ANNUAL_RETURN_ORACLE_SQL,
            fcd_validator_annual_return,
        )

        got = {
            r["operator_address"]: (
                r["annual_return_e6"], r["n_days"], r["is_new_validator"]
            )
            for r in fcd_validator_annual_return(spark, "").collect()
        }
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(VALIDATOR_ANNUAL_RETURN_ORACLE_SQL).fetchall()
        }
        assert got == want
        assert len(got) == 20


class TestTxByHashOracle:
    """fcd_tx_by_hash left the driver window in r13 (slot rotated to
    fcd_account_txs_enriched); this is its oracle gate now — the
    IDENTICAL single-row SQL that drove its green r2-r12 driver rows.
    The P7 point-lookup pattern stays exercised (and plan-asserted)
    through the serving extract's lookup_tx, and the case-insensitive
    predicate shape through serving/api.get_tx_by_hash."""

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from classic_fcd_spark.queries.fcd import (
            TX_BY_HASH_ORACLE_SQL,
            fcd_tx_by_hash,
        )

        got = [
            (r["hash"], r["height"], r["msg_type"], r["success"])
            for r in fcd_tx_by_hash(spark, "").collect()
        ]
        want = [tuple(r) for r in duckdb.sql(TX_BY_HASH_ORACLE_SQL).fetchall()]
        assert got == want
        assert len(got) == 1
