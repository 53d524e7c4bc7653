"""F14/F15/F16/F17 chain-version compat tests — each case mirrors a
reference code path (file:line in the function docstrings)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from classic_fcd_spark.functions.compat import (
    COLUMBUS1_GENESIS_MS,
    freed_rate,
    normalize_account,
    scrub_null_bytes,
    sync_msg_type,
    vesting_balance,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "raw string").select(col.alias("out")).first()["out"]


class TestMsgTypeSync:
    def test_renames_all_known_types(self, spark):
        tx = json.dumps(
            {
                "msg": [
                    {"type": "cosmos-sdk/MsgSend"},
                    {"type": "cosmos-sdk/MsgMultiSend"},
                    {"type": "cosmos-sdk/MsgWithdrawDelegationReward"},
                    {"type": "cosmos-sdk/MsgUnjail"},
                    {"type": "bank/MsgSend"},
                ]
            }
        )
        out = json.loads(_one(spark, sync_msg_type(F.col("raw")), tx))
        types = [m["type"] for m in out["msg"]]
        assert types == [
            "pay/MsgSend",
            "pay/MsgMultiSend",
            "distribution/MsgWithdrawDelegationReward",
            "slashing/MsgUnjail",
            "bank/MsgSend",  # untouched: already columbus-2+
        ]


class TestNullScrub:
    def test_strips_all_three_forms(self, spark):
        raw = 'a\\\\u0000b\\u0000c\x00d'
        assert _one(spark, scrub_null_bytes(F.col("raw")), raw) == "abcd"

    def test_four_backslash_form_erases_as_unit(self, spark):
        # tx.ts:172's longest variant: four literal backslashes + u0000
        # must vanish entirely, not leave '\\' residue
        raw = "a" + "\\" * 4 + "u0000" + "b"
        assert _one(spark, scrub_null_bytes(F.col("raw")), raw) == "ab"


class TestNormalizeAccount:
    def test_base_account(self, spark):
        acc = json.dumps(
            {
                "type": "core/Account",
                "value": {"address": "terra1x", "coins": [{"denom": "uluna", "amount": "5"}]},
            }
        )
        out = _one(spark, normalize_account(F.col("raw")), acc)
        assert out["address"] == "terra1x"
        assert out["coins"][0]["denom"] == "uluna"
        assert out["original_vesting"] is None

    def test_lazy_vesting_columbus5(self, spark):
        acc = json.dumps(
            {
                "type": "core/LazyGradedVestingAccount",
                "value": {
                    "base_vesting_account": {
                        "base_account": {"address": "terra1v5"},
                        "original_vesting": [{"denom": "uluna", "amount": "100"}],
                        "delegated_free": [],
                        "delegated_vesting": [{"denom": "uluna", "amount": "10"}],
                    },
                    "coins": [{"denom": "uluna", "amount": "7"}],
                    "vesting_schedules": [
                        {
                            "denom": "uluna",
                            "schedules": [
                                {"start_time": "1000", "end_time": "2000", "ratio": "1.0"}
                            ],
                        }
                    ],
                },
            }
        )
        out = _one(spark, normalize_account(F.col("raw")), acc)
        assert out["address"] == "terra1v5"
        assert out["coins"][0]["amount"] == "7"
        assert out["original_vesting"][0]["amount"] == "100"
        # LCD second-valued schedule times are normalized to ms
        # (calculate.ts:27-29 convertSchedules)
        assert out["vesting_schedules"][0]["schedules"][0]["end_time"] == "2000000"

    def test_lazy_vesting_columbus4_flat(self, spark):
        acc = json.dumps(
            {
                "type": "core/LazyGradedVestingAccount",
                "value": {
                    "address": "terra1v4",
                    "coins": [],
                    "original_vesting": [{"denom": "usdr", "amount": "50"}],
                    "delegated_free": [],
                    "delegated_vesting": [],
                    "vesting_schedules": [],
                },
            }
        )
        out = _one(spark, normalize_account(F.col("raw")), acc)
        assert out["address"] == "terra1v4"
        assert out["original_vesting"][0]["denom"] == "usdr"

    def test_graded_vesting_columbus1_cliff_windows(self, spark):
        """normalizeAccount.ts:25-41: cliffs become rolling windows with
        the columbus-1 genesis as the first start."""
        acc = json.dumps(
            {
                "type": "core/GradedVestingAccount",
                "value": {
                    "BaseVestingAccount": {
                        "BaseAccount": {"address": "terra1v1", "coins": []},
                        "original_vesting": [{"denom": "uluna", "amount": "9"}],
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
            }
        )
        out = _one(spark, normalize_account(F.col("raw")), acc)
        scheds = out["vesting_schedules"][0]["schedules"]
        assert scheds[0]["start_time"] == COLUMBUS1_GENESIS_MS
        assert scheds[0]["end_time"] == "1600000000000"
        assert scheds[1]["start_time"] == "1600000000000"
        assert scheds[1]["end_time"] == "1700000000000"
        assert out["address"] == "terra1v1"

    def test_module_account_both_shapes(self, spark):
        col3 = json.dumps(
            {
                "type": "supply/ModuleAccount",
                "value": {
                    "BaseAccount": {"address": "terra1m3", "coins": []},
                    "name": "oracle",
                    "permissions": ["burner"],
                },
            }
        )
        col5 = json.dumps(
            {
                "type": "core/ModuleAccount",
                "value": {"address": "terra1m5", "coins": [], "name": "fee", "permissions": []},
            }
        )
        o3 = _one(spark, normalize_account(F.col("raw")), col3)
        o5 = _one(spark, normalize_account(F.col("raw")), col5)
        assert (o3["address"], o3["name"], list(o3["permissions"])) == ("terra1m3", "oracle", ["burner"])
        assert (o5["address"], o5["name"]) == ("terra1m5", "fee")

    def test_unknown_type_is_null(self, spark):
        out = _one(
            spark,
            normalize_account(F.col("raw")),
            json.dumps({"type": "bogus/Account", "value": {}}),
        )
        assert out is None


class TestVestingMath:
    def _rate(self, spark, schedules, now_ms):
        df = spark.createDataFrame(
            [(schedules,)],
            "s array<struct<start_time:string, end_time:string, ratio:string>>",
        )
        return df.select(freed_rate(F.col("s"), now_ms).alias("r")).first()["r"]

    def test_freed_rate_clamps_and_sums(self, spark):
        scheds = [
            ("0", "1000", "0.5"),     # fully past: contributes 0.5
            ("1000", "3000", "0.5"),  # halfway at now=2000: 0.25
            ("5000", "9000", "0.3"),  # future: rate < 0 -> 0
        ]
        assert abs(self._rate(spark, scheds, 2000) - 0.75) < 1e-12

    def test_freed_rate_zero_length_window_under_ansi(self, spark):
        # end == start would be DIVIDE_BY_ZERO under the session's ANSI
        # default; the reference's BigNumber yields NaN and its rate > 0
        # guard drops it — try_divide gives the same zero contribution
        scheds = [("1000", "1000", "0.4"), ("0", "1000", "0.6")]
        assert abs(self._rate(spark, scheds, 2000) - 0.6) < 1e-12

    def test_columbus5_second_schedules_mid_window(self, spark):
        """End-to-end unit consistency (the r2 advice finding): a
        columbus-5 account with second-encoded schedules, evaluated at a
        mid-window block time in ms, must yield a partial rate — not
        saturate to fully-freed."""
        acc = json.dumps(
            {
                "type": "core/LazyGradedVestingAccount",
                "value": {
                    "base_vesting_account": {
                        "base_account": {"address": "terra1mid"},
                        "original_vesting": [{"denom": "uluna", "amount": "100"}],
                        "delegated_free": [],
                        "delegated_vesting": [],
                    },
                    "coins": [],
                    "vesting_schedules": [
                        {
                            "denom": "uluna",
                            "schedules": [
                                # seconds: 2020-09-13..2023-11-14
                                {"start_time": "1600000000", "end_time": "1700000000", "ratio": "1.0"}
                            ],
                        }
                    ],
                },
            }
        )
        now_ms = 1650000000 * 1000  # exact midpoint, in ms
        df = spark.createDataFrame([(acc,)], "raw string").select(
            normalize_account(F.col("raw")).alias("a")
        )
        rate = df.select(
            freed_rate(F.col("a.vesting_schedules")[0]["schedules"], now_ms).alias("r")
        ).first()["r"]
        assert abs(rate - 0.5) < 1e-9

    def test_balance_formula(self, spark):
        df = spark.createDataFrame([(100.0, 40.0, 10.0, 0.25, True)],
                                   "amount double, ov double, dv double, rate double, vested boolean")
        out = df.select(
            vesting_balance(
                F.col("amount"), F.col("ov"), F.col("dv"), F.col("rate"), F.col("vested")
            ).alias("b")
        ).first()["b"]
        # freed = 10, vesting = 30, available = min(100, 100+10-30) = 80
        assert out["freed_vesting"] == 10.0
        assert out["vesting"] == 30.0
        assert out["available"] == 80.0
        assert out["remaining_vesting"] == 30.0
