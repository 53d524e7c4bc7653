"""Unit tests for the scalar function library (SURVEY §2.8/2.10).

Mirrors the reference's own unit surface: src/lib/math.spec.ts (null
coercion edge cases) and the address helpers in src/lib/common.ts.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from classic_fcd_spark.functions import math as m
from classic_fcd_spark.functions.bech32 import (
    bech32_decode,
    bech32_encode,
    convert_prefix,
    pubkey_to_address,
    to_hex,
)
from classic_fcd_spark.functions.common import (
    denom_sort_key,
    denom_to_currency,
    extract_addresses,
    split_denom_and_amount,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


class TestMathSemantics:
    """Replicates src/lib/math.spec.ts null/zero behavior."""

    def test_plus_null_coerces_to_zero(self, spark):
        assert _one(spark, m.plus(F.lit(None), F.lit(2))) == Decimal("2")
        assert _one(spark, m.plus(F.lit(None), F.lit(None))) == Decimal("0")

    def test_minus_times(self, spark):
        assert _one(spark, m.minus(F.lit("5.5"), F.lit(None))) == Decimal("5.5")
        assert _one(spark, m.times(F.lit(None), F.lit(7))) == Decimal("0")
        assert _one(spark, m.times(F.lit("2.5"), F.lit(4))) == Decimal("10")

    def test_div_null_divisor_is_identity(self, spark):
        # math.ts:8-9 — div(a, undefined) = a / 1
        assert _one(spark, m.div(F.lit("7.5"), F.lit(None))) == Decimal("7.5")
        assert _one(spark, m.div(F.lit(None), F.lit(4))) == Decimal("0")
        assert _one(spark, m.div(F.lit(9), F.lit(2))) == Decimal("4.5")

    def test_div_zero_divisor_is_null_under_ansi(self, spark):
        # BigNumber div(0) yields Infinity; decimal can't represent it —
        # try_divide maps it to NULL instead of an ANSI DIVIDE_BY_ZERO
        assert _one(spark, m.div(F.lit(5), F.lit(0))) is None

    def test_integer_portion_truncates_toward_zero(self, spark):
        assert _one(spark, m.get_integer_portion(F.lit("3.99"))) == Decimal("3")
        assert _one(spark, m.get_integer_portion(F.lit("-3.99"))) == Decimal("-3")

    def test_decimal_38_10_extremes(self, spark):
        # SURVEY §1.3: 28 integer digits is the policy ceiling.
        big = "9" * 28 + ".5"
        assert _one(spark, m.dec(F.lit(big))) == Decimal(big)


class TestCoinParsing:
    def test_split_denom_and_amount(self, spark):
        row = _one(spark, split_denom_and_amount(F.lit("123.45ukrw")))
        assert row["amount"] == Decimal("123.45") and row["denom"] == "ukrw"

    def test_split_malformed(self, spark):
        row = _one(spark, split_denom_and_amount(F.lit("garbage")))
        assert row["amount"] == Decimal("0") and row["denom"] == ""

    def test_denom_currency_map(self, spark):
        assert _one(spark, denom_to_currency(F.lit("uluna"))) == "Luna"
        assert _one(spark, denom_to_currency(F.lit("ukrw"))) == "KRT"
        assert _one(spark, denom_to_currency(F.lit("unknown"))) == "unknown"

    def test_denom_sort_order(self, spark):
        df = spark.createDataFrame(
            [("uusd",), ("x",), ("uluna",), ("usdr",), ("ukrw",), ("a",)], ["d"]
        )
        got = [r["d"] for r in df.orderBy(denom_sort_key("d")).collect()]
        assert got == ["uluna", "ukrw", "usdr", "uusd", "a", "x"]


# A real mainnet address pair (public, from Terra docs examples) would pin
# exactness; instead pin self-consistency + the BIP-173 spec test vector.
class TestBech32:
    def test_spec_vector_roundtrip(self):
        # BIP-173 valid test vector
        assert bech32_decode("an83characterlonghumanreadablepartthatcontainsthenumber1andtheexcludedcharactersbio1tt5tgs") is not None

    def test_roundtrip_and_prefix_convert(self):
        data = list(range(20)) + list(range(12))
        addr = bech32_encode("terra", data)
        assert bech32_decode(addr) == ("terra", data)
        val = convert_prefix(addr, "terravaloper")
        assert val.startswith("terravaloper1")
        assert convert_prefix(val, "terra") == addr

    def test_to_hex_is_20_bytes(self):
        payload = _fake_account_payload()
        addr = bech32_encode("terra", payload)
        h = to_hex(addr)
        assert h is not None and len(h) == 40

    def test_pubkey_to_address_deterministic(self):
        a1 = pubkey_to_address(b"\x01" * 33)
        a2 = pubkey_to_address(b"\x01" * 33)
        assert a1 == a2 and a1.startswith("terravalcons1")

    @pytest.mark.slow  # 98 s: full-batch bech32 UDF sweep (r16 tiering)
    def test_udf_batch(self, spark):
        from classic_fcd_spark.functions.bech32 import bech32_convert_to_valoper

        addr = bech32_encode("terra", _fake_account_payload())
        df = spark.createDataFrame([(addr,), (None,), ("notanaddress",)], ["a"])
        out = [r["v"] for r in df.select(bech32_convert_to_valoper("a").alias("v")).collect()]
        assert out[0].startswith("terravaloper1")
        assert out[1] is None and out[2] is None


def _fake_account_payload():
    # 20 bytes → 32 5-bit groups
    from classic_fcd_spark.functions.bech32 import _convertbits

    return _convertbits(list(range(20)), 8, 5)


class TestAddressExtraction:
    def test_extracts_both_kinds_distinct(self, spark):
        acct = bech32_encode("terra", _fake_account_payload())
        val = convert_prefix(acct, "terravaloper")
        payload = f'{{"from":"{acct}","to":"{acct}","val":"{val}"}}'
        got = _one(spark, extract_addresses(F.lit(payload)))
        assert sorted(got) == sorted([acct, val])


class TestRepetitionFilters:
    def _one(self, spark, col, text):
        return (
            spark.createDataFrame([(text,)], "text string")
            .select(col.alias("v"))
            .first()["v"]
        )

    def test_dup_line_fraction(self, spark):
        from classic_fcd_spark.functions.text import dup_line_fraction

        assert self._one(spark, dup_line_fraction("text"), "a\nb\nc") == 0.0
        # 4 lines, 2 distinct -> 0.5 duplicated
        assert self._one(spark, dup_line_fraction("text"), "a\na\nb\nb") == 0.5

    def test_top_ngram_fraction_flags_loops(self, spark):
        from classic_fcd_spark.functions.text import top_ngram_fraction

        looped = "click here " * 10 + "end"  # 'click here' dominates
        clean = "the quick brown fox jumps over a lazy dog tonight"
        assert self._one(spark, top_ngram_fraction("text"), looped.strip()) > 0.8
        assert self._one(spark, top_ngram_fraction("text"), clean) < 0.3

    def test_composed_filter(self, spark):
        from classic_fcd_spark.functions.text import passes_repetition_filter

        assert self._one(
            spark, passes_repetition_filter("text"),
            "one two three four five six seven eight nine ten",
        )
        assert not self._one(
            spark, passes_repetition_filter("text"), ("spam ham " * 20).strip()
        )


class TestMathDuckOracle:
    """F1/F2 cross-engine oracle (r8): the same null/zero quirks
    evaluated as DECIMAL SQL in DuckDB over a shared value table —
    upgrading the BigNumber-parity gate from unit pins to an
    engine-equivalence check.  Operand pairs are exact at scale 10
    (clean divisors), so no rounding-rule divergence can mask or fake a
    semantics difference."""

    CASES = [
        ("1.5", "2.5"),
        (None, "2"),
        ("5.5", None),
        (None, None),
        ("-3.99", "2"),
        ("7.5", "0.5"),
        ("9", "2"),
        ("5", "0"),          # zero divisor: Infinity -> NULL on both sides
        ("-7", "4"),
        # sized so every result is exact on both engines: DuckDB DECIMAL
        # division routes through DOUBLE (exact only below ~2^53/1e10)
        # and DECIMAL(38) products overflow where Spark allows precision
        # loss — the (38,10) extreme itself is pinned in TestMathSemantics
        ("123456.25", "5"),
    ]

    def _spark_rows(self, spark):
        import classic_fcd_spark.functions.math as m

        df = spark.createDataFrame(self.CASES, "a string, b string")
        return {
            (r["a"], r["b"]): (
                r["plus"], r["minus"], r["times"], r["div"], r["intp"],
            )
            for r in df.select(
                "a",
                "b",
                m.plus("a", "b").alias("plus"),
                m.minus("a", "b").alias("minus"),
                m.times("a", "b").alias("times"),
                F.col("a").alias("_a"),
                m.div("a", "b").cast("decimal(38,10)").alias("div"),
                m.get_integer_portion("a").alias("intp"),
            ).collect()
        }

    def test_matches_duckdb_decimal_semantics(self, spark):
        import duckdb

        got = self._spark_rows(spark)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (a VARCHAR, b VARCHAR)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?)", self.CASES)
        az = "COALESCE(CAST(a AS DECIMAL(38,10)), 0)"
        bz = "COALESCE(CAST(b AS DECIMAL(38,10)), 0)"
        b1 = "COALESCE(CAST(b AS DECIMAL(38,10)), 1)"
        want_rows = con.execute(
            f"""
            SELECT a, b,
                   {az} + {bz} AS plus,
                   {az} - {bz} AS minus,
                   CAST({az} * {bz} AS DECIMAL(38,10)) AS times,
                   CAST({az} / NULLIF({b1}, 0) AS DECIMAL(38,10)) AS div,
                   CAST(TRUNC(CAST(a AS DECIMAL(38,10))) AS DECIMAL(38,10)) AS intp
            FROM t
            """
        ).fetchall()
        want = {(r[0], r[1]): tuple(r[2:]) for r in want_rows}
        assert set(got) == set(want)
        for k in got:
            for g, w, name in zip(
                got[k], want[k], ("plus", "minus", "times", "div", "intp")
            ):
                assert (g is None) == (w is None), (k, name, g, w)
                if g is not None:
                    assert Decimal(g) == Decimal(w), (k, name, g, w)


class TestCompatDuckOracle:
    """F14/F15 cross-engine oracle (r8): the rename chain and the
    null-byte scrub as DuckDB replace() chains in the same
    longest-first order, over strings that exercise the ordering trap
    (MsgSend inside MsgMultiSend) and the NUL escape variants."""

    def test_sync_msg_type_matches_duckdb(self, spark):
        import duckdb

        from classic_fcd_spark.functions.compat import (
            _ORDERED_RENAMES,
            sync_msg_type,
        )

        cases = [
            ('{"type":"cosmos-sdk/MsgSend","x":1}',),
            ('{"type":"cosmos-sdk/MsgMultiSend","x":1}',),
            # both in one payload; the longest-first chain must rewrite
            # MultiSend as a unit, never via the MsgSend substring
            ('["cosmos-sdk/MsgMultiSend","cosmos-sdk/MsgSend"]',),
            ('{"type":"cosmos-sdk/MsgWithdrawValidatorCommission"}',),
            ('{"type":"market/MsgSwap"}',),  # no rename applies
        ]
        df = spark.createDataFrame(cases, "raw string")
        got = {
            r["raw"]: r["out"]
            for r in df.select("raw", sync_msg_type("raw").alias("out")).collect()
        }
        con = duckdb.connect()
        expr = "raw"
        for old, new in _ORDERED_RENAMES:
            expr = f"replace({expr}, '{old}', '{new}')"
        con.execute("CREATE TABLE t (raw VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", cases)
        want = {r[0]: r[1] for r in con.execute(f"SELECT raw, {expr} FROM t").fetchall()}
        assert got == want
        # and the trap case actually renamed both, correctly
        assert (
            got['["cosmos-sdk/MsgMultiSend","cosmos-sdk/MsgSend"]']
            == '["pay/MsgMultiSend","pay/MsgSend"]'
        )

    def test_scrub_null_bytes_matches_duckdb(self, spark):
        import duckdb

        from classic_fcd_spark.functions.compat import scrub_null_bytes

        cases = [
            ('memo \\\\u0000 tail',),
            ('memo \\u0000 tail',),
            ("memo \x00 tail",),
            ('a\\\\u0000b\\u0000c\x00d',),
            ("clean",),
        ]
        df = spark.createDataFrame(cases, "raw string")
        got = {
            r["raw"]: r["out"]
            for r in df.select(
                "raw", scrub_null_bytes("raw").alias("out")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (raw VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", cases)
        # same longest-first chain: 2-backslash, 1-backslash, raw NUL
        expr = (
            "replace(replace(replace(replace(raw,"
            " '\\\\u0000', ''),"
            " '\\u0000', ''),"
            " chr(0), ''), '@@never@@', '')"
        )
        want = {
            r[0]: r[1] for r in con.execute(f"SELECT raw, {expr} FROM t").fetchall()
        }
        assert got == want
