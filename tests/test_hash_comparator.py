"""Hash-only comparator gate (VERDICT r13 item 4).

The --hash-only mode of scripts/check_correctness.py replaces the
collect-both-sides row compare with engine-side signatures (count,
bit_xor of a 60-bit md5 row hash, low-bit sum) over a canonical string
rendering.  These tests pin the three properties the sf≥1 scale gate
rests on:

1. Rendering parity: identical values produce identical canonical
   strings in Spark and DuckDB — including the double edge cases
   (NaN, ±Inf, ±0.0, subnormals, random bit patterns).
2. Sensitivity: a changed value, a dropped row, and the xor-degenerate
   duplicate-pair swap {A,A,B} vs {C,C,B} all flip the signature.
3. Verdict parity: on real driver queries the hash verdict equals the
   strict row-compare verdict.
"""

from __future__ import annotations

import random
import struct

import duckdb
import pytest

from scripts.check_correctness import (
    _duck_canon,
    _spark_canon,
    compare_hash_only,
    hash_signature_duck,
    hash_signature_spark,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_render(spark, values, sql_type):
    rows = ", ".join(f"(CAST({v} AS {sql_type}))" for v in values)
    expr = _spark_canon("x", sql_type.lower())
    return [
        r.r
        for r in spark.sql(f"SELECT {expr} AS r FROM VALUES {rows} t(x)").collect()
    ]


def _duck_render(duck, values, sql_type):
    arr = ", ".join(f"CAST({v} AS {sql_type})" for v in values)
    expr = _duck_canon("x", sql_type.upper())
    return [
        r[0]
        for r in duck.sql(
            f"SELECT {expr} FROM (SELECT unnest([{arr}]) AS x) t"
        ).fetchall()
    ]


class TestRenderingParity:
    def test_double_edge_cases(self, spark, duck):
        vals = [
            "1.5", "-0.0", "0.0", "1e-300", "-2.5e17",
            "3.141592653589793", "'NaN'", "'Infinity'", "'-Infinity'",
            "5e-324", "-5e-324", "1.7976931348623157e308",
            "2.2250738585072014e-308",  # smallest normal
            "1e-310",  # subnormal
            "NULL",
        ]
        # DuckDB spells the specials differently
        dvals = [v.replace("Infinity", "inf").replace("NaN", "nan") for v in vals]
        s = _spark_render(spark, vals, "DOUBLE")
        d = _duck_render(duck, dvals, "DOUBLE")
        assert s == d

    def test_double_random_bit_patterns(self, spark, duck):
        random.seed(20260816)
        vals = []
        while len(vals) < 300:
            x = struct.unpack("<d", struct.pack("<Q", random.getrandbits(64)))[0]
            if x == x and abs(x) != float("inf"):
                vals.append(repr(x))
        for _ in range(300):
            vals.append(repr(random.randint(1, 10**12) / random.randint(1, 10**6)))
        assert _spark_render(spark, vals, "DOUBLE") == _duck_render(duck, vals, "DOUBLE")

    def test_int_bool_string_null(self, spark, duck):
        assert _spark_render(spark, ["1", "-7", "9223372036854775807", "NULL"], "BIGINT") == \
            _duck_render(duck, ["1", "-7", "9223372036854775807", "NULL"], "BIGINT")
        assert _spark_render(spark, ["true", "false", "NULL"], "BOOLEAN") == \
            _duck_render(duck, ["true", "false", "NULL"], "BOOLEAN")
        # NB: chr(9)-concat, not a '\t' literal — Spark SQL interprets
        # backslash escapes in string literals, DuckDB does not, so the
        # raw literal would feed the engines DIFFERENT strings.
        strs = ["'a'", "'ünïcode ☃'", "''", "NULL", "concat('tab', chr(9), 'nl')"]
        assert _spark_render(spark, strs, "STRING") == _duck_render(duck, strs, "VARCHAR")


def _duck_sig(duck, rows_sql: str, types: dict[str, str]):
    return hash_signature_duck(duck, rows_sql, types)


def _spark_sig(spark, rows_sql: str):
    return hash_signature_spark(spark.sql(rows_sql))


class TestSignature:
    TYPES = {"k": "BIGINT", "v": "DOUBLE", "s": "VARCHAR"}

    def _pair(self, spark, duck, spark_rows, duck_rows=None):
        ssig = _spark_sig(
            spark,
            f"SELECT k, CAST(v AS DOUBLE) AS v, s FROM VALUES {spark_rows} t(k, v, s)",
        )
        dsig = _duck_sig(
            duck,
            "SELECT k, CAST(v AS DOUBLE) AS v, s FROM (VALUES "
            + (duck_rows or spark_rows)
            + ") t(k, v, s)",
            self.TYPES,
        )
        return ssig, dsig

    def test_equal_data_equal_signature(self, spark, duck):
        rows = "(1, 0.5, 'a'), (2, -3.25, NULL), (3, CAST('NaN' AS DOUBLE), 'z')"
        drows = "(1, 0.5, 'a'), (2, -3.25, NULL), (3, CAST('nan' AS DOUBLE), 'z')"
        ssig, dsig = self._pair(spark, duck, rows, drows)
        assert ssig == dsig
        # order-insensitive
        perm = "(3, CAST('NaN' AS DOUBLE), 'z'), (1, 0.5, 'a'), (2, -3.25, NULL)"
        assert _spark_sig(
            spark, f"SELECT k, CAST(v AS DOUBLE) AS v, s FROM VALUES {perm} t(k, v, s)"
        ) == ssig

    def test_changed_value_flips_signature(self, spark, duck):
        base = "(1, 0.5, 'a'), (2, -3.25, 'b')"
        changed = "(1, 0.5, 'a'), (2, -3.26, 'b')"
        s1, _ = self._pair(spark, duck, base)
        s2, _ = self._pair(spark, duck, changed)
        assert s1 != s2

    def test_dropped_row_flips_signature(self, spark, duck):
        s1, _ = self._pair(spark, duck, "(1, 0.5, 'a'), (2, -3.25, 'b')")
        s2, _ = self._pair(spark, duck, "(1, 0.5, 'a')")
        assert s1 != s2

    def test_duplicate_pair_swap_not_xor_blind(self, spark, duck):
        # {A, A, B} vs {C, C, B}: identical count, identical bit_xor
        # (A^A = C^C = 0) — only the low-bit SUM distinguishes them.
        s1, _ = self._pair(spark, duck, "(1, 1.0, 'a'), (1, 1.0, 'a'), (2, 2.0, 'b')")
        s2, _ = self._pair(spark, duck, "(9, 9.0, 'c'), (9, 9.0, 'c'), (2, 2.0, 'b')")
        assert s1[0] == s2[0] and s1[1] == s2[1]  # the degenerate pair
        assert s1 != s2  # ...broken by the sum component

    def test_empty_result(self, spark, duck):
        ssig, dsig = self._pair(
            spark, duck,
            "(1, 0.5, 'a')",
        )
        s_empty = _spark_sig(
            spark,
            "SELECT k, CAST(v AS DOUBLE) AS v, s FROM VALUES (1, 0.5, 'a') t(k, v, s) WHERE k < 0",
        )
        d_empty = _duck_sig(
            duck,
            "SELECT k, CAST(v AS DOUBLE) AS v, s FROM (VALUES (1, 0.5, 'a')) t(k, v, s) WHERE k < 0",
            self.TYPES,
        )
        assert s_empty == d_empty == (0, 0, 0)
        assert ssig != s_empty


class TestVerdictParity:
    """Hash verdict == strict verdict on real driver queries (a pass-side
    sample across the type surface: double, boolean, string, int)."""

    @pytest.mark.parametrize(
        "qname",
        ["daily_volume_ma", "scd2_order_history", "fcd_bank_balance"],
    )
    def test_real_query_hash_pass(self, spark, qname):
        import os

        import __spark_entry__ as E
        from scripts.check_correctness import SF_DIR, duck_connection

        con = duck_connection()
        sdf = E.queries()[qname](spark, SF_DIR)
        problems, n = compare_hash_only(qname, sdf, con, E.oracle_sql()[qname])
        assert problems == [] and n >= 0

    def test_perturbed_oracle_fails(self, spark):
        import __spark_entry__ as E
        from scripts.check_correctness import SF_DIR, duck_connection

        con = duck_connection()
        sdf = E.queries()["daily_volume_ma"](spark, SF_DIR)
        sql = E.oracle_sql()["daily_volume_ma"]
        perturbed = f"SELECT day, volume + 1e-6 AS volume, ma10, dod_diff FROM ({sql}) t"
        problems, _ = compare_hash_only("perturbed", sdf, con, perturbed)
        assert any("signature differs" in p for p in problems)
