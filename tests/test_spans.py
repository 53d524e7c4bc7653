"""Span-level exact-substring dedup (operators/spans.py): planted-span
semantics, merge behavior, and full DuckDB-oracle equivalence over the
driver's synthetic documents table.
"""

from __future__ import annotations

import duckdb

from classic_fcd_spark.operators.spans import (
    duck_duplicated_spans_sql,
    duplicated_spans,
)
from tests.conftest import SF_SMALL

_SHARED = "the quick brown fox jumps over the lazy dog again and again"  # 12 tokens


def _planted(spark):
    rows = [
        # docs 0 and 1 share the 12-token block at different offsets
        (0, "alpha beta " + _SHARED + " gamma delta"),
        (1, _SHARED + " epsilon zeta eta theta iota kappa"),
        # doc 2: within-doc repetition (the k-window repeats inside one doc)
        (2, "x1 x2 x3 x4 x5 x6 x7 x8 y " + "x1 x2 x3 x4 x5 x6 x7 x8"),
        # doc 3: fully unique
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestPlantedSpans:
    def test_shared_block_found_in_both_docs(self, spark):
        out = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
            for r in duplicated_spans(_planted(spark), k=8).collect()
            if r["doc_id"] in (0, 1)
        }
        # doc 0: tokens 3..14 hold the shared block -> windows 3..7 merge
        # to one span [3, 14]; doc 1: block at 1..12 -> span [1, 12]
        assert out[0] == (3, 14, 12)
        assert out[1] == (1, 12, 12)

    def test_within_doc_repetition_counts(self, spark):
        rows = [
            r
            for r in duplicated_spans(_planted(spark), k=8).collect()
            if r["doc_id"] == 2
        ]
        # the repeated x1..x8 window occurs twice inside doc 2: both
        # occurrences are duplicated positions (suffix-array semantics);
        # positions 1 and 10 are k-adjacent at k=8? gap = 9 > 8 -> two spans
        assert sorted((r["span_start"], r["span_end"]) for r in rows) == [
            (1, 8),
            (10, 17),
        ]

    def test_unique_doc_has_no_spans(self, spark):
        assert (
            len(
                [
                    r
                    for r in duplicated_spans(_planted(spark), k=8).collect()
                    if r["doc_id"] == 3
                ]
            )
            == 0
        )

    def test_adjacent_windows_merge_into_one_span(self, spark):
        # two docs sharing a 16-token block: every 8-window inside it is
        # duplicated, consecutive positions differ by 1 <= k -> ONE span
        block = " ".join(f"w{i}" for i in range(16))
        df = spark.createDataFrame(
            [(0, block + " tail0"), (1, "head1 " + block)], ["doc_id", "text"]
        )
        out = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
            for r in duplicated_spans(df, k=8).collect()
        }
        assert out[0] == (1, 16, 9)  # windows 1..9 merged
        assert out[1] == (2, 17, 9)


class TestSpansOracle:
    def test_matches_duckdb_on_documents(self, spark, tables):
        got = {
            (r["doc_id"], r["span_start"]): (
                r["span_end"],
                r["span_len"],
                r["n_grams"],
            )
            for r in duplicated_spans(tables["documents"], k=8).collect()
        }
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        )
        want = {
            (r[0], r[1]): (r[2], r[3], r[4])
            for r in con.sql(duck_duplicated_spans_sql(k=8)).fetchall()
        }
        assert got == want
        assert len(got) > 0  # the synthetic corpus plants dup groups


class TestDuplicatedSpansOracle:
    """duplicated_spans left the driver window in r11 (slot rotated to
    repetition_signals); this is its oracle gate now — the SAME DuckDB
    SQL that drove its green r6-r10 driver rows, at the driver's compare
    corpus (sf0.01), full query wrapper included (casts and all)."""

    def test_query_matches_driver_oracle_at_sf001(self, spark):
        from classic_fcd_spark.queries.dedup import (
            DUPLICATED_SPANS_ORACLE_SQL,
            duplicated_spans_q,
        )

        sf = "/root/testdata/sf0.01"
        got = sorted(
            tuple(r) for r in duplicated_spans_q(spark, sf).collect()
        )
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            tuple(r) for r in con.sql(DUPLICATED_SPANS_ORACLE_SQL).fetchall()
        )
        assert got == want
        assert len(got) > 0


class TestRemoveSpans:
    def test_cut_matches_duckdb_on_documents(self, spark, tables):
        from classic_fcd_spark.operators.spans import (
            duck_remove_duplicated_spans_sql,
            remove_duplicated_spans,
        )

        got = {
            r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
            for r in remove_duplicated_spans(
                tables["documents"], k=8, min_span_len=10
            ).collect()
        }
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        )
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.sql(
                duck_remove_duplicated_spans_sql(k=8, min_span_len=10)
            ).fetchall()
        }
        assert got == want
        assert len(got) == 500  # every doc survives (possibly shortened)
        assert any(v[2] > 0 for v in got.values())  # something was cut

    def test_planted_cut_is_exact(self, spark):
        from classic_fcd_spark.operators.spans import remove_duplicated_spans

        block = " ".join(f"w{i}" for i in range(12))
        df = spark.createDataFrame(
            [(0, "alpha beta " + block + " gamma"), (1, block + " tail here now")],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: (r["text_clean"], r["n_removed"])
            for r in remove_duplicated_spans(df, k=8).collect()
        }
        assert out[0] == ("alpha beta gamma", 12)
        assert out[1] == ("tail here now", 12)

    def test_min_span_len_spares_short_spans(self, spark):
        from classic_fcd_spark.operators.spans import remove_duplicated_spans

        block = " ".join(f"w{i}" for i in range(8))  # exactly k tokens
        df = spark.createDataFrame(
            [(0, block + " unique0 a b c"), (1, block + " unique1 d e f")],
            ["doc_id", "text"],
        )
        spared = remove_duplicated_spans(df, k=8, min_span_len=9).collect()
        assert all(r["n_removed"] == 0 for r in spared)
        cut = remove_duplicated_spans(df, k=8, min_span_len=8).collect()
        assert all(r["n_removed"] == 8 for r in cut)
