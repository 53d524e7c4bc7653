"""PII redaction: DuckDB cross-check (same regex strings — the patterns
are deliberately restricted to the RE2 ∩ Java subset), plus the no-PII-
left property and count/redaction agreement.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from classic_fcd_spark.functions.text import (
    PII_PATTERNS,
    duck_redact_pii,
    pii_counts,
    redact_pii,
)

ROWS = [
    (0, "contact me at alice.smith+spam@example.co.uk or bob@test.io today"),
    (1, "server at 10.0.255.3 answered, backup at 192.168.1.1 did not"),
    (2, "call +1 415-555-0133 or (020) 7946 0958 after five"),
    (3, "mixed: eve@10.0.0.1.example.com from 8.8.8.8 tel 555-867-5309x"),
    (4, "nothing sensitive here, just 42 words and v1.2.3 versions"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


class TestPIIRedaction:
    def test_matches_duckdb_redaction(self, spark):
        got = {
            r["doc_id"]: r["red"]
            for r in _df(spark).select("doc_id", redact_pii("text").alias("red")).collect()
        }
        pdf = pd.DataFrame(ROWS, columns=["doc_id", "text"])  # noqa: F841 — bound into duckdb
        want = {
            r[0]: r[1]
            for r in duckdb.sql(
                f"SELECT doc_id, {duck_redact_pii('text')} FROM pdf"
            ).fetchall()
        }
        assert got == want

    def test_no_pii_survives_redaction(self, spark):
        red = _df(spark).select(redact_pii("text").alias("red"))
        for _, pat, _ in PII_PATTERNS:
            left = red.filter(F.regexp_count("red", F.lit(pat)) > 0)
            assert left.count() == 0, pat

    def test_counts_match_redaction_deltas(self, spark):
        rows = (
            _df(spark)
            .select("doc_id", "text", pii_counts("text").alias("c"))
            .collect()
        )
        by_id = {r["doc_id"]: r["c"].asDict() for r in rows}
        assert by_id[0] == {"email": 2, "ipv4": 0, "phone": 0}
        assert by_id[1] == {"email": 0, "ipv4": 2, "phone": 0}
        assert by_id[2]["phone"] == 2
        # the embedded-IP email counts once, as an email
        assert by_id[3]["email"] == 1 and by_id[3]["ipv4"] == 1
        assert by_id[4] == {"email": 0, "ipv4": 0, "phone": 0}
        assert by_id[5] == {"email": 0, "ipv4": 0, "phone": 0}


class TestLinearQualityScore:
    K = 64

    @staticmethod
    def _bucket(tok, k, salt="q"):
        import hashlib

        h = hashlib.md5(f"{salt}:{tok}".encode()).hexdigest()
        return int(h[:15], 16) % k

    def _weights(self):
        good = ["careful", "thorough", "prose", "analysis"]
        bad = ["clickbait", "spam", "buy", "winner"]
        w = [0.0] * self.K
        for t in good:
            w[self._bucket(t, self.K)] = 2.0
        for t in bad:
            w[self._bucket(t, self.K)] = -2.0
        return w

    def test_matches_duckdb_inference(self, spark):
        from classic_fcd_spark.functions.text import (
            duck_linear_quality_score,
            linear_quality_score,
        )
        from classic_fcd_spark.session import load_tables
        from tests.conftest import SF_SMALL

        import os as _os

        import duckdb as _duck

        w = self._weights()
        docs = load_tables(spark, SF_SMALL)["documents"]
        got = {
            r["doc_id"]: r["q"]
            for r in docs.select(
                "doc_id", linear_quality_score("text", w).alias("q")
            ).collect()
        }
        path = _os.path.join(SF_SMALL, "documents.parquet")
        want = {
            r[0]: r[1]
            for r in _duck.sql(
                f"SELECT doc_id, {duck_linear_quality_score('text', w)} "
                f"FROM read_parquet('{path}')"
            ).fetchall()
        }
        assert set(got) == set(want)
        for d in got:
            assert abs(got[d] - want[d]) < 1e-12, d

    def test_separates_planted_quality(self, spark):
        from classic_fcd_spark.functions.text import linear_quality_score

        w = self._weights()
        rows = [
            (0, "careful thorough prose analysis of the data"),
            (1, "clickbait spam buy winner now now now"),
            (2, ""),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        s = {
            r["doc_id"]: r["q"]
            for r in df.select(
                "doc_id", linear_quality_score("text", w).alias("q")
            ).collect()
        }
        assert s[0] > 0.6 > s[2] == 0.5 > 0.4 > s[1]
