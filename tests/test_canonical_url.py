"""URL canonicalization: DuckDB cross-check via the same staged
normalization, plus planted equivalence-class checks (tracking params,
scheme/case/port/slash variants collapse to one key).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from classic_fcd_spark.functions.text import with_canonical_url

URLS = [
    (0, "https://www.Example.com:443/a/b/?utm_source=x&b=2&a=1#frag"),
    (1, "http://example.com/a/b?a=1&b=2"),
    (2, "example.com/a/b/?b=2&a=1&fbclid=zzz"),
    (3, "https://example.com"),
    (4, "https://example.com/"),
    (5, "http://sub.example.com:80/path/?ref=tw"),
    (6, "HTTPS://WWW.EXAMPLE.COM/A/B"),      # path case is preserved
    (7, "ftp://files.example.com/data.bin"),
    (8, "https://example.com/?utm_campaign=only"),
    (9, "  https://example.com/x  "),
]

DUCK_SQL = """
WITH s0 AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*$', '') AS u
    FROM pdf
),
s1 AS (
    SELECT doc_id, u,
           CASE WHEN instr(u, '?') > 0 THEN substr(u, 1, instr(u, '?') - 1) ELSE u END AS hp,
           CASE WHEN instr(u, '?') > 0 THEN substr(u, instr(u, '?') + 1) ELSE '' END AS qs
    FROM s0
),
s2 AS (
    SELECT doc_id, hp, qs,
           regexp_replace(regexp_replace(lower(CASE WHEN instr(hp, '/') > 0 THEN substr(hp, 1, instr(hp, '/') - 1) ELSE hp END), '^www\\.', ''), ':(80|443)$', '') AS host,
           CASE WHEN instr(hp, '/') > 0 THEN regexp_replace(substr(hp, instr(hp, '/')), '/+$', '') ELSE '' END AS path
    FROM s1
),
s3 AS (
    SELECT doc_id, host, path,
           list_sort(list_filter(string_split(qs, '&'),
               p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)='))) AS params
    FROM s2
)
SELECT doc_id,
       host || path || CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END
FROM s3
"""


class TestCanonicalUrl:
    def _spark_canon(self, spark):
        df = spark.createDataFrame(URLS, ["doc_id", "url"])
        return {
            r["doc_id"]: r["canonical_url"]
            for r in with_canonical_url(df, "url").collect()
        }

    def test_matches_duckdb(self, spark):
        got = self._spark_canon(spark)
        pdf = pd.DataFrame(URLS, columns=["doc_id", "url"])  # noqa: F841
        want = {r[0]: r[1] for r in duckdb.sql(DUCK_SQL).fetchall()}
        assert got == want

    def test_equivalence_classes(self, spark):
        c = self._spark_canon(spark)
        # scheme/case/port/tracking/trailing-slash variants collapse
        assert c[0] == c[1] == c[2] == "example.com/a/b?a=1&b=2"
        assert c[3] == c[4] == "example.com"
        assert c[5] == "sub.example.com/path"
        assert c[6] == "example.com/A/B"  # host lowered, path preserved
        assert c[7] == "files.example.com/data.bin"
        assert c[8] == "example.com"
        assert c[9] == "example.com/x"


class TestDomainBlocklist:
    ROWS = [
        (0, "https://www.example.com/page?q=1"),
        (1, "http://sub.bad.org/x"),
        (2, "https://bad.org"),
        (3, "https://goodbad.org/y"),  # NOT a subdomain of bad.org
        (4, "ftp://user:pw@files.example.net:2121/a/b"),
        (5, "https://ok.io/path#frag"),
    ]

    def test_domain_extraction(self, spark):
        from classic_fcd_spark.functions.text import url_domain

        df = spark.createDataFrame(self.ROWS, ["doc_id", "url"])
        got = {
            r["doc_id"]: r["d"]
            for r in df.select("doc_id", url_domain("url").alias("d")).collect()
        }
        assert got == {
            0: "example.com",
            1: "sub.bad.org",
            2: "bad.org",
            3: "goodbad.org",
            4: "files.example.net",
            5: "ok.io",
        }

    def test_blocklist_drops_domain_and_subdomains_only(self, spark):
        from classic_fcd_spark.functions.text import filter_blocked_domains

        df = spark.createDataFrame(self.ROWS, ["doc_id", "url"])
        kept = {
            r["doc_id"]
            for r in filter_blocked_domains(df, "url", ["bad.org"]).collect()
        }
        # 1 (subdomain) and 2 (exact) drop; 3 (goodbad.org) survives —
        # suffix matching is dot-aligned, not substring
        assert kept == {0, 3, 4, 5}

    def test_exact_mode_spares_subdomains(self, spark):
        from classic_fcd_spark.functions.text import filter_blocked_domains

        df = spark.createDataFrame(self.ROWS, ["doc_id", "url"])
        kept = {
            r["doc_id"]
            for r in filter_blocked_domains(
                df, "url", ["bad.org"], subdomains_blocked=False
            ).collect()
        }
        assert kept == {0, 1, 3, 4, 5}

    def test_www_prefixed_blocklist_entry_matches(self, spark):
        # real blocklists commonly list www hosts; url_domain strips the
        # prefix, so the blocklist side must normalize identically
        from classic_fcd_spark.functions.text import filter_blocked_domains

        df = spark.createDataFrame(self.ROWS, ["doc_id", "url"])
        kept = {
            r["doc_id"]
            for r in filter_blocked_domains(df, "url", ["www.bad.org"]).collect()
        }
        assert kept == {0, 3, 4, 5}

    def test_empty_blocklist_is_identity(self, spark):
        from classic_fcd_spark.functions.text import filter_blocked_domains

        df = spark.createDataFrame(self.ROWS, ["doc_id", "url"])
        assert filter_blocked_domains(df, "url", []).count() == len(self.ROWS)
