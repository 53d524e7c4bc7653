"""Registry guards (queries/registry.py).

ADVICE r10: callable oracles embed corpus-derived literals, so
resolving the oracle map against a corpus directory that does not exist
must fail loudly, naming the SF_DIR knob — not surface later as an
opaque DuckDB read error (or silently bind literals from the wrong
corpus)."""

from __future__ import annotations

import pytest

from classic_fcd_spark.queries import registry


class TestOracleSqlMapGuard:
    def test_missing_corpus_raises_naming_sf_dir(self):
        with pytest.raises(FileNotFoundError, match="SF_DIR"):
            registry.oracle_sql_map("/nonexistent/sfX")

    def test_valid_corpus_resolves_callables(self):
        m = registry.oracle_sql_map("/root/testdata/sf0.01")
        assert m, "oracle map is empty"
        assert all(isinstance(v, str) for v in m.values())
