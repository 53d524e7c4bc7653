"""Sources — SURVEY §2.1.

The reference ingests from Tendermint RPC websocket + LCD REST (S1-S4);
in-engine those become bronze tables.  This package provides:

- fixtures.py: the deterministic fcd-shaped fixture generator (blocks,
  txs with nested LCD-style JSON, minute prices, validator dim) per
  FIXTURES.md — arithmetic-only, so the DuckDB oracle can regenerate the
  exact same rows without touching Spark.
- files.py: the reference's file sources (S6 CSV richlist, S7 JSON
  vesting) as typed spark.read wrappers.
"""

from classic_fcd_spark.sources.fixtures import (  # noqa: F401
    FIXTURE_N_BLOCKS,
    gen_blocks,
    gen_prices,
    gen_txs,
    gen_validators,
)
