"""Route manifest: the reference's full HTTP read surface
(src/controller/*.ts @Get decorators) mapped to this engine's serving
wrappers, gated query functions, or library operators — the
line-by-line answer to "could an fcd client switch to this repo".

Statuses:
  wrapper   — serving function returning the reference's response shape
              (serving/api.py / serving/endpoints.py; golden-row e2e
              pinned in tests/test_serving_e2e.py)
  query     — the route's query semantics are a gated query function
              (driver-oracle or in-test-oracle checked); response
              reshaping is the only missing layer.  Zero rows since r7:
              every such route now has a wrapper (serving/detail.py)
  operator  — served by a library operator (streaming state, file
              source) with its own unit gate
  config    — the reference serves a static config value
  oos       — out of scope per SURVEY §2.1 (LCD pass-through / POST
              write path / live swap simulation)

tests/test_serving_e2e.py::TestRouteManifest resolves every referenced
symbol, so a rename breaks the build, not the manifest.
"""

from __future__ import annotations

# route -> (status, "module:symbol" or note)
ROUTES: dict[str, tuple[str, str]] = {
    # --- TransactionController -------------------------------------------
    "GET /v1/blocks/:height": ("wrapper", "serving.api:get_block_with_txs"),
    "GET /v1/tx/:txhash": ("wrapper", "serving.api:get_tx_by_hash"),
    "GET /v1/txs": ("wrapper", "serving.api:get_tx_list"),
    "GET /v1/txs/gas_prices": ("config", "reference serves config.MIN_GAS_PRICES"),
    "GET /v1/mempool/:txhash": ("operator", "streaming.mempool:mempool_eviction_stream"),
    "GET /v1/mempool": ("operator", "streaming.mempool:run_mempool_available_now"),
    # --- DashboardController ---------------------------------------------
    "GET /v1/dashboard": ("wrapper", "serving.endpoints:get_dashboard_general_info"),
    "GET /v1/dashboard/tx_volume": ("wrapper", "serving.endpoints:get_transaction_vol"),
    "GET /v1/dashboard/block_rewards": ("wrapper", "serving.endpoints:get_block_rewards"),
    "GET /v1/dashboard/seigniorage_proceeds": (
        "wrapper",
        "serving.endpoints:get_seigniorage_proceeds",
    ),
    "GET /v1/dashboard/staking_return": ("wrapper", "serving.detail:get_staking_return"),
    "GET /v1/dashboard/staking_ratio": ("wrapper", "serving.endpoints:get_staking_ratio"),
    "GET /v1/dashboard/account_growth": ("wrapper", "serving.endpoints:get_account_growth"),
    "GET /v1/dashboard/active_accounts": ("wrapper", "serving.endpoints:get_active_accounts"),
    "GET /v1/dashboard/registered_accounts": (
        "wrapper",
        "serving.endpoints:get_registered_accounts",
    ),
    "GET /v1/dashboard/last_hour_ops_txs_count": (
        "wrapper",
        "serving.endpoints:get_last_hour_ops_and_txs",
    ),
    # --- GovernanceController ----------------------------------------------
    "GET /v1/gov/proposals": ("wrapper", "serving.endpoints:get_proposals_listing"),
    "GET /v1/gov/proposals/:proposalId": ("wrapper", "serving.detail:get_proposal_detail"),
    "GET /v1/gov/proposals/:proposalId/deposits": (
        "wrapper",
        "serving.endpoints:get_proposal_deposits",
    ),
    "GET /v1/gov/proposals/:proposalId/votes": (
        "wrapper",
        "serving.endpoints:get_proposal_votes",
    ),
    # --- MarketController ---------------------------------------------------
    "GET /v1/market/price": ("wrapper", "serving.endpoints:get_market_price"),
    "GET /v1/market/swaprate/:base": ("wrapper", "serving.endpoints:get_denom_swap_rate"),
    # --- StakingController ----------------------------------------------------
    "GET /v1/staking/validators": ("wrapper", "serving.endpoints:get_validators_listing"),
    "GET /v1/staking/validators/:operatorAddr": (
        "wrapper",
        "serving.endpoints:get_validators_listing",
    ),
    "GET /v1/staking/validators/:operatorAddr/delegations": (
        "wrapper",
        "serving.detail:get_delegation_txs",
    ),
    "GET /v1/staking/validators/:operatorAddr/delegators": (
        "wrapper",
        "serving.detail:get_delegators_page",
    ),
    "GET /v1/staking/validators/:operatorAddr/claims": (
        "wrapper",
        "serving.detail:get_claims",
    ),
    "GET /v1/staking/:account": ("wrapper", "serving.endpoints:get_staking_account_view"),
    "GET /v1/staking/return": ("wrapper", "serving.api:get_validator_returns"),
    "GET /v1/staking/return/:operatorAddr": (
        "wrapper",
        "serving.detail:get_validator_return_by_op",
    ),
    "GET /v1/staking": ("wrapper", "serving.endpoints:get_staking_account_view"),
    # --- BankController ---------------------------------------------------------
    "GET /v1/bank/:account": ("wrapper", "serving.detail:get_account_balance"),
    # --- TreasuryController -------------------------------------------------------
    "GET /v1/taxproceeds": ("wrapper", "serving.detail:get_tax_proceeds"),
    "GET /v1/richlist/:denom": ("wrapper", "serving.detail:get_rich_list"),
    "GET /v1/totalsupply/:denom": ("wrapper", "serving.detail:get_total_supply"),
    "GET /v1/circulatingsupply/:denom": ("wrapper", "serving.detail:get_circulating_supply"),
    # --- out of scope per SURVEY §2.1 ----------------------------------------------
    "POST /v1/txs": ("oos", "LCD write pass-through (postTxs.ts)"),
    "GET /v1/market/swaprate-sim": ("oos", "live swap-spread simulation (swap.ts:186)"),
    "ALL /v1/lcd/*": ("oos", "LCD proxy pass-through (createApp.ts:185-191)"),
}


def resolve(spec: str):
    """'module.path:symbol' -> the callable/object, for the manifest
    test (module path relative to classic_fcd_spark)."""
    import importlib

    mod_path, symbol = spec.split(":")
    mod = importlib.import_module(f"classic_fcd_spark.{mod_path}")
    return getattr(mod, symbol)
