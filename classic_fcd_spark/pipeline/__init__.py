"""Medallion ETL — the fcd collector re-expressed as DataFrame transforms.

bronze (blocks, txs) → silver (account_tx, minute rollups, block rewards)
→ gold (dashboard, validator returns).  SURVEY §3.1/§3.3 lifecycle.
"""

from classic_fcd_spark.pipeline.medallion import (  # noqa: F401
    account_tx_silver,
    block_rewards_silver,
    dashboard_gold,
    minute_rewards_silver,
    tx_volume_minute_silver,
    validator_returns_gold,
)
