"""Serving layer — the reference's /v1 REST read paths as DataFrame
query functions (SURVEY §3.2; controllers at src/createApp.ts:110-142).
"""

from classic_fcd_spark.serving.api import (  # noqa: F401
    get_dashboard_history,
    get_tx_list,
    get_validator_returns,
)
