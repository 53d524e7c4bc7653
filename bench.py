"""Benchmark harness — run the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q": sec, ...}, "sf": ...}

Timing = full query execution + result materialization (collect), per query,
after a session warm-up. Aggregate results are small (≤ a few thousand rows),
so collect cost is dominated by execution — the honest serving-path number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the heavy plans
# (multi-way join, high-cardinality groupBy, unpartitioned windows excluded).
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "minute_rollup",
    "daily_active_users",
    "account_growth",
    "latest_event_per_user",
    "orders_with_shipped_items",
    "customers_without_orders",
    "daily_volume_ma",
    "top_customers_share",
    "keyset_page_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from classic_fcd_spark.queries import query_fn_map
    from classic_fcd_spark.session import get_spark, load_tables

    spark = get_spark("bench")
    # Warm-up: JVM init, file listing, whole-stage codegen for the heavy
    # agg/join shapes — not counted (steady-state is what a long-running
    # engine serves at; cold JIT is a one-time cost per cluster).
    load_tables(spark, sf_dir)["lineitem"].count()
    query_fn_map()["pricing_summary"](spark, sf_dir).collect()
    query_fn_map()["revenue_by_nation"](spark, sf_dir).collect()

    qmap = query_fn_map()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qmap:
            continue
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
