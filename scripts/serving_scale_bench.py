"""Serving-latency flatness across a decade of corpus (the r9 brief's
item 2 / r8 item 7): measure tx-by-hash and account-page lookup p50
against the point-lookup extract at fixture scale 1 (sf0.1-equivalent,
600 blocks) and scale 10 (sf1-equivalent, 6,000 blocks), with
num_buckets scaled with the corpus (16 -> 160) the way the extract's
100 TB design prescribes (serving/extract.py module docstring: "one
bucket ~ a few hundred MB") — so a lookup always reads ONE
constant-sized bucket directory regardless of corpus size.

In-script asserts (the bench fails, not just reports):
- p50(sf1) <= 1.2 * p50(sf0.1) + 10 ms for both lookup paths — the
  O(1-bucket) flatness claim, with a 10 ms absolute guard for local
  job-scheduling jitter on a ~50 ms measurement floor;
- the sf1 lookup plan still prunes: PartitionFilters carries the kb
  literal and PushedFilters the hash equality (the r9 brief asked for
  the plan assert re-run at sf1).

Usage: python scripts/serving_scale_bench.py   (one JSON line; the r10
run is recorded in BENCH_NOTES.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20
BASE_BLOCKS = 600
BASE_BUCKETS = 16


def _valid_tx_indices(n_blocks: int, want: int):
    """Fixture tx indices that exist: i = h*3+k with k < h%3."""
    out = []
    h = 1
    while len(out) < want and h <= n_blocks:
        for k in range(h % 3):
            out.append(h * 3 + k)
        h += 1
    return out[:want]


def main() -> None:
    from classic_fcd_spark.pipeline.medallion import account_tx_silver
    from classic_fcd_spark.serving.extract import (
        lookup_account_page,
        lookup_tx,
        write_account_page_extract,
        write_tx_lookup_extract,
    )
    from classic_fcd_spark.session import get_spark
    from classic_fcd_spark.sources.fixtures import addr_str, gen_txs, tx_hash_str

    spark = get_spark("serving_scale_bench")
    work = tempfile.mkdtemp(prefix="servscale_")
    acct = addr_str(7)
    out = {}
    try:
        for scale in (1, 10):
            n_blocks = BASE_BLOCKS * scale
            buckets = BASE_BUCKETS * scale
            txs = gen_txs(spark, n=n_blocks)
            at = account_tx_silver(txs)
            ex = os.path.join(work, f"extract_x{scale}")
            t0 = time.perf_counter()
            write_tx_lookup_extract(txs, ex, num_buckets=buckets)
            write_account_page_extract(at, ex, num_buckets=buckets)
            build_s = time.perf_counter() - t0

            probes = [tx_hash_str(i) for i in _valid_tx_indices(n_blocks, REPS)]
            # warm both plans/relations once
            lookup_tx(spark, ex, probes[0], num_buckets=buckets).collect()
            lookup_account_page(spark, ex, acct, limit=10, num_buckets=buckets)

            lat_hash, lat_page = [], []
            for h in probes:
                t0 = time.perf_counter()
                got = lookup_tx(spark, ex, h, num_buckets=buckets).collect()
                lat_hash.append(time.perf_counter() - t0)
                assert len(got) == 1, f"probe {h} missed at x{scale}"
                t0 = time.perf_counter()
                page = lookup_account_page(
                    spark, ex, acct, limit=10, num_buckets=buckets
                )
                lat_page.append(time.perf_counter() - t0)
                assert page, f"account page empty at x{scale}"

            out[f"x{scale}"] = {
                "n_blocks": n_blocks,
                "num_buckets": buckets,
                "rows": txs.count(),
                "tx_by_hash_p50_s": round(statistics.median(lat_hash), 4),
                "account_page_p50_s": round(statistics.median(lat_page), 4),
                "extract_build_s": round(build_s, 3),
                "reps": REPS,
            }

            # the sf1 plan must still prune to one bucket
            if scale == 10:
                plan = (
                    lookup_tx(spark, ex, probes[0], num_buckets=buckets)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                pf = plan.split("PartitionFilters: [", 1)
                assert len(pf) == 2 and "kb" in pf[1].split("]", 1)[0], plan[:1500]
                assert "PushedFilters" in plan and "hash" in plan
                out["x10"]["plan_prunes"] = True

        for path in ("tx_by_hash_p50_s", "account_page_p50_s"):
            p1, p10 = out["x1"][path], out["x10"][path]
            assert p10 <= 1.2 * p1 + 0.010, (
                f"{path} not flat across the decade: x1={p1} x10={p10}"
            )
        out["flat_within_20pct"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
