"""Serving-latency flatness across TWO decades of corpus (r9 item 2,
r10 item 4): measure tx-by-hash, account-page, and HOT-account keyset
lookups against the point-lookup extract at fixture scales 1/10/100
(600 / 6,000 / 60,000 blocks), with num_buckets scaled with the corpus
(16 -> 160 -> 1,600) the way the extract's 100 TB design prescribes
(serving/extract.py module docstring: "one bucket ~ a few hundred MB")
— so a lookup always reads ONE constant-sized bucket directory
regardless of corpus size.

The HOT account is the exchange-wallet regime of the r11 skew work
(BENCH_NOTES r11 / src/service/transaction/getTxList.ts:152-153): one
account planted on ~20% of account_tx rows, so its history spans
thousands of keyset pages — the L1 contract is measured under skew,
not just uniform fixtures, by WALKING 5 successive pages through the
(height, hash) cursor.

In-script asserts (the bench fails, not just reports):
- p50(x100) <= 1.2 * p50(x1) + 10 ms for all three lookup paths — the
  O(1-bucket) flatness claim, with a 10 ms absolute guard for local
  job-scheduling jitter on a ~50 ms measurement floor (x10 is reported
  alongside for the middle point);
- the largest scale's lookup plan still prunes: PartitionFilters
  carries the kb literal and PushedFilters the hash equality;
- every hot-account page is FULL (limit rows) and strictly descending
  across the cursor walk.

Usage: python scripts/serving_scale_bench.py   (one JSON line; the r11
run is recorded in BENCH_NOTES.md).  SERVING_SCALES=1,10 narrows the
sweep while iterating.
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
PAGE_WALK = 5
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
    from pyspark.sql import functions as F

    from classic_fcd_spark.pipeline.medallion import account_tx_silver
    from classic_fcd_spark.serving.extract import (
        lookup_account_page,
        lookup_tx,
        write_account_page_extract,
        write_tx_lookup_extract,
    )
    from classic_fcd_spark.session import get_spark
    from classic_fcd_spark.sources.fixtures import (
        EXCHANGE_ACCT_I,
        addr_str,
        gen_txs,
        tx_hash_str,
    )

    spark = get_spark("serving_scale_bench")
    work = tempfile.mkdtemp(prefix="servscale_")
    acct = addr_str(7)
    hot_acct = addr_str(EXCHANGE_ACCT_I)
    scales = [
        int(s)
        for s in os.environ.get("SERVING_SCALES", "1,10,100").split(",")
    ]
    out = {}
    try:
        for scale in scales:
            n_blocks = BASE_BLOCKS * scale
            buckets = BASE_BUCKETS * scale
            txs = gen_txs(spark, n=n_blocks)
            at = account_tx_silver(txs)
            # plant the exchange wallet on ~20% of txs: its history
            # spans the whole height range (the skewed-corpus shape)
            hot_rows = txs.filter(
                F.conv(F.substring("hash", 1, 4), 16, 10).cast("long") % 5 == 0
            ).select(
                "hash", "height", "timestamp", F.lit(hot_acct).alias("account")
            )
            at = at.unionByName(hot_rows.select(at.columns))
            ex = os.path.join(work, f"extract_x{scale}")
            t0 = time.perf_counter()
            write_tx_lookup_extract(txs, ex, num_buckets=buckets)
            write_account_page_extract(at, ex, num_buckets=buckets)
            build_s = time.perf_counter() - t0

            probes = [tx_hash_str(i) for i in _valid_tx_indices(n_blocks, REPS)]
            # warm both plans/relations once
            lookup_tx(spark, ex, probes[0], num_buckets=buckets).collect()
            lookup_account_page(spark, ex, acct, limit=10, num_buckets=buckets)

            lat_hash, lat_page, lat_hot = [], [], []
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

            # HOT-account keyset walk: 5 successive pages through the
            # (height, hash) cursor — every hop is one pruned-bucket
            # read regardless of how deep the account's history is
            cursor = None
            walk_keys = []
            for _ in range(PAGE_WALK):
                t0 = time.perf_counter()
                page = lookup_account_page(
                    spark, ex, hot_acct, limit=10,
                    offset=cursor, num_buckets=buckets,
                )
                lat_hot.append(time.perf_counter() - t0)
                assert len(page) == 11, (
                    f"hot page not full at x{scale}: {len(page)} rows"
                )
                walk_keys += [(r["height"], r["hash"]) for r in page[:10]]
                cursor = (page[9]["height"], page[9]["hash"])
            assert walk_keys == sorted(walk_keys, reverse=True), (
                "hot walk not in (height desc, hash desc) page order"
            )
            assert len(set(walk_keys)) == len(walk_keys), "hot walk repeated a row"

            out[f"x{scale}"] = {
                "n_blocks": n_blocks,
                "num_buckets": buckets,
                "rows": txs.count(),
                "hot_rows": hot_rows.count(),
                "tx_by_hash_p50_s": round(statistics.median(lat_hash), 4),
                "account_page_p50_s": round(statistics.median(lat_page), 4),
                "hot_keyset_page_p50_s": round(statistics.median(lat_hot), 4),
                "extract_build_s": round(build_s, 3),
                "reps": REPS,
            }

            # the largest scale's plan must still prune to one bucket
            if scale == max(scales):
                plan = (
                    lookup_tx(spark, ex, probes[0], num_buckets=buckets)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                pf = plan.split("PartitionFilters: [", 1)
                assert len(pf) == 2 and "kb" in pf[1].split("]", 1)[0], plan[:1500]
                assert "PushedFilters" in plan and "hash" in plan
                out[f"x{scale}"]["plan_prunes"] = True

        lo, hi = f"x{min(scales)}", f"x{max(scales)}"
        for path in (
            "tx_by_hash_p50_s",
            "account_page_p50_s",
            "hot_keyset_page_p50_s",
        ):
            p1, pN = out[lo][path], out[hi][path]
            assert pN <= 1.2 * p1 + 0.010, (
                f"{path} not flat across the decades: {lo}={p1} {hi}={pN}"
            )
        out["flat_within_20pct"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
