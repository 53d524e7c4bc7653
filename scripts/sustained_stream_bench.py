"""Sustained-load streaming bench (r7, per the r6 brief item 6): run the
minute pipeline for ~200 micro-batches with the mempool TTL poller, the
throttled dim refresh, and the incremental-dedup twin attached, and
record (a) per-batch wall p50/p99, (b) streaming-state row counts over
time, (c) checkpoint directory growth — the bounded-state designs
predict FLAT state and per-batch-proportional checkpoint growth, and
this script ASSERTS both (exits nonzero on superlinear drift).

What "flat" means per stream:
- minute rollup: state rows = open (minute, event_type) windows behind
  the watermark — bounded by window span, independent of batches drained;
- mempool: state rows = live txs inside the TTL — bounded by arrival
  rate × TTL;
- incremental dedup: the on-disk band index grows LINEARLY in documents
  (that is the design — it IS the corpus signature), but per-batch probe
  wall must not trend upward superlinearly at fixed batch size.

Usage: python scripts/sustained_stream_bench.py  (JSON on the last line;
r7 run recorded in BENCH_NOTES.md)
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROLLUP_BATCHES = 200
N_MEMPOOL_CHUNKS = 100
N_DEDUP_DROPS = 40
# Fixture-feed scale for the extract/unified-ingest stages: 1 = the
# r8/r9 3,000-block feed (sf0.1-equivalent), 10 = the sf1-equivalent
# 30,000-block feed at the same 30 drops (10x blocks per batch) — the
# r9 brief item 7's "does the per-block envelope hold a decade up".
FEED_SCALE = int(os.environ.get("SPARK_GRAFT_SUSTAINED_SCALE", "1"))


def du_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def p(vals, q):
    vals = sorted(vals)
    return vals[min(len(vals) - 1, int(q * len(vals)))]


def main() -> None:
    from pyspark.sql import functions as F

    from classic_fcd_spark.session import get_spark, normalize_event_time
    from classic_fcd_spark.streaming.minute_pipeline import (
        merge_upsert,
        minute_rollup_stream,
    )

    spark = get_spark("sustained_stream_bench")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "250")
    work = tempfile.mkdtemp(prefix="sustained_")
    out: dict = {"sf_dir": SF_DIR}

    # --- 1) minute rollup, 200 time-ordered micro-batches -------------------
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_time(
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    )
    events_dir = os.path.join(work, "events")
    ev.repartitionByRange(N_ROLLUP_BATCHES, "ts").write.parquet(events_dir)

    rollup_dir = os.path.join(work, "rollup")
    ckpt_dir = os.path.join(work, "ckpt_rollup")
    batch_times: list[float] = []
    ckpt_sizes: list[int] = []
    last = {"t": time.perf_counter()}

    def sink(batch_df, batch_id):
        merge_upsert(spark, batch_df, rollup_dir, ["minute", "event_type"])
        now = time.perf_counter()
        batch_times.append(now - last["t"])
        if batch_id % 25 == 0:
            ckpt_sizes.append(du_bytes(ckpt_dir))
        last["t"] = now

    plan = minute_rollup_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        plan.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    last["t"] = time.perf_counter()
    q.awaitTermination()
    state_rows = [
        pr["stateOperators"][0]["numRowsTotal"]
        for pr in (json.loads(x.json) for x in q.recentProgress)
        if pr.get("stateOperators")
    ]
    steady = batch_times[1:]
    half = len(steady) // 2
    out["minute_rollup"] = {
        "batches": len(batch_times),
        "p50_s": round(statistics.median(steady), 3),
        "p99_s": round(p(steady, 0.99), 3),
        "max_s": round(max(steady), 3),
        "first_half_mean_s": round(statistics.mean(steady[:half]), 3),
        "second_half_mean_s": round(statistics.mean(steady[half:]), 3),
        "state_rows_min": min(state_rows) if state_rows else None,
        "state_rows_p50": int(statistics.median(state_rows)) if state_rows else None,
        "state_rows_max": max(state_rows) if state_rows else None,
        "ckpt_mb_at_25_200": [round(b / 1e6, 2) for b in ckpt_sizes],
    }
    # bounded-state assert: the open-window state is a SAWTOOTH, not a
    # flat line — each file-batch opens the minute windows it spans
    # (~400 (minute, event_type) cells at this arrival rate), then the
    # next batch's watermark closes them back down to the tail (~20).
    # Bounded means NO UPWARD TREND across the drain, so compare the
    # peak of the two post-warmup halves rather than max-vs-median.
    post = state_rows[len(state_rows) // 4 :]
    sh = len(post) // 2
    assert max(post[sh:]) <= 1.5 * max(post[:sh]), state_rows
    out["minute_rollup"]["state_peak_first_half"] = max(post[:sh])
    out["minute_rollup"]["state_peak_second_half"] = max(post[sh:])
    # latency-drift assert: second-half mean within 1.5x of first-half
    assert statistics.mean(steady[half:]) <= 1.5 * statistics.mean(steady[:half]), (
        out["minute_rollup"]
    )

    # --- 2) mempool TTL poller under sustained arrivals ----------------------
    from classic_fcd_spark.streaming.mempool import run_mempool_available_now

    obs_dir = os.path.join(work, "obs")
    # synthetic arrival log: 20k observations over N_MEMPOOL_CHUNKS
    # time-slabs; ~1% of txs never confirm and TTL-evict
    obs = (
        spark.range(20_000)
        .select(
            F.timestamp_seconds(1609459200 + F.col("id") * 3).alias("ts"),
            F.concat(F.lit("tx"), (F.col("id") % 3000).cast("string")).alias("txhash"),
            F.when(F.col("id") % 97 == 0, F.lit("drop"))
            .otherwise(F.lit("seen"))
            .alias("kind"),
        )
    )
    obs.repartitionByRange(N_MEMPOOL_CHUNKS, "ts").write.parquet(obs_dir)
    t0 = time.perf_counter()
    evictions = run_mempool_available_now(
        spark, obs_dir, os.path.join(work, "ckpt_mempool"), ttl_seconds=120
    )
    mem_wall = time.perf_counter() - t0
    out["mempool"] = {
        "observations": 20_000,
        "chunks": N_MEMPOOL_CHUNKS,
        "evictions": len(evictions),
        "wall_s": round(mem_wall, 1),
        "per_chunk_s": round(mem_wall / N_MEMPOOL_CHUNKS, 3),
    }

    # --- 3) incremental-dedup twin: 40 document drops ------------------------
    from classic_fcd_spark.streaming.incremental_dedup import (
        run_streaming_dedup_available_now,
    )

    docs_dir = os.path.join(work, "docs")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.repartitionByRange(N_DEDUP_DROPS, "doc_id").write.parquet(docs_dir)
    index_dir = os.path.join(work, "band_index")
    t0 = time.perf_counter()
    pairs = run_streaming_dedup_available_now(
        spark, docs_dir, index_dir, os.path.join(work, "ckpt_dedup")
    )
    dd_wall = time.perf_counter() - t0
    out["incremental_dedup"] = {
        "drops": N_DEDUP_DROPS,
        "pairs": len(pairs),
        "wall_s": round(dd_wall, 1),
        "per_drop_s": round(dd_wall / N_DEDUP_DROPS, 2),
        "index_mb": round(du_bytes(index_dir) / 1e6, 2),
    }

    # --- 4) throttled dim refresh riding the same event feed -----------------
    from classic_fcd_spark.streaming.dim_refresh import run_dim_refresh

    refreshed: list[int] = []
    t0 = time.perf_counter()
    run_dim_refresh(
        spark,
        events_dir,
        os.path.join(work, "ckpt_dim"),
        "event_type",
        lambda addrs: refreshed.append(len(addrs)),
    )
    out["dim_refresh"] = {
        "batches": len(refreshed),
        "wall_s": round(time.perf_counter() - t0, 1),
        "max_refresh_set": max(refreshed) if refreshed else 0,
    }

    # --- 5) serving-extract maintenance twin (r8): per-block index upkeep ----
    # The partition-scoped merge's contract is per-batch cost ∝ batch +
    # touched buckets, NOT corpus size — so as the extract grows across
    # drops, per-batch wall must stay flat.  Asserted like the rollup.
    from classic_fcd_spark.pipeline.medallion import account_tx_silver
    from classic_fcd_spark.serving.extract import (
        lookup_tx,
        merge_account_page_extract,
        merge_tx_lookup_extract,
    )
    from classic_fcd_spark.sources.fixtures import gen_txs, tx_hash_str

    n_drops = 30
    txs = gen_txs(spark, n=3000 * FEED_SCALE)
    out["feed_scale"] = FEED_SCALE
    out["feed_blocks"] = 3000 * FEED_SCALE
    tx_dir = os.path.join(work, "tx_feed")
    txs.repartitionByRange(n_drops, "height").write.parquet(tx_dir)
    ext_dir = os.path.join(work, "extract")
    ext_times: list[float] = []
    elast = {"t": time.perf_counter()}

    def esink(batch_df, batch_id):
        batch_df = batch_df.cache()
        try:
            merge_tx_lookup_extract(batch_df, ext_dir)
            merge_account_page_extract(account_tx_silver(batch_df), ext_dir)
        finally:
            batch_df.unpersist()
        now = time.perf_counter()
        ext_times.append(now - elast["t"])
        elast["t"] = now

    eq = (
        spark.readStream.schema(txs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tx_dir)
        .writeStream.foreachBatch(esink)
        .option("checkpointLocation", os.path.join(work, "ckpt_extract"))
        .trigger(availableNow=True)
        .start()
    )
    elast["t"] = time.perf_counter()
    eq.awaitTermination()
    esteady = ext_times[1:]
    ehalf = len(esteady) // 2
    out["extract_maintenance"] = {
        "drops": len(ext_times),
        "p50_s": round(statistics.median(esteady), 3),
        "p99_s": round(p(esteady, 0.99), 3),
        "first_half_mean_s": round(statistics.mean(esteady[:ehalf]), 3),
        "second_half_mean_s": round(statistics.mean(esteady[ehalf:]), 3),
        "extract_mb": round(du_bytes(ext_dir) / 1e6, 2),
    }
    # flat-upkeep assert: per-batch merge cost must not trend up as the
    # extract accumulates all prior drops
    assert statistics.mean(esteady[ehalf:]) <= 1.5 * statistics.mean(
        esteady[:ehalf]
    ), out["extract_maintenance"]
    # and the freshly-merged index must actually serve (last block's tx;
    # h = 3000*scale - 1 has h % 3 = 2, so tx index h*3 exists)
    last_h = 3000 * FEED_SCALE - 1
    assert lookup_tx(spark, ext_dir, tx_hash_str(last_h * 3)).count() == 1

    # --- 6) UNIFIED per-block ingest: ALL NINE sinks, ONE checkpoint ---------
    # r9 composed six sinks; r10 drives the BUNDLE feed, adding
    # blockreward bronze, the proposal refresh, and the shifted reward
    # rollup (block.ts:152-176's full write set).  The composed
    # transaction must cost roughly the sum of its stages per batch and
    # stay FLAT as all sinks accumulate (same asserts as the per-stage
    # loops).  The reference's envelope is 1 block / 6 s INCLUDING
    # rollups (src/collector/watcher.ts:73-82); the combined p50 is the
    # number to hold against it (a batch carries 100*FEED_SCALE blocks,
    # so p50 < 6 s clears the per-block envelope by orders).
    from classic_fcd_spark.sources.fixtures import (
        gen_blocks,
        gen_delegations,
        gen_deposits,
        gen_proposals,
        gen_validators,
        gen_votes,
    )
    from classic_fcd_spark.streaming.block_ingest import (
        GovDims,
        build_block_bundle_feed,
        read_bronze,
        read_proposals,
        read_reward_rollup,
        run_block_ingest_available_now,
    )

    uni_feed = os.path.join(work, "uni_feed")
    blks = gen_blocks(spark, n=3000 * FEED_SCALE)
    build_block_bundle_feed(txs, blks).repartitionByRange(
        n_drops, "height"
    ).write.parquet(uni_feed)
    uni_out = os.path.join(work, "uni_out")
    uni_times: list[float] = []
    ulast = {"t": time.perf_counter()}

    def utick(batch_id):
        now = time.perf_counter()
        uni_times.append(now - ulast["t"])
        ulast["t"] = now

    ulast["t"] = time.perf_counter()
    run_block_ingest_available_now(
        spark,
        uni_feed,
        os.path.join(work, "ckpt_unified"),
        uni_out,
        on_batch=utick,
        proposals_dim=GovDims(
            proposals=gen_proposals(spark),
            votes=gen_votes(spark),
            delegations=gen_delegations(spark),
            validators=gen_validators(spark),
            deposits=gen_deposits(spark),
        ),
    )
    usteady = uni_times[1:]
    uhalf = len(usteady) // 2
    out["unified_ingest"] = {
        "drops": len(uni_times),
        "p50_s": round(statistics.median(usteady), 3),
        "p99_s": round(p(usteady, 0.99), 3),
        "first_half_mean_s": round(statistics.mean(usteady[:uhalf]), 3),
        "second_half_mean_s": round(statistics.mean(usteady[uhalf:]), 3),
        "extract_only_p50_s": out["extract_maintenance"]["p50_s"],
    }
    # flat-upkeep assert across all nine accumulating sinks
    assert statistics.mean(usteady[uhalf:]) <= 1.5 * statistics.mean(
        usteady[:uhalf]
    ), out["unified_ingest"]
    # the reference's envelope is 1 block / 6 s (watcher.ts:73-82); a
    # batch here carries 100*FEED_SCALE blocks, so the envelope check
    # is per block.  r9's six-sink batch also cleared 6 s per BATCH
    # (3.16 s); the r10 nine-sink batch runs ~5.5 s, so the per-batch
    # number keeps its own absolute regression bound instead of
    # overloading the envelope assert.
    blocks_per_batch = (3000 * FEED_SCALE) / max(1, len(uni_times))
    per_block = statistics.median(usteady) / blocks_per_batch
    out["unified_ingest"]["per_block_s"] = round(per_block, 4)
    out["unified_ingest"]["blocks_per_batch"] = round(blocks_per_batch, 1)
    assert per_block < 6.0, out["unified_ingest"]
    # absolute per-batch regression bound at the comparable r9/r10
    # baseline feed (100-block batches); scaled feeds carry 10x the
    # rows per batch, so their gates are flatness + the per-block
    # envelope (measured r10: 5.5 s at x1 vs 8.6 s at x10 — 10x the
    # blocks for 1.56x the batch wall)
    if FEED_SCALE == 1:
        assert statistics.median(usteady) < 8.0, out["unified_ingest"]
    # the composed run actually wrote everything once — tx sinks, the
    # extract, AND the r10 bundle sinks (proposals + shifted rewards)
    assert read_bronze(spark, uni_out).count() == txs.count()
    assert (
        lookup_tx(
            spark, os.path.join(uni_out, "extract"), tx_hash_str(last_h * 3)
        ).count()
        == 1
    )
    n_props = read_proposals(spark, uni_out).count()
    n_reward_minutes = read_reward_rollup(spark, uni_out).count()
    out["unified_ingest"]["proposal_rows"] = n_props
    out["unified_ingest"]["reward_rollup_rows"] = n_reward_minutes
    assert n_props == 4 and n_reward_minutes > 0, out["unified_ingest"]

    # --- 7) incremental LM maintenance (r9) + auto-compaction (r10) ---------
    # Counts are additive, so each batch writes only ITS delta tables;
    # per-batch cost must stay flat as the accumulated model grows (the
    # r8 verdict's x100 cold-fit item), and the merged model is
    # bit-identical to a from-scratch fit (tests/test_lm_maintenance.py).
    # r10: compact_every=6 runs epoch compaction INSIDE the loop, so the
    # drain crosses the compaction horizon 3x — per-batch cost must stay
    # flat THROUGH compactions, the surviving delta-partition count must
    # be bounded by the horizon, and the merged-model load must stay
    # cheap (it sums O(live partitions), not O(batches ever drained)).
    from classic_fcd_spark.streaming.lm_maintenance import (
        _live_batch_count,
        load_trigram_model_incremental,
        run_lm_maintenance_available_now,
    )

    n_lm_batches = 20
    lm_compact_every = 6
    lm_feed = os.path.join(work, "lm_feed")
    docs.select("doc_id", "text").repartitionByRange(
        n_lm_batches, "doc_id"
    ).write.parquet(lm_feed)
    lm_model = os.path.join(work, "lm_model")
    lm_times: list[float] = []
    llast = {"t": time.perf_counter()}

    def ltick(batch_id):
        now = time.perf_counter()
        lm_times.append(now - llast["t"])
        llast["t"] = now

    llast["t"] = time.perf_counter()
    run_lm_maintenance_available_now(
        spark,
        lm_feed,
        lm_model,
        os.path.join(work, "ckpt_lm"),
        on_batch=ltick,
        compact_every=lm_compact_every,
    )
    lm_live = _live_batch_count(lm_model)
    t0 = time.perf_counter()
    n_tri = load_trigram_model_incremental(spark, lm_model).tri_model.count()
    lm_load_s = time.perf_counter() - t0
    lsteady = lm_times[1:]
    lhalf = len(lsteady) // 2
    out["lm_maintenance"] = {
        "batches": len(lm_times),
        "compact_every": lm_compact_every,
        "live_partitions_after": lm_live,
        "p50_s": round(statistics.median(lsteady), 3),
        "first_half_mean_s": round(statistics.mean(lsteady[:lhalf]), 3),
        "second_half_mean_s": round(statistics.mean(lsteady[lhalf:]), 3),
        "model_trigrams": n_tri,
        "merged_load_s": round(lm_load_s, 2),
    }
    # refit ∝ batch: per-batch delta cost must not trend up as the
    # model accumulates prior batches — INCLUDING the batches that paid
    # for an in-loop compaction
    assert statistics.mean(lsteady[lhalf:]) <= 1.5 * statistics.mean(
        lsteady[:lhalf]
    ), out["lm_maintenance"]
    # compaction keeps the live fan-in bounded by the horizon
    assert lm_live < lm_compact_every, out["lm_maintenance"]

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
