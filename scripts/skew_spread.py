"""Skew-repair measurement: plain vs salted join over a deliberately
skewed fixture — one hot user absorbing ~100x a normal user's volume.

Builds the skewed fact from the events table (every even user_id remapped
onto user 1, giving it ~half of all rows), joins against a per-user dim,
and runs the same aggregate three ways:

  plain   — fact ⋈ dim on user_id, AQE OFF (the single-oversized-
            partition baseline: the hot key lands on ONE task)
  salted  — auto_salted_join (Misra-Gries detection + salt repair),
            AQE OFF (proves the explicit repair works without runtime
            re-planning — the case AQE cannot help: deliberately
            partitioned pipelines, or skew INTO a stage)
  aqe     — plain join with AQE skew handling ON (the runtime fix, for
            comparison)

Reported per variant:
  wall_s            — end-to-end time of join + aggregate
  task_spread       — max/median task duration of the heaviest stage
                      (from the Spark UI REST taskSummary)
  partition_spread  — max/mean rows per join-output partition (the
                      deterministic proxy: what the tasks actually held)

Usage: python scripts/skew_spread.py   (results -> stdout; the r6 run is
recorded in BENCH_NOTES.md)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SALTS = 16


def _completed_stage_ids(spark) -> set[tuple[int, int]]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    return {(s["stageId"], s["attemptId"]) for s in stages}


def task_quantiles(spark, before: set[tuple[int, int]]) -> dict | None:
    """Task-duration quantiles (p50/p99/max, ms) of the heaviest stage
    COMPLETED SINCE `before` (so each variant measures only its own
    stages), via the UI REST API (None when the UI is off or the query
    ran in one stage)."""
    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app_id = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        new = [
            s for s in stages if (s["stageId"], s["attemptId"]) not in before
        ]
        if not new:
            return None
        # the straggler stage is the one whose WORST task is worst —
        # total executorRunTime would pick a uniform wide scan over the
        # skewed join stage
        best = None
        for s in new:
            summ = json.load(
                urllib.request.urlopen(
                    f"{base}/api/v1/applications/{app_id}/stages/"
                    f"{s['stageId']}/{s['attemptId']}/taskSummary"
                    "?quantiles=0.5,0.99,1.0"
                )
            )
            p50, p99, mx = summ["duration"]
            if best is None or mx > best[2]:
                best = (p50, p99, mx)
        p50, p99, mx = best
        return {
            "task_p50_ms": round(p50, 1),
            "task_p99_ms": round(p99, 1),
            "task_max_ms": round(mx, 1),
            "spread": round(mx / max(p50, 1.0), 2),
        }
    except Exception:  # noqa: BLE001 — measurement is best-effort
        return None


def task_spread(spark, before: set[tuple[int, int]]) -> float | None:
    """max/median task duration of the heaviest stage since `before`
    (kept for the r6 events-mode output format)."""
    q = task_quantiles(spark, before)
    return q["spread"] if q else None


def partition_spread(joined) -> float:
    from pyspark.sql import functions as F

    counts = [
        r["c"]
        for r in joined.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    return round(max(counts) / (sum(counts) / len(counts)), 2)


def account_mode() -> None:
    """The exchange-wallet regime (VERDICT r10 item 2): ONE account on
    ~20% of account_tx rows (src/service/transaction/getTxList.ts:
    152-153's forced-bitmap-scan workload), zipf tail behind it.

    Measured, AQE OFF unless stated (p50/p99/max task ms of the
    heaviest stage + max/mean partition rows of the join output):

      counts  — the fcd_account_tx_counts shape (groupBy account):
                EXPECTED FLAT — partial aggregation combines the hot
                key map-side, so the shuffle never sees its row mass
      plain   — account page join (account_tx ⋈ account dim) with the
                hot key on ONE task
      salted  — detect_hot_keys (Misra-Gries) → salted_join repair
      aqe     — the same plain join under AQE skew splitting

    Usage: SKEW_MODE=account [SKEW_ROWS=2000000] python scripts/skew_spread.py
    """
    from pyspark.sql import functions as F

    from classic_fcd_spark.operators.skewjoin import detect_hot_keys, salted_join
    from classic_fcd_spark.session import get_spark
    from classic_fcd_spark.sources.fixtures import gen_account_tx_skewed

    spark = get_spark("account_skew", extra_conf={"spark.ui.enabled": "true"})
    n_rows = int(os.environ.get("SKEW_ROWS", "2000000"))
    fact = gen_account_tx_skewed(spark, n_rows).repartition(32).persist()
    n = fact.count()
    dim = (
        fact.select("account")
        .distinct()
        .withColumn("segment", F.pmod(F.hash("account"), F.lit(11)))
        .withColumn("label", F.concat(F.lit("acct-"), F.substring("account", 7, 8)))
        .persist()
    )
    n_dim = dim.count()
    hot_n = (
        fact.groupBy("account").count().agg(F.max("count")).collect()[0][0]
    )
    print(f"fact rows = {n}, dim rows = {n_dim}, hot share = {hot_n / n:.3f}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    results: dict = {"n_rows": n, "hot_share": round(hot_n / n, 3)}

    # 1) the aggregation shape: partial agg absorbs the hot key
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    n_groups = fact.groupBy("account").agg(F.count("*").alias("c")).count()
    results["counts"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "n_groups": n_groups,
        **(task_quantiles(spark, before) or {}),
    }
    print("counts", results["counts"])

    t0 = time.perf_counter()
    hot = detect_hot_keys(fact, "account")
    results["detect_s"] = round(time.perf_counter() - t0, 3)
    print(f"detect_hot_keys -> {len(hot)} hot key(s) in {results['detect_s']}s")

    def agg_of(joined):
        return (
            joined.groupBy("segment")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    for name, aqe, build in [
        ("plain", "false", lambda: fact.join(dim, "account")),
        (
            "salted",
            "false",
            lambda: salted_join(fact, dim, "account", hot, salts=SALTS),
        ),
        ("aqe", "true", lambda: fact.join(dim, "account")),
    ]:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
        before = _completed_stage_ids(spark)
        t0 = time.perf_counter()
        rows = agg_of(build())
        wall = round(time.perf_counter() - t0, 3)
        results[name] = {
            "wall_s": wall,
            **(task_quantiles(spark, before) or {}),
            "partition_spread": partition_spread(build()),
            "checksum": sum(r["n"] for r in rows),
        }
        print(name, results[name])

    assert results["plain"]["checksum"] == results["salted"]["checksum"], (
        "salted join changed the row multiset!"
    )
    print(json.dumps(results))


def main() -> None:
    from pyspark.sql import functions as F

    from classic_fcd_spark.session import get_spark, load_tables

    spark = get_spark("skew_spread", extra_conf={"spark.ui.enabled": "true"})
    ev = load_tables(spark, SF_DIR)["events"]
    # one hot user at ~100x a normal user's volume: all even user_ids
    # collapse onto user 1; AMPLIFY x32 so the hot partition is heavy
    # enough for task-time skew to register on local[32] (at real scale
    # the fact is already this lopsided)
    amplify = int(os.environ.get("SKEW_AMPLIFY", "32"))
    fact = (
        ev.crossJoin(spark.range(amplify).select(F.col("id").alias("__rep")))
        .select(
            F.when(F.col("user_id") % 2 == 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(32)
        .persist()
    )
    n = fact.count()
    dim = (
        fact.select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
        .persist()
    )
    dim.count()
    print(f"fact rows = {n}, hot-user share = "
          f"{fact.filter(F.col('user_id') == 1).count() / n:.3f}")

    def agg_of(joined):
        return (
            joined.groupBy("segment")
            .agg(F.count("*").alias("n"), F.sum("value").alias("amt"))
            .collect()
        )

    results = {}
    # force shuffle joins sized so the hot key matters: no broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # detection is a one-time pass per corpus generation — timed apart
    # from the repaired join it feeds
    from classic_fcd_spark.operators.skewjoin import detect_hot_keys, salted_join

    t0 = time.perf_counter()
    hot = [int(h) for h in detect_hot_keys(fact, "user_id")]
    detect_s = round(time.perf_counter() - t0, 3)
    print(f"detect_hot_keys: {hot} in {detect_s}s")

    for name, aqe, build in [
        ("plain", "false", lambda: fact.join(dim, "user_id")),
        (
            "salted",
            "false",
            lambda: salted_join(fact, dim, "user_id", hot, salts=SALTS),
        ),
        ("aqe", "true", lambda: fact.join(dim, "user_id")),
    ]:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
        before = _completed_stage_ids(spark)
        t0 = time.perf_counter()
        joined = build()
        rows = agg_of(joined)
        wall = round(time.perf_counter() - t0, 3)
        ts = task_spread(spark, before)
        spread = partition_spread(build())
        results[name] = {
            "wall_s": wall,
            "task_spread": ts,
            "partition_spread": spread,
            "n_segments": len(rows),
            "checksum": sum(r["n"] for r in rows),
        }
        print(name, results[name])
    results["detect_s"] = detect_s

    assert results["plain"]["checksum"] == results["salted"]["checksum"], (
        "salted join changed the row multiset!"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    if os.environ.get("SKEW_MODE") == "account":
        account_mode()
    else:
        main()
