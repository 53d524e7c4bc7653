"""Streaming Misra-Gries heavy hitters (streaming/heavyhitters.py):
bounded per-bucket state with valid count bounds, completeness for
guaranteed-frequent items, and checkpoint resume.
"""

from __future__ import annotations

import pandas as pd
import pytest
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from classic_fcd_spark.streaming.heavyhitters import (
    item_bucket,
    run_available_now,
)

CAPACITY = 16
BUCKETS = 4


def _write_items(path: str, seq: list[str], fname: str) -> None:
    pq.write_table(pa.table({"item": seq}), f"{path}/{fname}")


def _mk_stream_dir(tmp_path, n_files=3):
    d = tmp_path / "items"
    d.mkdir()
    # skewed: a few planted heavy items + long tail of rare ones
    for f in range(n_files):
        seq = []
        for i in range(300):
            seq.append(f"heavy{i % 3}")  # 100 each per file
        for i in range(120):
            seq.append(f"rare-{f}-{i}")  # singletons
        _write_items(str(d), seq, f"part-{f}.parquet")
    return str(d)


def _exact_bucket_counts(spark, items_dir):
    df = (
        spark.read.parquet(items_dir)
        .select(
            F.col("item").cast("string").alias("item"),
            item_bucket("item", BUCKETS).alias("bucket"),
        )
        .groupBy("bucket", "item")
        .agg(F.count("*").alias("cnt"))
    )
    out: dict[int, dict[str, int]] = {}
    for r in df.collect():
        out.setdefault(r["bucket"], {})[r["item"]] = r["cnt"]
    return out


def _assert_invariants(summary, exact):
    for b, info in summary.items():
        true = exact.get(b, {})
        assert info["n"] == sum(true.values())  # n_bucket exact
        assert len(info["counters"]) <= CAPACITY  # bounded state
        for item, mg in info["counters"].items():
            t = true.get(item, 0)
            assert mg <= t <= mg + info["d"], (b, item, mg, t, info["d"])
        # completeness: count > n_bucket/capacity MUST survive
        thresh = info["n"] / CAPACITY
        for item, t in true.items():
            if t > thresh:
                assert item in info["counters"], (b, item, t, thresh)


class TestStreamingHeavyHitters:
    def test_bounds_and_completeness(self, spark, tmp_path):
        items_dir = _mk_stream_dir(tmp_path)
        summary = run_available_now(
            spark, items_dir, str(tmp_path / "ck"), capacity=CAPACITY,
            num_buckets=BUCKETS,
        )
        exact = _exact_bucket_counts(spark, items_dir)
        assert set(summary) == set(exact)  # every bucket reported
        _assert_invariants(summary, exact)
        # the planted heavies are global heavy hitters -> all survive
        survivors = {i for info in summary.values() for i in info["counters"]}
        assert {"heavy0", "heavy1", "heavy2"} <= survivors

    @pytest.mark.slow  # 23 s checkpoint-restart cycle (r16 tiering)
    def test_resume_from_checkpoint_continues_counts(self, spark, tmp_path):
        items_dir = _mk_stream_dir(tmp_path, n_files=2)
        ck = str(tmp_path / "ck2")
        first = run_available_now(
            spark, items_dir, ck, capacity=CAPACITY, num_buckets=BUCKETS
        )
        n_first = sum(info["n"] for info in first.values())
        # new data arrives; same checkpoint -> state resumes, not restarts
        _write_items(
            items_dir, ["heavy0"] * 50 + [f"late-{i}" for i in range(20)],
            "part-9.parquet",
        )
        second = run_available_now(
            spark, items_dir, ck, capacity=CAPACITY, num_buckets=BUCKETS
        )
        exact = _exact_bucket_counts(spark, items_dir)
        # the second drain only re-emits buckets touched by the new file,
        # so merge over the first run's summary (update-mode semantics)
        merged = dict(first)
        merged.update(second)
        assert sum(info["n"] for info in merged.values()) == sum(
            sum(t.values()) for t in exact.values()
        )
        assert sum(info["n"] for info in merged.values()) > n_first
        _assert_invariants(merged, exact)


class TestNonStringItems:
    def test_int_items_route_like_their_string_form(self, spark, tmp_path):
        # the stream casts to string BEFORE bucketing, so an offline
        # recount over the emitted strings lands in the same buckets
        d = tmp_path / "ints"
        d.mkdir()
        pq.write_table(
            pa.table({"item": pa.array([7] * 40 + list(range(100, 120)), pa.int64())}),
            f"{d}/part-0.parquet",
        )
        summary = run_available_now(
            spark, str(d), str(tmp_path / "ck3"), capacity=CAPACITY,
            num_buckets=BUCKETS,
        )
        exact = (
            spark.read.parquet(str(d))
            .select(F.col("item").cast("string").alias("item"))
            .select("item", item_bucket("item", BUCKETS).alias("bucket"))
            .groupBy("bucket", "item")
            .agg(F.count("*").alias("cnt"))
        )
        ex: dict[int, dict[str, int]] = {}
        for r in exact.collect():
            ex.setdefault(r["bucket"], {})[r["item"]] = r["cnt"]
        _assert_invariants(summary, ex)
        assert any("7" in info["counters"] for info in summary.values())
