"""Replay oracles for the two streaming-state operators (VERDICT r12
item 4) — the only §2 rows whose semantics no SQL oracle can express:

- S5/T10 mempool TTL state (src/lib/mempool.ts:74-152 →
  streaming/mempool.py): a pure-Python state-machine simulator replays
  the SAME observation schedule batch-by-batch (watermark advance,
  TTL timeouts, included-eviction, expired-on-arrival) and the Spark
  applyInPandasWithState run must emit exactly the simulator's
  eviction set — over randomized, reordered, seeded schedules.
- T7 throttled dim refresh (src/collector/watcher.ts:17-53 →
  streaming/dim_refresh.py): the simulator is the per-batch
  distinct-set drain; the recorded refresh calls must equal it
  call-for-call over randomized schedules with nulls and duplicates.

Batch order is pinned by STAMPING each file's mtime (FileStreamSource
lists by modification time; explicit utime removes the same-second tie
the sustained bench once hit), so the replay is deterministic and the
simulator sees the identical batch sequence.
"""

from __future__ import annotations

import pytest

# slow tier (r16, VERDICT r15 item 7): randomized replay-vs-simulator oracles — run with --runslow
pytestmark = pytest.mark.slow

import datetime as dt
import os
import random

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
_STAMPED: dict[str, int] = {}


def _write_batch(spark, obs_dir: str, rows, schema: str, seq: int) -> None:
    """Append one micro-batch file and pin its listing order: every
    not-yet-stamped part file gets mtime T0+seq (FileStreamSource sorts
    by modification time, so distinct stamps = deterministic replay)."""
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        obs_dir, mode="append"
    )
    base = 1_700_000_000  # any fixed epoch; only relative order matters
    for f in os.listdir(obs_dir):
        p = os.path.join(obs_dir, f)
        if f.startswith("_") or not os.path.isfile(p):
            continue
        if p not in _STAMPED:
            _STAMPED[p] = seq
            os.utime(p, (base + seq, base + seq))


def _ts(s: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _us(t: dt.datetime) -> int:
    return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def simulate_mempool(batches, ttl_seconds: int):
    """Pure-Python replay of mempool_eviction_stream's semantics, one
    list entry per micro-batch of (ts: datetime, txhash, kind) —
    including Spark's DUAL-watermark microbatch model (SPARK-24634,
    3.4+), empirically pinned by these very tests:

    - eviction watermark of batch k = max event time of batches < k
      (delay 0): drives the timeout sweep and the expired-on-arrival
      check inside the update function;
    - LATE-EVENT watermark of batch k = eviction watermark of batch k-1
      (it lags one batch): input rows with ts strictly below it are
      dropped BEFORE the stateful operator sees them;
    - states whose registered timeout < eviction watermark and with no
      surviving data in the batch fire timed-out -> expired eviction;
    - data groups: merge first/last (original first_seen survives),
      'included' evicts immediately, a deadline already at-or-behind
      the eviction watermark evicts expired-on-arrival, else the state
      re-registers last_seen + ttl;
    - availableNow runs EXTRA empty batches after the data is drained
      until state cleanup settles — one final sweep at the global max
      event time fires every timeout the last data batch armed.
    Returns the eviction set {(txhash, first_us, last_us, reason)}.
    """
    state: dict[str, list] = {}  # h -> [first_us, last_us, timeout_ms]
    out = set()
    prev_max = 0  # max event ts(ms) through batch k-1  (w_evict)
    prevprev_max = 0  # through batch k-2               (w_late)
    for batch in batches:
        w_evict, w_late = prev_max, prevprev_max
        kept = [(t, h, k) for (t, h, k) in batch if _us(t) // 1000 >= w_late]
        keys_with_data = {h for (_, h, _) in kept}
        # timeout sweep (groups without surviving data this batch)
        for h in sorted(state):
            first, last, tmo = state[h]
            if h not in keys_with_data and tmo < w_evict:
                out.add((h, first, last, "expired"))
                del state[h]
        # data groups
        by_key: dict[str, list] = {}
        for t, h, kind in kept:
            by_key.setdefault(h, []).append((t, kind))
        for h, rows in by_key.items():
            us = [_us(t) for t, _ in rows]
            first_us, last_us = min(us), max(us)
            if h in state:
                first_us = min(first_us, state[h][0])
                last_us = max(last_us, state[h][1])
            if any(k == "included" for _, k in rows):
                out.add((h, first_us, last_us, "included"))
                state.pop(h, None)
                continue
            timeout_ms = last_us // 1000 + ttl_seconds * 1000
            if timeout_ms <= w_evict:
                out.add((h, first_us, last_us, "expired"))
                state.pop(h, None)
                continue
            state[h] = [first_us, last_us, timeout_ms]
        batch_max_ms = max(_us(t) // 1000 for t, _, _ in batch)
        prevprev_max = prev_max
        prev_max = max(prev_max, batch_max_ms)
    # the final no-data batch: every armed timeout behind the terminal
    # watermark fires before the availableNow query stops
    for h in sorted(state):
        first, last, tmo = state[h]
        if tmo < prev_max:
            out.add((h, first, last, "expired"))
            del state[h]
    return out


def _random_schedule(seed: int, n_batches: int = 6, n_keys: int = 8):
    """Seeded schedule: mostly-advancing timestamps with jitter and
    deliberate LATE slabs (a batch far behind the watermark), random
    seen/included mix — the space where TTL state machines break."""
    rng = random.Random(seed)
    keys = [f"tx{i:02d}" for i in range(n_keys)]
    batches, clock = [], 0
    for b in range(n_batches):
        clock += rng.randint(10, 120)
        rows = []
        for _ in range(rng.randint(1, 8)):
            h = rng.choice(keys)
            kind = "included" if rng.random() < 0.2 else "seen"
            if rng.random() < 0.15:
                t = max(0, clock - rng.randint(100, 400))  # late arrival
            else:
                t = clock + rng.randint(0, 9)
            rows.append((_ts(t), h, kind))
        batches.append(rows)
    return batches


class TestMempoolReplayOracle:
    TTL = 30

    def _run_spark(self, spark, workdir, batches):
        from classic_fcd_spark.streaming.mempool import (
            run_mempool_available_now,
        )

        obs = os.path.join(workdir, "obs")
        for i, batch in enumerate(batches):
            _write_batch(
                spark, obs, batch, "ts timestamp, txhash string, kind string", i
            )
        rows = run_mempool_available_now(
            spark, obs, os.path.join(workdir, "ckpt"), ttl_seconds=self.TTL
        )
        return {
            (r["txhash"], _us(r["first_seen"]), _us(r["last_seen"]), r["reason"])
            for r in rows
        }

    def test_randomized_schedules_match_simulator(self, spark, tmp_path):
        for seed in (7, 23, 61):
            got = self._run_spark(spark, str(tmp_path / f"s{seed}"), _random_schedule(seed))
            want = simulate_mempool(_random_schedule(seed), self.TTL)
            assert got == want, f"seed {seed}"
            assert len(want) > 0, f"seed {seed} degenerate (no evictions)"

    def test_adversarial_shapes_match_simulator(self, spark, tmp_path):
        """Hand-planted shapes: an expired-on-arrival late slab (kept by
        the LAGGING late-event watermark, evicted by the current one),
        refresh extending a TTL past a sweep, included-without-seen, a
        key reseen AFTER its eviction (fresh state, second eviction),
        and a live survivor whose timeout never fires."""
        batches = [
            [(_ts(5000), "push", "seen")],
            # late slab: w_late still 0 (lags one batch), w_evict=5000
            # -> both rows expire ON ARRIVAL with their own timestamps
            [(_ts(0), "late", "seen"), (_ts(1), "aa", "seen")],
            [(_ts(5100), "bb", "seen"), (_ts(5101), "bb", "seen")],
            [(_ts(5125), "bb", "seen")],  # refresh: deadline -> 5155
            [(_ts(5200), "cc", "included")],  # included-without-seen
            [(_ts(5400), "push", "seen")],  # w_evict=5200: bb expires
            [(_ts(5500), "bb", "seen")],  # bb returns as a FRESH entry
            [(_ts(6000), "push", "seen")],  # final sweep expires bb again
        ]
        got = self._run_spark(spark, str(tmp_path / "adv"), batches)
        want = simulate_mempool(batches, self.TTL)
        assert got == want
        assert ("late", _us(_ts(0)), _us(_ts(0)), "expired") in want
        assert ("aa", _us(_ts(1)), _us(_ts(1)), "expired") in want
        assert ("cc", _us(_ts(5200)), _us(_ts(5200)), "included") in want
        # bb's two lifetimes: refreshed-then-swept, then fresh-then-swept
        bb = sorted((f, l, r) for h, f, l, r in want if h == "bb")
        assert bb == [
            (_us(_ts(5100)), _us(_ts(5125)), "expired"),
            (_us(_ts(5500)), _us(_ts(5500)), "expired"),
        ]
        # push's FIRST lifetime (seen@5000) expires in a sweep, but its
        # final lifetime (5400..6000) keeps the deadline ahead of the
        # terminal watermark — the live entry stays keyed (no eviction)
        push = [(f, l, r) for h, f, l, r in want if h == "push"]
        assert push == [(_us(_ts(5000)), _us(_ts(5000)), "expired")]


def simulate_dim_refresh(batches):
    """watcher.ts:17-53 drain semantics: one refresh call per non-empty
    micro-batch carrying the batch's sorted distinct non-null set."""
    calls = []
    for batch in batches:
        addrs = sorted({a for (a,) in batch if a is not None})
        if addrs:
            calls.append(addrs)
    return calls


class TestDimRefreshReplayOracle:
    def test_randomized_schedules_match_simulator(self, spark, tmp_path):
        from classic_fcd_spark.streaming.dim_refresh import run_dim_refresh

        for seed in (5, 19):
            rng = random.Random(seed)
            vals = [f"v{i}" for i in range(6)] + [None]
            batches = [
                [(rng.choice(vals),) for _ in range(rng.randint(1, 7))]
                for _ in range(5)
            ]
            src = os.path.join(str(tmp_path), f"ev{seed}")
            for i, b in enumerate(batches):
                _write_batch(spark, src, b, "operator string", i)
            calls: list = []
            run_dim_refresh(
                spark,
                src,
                os.path.join(str(tmp_path), f"ck{seed}"),
                "operator",
                lambda a: calls.append(list(a)),
            )
            assert calls == simulate_dim_refresh(batches), f"seed {seed}"
            assert len(calls) > 0
