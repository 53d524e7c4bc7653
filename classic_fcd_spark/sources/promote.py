"""Crash-safe two-phase partition promotion — shared by every
parquet-MERGE sink (serving extracts, minute rollup, unified block
ingest).

Every partition-scoped MERGE in this repo has the same final step:
rewrite the touched `col=value` partition directories of a live table
from a freshly-written staging tree.  A naive rmtree(dst) + rename(src)
has an unrecoverable window — a crash between the two permanently drops
that partition's previously-merged history (ADVICE r8 medium).  This
module makes the swap convergent from ANY crash point:

1. `promote_partitions` commits a manifest (atomic rename) BEFORE any
   live directory moves, then per partition: park the live dir at
   `<dst>__old`, move the staged dir in, drop the parked copy.
2. `heal_table` (idempotent; run by the next merge AND the next reader)
   replays the manifest: un-promoted partitions finish their swap,
   half-swapped partitions complete from the still-present staged dir,
   done partitions drop their parked copy.

At no point is a partition's only copy inside a directory about to be
deleted.  On object stores (no atomic dir rename) the whole MERGE path
this serves is the documented Delta/Iceberg MERGE INTO instead — this
is the local-filesystem/HDFS mechanism, not the deployment design.

Reference parity: the reference gets this atomicity from Postgres
(saveBlockInformation's per-block transaction,
src/collector/block/block.ts:142-197, and INSERT … ON CONFLICT upserts,
src/collector/block/tx.ts:240-247); here the commit point is the
manifest rename and the replay boundary is the streaming checkpoint.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil

MANIFEST = "_promote_manifest.json"
OLD_SUFFIX = "__old"

# Concurrency contract: ONE writer per table (the streaming checkpoint
# serializes merges).  Readers may call heal_table concurrently with a
# writer's promote_partitions — both then race the same convergent
# per-partition swaps (each individually idempotent) and the same
# manifest/tmp cleanup.  A cleanup-race loser sees the file already
# gone (suppressed FileNotFoundError); a swap-race loser sees its
# rename pair fail AFTER the exists(src) check — _promote_one re-checks
# the end-state (src consumed, dst present) and returns instead of
# failing the streaming batch or the read (ADVICE r9/r10).  True
# multi-writer
# needs an exclusive lock file — out of scope for the single-stream
# design this serves.


def _promote_one(tmp: str, table_dir: str, part_col: str, value) -> None:
    """Crash-safe single-partition swap (convergent on replay)."""
    src = os.path.join(tmp, f"{part_col}={value}")
    dst = os.path.join(table_dir, f"{part_col}={value}")
    old = dst + OLD_SUFFIX
    if not os.path.exists(src):
        # promotion already completed for this partition (heal/replay)
        shutil.rmtree(old, ignore_errors=True)
        return
    shutil.rmtree(old, ignore_errors=True)
    try:
        if os.path.exists(dst):
            os.rename(dst, old)
        os.rename(src, dst)
    except OSError:
        # Lost a heal-vs-promote race (ADVICE r10): both processes
        # passed the exists(src) check; the loser's rename then sees
        # ENOENT/ENOTEMPTY.  Re-check the convergent end-state:
        if not os.path.exists(src):
            if os.path.exists(dst):
                # winner consumed src and put dst in place — this
                # partition is promoted; treat as done instead of
                # failing the streaming batch or the read.
                shutil.rmtree(old, ignore_errors=True)
                return
            if os.path.exists(old):
                # we shoved the winner's COMPLETED dst aside (our
                # dst→old ran after the winner finished) and then our
                # own src→dst failed — restore the winner's result.
                # The restore itself can lose to a THIRD healer that
                # re-creates dst first (ADVICE r11): re-check the end
                # state instead of propagating — dst present means the
                # partition is promoted, whoever put it there.
                try:
                    os.rename(old, dst)
                except OSError:
                    if not os.path.exists(dst):
                        raise
                    shutil.rmtree(old, ignore_errors=True)
                return
        # src is still staged: if we parked the live partition in
        # __old and never filled dst, put it back before failing so
        # the table stays readable and nothing sits in __old until
        # the next heal (ADVICE r11).
        if os.path.exists(old) and not os.path.exists(dst):
            with contextlib.suppress(OSError):
                os.rename(old, dst)
        raise
    shutil.rmtree(old, ignore_errors=True)


def promote_partitions(
    tmp: str, table_dir: str, part_col: str, values: list
) -> None:
    """Two-phase promotion of the staged partition dirs under `tmp`
    into `table_dir`: manifest first (atomic via rename), then
    per-partition swaps, then cleanup.  A crash anywhere is healed by
    heal_table."""
    os.makedirs(table_dir, exist_ok=True)
    man = os.path.join(table_dir, MANIFEST)
    man_tmp = man + ".tmp"
    with open(man_tmp, "w") as f:
        json.dump({"tmp": tmp, "part_col": part_col, "values": values}, f)
    os.rename(man_tmp, man)
    for v in values:
        _promote_one(tmp, table_dir, part_col, v)
    shutil.rmtree(tmp, ignore_errors=True)
    with contextlib.suppress(FileNotFoundError):
        os.remove(man)


def heal_table(table_dir: str) -> list:
    """Finish (or back out of) a promotion that crashed mid-swap; see
    module docstring.  Returns the partition values it repaired ([]
    when the table is clean).  Idempotent; cheap (one stat) in the
    clean case, so every merge and every open calls it."""
    man = os.path.join(table_dir, MANIFEST)
    if not os.path.exists(man):
        return []
    try:
        with open(man) as f:
            meta = json.load(f)
    except FileNotFoundError:
        return []  # a concurrent heal consumed it between the stat/open
    tmp, part_col, values = meta["tmp"], meta["part_col"], meta["values"]
    healed = []
    for v in values:
        if os.path.exists(os.path.join(tmp, f"{part_col}={v}")) or os.path.exists(
            os.path.join(table_dir, f"{part_col}={v}") + OLD_SUFFIX
        ):
            healed.append(v)
        _promote_one(tmp, table_dir, part_col, v)
    shutil.rmtree(tmp, ignore_errors=True)
    with contextlib.suppress(FileNotFoundError):
        os.remove(man)
    return healed
