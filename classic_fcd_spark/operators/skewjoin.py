"""Salted join: explicit hot-key skew handling for fact x dim joins.

AQE's skew-join splitting (on in the session, SURVEY §4) repairs skew
for shuffled sort-merge joins AFTER a stage materializes — but it
cannot help when the skewed side must shuffle into single oversized
partitions first, and it does nothing for deliberately-partitioned
pipelines that avoid AQE re-planning.  The classic explicit fix: SALT
the hot keys — fact rows of a hot key scatter across S sub-keys, the
dim row for that key is REPLICATED S times, and the join runs on
(key, salt) with no partition larger than hot_count/S.

Cost model: |dim| grows by (S-1) x |hot keys| rows (tiny — hot keys are
by definition few), the fact side gains one pmod(hash) projection, and
the shuffle becomes balanced.  Non-hot keys keep salt 0 on both sides —
no replication, no extra rows.

Hot keys come from the caller (a heavy-hitters pass — see
operators/heavyhitters.py — or prior knowledge); detection and repair
stay separable, as in every production skew recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on `key`, with rows of `hot_keys` spread over `salts`
    sub-partitions.  Exactly the rows of the plain join (parity asserted
    in tests); dim columns must not collide with fact columns (standard
    join hygiene).  `how` is 'inner' or 'left'."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    hot = F.array(*[F.lit(k) for k in hot_keys])
    f_salt = F.when(
        F.array_contains(hot, F.col(key)),
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salts)),
    ).otherwise(F.lit(0))
    fact_s = fact.withColumn("__salt", f_salt.cast("int"))
    # replicate dim rows S times for hot keys, once (salt 0) otherwise
    d_salts = F.when(
        F.array_contains(hot, F.col(key)),
        F.sequence(F.lit(0), F.lit(salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    dim_s = (
        dim.withColumn("__salts", d_salts)
        .withColumn("__salt", F.explode("__salts"))
        .withColumn("__salt", F.col("__salt").cast("int"))
        .drop("__salts")
    )
    return fact_s.join(dim_s, [key, "__salt"], how).drop("__salt")
