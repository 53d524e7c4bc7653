"""Approximate heavy hitters: distributed Misra-Gries + exact recount.

The "most frequent n-grams / domains / templates" question at 100 TB:
an exact groupBy must shuffle EVERY distinct key — with n-gram keys
that is a shuffle the size of the corpus.  The classic fix (Misra &
Gries 1982, public; the basis of streaming SUMMARY sketches) keeps only
`capacity` counters per partition: decrementing all counters when a new
item arrives with none free.  Guarantee: any item whose count in a
partition exceeds n_p/capacity survives that partition's summary — so
by pigeonhole any item with GLOBAL count > N/capacity survives in at
least one partition and is in the candidate union.

Two-phase plan (the batch shape of the sketch):
1. candidate pass — mapInPandas per partition, Arrow-batched, emitting
   at most `capacity` candidate items per partition (tiny);
2. exact recount — broadcast the candidate set, semi-join the item
   stream down to candidates, ONE map-side-combined groupBy over a
   bounded key set, exact top-k.

Result: exact counts for the reported items, and a PROVEN completeness
bound — the returned top-k is exactly correct whenever the k-th true
count exceeds N/capacity (asserted in tests).  The shuffle never sees
more than |candidates| keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(capacity: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all; drop zeros (the MG step)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters.keys())})

    return run


def approx_top_items(
    items: DataFrame,
    item_col: str,
    k: int = 20,
    capacity: int = 1024,
) -> DataFrame:
    """(item, cnt) — the top-k items by EXACT count among the
    Misra-Gries candidates.  Exactly the true top-k whenever the k-th
    true count > N/capacity (N = total item rows); size `capacity`
    accordingly (the returned counts are always exact for the items
    shown)."""
    ex = items.select(F.col(item_col).cast("string").alias("item"))
    cands = (
        ex.mapInPandas(_mg_partition(capacity), "item string")
        .distinct()
    )
    counted = (
        ex.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return counted.orderBy(F.col("cnt").desc(), F.col("item").asc()).limit(k)
