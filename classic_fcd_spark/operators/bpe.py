"""Distributed BPE (byte-pair-encoding) tokenizer training — Sennrich
et al. 2016 (arXiv:1508.07909, public literature), the subword-vocab
construction step of a training-data pipeline.

The classic observation that makes BPE distributable: training operates
on the WORD VOCABULARY with counts, not the corpus.  One corpus scan
builds (word, count); every merge round then runs over that table —
at web scale the vocab is 10^7-10^8 rows (vs 10^12 corpus tokens), so
rounds are cheap, and the corpus itself is touched exactly once.

Per merge round (all DataFrame ops, no UDF):
1. pair counts: explode each word's adjacent symbol pairs weighted by
   the word count — groupBy(pair).sum, map-side combined;
2. best pair: max(struct(count, pair)) — ONE row collected (ties break
   lexicographically-largest, a documented deterministic choice);
3. merge: a higher-order fold rewrites every word's symbol array,
   greedy left-to-right non-overlapping (the fold's accumulator check
   naturally prevents overlap: a freshly merged symbol never equals the
   pair's left element).

The words table is localCheckpointed every few rounds — same lineage-
truncation discipline as the connected-components loop.  Driver state =
the merge list (n_merges pairs).

Segmentation (applying a trained merge list to new text) is inherently
sequential per word — that is an Arrow-batched pandas UDF over the
DISTINCT words of the batch, joined back: the classic
dictionary-encoding trick (segment each distinct word once, not each
occurrence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from classic_fcd_spark.operators.dedup import ws_tokens

_EOW = "</w>"  # end-of-word marker, standard in the original paper


def _chars_with_eow(word: Column) -> Column:
    """word -> array of single-char symbols + the end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(_EOW)))


def _merge_fold(a: str, b: str) -> Column:
    """Greedy non-overlapping replace of adjacent (a, b) with a||b via a
    single array fold."""
    merged = a + b
    la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)
    return F.aggregate(
        F.col("sym"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lm)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus's word-frequency table — BPE's actual
    training input, built with the corpus's ONE scan."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(par)
        .select(F.explode(ws_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """The ordered merge list (the tokenizer model).  Stops early if no
    adjacent pair occurs at least twice (nothing left to compress)."""
    words = word_vocab(docs, text_col).select(
        F.col("cnt"), _chars_with_eow(F.col("word")).alias("sym")
    )
    words = words.persist()
    words.count()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            words.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice("sym", 1, F.size("sym") - 1),
                        F.slice("sym", 2, F.size("sym") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("cnt").alias("c"))
            .agg(F.max(F.struct(F.col("c"), F.col("p"))).alias("best"))
            .collect()[0]["best"]
        )
        if pairs is None or pairs["c"] < 2:
            break
        a, b = pairs["p"]["a"], pairs["p"]["b"]
        merges.append((a, b))
        old = words
        words = words.select("cnt", _merge_fold(a, b).alias("sym"))
        if (i + 1) % checkpoint_every == 0:
            # truncate the n-deep transform lineage (the CC-loop move)
            words = words.localCheckpoint()
        else:
            words = words.persist()
        words.count()
        old.unpersist()
    return merges


def _segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference application of a merge list to one word —
    shared by the pandas UDF below and the tests' reference."""
    sym = list(word) + [_EOW]
    for a, b in merges:
        out: list[str] = []
        for x in sym:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        sym = out
    return sym


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs + out_col: array of subword tokens for every document
    (`id_col` must uniquely key docs — the rebuild joins on it alone, so
    NULLs in other columns cannot break the match).

    Applying n merges is sequential per word, so it runs as an
    Arrow-batched pandas UDF — but over the batch's DISTINCT words only
    (dictionary encoding), joined back and reassembled in word order
    with pure column ops.  At 100 TB the distinct-word side is the
    vocab (bounded), not the corpus."""
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: the module's `from __future__ import annotations`
    # would stringify them and break pandas_udf's signature inference
    @pandas_udf("array<string>")
    def seg(words):
        return pd.Series(
            [_segment_word(w, merges) for w in words]
        )

    distinct_words = (
        docs.repartition(par)
        .select(F.explode(ws_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .withColumn("__sub", seg("word"))
    )
    exploded = docs.select(
        id_col, F.posexplode(ws_tokens(text_col)).alias("__pos", "word")
    ).filter(F.col("word") != "")
    rejoined = (
        exploded.join(distinct_words, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__sub"))),
                    lambda s: s["__sub"],
                )
            ).alias(out_col)
        )
    )
    # join back on the KEY only (an all-columns join silently unmatches
    # any row holding a NULL — non-null-safe equality), and keep docs
    # with no non-empty token via an empty array (the "for every
    # document" contract)
    return docs.join(rejoined, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )
