"""Span-level exact-substring deduplication (the ExactSubstr operator of
Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499 — public literature).

Doc-level dedup (exact / MinHash / SimHash — operators/dedup.py) removes
whole documents; ExactSubstr removes the duplicated *regions inside*
otherwise-unique documents (boilerplate headers, licence blocks, quoted
passages).  The paper builds a single suffix array over the whole corpus
and scans it for repeated substrings >= 50 tokens — inherently
single-machine (one giant sorted array).  The Spark-first re-expression
works at k-token resolution:

1. Slide a k-token window over every document: (doc, pos, md5(window)).
   A repeated substring of length L >= k contributes L-k+1 windows, each
   of which appears >= 2 times corpus-wide; so duplicated-window
   positions are exactly the token positions covered by duplicated
   substrings (up to the k-grain boundary).
2. Keep positions whose window hash occurs >= min_count times — ONE
   shuffle, keyed on the fixed-width md5 (never the window text).
3. Per document, merge overlapping-or-adjacent duplicated positions into
   maximal spans — a lag + running-sum window over (doc, pos), the same
   single-shuffle shape as gap sessionization.

Semantics note (the honest delta vs a suffix array): a maximal merged
span marks a maximal run of k-windows that are EACH duplicated somewhere
in the corpus — different windows of one span may match different source
documents.  That is the same merge the paper applies to its overlapping
duplicate ranges before cutting; resolution is k tokens (spans shorter
than k are invisible, boundaries are exact).

Scale shape at 100 TB:
- the exploded (doc, pos, hash) table is ~n_tokens rows of fixed width —
  linear, shuffled once on the hash;
- no self-join anywhere: the duplicate test is a map-side-combined
  groupBy count + a semi-join back.  md5 randomizes DISTINCT windows,
  but identical windows share one hash and high-multiplicity windows
  are exactly what this operator hunts — so the count must be a partial
  aggregate (never a window over the hash partition, which puts a
  10^8-occurrence boilerplate gram on one task) and the join back is an
  equi-join AQE's skew handling can split;
- span merge shuffles (doc, pos) pairs only — narrow rows, one key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from classic_fcd_spark.operators.dedup import ws_tokens


def kgram_positions(text, k: int) -> Column:
    """Array of (pos, gh) structs: 1-based token position and md5 of the
    k-token window starting there.  Docs with fewer than k tokens yield
    an empty array (no window fits)."""
    toks = ws_tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    entry = lambda i: F.struct(  # noqa: E731
        i.alias("pos"), F.md5(F.array_join(F.slice(toks, i, k), " ")).alias("gh")
    )
    return F.when(F.size(toks) >= k, F.transform(idx, entry)).otherwise(
        F.array().cast("array<struct<pos:int,gh:string>>")
    )


def duplicated_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """(id, pos) of every k-window whose hash occurs >= min_count times
    corpus-wide (all occurrences count, including repeats within one
    document — suffix-array semantics).  Keyed on md5 throughout."""
    # single-file scans arrive as ONE partition — spread the md5 window
    # hashing across cores before the explode (same move as the shingle
    # family; at real scale the source layout already provides splits)
    par = docs.sparkSession.sparkContext.defaultParallelism
    ex = docs.repartition(par, id_col).select(
        F.col(id_col), F.explode(kgram_positions(text_col, k)).alias("s")
    ).select(id_col, F.col("s.pos").alias("pos"), F.col("s.gh").alias("gh"))
    # a groupBy + semi-join, NOT count().over(Window.partitionBy(gh)):
    # the window form moves every occurrence of a hash onto one task,
    # and a boilerplate window repeated 10^8 times corpus-wide is the
    # expected input here.  The partial aggregate combines map-side and
    # the join back is an equi-join AQE's skew handling can split.
    dup_gh = (
        ex.groupBy("gh").agg(F.count("*").alias("c")).filter(F.col("c") >= min_count)
    )
    return ex.join(dup_gh.select("gh"), "gh", "left_semi").select(id_col, "pos")


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """(id, span_start, span_end, span_len, n_grams): maximal duplicated
    regions per document, token-indexed (1-based, inclusive).

    Two duplicated windows at positions p < q merge iff q - p <= k
    (overlapping or exactly adjacent — the paper's overlapping-range
    merge); the merge is a lag + running-sum window over (doc, pos),
    identical in shape to operators/windows.sessionize.  span_end =
    last_pos + k - 1 (the last covered token); n_grams = how many
    duplicated windows support the span (span_len - n_grams exposes how
    "gappy" a span is at the k grain)."""
    dup = duplicated_positions(docs, id_col, text_col, k, min_count)
    wo = Window.partitionBy(id_col).orderBy("pos")
    new_run = F.when(
        F.col("pos") - F.lag("pos").over(wo) <= k, F.lit(0)
    ).otherwise(F.lit(1))
    spans = dup.withColumn("nr", new_run).withColumn(
        "sid", F.sum("nr").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        spans.groupBy(id_col, "sid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            (F.max("pos") + (k - 1) - F.min("pos") + 1).alias("span_len"),
            F.count("*").alias("n_grams"),
        )
        .drop("sid")
    )


def duck_duplicated_spans_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
) -> str:
    """DuckDB oracle computing the identical spans (same md5 windows,
    same windowed count, same merge) — an independent engine arriving at
    the same integer answer."""
    toks = f"regexp_split_to_array(trim({text_col}), ' +')"
    return f"""
    WITH toks AS (SELECT {id_col}, {toks} AS t FROM {table}),
    ex AS (
        SELECT {id_col},
               unnest([{{'pos': i, 'gh': md5(array_to_string(t[i:i+{k - 1}], ' '))}}
                       for i in range(1, len(t) - {k - 2})]) AS s
        FROM toks
    ),
    flat AS (SELECT {id_col}, s.pos AS pos, s.gh AS gh FROM ex),
    dup AS (
        SELECT {id_col}, pos FROM (
            SELECT {id_col}, pos, COUNT(*) OVER (PARTITION BY gh) AS c FROM flat
        ) WHERE c >= {min_count}
    ),
    runs AS (
        SELECT {id_col}, pos,
               CASE WHEN pos - LAG(pos) OVER (PARTITION BY {id_col} ORDER BY pos)
                         <= {k} THEN 0 ELSE 1 END AS nr
        FROM dup
    ),
    spans AS (
        SELECT {id_col}, pos,
               SUM(nr) OVER (PARTITION BY {id_col} ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM runs
    )
    SELECT {id_col},
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {k - 1} AS BIGINT) AS span_end,
           CAST(MAX(pos) + {k - 1} - MIN(pos) + 1 AS BIGINT) AS span_len,
           COUNT(*) AS n_grams
    FROM spans GROUP BY {id_col}, sid
    """


def remove_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_span_len: int | None = None,
    min_count: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """(id, text_clean, n_tokens, n_removed): the ExactSubstr text
    surgery — rebuild every document with its duplicated regions cut
    out (Lee et al. 2021 §3.1 cut duplicated spans from the training
    text; dropping ALL occurrences is the conservative variant — the
    paper's keep-one-copy needs a global per-substring keeper election
    that k-grain merged spans cannot express honestly, so this operator
    does not pretend to).

    `min_span_len` only removes spans at least that long (the paper
    uses 50 tokens); `spans` reuses a precomputed duplicated_spans
    output.  The cut is pure column algebra: spans are collected per
    doc (bounded: spans per doc <= n_tokens / k), joined back, and the
    token array is filtered by a positional higher-order function — no
    UDF, no extra shuffle beyond the span build + one join."""
    sp = spans if spans is not None else duplicated_spans(
        docs, id_col, text_col, k, min_count
    )
    if min_span_len is not None:
        sp = sp.filter(F.col("span_len") >= min_span_len)
    agg = sp.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = ws_tokens(text_col)
    spans_col = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    in_span = lambda i: F.exists(  # noqa: E731 — i is the 0-based token index
        spans_col,
        lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
    )
    kept = F.filter(toks, lambda x, i: ~in_span(i))
    return (
        docs.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("text_clean"),
            F.size(toks).alias("n_tokens"),
            (F.size(toks) - F.size(kept)).alias("n_removed"),
        )
    )


def duck_remove_duplicated_spans_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_span_len: int | None = None,
    min_count: int = 2,
) -> str:
    """DuckDB oracle for the span cut: nests the span oracle as a
    subquery and filters token positions with the same containment
    test."""
    toks = f"regexp_split_to_array(trim({text_col}), ' +')"
    min_len = f"WHERE span_len >= {min_span_len}" if min_span_len is not None else ""
    return f"""
    WITH spans AS (
        SELECT * FROM ({duck_duplicated_spans_sql(table, id_col, text_col, k, min_count)})
        {min_len}
    ),
    agg AS (
        SELECT {id_col},
               list({{'s': span_start, 'e': span_end}}) AS sp
        FROM spans GROUP BY {id_col}
    ),
    base AS (
        SELECT d.{id_col}, {toks} AS t, COALESCE(a.sp, []) AS sp
        FROM {table} d LEFT JOIN agg a ON d.{id_col} = a.{id_col}
    )
    SELECT {id_col},
           -- COALESCE: array_to_string([]) is NULL in DuckDB but
           -- array_join([]) is '' in Spark — a fully-cut doc must agree
           COALESCE(array_to_string(
               [t[i] for i in range(1, len(t) + 1)
                if len(list_filter(sp, x -> i >= x.s AND i <= x.e)) = 0],
               ' '), '') AS text_clean,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len([t[i] for i in range(1, len(t) + 1)
                if len(list_filter(sp, x -> i >= x.s AND i <= x.e)) = 0])
                AS BIGINT) AS n_removed
    FROM base
    """
