"""BM25 lexical retrieval over the document corpus (Robertson/Walker
Okapi BM25, public literature; the +1 idf smoothing is the Lucene
variant so scores are always non-negative).

The lexical complement to the embedding ANN family: keyword search over
100 TB of text, and the retrieval step of lexical data-selection /
decontamination recipes.

Scale shape:
- The (doc, term, tf) postings table is the materialized inverted-index
  silver — one explode + one groupBy per corpus generation, reusable
  across every query batch (like session.shingle_table for dedup).
- Query time: the query-term set is tiny → broadcast; postings are
  semi-joined down to query terms BEFORE any scoring work, so cost
  follows matching postings, never the corpus.  Per-query top-k is a
  bounded window.
- Corpus stats (N, total tokens) are a 1-row aggregate — the only
  driver-side state.

Numeric policy (the driver-hash lesson): per-(query, doc, term) BM25
partials are computed in double with ONE fixed expression shape shared
by the Spark column and the DuckDB oracle (literals embedded via repr,
same association order), then floored to e6 fixed point BEFORE the
per-doc sum — so document scores are order-free exact integers, immune
to float-sum nondeterminism (same trick as operators/dsir.py's
quantize_e6 path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from classic_fcd_spark.operators.dedup import ws_tokens


def bm25_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, dl): term frequencies with per-doc length — the
    inverted-index silver table.  One explode + one groupBy; dl rides
    along via a size() column computed before the explode (no second
    tokenize pass, no second shuffle).  The input is spread across cores
    first — single-file scans arrive as one partition."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par, id_col).select(
        F.col(id_col),
        F.size(ws_tokens(text_col)).alias("dl"),
        F.explode(ws_tokens(text_col)).alias("term"),
    )
    return toks.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))


def _score_expr(n: int, avgdl: float, k1: float, b: float):
    """The shared BM25 per-term partial, association order fixed:
    ((idf * tf) * (k1+1)) / (tf + k1 * ((1-b) + ((b*dl)/avgdl)))."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.lit(avgdl)
    )
    return idf * F.col("tf") * F.lit(k1 + 1.0) / denom


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    postings: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """(qid, id, rnk, score_e6): top-k BM25 docs per query.

    `postings` reuses a pre-materialized bm25_postings table (the
    long-lived-engine shape); otherwise it is built from `docs`.  N and
    avgdl come from one scalar aggregate OVER THE POSTINGS' per-doc
    lengths (bounded driver state) — never a second corpus tokenize:
    every doc contributes >= 1 posting row under this tokenizer (empty
    text yields one empty-string token), so distinct (id, dl) covers
    the whole corpus.  An empty corpus returns an empty result.

    A term repeated inside one query counts ONCE (set-of-terms queries,
    the common BM25 presentation without the qtf factor) — (qid, term)
    pairs are deduplicated here and in duck_bm25_sql identically.  An
    empty `queries` list returns the empty-schema result."""
    spark = docs.sparkSession
    # set semantics per query: dedupe (qid, term) pairs, order-stable
    qpairs = list(dict.fromkeys((qid, t) for qid, terms in queries for t in terms))
    if postings is not None:
        post = postings
    else:
        # the stats collect below is an ACTION: without a persist the
        # scoring job would rebuild the whole postings lineage a second
        # time (shuffles are not reused across separate jobs)
        from classic_fcd_spark.session import scoped_persist

        post = scoped_persist(
            bm25_postings(docs, id_col, text_col), "bm25:postings"
        )

    def _empty() -> DataFrame:
        # empty-path schema must equal the non-empty path's, whatever
        # type the id column carries (schema access is analysis-only —
        # no job runs for the empty-queries early exit)
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        id_field = post.schema[id_col]
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("qid", LongType()),
                    StructField(id_col, id_field.dataType),
                    StructField("rnk", IntegerType()),
                    StructField("score_e6", LongType()),
                ]
            ),
        )

    if not qpairs:
        return _empty()
    # `stats` lets a long-lived engine pass the per-corpus cached (N,
    # avgdl) pair (session.bm25_corpus_stats) instead of paying this
    # collect job per query call (r15); the values are computed by the
    # identical expression either way, so scores are bit-identical.
    if stats is None:
        row = (
            post.select(id_col, "dl")
            .distinct()
            .agg(F.count("*").alias("n"), F.sum("dl").alias("tot"))
            .collect()[0]
        )
        stats = (
            (int(row["n"]), int(row["tot"]) / int(row["n"]))
            if row["n"]
            else (0, 0.0)
        )
    n, avgdl = stats
    if not n:
        return _empty()

    qdf = spark.createDataFrame(qpairs, ["qid", "term"])
    # document frequency of QUERY terms only: postings pruned by the
    # broadcast term set first, so df never aggregates the full vocab
    terms = qdf.select("term").distinct()
    matched = post.join(F.broadcast(terms), "term")
    dfreq = matched.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qdf), "term")
        .withColumn(
            "s_e6",
            F.floor(_score_expr(n, avgdl, k1, b) * F.lit(1000000.0)).cast("bigint"),
        )
    )
    agg = scored.groupBy("qid", id_col).agg(F.sum("s_e6").alias("score_e6"))
    w = Window.partitionBy("qid").orderBy(F.col("score_e6").desc(), F.col(id_col).asc())
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("qid", id_col, "rnk", "score_e6")
    )


def duck_bm25_sql(
    queries: list[tuple[int, list[str]]],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> str:
    """DuckDB oracle: same tokenization, same postings, same fixed-shape
    float expression (literals via repr → bit-identical doubles), same
    e6 floor-then-integer-sum, same (qid, term) set semantics."""
    toks = f"regexp_split_to_array(trim({text_col}), ' +')"
    qpairs = list(dict.fromkeys((qid, t) for qid, terms in queries for t in terms))
    if not qpairs:
        # bm25_topk short-circuits this case to an empty frame; an empty
        # VALUES list is invalid SQL, so keep the oracle contract
        # symmetric by refusing rather than emitting a broken query
        raise ValueError("duck_bm25_sql needs >=1 (qid, term) pair")
    qvals = ", ".join(
        "({}, '{}')".format(qid, t.replace("'", "''")) for qid, t in qpairs
    )
    score = (
        f"ln(1.0 + (CAST(stats.n AS DOUBLE) - qdf.df + 0.5) / (qdf.df + 0.5))"
        f" * tf.tf * {k1 + 1.0!r}"
        f" / (tf.tf + {k1!r} * ({1.0 - b!r} + ({b!r} * tf.dl) / stats.avgdl))"
    )
    return f"""
    WITH toks AS (SELECT {id_col}, {toks} AS t FROM {table}),
    stats AS (
        SELECT COUNT(*) AS n, CAST(SUM(len(t)) AS DOUBLE) / COUNT(*) AS avgdl
        FROM toks
    ),
    post AS (SELECT {id_col}, len(t) AS dl, unnest(t) AS term FROM toks),
    tf AS (SELECT {id_col}, dl, term, COUNT(*) AS tf FROM post GROUP BY 1, 2, 3),
    q(qid, term) AS (VALUES {qvals}),
    qdf AS (
        SELECT term, COUNT(*) AS df FROM tf
        WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term
    ),
    scored AS (
        SELECT q.qid, tf.{id_col},
               CAST(floor({score} * 1000000.0) AS BIGINT) AS s_e6
        FROM q
        JOIN tf USING (term)
        JOIN qdf USING (term)
        CROSS JOIN stats
    ),
    agg AS (
        SELECT qid, {id_col}, CAST(SUM(s_e6) AS BIGINT) AS score_e6
        FROM scored GROUP BY 1, 2
    )
    SELECT qid, {id_col}, rnk, score_e6 FROM (
        SELECT qid, {id_col}, score_e6,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score_e6 DESC, {id_col} ASC) AS rnk
        FROM agg
    ) WHERE rnk <= {top_k}
    """


def rrf_fuse(
    rankings: list[DataFrame],
    qid_col: str = "qid",
    id_col: str = "doc_id",
    rnk_col: str = "rnk",
    rrf_k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """(qid, id, rrf_e9, rnk): Reciprocal Rank Fusion over any number of
    per-query rankings (Cormack et al. 2009, public literature) — the
    standard lexical+dense hybrid: fuse bm25_topk with an ANN top-k and
    the union outranks either system alone on mixed query loads.

    score = sum over systems of 1e9 div (rrf_k + rank) — integer
    division instead of the paper's float 1/(k+r), so fused scores are
    exact bigints (deterministic under any partitioning / engine; the
    floor loses < 1 part in 1e7 of the reciprocal and cannot reorder
    single-system contributions, which are a fixed integer per rank).
    Inputs only need (qid, id, rank); absent (query, doc) pairs simply
    contribute nothing.  One unionByName + one groupBy on (qid, id) —
    both bounded by systems x top-k rows per query, never corpus-sized."""
    parts = [
        r.select(
            F.col(qid_col).alias("qid"),
            F.col(id_col).alias("__id"),
            F.expr(f"1000000000 div ({rrf_k} + {rnk_col})").alias("__c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("qid", "__id").agg(F.sum("__c").alias("rrf_e9"))
    w = Window.partitionBy("qid").orderBy(F.col("rrf_e9").desc(), F.col("__id").asc())
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("qid", F.col("__id").alias(id_col), "rrf_e9", "rnk")
    )
