"""End-to-end training-corpus curation: the pipeline the LLM-data
operators exist for, composed as one lazy DataFrame graph.

Stage order follows the public large-corpus recipes (C4, MassiveText,
RefinedWeb): cheap per-document filters first (pure projections — no
shuffle), then exact dedup (one shuffle), then fuzzy dedup (banded LSH +
connected components), then the mix/sampling step, then sequence packing
for the training loader.  Each stage only shrinks the data, so the
expensive stages see the smallest possible input.

Everything is a composition of the operators this repo already gates:
functions.text (quality/lang/repetition/fingerprint), operators.dedup
(simhash + connected components), operators.sampling (deterministic
stratified sample), operators.packing (concat-and-cut bins).  No
collect() anywhere in the data path — stats come back as one small
aggregated DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from classic_fcd_spark.functions import text as T
from classic_fcd_spark.functions.text import passes_repetition_filter
from classic_fcd_spark.operators.dedup import simhash_component_labels
from classic_fcd_spark.operators.packing import pack_concat_and_cut
from classic_fcd_spark.operators.sampling import stratified_sample


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en",),
    simhash_hamming: int = 1,
    sample_rates: dict[str, float] | None = None,
    pack_budget: int = 512,
    bench: DataFrame | None = None,
    decon_ngram: int = 13,
    index_docs: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    emb_centroids: list | None = None,
    semantic_eps: float = 0.05,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    cut_spans_min_len: int | None = None,
    cut_spans_k: int = 8,
    lm_model_docs: DataFrame | None = None,
    max_mean_nll_e6: int | None = None,
    quality_weights: list[float] | None = None,
    min_model_quality: float = 0.5,
) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → packed training
    rows (doc_id, source, n_tokens, bin_id, offset, spans_boundary,
    stage column dropped).  Lazy end to end; call curation_stats for the
    per-stage funnel.  Pass `bench` (an eval-set DataFrame with a text
    column) to add benchmark decontamination as a drop stage; pass
    `index_docs` (already-ingested corpus, ids disjoint from the batch)
    to drop batch docs that near-duplicate it — the incremental-ingest
    shape (operators.dedup.incremental_near_dups).  Pass `embeddings`
    (doc_id-keyed array<float> column named `embedding`) to add SemDeDup
    semantic dedup after token-level near-dup removal — paraphrase-level
    redundancy token hashes cannot see (operators.similarity
    .semantic_dedup; `emb_centroids` pins the codebook, else k-means
    trains one).  Pass `dsir_target` + `dsir_k` to make the final
    selection stage DSIR importance resampling toward the target
    distribution instead of the stratified rate mix.  Pass
    `cut_spans_min_len` to run the ExactSubstr span cut FIRST (every
    doc's duplicated regions >= that many tokens are removed before any
    filter sees the text — operators.spans.remove_duplicated_spans);
    pass `lm_model_docs` + `max_mean_nll_e6` to drop docs whose CCNet
    mean NLL under the reference-corpus LM exceeds the threshold
    (operators.lm.unigram_nll_scores).  Pass `quality_weights` (e.g.
    from operators.quality_model.train_linear_quality) to ALSO gate on
    the trained hashed linear classifier — scored by the column-algebra
    linear_quality_score at scan speed, dropping docs below
    `min_model_quality` as stage drop:model_quality."""
    staged = _with_stages(
        docs, min_quality, keep_langs, simhash_hamming, sample_rates, bench,
        decon_ngram, index_docs, embeddings, emb_centroids, semantic_eps,
        dsir_target, dsir_k, cut_spans_min_len, cut_spans_k,
        lm_model_docs, max_mean_nll_e6, quality_weights, min_model_quality,
    )
    kept = staged.filter(F.col("__stage") == "kept")
    packed = pack_concat_and_cut(
        kept.select("doc_id", "source", T.n_tokens("text").alias("n_tokens")),
        "source",
        "doc_id",
        "n_tokens",
        pack_budget,
    )
    return packed


def _with_stages(
    docs: DataFrame,
    min_quality: float,
    keep_langs: tuple[str, ...],
    simhash_hamming: int,
    sample_rates: dict[str, float] | None,
    bench: DataFrame | None = None,
    decon_ngram: int = 13,
    index_docs: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    emb_centroids: list | None = None,
    semantic_eps: float = 0.05,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    cut_spans_min_len: int | None = None,
    cut_spans_k: int = 8,
    lm_model_docs: DataFrame | None = None,
    max_mean_nll_e6: int | None = None,
    quality_weights: list[float] | None = None,
    min_model_quality: float = 0.5,
) -> DataFrame:
    """Tag every document with the FIRST stage that drops it (or 'kept').

    Tagging instead of filtering keeps one lineage for both the output
    and the funnel stats — the classic data-quality audit shape."""
    # ExactSubstr span cut runs FIRST (a transform, not a drop stage):
    # every later filter/dedup/selection sees the cleaned text, exactly
    # as Lee et al. apply it before training-set assembly.  n_chars
    # keeps the ORIGINAL length (provenance metadata, not re-derived).
    if cut_spans_min_len is not None:
        from classic_fcd_spark.operators.spans import remove_duplicated_spans

        cut = remove_duplicated_spans(
            docs, k=cut_spans_k, min_span_len=cut_spans_min_len
        ).select("doc_id", F.col("text_clean").alias("text"))
        docs = docs.drop("text").join(cut, "doc_id")

    q = T.quality_score("text")
    lang_ok = F.col("lang").isin(*keep_langs)
    rep_ok = passes_repetition_filter("text")

    base = docs.select("doc_id", "text", "lang", "source", "n_chars")

    # exact dedup: keeper = min doc_id per bag-of-words key — the same
    # content key the gated exact_dedup_groups query uses (order-invariant
    # normalized token set), so the pipeline and the standalone operator
    # agree on what "exact duplicate" means
    from classic_fcd_spark.operators.dedup import ws_tokens

    bow = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(ws_tokens("text")))))
    fp = base.select("doc_id", bow.alias("fp"))
    exact_keeper = fp.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    exact = fp.join(exact_keeper, "fp").select(
        "doc_id", (F.col("doc_id") == F.col("keeper")).alias("exact_keep")
    )

    # incremental ingest: batch docs near-duplicating the ALREADY INGESTED
    # corpus, computed BEFORE the intra-batch near-dup stage — the index
    # side contributes only its band table + candidate shingles (see
    # operators.dedup.incremental_near_dups)
    index_dups = None
    if index_docs is not None:
        from classic_fcd_spark.operators.dedup import (
            banded_signatures,
            incremental_near_dups,
            word_shingles,
        )

        batch_sh = base.filter(F.size(ws_tokens("text")) >= 3).select(
            "doc_id", word_shingles("text").alias("shingles")
        )
        idx_sh = index_docs.filter(F.size(ws_tokens("text")) >= 3).select(
            "doc_id", word_shingles("text").alias("shingles")
        )
        idx_banded = banded_signatures(idx_sh, "doc_id", "shingles")
        index_dups = incremental_near_dups(
            batch_sh, idx_banded, idx_sh, "doc_id", "shingles"
        ).select(F.col("new_id").alias("doc_id")).distinct()

    # near-dup groups over simhash hamming<=k pairs; keeper = min of the
    # connected component (only computed for exact-survivors — the
    # expensive stage sees the smallest input)
    survivors = base.join(exact.filter("exact_keep"), "doc_id", "left_semi")
    if index_dups is not None:
        # index dups leave the batch IN FULL before intra-batch dedup:
        # excluded from the component edges AND from keeper election —
        # an index dup elected keeper would drop its whole family (its
        # non-index-dup siblings lose the election, then the keeper
        # itself is dropped as drop:index_dup)
        survivors = survivors.join(index_dups, "doc_id", "left_anti")
    # shingle features, matching the gated simhash_near_dups query: on a
    # small-vocabulary corpus unigram sets are near-identical across all
    # docs and the fingerprints collapse into false-kin mega-cliques
    from classic_fcd_spark.operators.dedup import word_shingles

    # star-aware labeling (r15 opt 2): CC over the rep-rep graph only,
    # members inherit label(rep) — same keepers, loop input invariant to
    # clique sizes (see simhash_component_labels)
    cc = simhash_component_labels(
        survivors.filter(F.size(ws_tokens("text")) >= 3).repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        ),
        "doc_id",
        word_shingles("text"),
        max_hamming=simhash_hamming,
    ).select(
        F.col("node").alias("doc_id"), (F.col("node") == F.col("label")).alias("near_keep")
    )

    # SemDeDup semantic stage (optional): paraphrase-level redundancy
    # over an embedding column — run on the docs that survive every
    # token-level dedup stage, so the cluster pair joins see the
    # smallest input (same only-shrink principle as the rest)
    sem_drop = None
    if embeddings is not None:
        from classic_fcd_spark.operators.similarity import semantic_dedup

        near_survivors = survivors.join(
            cc.filter(~F.col("near_keep")), "doc_id", "left_anti"
        )
        emb_subset = embeddings.join(
            near_survivors.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        sem_drop = (
            semantic_dedup(
                emb_subset, centroids=emb_centroids, eps=semantic_eps
            )
            .filter(~F.col("is_kept"))
            .select(F.col("vec_id").alias("doc_id"))
        )

    # final selection stage: DSIR targeted importance resampling (pick
    # the k docs most like `dsir_target` — the published data-mix
    # selector, operators/dsir.py) when requested, else the per-source
    # stratified rate mix, else keep everything.  Run over the docs
    # still standing so the model fits the distribution actually being
    # selected from.
    if dsir_target is not None and dsir_k:
        from classic_fcd_spark.operators.dsir import dsir_select

        standing = base.join(exact.filter("exact_keep"), "doc_id", "left_semi")
        if index_dups is not None:
            standing = standing.join(index_dups, "doc_id", "left_anti")
        sampled = dsir_select(
            standing.select("doc_id", "text"), dsir_target, k=dsir_k
        ).select("doc_id")
    elif sample_rates:
        sampled = stratified_sample(base, "doc_id", "source", sample_rates)
    else:
        sampled = base
    sampled = sampled.select("doc_id", F.lit(True).alias("in_sample"))

    out = (
        base.join(exact, "doc_id", "left")
        .join(cc, "doc_id", "left")
        .join(sampled, "doc_id", "left")
    )
    if sem_drop is not None:
        out = out.join(
            sem_drop.withColumn("semantic_dup", F.lit(True)), "doc_id", "left"
        )
    else:
        out = out.withColumn("semantic_dup", F.lit(False))
    if bench is not None:
        # broadcast n-gram overlap vs the eval set — the benchmark side
        # is tiny by construction, so this rides the same scan
        from classic_fcd_spark.operators.decontamination import contamination_report

        decon = contamination_report(base, bench, n=decon_ngram).select(
            "doc_id", "contaminated"
        )
        out = out.join(decon, "doc_id", "left")
    else:
        out = out.withColumn("contaminated", F.lit(False))
    if index_dups is not None:
        out = out.join(
            index_dups.withColumn("index_dup", F.lit(True)), "doc_id", "left"
        )
    else:
        out = out.withColumn("index_dup", F.lit(False))
    if lm_model_docs is not None and max_mean_nll_e6 is not None:
        # CCNet perplexity gate: mean NLL under the reference-corpus LM
        # (B-row broadcast model; one narrow shuffle — operators/lm.py)
        from classic_fcd_spark.operators.lm import unigram_nll_scores

        ppl = unigram_nll_scores(base, lm_model_docs).select(
            "doc_id", (F.col("mean_nll_e6") > max_mean_nll_e6).alias("ppl_bad")
        )
        out = out.join(ppl, "doc_id", "left")
    else:
        out = out.withColumn("ppl_bad", F.lit(False))
    # trained-classifier gate (optional): the fasttext-style keep
    # probability from broadcast weights — pure column algebra, rides
    # the same scan as the heuristic score
    mq_bad = (
        T.linear_quality_score("text", quality_weights) < min_model_quality
        if quality_weights is not None
        else F.lit(False)
    )
    out = out.withColumn(
        "__stage",
        F.when(q < min_quality, "drop:quality")
        .when(mq_bad, "drop:model_quality")
        .when(~lang_ok, "drop:lang")
        .when(~rep_ok, "drop:repetition")
        .when(F.coalesce("ppl_bad", F.lit(False)), "drop:perplexity")
        .when(F.col("contaminated"), "drop:contaminated")
        .when(F.coalesce("index_dup", F.lit(False)), "drop:index_dup")
        .when(~F.col("exact_keep"), "drop:exact_dup")
        # nodes absent from the pair graph have no cc row -> keepers
        .when(~F.coalesce("near_keep", F.lit(True)), "drop:near_dup")
        .when(F.coalesce("semantic_dup", F.lit(False)), "drop:semantic_dup")
        .when(F.col("in_sample").isNull(), "drop:sampled_out")
        .otherwise("kept"),
    )
    return out


def curation_stats(
    docs: DataFrame,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en",),
    simhash_hamming: int = 1,
    sample_rates: dict[str, float] | None = None,
    bench: DataFrame | None = None,
    decon_ngram: int = 13,
    index_docs: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    emb_centroids: list | None = None,
    semantic_eps: float = 0.05,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    cut_spans_min_len: int | None = None,
    cut_spans_k: int = 8,
    lm_model_docs: DataFrame | None = None,
    max_mean_nll_e6: int | None = None,
    quality_weights: list[float] | None = None,
    min_model_quality: float = 0.5,
) -> DataFrame:
    """The funnel: documents and tokens dropped per stage — what a
    data-mix owner reviews before a training run."""
    staged = _with_stages(
        docs, min_quality, keep_langs, simhash_hamming, sample_rates, bench,
        decon_ngram, index_docs, embeddings, emb_centroids, semantic_eps,
        dsir_target, dsir_k, cut_spans_min_len, cut_spans_k,
        lm_model_docs, max_mean_nll_e6, quality_weights, min_model_quality,
    )
    return (
        staged.groupBy("__stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(T.n_tokens("text")).alias("n_tokens"),
        )
        .withColumnRenamed("__stage", "stage")
    )
