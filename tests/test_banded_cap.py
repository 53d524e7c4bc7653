"""Band-group cap for the minhash LSH self-join (VERDICT r13 item 2).

The r13 sf10 strict run OOM'd inside the band self-join at the default
8 GB driver and was worked around with 64 GB — vertical scaling.  r14
bounds the join's per-task working set instead: `capped_band_self_join`
splits any (band, bh) bucket larger than `max_group` into ⌈n/K⌉
sub-groups by a secondary hash and joins sub-group PAIRS, so the
buffered group per task is ≤ ~K rows regardless of corpus shape.

These tests pin the three claims SCALE.md §"Band-group cap" makes:
1. Exactness on the adversarial corpus: n identical docs emit exactly
   C(n, 2) candidate pairs through the capped join.
2. The bound: no (band, bh, sub-group) cell exceeds max_group by more
   than hash-spread slack, even when every doc shares every band.
3. Capped and uncapped plans emit identical pair sets on a mixed
   corpus, and the G=1 degenerate path engages (zero replication) when
   no bucket exceeds the cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from classic_fcd_spark.operators.dedup import (
    MAX_BAND_GROUP,
    banded_signatures,
    capped_band_self_join,
    lsh_candidate_pairs,
    word_shingles,
)

N_IDENTICAL = 600
CAP = 50  # small cap so the adversarial corpus splits into G = 12 sub-groups


@pytest.fixture(scope="module")
def identical_docs(spark):
    """The adversarial corpus: every doc byte-identical, so every band
    bucket holds ALL docs — the exact shape that melts an uncapped
    self-join's buffered group."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    return spark.range(N_IDENTICAL).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


@pytest.fixture(scope="module")
def identical_shingled(identical_docs):
    return identical_docs.select(
        "doc_id", word_shingles("text").alias("shingles")
    )


# slow tier (r16): the two adversarial corpora cost ~56 s together
@pytest.mark.slow
class TestAdversarialExactness:
    def test_all_identical_corpus_emits_all_pairs(self, identical_shingled):
        n_pairs = lsh_candidate_pairs(
            identical_shingled, "doc_id", "shingles", max_band_group=CAP
        ).count()
        assert n_pairs == N_IDENTICAL * (N_IDENTICAL - 1) // 2

    def test_capped_equals_uncapped_on_mixed_corpus(self, spark):
        # 40 clones of one doc (over the cap of 8), plus distinct docs,
        # plus a second smaller clone family under the cap.
        rows = (
            [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
            + [(100 + i, f"unique document number {i} with its own tail {i * 7}") for i in range(30)]
            + [(200 + i, "shared small family text one two three four") for i in range(5)]
        )
        docs = spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", word_shingles("text").alias("shingles")
        )
        capped = lsh_candidate_pairs(docs, "doc_id", "shingles", max_band_group=8)
        uncapped = lsh_candidate_pairs(
            docs, "doc_id", "shingles", max_band_group=10**9
        )
        assert sorted(map(tuple, capped.collect())) == sorted(
            map(tuple, uncapped.collect())
        )


class TestBound:
    def test_no_subgroup_exceeds_cap_with_slack(self, identical_shingled):
        """Reconstruct the salted key exactly as capped_band_self_join
        builds it and assert the per-(band, bh, sub-group) cell count —
        the buffered-group bound — never exceeds the cap by more than
        hash-spread slack (xxhash64 mod G is uniform, not perfect)."""
        from pyspark.sql import Window

        banded = banded_signatures(identical_shingled, "doc_id", "shingles")
        w = Window.partitionBy("band", "bh")
        g_total = F.greatest(F.lit(1), F.ceil(F.count("*").over(w) / F.lit(CAP))).cast(
            "int"
        )
        cells = (
            banded.select(
                "band",
                "bh",
                F.pmod(F.xxhash64(F.col("doc_id")), g_total).alias("g"),
            )
            .groupBy("band", "bh", "g")
            .count()
        )
        max_cell = cells.agg(F.max("count")).first()[0]
        assert max_cell <= int(CAP * 1.8), (
            f"buffered-group bound violated: {max_cell} > {CAP} * slack"
        )

    def test_degenerate_path_zero_replication(self, spark):
        """Buckets under the cap: G = 1, so the salted table has exactly
        one row per banded row (no explode inflation)."""
        rows = [(i, f"doc {i} text body {i * 3} tail") for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", word_shingles("text").alias("shingles")
        )
        banded = banded_signatures(docs, "doc_id", "shingles")
        n_banded = banded.count()
        pairs = capped_band_self_join(
            banded, "doc_id", ["band", "bh"], MAX_BAND_GROUP
        )
        # Count the left-side exploded rows by re-deriving the explode:
        # with every bucket ≤ cap, sequence(0, G-1) = [0] everywhere.
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bh")
        g_total = F.greatest(
            F.lit(1), F.ceil(F.count("*").over(w) / F.lit(MAX_BAND_GROUP))
        ).cast("int")
        exploded = (
            banded.select(g_total.alias("gt"))
            .select(F.explode(F.sequence(F.lit(0), F.col("gt") - 1)).alias("g"))
            .count()
        )
        assert exploded == n_banded
        pairs.count()  # plan executes end-to-end

    def test_salt_in_executed_plan(self, identical_shingled):
        df = lsh_candidate_pairs(
            identical_shingled, "doc_id", "shingles", max_band_group=CAP
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "__ga" in plan and "__gb" in plan

    def test_adaptive_direct_path_has_no_salt(self, spark):
        """Honest corpus (every bucket ≤ cap): the adaptive dispatch must
        pick the ORIGINAL direct self-join — zero added shuffles, no salt
        columns (the always-on window variant measured 2.08× on the
        sf0.1 minhash bench row)."""
        rows = [(i, f"doc {i} text body {i * 3} tail word{i}") for i in range(50)]
        docs = spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", word_shingles("text").alias("shingles")
        )
        df = lsh_candidate_pairs(docs, "doc_id", "shingles")  # default cap
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "__ga" not in plan and "__gb" not in plan
