"""Training-data pipeline extras: deterministic sampling + sequence
packing.  Sampling is cross-checked against DuckDB computing the same
md5-bucket arithmetic (oracle-style, inside pytest); packing is checked
against an independent Python reference walk.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from classic_fcd_spark.functions.text import n_tokens
from classic_fcd_spark.operators.packing import (
    pack_concat_and_cut,
    pack_greedy_next_fit,
    packing_stats,
)
from classic_fcd_spark.operators.sampling import (
    deterministic_sample,
    duck_hash_bucket,
    stratified_sample,
    temperature_mix_rates,
    temperature_mix_sample,
)
from classic_fcd_spark.session import load_tables
from tests.conftest import SF_SMALL


class TestDeterministicSampling:
    def test_matches_duckdb_bucket_arithmetic(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        got = sorted(
            r["doc_id"]
            for r in deterministic_sample(docs, "doc_id", 0.2, salt="s1")
            .select("doc_id")
            .collect()
        )
        con = duckdb.connect()
        path = os.path.join(SF_SMALL, "documents.parquet")
        want = [
            r[0]
            for r in con.sql(
                f"SELECT doc_id FROM read_parquet('{path}') "
                f"WHERE {duck_hash_bucket('doc_id', 's1')} < 200000 ORDER BY doc_id"
            ).fetchall()
        ]
        assert got == want
        assert 0 < len(got) < docs.count()  # non-trivial subset

    def test_stable_under_repartition_and_rerun(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        a = sorted(
            r["doc_id"]
            for r in deterministic_sample(docs, "doc_id", 0.1).select("doc_id").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in deterministic_sample(docs.repartition(7), "doc_id", 0.1)
            .select("doc_id")
            .collect()
        )
        assert a == b

    def test_stratified_rates_and_drops(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        strata = [r["source"] for r in docs.select("source").distinct().collect()]
        keep, drop = strata[0], strata[1]
        out = stratified_sample(docs, "doc_id", "source", {keep: 1.0})
        srcs = {r["source"] for r in out.select("source").distinct().collect()}
        assert srcs == {keep}  # absent strata dropped
        # rate 1.0 keeps the whole stratum
        assert out.count() == docs.filter(F.col("source") == keep).count()
        assert drop not in srcs


def _py_greedy(rows, budget):
    """Independent reference: greedy next-fit walk."""
    out, cur_bin, fill = {}, -1, 0
    for key, t in rows:
        if cur_bin >= 0 and fill + t <= budget:
            out[key] = (cur_bin, fill)
            fill += t
        else:
            cur_bin += 1
            out[key] = (cur_bin, 0)
            fill = t
    return out


class TestSequencePacking:
    BUDGET = 64

    def _docs(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        return docs.select("source", "doc_id", n_tokens("text").alias("n_tokens"))

    def test_concat_and_cut_is_prefix_sum(self, spark):
        packed = pack_concat_and_cut(
            self._docs(spark), "source", "doc_id", "n_tokens", self.BUDGET
        )
        rows = sorted(
            packed.collect(), key=lambda r: (r["source"], r["doc_id"])
        )
        run = {}
        for r in rows:
            before = run.get(r["source"], 0)
            assert r["bin_id"] == before // self.BUDGET
            assert r["offset"] == before % self.BUDGET
            assert r["spans_boundary"] == (r["offset"] + r["n_tokens"] > self.BUDGET)
            run[r["source"]] = before + r["n_tokens"]

    def test_greedy_matches_python_reference(self, spark):
        packed = pack_greedy_next_fit(
            self._docs(spark), "source", "doc_id", "n_tokens", self.BUDGET
        )
        got = {
            (r["source"], r["doc_id"]): (r["bin_id"], r["offset"])
            for r in packed.collect()
        }
        docs = sorted(
            self._docs(spark).collect(), key=lambda r: (r["source"], r["doc_id"])
        )
        for source in {r["source"] for r in docs}:
            rows = [(r["doc_id"], r["n_tokens"]) for r in docs if r["source"] == source]
            want = _py_greedy(rows, self.BUDGET)
            for doc_id, (b, off) in want.items():
                assert got[(source, doc_id)] == (b, off), (source, doc_id)

    def test_greedy_never_overfills_and_no_gaps(self, spark):
        packed = pack_greedy_next_fit(
            self._docs(spark), "source", "doc_id", "n_tokens", self.BUDGET
        )
        fills = (
            packed.filter(~F.col("truncated"))
            .groupBy("source", "bin_id")
            .agg(F.sum("n_tokens").alias("fill"))
            .collect()
        )
        assert fills and all(r["fill"] <= self.BUDGET for r in fills)
        # bin ids are dense per group (0..n_bins-1)
        per_group = (
            packed.groupBy("source")
            .agg(F.max("bin_id").alias("mx"), F.countDistinct("bin_id").alias("n"))
            .collect()
        )
        assert all(r["mx"] == r["n"] - 1 for r in per_group)

    def test_packing_stats_fill_ratio_bounds(self, spark):
        packed = pack_greedy_next_fit(
            self._docs(spark), "source", "doc_id", "n_tokens", self.BUDGET
        )
        stats = packing_stats(packed, "source", self.BUDGET).collect()
        assert stats
        for r in stats:
            assert 0.0 < r["fill_ratio"] <= 1.0
            # greedy next-fit guarantee: every bin but possibly the last
            # is > half full when docs fit the budget -> ratio well above 0.4
            assert r["fill_ratio"] > 0.4


class TestTemperatureMix:
    def test_t1_reproduces_natural_mix(self, spark):
        docs = load_tables(spark, SF_SMALL)["documents"]
        rates = {
            r["source"]: r["rate"]
            for r in temperature_mix_rates(docs, "source", 1.0).collect()
        }
        assert rates and all(abs(v - 1.0) < 1e-12 for v in rates.values())

    def test_rates_match_duckdb_arithmetic(self, spark):
        T = 2.0
        docs = load_tables(spark, SF_SMALL)["documents"]
        got = {
            r["source"]: r["rate"]
            for r in temperature_mix_rates(docs, "source", T).collect()
        }
        path = os.path.join(SF_SMALL, "documents.parquet")
        want = {
            r[0]: r[1]
            for r in duckdb.sql(
                f"""
                WITH c AS (
                    SELECT source, count(*)::DOUBLE AS n FROM read_parquet('{path}')
                    GROUP BY source
                ),
                w AS (
                    SELECT source, n, pow(n / (SELECT sum(n) FROM c), 1.0/{T}) AS w
                    FROM c
                ),
                rel AS (
                    SELECT source, (w / (SELECT sum(w) FROM w)) / n AS gain FROM w
                )
                SELECT source, gain / (SELECT max(gain) FROM rel) FROM rel
                """
            ).fetchall()
        }
        assert set(got) == set(want)
        for s in got:
            assert abs(got[s] - want[s]) < 1e-9, s

    def test_high_temperature_flattens_the_mix(self, spark):
        # the sf0.001 fixture mix is uniform — build a skewed corpus
        # (800 web / 150 books / 50 code) so there is skew to flatten
        docs = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 800, "web")
            .when(F.col("id") < 950, "books")
            .otherwise("code")
            .alias("source"),
        )
        natural = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        mixed = {
            r["source"]: r["n"]
            for r in temperature_mix_sample(docs, "doc_id", "source", 50.0)
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # ratio between the biggest and smallest source must shrink
        def spread(d):
            return max(d.values()) / min(d.values())

        assert spread(mixed) < spread(natural)
        # the most-upweighted (smallest) source keeps every row
        smallest = min(natural, key=natural.get)
        assert mixed[smallest] == natural[smallest]


class TestGroupedReservoir:
    def test_k_per_group_deterministic_and_uniformish(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.sampling import grouped_reservoir_sample
        from classic_fcd_spark.session import load_tables
        from tests.conftest import SF_MEDIUM

        docs = load_tables(spark, SF_MEDIUM)["documents"]
        k = 5
        a = grouped_reservoir_sample(docs, "source", "doc_id", k)
        b = grouped_reservoir_sample(docs, "source", "doc_id", k)
        rows_a = {(r["source"], r["doc_id"]) for r in a.collect()}
        rows_b = {(r["source"], r["doc_id"]) for r in b.collect()}
        assert rows_a == rows_b  # deterministic under re-run
        per_group = (
            a.groupBy("source").agg(F.count("*").alias("n")).collect()
        )
        sizes = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for r in per_group:
            assert r["n"] == min(k, sizes[r["source"]])
        # stable under repartitioning (hash ranks don't depend on layout)
        c = grouped_reservoir_sample(docs.repartition(7), "source", "doc_id", k)
        assert {(r["source"], r["doc_id"]) for r in c.collect()} == rows_a
        # matches the reference selection: k smallest md5(doc_id) per source
        import hashlib

        by_src: dict[str, list[tuple[str, int]]] = {}
        for r in docs.select("source", "doc_id").collect():
            by_src.setdefault(r["source"], []).append(
                (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"])
            )
        expected = {
            (src, did)
            for src, lst in by_src.items()
            for _, did in sorted(lst)[:k]
        }
        assert rows_a == expected


class TestKeepTopFraction:
    def test_per_group_fraction_and_ordering(self, spark):
        from classic_fcd_spark.operators.sampling import keep_top_fraction

        rows = [(f"s{g}", i, float(i + 100 * g)) for g in range(3) for i in range(200)]
        df = spark.createDataFrame(rows, ["source", "i", "score"])
        kept = keep_top_fraction(df, "score", 0.25, by_col="source").collect()
        by_src = {}
        for r in kept:
            by_src.setdefault(r["source"], []).append(r["score"])
        for g in range(3):
            scores = by_src[f"s{g}"]
            # fraction within sketch tolerance (exact here: accuracy >> n)
            assert 50 <= len(scores) <= 52, len(scores)
            # kept set = the TOP scores of that group, contiguously
            assert min(scores) >= 100 * g + 148

    def test_lower_is_better_keeps_low_scores(self, spark):
        from classic_fcd_spark.operators.sampling import keep_top_fraction

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], ["i", "ppl"]
        )
        kept = [r["ppl"] for r in keep_top_fraction(
            df, "ppl", 0.1, higher_is_better=False
        ).collect()]
        assert max(kept) <= 10.0 and len(kept) >= 10

    def test_no_global_sort_in_plan(self, spark):
        from classic_fcd_spark.operators.sampling import keep_top_fraction

        df = spark.createDataFrame([(f"s{i%3}", float(i)) for i in range(50)], ["source", "score"])
        plan = (
            keep_top_fraction(df, "score", 0.5, by_col="source")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # threshold via sketch aggregate + broadcast join: no rank
        # window, no range-partitioned global sort of the fact side
        assert "windowspecdefinition" not in plan
        assert "rangepartitioning" not in plan.lower()


class TestWeightedReservoir:
    def test_matches_python_reference_exactly(self, spark):
        import hashlib
        import math

        from classic_fcd_spark.operators.sampling import weighted_reservoir_sample

        rows = [(f"g{i % 2}", i, float(1 + (i % 7))) for i in range(60)]
        df = spark.createDataFrame(rows, ["grp", "id", "w"])
        got = {
            (r["grp"], r["id"])
            for r in weighted_reservoir_sample(df, "grp", "id", "w", k=5).collect()
        }

        def race(i, wt):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            u = (h + 0.5) / float(1 << 60)
            return -math.log(u) / wt

        want = set()
        for g in ("g0", "g1"):
            grp = [(gg, i, wt) for gg, i, wt in rows if gg == g]
            for gg, i, wt in sorted(grp, key=lambda r: (race(r[1], r[2]), r[1]))[:5]:
                want.add((gg, i))
        assert got == want

    def test_weights_bias_inclusion(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.sampling import weighted_reservoir_sample

        # one group, half the rows carry 20x the weight; across many
        # disjoint salt draws the heavy half must dominate the sample
        rows = [("g", i, 20.0 if i % 2 == 0 else 1.0) for i in range(200)]
        df = spark.createDataFrame(rows, ["grp", "id", "w"])
        heavy = 0
        for s in range(10):
            picked = weighted_reservoir_sample(
                df, "grp", "id", "w", k=20, salt=f"s{s}"
            ).collect()
            heavy += sum(1 for r in picked if r["w"] == 20.0)
        # E[heavy fraction] ~ 0.9+; require a clear majority
        assert heavy / 200 > 0.75

    def test_nonpositive_weights_never_qualify_and_short_groups_whole(self, spark):
        from classic_fcd_spark.operators.sampling import weighted_reservoir_sample

        rows = [("g", 0, 1.0), ("g", 1, 0.0), ("g", 2, -3.0), ("g", 3, None), ("g", 4, 2.0)]
        df = spark.createDataFrame(rows, "grp string, id long, w double")
        got = sorted(
            r["id"] for r in weighted_reservoir_sample(df, "grp", "id", "w", k=10).collect()
        )
        assert got == [0, 4]

    def test_nan_weights_never_qualify(self, spark):
        from classic_fcd_spark.operators.sampling import weighted_reservoir_sample

        rows = [("g", 0, 1.0), ("g", 1, float("nan")), ("g", 2, 2.0)]
        df = spark.createDataFrame(rows, "grp string, id long, w double")
        got = sorted(
            r["id"]
            for r in weighted_reservoir_sample(df, "grp", "id", "w", k=5).collect()
        )
        assert got == [0, 2]
