"""DSIR importance-resampling contracts (Xie et al. 2023).

1. Planted-mixture enrichment: selecting from a raw corpus of
   target-like and off-target docs must prefer the target-like ones.
2. Full equivalence vs an independent pure-Python reference (hashlib
   md5 buckets, same smoothing, same Gumbel construction) on the real
   documents table.
3. Plan: the log-ratio join is a broadcast equi-join; no cartesian.
"""

from __future__ import annotations

import hashlib
import math
import re

from tests.conftest import SF_SMALL

_B = 256


def _buckets(text: str, n: int = 2, buckets: int = _B) -> list[int]:
    toks = re.split(" +", text.strip())
    if len(toks) < n:
        return []
    return [
        int(hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()[:15], 16)
        % buckets
        for i in range(len(toks) - n + 1)
    ]


def _log_probs(texts: list[str], buckets: int = _B) -> dict[int, float]:
    cnt: dict[int, int] = {}
    for t in texts:
        for b in _buckets(t, buckets=buckets):
            cnt[b] = cnt.get(b, 0) + 1
    total = sum(cnt.values())
    return {
        b: math.log((cnt.get(b, 0) + 1) / (total + buckets)) for b in range(buckets)
    }


def _scores(raw: list[tuple[int, str]], target_texts: list[str]) -> dict[int, float]:
    lp_t = _log_probs(target_texts)
    lp_r = _log_probs([t for _, t in raw])
    out = {}
    for did, t in raw:
        s = 0.0
        for b in _buckets(t):
            s += lp_t[b] - lp_r[b]
        out[did] = s
    return out


def _gumbel(did: int, salt: str = "dsir") -> float:
    h = int(hashlib.md5((salt + str(did)).encode()).hexdigest()[:15], 16)
    u = (float(h) + 0.5) / float(1 << 60)
    return -math.log(-math.log(u))


class TestDsir:
    def test_planted_mixture_selects_target_like_docs(self, spark):
        from classic_fcd_spark.operators.dsir import dsir_select

        wiki = "the quick brown fox jumps over the lazy dog near the river bank"
        spam = "buy now cheap deals click here win prizes free offer act fast"
        target = spark.createDataFrame(
            [(i, wiki + f" extra{i}") for i in range(5)], "doc_id long, text string"
        )
        raw_rows = [(i, wiki + f" tail{i}") for i in range(10)] + [
            (100 + i, spam + f" tail{i}") for i in range(10)
        ]
        raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
        picked = {
            r["doc_id"] for r in dsir_select(raw, target, k=8).collect()
        }
        assert len(picked) == 8
        # at least 7 of 8 picks are target-like (Gumbel noise allows the
        # occasional off-target pick by design — it is a sampler, not an
        # argmax; scores here differ by tens of nats so slack 1)
        assert len([d for d in picked if d < 100]) >= 7

    def test_matches_python_reference_on_documents(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.dsir import dsir_scores, dsir_select
        from classic_fcd_spark.session import load_tables

        docs = load_tables(spark, SF_SMALL)["documents"]
        target = docs.filter(F.col("source") == "src0").select("doc_id", "text")
        raw = docs.filter(F.col("source") != "src0").select("doc_id", "text")
        got = {
            r["doc_id"]: r["score"]
            for r in dsir_scores(raw, target).collect()
        }
        raw_rows = [(r["doc_id"], r["text"]) for r in raw.collect()]
        target_texts = [r["text"] for r in target.collect()]
        expected = _scores(raw_rows, target_texts)
        assert set(got) == set(expected)
        for did, s in expected.items():
            assert abs(got[did] - s) < 1e-9, (did, got[did], s)
        # selection equivalence (score + deterministic Gumbel top-k)
        k = 50
        sel = [r["doc_id"] for r in dsir_select(raw, target, k=k).collect()]
        exp_sel = sorted(
            expected, key=lambda d: (-(expected[d] + _gumbel(d)), d)
        )[:k]
        assert sel == exp_sel
        assert len(set(sel)) == k

    def test_score_plan_broadcasts_model_no_cartesian(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.dsir import dsir_scores
        from classic_fcd_spark.session import load_tables

        docs = load_tables(spark, SF_SMALL)["documents"]
        target = docs.filter(F.col("source") == "src0").select("doc_id", "text")
        raw = docs.filter(F.col("source") != "src0").select("doc_id", "text")
        plan = (
            dsir_scores(raw, target)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # the B-row log-ratio model
