"""Property-based check of the prefix-filtered exact Jaccard join
(ngram_jaccard_pairs' PPJoin-style plan) against a brute-force all-pairs
Python reference — the prefix-length and size-ratio math is the riskiest
part of the rewrite, and randomized corpora probe exactly the boundary
cases (sets right at the 0.8 threshold, ties in the canonical order,
size ratios at 5·min = 4·max) where an off-by-one silently loses pairs.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocabulary forces heavy overlap -> many near-threshold pairs
_words = st.sampled_from([f"w{i}" for i in range(8)])
_doc = st.lists(_words, min_size=3, max_size=10)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _shingles(tokens: list[str], n: int = 3) -> frozenset:
    return frozenset(
        " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def _brute_pairs(docs: list[list[str]], t: float = 0.8) -> set:
    sh = {i: _shingles(d) for i, d in enumerate(docs)}
    out = set()
    for i, j in itertools.combinations(sorted(sh), 2):
        a, b = sh[i], sh[j]
        if not a or not b:
            continue
        inter = len(a & b)
        uni = len(a | b)
        if uni and inter / uni >= t:
            out.add((i, j, inter, uni))
    return out


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_prefix_filter_is_lossless(spark, corpus):
    """Every pair with exact Jaccard >= 0.8 must survive the prefix
    filter + size-ratio prune — no false negatives, and verification
    kills every false positive."""
    import pandas as pd

    from classic_fcd_spark.queries import dedup as Q

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(corpus)),
            "text": [" ".join(d) for d in corpus],
            "lang": "en",
            "source": "prop",
            "n_chars": [len(" ".join(d)) for d in corpus],
        }
    )
    sf_dir = None  # not used: we monkey-load via a temp view

    # run the registered query body against this corpus by writing it
    # through the same load_tables contract (temp parquet dir)
    import os
    import tempfile

    with tempfile.TemporaryDirectory(prefix="jacc_prop_") as d:
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(d, "documents.parquet")
        )
        got = {
            (r["i"], r["j"], r["inter"], r["uni"])
            for r in Q.ngram_jaccard_pairs(spark, d).collect()
        }
    assert got == _brute_pairs(corpus)
