"""Property-based check of span-level exact-substring dedup
(operators/spans.duplicated_spans) against a brute-force Python
reference — random small-vocab corpora concentrate duplicated windows
and probe the merge boundary (gap exactly k vs k+1) and the
within-doc-repeat semantics where an off-by-one silently splits or
glues spans.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from classic_fcd_spark.operators.spans import duplicated_spans

K = 3  # small window so short random docs produce duplicated positions

_words = st.sampled_from([f"w{i}" for i in range(4)])
_doc = st.lists(_words, min_size=1, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _brute_spans(docs: list[list[str]], k: int = K) -> set:
    # 1) every k-window with its corpus-wide occurrence count
    grams: dict[str, int] = {}
    pos: list[tuple[int, int]] = []  # (doc, 1-based start)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            grams[g] = grams.get(g, 0) + 1
            pos.append((d, i + 1, g))
    dup = [(d, p) for d, p, g in pos if grams[g] >= 2]
    # 2) merge per doc: adjacent-or-overlapping (gap <= k)
    out = set()
    by_doc: dict[int, list[int]] = {}
    for d, p in dup:
        by_doc.setdefault(d, []).append(p)
    for d, ps in by_doc.items():
        ps.sort()
        start = prev = ps[0]
        n_grams = 1
        for p in ps[1:]:
            if p - prev <= k:
                prev = p
                n_grams += 1
            else:
                out.add((d, start, prev + k - 1, prev + k - 1 - start + 1, n_grams))
                start = prev = p
                n_grams = 1
        out.add((d, start, prev + k - 1, prev + k - 1 - start + 1, n_grams))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus)
def test_spans_match_brute_force(spark, corpus):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"], r["n_grams"])
        for r in duplicated_spans(df, k=K).collect()
    }
    assert got == _brute_spans(corpus)
