"""Distributed BPE training (operators/bpe.py): exact merge-list
equivalence with a pure-Python reference trainer, and segmentation
equivalence doc-for-doc.
"""

from __future__ import annotations

from classic_fcd_spark.operators.bpe import (
    _EOW,
    _segment_word,
    bpe_segment,
    bpe_train,
    word_vocab,
)

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


def _ref_train(word_counts: dict[str, int], n_merges: int):
    words = {tuple(list(w) + [_EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for x, y in zip(sym, sym[1:]):
                pc[(x, y)] = pc.get((x, y), 0) + c
        if not pc:
            break
        (a, b), cnt = max(pc.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        new = {}
        for sym, c in words.items():
            out: list[str] = []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


class TestBPETrain:
    def test_merge_list_matches_python_reference(self, spark):
        docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        wc = {r["word"]: r["cnt"] for r in word_vocab(docs).collect()}
        want = _ref_train(wc, 12)
        got = bpe_train(docs, n_merges=12, checkpoint_every=4)
        assert got == want
        assert len(got) >= 8  # the planted corpus supports many merges
        # the famous Sennrich example: 'est</w>' should emerge as a unit
        joined = {a + b for a, b in got}
        assert any(s.endswith(_EOW) and len(s) > len(_EOW) for s in joined)

    def test_early_stop_when_nothing_repeats(self, spark):
        docs = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
        got = bpe_train(docs, n_merges=10)
        # every word occurs once and shares no pair: all pair counts are
        # 1 -> no merge clears the >=2 bar
        assert got == []


class TestBPESegment:
    def test_segment_matches_reference_per_doc(self, spark):
        docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        merges = bpe_train(docs, n_merges=10, checkpoint_every=4)
        out = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(docs, merges).collect()
        }
        for doc_id, text in CORPUS:
            want = []
            for w in text.split():
                want.extend(_segment_word(w, merges))
            assert out[doc_id] == want, doc_id

    def test_roundtrip_token_concat_restores_text(self, spark):
        docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        merges = bpe_train(docs, n_merges=6)
        out = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(docs, merges).collect()
        }
        for doc_id, text in CORPUS:
            restored = "".join(out[doc_id]).replace(_EOW, " ").strip()
            assert restored == text

    def test_tokenless_docs_keep_empty_arrays(self, spark):
        docs = spark.createDataFrame(
            [(0, "low low"), (1, ""), (2, "   ")], ["doc_id", "text"]
        )
        merges = bpe_train(docs, n_merges=3)
        out = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(docs, merges).collect()
        }
        assert set(out) == {0, 1, 2}  # nobody vanishes from the rebuild
        assert out[1] == [] and out[2] == []
        assert out[0] == _segment_word("low", merges) * 2

    def test_null_metadata_columns_do_not_break_the_rebuild(self, spark):
        docs = spark.createDataFrame(
            [(0, "low low", None), (1, "lower", "en")],
            "doc_id long, text string, lang string",
        )
        merges = bpe_train(docs, n_merges=3)
        out = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(docs, merges).collect()
        }
        # the NULL-lang row must keep its real tokens (the rebuild joins
        # on the id key, not on every column)
        assert out[0] == _segment_word("low", merges) * 2
        assert out[1] == _segment_word("lower", merges)
