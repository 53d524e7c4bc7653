"""Guards for the sf-scale corpus builder's variety lane (r13, VERDICT
r12 item 3): the per-copy mutations must be RECALL-PRESERVING — within-
copy similarity exactly preserved, cross-copy similarity eliminated —
or the variety bench lane measures a different workload, not the same
workload without clone inflation.  pyarrow-only (the builder itself is
Spark-free) so these run in milliseconds.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lanes(tmp_path_factory):
    """Build 2-copy clone and variety corpora from the sf0.001 source."""
    base = tmp_path_factory.mktemp("lanes")
    out = {}
    for lane, flag in (("clone", []), ("variety", ["--variety"])):
        d = str(base / lane)
        r = subprocess.run(
            [sys.executable, "scripts/make_sf_scale.py", d, "2", *flag],
            cwd=REPO,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001"},
            capture_output=True,
            text=True,
        )
        assert r.returncode == 0, r.stderr
        out[lane] = d
    return out


def _docs(d):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(d, "documents.parquet")).to_pandas()


class TestVarietyLane:
    def test_row_counts_match_clone_lane(self, lanes):
        import pyarrow.parquet as pq

        for t in ("documents", "embeddings", "orders", "lineitem", "events"):
            n = [
                pq.read_metadata(os.path.join(lanes[k], f"{t}.parquet")).num_rows
                for k in ("clone", "variety")
            ]
            assert n[0] == n[1] > 0, t

    def test_token_bijection_preserves_within_copy_jaccard(self, lanes):
        df = _docs(lanes["variety"])
        off = 10**7
        base = df[df.doc_id < off].set_index("doc_id")
        copy1 = df[df.doc_id >= off].set_index(df[df.doc_id >= off].doc_id - off)

        def jac(a, b):
            sa, sb = set(a.split()), set(b.split())
            return len(sa & sb) / len(sa | sb)

        ids = sorted(base.index)[:40]
        for i, j in zip(ids, ids[1:]):
            assert jac(base.text[i], base.text[j]) == pytest.approx(
                jac(copy1.text[i], copy1.text[j])
            ), (i, j)

    def test_cross_copy_vocabularies_are_disjoint(self, lanes):
        df = _docs(lanes["variety"])
        off = 10**7
        v0 = set(" ".join(df[df.doc_id < off].text.head(50)).split())
        v1 = set(" ".join(df[df.doc_id >= off].text.head(50)).split())
        assert not (v0 & v1)

    def test_n_chars_metadata_consistent(self, lanes):
        df = _docs(lanes["variety"])
        sample = df.sample(100, random_state=1)
        assert (sample.text.str.len() == sample.n_chars).all()

    def test_signed_permutation_preserves_within_copy_cosine(self, lanes):
        import numpy as np
        import pyarrow.parquet as pq

        e = pq.read_table(
            os.path.join(lanes["variety"], "embeddings.parquet")
        ).to_pandas()
        off = 10**7
        m0 = np.stack(e[e.vec_id < off].sort_values("vec_id").embedding.to_numpy())
        m1 = np.stack(e[e.vec_id >= off].sort_values("vec_id").embedding.to_numpy())
        n = min(40, len(m0))
        g0, g1 = m0[:n] @ m0[:n].T, m1[:n] @ m1[:n].T
        # orthogonal transform: gram matrix preserved to fp noise
        assert float(abs(g0 - g1).max()) < 1e-4
        # cross-copy clones decorrelate (|cos| well below near-dup bands)
        cos = (m0[:n] * m1[:n]).sum(1) / (
            np.linalg.norm(m0[:n], axis=1) * np.linalg.norm(m1[:n], axis=1)
        )
        assert float(abs(cos).max()) < 0.45

    def test_clone_lane_is_byte_identical_per_copy(self, lanes):
        df = _docs(lanes["clone"])
        off = 10**7
        base = df[df.doc_id < off].sort_values("doc_id")
        copy1 = df[df.doc_id >= off].sort_values("doc_id")
        assert list(base.text) == list(copy1.text)
