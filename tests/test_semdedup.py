"""Semantic dedup (SemDeDup, Abbas et al. 2023) contracts.

1. Planted paraphrase groups collapse to one keeper each; the keeper is
   the member FARTHEST from its cluster centroid (the paper's criterion:
   keep the edge example, drop prototypical interior ones).
2. Full equivalence vs an independent pure-Python reference (numpy-free
   sequential folds matching Spark's aggregate order) on the real
   embeddings table with a pinned codebook.
3. Plan: the pair search must be an equi-join on the cluster id — no
   BroadcastNestedLoopJoin / CartesianProduct over the corpus.
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _reference(rows, centroids, eps):
    """Pure-Python SemDeDup: argmax-cosine assignment, within-cell pair
    graph at cos >= 1-eps, union-find components, keeper = min (cos_c, id)."""
    assigned = {}
    for vid, vec in rows:
        best = max(
            ((_cos(vec, c), cid) for cid, c in enumerate(centroids)),
            key=lambda t: (t[0], t[1]),
        )
        assigned[vid] = (best[1], best[0], vec)
    parent = {vid: vid for vid in assigned}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(assigned)
    for i, vi in enumerate(ids):
        for vj in ids[i + 1 :]:
            if assigned[vi][0] != assigned[vj][0]:
                continue
            if _cos(assigned[vi][2], assigned[vj][2]) >= 1.0 - eps:
                ra, rb = find(vi), find(vj)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for vid in ids:
        groups.setdefault(find(vid), []).append(vid)
    out = {}
    for label, members in groups.items():
        keeper = min(members, key=lambda v: (assigned[v][1], v))
        for v in members:
            out[v] = (assigned[v][0], keeper, v == keeper)
    return out


class TestSemanticDedup:
    def test_planted_groups_collapse_keeper_is_edge_member(self, spark):
        from classic_fcd_spark.operators.similarity import semantic_dedup

        # two well-separated prototype directions in dim 4
        protos = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
        rows = [
            # cluster 0: ids 0,1,2 near-identical paraphrases; 2 is the
            # most perturbed (lowest cos to centroid) -> the keeper
            (0, [1.0, 0.01, 0.0, 0.0]),
            (1, [1.0, 0.02, 0.0, 0.0]),
            (2, [1.0, 0.08, 0.0, 0.0]),
            # cluster 0 singleton: same cell, not a near-dup
            (3, [0.8, 0.0, 0.6, 0.0]),
            # cluster 1: ids 10,11 a pair; 12 singleton
            (10, [0.0, 1.0, 0.01, 0.0]),
            (11, [0.0, 1.0, 0.03, 0.0]),
            (12, [0.0, 0.8, 0.0, 0.6]),
        ]
        emb = spark.createDataFrame(
            [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
        )
        got = {
            r["vec_id"]: (r["cell"], r["keeper_id"], r["is_kept"])
            for r in semantic_dedup(emb, centroids=protos, eps=0.01).collect()
        }
        assert len(got) == len(rows)
        # group {0,1,2}: keeper is 2 (largest perturbation = lowest cos_c)
        assert got[0] == (0, 2, False)
        assert got[1] == (0, 2, False)
        assert got[2] == (0, 2, True)
        assert got[3][2] is True  # singleton kept
        assert got[10] == (1, 11, False)
        assert got[11] == (1, 11, True)
        assert got[12][2] is True
        expected = _reference([(i, v) for i, v in rows], protos, 0.01)
        assert got == expected

    def test_matches_python_reference_on_real_embeddings(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.similarity import semantic_dedup
        from classic_fcd_spark.session import load_tables

        emb = load_tables(spark, SF_SMALL)["embeddings"]
        # pinned codebook: first 8 vectors (deterministic, same on both
        # sides) — the trained path swaps in kmeans_train without
        # touching the dedup plumbing
        cents = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        eps = 0.55  # loose: the synthetic corpus has weak (~0.45) kin
        got = {
            r["vec_id"]: (r["cell"], r["keeper_id"], r["is_kept"])
            for r in semantic_dedup(emb, centroids=cents, eps=eps).collect()
        }
        rows = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.select("vec_id", "embedding").collect()
        ]
        expected = _reference(rows, cents, eps)
        assert got == expected
        dropped = [v for v, (_, _, kept) in got.items() if not kept]
        assert len(dropped) > 0  # the corpus must actually exercise the path

    def test_incremental_probe_matches_full_cross_split_pairs(self, spark):
        """incremental_semantic_pairs (new batch vs stored assignment
        index) must find exactly the cross-split subset of the full
        corpus's within-cell pair graph — the same equivalence contract
        the MinHash incremental path carries
        (tests/test_incremental_dedup.py)."""
        import math as _math

        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.similarity import (
            assign_cells,
            incremental_semantic_pairs,
        )
        from classic_fcd_spark.session import load_tables

        emb = load_tables(spark, SF_SMALL)["embeddings"]
        cents = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        eps = 0.55
        split = emb.agg(F.expr("max(vec_id) div 2")).collect()[0][0]
        index = assign_cells(emb.filter(F.col("vec_id") < split), cents)
        new = emb.filter(F.col("vec_id") >= split)
        got = {
            (r["new_id"], r["dup_of"]): r["cos_e6"]
            for r in incremental_semantic_pairs(new, index, cents, eps=eps).collect()
        }
        # reference: full pure-Python assignment + cross-split pair scan
        rows = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.select("vec_id", "embedding").collect()
        ]
        cell_of = {}
        for vid, vec in rows:
            best = max(
                ((_cos(vec, c), cid) for cid, c in enumerate(cents)),
                key=lambda t: (t[0], t[1]),
            )
            cell_of[vid] = best[1]
        vecs = dict(rows)
        expected = {}
        for nid, nvec in rows:
            if nid < split:
                continue
            for xid, xvec in rows:
                if xid >= split or cell_of[nid] != cell_of[xid]:
                    continue
                c = _cos(nvec, xvec)
                if c >= 1.0 - eps:
                    expected[(nid, xid)] = _math.floor(c * 1e6)
        assert got == expected
        assert len(got) > 0  # the corpus must exercise the probe

    def test_incremental_probe_plan_is_cell_equi_join(self, spark):
        from pyspark.sql import functions as F

        from classic_fcd_spark.operators.similarity import (
            assign_cells,
            incremental_semantic_pairs,
        )
        from classic_fcd_spark.session import load_tables

        emb = load_tables(spark, SF_SMALL)["embeddings"]
        cents = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        index = assign_cells(emb.filter(F.col("vec_id") < 1000), cents)
        out = incremental_semantic_pairs(
            emb.filter(F.col("vec_id") >= 1000), index, cents
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # probe x index must be the cell equi-join; the only BNLJ is the
        # constant-bounded broadcast codebook cross of assignment
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "BuildRight" in line, line

    def test_pair_search_is_cell_equi_join(self, spark):
        from classic_fcd_spark.operators.similarity import semantic_dedup
        from classic_fcd_spark.session import load_tables

        emb = load_tables(spark, SF_SMALL)["embeddings"]
        from pyspark.sql import functions as F

        cents = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ]
        out = semantic_dedup(emb, centroids=cents, eps=0.55)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the corpus x corpus pair search must be a shuffled EQUI-join on
        # the cell id — the only nested-loop joins allowed are the
        # broadcast k-row codebook crosses of the assignment projection
        # (constant-bounded; they appear once per unpersisted lineage
        # branch in the printed plan)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert "BuildRight" in line, line
