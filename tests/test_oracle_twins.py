"""Small-scale independence twins for the two COLLAPSED group oracles
(r15, VERDICT r14 item 6).

Commit e5980e4 rewrote the DuckDB oracles of `near_dup_groups` and
`semantic_dedup` to run their transitive closures over DISTINCT
fingerprints (doc-level closure is multiplicity-quadratic; >1 h at
sf10), which means the oracle and the Spark plan now SHARE the collapse
assumption — a conceptual bug in "labeling is provably identical" would
pass both engines.  These tests retain independence where it is
affordable: at sf0.001/sf0.01 (and on a planted clone corpus with
guaranteed multi-member groups) the collapsed oracle must produce the
exact result set of the ORIGINAL doc-level formulation, recomputed here
verbatim from the pre-collapse SQL.  Pure DuckDB-vs-DuckDB — no Spark
involvement, so the check is independent of the product plans entirely.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_MEDIUM, SF_SMALL

# --- doc-level (pre-e5980e4) formulations, verbatim -----------------------


def _doc_level_near_dup_groups_sql() -> str:
    from classic_fcd_spark.operators.dedup import duck_simhash32_cte
    from classic_fcd_spark.queries.dedup import _D_TOKS, _SH

    return f"""
    WITH RECURSIVE {duck_simhash32_cte(_SH, f"documents WHERE len({_D_TOKS}) >= 3")},
    banded AS (
        SELECT doc_id, simhash, b, (simhash // d) % 256 AS byte
        FROM sh, (SELECT unnest([0, 1, 2, 3]) AS b, unnest([1, 256, 65536, 16777216]) AS d)
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS i, r.doc_id AS j
        FROM banded l JOIN banded r ON l.b = r.b AND l.byte = r.byte AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.simhash, r.simhash)) <= 1
    ),
    edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
    reach(node, label) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, reach.label FROM reach JOIN edges e ON reach.node = e.a
    )
    SELECT node AS doc_id, MIN(label) AS keeper_doc_id
    FROM reach GROUP BY node
    """


def _doc_level_semantic_dedup_sql() -> str:
    from classic_fcd_spark.queries.similarity import (
        _DUCK_NC,
        _DUCK_VN,
        _SEM_K,
        _SEM_THRESH,
        DIM,
    )

    return f"""
    WITH RECURSIVE cents AS (
        SELECT vec_id AS cid, embedding AS ce FROM embeddings
        WHERE vec_id < {_SEM_K}
    ),
    cn AS (SELECT cid, ce, {_DUCK_NC} AS nc FROM cents),
    vn AS (SELECT vec_id, embedding, {_DUCK_VN} AS nv FROM embeddings),
    scored AS (
        SELECT v.vec_id, v.embedding, v.nv, c.cid,
               list_sum([CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)
                         for i in range(1, {DIM + 1})]) / (v.nv * c.nc) AS cos
        FROM vn v CROSS JOIN cn c
    ),
    assigned AS (
        SELECT vec_id, embedding, nv, cid AS cell, cos AS cos_c
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY cos DESC, cid DESC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS i, b.vec_id AS j
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                        for i in range(1, {DIM + 1})]) / (a.nv * b.nv) >= {_SEM_THRESH!r}
    ),
    edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
    reach(node, label) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.b, reach.label FROM reach JOIN edges e ON reach.node = e.a
    ),
    comp AS (SELECT node, MIN(label) AS label FROM reach GROUP BY node),
    members AS (
        SELECT a.vec_id, a.cell, a.cos_c, COALESCE(c.label, a.vec_id) AS group_id
        FROM assigned a LEFT JOIN comp c ON a.vec_id = c.node
    ),
    keep AS (
        SELECT group_id, vec_id AS keeper_id
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY group_id
                                           ORDER BY cos_c ASC, vec_id ASC) AS rn
              FROM members)
        WHERE rn = 1
    )
    SELECT m.vec_id, m.cell, m.group_id, k.keeper_id,
           m.vec_id = k.keeper_id AS is_kept
    FROM members m JOIN keep k USING (group_id)
    """


def _con_for(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="module")
def clone_dir(tmp_path_factory):
    """5-copy clone of the sf0.001 documents + embeddings — every doc /
    vector belongs to a multi-member group, so the collapsed oracles'
    member-expansion and self-link legs are all load-bearing."""
    d = str(tmp_path_factory.mktemp("oracle_twin_clones"))
    docs = pq.read_table(os.path.join(SF_SMALL, "documents.parquet"))
    emb = pq.read_table(os.path.join(SF_SMALL, "embeddings.parquet"))
    copies = 5
    doc_parts, emb_parts = [], []
    for c in range(copies):
        dd = docs.to_pydict()
        dd["doc_id"] = [int(x) + c * 10_000_000 for x in dd["doc_id"]]
        doc_parts.append(pa.table(dd, schema=docs.schema))
        ee = emb.to_pydict()
        ee["vec_id"] = [int(x) + c * 10_000_000 for x in ee["vec_id"]]
        emb_parts.append(pa.table(ee, schema=emb.schema))
    pq.write_table(pa.concat_tables(doc_parts), os.path.join(d, "documents.parquet"))
    pq.write_table(pa.concat_tables(emb_parts), os.path.join(d, "embeddings.parquet"))
    return d


class TestNearDupGroupsOracleTwin:
    @pytest.mark.parametrize("sf_dir_name", ["small", "medium", "clones"])
    def test_collapsed_equals_doc_level(self, sf_dir_name, clone_dir):
        from classic_fcd_spark.queries.registry import QUERIES, _load_all

        _load_all()
        sf_dir = {"small": SF_SMALL, "medium": SF_MEDIUM, "clones": clone_dir}[
            sf_dir_name
        ]
        con = _con_for(sf_dir)
        collapsed = set(
            map(tuple, con.sql(QUERIES["near_dup_groups"].oracle).fetchall())
        )
        doc_level = set(
            map(tuple, con.sql(_doc_level_near_dup_groups_sql()).fetchall())
        )
        assert collapsed == doc_level
        if sf_dir_name == "clones":
            # clones guarantee multi-member groups: every doc is grouped
            assert len(collapsed) > 0

    def test_clone_corpus_exercises_expansion(self, clone_dir):
        # the collapse-only legs (m >= 2 intra, member expansion) must
        # actually fire: with 5 copies, every distinct simhash has m = 5
        con = _con_for(clone_dir)
        n_docs, n_groups = con.sql(
            "SELECT COUNT(*), COUNT(DISTINCT text) FROM documents"
        ).fetchone()
        assert n_docs == 5 * n_groups


class TestSemanticDedupOracleTwin:
    @pytest.mark.parametrize("sf_dir_name", ["small", "medium", "clones"])
    def test_collapsed_equals_doc_level(self, sf_dir_name, clone_dir):
        from classic_fcd_spark.queries.registry import QUERIES, _load_all

        _load_all()
        sf_dir = {"small": SF_SMALL, "medium": SF_MEDIUM, "clones": clone_dir}[
            sf_dir_name
        ]
        # the driver oracle embeds no corpus-derived literals for
        # semantic_dedup, so the registered SQL is corpus-independent
        oracle = QUERIES["semantic_dedup"].oracle
        if callable(oracle):
            oracle = oracle(sf_dir)
        con = _con_for(sf_dir)
        collapsed = set(map(tuple, con.sql(oracle).fetchall()))
        doc_level = set(map(tuple, con.sql(_doc_level_semantic_dedup_sql()).fetchall()))
        assert collapsed == doc_level
        assert len(collapsed) > 0
