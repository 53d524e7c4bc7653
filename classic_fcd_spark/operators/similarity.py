"""Embedding similarity search: brute-force cosine top-k + LSH bucketing.

LLM-pipeline extensions (brief): approximate-nearest-neighbor over an
`array<float>` embedding column.

Design for 100 TB:
- Brute-force: broadcast the (small) query set, score every corpus vector
  with JVM-side higher-order functions (zip_with/aggregate — no Python,
  no shuffle beyond the final per-query top-k), TakeOrdered per query.
- LSH (random hyperplane): bucket = sign bits of dot(v, r_j) for
  deterministic md5-derived hyperplanes r_j; ANN probes only the query's
  bucket — shuffle on the bucket id, collision-bounded like MinHash-LSH.
- Numeric policy: element products are CAST to double inside the fold and
  summed left-to-right (both engines fold lists sequentially); emitted
  scores are floor(cos*1e6) so last-ulp float differences can't flip a
  hash compare.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_sql(a: str, b: str) -> str:
    """Spark SQL fold for dot(a, b) in double."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB fold for dot(a, b): explicit index comprehension + list_sum
    (sequential, same order as the Spark fold)."""
    return (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in range(1, {dim + 1})])"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"


def duck_cosine_sql(a: str, b: str, dim: int) -> str:
    return (
        f"({duck_dot_sql(a, b, dim)} / "
        f"(sqrt({duck_dot_sql(a, a, dim)}) * sqrt({duck_dot_sql(b, b, dim)})))"
    )


def cosine(a: str, b: str) -> Column:
    return F.expr(cosine_sql(a, b))


def floor_e6(c: Column) -> Column:
    """floor(x*1e6) as bigint — the stable cross-engine score encoding."""
    return F.floor(c * F.lit(1000000.0)).cast("bigint")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH with deterministic md5-derived planes.
# ---------------------------------------------------------------------------
def hyperplane_weights(num_planes: int, dim: int) -> list[list[int]]:
    """Integer weights in [-8, 7]: first md5 hex digit of 'j:i'.  Derived
    once in Python (hashlib) and embedded as literals, so Spark and the
    oracle share the exact same planes."""
    return [
        [
            int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) - 8
            for i in range(dim)
        ]
        for j in range(num_planes)
    ]


def bucket_sql(vec: str, weights: list[list[int]], fold: str) -> str:
    """SQL (Spark or DuckDB flavor) computing the LSH bucket id: bit j set
    iff dot(vec, plane_j) > 0.  `fold` is 'spark' or 'duck'."""
    terms = []
    for j, w in enumerate(weights):
        lit = "array(" + ", ".join(str(x) for x in w) + ")" if fold == "spark" else "[" + ", ".join(str(x) for x in w) + "]"
        if fold == "spark":
            dot = (
                f"aggregate(zip_with({vec}, {lit}, (x, y) -> CAST(x AS DOUBLE) * y), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        else:
            dim = len(w)
            dot = (
                f"list_sum([CAST({vec}[i] AS DOUBLE) * ({lit})[i] "
                f"for i in range(1, {dim + 1})])"
            )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
