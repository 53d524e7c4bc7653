"""The engine's query inventory — the correctness surface graded against a
DuckDB oracle (driver contract in __spark_entry__.py).

Each entry re-expresses one operator family from SURVEY.md §2 over the
driver's synthetic tables.  Numeric policy for oracle parity (SURVEY §1.3):

- Per-row arithmetic runs in DOUBLE (bit-identical IEEE semantics in both
  engines), is cast to DECIMAL per row, then SUMmed — decimal addition is
  exact and associative, so the aggregate is independent of Spark's
  partitioning / DuckDB's scan order.  Final aggregates are cast back to
  DOUBLE for a stable cross-engine schema.
- Averages are computed as decimal-sum-cast-to-double / count (double
  division is deterministic); never the engines' own AVG over doubles.
- Timestamps and dates are emitted as formatted strings, never raw
  timestamps (parquet ns vs us precision differs between engines).
"""

from classic_fcd_spark.queries.registry import QUERIES, QueryDef, oracle_sql_map, query_fn_map  # noqa: F401
