"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``classic_fcd_spark.queries`` — one
(Spark fn, DuckDB oracle) pair per operator family from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    pricing_summary stays the flagship after its r9 driver-slot rotation
    (slot -> scd2_order_history); imported directly since it no longer
    rides the registry."""
    from classic_fcd_spark.queries.core import pricing_summary

    return pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from classic_fcd_spark.queries import query_fn_map

    return query_fn_map()


def oracle_sql() -> dict[str, str]:
    from classic_fcd_spark.queries import oracle_sql_map

    return oracle_sql_map()
