"""classic_fcd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of terra-money/classic-fcd.

The reference (read-only at /root/reference) is a TypeScript + Postgres
indexing/analytics suite for the Terra Classic chain.  This package
re-expresses its data model and every operator in idiomatic Spark:

- bronze/silver/gold medallion tables instead of Postgres row tables
  (reference: src/orm/index.ts:203-223),
- Structured Streaming + foreachBatch MERGE instead of the cron collector
  (reference: src/collector/collector.ts:39-73),
- DataFrame/SQL queries instead of the Koa REST controllers
  (reference: src/createApp.ts:110-142).

Nothing in here is a translation of the reference's imperative code; the
SURVEY.md document maps each reference operator (file:line) to the Spark
primitive used here.
"""

__version__ = "0.1.0"

from classic_fcd_spark.session import get_spark  # noqa: F401
