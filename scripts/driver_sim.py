"""Simulate the driver harness: plain SparkSession (not our factory),
import __spark_entry__, run entry() smoke + one oracle compare, like the
per-round verify does."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver_sim")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print("entry(): rows =", len(rows))
print("schema:", df.schema.simpleString())
assert len(rows) > 0

q, o = E.queries(), E.oracle_sql()
print(f"queries: {len(q)}, oracles: {len(o)}")
missing = [k for k in o if k not in q]
assert not missing, missing

# run one events-based query under the driver-like session (ns timestamps)
out = q["daily_volume_ma"](spark, "/root/testdata/sf0.001")
print("daily_volume_ma rows at sf0.001:", out.count())
print("OK")
