"""Simulate the driver harness: plain SparkSession (not our factory),
import __spark_entry__, run entry() smoke + EVERY registered query once.

Catches config that only exists in our session factory (the t2 gate runs
under the driver's own session): ns-timestamp reads, ANSI assumptions,
timezone-sensitive date math, import-time side effects.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
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

run_all = "--all" in sys.argv
names = list(q) if run_all else ["daily_volume_ma"]
failed = []
for name in names:
    t0 = time.time()
    try:
        n = len(q[name](spark, "/root/testdata/sf0.001").collect())
        print(f"ok    {name}: {n} rows [{time.time()-t0:.1f}s]")
    except Exception as exc:  # noqa: BLE001
        failed.append(name)
        print(f"ERROR {name}: {type(exc).__name__}: {exc}")
if failed:
    print("FAILED:", failed)
    raise SystemExit(1)
print("OK")
