"""Write-side data layout: the engine's substitute for the reference's
B-tree indexes (sql/customIndex.sql — height, (account, timestamp), GIN
on jsonb).

A columnar lake gets the same point-lookup/range-scan economics from
LAYOUT instead of indexes:

- day partitions → partition pruning (a time-range query lists only its
  days' directories; the scan shows PartitionFilters);
- within each file, rows sorted by the query key → parquet row-group
  min/max statistics become TIGHT, so a predicate skips whole row
  groups without reading them (the columnar analogue of an index range
  scan);
- one file per (partition, shuffle partition), sized by
  spark.sql.files.maxPartitionBytes at read time.

At 100 TB this is the difference between "scan the table" and "read two
row groups from one partition" — and it is free at write time: the sort
rides the shuffle the partitioned write already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_COL = "day_pt"


def write_time_layout(
    df: DataFrame,
    out_dir: str,
    ts_col: str = "ts",
    sort_cols: list[str] | None = None,
    files_per_day: int = 1,
) -> None:
    """Write df day-partitioned by `ts_col`, rows sorted by `sort_cols`
    (default: the timestamp) within each file.

    repartition(partition key) + sortWithinPartitions gives each output
    file a contiguous, sorted key range — the layout that makes parquet
    min/max stats selective.  `files_per_day` > 1 spreads hot days
    across writers (size-based splitting still applies on read)."""
    sort_cols = sort_cols or [ts_col]
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    # Partition by (day [, time-slice salt]) under the session's default
    # shuffle parallelism — NOT repartition(files_per_day, day), which
    # caps the whole write at files_per_day tasks and still lands each
    # day wholly in one of them (hash on day alone cannot split a day).
    # The salt is the ts position within the day scaled to files_per_day
    # slices, so a hot day splits into up to files_per_day CONTIGUOUS,
    # non-overlapping time ranges — writers parallelize AND row-group
    # min/max stats stay tight (a hash salt would interleave the ranges).
    out = df.withColumn(DAY_COL, day)
    keys = [F.col(DAY_COL)]
    if files_per_day > 1:
        us_in_day = F.pmod(F.unix_micros(F.col(ts_col)), F.lit(86_400_000_000))
        keys.append(
            F.floor(us_in_day * files_per_day / F.lit(86_400_000_000)).alias("__slice")
        )
    (
        out.repartition(*keys)
        .sortWithinPartitions(DAY_COL, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(DAY_COL)
        .parquet(out_dir)
    )


def read_time_layout(spark, out_dir: str) -> DataFrame:
    """Read a write_time_layout table (keeps the partition column opaque
    string, same convention as streaming.minute_pipeline)."""
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    return spark.read.parquet(out_dir)
