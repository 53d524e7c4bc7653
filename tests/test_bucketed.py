"""Bucketed-layout proofs: the stored clustering must actually remove
the runtime shuffle (and sort) — the whole point of paying the bucketed
write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from classic_fcd_spark.session import load_tables
    from classic_fcd_spark.sources.bucketed import write_bucketed

    tabs = load_tables(spark, SF_SMALL)
    write_bucketed(
        tabs["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_bkt",
        ["o_custkey"],
        num_buckets=8,
    )
    write_bucketed(
        tabs["customer"].select("c_custkey", "c_name", "c_nationkey"),
        "customer_bkt",
        ["c_custkey"],
        num_buckets=8,
    )
    yield "orders_bkt", "customer_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


class TestBucketedJoin:
    def test_join_on_bucket_key_has_no_exchange(self, spark, bucketed_tables):
        ot, ct = bucketed_tables
        o, c = spark.table(ot), spark.table(ct)
        joined = o.join(
            c.withColumnRenamed("c_custkey", "o_custkey").hint("merge"), "o_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the stored clustering feeds the join directly: no shuffle on
        # either side, and sorted buckets mean no Sort either
        assert "Exchange" not in plan, plan[:2000]

    def test_groupby_on_bucket_key_has_no_exchange(self, spark, bucketed_tables):
        ot, _ = bucketed_tables
        agg = spark.table(ot).groupBy("o_custkey").agg(F.sum("o_totalprice"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]

    def test_same_rows_as_plain_join(self, spark, bucketed_tables):
        from classic_fcd_spark.session import load_tables

        ot, ct = bucketed_tables
        tabs = load_tables(spark, SF_SMALL)
        plain = (
            tabs["orders"]
            .join(
                tabs["customer"].withColumnRenamed("c_custkey", "o_custkey"),
                "o_custkey",
            )
            .count()
        )
        bucketed = (
            spark.table(ot)
            .join(
                spark.table(ct).withColumnRenamed("c_custkey", "o_custkey"),
                "o_custkey",
            )
            .count()
        )
        assert bucketed == plain
