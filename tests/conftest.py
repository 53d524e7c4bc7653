"""Shared pytest fixtures: one SparkSession per test run.

local[*] with the engine's standard config (classic_fcd_spark.session);
sf0.001 tables for anything that touches the driver's testdata.
"""

from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from classic_fcd_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from classic_fcd_spark.session import load_tables

    return load_tables(spark, SF_SMALL)
