"""Shared fixtures: one local SparkSession, the driver-contract hooks,
and the fixture scale-factor directories (TESTDATA.md)."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from census_postgres_py_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="session")
def queries():
    import __spark_entry__ as entrymod

    return entrymod.queries()


@pytest.fixture(scope="session")
def oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()
