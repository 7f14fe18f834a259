from __future__ import annotations

import os

# Tests exercise the driver-contract window build (queries()/
# oracle_sql()) but must never PERSIST it: recording fingerprints
# consumes the drift signal the real driver's build relies on, and a
# pytest run would silently rewrite the committed manifest + staleness
# report (the same tooling-consumes-drift class driver_sim already
# guards against). Must be set before __spark_entry__ is imported by
# any test module.
os.environ.setdefault("SPARK_GRAFT_WINDOW_READONLY", "1")

import duckdb
import pytest

from data_etl_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session("data-etl-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the same tables registered as views,
    mirroring the driver's oracle environment."""
    con = duckdb.connect()
    from data_etl_spark.sources.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
