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

# Test inputs are 100-2000 rows, so per-stage cost is task-scheduling
# overhead, not compute: local[8]/8 shuffle partitions measured 16%
# faster than local[32]/32 on the 222-query oracle sweep (r14, part of
# getting the suite under the driver's time budget — VERDICT r13 #2).
# Query RESULTS are proven invariant to this setting (the committed
# config-sweep ritual runs the registry at shuffle.partitions 7 and 64,
# scripts/config_sweep.py), so the oracle comparisons prove the same
# contracts; an explicit SPARK_GRAFT_CPUS in the environment still wins.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

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
