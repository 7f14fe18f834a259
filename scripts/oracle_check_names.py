"""Oracle-hash specific REGISTRY names at a given SF — the targeted
complement to oracle_full_registry.py (full sweep) and driver_sim.py
(window only). Use when a round touches a handful of queries and the
verification loop needs a minutes-long signal, not the full 240 s pass.

Usage: python scripts/oracle_check_names.py sf_dir name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_WINDOW_READONLY", "1")

import duckdb  # noqa: E402

from driver_sim import TABLES, frames_equal  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from data_etl_spark.cache import release_tracked
    from data_etl_spark.plans import REGISTRY

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-check-names")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = 0
    for name in names:
        ent = REGISTRY[name]
        t0 = time.time()
        spdf = ent.fn(spark, sf_dir).toPandas()
        if ent.oracle is None:
            release_tracked()
            print(f"rows-only {name}: {len(spdf)} rows ({time.time() - t0:.1f}s)")
            continue
        opdf = con.sql(ent.oracle).df()
        err = frames_equal(spdf, opdf)
        release_tracked()
        if err:
            bad += 1
            print(f"FAIL {name}: {err}")
        else:
            print(f"ok {name}: {len(spdf)} rows ({time.time() - t0:.1f}s)")
    print(f"== {len(names) - bad}/{len(names)} oracle-matched ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
