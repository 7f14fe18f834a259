"""Oracle-hash the COST-GATE queries at the SF where their other branch
is live (VERDICT r11 #1).

The five planner gates (auto_knn, auto_dedup, auto_join, auto_rank,
lsh_adaptive — operators/planner.py) and the two-pass global-rank
rewrites flip physical strategy between sf0.01 and sf0.1 by design
(_ADAPT_N-style thresholds). Driver correctness runs at sf0.01, the
local suite at sf0.001, and the sf1 rehearsal checks only perf gates —
so the branch that actually executes at bench scale was never
DuckDB-hash-checked. This script runs exactly those names from the FULL
registry (driver_sim iterates only the 50-name window) at sf0.1 and
writes ORACLE_SF01_r{N}.json. The SF-capped queries (CAPPED_QUERIES)
ride along: their cap BINDS only above the driver's sf0.01 corpus, so
the cap-live branch shares the same blind spot.

Usage: python scripts/oracle_at_sf.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_WINDOW_READONLY", "1")

import duckdb  # noqa: E402

from driver_sim import TABLES, frames_equal  # noqa: E402

#: every registry name whose plan (or oracle) goes through a cost gate
#: or a row-count-adaptive rewrite — i.e. runs a DIFFERENT physical
#: branch at sf0.1 than the one driver correctness checked at sf0.01.
GATE_QUERIES = [
    "q_knn_auto",          # auto_knn: exact crossJoin vs IVF
    "q_dedup_auto",        # auto_dedup: exact pairs vs banded LSH
    "q_dedup_auto_dense",  # auto_dedup's banded branch (SF-capped)
    "q_join_auto",         # auto_join: skew-gated salting
    "q_rank_auto",         # auto_rank: window vs two-pass bucketed
    "q_lsh_adaptive",      # lsh_adaptive: band-count re-plan (_ADAPT_N)
    # two-pass exact_global_rank / exact_global_cumsum consumers — the
    # range-bucket boundary count adapts to input cardinality:
    "q_quality_percentiles",
    "q_pack_global",
    "q_rfm_segments",
    "q_zone_map_eval",
    "q_equidepth_bins",
    "q_interval_sweep",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E  # noqa: F401  (registers the registry)
    from data_etl_spark.plans import CAPPED_QUERIES, REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ORACLE_SF01.json"

    missing = [n for n in GATE_QUERIES if n not in REGISTRY]
    assert not missing, f"gate queries missing from registry: {missing}"
    if len(sys.argv) > 3:
        # Explicit query list (VERDICT r12 #7): replicate arbitrary
        # names at an arbitrary SF — used for the sf1 check of the
        # expected-superlinear queries, whose physical plan SHAPE flips
        # (broadcast -> SMJ) only at sf1, so the sf1-live plan was
        # never hash-checked by the sf0.1 gate sweep.
        names = sys.argv[3:]
        missing = [n for n in names if n not in REGISTRY]
        assert not missing, f"unknown queries: {missing}"
    else:
        # the SF-capped queries share the blind spot: their cap BINDS
        # only above the driver's sf0.01 corpus, so the cap-live branch
        # is likewise only oracle-checkable here (drawn from
        # CAPPED_QUERIES directly — no second inventory to drift)
        names = GATE_QUERIES + sorted(
            n for n in CAPPED_QUERIES if n not in GATE_QUERIES
        )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-at-sf")
        # driver-replica fidelity does NOT extend to heap size: the
        # default 1g local-mode heap dies with GCLocker allocation
        # failures on the sf1 candidate-census queries (first seen
        # running VERDICT r12 #7), and the real driver's own session
        # is similarly sized up
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        q = REGISTRY[name]
        row: dict = {"sf_dir": sf_dir}
        t0 = time.time()
        try:
            spdf = q.fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(spdf)
            row["spark_sec"] = round(time.time() - t0, 2)
            t1 = time.time()
            odf = con.sql(q.oracle).df()
            row["oracle_rows"] = len(odf)
            row["oracle_sec"] = round(time.time() - t1, 2)
            diff = frames_equal(spdf, odf)
            row["hash_match"] = diff is None
            if diff:
                row["err"] = diff[:300]
                n_fail += 1
                print(f"FAIL {name}: {diff}")
            else:
                print(
                    f"ok   {name}: {len(spdf)} rows "
                    f"(spark {row['spark_sec']}s, duckdb {row['oracle_sec']}s)"
                )
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            row["hash_match"] = False
            row["err"] = repr(ex)[:300]
            n_fail += 1
            print(f"ERROR {name}: {ex!r}")
        results[name] = row

    artifact = {
        "sf_dir": sf_dir,
        "queries": results,
        "n_pass": len(names) - n_fail,
        "n_fail": n_fail,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n== {artifact['n_pass']}/{len(names)} gate+capped queries "
          f"oracle-matched at {sf_dir} -> {out_path} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
