"""Full-registry oracle sweep at the driver's correctness SF (round 12;
one level stronger than the per-round evidence layers it complements):

- tests/test_oracle.py proves every registry entry at sf0.001,
- the driver window proves <=50 entries per round at sf0.01,
- scripts/oracle_at_sf.py proves the 15 branch-flipping (gate/capped)
  names at sf0.1,
- THIS sweep proves the ENTIRE registry at sf0.01 in one pass and
  writes ORACLE_FULL_REGISTRY_r{N}.json.

Usage: python scripts/oracle_full_registry.py [round_no] [sf_dir]
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


def main() -> None:
    from pyspark.sql import SparkSession

    from data_etl_spark.cache import release_tracked
    from data_etl_spark.plans import REGISTRY

    round_no = sys.argv[1] if len(sys.argv) > 1 else ""
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = (
        f"ORACLE_FULL_REGISTRY_r{round_no}.json"
        if round_no
        else "ORACLE_FULL_REGISTRY.json"
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-full-registry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    results: dict[str, dict] = {}
    fails: list[str] = []
    t_start = time.time()
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        try:
            spdf = q.fn(spark, sf).toPandas()
            if q.oracle is None:
                # non-SQL-expressible op: weaker rows-only record, same
                # as the driver's contract
                row = {"rows_only": True, "spark_rows": len(spdf), "ok": True}
            else:
                odf = con.sql(q.oracle).df()
                diff = frames_equal(spdf, odf)
                row = {
                    "spark_rows": len(spdf),
                    "oracle_rows": len(odf),
                    "hash_match": diff is None,
                }
                if diff:
                    row["err"] = diff[:200]
                    fails.append(name)
                    print(f"FAIL {name}: {diff[:150]}", flush=True)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            row = {"hash_match": False, "err": repr(ex)[:200]}
            fails.append(name)
            print(f"ERROR {name}: {ex!r}"[:200], flush=True)
        results[name] = row
        release_tracked()

    n_ok = sum(1 for r in results.values() if r.get("hash_match") or r.get("ok"))
    # provenance (ADVICE r13 #1): stamp the exact tree and wall-clock so
    # "this sweep postdates change X" is verifiable from the artifact
    # itself, plus whether the tree was dirty when recorded
    import subprocess

    try:
        tree = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain"], capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        )
    except OSError:
        tree, dirty = "?", None
    artifact = {
        "sf_dir": sf,
        "n": len(results),
        "n_pass": n_ok,
        "fails": fails,
        "wall_sec": round(time.time() - t_start, 1),
        "tree": tree,
        "tree_dirty": dirty,
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "queries": results,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=0, sort_keys=True)
    print(
        f"\n== {n_ok}/{len(results)} full-registry oracle-matched at {sf} "
        f"in {artifact['wall_sec']}s -> {out} =="
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
