"""Ad-hoc min-of-2 timer for a handful of registry queries.

Usage: python scripts/time_queries.py [sf_dir] q_name [q_name ...]
Prints one line per query: name, min-of-2 wall seconds. Used while
iterating on a single plan; the committed artifacts come from bench.py /
scripts/bench_full.py / scripts/bench_sf1_full.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

from data_etl_spark.cache import release_tracked  # noqa: E402
from data_etl_spark.plans import REGISTRY  # noqa: E402
from data_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = build_session()
    # warmup: JVM + codegen paths on the tiny SF
    for name in args:
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        release_tracked()
    for name in args:
        walls = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.monotonic() - t0)
            release_tracked()
        print(f"{name}: {min(walls):.2f}s  (runs: {[round(w, 2) for w in walls]})")
    spark.stop()


if __name__ == "__main__":
    main()
