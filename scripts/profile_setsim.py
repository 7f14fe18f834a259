"""Stage-level profile of q_setsim_join at sf1 (VERDICT r9 next #1):
break the plan into (shingle build+persist) / (candidate generation) /
(exact verification) and time each, so the 29.4 s sf1 wall is cut where
it actually lives instead of where it plausibly lives.

Usage: python scripts/profile_setsim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_etl_spark.cache import release_tracked, tracked_persist  # noqa: E402
from data_etl_spark.operators import dedup as DD  # noqa: E402
from data_etl_spark.sources import load_table  # noqa: E402
from data_etl_spark.plans.dedup import _SETSIM_TAU  # noqa: E402
from data_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = build_session("profile-setsim")
    d = load_table(spark, sf_dir, "documents")

    t0 = time.perf_counter()
    sh = tracked_persist(DD.word_shingles(d), StorageLevel.DISK_ONLY)
    n_sh = sh.count()
    t1 = time.perf_counter()
    print(f"shingles build+persist: {t1 - t0:.2f}s  ({n_sh} rows)")

    pairs = DD.setsim_pairs(sh, _SETSIM_TAU)
    jac = F.col("n_common").cast("double") / (
        F.col("n_sh1") + F.col("n_sh2") - F.col("n_common")
    )
    out = pairs.select(
        "doc1", "doc2", "n_common", "n_sh1", "n_sh2", jac.alias("jaccard")
    )
    t2 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(f"setsim full (post-persist): {t3 - t2:.2f}s")
    release_tracked()


if __name__ == "__main__":
    main()
