"""A/B the prefix-build shapes for setsim_pairs at sf1: (A) groupBy df
+ SMJ join + rank window vs (B) window-count df over partitionBy(shingle)
then rank window — one fewer agg+join, same two full-table exchanges.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_etl_spark.cache import release_tracked, tracked_persist  # noqa: E402
from data_etl_spark.operators import dedup as DD  # noqa: E402
from data_etl_spark.sources import load_table  # noqa: E402
from data_etl_spark.session import build_session  # noqa: E402

TAU = 0.5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = build_session("profile-setsim4")
    d = load_table(spark, sf_dir, "documents")
    key = "doc_id"

    sh = tracked_persist(DD.word_shingles(d), StorageLevel.DISK_ONLY)
    sh.count()
    order = W.partitionBy(key).orderBy("__df", "shingle")
    pred = lambda c: c.filter(  # noqa: E731
        F.col("__rk") <= F.col("n_sh") - F.floor(F.lit(TAU) * F.col("n_sh")) + 1
    )

    # A: current (groupBy + join)
    t0 = time.perf_counter()
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    rankedA = sh.join(df_counts, "shingle").select(
        key, "shingle",
        F.row_number().over(order).alias("__rk"),
        F.count("*").over(W.partitionBy(key)).alias("n_sh"),
    )
    nA = pred(rankedA).count()
    t1 = time.perf_counter()
    print(f"prefix A (groupBy+join): {t1 - t0:.2f}s  ({nA})")

    # B: window-count df
    rankedB = sh.select(
        key, "shingle", F.count("*").over(W.partitionBy("shingle")).alias("__df")
    ).select(
        key, "shingle",
        F.row_number().over(order).alias("__rk"),
        F.count("*").over(W.partitionBy(key)).alias("n_sh"),
    )
    nB = pred(rankedB).count()
    t2 = time.perf_counter()
    print(f"prefix B (window df): {t2 - t1:.2f}s  ({nB})")
    release_tracked()


if __name__ == "__main__":
    main()
