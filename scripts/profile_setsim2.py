"""Finer-grained q_setsim_join profile: candidate generation vs exact
verification, each materialized separately (noop sink)."""

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
    spark = build_session("profile-setsim2")
    d = load_table(spark, sf_dir, "documents")
    key = "doc_id"

    sh = tracked_persist(DD.word_shingles(d), StorageLevel.DISK_ONLY)
    sh.count()
    t0 = time.perf_counter()

    sizes = sh.groupBy(key).agg(F.count("*").alias("n_sh"))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    order = W.partitionBy(key).orderBy("__df", "shingle")
    ranked = (
        sh.join(df_counts, "shingle")
        .select(key, "shingle", F.row_number().over(order).alias("__rk"))
        .join(sizes, key)
    )
    prefix = ranked.filter(
        F.col("__rk") <= F.col("n_sh") - F.floor(F.lit(TAU) * F.col("n_sh")) + 1
    )
    prefix = tracked_persist(prefix, StorageLevel.DISK_ONLY)
    n_prefix = prefix.count()
    t1 = time.perf_counter()
    print(f"prefix build (rank+filter): {t1 - t0:.2f}s  ({n_prefix} prefix rows)")

    a = prefix.select(
        F.col(key).alias("doc1"), "shingle",
        F.col("n_sh").alias("n_sh1"), F.col("__rk").alias("__rk1"),
    )
    b = prefix.select(
        F.col(key).alias("doc2"), "shingle",
        F.col("n_sh").alias("n_sh2"), F.col("__rk").alias("__rk2"),
    )
    size_ok = (
        F.least("n_sh1", "n_sh2").cast("double")
        >= F.lit(TAU) * F.greatest("n_sh1", "n_sh2") - F.lit(1e-9)
    )
    pos_ok = (
        1 + F.least(F.col("n_sh1") - F.col("__rk1"), F.col("n_sh2") - F.col("__rk2"))
    ).cast("double") >= F.lit(TAU / (1.0 + TAU)) * (
        F.col("n_sh1") + F.col("n_sh2")
    ) - F.lit(1e-9)
    cand = (
        a.join(b, "shingle")
        .filter((F.col("doc1") < F.col("doc2")) & size_ok & pos_ok)
        .select("doc1", "doc2")
        .distinct()
    )
    cand = tracked_persist(cand, StorageLevel.DISK_ONLY)
    n_cand = cand.count()
    t2 = time.perf_counter()
    print(f"candidate join: {t2 - t1:.2f}s  ({n_cand} candidates)")

    members = cand.select(F.explode(F.array("doc1", "doc2")).alias(key)).distinct()
    arrs = (
        sh.join(members, key, "left_semi")
        .groupBy(key)
        .agg(F.collect_list("shingle").alias("__arr"), F.count("*").alias("n_sh"))
    )
    verified = (
        cand.join(
            arrs.select(F.col(key).alias("doc1"), F.col("__arr").alias("__a1"),
                        F.col("n_sh").alias("n_sh1")), "doc1")
        .join(
            arrs.select(F.col(key).alias("doc2"), F.col("__arr").alias("__a2"),
                        F.col("n_sh").alias("n_sh2")), "doc2")
        .select("doc1", "doc2",
                F.size(F.array_intersect("__a1", "__a2")).alias("n_common"),
                "n_sh1", "n_sh2")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_sh1") + F.col("n_sh2") - F.col("n_common")
    )
    verified.filter(jac >= F.lit(TAU)).write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(f"verification (arrays): {t3 - t2:.2f}s")
    release_tracked()


if __name__ == "__main__":
    main()
