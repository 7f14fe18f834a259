"""A/B the two exact-verification shapes for setsim_pairs at sf1
(VERDICT r9 next #1): per-doc arrays + array_intersect vs the
candidate-restricted token join (groupBy(doc1,doc2).count over
cand |><| tokens). Shared: shingles persist, prefix persist, cand persist.
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
    spark = build_session("profile-setsim3")
    d = load_table(spark, sf_dir, "documents")
    key = "doc_id"

    sh = tracked_persist(DD.word_shingles(d), StorageLevel.DISK_ONLY)
    sh.count()

    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    order = W.partitionBy(key).orderBy("__df", "shingle")
    ranked = sh.join(df_counts, "shingle").select(
        key, "shingle",
        F.row_number().over(order).alias("__rk"),
        F.count("*").over(W.partitionBy(key)).alias("n_sh"),
    )
    prefix = tracked_persist(
        ranked.filter(
            F.col("__rk") <= F.col("n_sh") - F.floor(F.lit(TAU) * F.col("n_sh")) + 1
        ),
        StorageLevel.DISK_ONLY,
    )
    a = prefix.select(F.col(key).alias("doc1"), "shingle",
                      F.col("n_sh").alias("n_sh1"), F.col("__rk").alias("__rk1"))
    b = prefix.select(F.col(key).alias("doc2"), "shingle",
                      F.col("n_sh").alias("n_sh2"), F.col("__rk").alias("__rk2"))
    size_ok = (F.least("n_sh1", "n_sh2").cast("double")
               >= F.lit(TAU) * F.greatest("n_sh1", "n_sh2") - F.lit(1e-9))
    pos_ok = (1 + F.least(F.col("n_sh1") - F.col("__rk1"),
                          F.col("n_sh2") - F.col("__rk2"))).cast("double") \
        >= F.lit(TAU / (1.0 + TAU)) * (F.col("n_sh1") + F.col("n_sh2")) - F.lit(1e-9)
    t0 = time.perf_counter()
    cand = tracked_persist(
        a.join(b, "shingle")
        .filter((F.col("doc1") < F.col("doc2")) & size_ok & pos_ok)
        .select("doc1", "doc2").distinct()
    )
    n_cand = cand.count()
    t1 = time.perf_counter()
    print(f"prefix+cand: {t1 - t0:.2f}s  ({n_cand} candidates)")

    members = cand.select(F.explode(F.array("doc1", "doc2")).alias(key)).distinct()
    shm = sh.join(members, key, "left_semi")

    # variant A: arrays + array_intersect
    arrs = tracked_persist(
        shm.groupBy(key).agg(F.collect_list("shingle").alias("__arr"),
                             F.count("*").alias("n_sh")),
        StorageLevel.DISK_ONLY,
    )
    vA = (
        cand.join(arrs.select(F.col(key).alias("doc1"), F.col("__arr").alias("__a1"),
                              F.col("n_sh").alias("n_sh1")), "doc1")
        .join(arrs.select(F.col(key).alias("doc2"), F.col("__arr").alias("__a2"),
                          F.col("n_sh").alias("n_sh2")), "doc2")
        .select("doc1", "doc2",
                F.size(F.array_intersect("__a1", "__a2")).alias("n_common"),
                "n_sh1", "n_sh2")
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_sh1") + F.col("n_sh2") - F.col("n_common"))
    t2 = time.perf_counter()
    nA = vA.filter(jac >= F.lit(TAU)).count()
    t3 = time.perf_counter()
    print(f"verify A (arrays): {t3 - t2:.2f}s  ({nA} pairs)")

    # variant B: candidate-restricted token join
    sizes = shm.groupBy(key).agg(F.count("*").alias("n_sh"))
    t1tok = shm.select(F.col(key).alias("doc1"), "shingle")
    t2tok = shm.select(F.col(key).alias("doc2"), "shingle")
    common = (
        cand.join(t1tok, "doc1")
        .join(t2tok, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("n_common"))
    )
    vB = (
        common
        .join(sizes.select(F.col(key).alias("doc1"), F.col("n_sh").alias("n_sh1")), "doc1")
        .join(sizes.select(F.col(key).alias("doc2"), F.col("n_sh").alias("n_sh2")), "doc2")
    )
    t4 = time.perf_counter()
    nB = vB.filter(jac >= F.lit(TAU)).count()
    t5 = time.perf_counter()
    print(f"verify B (token join): {t5 - t4:.2f}s  ({nB} pairs)")
    release_tracked()


if __name__ == "__main__":
    main()
