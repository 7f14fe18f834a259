"""IVF (inverted-file) ANN index as a partitioned table (SURVEY.md §2.9
V4 scale path, concretized): assign every corpus vector to its nearest
centroid, write the corpus partitioned by ``cell``, and answer probes by
reading ONLY the probe's cell partition(s) — at 100 TB a top-k search
touches 1/n_cells of the data, enforced by Spark's partition pruning
(visible as PartitionFilters in the scan node).

Centroids are a DataFrame (cent_id, cemb); k-means training is optional
(operators/kmeans.py) — any deterministic centroid set works, including
"first k vectors" for tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V


def _l2(a: str, b: str) -> Column:
    """Expanded-form L2 distance (same expression tree as the oracles)."""
    return F.sqrt(
        V.dot(F.col(a), F.col(a))
        + V.dot(F.col(b), F.col(b))
        - F.lit(2) * V.dot(F.col(a), F.col(b))
    )


def assign_cells(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment: adds ``cell``. Centroids broadcast
    (they are tiny); ties break on cent_id for determinism. ``nprobe``
    keeps the N nearest cells per vector (probe-side fan-out for recall
    — the multiprobe lever; corpus assignment stays nprobe=1). The ONE
    implementation of this logic — q_ivf_knn / q_ivf_multiprobe /
    auto_knn all route here so tie-break or distance changes cannot
    drift between them and their oracles.

    Distance runs on the Arrow path (seq_l2sq, the O(n_vectors x
    n_centroids) hot loop), projected to a column first so the window
    can order by it; sqrt is kept so tie behavior matches the oracle's
    sqrt-distance ordering bit-for-bit."""
    d = F.sqrt(V.seq_l2sq(F.col(vec_col), F.col("cemb")))
    w = W.partitionBy(id_col).orderBy(F.col("__d").asc(), F.col("cent_id").asc())
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("__d", d)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(id_col, vec_col, F.col("cent_id").alias("cell"))
    )


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> None:
    """Write the corpus as a cell-partitioned parquet table."""
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    (
        assigned.repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_search(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    q_id: str = "q_vec_id",
    q_vec: str = "qemb",
    id_col: str = "c_vec_id",
    vec_col: str = "cemb2",
) -> DataFrame:
    """Top-k cosine within each probe's cell.

    The equi-join on ``cell`` pushes a partition filter into the index
    scan (dynamic partition pruning / broadcast join on the partition
    column), so only the probed cells' files are read.
    """
    q_assign = assign_cells(probes, centroids, q_id, q_vec).withColumnRenamed("cell", "cell_q")
    index = spark.read.parquet(path)
    joined = q_assign.join(index, q_assign["cell_q"] == index["cell"])
    score = V.seq_cosine(F.col(q_vec), F.col(vec_col))
    w = W.partitionBy(q_id).orderBy(F.desc("score"), F.asc(id_col))
    return (
        joined.select(q_id, F.col(id_col).alias("c_vec_id"), score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", "c_vec_id", "score")
    )
