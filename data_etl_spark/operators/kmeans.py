"""DataFrame-native Lloyd's k-means — trains the centroids that feed the
IVF index (operators/ivf.py). Demonstrates the iterative-algorithm
pattern on plain DataFrames (like operators/components.py): each round
is assign (broadcast centroids) -> per-dimension mean (posexplode +
groupBy) -> localCheckpoint to truncate lineage.

Determinism: init = the k vectors with the smallest ids; ties in
assignment break on cent_id. Centroid means sum floats across
partitions, so exact reproducibility of low-order bits is NOT promised
(unlike the oracle-checked operators) — kmeans is a training utility,
not a correctness-path query; tests assert invariants (inertia
monotonicity, cover, stability), not bit equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..cache import tracked_local_checkpoint
from ..functions import vectors as V
from .ivf import assign_cells


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    max_iter: int = 10,
) -> DataFrame:
    """Returns centroids (cent_id, cemb) after at most ``max_iter`` rounds."""
    cent = tracked_local_checkpoint(
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col), F.col(vec_col))
        .withColumn("cent_id", F.row_number().over(W.orderBy(id_col)) - 1)
        .select("cent_id", F.col(vec_col).alias("cemb")),
        eager=True,
    )

    for _ in range(max_iter):
        assigned = assign_cells(vectors, cent, id_col, vec_col)
        new_cent = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("cemb")
            )
            .select(F.col("cell").alias("cent_id"), "cemb")
        )
        new_cent = tracked_local_checkpoint(new_cent, eager=True)
        # converged when assignments can't change: compare centroid sets
        moved = (
            new_cent.alias("n")
            .join(cent.alias("o"), "cent_id")
            .filter(F.col("n.cemb") != F.col("o.cemb"))
            .count()
        )
        cent = new_cent
        if moved == 0:
            break
    return cent


def kmeans_inertia(
    vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "emb"
) -> float:
    """Sum of squared distances to the assigned centroid."""
    assigned = assign_cells(vectors, centroids, id_col, vec_col)
    joined = assigned.join(
        centroids.select(F.col("cent_id").alias("cell"), "cemb"), "cell"
    )
    d2 = V.seq_l2sq(F.col(vec_col), F.col("cemb"))
    return joined.agg(F.sum(d2).alias("i")).collect()[0]["i"]
