"""Cost-gated physical-strategy selection (SURVEY.md §4's optional
custom planner rule, concretized for kNN).

Spark's Catalyst picks join strategies from statistics, but it cannot
know that a queries x corpus crossJoin *semantically* admits an
IVF-bucketed rewrite — that is an engine-level planner rule, not an
expression rewrite. This module implements that rule as a cost gate:

- corpus row count <= threshold  -> exact brute-force top-k (the
  broadcast-nested-loop plan: linear in the corpus, optimal when the
  corpus fits a scan);
- corpus row count  > threshold  -> IVF path: deterministic centroids
  (first n by id — TakeOrdered, no sort of the corpus), nearest-cell
  assignment (broadcast centroids), and an equi-join on ``cell`` so the
  candidate set per probe is ~1/n_cells of the corpus instead of all
  of it.

The gate's only driver action is one column-pruned ``count()`` — the
same O(1)-result class as the k-means drift scalar. Both branches emit
the identical (q_id, rank, c_id, score) schema, and both are
SQL-expressible, so the registered query's DuckDB oracle reproduces the
gate itself (two result branches gated by a scalar count subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V
from .ivf import assign_cells
from .knn import exact_knn

__all__ = ["auto_knn"]


def auto_knn(
    probes: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    q_id: str = "q_vec_id",
    c_id: str = "c_vec_id",
    q_vec: str = "q_emb",
    c_vec: str = "c_emb",
    threshold: int = 1024,
    n_centroids: int = 8,
) -> DataFrame:
    """Top-k cosine per probe; physical strategy chosen by corpus size."""
    n_corpus = corpus.count()
    if n_corpus <= threshold:
        return exact_knn(
            F.broadcast(probes), corpus, k=k,
            q_id=q_id, c_id=c_id, q_vec=q_vec, c_vec=c_vec,
        )
    cent = (
        corpus.orderBy(c_id)
        .limit(n_centroids)
        .select(F.col(c_id).alias("cent_id"), F.col(c_vec).alias("cemb"))
    )
    c_assign = assign_cells(corpus, cent, c_id, c_vec)
    q_assign = assign_cells(probes, cent, q_id, q_vec)
    score = V.seq_cosine(F.col(q_vec), F.col(c_vec))
    w = W.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        q_assign.join(c_assign, "cell")
        .select(q_id, c_id, score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "score")
    )
