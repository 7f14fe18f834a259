"""Cost-gated kNN planner (operators/planner.py): the gate must change
the PHYSICAL plan, not just the result — exact brute force below the
threshold, IVF cell-join above it — and the IVF rewrite must return the
true top-k whenever cells are well separated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_spark.functions import vectors as V
from data_etl_spark.operators.knn import exact_knn
from data_etl_spark.operators.planner import auto_knn


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, emb array<double>")


def _corpus(spark, n, base):
    """n vectors in two well-separated clusters around +/-base."""
    rows = [
        (
            i,
            [
                (base if i % 2 == 0 else -base) + (i % 7) * 0.01,
                (base if i % 2 == 0 else -base) - (i % 5) * 0.01,
                1.0,
            ],
        )
        for i in range(n)
    ]
    return _vecs(spark, rows).select(
        F.col("id").alias("c_vec_id"), F.col("emb").alias("c_emb")
    )


def _probes(spark):
    return _vecs(
        spark, [(0, [10.0, 10.0, 1.0]), (1, [-10.0, -10.0, 1.0])]
    ).select(F.col("id").alias("q_vec_id"), F.col("emb").alias("q_emb"))


def test_below_threshold_plans_broadcast_nl(spark):
    out = auto_knn(_probes(spark), _corpus(spark, 50, 10.0), k=3, threshold=1024)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # no cell machinery below the gate
    assert "cell" not in plan


def test_above_threshold_plans_cell_equijoin(spark):
    out = auto_knn(
        _probes(spark), _corpus(spark, 1100, 10.0), k=3, threshold=1024, n_centroids=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probe-corpus pairing is a keyed join on cell, never a full
    # cross of probes x corpus
    assert "cell" in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_ivf_branch_exact_when_cells_separate(spark):
    """With two far-apart clusters, each probe's cell contains its true
    top-k, so the IVF rewrite must equal brute force exactly."""
    corpus = _corpus(spark, 1100, 10.0)
    probes = _probes(spark)
    ivf = auto_knn(probes, corpus, k=3, threshold=1024, n_centroids=4)
    exact = exact_knn(F.broadcast(probes), corpus, k=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, exact.collect()))


def test_gate_is_count_driven(spark):
    """Same data, different thresholds -> different physical strategies."""
    corpus = _corpus(spark, 200, 10.0)
    probes = _probes(spark)
    lo = auto_knn(probes, corpus, k=3, threshold=100, n_centroids=4)
    hi = auto_knn(probes, corpus, k=3, threshold=1000)
    assert "cell" in lo._jdf.queryExecution().executedPlan().toString()
    assert "cell" not in hi._jdf.queryExecution().executedPlan().toString()
