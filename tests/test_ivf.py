"""IVF index build/search: correctness vs the inline q_ivf_knn logic and
PARTITION PRUNING evidence — the probe scan must carry a partition
filter on `cell`, the 100 TB guarantee that a search reads one cell."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_etl_spark.functions import vectors as V
from data_etl_spark.operators.ivf import assign_cells, build_ivf_index, ivf_search
from data_etl_spark.sources import load_table


def _vectors(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    emb = V.as_double(F.col("embedding"))
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), emb.alias("cemb")
    )
    probes = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12)).select(
        F.col("vec_id").alias("q_vec_id"), emb.alias("qemb")
    )
    corpus = e.filter(F.col("vec_id") >= 16).select(
        F.col("vec_id").alias("c_vec_id"), emb.alias("cemb2")
    )
    return cent, probes, corpus


def test_ivf_build_and_search(spark, sf_dir, tmp_path):
    cent, probes, corpus = _vectors(spark, sf_dir)
    path = str(tmp_path / "ivf_index")
    build_ivf_index(corpus, cent, path, id_col="c_vec_id", vec_col="cemb2")

    got = ivf_search(spark, path, probes, cent, k=5)
    rows = got.collect()
    assert len(rows) == 4 * 5
    # every hit must live in the same cell as its probe
    q_cells = {
        r.q_vec_id: r.cell
        for r in assign_cells(probes, cent, "q_vec_id", "qemb").collect()
    }
    c_cells = {
        r.c_vec_id: r.cell
        for r in assign_cells(corpus, cent, "c_vec_id", "cemb2").collect()
    }
    for r in rows:
        assert c_cells[r.c_vec_id] == q_cells[r.q_vec_id]
    # ranks are 1..5 with descending scores
    for q in q_cells:
        hits = sorted((r for r in rows if r.q_vec_id == q), key=lambda r: r.rank)
        assert [h.rank for h in hits] == [1, 2, 3, 4, 5]
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)


def test_ivf_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    cent, probes, corpus = _vectors(spark, sf_dir)
    path = str(tmp_path / "ivf_index")
    build_ivf_index(corpus, cent, path, id_col="c_vec_id", vec_col="cemb2")

    # single-cell probe: the scan over the index must carry a partition
    # filter (pruning), not read all cells
    one = probes.limit(1)
    plan = (
        ivf_search(spark, path, one, cent, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the index scan must carry a dynamic partition-pruning expression on
    # `cell` (other scans in the plan legitimately have empty filters)
    assert "dynamicpruningexpression" in plan, "no partition pruning — full index scan"
    pruned_scan = [seg for seg in plan.split("FileScan parquet") if "cell" in seg.split("ReadSchema")[0] and "dynamicpruningexpression" in seg]
    assert pruned_scan, "cell-partitioned scan is not the pruned one"
