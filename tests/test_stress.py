"""Per-document kernels on a large single document (the 100 TB risk for
applyInPandas operators is per-GROUP size, not corpus size): a multi-MB
doc must flow through chunking, anchor search, and insertion placement
in seconds, and outputs must stay consistent."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F

from data_etl_spark.operators.anchors import find_page_anchors_pandas
from data_etl_spark.operators.chunking import chunk_text
from data_etl_spark.operators.placement import apply_insertions_text


def _big_text(n_mb: float = 2.0) -> str:
    unit = " ".join(f"tok{i}" for i in range(200)) + "\n\n"
    reps = int(n_mb * 1_000_000 / len(unit)) + 1
    return unit * reps


def test_chunking_scales_linearly(spark):
    text = _big_text(2.0)
    df = spark.createDataFrame([("big", text)], "doc_id string, text string")
    t0 = time.perf_counter()
    n = chunk_text(df, text_col="text", size=1000, overlap=200).count()
    dt = time.perf_counter() - t0
    assert n == 1 + (len(text) - 1000 + 799) // 800
    assert dt < 30, f"chunking 2MB took {dt:.1f}s"


def test_anchor_search_on_big_doc():
    text = _big_text(1.0)
    # snippets drawn from real offsets spread through the doc
    pages, step = [], len(text) // 8
    for p in range(8):
        pages.append(text[p * step : p * step + 80])
    pdf = pd.DataFrame(
        {"filename": "big", "text": text, "page": range(1, 9), "snippet": pages}
    )
    t0 = time.perf_counter()
    got = find_page_anchors_pandas(pdf)
    dt = time.perf_counter() - t0
    assert list(got.anchor) == sorted(got.anchor)
    assert dt < 20, f"anchor search on 1MB doc took {dt:.1f}s"


def test_placement_many_insertions_on_big_doc():
    text = _big_text(1.0)
    ins = [(i * 10_000, f"[fig{i}]") for i in range(100)]
    t0 = time.perf_counter()
    placed = apply_insertions_text(text, ins)
    dt = time.perf_counter() - t0
    assert len(placed) == len(text) + sum(len(s) for _, s in ins)
    # insertions landed in ascending offset order
    order = [placed.index(f"[fig{i}]") for i in (0, 50, 99)]
    assert order == sorted(order)
    assert dt < 20, f"100 insertions on 1MB doc took {dt:.1f}s"


def test_shingle_df_cap_bounds_hot_buckets(spark):
    """A corpus where every doc shares a boilerplate paragraph: without
    the DF cap the boilerplate shingles put ALL docs in one inverted-index
    bucket (candidate pairs ~ n²); with the cap the hot shingles are
    dropped before the self-join, so pair volume is driven by true
    near-dup overlap only."""
    from data_etl_spark.operators.dedup import word_shingles

    boiler = "all rights reserved see terms of service for details"
    rows = [
        (f"d{i}", f"{boiler} unique{i} alpha{i} beta{i} gamma{i} delta{i}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    capped = word_shingles(df, max_df=5)
    # every surviving shingle's document frequency is within the cap
    max_df_after = (
        capped.groupBy("shingle").count().agg(F.max("count").alias("m")).collect()[0].m
    )
    assert max_df_after <= 5
    # and the n² boilerplate bucket is gone: the capped self-join emits no
    # pairs at all here (docs share ONLY boilerplate), vs ~40²/2 without
    a = capped.select(F.col("doc_id").alias("doc1"), "shingle")
    b = capped.select(F.col("doc_id").alias("doc2"), "shingle")
    n_pairs = a.join(b, "shingle").filter(F.col("doc1") < F.col("doc2")).count()
    assert n_pairs == 0

    uncapped = word_shingles(df, max_df=None)
    a0 = uncapped.select(F.col("doc_id").alias("doc1"), "shingle")
    b0 = uncapped.select(F.col("doc_id").alias("doc2"), "shingle")
    n_pairs0 = a0.join(b0, "shingle").filter(F.col("doc1") < F.col("doc2")).count()
    assert n_pairs0 >= 40 * 39 / 2  # quadratic blow-up the cap prevents


def test_co_shingle_pairs_directed_semantics(spark):
    """Pin the directed ``left=`` branch of co_shingle_pairs: doc1 is
    drawn from ``left`` only, doc2 from the full table, doc1 != doc2,
    and BOTH orientations of a left-left pair are kept (the documented
    caveat that makes the directed form lose when |left| is large)."""
    from data_etl_spark.operators.dedup import co_shingle_pairs

    sh = spark.createDataFrame(
        [
            ("a", "s1"), ("a", "s2"),
            ("b", "s1"), ("b", "s2"), ("b", "s3"),
            ("c", "s3"),
        ],
        "doc_id string, shingle string",
    )
    left = sh.filter(F.col("doc_id").isin("a", "b"))
    got = {
        (r.doc1, r.doc2, r.n_common)
        for r in co_shingle_pairs(sh, left=left).collect()
    }
    # doc1 only from left; both orientations of the (a,b) left-left
    # pair survive; (b,c) appears directed b->c only (c not in left);
    # no self pairs.
    assert got == {("a", "b", 2), ("b", "a", 2), ("b", "c", 1)}

    # symmetric default: one row per unordered pair, doc1 < doc2
    sym = {
        (r.doc1, r.doc2, r.n_common)
        for r in co_shingle_pairs(sh).collect()
    }
    assert sym == {("a", "b", 2), ("b", "c", 1)}


def test_dup_spans_on_boilerplate_corpus(spark, tmp_path):
    """A corpus where every doc shares one boilerplate paragraph: the
    shared 8-grams are exactly what q_dup_spans must surface, and the
    hot-shingle join must stay bounded (output = docs x boilerplate
    positions, not quadratic)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_etl_spark.plans import REGISTRY

    boiler = " ".join(f"b{i}" for i in range(20))  # 20-word shared paragraph
    docs = [(i, f"u{i}a u{i}b u{i}c " + boiler + f" t{i}x t{i}y", "en", "s", 0)
            for i in range(60)]
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "lang": pa.array([d[2] for d in docs]),
            "source": pa.array([d[3] for d in docs]),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    import os

    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    out = REGISTRY["q_dup_spans"].fn(spark, str(tmp_path))
    rows = out.collect()
    # the 13 fully-inside-boilerplate 8-grams appear in all 60 docs
    full_inside = [r for r in rows if r.n_docs == 60]
    assert len({r.shingle for r in full_inside}) == 13
    assert all(r.n_docs <= 60 for r in rows)
    # per-doc occurrence rows stay linear in corpus size
    assert len(rows) <= 60 * 26


def test_entity_blocking_bounds_giant_segment(spark):
    """Every customer in ONE (nation, segment): without the name-prefix
    key this is a single block (pairs ~ n²/2); with it, block size is
    bounded by prefix-group cardinality, so in-block pair volume stays
    ~linear as the corpus grows — the round-3 scale-weak fix."""
    from data_etl_spark.plans.dedup import _ENTITY_PREFIX, entity_match_pairs

    n = 5000
    rows = [(i, f"Customer#{i:09d}", 0, "GIANT") for i in range(n)]
    c = spark.createDataFrame(
        rows, "c_custkey bigint, c_name string, c_nationkey int, c_mktsegment string"
    )

    blocked = c.select(
        F.substring("c_name", 1, _ENTITY_PREFIX).alias("name_block")
    ).groupBy("name_block").count()
    sizes = [r["count"] for r in blocked.collect()]
    # prefix splits the giant segment into ~n/1000 blocks of bounded size
    assert len(sizes) >= n // 1000
    assert max(sizes) <= 1000

    t0 = time.perf_counter()
    pairs = entity_match_pairs(c)
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    # dist<=2 over 4 freely-varying digit positions admits ~C(4,1)*9 +
    # C(4,2)*81 ≈ 285 neighbors per id, so matches are ~n*140 after range
    # clipping — linear in n. Candidate volume is sum of per-block squares
    # (5 blocks x 1000²/2 = 2.5M) vs 12.5M unblocked; the assert pins the
    # linear-match contract, the timer pins the bounded candidate volume.
    assert 0 < n_pairs < n * 200
    assert dt < 60, f"blocked linkage on one giant segment took {dt:.1f}s"

    # correctness spot-check: adjacent ids differ by 1 digit -> dist 1
    got = {(r.cust1, r.cust2) for r in pairs.filter("dist <= 1").collect()}
    assert (0, 1) in got and (100, 101) in got


def test_semantic_dedup_giant_cluster(spark):
    """Adversarial SemDeDup input: every vector lands in ONE centroid's
    cluster (the quadratic step's worst case). The in-cluster pair join
    must still complete promptly at n=1500 (~1.1M candidate pairs) —
    documenting the boundary that k-scaling (more centroids) manages at
    real scale — and the keeper rule must leave exactly one non-dup per
    identical-vector group."""
    import pyspark.sql.functions as F

    from data_etl_spark.functions import vectors as V
    from data_etl_spark.plans.similarity import _SEM_TAU

    n, dim = 1500, 8
    # vec 0 = the only centroid (vec_id < k floor of 8 keeps it); all
    # corpus vectors identical => one cluster, every pair above tau
    rows = [(0, [1.0] + [0.0] * (dim - 1))] + [
        (i, [0.0] * (dim - 2) + [3.0, 4.0]) for i in range(8, 8 + n)
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    t0 = time.perf_counter()
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), V.as_double(F.col("embedding")).alias("cemb")
    )
    corp = e.filter(F.col("vec_id") >= 8).select(
        "vec_id", V.as_double(F.col("embedding")).alias("emb")
    )
    a = corp.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"))
    b = corp.select("vec_id", F.col("emb").alias("b_emb"))
    dup = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("vec_id"))
        .filter(V.seq_cosine(F.col("a_emb"), F.col("b_emb")) >= _SEM_TAU)
        .select("vec_id")
        .distinct()
    )
    n_dup = dup.count()
    dt = time.perf_counter() - t0
    # identical vectors: every member except the rank-1 keeper is a dup
    assert n_dup == n - 1
    assert dt < 90, f"giant-cluster pairing took {dt:.1f}s"


def test_self_knn_votes_ordering_contract(spark):
    """Pin operators/pairs.self_knn_label_votes' ranking contract on a
    hand-checkable fixture: score DESC with zero-norm (NULL-cosine)
    neighbors LAST, ties on neighbor id ASC, self never voted, and a
    query with fewer than k real-score neighbors topped up by
    NULL-score fillers in id order — exactly the window/oracle form
    the kernel replaced."""
    from data_etl_spark.operators.pairs import self_knn_label_votes

    rows = [
        # v0 and v1 identical direction (cos 1.0 to each other), v2
        # orthogonal-ish, v3 zero vector (NULL cosine to everyone)
        (0, 0, [1.0, 0.0]),
        (1, 0, [2.0, 0.0]),
        (2, 1, [0.0, 1.0]),
        (3, 2, [0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, label int, emb array<double>")
    out = self_knn_label_votes(e, k=2).collect()
    votes: dict = {}
    for r in out:
        votes.setdefault(r.qid, []).append(r.clab)
    # v0: best = v1 (cos 1.0), then v2 (cos 0.0) — v3's NULL loses
    assert votes[0] == [0, 1]
    # v1: symmetric
    assert votes[1] == [0, 1]
    # v2: v0 and v1 both cos 0.0 — tie breaks on id ASC (v0 then v1)
    assert votes[2] == [0, 0]
    # v3 (zero vector): every cosine NULL — fillers in id order v0, v1
    assert votes[3] == [0, 0]


def test_self_knn_votes_distributed_parity(spark):
    """The r13 distributed split/re-rank build of self_knn_label_votes
    must reproduce the single-group reference kernel EXACTLY (same
    (qid, qlab, clab) multiset) on a fixture that exercises every edge:
    duplicate directions (score ties -> cid ASC), zero vectors
    (NULL-score fillers), a query with fewer than k real neighbors,
    and split counts that do and do not divide the corpus."""
    import numpy as np

    from data_etl_spark.operators.pairs import (
        _self_knn_votes_group,
        self_knn_label_votes,
    )

    rng = np.random.RandomState(7)
    rows = []
    for i in range(37):
        if i % 9 == 0:
            emb = [0.0, 0.0, 0.0]  # zero vector: NULL cosine tier
        elif i % 5 == 0:
            emb = [1.0, 2.0, -1.0]  # shared direction: exact ties
        else:
            emb = [round(float(x), 3) for x in rng.randn(3)]
        rows.append((i, i % 4, emb))
    e = spark.createDataFrame(rows, "vec_id long, label int, emb array<double>")
    ref = _self_knn_votes_group(
        pd.DataFrame(rows, columns=["vec_id", "label", "emb"]), k=4
    )
    ref_set = sorted(map(tuple, ref[["qid", "qlab", "clab"]].to_numpy()))
    for n_splits in (3, 8):
        got = self_knn_label_votes(e, k=4, n_splits=n_splits).collect()
        got_set = sorted((r.qid, r.qlab, r.clab) for r in got)
        assert got_set == ref_set, f"n_splits={n_splits} diverged"
