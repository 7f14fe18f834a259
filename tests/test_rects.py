"""Property tests for the J4 rect-merge operator: the union-find
applyInPandas kernel must agree with a brute-force fixpoint merge
(literal transcription of the reference semantics: repeatedly fuse any
two overlapping-or-touching rects until no change)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from data_etl_spark.operators.rects import merge_rects, merge_rects_pandas


def brute_force_merge(rects: list[tuple[float, float, float, float]], tol: float):
    """Fixpoint pairwise fusion (reference-style), returns sorted union boxes."""
    rs = [list(r) for r in rects]
    changed = True
    while changed:
        changed = False
        out = []
        while rs:
            r = rs.pop()
            merged = False
            for o in out:
                if (
                    r[0] <= o[2] + tol
                    and o[0] <= r[2] + tol
                    and r[1] <= o[3] + tol
                    and o[1] <= r[3] + tol
                ):
                    o[0] = min(o[0], r[0])
                    o[1] = min(o[1], r[1])
                    o[2] = max(o[2], r[2])
                    o[3] = max(o[3], r[3])
                    merged = changed = True
                    break
            if not merged:
                out.append(r)
        rs = out
        if changed:
            rs, out = list(rs), []
    return sorted(tuple(r) for r in rs)


def _random_rects(rng: random.Random, n: int):
    rects = []
    for _ in range(n):
        x0 = rng.uniform(0, 500)
        y0 = rng.uniform(0, 700)
        rects.append((x0, y0, x0 + rng.uniform(5, 120), y0 + rng.uniform(5, 90)))
    return rects


@pytest.mark.parametrize("seed", [1, 7, 42, 99])
@pytest.mark.parametrize("tol", [0.0, 40.0])
def test_pandas_kernel_matches_bruteforce(seed, tol):
    rng = random.Random(seed)
    rects = _random_rects(rng, 30)
    pdf = pd.DataFrame(
        {
            "filename": "doc_x",
            "page": 1,
            "x0": [r[0] for r in rects],
            "y0": [r[1] for r in rects],
            "x1": [r[2] for r in rects],
            "y1": [r[3] for r in rects],
        }
    )
    got = merge_rects_pandas(pdf, tol)
    got_boxes = sorted(zip(got.x0, got.y0, got.x1, got.y1))
    expected = brute_force_merge(rects, tol)
    assert [tuple(b) for b in got_boxes] == [tuple(e) for e in expected]
    # member counts conserve the input
    assert got.n_members.sum() == len(rects)
    # enumeration is 1..k in (y0, x0) order
    assert list(got.sort_values(["y0", "x0"]).idx) == list(range(1, len(got) + 1))


def test_spark_merge_rects_distributes(spark):
    rng = random.Random(5)
    rows = []
    for page in range(1, 6):
        for r in _random_rects(rng, 12):
            rows.append(("doc_a", page, *r))
    df = spark.createDataFrame(rows, "filename string, page int, x0 double, y0 double, x1 double, y1 double")
    out = merge_rects(df, tol=40.0).toPandas()
    assert set(out.page) == {1, 2, 3, 4, 5}
    assert out.n_members.sum() == len(rows)
    for page, grp in out.groupby("page"):
        src = [r[2:] for r in rows if r[1] == page]
        expected = brute_force_merge(src, 40.0)
        got = sorted(zip(grp.x0, grp.y0, grp.x1, grp.y1))
        assert [tuple(b) for b in got] == [tuple(e) for e in expected]


def test_rect_merge_verdicts_flag_broken_merges(spark):
    """q_rect_merge's verdict frame: all-TRUE on the real fixpoint kernel,
    FALSE rows when fed an under-merged (still overlapping), wrong-bbox,
    or rect-dropping 'merge'."""
    import pyspark.sql.functions as F

    from data_etl_spark.operators.components import connected_components
    from data_etl_spark.plans.figures import rect_merge_verdicts

    # two chained pairs that only fuse at the SECOND fixpoint round plus
    # one isolated rect, all on one page
    rows = [
        ("d", 1, 0.0, 0.0, 50.0, 50.0),
        ("d", 1, 80.0, 0.0, 130.0, 50.0),     # within tol=40 of the first
        ("d", 1, 160.0, 0.0, 210.0, 50.0),    # within tol of the second only
        ("d", 1, 500.0, 500.0, 560.0, 560.0),  # isolated
    ]
    fig = spark.createDataFrame(
        rows, "filename string, page int, x0 double, y0 double, x1 double, y1 double"
    )
    keyed = fig.withColumn(
        "fig_key", F.monotonically_increasing_id()
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    tol = 40.0
    edges = a.join(
        b,
        (F.col("a.filename") == F.col("b.filename"))
        & (F.col("a.page") == F.col("b.page"))
        & (F.col("a.fig_key") < F.col("b.fig_key"))
        & (F.col("a.x0") <= F.col("b.x1") + tol)
        & (F.col("b.x0") <= F.col("a.x1") + tol)
        & (F.col("a.y0") <= F.col("b.y1") + tol)
        & (F.col("b.y0") <= F.col("a.y1") + tol),
    ).select(F.col("a.fig_key").alias("src"), F.col("b.fig_key").alias("dst"))
    cc = connected_components(edges)
    comp = (
        keyed.join(cc, keyed["fig_key"] == cc["node"], "left")
        .select(
            "filename", "page", "x0", "y0", "x1", "y1",
            F.coalesce("component", "fig_key").alias("component"),
        )
        .groupBy("filename", "page", "component")
        .agg(
            F.min("x0").alias("x0"), F.min("y0").alias("y0"),
            F.max("x1").alias("x1"), F.max("y1").alias("y1"),
            F.count("*").alias("n_members"),
        )
    )

    def verdicts(merged_rows):
        merged = spark.createDataFrame(
            merged_rows,
            "filename string, page int, x0 double, y0 double, x1 double,"
            " y1 double, n_members long, idx int",
        )
        return rect_merge_verdicts(fig, comp, merged, tol=tol).toPandas()

    # the REAL fixpoint: one fused rect + the isolated one
    good = verdicts(
        [("d", 1, 0.0, 0.0, 210.0, 50.0, 3, 1),
         ("d", 1, 500.0, 500.0, 560.0, 560.0, 1, 2)]
    )
    vcols = ["contain_ok", "merged_disjoint_ok", "bbox_union_ok",
             "members_sum_ok", "page_count_ok"]
    assert good[vcols].all().all(), good

    # under-merge: the chain left as two rects that still overlap at tol
    under = verdicts(
        [("d", 1, 0.0, 0.0, 130.0, 50.0, 2, 1),
         ("d", 1, 160.0, 0.0, 210.0, 50.0, 1, 2),
         ("d", 1, 500.0, 500.0, 560.0, 560.0, 1, 3)]
    )
    assert not under["merged_disjoint_ok"].all()

    # wrong bbox: union doesn't cover the members
    wrong = verdicts(
        [("d", 1, 0.0, 0.0, 200.0, 50.0, 3, 1),
         ("d", 1, 500.0, 500.0, 560.0, 560.0, 1, 2)]
    )
    assert (not wrong["bbox_union_ok"].all()) or (not wrong["contain_ok"].all())

    # dropped rect: page member counts no longer re-add
    dropped = verdicts(
        [("d", 1, 0.0, 0.0, 210.0, 50.0, 3, 1)]
    )
    assert not dropped["page_count_ok"].all()
    assert not dropped["contain_ok"].all()  # the isolated component is orphaned
