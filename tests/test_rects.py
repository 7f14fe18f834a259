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
