"""transformWithStateInPandas gap-stats operator (streaming/jobs.py).

The streaming runtime path needs google.protobuf (pyspark's TWS state
protos), absent from this container — so the e2e test import-gates like
the PyMuPDF smoke, while the pure merge kernel is tested exhaustively
against a brute-force lag computation (the same arithmetic the DuckDB
oracle would run)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_etl_spark.streaming.jobs import merge_gap_state


@given(st.lists(st.integers(min_value=0, max_value=10**12), max_size=40))
@settings(max_examples=80, deadline=None)
def test_merge_gap_state_matches_bruteforce(ts):
    ts = sorted(ts)
    last, n, mn, mx = merge_gap_state(None, ts)
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    assert n == len(ts)
    assert last == (ts[-1] if ts else None)
    assert mn == (min(gaps) if gaps else None)
    assert mx == (max(gaps) if gaps else None)


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=2, max_size=40),
    st.integers(min_value=0, max_value=40),
)
@settings(max_examples=80, deadline=None)
def test_merge_gap_state_batch_split_invariant(ts, cut):
    """Folding two event-time-ordered batches sequentially == folding
    their union once — the property that makes a multi-micro-batch
    stream equal the batch oracle. The split point is arbitrary but the
    boundary respects event-time order (in-order source semantics)."""
    ts = sorted(ts)
    cut = min(cut, len(ts))
    step1 = merge_gap_state(None, ts[:cut])
    step2 = merge_gap_state(step1, ts[cut:])
    assert step2 == merge_gap_state(None, ts)


@given(
    st.lists(st.integers(min_value=100, max_value=10**9), min_size=1, max_size=20),
    st.lists(st.integers(min_value=0, max_value=99), min_size=1, max_size=10),
)
@settings(max_examples=60, deadline=None)
def test_merge_gap_state_drops_late_rows(ts, late):
    """Out-of-order stragglers behind the high-water mark are dropped,
    never folded into negative gaps (the documented late-data policy)."""
    ts = sorted(ts)
    base = merge_gap_state(None, ts)
    after_late = merge_gap_state(base, sorted(late))  # all < min(ts) <= last_us
    assert after_late == base
    assert after_late[2] is None or after_late[2] >= 0


def test_streaming_gap_stats_e2e(spark, sf_dir):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf in the TWS worker",
    )
    from pyspark.sql import functions as F

    from data_etl_spark.sources import load_table
    from data_etl_spark.streaming.jobs import streaming_gap_stats

    out = streaming_gap_stats(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    got = {r.user_id: r.n_purchases for r in out.collect()}
    want = {r.user_id: r.n_purchases for r in ref.collect()}
    assert got == want
