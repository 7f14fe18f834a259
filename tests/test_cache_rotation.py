"""Early-release cache API (round 11; consolidated r13): release_ckpt
for tracked localCheckpoints — the rotation primitive behind
_bpe_learn / q_kcenter_coreset / q_kcore_peel. (A tracked_persist
sibling, release_one, was removed in r13 with zero production callers;
release_tracked drains plain persists.)"""

from __future__ import annotations

from data_etl_spark import cache as C


def _persistent_rdd_ids(spark) -> set[int]:
    sc = spark.sparkContext
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def test_release_ckpt_drops_blocks_and_entry(spark):
    handle: list = []
    out = C.tracked_local_checkpoint(
        spark.range(100).toDF("n"), handle_out=handle
    )
    out.count()
    assert handle, "handle_out must receive the bookkeeping entry"
    sc_ids = {i for _, ids in [handle[0]] for i in ids}
    assert sc_ids <= _persistent_rdd_ids(spark)
    before = len(C._TRACKED_CKPT)
    C.release_ckpt(handle[0])
    assert len(C._TRACKED_CKPT) == before - 1
    assert not (sc_ids & _persistent_rdd_ids(spark))
    # the drained entry must not resurface in release_tracked
    C.release_tracked()


def test_rotation_bounds_resident_tables(spark):
    """The _bpe_learn-shaped loop: after R rounds with rotation, at
    most the LAST round's checkpoint blocks remain registered."""
    base = _persistent_rdd_ids(spark)
    cur = spark.range(1000).toDF("n")
    prev_handle: list = []
    for _ in range(4):
        handle: list = []
        cur = C.tracked_local_checkpoint(
            cur.selectExpr("n + 1 AS n"), handle_out=handle
        )
        if prev_handle:
            C.release_ckpt(prev_handle[0])
        prev_handle = handle
    new_ids = _persistent_rdd_ids(spark) - base
    # one live checkpoint (the last round's blocks), nothing older
    assert new_ids == set(prev_handle[0][1])
    C.release_tracked()
    assert not (_persistent_rdd_ids(spark) - base)
