"""Driver-contract guards for __spark_entry__: entry() smoke, registry
consistency, and oracle-key discipline (every oracle key exists in
queries(); rows-only queries are the documented minority)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"doc_id", "n_chunks", "total_tokens"}


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # rows-only checks stay a small, documented minority
    rows_only = set(qs) - set(os_)
    assert len(rows_only) <= 6, rows_only
    # driver records <=50 correctness rows per round: window must fit
    assert len(qs) <= 50
    # all callables, all non-empty SQL
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())


def test_driver_window_rotation():
    """Window = round-1-unchecked oracle queries (+ flagship); deferred names
    exist in the registry and have local oracle coverage via test_oracle."""
    from data_etl_spark.plans import REGISTRY

    qs = entry_mod.queries()
    assert entry_mod._DEFERRED <= set(REGISTRY), entry_mod._DEFERRED - set(REGISTRY)
    assert set(qs) <= set(REGISTRY)
    # everything in this round's window except the flagship was unchecked in r1
    for name in qs:
        if name != entry_mod.FLAGSHIP:
            assert name > entry_mod._R1_CHECKED_LAST, name
    # every windowed query carries an oracle (no wasted rows-only slots)
    assert all(REGISTRY[n].oracle is not None for n in qs)
    # full surface stays large even though the window is capped
    assert len(REGISTRY) >= 117


def test_flagship_is_registered():
    assert entry_mod.FLAGSHIP in entry_mod.queries()
    assert entry_mod.FLAGSHIP in entry_mod.oracle_sql()
