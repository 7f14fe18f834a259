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
    assert len(qs) >= 80
    # all callables, all non-empty SQL
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())


def test_flagship_is_registered():
    assert entry_mod.FLAGSHIP in entry_mod.queries()
    assert entry_mod.FLAGSHIP in entry_mod.oracle_sql()
