"""Session-lifetime cache bookkeeping for plan-internal persists.

Some operators persist a corpus-scale intermediate that outlives the
function that created it (e.g. :func:`operators.planner.auto_dedup`'s
shingle set feeds both the gate and the returned lazy plan, so it cannot
be unpersisted before the caller materializes the result — Spark has no
"after first materialization" hook). Left alone, each call leaks one
cached dataset for the session lifetime, which matters for long-lived
JVMs that run the whole registry back-to-back (scripts/bench_full.py:
~200 queries in one session).

``tracked_persist`` records such handles; harnesses call
``release_tracked`` between queries (bench_full does; the driver runs
<=50 queries and exits, so its leak window is bounded by design).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOG = logging.getLogger(__name__)

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """Persist ``df`` and remember the handle for later release.

    The default level is ``DataFrame.persist()``'s own default
    (MEMORY_AND_DISK_DESER), so ``tracked_persist(x)`` is a drop-in for
    ``x.persist()`` — every plan-internal persist goes through here so
    harnesses can drain the cache between queries (VERDICT r8 #3)."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked dataset; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception as exc:
            # Swallow silently ONLY for the stopped-session case (the
            # JVM gateway is gone, nothing left to release); a failure
            # on a live session is a real leak signal — log it so the
            # long-lived bench_full JVM doesn't hide cache leaks.
            if _session_alive(df):
                _LOG.warning(
                    "release_tracked: unpersist failed on a live session: %s", exc
                )
    return n


def _session_alive(df: DataFrame) -> bool:
    """True when the dataframe's session still has a live JVM gateway."""
    try:
        return df.sparkSession.sparkContext._jsc is not None
    except Exception:
        return False
