"""Static source-discipline guards (VERDICT r9 next #6).

Round 9 converted every bare ``.persist()`` / ``.localCheckpoint()`` to
the tracked wrappers (data_etl_spark/cache.py) by hand; one new
untracked call silently re-opens the bench cache leak the wrappers
closed (r8: plan-internal persists accumulating across a 200-query
harness run). This scan fails the suite on the next one.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

#: (path, pattern) pairs allowed to call the raw API.
#: cache.py is the wrapper implementation itself. etl.py's
#: _ann_centroids checkpoint is INDEX-LIFETIME state, not plan-internal:
#: it must survive release_tracked() between harness queries because
#: ann_search reads it for as long as the EtlProcessor lives, and it is
#: k centroid rows (bounded by n_cells), not a corpus-scale block.
ALLOWED = {
    ("data_etl_spark/cache.py", ".persist("),
    ("data_etl_spark/cache.py", ".localCheckpoint("),
    ("data_etl_spark/etl.py", "self._ann_centroids = cent.localCheckpoint("),
}

_RAW = re.compile(r"\.(persist|localCheckpoint)\s*\(")


def _source_files():
    yield from (REPO / "data_etl_spark").rglob("*.py")
    yield REPO / "__spark_entry__.py"
    yield REPO / "bench.py"
    for p in (REPO / "scripts").glob("*.py"):
        yield p


def test_no_bare_persist_or_local_checkpoint():
    offenders = []
    for path in _source_files():
        rel = path.relative_to(REPO).as_posix()
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if not _RAW.search(code):
                continue
            if "tracked_persist" in code or "tracked_local_checkpoint" in code:
                continue
            if any(rel == f and pat in code for f, pat in ALLOWED):
                continue
            offenders.append(f"{rel}:{lineno}: {line.strip()}")
    assert not offenders, (
        "bare .persist()/.localCheckpoint() outside cache.py — route through "
        "tracked_persist/tracked_local_checkpoint (or add a justified "
        "ALLOWED entry):\n" + "\n".join(offenders)
    )


def test_guard_catches_injection(tmp_path):
    """The scan itself must flag a bare persist (guard-of-the-guard)."""
    sample = 'df2 = df.persist(StorageLevel.DISK_ONLY)\n'
    code = sample.split("#", 1)[0]
    assert _RAW.search(code) and "tracked_persist" not in code
