"""Skew-aware join helpers (SURVEY.md §4 shuffle/partitioning posture).

A shuffled equi-join on a skewed key puts one key's entire row set into
one task; at 100 TB that task is the job. ``salted_join`` splits each
hot key into ``n_salts`` sub-keys: the large side salts by a
deterministic hash of a unique column, the small side replicates every
row once per salt, and the join runs on (key, salt) — identical result,
bounded task size. AQE's skew-join splitting does this adaptively for
sort-merge joins; explicit salting is for when the skew is known and
you want the plan stable (or the join is not SMJ).

Salt MUST be deterministic (hash of a data column, never rand()) so
retried tasks produce the same rows — the same rule as §1.3's ban on
monotonically_increasing_id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys split across n_salts tasks.

    ``salt_src``: a column of ``large`` whose hash spreads rows (a unique
    id is ideal). The small side is replicated n_salts times (explode of
    a literal range — no shuffle, no extra scan).
    """
    salted_large = large.withColumn(
        "__salt", F.pmod(F.crc32(F.col(salt_src).cast("string")), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int")))
    )
    out = salted_large.join(salted_small, [*keys, "__salt"], how)
    return out.drop("__salt")
