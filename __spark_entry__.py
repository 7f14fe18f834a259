"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``data_etl_spark.plans.REGISTRY`` — every operator
implemented from SURVEY.md §2 registers itself there with both a PySpark
DataFrame callable and (when SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_etl_spark.plans import REGISTRY  # noqa: E402

FLAGSHIP = "q_chunk_pipeline"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Phase-0 slice (SURVEY.md §7): documents -> normalize (T-chain) ->
    overlapping chunks -> token counts -> per-doc aggregate.
    """
    return REGISTRY[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query.

    Keys absent here (q.oracle is None) are non-SQL-expressible ops —
    the driver records a weaker rows-only check for those.
    """
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None}
