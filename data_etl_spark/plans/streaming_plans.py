"""Streaming + incremental queries (SURVEY.md §2.10 N1-N3, Phase 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .events import EVENTS_US
from .registry import register

# ---------------------------------------------------------------------------
# q_streaming_tumbling — the batch tumbling agg executed through the
# Structured Streaming engine (file source + watermark + AvailableNow).
# Complete-mode drain of a static source loses nothing, so the batch
# oracle applies verbatim — the streaming runtime itself is under test.
# ---------------------------------------------------------------------------

_STREAM_ORACLE = f"""
WITH {EVENTS_US}
SELECT CAST(epoch(time_bucket(INTERVAL 10 MINUTE, ts)) AS BIGINT) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events_us
GROUP BY 1
"""


@register("q_streaming_tumbling", oracle=_STREAM_ORACLE, tags=("phase4", "streaming"))
def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming tumbling window, drained via AvailableNow."""
    from ..streaming.jobs import streaming_tumbling_counts

    return streaming_tumbling_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_incremental_skip — N1: skip already-processed files via anti join
# (document_processor.py:146-202's force_md_conv=False path).
# ---------------------------------------------------------------------------

_SKIP_ORACLE = """
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 7 = 0)
"""


@register("q_incremental_skip", oracle=_SKIP_ORACLE, tags=("phase4", "incremental"))
def q_incremental_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-skipping N1: unprocessed = all files ANTI JOIN processed registry."""
    d = load_table(spark, sf_dir, "documents")
    processed = d.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return d.join(F.broadcast(processed), "doc_id", "left_anti").select("doc_id", "source")
