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


# ---------------------------------------------------------------------------
# q_streaming_sessionize — custom stateful operator through
# applyInPandasWithState; single AvailableNow batch => output equals
# batch gaps-and-islands sessionization (exact integer oracle).
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = f"""
WITH {EVENTS_US},
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events_us
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("q_streaming_sessionize", oracle=_SESSIONIZE_ORACLE, tags=("phase4", "streaming", "stateful"))
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState)."""
    from ..streaming.jobs import streaming_sessionize

    return streaming_sessionize(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_streaming_sliding — overlapping (sliding) windows through the
# streaming engine; complete-mode AvailableNow drain == batch result.
# ---------------------------------------------------------------------------

_SSLIDING_ORACLE = f"""
WITH {EVENTS_US},
slid AS (
    SELECT e.*,
           time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE AS window_start
    FROM events_us e, (SELECT unnest([0, 1]) AS k)
)
SELECT CAST(epoch(window_start) AS BIGINT) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM slid
GROUP BY 1
"""


@register("q_streaming_sliding", oracle=_SSLIDING_ORACLE, tags=("phase4", "streaming", "window"))
def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming sliding window (10 min / 5 min slide)."""
    from ..streaming.jobs import streaming_sliding_counts

    return streaming_sliding_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_streaming_dedup — watermarked dropDuplicates through the streaming
# engine; one AvailableNow drain == batch DISTINCT (exact oracle).
# ---------------------------------------------------------------------------

_SDEDUP_ORACLE = """
SELECT event_type, count(DISTINCT event_id) AS n_unique_events
FROM events
GROUP BY event_type
"""


@register("q_streaming_dedup", oracle=_SDEDUP_ORACLE, tags=("phase4", "streaming", "dedup"))
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup (withWatermark + dropDuplicates)."""
    from ..streaming.jobs import streaming_dedup_counts

    return streaming_dedup_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_streaming_interval_join — stream-stream inner join with watermarked
# state eviction (the missing join family in §2.10: the reference has no
# streaming runtime at all). Static source + AvailableNow drain == batch
# interval join, so the oracle is exact.
# ---------------------------------------------------------------------------

_SS_JOIN_ORACLE = f"""
WITH {EVENTS_US},
clicks AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events_us WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
    FROM events_us WHERE event_type = 'purchase'
)
SELECT p.user_id, p.purchase_id, c.click_id,
       epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS gap_us
FROM purchases p
JOIN clicks c
  ON p.user_id = c.user_id
 AND c.click_ts <= p.purchase_ts
 AND c.click_ts > p.purchase_ts - INTERVAL 10 MINUTE
"""


@register("q_streaming_interval_join", oracle=_SS_JOIN_ORACLE, tags=("phase4", "streaming", "join"))
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase ⋈ prior same-user clicks)."""
    from ..streaming.jobs import streaming_interval_join

    return streaming_interval_join(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_streaming_cusum — custom stateful operator #2: per-user CUSUM drift
# through applyInPandasWithState; integer-cents state makes the single
# AvailableNow drain equal the batch oracle exactly.
# ---------------------------------------------------------------------------

from .events import _CUSUM_ORACLE  # noqa: E402  (same oracle as the batch form)


@register("q_streaming_cusum", oracle=_CUSUM_ORACLE, tags=("phase4", "streaming", "stateful", "anomaly"))
def q_streaming_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming CUSUM drift detection (applyInPandasWithState)."""
    from ..streaming.jobs import streaming_cusum

    return streaming_cusum(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_streaming_enrich — stream-static enrichment join: the events stream
# joins a STATIC dimension (customer) that Spark broadcasts into every
# micro-batch — the standard "enrich the firehose with reference data"
# topology. The static side is planned once and re-broadcast per batch;
# no stream-side shuffle, no watermark needed (the join adds columns,
# the complete-mode agg holds the running state). Revenue in integer
# cents (floor(v*100+0.5)) so the drained result is engine-exact.
# ---------------------------------------------------------------------------

_ENRICH_ORACLE = """
SELECT c.c_mktsegment AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
GROUP BY c.c_mktsegment
"""


@register("q_streaming_enrich", oracle=_ENRICH_ORACLE, tags=("phase4", "streaming", "join"))
def q_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment + running per-segment revenue."""
    from ..sources import load_table
    from ..streaming.jobs import read_events_stream, run_to_table

    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    agg = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
    )
    return run_to_table(agg, output_mode="complete")


# ---------------------------------------------------------------------------
# q_streaming_topk — running top-k over the stream: complete-mode
# aggregate + sort + limit (Structured Streaming permits sorting only
# after an aggregation in complete mode — this query pins that exact
# contract). Every micro-batch re-emits the current top-3 event types
# by count; the AvailableNow drain equals the batch top-3, with the
# (count desc, event_type) tie-break making the limit set deterministic.
# ---------------------------------------------------------------------------

_STOPK_ORACLE = """
SELECT event_type, count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY n_events DESC, event_type
LIMIT 3
"""


@register("q_streaming_topk", oracle=_STOPK_ORACLE, tags=("phase4", "streaming", "topk"))
def q_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running top-3 event types through a complete-mode streaming sort."""
    from ..streaming.jobs import read_events_stream, run_to_table

    ev = read_events_stream(spark, sf_dir)
    top = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("event_type"))
        .limit(3)
    )
    return run_to_table(top, output_mode="complete")


# ---------------------------------------------------------------------------
# q_streaming_outer_join — LEFT OUTER stream-stream interval join: the
# append-only, watermark-DRIVEN join family (NULL rows emit only when
# the global watermark proves no future match is possible). The oracle
# reproduces the watermark semantics exactly: matches always emit; an
# unmatched purchase emits iff purchase_ts < global watermark =
# least(max click_ts, max purchase_ts) - delay (default
# multipleWatermarkPolicy=min), which is what the post-drain no-data
# micro-batch flushes. Verified row-identical at sf0.001 and sf0.01.
# ---------------------------------------------------------------------------

_SS_OUTER_ORACLE = f"""
WITH {EVENTS_US},
clicks AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events_us WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
    FROM events_us WHERE event_type = 'purchase'
),
gwm AS (
    SELECT least((SELECT max(click_ts) FROM clicks),
                 (SELECT max(purchase_ts) FROM purchases))
           - INTERVAL 10 SECOND AS wm
),
j AS (
    SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id,
           epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS gap_us
    FROM purchases p
    LEFT JOIN clicks c
      ON p.user_id = c.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts > p.purchase_ts - INTERVAL 10 MINUTE
)
SELECT user_id, purchase_id, click_id, gap_us
FROM j, gwm
WHERE click_id IS NOT NULL OR purchase_ts < gwm.wm
"""


@register(
    "q_streaming_outer_join",
    oracle=_SS_OUTER_ORACLE,
    tags=("phase4", "streaming", "join"),
)
def q_streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer stream-stream interval join (watermark-flushed NULLs)."""
    from ..streaming.jobs import streaming_outer_interval_join

    return streaming_outer_interval_join(spark, sf_dir)


# ---------------------------------------------------------------------------
# q_python_stream_source — custom STREAMING Python data source
# (SimpleDataSourceStreamReader: offset-tracked driver-side pull, the
# streaming twin of q_python_datasource's batch source). One
# AvailableNow drain over the bounded generator + complete-mode agg ==
# the same generate_series oracle — proving offsets/commit/replay
# machinery does not perturb content.
# ---------------------------------------------------------------------------

from .sinks import _PYSRC_N, _pysrc_oracle as _pysrc_oracle_sql  # noqa: E402


@register(
    "q_python_stream_source",
    oracle=_pysrc_oracle_sql(),
    tags=("phase4", "streaming", "source", "api"),
)
def q_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming custom Python source -> per-lang complete-mode agg."""
    from ..sources.pysource import make_synthetic_docs_stream_source
    from ..streaming.jobs import run_to_table

    spark.dataSource.register(make_synthetic_docs_stream_source())
    sdf = (
        spark.readStream.format("synthetic_docs_stream")
        .option("n_rows", _PYSRC_N)  # same constant as the oracle builder
        .load()
    )
    agg = sdf.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("fingerprint").alias("min_fingerprint"),
    )
    return run_to_table(agg, output_mode="complete")
