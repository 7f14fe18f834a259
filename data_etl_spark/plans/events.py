"""Event-time window aggregations on the ``events`` table (SURVEY.md
§2.10 north-star extension, Phase 4 batch layer).

The reference is batch-only with no event-time semantics; these queries
add tumbling / sliding / session windows as batch-expressible operators
with DuckDB oracles. True Structured Streaming versions live in
``data_etl_spark.streaming`` (rows-only checks).

Timestamp discipline: events.ts is parquet TIMESTAMP(NANOS). The Spark
loader truncates to microseconds (sources/tables.py); every oracle here
does the same via ``make_timestamp(epoch_ns(ts) // 1000)`` so both
engines bucket identical µs values. Window starts are output as epoch
seconds/micros (BIGINT) — never raw timestamps — to dodge ns-precision
hash mismatches. Sums of ``value`` go through DECIMAL(18,6) (exact,
order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

#: CTE normalizing events.ts to microsecond precision for oracles.
EVENTS_US = """
events_us AS (
    SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
           user_id, event_type, value, props
    FROM events
    WHERE ts IS NOT NULL
)
"""

_DEC = "CAST(value AS DECIMAL(18,6))"


def _events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` under the event-time contract: an event with NULL ts
    has no position on the time axis — it can land in no window, no
    session, no interval — so every query built on the ``events_us``
    oracle view filters it on BOTH sides (the view's WHERE twin; fuzz
    --nulls: DuckDB retains a NULL time_bucket group where Spark's
    window() drops the row, and NULL ordering shifts session ids)."""
    return load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())


_TUMBLING_ORACLE = f"""
WITH {EVENTS_US}
SELECT CAST(epoch(time_bucket(INTERVAL 10 MINUTE, ts)) AS BIGINT) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum({_DEC}) AS DOUBLE) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events_us
GROUP BY 1, 2
"""


@register("q_tumbling_window", oracle=_TUMBLING_ORACLE, tags=("phase4", "window", "events"))
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window counts/sums per event type.

    Batch form of the Structured Streaming windowed agg; map-side partial
    agg makes this scan-bound at scale.
    """
    e = _events_ts(spark, sf_dir)
    w = F.window("ts", "10 minutes")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


_SLIDING_ORACLE = f"""
WITH {EVENTS_US},
slid AS (
    SELECT e.*,
           time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE AS window_start
    FROM events_us e, (SELECT unnest([0, 1]) AS k)
)
SELECT CAST(epoch(window_start) AS BIGINT) AS window_start,
       count(*) AS n_events,
       CAST(sum({_DEC}) AS DOUBLE) AS sum_value
FROM slid
GROUP BY 1
"""


@register("q_sliding_window", oracle=_SLIDING_ORACLE, tags=("phase4", "window", "events"))
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event in exactly 2).

    Oracle expresses the same thing as the k∈{0,1} bucket-shift union.
    """
    e = _events_ts(spark, sf_dir)
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


_SESSION_ORACLE = f"""
WITH {EVENTS_US},
flagged AS (
    SELECT user_id, event_id, ts, value,
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
       count(*) AS n_events,
       CAST(sum({_DEC}) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("q_session_window", oracle=_SESSION_ORACLE, tags=("phase4", "window", "events"))
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user (session_window builtin).

    Oracle is the classic gaps-and-islands rewrite with a STRICT ``>``
    gap flag: Spark's session_window MERGES an event landing exactly at
    the session's end (probed empirically — an event at prev + 30:00
    joins the session; only prev + 30:00.000001 starts a new one). The
    ``>=`` form diverged by one session on fuzz seed 555 (exact-gap
    event), latent on driver data where no exact 30-minute gaps occur.
    The custom streaming sessionizer (streaming/jobs.py::sessionize_fn)
    follows the same strict-greater contract.
    """
    e = _events_ts(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q_session_dynamic — DYNAMIC-GAP session windows: the gap depends on
# the event ('click' 5 min, 'purchase' 30 min, else 15 min), the
# session_window(ts, CASE ...) form Spark supports since 3.2 and the
# static-gap rewrite cannot express. The oracle generalizes
# gaps-and-islands from lag(ts) to a RUNNING MAX of per-event window
# ends (a long-gap event can bridge past a short-gap successor, so the
# previous event's end alone is not the session end). Same boundary
# contract as the static form (q_session_window, fuzz seed 555): an
# event landing exactly on the running end MERGES — the break flag is
# strict ``>``.
# ---------------------------------------------------------------------------

_DYN_GAPS_US = {"click": 300_000_000, "purchase": 1_800_000_000}
_DYN_DEFAULT_US = 900_000_000

_SESSION_DYN_ORACLE = f"""
WITH {EVENTS_US},
g AS (
    SELECT user_id, event_id, ts, value,
           epoch_us(ts) AS t_us,
           CASE event_type
                WHEN 'click' THEN {_DYN_GAPS_US['click']}
                WHEN 'purchase' THEN {_DYN_GAPS_US['purchase']}
                ELSE {_DYN_DEFAULT_US} END AS gap_us
    FROM events_us
),
o AS (
    SELECT *,
           max(t_us + gap_us) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM g
),
b AS (
    SELECT *, CASE WHEN prev_end IS NULL OR t_us > prev_end THEN 1 ELSE 0 END AS brk
    FROM o
),
s AS (
    SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
    FROM b
)
SELECT user_id,
       min(t_us) AS session_start_us,
       CAST(max(t_us + gap_us) AS BIGINT) AS session_end_us,
       count(*) AS n_events,
       CAST(sum({_DEC}) AS DOUBLE) AS sum_value
FROM s
GROUP BY user_id, sess
"""


@register("q_session_dynamic", oracle=_SESSION_DYN_ORACLE, tags=("phase4", "window", "events"))
def q_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-gap session windows (session_window with a CASE gap)."""
    e = _events_ts(spark, sf_dir)
    # gap must be CalendarIntervalType: ANSI INTERVAL literals parse as
    # DayTimeInterval, so build the CASE over string gap literals (the
    # documented dynamic-gap form; SessionWindow casts string -> calendar)
    gap = (
        F.when(F.col("event_type") == "click", F.lit("5 minutes"))
        .when(F.col("event_type") == "purchase", F.lit("30 minutes"))
        .otherwise(F.lit("15 minutes"))
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


_HOURLY_ORACLE = f"""
WITH {EVENTS_US}
SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events_us
GROUP BY 1, 2
"""


@register("q_hourly_profile", oracle=_HOURLY_ORACLE, tags=("phase4", "events"))
def q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile (event-time extraction + distinct agg)."""
    e = _events_ts(spark, sf_dir)
    return e.groupBy(
        F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# q_asof_join — time as-of join: for every 'click' event, the latest
# 'purchase' (<= ts) by the same user. Implemented as the union-stream
# + carry-forward window (ONE shuffle on user_id, no range blow-up —
# the 100 TB as-of strategy); oracle is DuckDB's native ASOF JOIN.
# The purchase side is pre-aggregated to one row per (user_id, ts) so
# the as-of match is unique and both engines agree on ties.
# ---------------------------------------------------------------------------

_ASOF_JOIN_ORACLE = f"""
WITH {EVENTS_US},
clicks AS (
    SELECT event_id, user_id, ts FROM events_us WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, ts, max(value) AS purchase_value
    FROM events_us WHERE event_type = 'purchase'
    GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us,
       p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register("q_asof_join", oracle=_ASOF_JOIN_ORACLE, tags=("phase4", "join", "asof", "events"))
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union + last(ignorenulls) carry-forward window."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    # NULL-user purchases can never equi-match a click (ASOF ON
    # c.user_id = p.user_id; fuzz --nulls) — drop them so the NULL-user
    # window partition carries nothing and those clicks stay unmatched,
    # exactly the oracle's LEFT semantics.
    purchases = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
        )
        .groupBy("user_id", F.unix_micros("ts").alias("ts_us"))
        .agg(F.max("value").alias("purchase_value"))
    )
    # the match is carried as ONE struct so a NULL purchase_value rides
    # with its ts instead of letting last(ignorenulls) bleed an older
    # purchase's value through (fuzz --nulls).
    _PST = "struct<p_ts_us:bigint,purchase_value:double>"
    unioned = purchases.select(
        "user_id",
        "ts_us",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct(
            F.col("ts_us").alias("p_ts_us"), F.col("purchase_value")
        ).alias("pst"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts_us",
            F.lit(1).alias("is_probe"),
            "event_id",
            F.lit(None).cast(_PST).alias("pst"),
        )
    )
    # build rows (is_probe=0) sort before probes at equal ts => '>=' semantics
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "user_id",
        "ts_us",
        "is_probe",
        "event_id",
        F.last("pst", ignorenulls=True).over(w).alias("pst"),
    )
    return carried.filter(F.col("is_probe") == 1).select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        F.col("pst.p_ts_us").alias("purchase_ts_us"),
        F.col("pst.purchase_value").alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# q_retention_cohort — classic daily cohort retention: users grouped by
# their first-event day, counted on each subsequent active day. Both
# shuffles (first-day agg, distinct active days) key on user_id, so AQE
# co-locates the join; the final agg is over ~cohorts×days rows (tiny).
# Days are emitted as INT days-since-epoch — never raw DATE — to keep
# the value hash engine-agnostic.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = f"""
WITH {EVENTS_US},
firsts AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
    FROM events_us GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events_us
)
SELECT CAST(date_diff('day', DATE '1970-01-01', f.cohort_day) AS INT) AS cohort_epoch_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY 1, 2
"""


@register("q_retention_cohort", oracle=_RETENTION_ORACLE, tags=("phase4", "events", "analytics"))
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix (cohort day × day offset × users)."""
    e = _events_ts(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("cohort_day"))
    active = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.datediff("cohort_day", F.lit("1970-01-01")).alias("cohort_epoch_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q_funnel — ordered conversion funnel view → click → purchase: each
# stage only counts events at-or-after the user's previous stage time.
# Three stage DataFrames, each one groupBy(user_id) + a join back to the
# previous stage — all keyed on user_id (one shuffle partitioning reused
# across stages); stage frames shrink monotonically so the later joins
# are broadcast-able at any scale.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = f"""
WITH {EVENTS_US},
s1 AS (
    SELECT user_id, min(ts) AS v_ts FROM events_us
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS c_ts
    FROM events_us e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts >= s1.v_ts
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS p_ts
    FROM events_us e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts >= s2.c_ts
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_view,
       (SELECT count(*) FROM s2) AS n_click_after_view,
       (SELECT count(*) FROM s3) AS n_purchase_after_click
"""


@register("q_funnel", oracle=_FUNNEL_ORACLE, tags=("phase4", "events", "analytics"))
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: users reaching each stage."""
    e = _events_ts(spark, sf_dir).select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchase_after_click")))
    )


# ---------------------------------------------------------------------------
# q_gap_fill — dense hourly time series: every hour bucket between the
# corpus min and max appears, zero-filled where no events landed. The
# bucket spine is sequence()+explode() over ONE broadcast row (min/max
# agg), so the left join is a broadcast-hash join of spine × hourly agg
# — no shuffle scales with the spine, and the hourly agg is map-side
# partial. This is the standard gap-fill shape for training-data
# time-series features.
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = f"""
WITH {EVENTS_US},
bounds AS (
    SELECT time_bucket(INTERVAL 1 HOUR, min(ts)) AS lo,
           time_bucket(INTERVAL 1 HOUR, max(ts)) AS hi
    FROM events_us
),
spine AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds
),
hourly AS (
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
           count(*) AS cnt,
           CAST(sum({_DEC}) AS DOUBLE) AS sum_v
    FROM events_us GROUP BY 1
)
SELECT CAST(epoch(s.bucket) AS BIGINT) AS bucket_start,
       coalesce(h.cnt, 0) AS n_events,
       coalesce(h.sum_v, 0.0) AS sum_value
FROM spine s LEFT JOIN hourly h USING (bucket)
"""


@register("q_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("phase4", "events", "analytics"))
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled dense hourly series via sequence() spine + left join."""
    e = _events_ts(spark, sf_dir)
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_v"),
    )
    spine = (
        e.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket")
        )
    )
    return spine.join(hourly, "bucket", "left").select(
        F.unix_timestamp("bucket").alias("bucket_start"),
        F.coalesce("cnt", F.lit(0)).alias("n_events"),
        F.coalesce("sum_v", F.lit(0.0)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# q_rollup_hierarchy — hypertable-style continuous-aggregate rollup:
# hour -> day -> month, where each coarser grain re-aggregates the
# FINER AGGREGATE's partials (count-of-counts, sum-of-sums), never the
# raw events. That is the 100 TB shape: the raw table is scanned once
# for the hourly grain; day and month are cheap rollups of ~dimension-
# sized intermediates. Decimal partials keep the re-aggregated sums
# exact (associative), cast to double only at the output edge, so the
# oracle — three independent GROUP BYs over raw events — hash-matches.
# ---------------------------------------------------------------------------

_ROLLUP_HIER_ORACLE = f"""
WITH {EVENTS_US},
g AS (
    SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type,
           count(*) AS n_events, sum({_DEC}) AS sum_v
    FROM events_us GROUP BY 2, 3
    UNION ALL
    SELECT 'day', date_trunc('day', ts), event_type, count(*), sum({_DEC})
    FROM events_us GROUP BY 2, 3
    UNION ALL
    SELECT 'month', date_trunc('month', ts), event_type, count(*), sum({_DEC})
    FROM events_us GROUP BY 2, 3
)
SELECT grain, CAST(epoch(bucket) AS BIGINT) AS bucket_start, event_type,
       n_events, CAST(sum_v AS DOUBLE) AS sum_value
FROM g
"""


@register(
    "q_rollup_hierarchy", oracle=_ROLLUP_HIER_ORACLE, tags=("phase4", "events", "analytics")
)
def q_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month rollup; coarser grains aggregate the hourly partials."""
    e = _events_ts(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_v"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sum_v").alias("sum_v"))
    monthly = daily.groupBy(
        F.date_trunc("month", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sum_v").alias("sum_v"))

    def shape(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.unix_timestamp("bucket").alias("bucket_start"),
            "event_type",
            "n_events",
            F.col("sum_v").cast("double").alias("sum_value"),
        )

    # hourly feeds three consumers (its own grain + two rollups)
    from ..cache import tracked_persist

    hourly = tracked_persist(hourly)
    return shape(hourly, "hour").unionByName(shape(daily, "day")).unionByName(
        shape(monthly, "month")
    )


# ---------------------------------------------------------------------------
# q_kmv_distinct — deterministic distinct-count SKETCH: k-minimum-values
# over 24-bit md5 hash prefixes, per event_type. Unlike HLL++
# (q_approx_distinct, rows-only), KMV is a pure function of the data —
# the k smallest distinct hash values are partitioning-invariant — so
# the estimate hash-matches an exact SQL oracle while still being built
# the mergeable way: per-partition min-k partials (bounded state),
# merged per group. That two-stage shape is the 100 TB path: the merge
# input is <= k x #partitions tiny arrays per group, never the raw
# distinct stream. estimate = (k-1) * 2^24 / h_k (h_k = kth smallest).
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_CONST = float((_KMV_K - 1) * 2**24)  # 1056964608.0


def _kmv_hexval6(h: str) -> str:
    # portable 24-bit int of the first 6 hex chars of column ``h``
    from ..operators.dedup import _hexval6_sql

    return _hexval6_sql(h, 1)


_KMV_ORACLE = f"""
WITH h AS (
    SELECT DISTINCT event_type, __v AS v FROM (
        SELECT event_type, {_kmv_hexval6('__h')} AS __v
        -- user_id IS NOT NULL: a NULL user is no user — the exact side's
        -- count(DISTINCT) and the engine's collect_set both drop it, but
        -- DISTINCT-over-NULL-hash would have kept one phantom row here
        -- (fuzz --nulls)
        FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS __h
              FROM events WHERE user_id IS NOT NULL)
    )
),
ranked AS (
    SELECT event_type, v,
           row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n_hashes
    FROM h
),
kth AS (
    SELECT event_type,
           max(CASE WHEN rn = {_KMV_K} THEN v END) AS h_k,
           max(n_hashes) AS n_hashes
    FROM ranked GROUP BY event_type
),
exact AS (
    SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY event_type
)
SELECT exact.event_type, exact_users,
       CASE WHEN n_hashes < {_KMV_K} THEN CAST(n_hashes AS DOUBLE)
            ELSE {_KMV_CONST} / h_k END AS kmv_estimate
FROM exact JOIN kth ON exact.event_type = kth.event_type
"""


@register("q_kmv_distinct", oracle=_KMV_ORACLE, tags=("phase4", "events", "sketch"))
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch vs exact count, per event type."""
    e = load_table(spark, sf_dir, "events")
    # user_id IS NOT NULL mirrors the oracle's h CTE: a group whose users
    # are ALL NULL gets no sketch row on either side, so the inner join
    # drops it symmetrically (a collect_set-only filter would have kept
    # an engine row the oracle's kth CTE never produces).
    raw = e.where(F.col("user_id").isNotNull()).select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("__h")
    ).select("event_type", F.expr(_kmv_hexval6("__h")).alias("v"))
    # Stage 1: bounded per-(group, input-partition) min-k partials.
    # collect_set dedups within the cell; cross-cell duplicate hashes
    # are removed at merge. The result is partitioning-invariant: every
    # one of the k globally-smallest values is among its own cell's k
    # smallest, so the merged slice equals the global min-k.
    cells = raw.groupBy("event_type", F.spark_partition_id().alias("__pid")).agg(
        F.slice(F.array_sort(F.collect_set("v")), 1, _KMV_K).alias("mins")
    )
    merged = cells.groupBy("event_type").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            _KMV_K,
        ).alias("mins")
    )
    est = F.when(
        F.size("mins") < _KMV_K, F.size("mins").cast("double")
    ).otherwise(F.lit(_KMV_CONST) / F.element_at("mins", _KMV_K))
    sketch = merged.select("event_type", est.alias("kmv_estimate"))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(sketch, "event_type").select(
        "event_type", "exact_users", "kmv_estimate"
    )


# ---------------------------------------------------------------------------
# q_kmv_setops — SET OPERATIONS on mergeable KMV sketches: estimate
# |A ∪ B| and |A ∩ B| for two user sets (clickers, purchasers) from
# their min-k sketches alone — the capability that makes KMV the
# audience-overlap sketch (HLL unions but cannot intersect without
# inclusion-exclusion error blowup). Union sketch = min-k of the merged
# value lists; intersection via the ratio estimator: every member of
# the union sketch is provably classifiable against A and B membership
# using ONLY the two sketches (union's k-th min <= each input's k-th
# min, so a union-sketch value missing from a sketch is truly absent
# from that set), and |A ∩ B| ~= (common / k) x |A ∪ B|est. Like
# q_kmv_distinct the sketch is a pure function of the data (md5
# hashes), so DuckDB reproduces the ESTIMATES bit-for-bit — no error
# bound needed, the hash check pins the estimator itself. Groupless
# aggregates keep both engines total on empty/one-sided corpora.
# ---------------------------------------------------------------------------

_KMV_SET_A = "click"
_KMV_SET_B = "purchase"

_KMV_SETOPS_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_type FROM events
    WHERE event_type IN ('{_KMV_SET_A}', '{_KMV_SET_B}')
),
h AS (
    SELECT DISTINCT event_type, {_kmv_hexval6('__h')} AS v
    FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS __h FROM ev)
),
sk AS (
    SELECT
        (SELECT coalesce(list(v ORDER BY v), CAST([] AS BIGINT[]))
         FROM (SELECT DISTINCT v FROM h WHERE event_type = '{_KMV_SET_A}') ta
        )[1:{_KMV_K}] AS amins,
        (SELECT coalesce(list(v ORDER BY v), CAST([] AS BIGINT[]))
         FROM (SELECT DISTINCT v FROM h WHERE event_type = '{_KMV_SET_B}') tb
        )[1:{_KMV_K}] AS bmins
),
u AS (
    SELECT amins, bmins,
           list_sort(list_distinct(amins || bmins))[1:{_KMV_K}] AS umins
    FROM sk
),
est AS (
    SELECT
        len(umins) AS n_u,
        CASE WHEN len(umins) < {_KMV_K} THEN CAST(len(umins) AS DOUBLE)
             ELSE {_KMV_CONST} / umins[{_KMV_K}] END AS union_est,
        len(list_filter(umins,
            x -> list_contains(amins, x) AND list_contains(bmins, x))) AS n_common
    FROM u
),
fl AS (
    SELECT user_id,
           max(event_type = '{_KMV_SET_A}') AS ia,
           max(event_type = '{_KMV_SET_B}') AS ib
    FROM ev GROUP BY user_id
),
ex AS (
    SELECT CAST(count(*) FILTER (ia OR ib) AS BIGINT) AS exact_union,
           CAST(count(*) FILTER (ia AND ib) AS BIGINT) AS exact_inter
    FROM fl
)
SELECT exact_union, exact_inter,
       CAST(n_u AS INT) AS n_union_sketch,
       CAST(n_common AS INT) AS n_common_sketch,
       union_est,
       CASE WHEN n_u = 0 THEN 0.0
            ELSE n_common * union_est / n_u END AS inter_est
FROM ex CROSS JOIN est
"""


@register("q_kmv_setops", oracle=_KMV_SETOPS_ORACLE, tags=("phase4", "events", "sketch"))
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV union/intersection estimates for clicker x purchaser users."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KMV_SET_A, _KMV_SET_B)
    )
    hv = (
        e.select(
            "event_type",
            "user_id",
            F.md5(F.col("user_id").cast("string")).alias("__h"),
        )
        .select("event_type", "user_id", F.expr(_kmv_hexval6("__h")).alias("v"))
    )
    mins_a = F.when(F.col("event_type") == _KMV_SET_A, F.col("v"))
    mins_b = F.when(F.col("event_type") == _KMV_SET_B, F.col("v"))
    cells = hv.groupBy(F.spark_partition_id().alias("__pid")).agg(
        F.slice(F.array_sort(F.collect_set(mins_a)), 1, _KMV_K).alias("amins"),
        F.slice(F.array_sort(F.collect_set(mins_b)), 1, _KMV_K).alias("bmins"),
    )

    def _merge(c: str):
        return F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))),
            1,
            _KMV_K,
        ).alias(c)

    merged = cells.agg(_merge("amins"), _merge("bmins"))
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat("amins", "bmins"))), 1, _KMV_K
    )
    sk = merged.select("amins", "bmins", u.alias("umins"))
    n_u = F.size("umins")
    union_est = F.when(n_u < _KMV_K, n_u.cast("double")).otherwise(
        F.lit(_KMV_CONST) / F.element_at("umins", _KMV_K)
    )
    n_common = F.size(
        F.array_intersect(F.array_intersect("umins", "amins"), "bmins")
    )
    est = sk.select(
        n_u.cast("int").alias("n_union_sketch"),
        n_common.cast("int").alias("n_common_sketch"),
        union_est.alias("union_est"),
        F.when(n_u == 0, F.lit(0.0))
        .otherwise(n_common * union_est / n_u)
        .alias("inter_est"),
    )
    flags = e.groupBy("user_id").agg(
        F.max(F.col("event_type") == _KMV_SET_A).alias("ia"),
        F.max(F.col("event_type") == _KMV_SET_B).alias("ib"),
    )
    exact = flags.agg(
        F.count_if(F.col("ia") | F.col("ib")).cast("bigint").alias("exact_union"),
        F.count_if(F.col("ia") & F.col("ib")).cast("bigint").alias("exact_inter"),
    )
    return exact.crossJoin(F.broadcast(est))


# ---------------------------------------------------------------------------
# q_cusum_drift — CUSUM change-point statistic per user (Page 1954,
# public): S_n = max(0, S_{n-1} + (x_n - k)) reformulated as prefix sums
# (S_n = P_n - min(0, min_{i<=n} P_i)) so it is window-expressible —
# no recursion, no UDF, exact DECIMAL arithmetic end to end. The
# streaming twin of this shape is applyInPandasWithState (sessionize
# pattern); the batch form here carries the exact oracle.
# ---------------------------------------------------------------------------

_CUSUM_K_CENTS = 5500  # reference level (slightly above the mean, so S hugs 0)
_CUSUM_H_CENTS = 20000  # decision threshold

_CUSUM_ORACLE = f"""
WITH {EVENTS_US},
c AS (
    SELECT user_id, event_id, ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) - {_CUSUM_K_CENTS} AS dv
    FROM events_us
),
p AS (
    SELECT user_id, event_id, ts,
           sum(dv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn
    FROM c
),
s AS (
    SELECT user_id, ts,
           pn - least(min(pn) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                      0) AS cusum
    FROM p
)
SELECT user_id,
       CAST(max(cusum) AS BIGINT) AS peak_cusum_cents,
       count(*) FILTER (WHERE cusum > {_CUSUM_H_CENTS}) AS n_exceed,
       min(epoch_us(ts)) FILTER (WHERE cusum > {_CUSUM_H_CENTS}) AS first_exceed_us
FROM s
GROUP BY user_id
"""


@register("q_cusum_drift", oracle=_CUSUM_ORACLE, tags=("phase4", "events", "anomaly"))
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift detection: peak statistic, exceedance count,
    first-crossing time.

    Arithmetic is integer cents end to end (value has 2-decimal
    granularity; floor(v*100+0.5) is the portable round) — prefix sums,
    running mins and the peak are all BIGINT-exact in both engines, so
    no decimal->double cast can drift. Scale shape: one shuffle on
    user_id; both window passes and the final groupBy reuse that same
    partitioning, so Catalyst plans exactly one exchange.
    """
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    dv = (
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") - _CUSUM_K_CENTS
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = e.select("user_id", "event_id", "ts", dv.alias("dv"))
    p = c.select("user_id", "event_id", "ts", F.sum("dv").over(w).alias("pn"))
    cusum = F.col("pn") - F.least(F.min("pn").over(w), F.lit(0))
    s = p.select("user_id", "ts", cusum.alias("cusum"))
    over = F.col("cusum") > _CUSUM_H_CENTS
    return s.groupBy("user_id").agg(
        F.max("cusum").cast("bigint").alias("peak_cusum_cents"),
        F.count(F.when(over, 1)).alias("n_exceed"),
        F.min(F.when(over, F.unix_micros("ts"))).alias("first_exceed_us"),
    )


# ---------------------------------------------------------------------------
# q_scd2_intervals — slowly-changing-dimension type-2 build from a change
# stream: collapse consecutive duplicate states per user, then stamp each
# surviving state with its validity interval [valid_from, valid_to) via
# lead(); the open row is flagged current. The standard warehouse
# dimension-history shape, expressed as two window passes over one
# user_id shuffle.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = f"""
WITH {EVENTS_US},
flagged AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS changed
    FROM events_us
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (SELECT * FROM flagged WHERE changed = 1),
intervals AS (
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
    FROM changes
)
SELECT user_id, event_type, valid_from_us, valid_to_us,
       valid_to_us IS NULL AS is_current
FROM intervals
"""


@register("q_scd2_intervals", oracle=_SCD2_ORACLE, tags=("phase4", "events", "scd2"))
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history: change detection + validity intervals.

    Both window passes and the change filter share one user_id exchange;
    at scale this is a single shuffle regardless of history depth.
    """
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type"))
    changes = (
        e.select("user_id", "event_type", "ts", "event_id",
                 changed.alias("changed"))
        .filter(F.col("changed"))
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead(F.unix_micros("ts")).over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


# ---------------------------------------------------------------------------
# q_markov_transitions — first-order behavior model: event-type
# transition counts and probabilities from each user's ordered stream.
# The lag() pairing shares the user_id shuffle; the global count agg is
# map-side partial over a (|types|²)-bounded key space, so the model fit
# is one scan + two cheap exchanges at any corpus size.
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = f"""
WITH {EVENTS_US},
steps AS (
    SELECT user_id, event_type AS dst,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
    FROM events_us
),
counts AS (
    SELECT src, dst, count(*) AS n
    FROM steps WHERE src IS NOT NULL
    GROUP BY src, dst
),
totals AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM counts GROUP BY src)
SELECT c.src, c.dst, c.n, t.n_src,
       CAST(c.n AS DOUBLE) / t.n_src AS p
FROM counts c JOIN totals t USING (src)
"""


@register("q_markov_transitions", oracle=_MARKOV_ORACLE, tags=("phase4", "events", "model"))
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (counts + conditional probabilities)."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = e.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    counts = steps.groupBy("src", "dst").agg(F.count("*").alias("n"))
    totals = counts.groupBy("src").agg(F.sum("n").alias("n_src"))
    return counts.join(F.broadcast(totals), "src").select(
        "src", "dst", "n", "n_src",
        (F.col("n").cast("double") / F.col("n_src")).alias("p"),
    )


# ---------------------------------------------------------------------------
# q_ab_test — two-sample experiment readout per event type: users are
# deterministically split by user_id parity (the hash-bucket assignment
# an experimentation platform would persist), and Welch's t statistic is
# computed from integer-cents sums and sums of squares — both BIGINT-
# exact and map-side combinable, so the only doubles are the final
# closed-form expression, identical in both engines.
# ---------------------------------------------------------------------------

_AB_ORACLE = f"""
WITH {EVENTS_US},
c AS (
    SELECT event_type, user_id % 2 AS grp,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
    FROM events_us
),
s AS (
    SELECT event_type, grp, count(*) AS n,
           sum(v) AS sv, sum(v * v) AS svv
    FROM c GROUP BY event_type, grp
),
w AS (
    SELECT a.event_type,
           a.n AS n_a, b.n AS n_b,
           CAST(a.sv AS DOUBLE) / a.n AS mean_a,
           CAST(b.sv AS DOUBLE) / b.n AS mean_b,
           (CAST(a.svv AS DOUBLE) - CAST(a.sv AS DOUBLE) * a.sv / a.n) / nullif(a.n - 1, 0) AS var_a,
           (CAST(b.svv AS DOUBLE) - CAST(b.sv AS DOUBLE) * b.sv / b.n) / nullif(b.n - 1, 0) AS var_b
    FROM s a JOIN s b ON a.event_type = b.event_type AND a.grp = 0 AND b.grp = 1
)
SELECT event_type, n_a, n_b,
       round(mean_a - mean_b, 6) AS mean_diff_cents_q6,
       round((mean_a - mean_b) / nullif(sqrt(var_a / n_a + var_b / n_b), 0), 6) AS t_stat_q6
FROM w
"""


@register("q_ab_test", oracle=_AB_ORACLE, tags=("phase4", "events", "experiment"))
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t readout per event type over a deterministic user split."""
    e = _events_ts(spark, sf_dir)
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    c = e.select(
        "event_type", (F.col("user_id") % 2).alias("grp"), v.alias("v")
    )
    s = c.groupBy("event_type", "grp").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    a = s.filter(F.col("grp") == 0).select(
        "event_type", F.col("n").alias("n_a"),
        F.col("sv").alias("sv_a"), F.col("svv").alias("svv_a"),
    )
    b = s.filter(F.col("grp") == 1).select(
        "event_type", F.col("n").alias("n_b"),
        F.col("sv").alias("sv_b"), F.col("svv").alias("svv_b"),
    )
    j = a.join(b, "event_type")
    mean_a = F.col("sv_a").cast("double") / F.col("n_a")
    mean_b = F.col("sv_b").cast("double") / F.col("n_b")
    # degenerate-group guards (NULL in BOTH engines, see oracle's
    # nullif): n=1 has no sample variance; a zero pooled variance has
    # no finite t. Unguarded, Spark's NULL-on-/0 vs DuckDB's IEEE inf
    # would diverge the hash on any fixture with such a group.
    var_a = (
        F.col("svv_a").cast("double")
        - F.col("sv_a").cast("double") * F.col("sv_a") / F.col("n_a")
    ) / F.when(F.col("n_a") > 1, F.col("n_a") - 1)
    var_b = (
        F.col("svv_b").cast("double")
        - F.col("sv_b").cast("double") * F.col("sv_b") / F.col("n_b")
    ) / F.when(F.col("n_b") > 1, F.col("n_b") - 1)
    t_den = F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    t = (mean_a - mean_b) / F.when(t_den != 0, t_den)
    return j.select(
        "event_type", "n_a", "n_b",
        F.round(mean_a - mean_b, 6).alias("mean_diff_cents_q6"),
        F.round(t, 6).alias("t_stat_q6"),
    )


# ---------------------------------------------------------------------------
# q_attribution_linear — multi-touch attribution: each purchase's value
# is split equally across the same user's clicks in the preceding 10
# minutes (linear model). Credit is computed in integer micro-cents with
# floor division, so the per-click credits and their per-user sums are
# BIGINT-exact — no double summation order anywhere. The interval join
# reuses q_streaming_interval_join's batch shape.
# ---------------------------------------------------------------------------

_ATTR_ORACLE = f"""
WITH {EVENTS_US},
clicks AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events_us WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events_us WHERE event_type = 'purchase'
),
touched AS (
    SELECT p.user_id, p.purchase_id, p.cents, c.click_id,
           count(*) OVER (PARTITION BY p.purchase_id) AS n_touch
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts > p.purchase_ts - INTERVAL 10 MINUTE
),
credit AS (
    SELECT user_id, click_id,
           CAST(floor(CAST(cents AS DOUBLE) * 10000 / n_touch) AS BIGINT) AS micro
    FROM touched
)
SELECT user_id,
       count(DISTINCT click_id) AS n_credited_clicks,
       CAST(sum(micro) AS BIGINT) AS attributed_microcents
FROM credit
GROUP BY user_id
"""


@register("q_attribution_linear", oracle=_ATTR_ORACLE, tags=("phase4", "events", "attribution"))
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution, integer-exact credits per user."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    j = purchases.join(clicks, "user_id").filter(
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
    )
    touched = j.withColumn("n_touch", F.count("*").over(W.partitionBy("purchase_id")))
    # floor() (toward -inf) on BOTH engines — do not "simplify" to Spark
    # DIV, which truncates toward zero and diverges from the DuckDB
    # oracle the moment cents is negative (refund-style values).
    micro = F.floor(
        F.col("cents").cast("double") * 10000 / F.col("n_touch")
    ).cast("bigint")
    credit = touched.select("user_id", "click_id", micro.alias("micro"))
    return credit.groupBy("user_id").agg(
        F.countDistinct("click_id").alias("n_credited_clicks"),
        F.sum("micro").alias("attributed_microcents"),
    )


# ---------------------------------------------------------------------------
# q_path_analysis — top clickstream paths: each user's first five event
# types (in time order) form a path string; paths are counted corpus-
# wide. The sequence build is an ordered per-user aggregation (sort by
# (ts, event_id) inside the array, deterministic); the path count agg is
# map-side partial over path-cardinality-bounded keys.
# ---------------------------------------------------------------------------

_PATH_LEN = 5

_PATH_ORACLE = f"""
WITH {EVENTS_US},
ordered AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events_us
),
paths AS (
    SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
    FROM ordered WHERE rn <= {_PATH_LEN}
    GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM paths
GROUP BY path
"""


@register("q_path_analysis", oracle=_PATH_ORACLE, tags=("phase4", "events", "paths"))
def q_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of users' first-5-event-type paths."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _PATH_LEN)
    paths = ordered.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn").alias("rn"), F.col("event_type").alias("t")))
                ),
                lambda x: x["t"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# q_cohort_ltv — cumulative lifetime value per signup cohort: users are
# cohorted by first-event day; per (cohort, days-since-signup) revenue
# accumulates via a running DECIMAL sum over the day index — the
# retention curve's revenue twin, exact at any horizon.
# ---------------------------------------------------------------------------

_LTV_ORACLE = f"""
WITH {EVENTS_US},
firsts AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
    FROM events_us GROUP BY user_id
),
rev AS (
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_k,
           sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS cents
    FROM events_us e JOIN firsts f USING (user_id)
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
)
SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_k,
       CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY day_k
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents
FROM rev
"""


@register("q_cohort_ltv", oracle=_LTV_ORACLE, tags=("phase4", "events", "cohort"))
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase revenue (integer cents) per signup cohort."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    rev = (
        e.filter(F.col("event_type") == "purchase")
        # no broadcast hint: firsts is one row per user — unbounded at
        # corpus scale; the planner decides (q_retention_cohort rule)
        .join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_k"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    w = (
        W.partitionBy("cohort_day")
        .orderBy("day_k")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return rev.select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        "day_k",
        F.sum("cents").over(w).alias("cum_cents"),
    )


# ---------------------------------------------------------------------------
# q_attribution_decay — time-decay multi-touch attribution: each click in
# the 10-minute lookback earns weight 2^-(half-lives elapsed) (half-life
# 2 min), and the purchase's integer micro-cents split proportionally.
# Everything is bigint: elapsed µs -> half-life index k via floor-div,
# weight via a 5-way CASE (16/8/4/2/1), credit = (cents·1e4·w) DIV Σw —
# so the split is bit-exact across engines, like q_attribution_linear.
# Scale: same single user_id-keyed interval join + two windowed sums;
# the weight table is a constant expression, no extra shuffle.
# ---------------------------------------------------------------------------

_DECAY_W = "CASE k WHEN 0 THEN 16 WHEN 1 THEN 8 WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 1 END"

_DECAY_ORACLE = f"""
WITH {EVENTS_US},
clicks AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events_us WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events_us WHERE event_type = 'purchase'
),
touched AS (
    SELECT p.user_id, p.purchase_id, p.cents, c.click_id,
           date_diff('microsecond', c.click_ts, p.purchase_ts) // 120000000 AS k
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts > p.purchase_ts - INTERVAL 10 MINUTE
),
weighted AS (
    SELECT user_id, purchase_id, cents, click_id, {_DECAY_W} AS w,
           sum({_DECAY_W}) OVER (PARTITION BY purchase_id) AS sum_w
    FROM touched
),
credit AS (
    SELECT user_id, click_id, (cents * 10000 * w) // sum_w AS micro
    FROM weighted
)
SELECT user_id,
       count(DISTINCT click_id) AS n_credited_clicks,
       CAST(sum(micro) AS BIGINT) AS decayed_microcents
FROM credit
GROUP BY user_id
"""


@register("q_attribution_decay", oracle=_DECAY_ORACLE, tags=("phase4", "events", "attribution"))
def q_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution, bigint-exact weighted split."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    touched = purchases.join(clicks, "user_id").filter(
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
    )
    k = F.expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) DIV 120000000")
    weighted = touched.withColumn("k", k).withColumn("w", F.expr(_DECAY_W))
    sum_w = F.sum("w").over(W.partitionBy("purchase_id"))
    credit = weighted.select(
        "user_id", "click_id",
        F.expr("cents * 10000 * w").alias("num"),
        sum_w.alias("sum_w"),
        # PRECONDITION: cents >= 0 (events.value >= 0 by schema contract).
        # Spark DIV truncates toward zero while DuckDB // floors toward
        # -inf — they agree only for non-negative numerators. A refund-
        # style negative purchase value would need floor-division on both
        # sides (same note as the PageRank mass arithmetic).
    ).select("user_id", "click_id", F.expr("num DIV sum_w").alias("micro"))
    return credit.groupBy("user_id").agg(
        F.countDistinct("click_id").alias("n_credited_clicks"),
        F.sum("micro").cast("bigint").alias("decayed_microcents"),
    )


# ---------------------------------------------------------------------------
# q_locf_backfill — last-observation-carried-forward: densify the hourly
# per-event-type series (sequence() spine + left join, as q_gap_fill)
# and fill the holes with the most recent observed value via
# last(..., ignorenulls) over an unbounded-preceding window — the
# standard sensor/metrics backfill. Carried values are integer cents so
# the carry is engine-exact. Scale: the spine explodes from one
# aggregated row; the window partitions by event_type and orders by
# hour — one bounded-key shuffle over a dimension-sized series.
# ---------------------------------------------------------------------------

_LOCF_ORACLE = f"""
WITH {EVENTS_US},
hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM events_us GROUP BY 1, 2
),
bounds AS (
    SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
    FROM events_us
),
spine AS (
    SELECT t.event_type, b.bucket
    FROM (SELECT DISTINCT event_type FROM events_us) t
    CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
                FROM bounds) b
)
SELECT s.event_type,
       CAST(epoch(s.bucket) AS BIGINT) AS bucket_start,
       h.cents IS NOT NULL AS observed,
       CAST(coalesce(
           last(h.cents IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           0) AS BIGINT) AS carried_cents
FROM spine s LEFT JOIN hourly h ON s.event_type = h.event_type AND s.bucket = h.bucket
"""


@register("q_locf_backfill", oracle=_LOCF_ORACLE, tags=("phase4", "events", "window"))
def q_locf_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF-densified hourly series per event type (integer-cents carry)."""
    from pyspark.sql import Window as W

    e = _events_ts(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.sum(cents).cast("bigint").alias("cents"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    j = spine.join(hourly, ["event_type", "bucket"], "left")
    return j.select(
        "event_type",
        F.unix_timestamp("bucket").alias("bucket_start"),
        F.col("cents").isNotNull().alias("observed"),
        F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(0))
        .cast("bigint")
        .alias("carried_cents"),
    )


# ---------------------------------------------------------------------------
# q_survival_curve — discrete-time survival analysis of click->purchase
# conversion (the Kaplan-Meier life table, day granularity): per user,
# event day = days from first click to first subsequent purchase,
# right-censored at min(horizon, days of observation remaining). Per
# day k: n_at_risk (users whose event/censor day >= k), n_events
# (conversions at exactly k), hazard = events/at_risk, and the survival
# function S(k) = prod_{j<=k} (1 - hazard_j), computed as
# exp(sum round(ln(1-h), 6)) — the bm25 ln-quantization rule — via a
# self-join on the <=horizon+1-row life table (window-free cumsum).
# Scale: one per-user aggregate (keyed shuffle), then everything is a
# <=15-row table; no global windows, nothing unbounded.
# ---------------------------------------------------------------------------

_SURV_H = 14  # censoring horizon in days

_SURV_ORACLE = f"""
WITH {EVENTS_US},
clicks AS (
    -- NULL user is not a subject: it could never join conv below
    -- anyway (equi-join), so exclude it explicitly on both sides
    SELECT user_id, min(ts) AS first_click
    FROM events_us WHERE event_type = 'click' AND user_id IS NOT NULL
    GROUP BY user_id
),
conv AS (
    SELECT c.user_id,
           min(CASE WHEN p.ts >= c.first_click THEN p.ts END) AS conv_ts
    FROM clicks c
    LEFT JOIN events_us p
      ON p.user_id = c.user_id AND p.event_type = 'purchase'
    GROUP BY c.user_id
),
horizon AS (SELECT max(ts) AS max_ts FROM events_us),
per_user AS (
    SELECT c.user_id,
           CASE WHEN v.conv_ts IS NOT NULL
                     AND date_diff('day', c.first_click, v.conv_ts) <= {_SURV_H}
                THEN date_diff('day', c.first_click, v.conv_ts) END AS event_day,
           least(date_diff('day', c.first_click, h.max_ts), {_SURV_H}) AS censor_day
    FROM clicks c JOIN conv v ON v.user_id = c.user_id CROSS JOIN horizon h
),
life AS (
    SELECT k,
           count(*) FILTER (coalesce(event_day, censor_day + 1) >= k
                            AND censor_day >= k) AS n_at_risk,
           count(*) FILTER (event_day = k) AS n_events
    FROM per_user, unnest(generate_series(0, {_SURV_H})) AS g(k)
    GROUP BY k
),
haz AS (
    SELECT k, n_at_risk, n_events,
           CAST(n_events AS DOUBLE) / nullif(n_at_risk, 0) AS hazard
    FROM life
)
SELECT a.k AS day_k,
       CAST(a.n_at_risk AS BIGINT) AS n_at_risk,
       CAST(a.n_events AS BIGINT) AS n_events,
       round(a.hazard, 6) AS hazard_q6,
       -- hazard = 1 (everyone converts) zeroes survival from that day
       -- on; the ln term is NULL-gated so DuckDB never takes ln(0)
       -- (Spark's log(0) would return NULL silently — align via CASE)
       CASE WHEN max(CASE WHEN b.hazard >= 1 THEN 1 ELSE 0 END) = 1 THEN 0.0
            ELSE round(exp(sum(round(ln(
                     1 - CASE WHEN b.hazard >= 1 THEN CAST(NULL AS DOUBLE)
                              ELSE b.hazard END), 6))), 6)
       END AS survival_q6
FROM haz a JOIN haz b ON b.k <= a.k
GROUP BY a.k, a.n_at_risk, a.n_events, a.hazard
"""


@register("q_survival_curve", oracle=_SURV_ORACLE, tags=("phase4", "events", "survival"))
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase discrete survival life table (day granularity)."""
    e = _events_ts(spark, sf_dir)
    # NULL user is not a subject (oracle twin: AND user_id IS NOT NULL)
    clicks = (
        e.filter((F.col("event_type") == "click") & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    conv = (
        clicks.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("p_ts")
            ),
            "user_id",
            "left",
        )
        .groupBy("user_id", "first_click")
        .agg(
            F.min(
                F.when(F.col("p_ts") >= F.col("first_click"), F.col("p_ts"))
            ).alias("conv_ts")
        )
    )
    horizon = e.agg(F.max("ts").alias("max_ts"))
    ev_day = F.datediff(F.col("conv_ts"), F.col("first_click"))
    per_user = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("conv_ts").isNotNull() & (ev_day <= _SURV_H), ev_day
        ).alias("event_day"),
        F.least(
            F.datediff(F.col("max_ts"), F.col("first_click")), F.lit(_SURV_H)
        ).alias("censor_day"),
    )
    ks = per_user.select(
        "event_day", "censor_day",
        F.explode(F.sequence(F.lit(0), F.lit(_SURV_H))).alias("k"),
    )
    life = ks.groupBy("k").agg(
        F.count_if(
            (F.coalesce("event_day", F.col("censor_day") + 1) >= F.col("k"))
            & (F.col("censor_day") >= F.col("k"))
        ).alias("n_at_risk"),
        F.count_if(F.col("event_day") == F.col("k")).alias("n_events"),
    )
    haz = life.select(
        "k", "n_at_risk", "n_events",
        (
            F.col("n_events").cast("double")
            / F.when(F.col("n_at_risk") > 0, F.col("n_at_risk"))
        ).alias("hazard"),
    )
    a = haz.alias("a")
    b = haz.alias("b")
    return (
        a.join(b, F.col("b.k") <= F.col("a.k"))
        .groupBy(
            F.col("a.k").alias("day_k"),
            F.col("a.n_at_risk").cast("bigint").alias("n_at_risk"),
            F.col("a.n_events").cast("bigint").alias("n_events"),
            F.round(F.col("a.hazard"), 6).alias("hazard_q6"),
        )
        .agg(
            F.when(
                F.max(
                    F.when(F.col("b.hazard") >= 1, F.lit(1)).otherwise(F.lit(0))
                )
                == 1,
                F.lit(0.0),
            )
            .otherwise(
                F.round(
                    F.exp(
                        F.sum(
                            F.round(
                                F.log(
                                    F.lit(1)
                                    - F.when(
                                        F.col("b.hazard") >= 1,
                                        F.lit(None).cast("double"),
                                    ).otherwise(F.col("b.hazard"))
                                ),
                                6,
                            )
                        )
                    ),
                    6,
                )
            )
            .alias("survival_q6")
        )
    )


# ---------------------------------------------------------------------------
# q_interval_sweep — sweep-line interval analytics over event "sessions"
# (each event holds a resource for `value` minutes): peak concurrency,
# number of busy islands (maximal stretches with >=1 interval active) and
# total covered time. The classic formulation is a GLOBAL running sum of
# +1/-1 deltas ordered by time — an unpartitioned window, the exact
# single-task scale-killer this repo bans. Here both running sums (the
# concurrency level and the island counter) go through
# operators/rank.exact_global_cumsum: sampled range buckets on t_us,
# partitioned within-bucket window sums, broadcast per-bucket offsets —
# identical values, no partition-free WindowExec. The two cumsum passes
# share ONE boundary sketch (computed once, passed via bounds=) so bucket
# assignment is consistent and the sampling job is not repeated, and the
# first pass's result is persisted DISK_ONLY (corpus-scale intermediate,
# same storage policy as q_dup_spans' shingle table) so the second pass
# does not recompute the union + cumsum subtree.
#
# Ordering contract: change points totally ordered by (t_us, delta,
# event_id) — ends (-1) sort before starts (+1) at the same instant.
# Under half-open [s,e) semantics this means two TOUCHING intervals
# [a,T) and [T,b) close the level to zero at T before reopening, so they
# intentionally count as SEPARATE busy islands (islands = maximal spans
# of strictly-positive concurrency; a shared endpoint carries zero
# covered time). Engine and oracle share the ordering, so the convention
# is consistent on both sides. Durations are floored to µs and clamped to >=1 so every interval
# is non-degenerate (its own end can never precede its start). DuckDB
# sums of BIGINT widen to HUGEINT, so every aggregate is CAST back.
# ---------------------------------------------------------------------------

_SWEEP_ORACLE = f"""
WITH {EVENTS_US}
, iv AS (
    SELECT event_id,
           epoch_ns(ts) // 1000 AS s_us,
           epoch_ns(ts) // 1000
             + greatest(CAST(floor(value * 60000000) AS BIGINT), 1) AS e_us
    FROM events_us
),
chg AS (
    SELECT event_id, s_us AS t_us, CAST(1 AS BIGINT) AS delta FROM iv
    UNION ALL
    SELECT event_id, e_us AS t_us, CAST(-1 AS BIGINT) AS delta FROM iv
),
lvl AS (
    SELECT *,
           sum(delta) OVER (
               ORDER BY t_us, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS run
    FROM chg
),
isl AS (
    SELECT *,
           sum(CASE WHEN delta = 1 AND run = 1 THEN 1 ELSE 0 END) OVER (
               ORDER BY t_us, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS island_id
    FROM lvl
),
spans AS (
    SELECT island_id, min(t_us) AS open_us, max(t_us) AS close_us
    FROM isl GROUP BY island_id
)
SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_intervals,
    (SELECT CAST(max(run) AS BIGINT) FROM lvl) AS max_concurrent,
    (SELECT CAST(count(*) AS BIGINT) FROM spans) AS n_islands,
    (SELECT CAST(sum(close_us - open_us) AS BIGINT) FROM spans) AS covered_us
"""


@register(
    "q_interval_sweep",
    oracle=_SWEEP_ORACLE,
    tags=("phase4", "events", "sweepline", "bench"),
)
def q_interval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency + busy islands + covered time, window-free.

    Sweep line over [ts, ts + value minutes) intervals with both global
    running sums computed by the two-pass bucketed cumsum
    (operators/rank.exact_global_cumsum) — no single-partition sort
    anywhere in the plan.
    """
    from pyspark import StorageLevel

    from ..operators.rank import (
        boundary_accuracy,
        boundary_probes,
        exact_global_cumsum,
    )

    ev = _events_ts(spark, sf_dir)
    s_us = F.unix_micros(F.col("ts"))
    dur = F.greatest(F.floor(F.col("value") * 60000000).cast("bigint"), F.lit(1))
    iv = ev.select(
        "event_id", s_us.alias("s_us"), (s_us + dur).alias("e_us")
    )
    chg = iv.select(
        "event_id", F.col("s_us").alias("t_us"), F.lit(1).cast("bigint").alias("delta")
    ).unionAll(
        iv.select(
            "event_id",
            F.col("e_us").alias("t_us"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    order = [F.col("t_us"), F.col("delta"), F.col("event_id")]
    # One shared boundary sketch for both cumsum passes (consistent
    # buckets, one sampling job instead of two).
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    qrow = chg.agg(
        F.percentile_approx(
            F.col("t_us").cast("double"),
            F.lit(boundary_probes(n_buckets)).cast("array<double>"),
            F.lit(boundary_accuracy(n_buckets)),
        ).alias("q")
    ).collect()
    bounds = qrow[0]["q"] or []
    from ..cache import tracked_persist

    lvl = tracked_persist(
        exact_global_cumsum(
            chg, order, F.col("t_us"), F.col("delta"), cumsum_name="run", bounds=bounds
        ),
        StorageLevel.DISK_ONLY,
    )
    opener = (F.col("delta") == 1) & (F.col("run") == 1)
    isl = exact_global_cumsum(
        lvl,
        order,
        F.col("t_us"),
        F.when(opener, F.lit(1)).otherwise(F.lit(0)),
        cumsum_name="island_id",
        bounds=bounds,
    )
    spans = isl.groupBy("island_id").agg(
        F.min("t_us").alias("open_us"), F.max("t_us").alias("close_us")
    )
    m_points = lvl.agg(
        (F.count("*") / 2).cast("bigint").alias("n_intervals"),
        F.max("run").cast("bigint").alias("max_concurrent"),
    )
    m_islands = spans.agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum(F.col("close_us") - F.col("open_us")).cast("bigint").alias("covered_us"),
    )
    return m_points.crossJoin(F.broadcast(m_islands)).select(
        "n_intervals", "max_concurrent", "n_islands", "covered_us"
    )


# ---------------------------------------------------------------------------
# q_funnel_windowed — conversion funnel with per-step time windows: a
# click counts only within 1 HOUR of the user's first view, a purchase
# only within 1 DAY of that qualifying first click. q_funnel measures
# eventual ordered conversion; this is the product-analytics standard
# where conversions expire (attribution windows). Semantics pinned to
# the half-open [step_ts, step_ts + window): boundary arithmetic runs
# on epoch-µs BIGINTs in BOTH engines, so there is no interval-type
# edge to diverge on. Same scale shape as q_funnel: per-stage min-agg
# then keyed joins — each stage's table only shrinks, and the final
# counts are three broadcast 1-row crossJoins (no driver action).
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000

_FUNNEL_W_ORACLE = f"""
WITH {EVENTS_US},
s1 AS (
    SELECT user_id, min(epoch_ns(ts) // 1000) AS v_us FROM events_us
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS c_us
    FROM events_us e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click'
      AND epoch_ns(e.ts) // 1000 >= s1.v_us
      AND epoch_ns(e.ts) // 1000 < s1.v_us + {_HOUR_US}
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS p_us
    FROM events_us e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase'
      AND epoch_ns(e.ts) // 1000 >= s2.c_us
      AND epoch_ns(e.ts) // 1000 < s2.c_us + {_DAY_US}
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_view,
       (SELECT count(*) FROM s2) AS n_click_1h,
       (SELECT count(*) FROM s3) AS n_purchase_1d
"""


@register(
    "q_funnel_windowed",
    oracle=_FUNNEL_W_ORACLE,
    tags=("phase4", "events", "analytics"),
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click-within-1h → purchase-within-1d funnel counts."""
    e = _events_ts(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t_us").alias("v_us"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("t_us") >= F.col("v_us"))
            & (F.col("t_us") < F.col("v_us") + F.lit(_HOUR_US))
        )
        .groupBy("user_id")
        .agg(F.min("t_us").alias("c_us"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("t_us") >= F.col("c_us"))
            & (F.col("t_us") < F.col("c_us") + F.lit(_DAY_US))
        )
        .groupBy("user_id")
        .agg(F.min("t_us").alias("p_us"))
    )
    return (
        s1.agg(F.count("*").alias("n_view"))
        .crossJoin(F.broadcast(s2.agg(F.count("*").alias("n_click_1h"))))
        .crossJoin(F.broadcast(s3.agg(F.count("*").alias("n_purchase_1d"))))
    )
