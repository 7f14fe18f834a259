"""Sink round-trip queries (SURVEY.md §2.2 K-group, generalized).

The reference's sinks are files-on-disk (markdown K1, PNG K2, JSON
catalog K3/K4, vector store K6-K8). The engine's write discipline is
tables, but the file formats still need correct write+read round-trips:
each query here writes a test table to a scratch directory under the
repo's ``spark-warehouse/`` in one format, reads it back, and returns
the re-read rows. The oracle is a plain SELECT over the original
parquet — so any loss of fidelity in the sink (type coercion, float
formatting, partition-column reconstruction) fails the hash match.

Scale notes: every write here is a distributed ``df.write`` (one file
per task, no driver collect); the partitioned-write query additionally
proves partition *pruning* on the read path — the scan touches only the
selected partition directory.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

_SCRATCH = Path(__file__).resolve().parents[2] / "spark-warehouse" / "roundtrip"


def _scratch(sf_dir: str, name: str) -> str:
    # per-sf subdir: queries run at several scale factors; overwrite mode
    # keeps each idempotent, the sf key keeps them from clobbering each other
    sf_key = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return str(_SCRATCH / sf_key / name)


_CSV_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
"""


@register("q_csv_roundtrip", oracle=_CSV_ORACLE, tags=("phase2", "sink"))
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip (K4-style text sink, lossless).

    Doubles survive because Spark writes shortest-roundtrip decimal
    strings and the read-back uses the explicit original schema (never
    inferSchema — §1.2).
    """
    c = load_table(spark, sf_dir, "customer")
    path = _scratch(sf_dir, "customer_csv")
    c.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(c.schema).option("header", "true").csv(path)


_JSON_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
"""


@register("q_json_roundtrip", oracle=_JSON_ORACLE, tags=("phase2", "sink"))
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round-trip (the reference's catalog/metadata
    sink K3/K4 at `/root/reference/src/etl_processor.py:113-140`), with
    the explicit-schema read standing in for Pydantic revalidation."""
    s = load_table(spark, sf_dir, "supplier")
    path = _scratch(sf_dir, "supplier_json")
    s.write.mode("overwrite").json(path)
    return spark.read.schema(s.schema).json(path)


_ORC_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
"""


@register("q_orc_roundtrip", oracle=_ORC_ORACLE, tags=("phase2", "sink"))
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round-trip incl. µs timestamps (columnar sink
    alternative to parquet; exercises a second writer/reader codepath)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    path = _scratch(sf_dir, "lineitem_orc")
    li.write.mode("overwrite").orc(path)
    return spark.read.schema(li.schema).orc(path)


_PARTITIONED_ORACLE = """
SELECT event_id, user_id, value, event_type FROM events
WHERE event_type IN ('click', 'purchase')
"""


@register("q_partitioned_write", oracle=_PARTITIONED_ORACLE, tags=("phase2", "sink", "pruning"))
def q_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet write + partition-pruned read.

    The filter on the partition column prunes directories at planning
    time (the scan lists only event_type=click/purchase) — the layout
    that makes per-key deletes/scans O(partition) instead of O(table) at
    100 TB. Partition values come back as strings, so they are cast
    back to the original type for the hash match.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    path = _scratch(sf_dir, "events_by_type")
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    # explicit schema: an EMPTY source (an empty ingest day) writes no
    # data files, and a schema-inferring read of a fileless dataset
    # throws UNABLE_TO_INFER_SCHEMA — the writer knows the schema, so
    # the reader never needs to infer it (empty-tables probe).
    back = spark.read.schema(e.schema).parquet(path)
    return back.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "value", F.col("event_type").cast("string").alias("event_type")
    )


# ---------------------------------------------------------------------------
# q_schema_evolution — mergeSchema read across batches written with
# different schemas: the lakehouse reality of tables that grow columns
# over time. Batch 1 lacks the status column; the merged read surfaces
# it as NULL for those rows. The oracle re-derives the expected union
# from the source (the write is lossless), per the roundtrip pattern.
# ---------------------------------------------------------------------------

_EVOLUTION_ORACLE = """
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status
FROM orders
"""


@register("q_schema_evolution", oracle=_EVOLUTION_ORACLE, tags=("phase2", "sink", "schema"))
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet mergeSchema across a column-added batch boundary."""
    o = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "orders_evolving")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_orderstatus").alias("status"),
    )
    v1.write.mode("overwrite").parquet(path + "/v1")
    v2.write.mode("overwrite").parquet(path + "/v2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path + "/v1", path + "/v2")
        .select("o_orderkey", "totalprice", "status")
    )


# ---------------------------------------------------------------------------
# q_bucketed_join — bucketed tables + co-located join (the 100 TB join
# strategy SURVEY §2.4 calls for): orders and lineitem are written
# bucketBy(orderkey) + sortBy into external-path tables, so the
# fact-fact join needs NO shuffle of either side — the scan itself
# satisfies the join's distribution requirement (zero Exchange under
# the SortMergeJoin; asserted by tests/test_plans.py). On a real
# cluster this is the difference between re-shuffling 100 TB per join
# and reading pre-co-located buckets; the only Exchange left in the
# query feeds the final 5-row priority rollup.
#
# Revenue sums in DECIMAL (exact, engine-order-independent), cast to
# double only at the end — the q_pricing_summary rule.
# ---------------------------------------------------------------------------

_BUCKETS = 8

_BUCKETED_ORACLE = """
SELECT o.o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderpriority
"""


def _sf_key(sf_dir: str) -> str:
    """Catalog-safe identifier suffix derived from the source dir: any
    character outside [A-Za-z0-9_] becomes '_' (real ingest paths carry
    hyphens/dots; an unquoted Spark SQL identifier accepts neither —
    found by the chaos-time fuzz sweep's hyphenated tmpdir)."""
    import re

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return re.sub(r"[^A-Za-z0-9_]", "_", base)


# Columns each bucketed table selects (part of the layout definition —
# folded into the stamp so changing them invalidates prebuilt tables).
_BUCKET_COLS = {
    "orders": ("o_orderkey", "o_orderstatus", "o_orderpriority"),
    "lineitem": ("l_orderkey", "l_extendedprice", "l_discount"),
}


def _source_stamp(sf_dir: str) -> str:
    """Identity of the source parquet files (path+size+mtime) PLUS the
    layout definition (bucket count, selected/sort columns): a bucketed
    table is reused only when both match — the N1 skip-processed
    semantic applied to layout maintenance. Without the layout
    fingerprint, a code change (say, a bucket-count bump) would silently
    serve the stale pre-built tables to any session with a persistent
    metastore."""
    parts = []
    for t in ("orders", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(p)
        cols = ",".join(_BUCKET_COLS[t])
        parts.append(f"{p}:{st.st_size}:{int(st.st_mtime_ns)}:{_BUCKETS}:{cols}")
    return "|".join(parts)


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders+lineitem as bucketed, bucket-sorted external tables;
    skipped entirely when the tables already exist for the current source
    stamp (so repeated queries pay the layout cost once, like a real
    lakehouse OPTIMIZE). Returns the table names."""
    key = _sf_key(sf_dir)
    t_orders, t_lineitem = f"b_orders_{key}", f"b_lineitem_{key}"
    base = _SCRATCH.parent / "bucketed" / key
    stamp_file = base / "_source_stamp"
    stamp = _source_stamp(sf_dir)
    if (
        stamp_file.exists()
        and stamp_file.read_text() == stamp
        and spark.catalog.tableExists(t_orders)
        and spark.catalog.tableExists(t_lineitem)
    ):
        return t_orders, t_lineitem
    o = load_table(spark, sf_dir, "orders").select(*_BUCKET_COLS["orders"])
    li = load_table(spark, sf_dir, "lineitem").select(*_BUCKET_COLS["lineitem"])
    (
        o.write.mode("overwrite")
        .bucketBy(_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / t_orders))
        .format("parquet")
        .saveAsTable(t_orders)
    )
    (
        li.write.mode("overwrite")
        .bucketBy(_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / t_lineitem))
        .format("parquet")
        .saveAsTable(t_lineitem)
    )
    base.mkdir(parents=True, exist_ok=True)
    stamp_file.write_text(stamp)
    return t_orders, t_lineitem


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located orders ⋈ lineitem join over the bucketed tables
    (separate from the rollup so tests can assert its Exchange-free plan)."""
    t_orders, t_lineitem = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders).filter(F.col("o_orderstatus") == "F")
    li = spark.table(t_lineitem)
    return o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))


@register("q_bucketed_join", oracle=_BUCKETED_ORACLE, tags=("phase2", "join", "bucketing"))
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-fact join via bucketed tables, + priority rollup."""
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q_python_datasource — custom Python DataSource (Spark 4
# pyspark.sql.datasource): the source surface for inputs that aren't
# files (APIs, feeds, synthetic generators). The generator emits rows as
# a pure md5 function of doc_id across 8 planned partitions
# (sources/pysource.py), so a DuckDB generate_series with the same md5
# arithmetic reproduces the content exactly — partitioning provably
# cannot leak into results. Scale: each executor generates only its id
# range; no driver materialization, no shuffle before the final agg.
# ---------------------------------------------------------------------------

_PYSRC_N = 1000

def _pysrc_oracle() -> str:
    from ..operators.dedup import _hexval6_sql
    from ..sources.pysource import LANGS

    langs_sql = ", ".join(f"'{l}'" for l in LANGS)
    nib1 = "(instr('0123456789abcdef', substring(h, 1, 1)) - 1)"
    return f"""
WITH ids AS (SELECT unnest(generate_series(0, {_PYSRC_N - 1})) AS doc_id),
f AS (
    SELECT doc_id, h,
           ([{langs_sql}])[{nib1} % {len(LANGS)} + 1] AS lang,
           CAST({_hexval6_sql('h', 1)} % 1000 AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, md5('doc:' || CAST(doc_id AS VARCHAR)) AS h FROM ids)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       min(h) AS min_fingerprint
FROM f GROUP BY lang
"""


@register("q_python_datasource", oracle=_pysrc_oracle(), tags=("phase1", "source", "api"))
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned custom Python DataSource -> per-lang aggregate."""
    from ..sources.pysource import make_synthetic_docs_source

    spark.dataSource.register(make_synthetic_docs_source())
    df = (
        spark.read.format("synthetic_docs")
        .option("n_rows", _PYSRC_N)
        .option("n_partitions", 8)
        .load()
    )
    return df.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min("fingerprint").alias("min_fingerprint"),
    )
