"""Parquet table loaders for the driver's test tables.

Schemas are fixed and known (TESTDATA.md / FIXTURES.md); we rely on the
parquet footer rather than re-declaring them (parquet *is* the explicit
schema — no inference happens). Mirrors the reference's eager-validation
stance (SURVEY.md §1.2: Pydantic models at src/config/manager.py:13-162)
by checking expected columns on load.

At 100 TB these would be partitioned/bucketed tables behind a catalog;
the loader is the single place that would change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Minimal expected-column contract per table (subset check, not exhaustive).
_KEY_COLS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def _ts_to_micros(ts_type) -> F.Column:
    """Normalize an events ``ts`` column to a session-TZ timestamp (µs).

    - ``LongType``: TIMESTAMP(NANOS) read via nanosAsLong → integer ``div``
      1000 (NOT ``/``: epoch-nanos ~1.7e18 exceeds double's 2^53 mantissa,
      so float division is off by ±1µs) → timestamp_micros.
    - timestamp / timestamp_ntz: already µs; cast to session-TZ timestamp.
      With the UTC session timezone (session.prep) the NTZ wall clock IS
      the instant, matching DuckDB's naive-timestamp reading bit-for-bit.
    """
    from pyspark.sql import types as T

    if isinstance(ts_type, T.LongType):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
        # generations and TIMESTAMP(MICROS) in others. Normalize either to
        # a microsecond-precision session-TZ timestamp so event-time
        # windows and the DuckDB oracles (make_timestamp(epoch_ns(ts) //
        # 1000), identity on µs data) agree exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        df = df.withColumn("ts", _ts_to_micros(df.schema["ts"].dataType))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    missing = _KEY_COLS[name] - set(df.columns)
    if missing:
        raise ValueError(f"table {name!r} at {sf_dir} is missing columns {sorted(missing)}")
    return df


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a test table from parquet FOOTER metadata —
    a driver-side stat read (milliseconds, no Spark job).

    The auto_* cost gates need a row count before choosing a physical
    strategy; ``df.count()`` answers it with a full (column-pruned)
    scan job per bench run (~0.33 s warm at sf0.1, ~3.5 s cold). For
    the plain parquet-backed base tables the footer already carries the
    exact count, and at 100 TB this is precisely the statistic a
    catalog serves without any scan — the loader docstring's "behind a
    catalog" seam. Only valid for tables loaded 1:1 from parquet
    (every TABLE_NAMES entry; the events ts normalization is
    row-preserving); a gate over a DERIVED frame must either know its
    count by construction (q_mad_outliers' broadcast-join output) or
    fall back to ``df.count()``.
    """
    import pyarrow.parquet as pq

    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
            for root, _dirs, files in os.walk(path)
            for fn in files
            if fn.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def parallelize_narrow_scan(df: DataFrame, key: str) -> DataFrame:
    """Shuffle a scan out to full parallelism ONLY when it arrives with
    far fewer partitions than the cluster has cores.

    The driver's test parquet is one row group = one scan task, which
    would serialize any per-row kernel (mapInPandas, Arrow scalar UDF)
    scheduled behind it — and a slightly larger file that splits into
    2-3 row groups is the same cliff, so the gate is "fewer than half
    the default parallelism", not "exactly one". On splittable
    production input — many files / row groups, the 100 TB case — the
    scan already exceeds the core count and this is a NO-OP: zero
    shuffles of the (potentially huge) payload column. (Anything under
    half the cores is by construction small — ~128 MB row groups x
    cores/2 — so the repartition it triggers is cheap.) The partition
    probe is plan metadata only; no job runs.
    """
    threshold = max(2, df.sparkSession.sparkContext.defaultParallelism // 2)
    if df.rdd.getNumPartitions() >= threshold:
        return df
    return df.repartition(F.col(key))


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for spark.sql() queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
