"""Window-free exact global ranking (scale-safe ntile / row_number).

An unpartitioned ``Window.orderBy(...)`` moves EVERY row to one
partition for the sort — the ``WindowExec: No Partition Defined``
warning, and a guaranteed single-task bottleneck at 100 TB. This module
computes the identical global ``row_number`` with a two-pass bucketed
rank instead:

1. collect approximate quantile boundaries of the leading sort key
   (``approxQuantile`` — one sampling pass, O(n_buckets) driver bytes,
   the same "sampled sort" Spark's own RangePartitioner performs);
2. assign each row a *deterministic* range bucket from those collected
   boundaries (a pure function of the row value — unlike
   ``repartitionByRange``, whose sampled boundaries are NOT stable
   across re-executions of the same subtree, so per-bucket counts and
   per-bucket ranks computed in separate subtrees could disagree);
3. rank within each bucket with a *partitioned* window, count rows per
   bucket (a ≤n_buckets-row aggregate, persisted), turn counts into
   cumulative offsets with a tiny self-join, and broadcast them back:
   ``global_rank = bucket_offset + within_bucket_row_number``.

Every shuffle is partitioned; the only driver action is the
O(n_buckets) quantile collect (same class as the k-means drift scalar
in operators/kmeans.py). Bucket count defaults to
``spark.sql.shuffle.partitions`` so parallelism self-scales with the
cluster configuration.

Ties on the leading key all land in one bucket (bucket assignment uses
the leading key only), and the within-bucket ordering uses the caller's
full tie-broken sort key — so the composed rank equals the global
``row_number`` under that total order, exactly.

RECIPE — replace any global window with three calls
---------------------------------------------------
Any ``Window.orderBy(...)`` with no ``partitionBy`` maps onto this
module mechanically (``q_quality_percentiles`` is the recipe verbatim;
``q_equidepth_bins`` / ``q_rfm_segments`` / ``q_interval_sweep`` /
``q_pack_global`` are production uses):

``row_number().over(Window.orderBy(score, id))`` + ``count(*).over()``::

    df = exact_global_rank(
        df, [F.asc("score"), F.asc("id")], F.col("score"),
        rank_name="rk", total_name="n",     # total rides along for free
    )

``ntile(k).over(Window.orderBy(score, id))``::

    df.withColumn("tile", ntile_from_rank(F.col("rk"), F.col("n"), k))

``sum(x).over(Window.orderBy(t).rowsBetween(unboundedPreceding,
currentRow))``::

    df = exact_global_cumsum(
        df, [F.asc("t"), F.asc("id")], F.col("t"), F.col("x"),
        cumsum_name="run",
    )

Rules of thumb: ``range_expr`` is the leading sort column itself
(negate it for DESC); always tie-break ``order_cols`` down to a unique
key or the "global window" you are replacing was nondeterministic to
begin with; when ranking several metrics of ONE DataFrame, compute all
boundary sketches in a single agg (``boundary_probes`` /
``boundary_accuracy``) and pass each via ``bounds=`` so the sampling
job runs once (see q_rfm_segments).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..cache import tracked_persist

__all__ = [
    "boundary_accuracy",
    "boundary_probes",
    "exact_global_cumsum",
    "exact_global_rank",
    "ntile_from_rank",
]


def boundary_probes(n_buckets: int) -> list[float]:
    """Quantile probe points for ``n_buckets`` range buckets — the ONE
    definition of the boundary-pass formula; callers precomputing
    bounds externally (q_rfm_segments' single 3-metric agg) must use
    this and :func:`boundary_accuracy` so their sketch matches what
    :func:`exact_global_rank` would compute itself."""
    return [i / n_buckets for i in range(1, n_buckets)]


def boundary_accuracy(n_buckets: int) -> int:
    """percentile_approx accuracy keeping bucket imbalance ~±10% of a
    bucket — no tighter (boundaries only balance work; rank exactness
    comes from the counted offsets, so a looser, cheaper sketch changes
    nothing)."""
    return 10 * n_buckets


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative bigint-valued columns.

    Uses Spark's IntegralDivide (``a div b``) via the function registry —
    stays in bigint end-to-end, so it is exact past 2^53 where a
    double-division round-trip would round the quotient.
    """
    return F.call_function("div", a, b)


def _range_buckets(
    df: DataFrame,
    range_expr: Column,
    *,
    n_buckets: int | None,
    bounds: Sequence[float] | None,
) -> DataFrame:
    """Tag each row with a deterministic range bucket ``__bkt`` of
    ``range_expr`` (``__rng``). Shared boundary/assignment pass for
    :func:`exact_global_rank` and :func:`exact_global_cumsum` — one
    sampled-quantile job, then a pure row-local bucket function (stable
    across re-executions, unlike repartitionByRange's resampled
    boundaries)."""
    if n_buckets is None:
        n_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    tagged = df.withColumn("__rng", range_expr.cast("double"))
    # One boundary pass as a partial-aggregated percentile_approx (3x
    # faster than df.stat.approxQuantile's RDD path, measured sf0.1).
    if bounds is None:
        qrow = tagged.agg(
            F.percentile_approx(
                "__rng",
                F.lit(boundary_probes(n_buckets)).cast("array<double>"),
                F.lit(boundary_accuracy(n_buckets)),
            ).alias("q")
        ).collect()
        bounds = qrow[0]["q"] or []
    bounds = sorted(set(bounds))
    if not bounds:
        bucket = F.lit(0)
    elif len(bounds) <= 256:
        # codegen-friendly comparison chain: bucket = first boundary the
        # value does not exceed (ties share a bucket; order-preserving)
        expr = F.lit(len(bounds))
        for i in range(len(bounds) - 1, -1, -1):
            expr = F.when(F.col("__rng") <= F.lit(bounds[i]), F.lit(i)).otherwise(expr)
        bucket = expr
    else:
        # thousands of buckets (big-cluster configs): O(B) CASE chains
        # bloat codegen, fall back to the array higher-order count
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: F.col("__rng") > b))
    return tagged.withColumn("__bkt", bucket)


def exact_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    range_expr: Column,
    *,
    n_buckets: int | None = None,
    rank_name: str = "rank",
    total_name: str | None = None,
    bounds: Sequence[float] | None = None,
) -> DataFrame:
    """Add ``rank_name`` = global row_number under ``order_cols``.

    ``range_expr`` must be a numeric (castable-to-double, non-null)
    expression that is monotone non-decreasing in the leading order
    column — pass the negated metric for a DESC leading sort. The
    ``order_cols`` must totally order the rows (tie-broken), exactly as
    they would in the ``Window.orderBy`` this replaces.

    ``total_name``: when set, also attach the total row count as a
    column of that name — derived from the persisted per-bucket counts
    (a <=n_buckets-row sum), saving callers a separate full count scan
    (ntile arithmetic needs the total).

    ``bounds``: precomputed approximate quantile boundaries of
    ``range_expr`` (any rough balance works; exactness never depends on
    them). Callers ranking several metrics of one DataFrame should
    compute all boundary sets in a single agg job (see q_rfm_segments)
    and pass them here, skipping this function's per-call boundary pass.
    """
    b = _range_buckets(df, range_expr, n_buckets=n_buckets, bounds=bounds)
    # <= n_buckets rows; persisted so the offset self-join and any total
    # computed from it read one materialization (KBs) — tracked so
    # long-lived harnesses reclaim the cache entry between queries.
    counts = tracked_persist(
        b.groupBy("__bkt").agg(F.count("*").alias("__cnt")),
        StorageLevel.MEMORY_AND_DISK,
    )
    offs = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b.__bkt") < F.col("a.__bkt"), "left")
        .groupBy(F.col("a.__bkt").alias("__bkt"))
        .agg(F.sum(F.coalesce(F.col("b.__cnt"), F.lit(0))).alias("__off"))
    )
    w = W.partitionBy("__bkt").orderBy(*order_cols)
    ranked = (
        b.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(offs), "__bkt")
        .withColumn(rank_name, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__rng", "__bkt", "__rn", "__off")
    )
    if total_name is not None:
        total = counts.agg(F.sum("__cnt").cast("bigint").alias(total_name))
        ranked = ranked.crossJoin(F.broadcast(total))
    return ranked


def exact_global_cumsum(
    df: DataFrame,
    order_cols: Sequence[Column],
    range_expr: Column,
    value_col: Column,
    *,
    n_buckets: int | None = None,
    cumsum_name: str = "cumsum",
    bounds: Sequence[float] | None = None,
) -> DataFrame:
    """Add ``cumsum_name`` = exact global running sum of ``value_col``
    (inclusive of the current row) under the total order ``order_cols``
    — the window-free generalization of :func:`exact_global_rank`
    (a rank is the cumsum of 1s).

    Same contract as :func:`exact_global_rank`: ``range_expr`` must be
    numeric, non-null and monotone non-decreasing in the leading order
    column; ``order_cols`` must totally order the rows. ``value_col``
    must be bigint-valued (cast upstream — exact, order-independent
    partial sums; signed values are fine, e.g. the ±1 deltas of a
    sweep line).

    Physical shape: sampled boundary pass, partitioned within-bucket
    running sum, a ≤n_buckets-row per-bucket total persisted and turned
    into broadcast cumulative offsets — every shuffle partitioned, no
    single-task WindowExec.
    """
    if cumsum_name in {"__rng", "__bkt", "__val", "__run", "__off", "__bsum"}:
        raise ValueError(
            f"cumsum_name {cumsum_name!r} collides with an internal "
            "working column of exact_global_cumsum"
        )
    b = _range_buckets(df, range_expr, n_buckets=n_buckets, bounds=bounds)
    val = value_col.cast("bigint").alias("__val")
    b = b.withColumn("__val", val)
    sums = tracked_persist(
        b.groupBy("__bkt").agg(F.sum("__val").alias("__bsum")),
        StorageLevel.MEMORY_AND_DISK,
    )
    offs = (
        sums.alias("a")
        .join(sums.alias("b"), F.col("b.__bkt") < F.col("a.__bkt"), "left")
        .groupBy(F.col("a.__bkt").alias("__bkt"))
        .agg(F.sum(F.coalesce(F.col("b.__bsum"), F.lit(0))).alias("__off"))
    )
    w = (
        W.partitionBy("__bkt")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        b.withColumn("__run", F.sum("__val").over(w))
        .join(F.broadcast(offs), "__bkt")
        .withColumn(cumsum_name, (F.col("__off") + F.col("__run")).cast("bigint"))
        .drop("__rng", "__bkt", "__val", "__run", "__off")
    )


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """Exact SQL ``ntile(n)`` from a 1-based global rank and row total.

    ntile gives the first ``total MOD n`` tiles one extra row; the
    closed form (all bigint, branch never divides by zero because the
    ELSE arm is only reached when q >= 1):

        q = total DIV n ; r = total MOD n ; cut = r * (q + 1)
        rank <= cut -> (rank-1) DIV (q+1) + 1
        else        -> r + (rank-cut-1) DIV q + 1
    """
    n_l = F.lit(n).cast("bigint")
    total = total.cast("bigint")
    q = _idiv(total, n_l)
    r = total - q * n_l
    cut = r * (q + F.lit(1))
    lo = _idiv(rank - F.lit(1), q + F.lit(1)) + F.lit(1)
    hi = r + _idiv(rank - cut - F.lit(1), F.greatest(q, F.lit(1))) + F.lit(1)
    return F.when(rank <= cut, lo).otherwise(hi).cast("bigint")
