"""Phase 1 — relational core over the TPC-H-ish tables (SURVEY.md §7).

The reference has no relational executor (SURVEY.md §2.4 "Absent join
types"); this module exposes Spark's full relational surface — every
join family, aggregation (incl. rollup/cube/grouping-sets), window
functions, sorts/top-k, set ops, scalar string/date/math functions —
each as a `queries()` entry with a DuckDB oracle.

Numeric determinism discipline (applies to every oracle here):
- money sums go through DECIMAL(18,2) casts (exact, order-independent)
  and are cast to DOUBLE only as the final step;
- sums of integral-valued doubles (l_quantity) are exact as doubles;
- averages are computed as exact-decimal-sum / count in one deterministic
  double division — never the engine's own avg() over doubles.

Scale notes are inline per query: which side broadcasts, where the
shuffle is, why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# q_pricing_summary — TPC-H Q1 shape: scan + filter + hash agg.
# Map-side partial agg (6 groups) -> exchange of 6 rows -> final agg; at
# 100 TB this is scan-bound, exactly what we want.
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_pricing_summary", oracle=_Q1_ORACLE, tags=("phase1", "agg", "bench"))
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (filter + group-by agg, A1 family)."""
    li = load_table(spark, sf_dir, "lineitem")
    ep, disc, tax = _dec("l_extendedprice"), _dec("l_discount"), _dec("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ep * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (F.sum(ep).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q_shipping_priority — TPC-H Q3 shape: 3-way join + agg + deterministic top-k.
# customer (filtered) broadcasts; orders⋈lineitem shuffles on orderkey.
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("q_shipping_priority", oracle=_Q3_ORACLE, tags=("phase1", "join", "bench"))
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: broadcast dim filter + fact join + top-k with tiebreak."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"), "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_local_supplier_volume — TPC-H Q5 shape: 6-way join, dims broadcast.
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
"""


@register("q_local_supplier_volume", oracle=_Q5_ORACLE, tags=("phase1", "join", "bench"))
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multiway join; region/nation/supplier broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Join families: semi / anti / left outer / full outer / range (theta).
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


@register("q_semi_join", oracle=_SEMI_ORACLE, tags=("phase1", "join"))
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers with at least one open order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


@register("q_anti_join", oracle=_ANTI_ORACLE, tags=("phase1", "join"))
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no pending orders (J5's core
    shape). Restricted to status 'P' so the result is non-degenerate at
    every scale factor (every customer has *some* order at sf>=0.01)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_LEFT_OUTER_ORACLE = """
SELECT c.c_custkey,
       count(o.o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@register("q_left_outer_join", oracle=_LEFT_OUTER_ORACLE, tags=("phase1", "join"))
def q_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER + agg preserving zero-order customers (J7 analog)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spent"),
        )
    )


_FULL_OUTER_ORACLE = """
WITH cn AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
"""


@register("q_full_outer_join", oracle=_FULL_OUTER_ORACLE, tags=("phase1", "join"))
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER: per-nation customer vs supplier counts."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("n_customers"))
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("n_suppliers"))
    j = cn.join(sn, "nationkey", "full")
    return j.select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


_RANGE_JOIN_ORACLE = """
SELECT o.o_orderkey,
       count(*) AS n_quick_lines,
       CAST(sum(l.l_quantity) AS DOUBLE) AS quick_qty
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
GROUP BY o.o_orderkey
"""


@register("q_range_join", oracle=_RANGE_JOIN_ORACLE, tags=("phase1", "join"))
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: lineitems shipped within 60 days of order.

    J3's interval-overlap analog on time (SURVEY.md §2.4). The equi key
    keeps it a hash join with a residual range predicate — no cartesian.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        o.join(l, cond)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_quick_lines"),
            F.sum("l_quantity").alias("quick_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation breadth: distinct, rollup, cube, grouping sets, pivot,
# scalar-subquery compare.
# ---------------------------------------------------------------------------

_DISTINCT_AGG_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_distinct_agg", oracle=_DISTINCT_AGG_ORACLE, tags=("phase1", "agg"))
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (expand + two-phase agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


_AD_RSD = 0.02  # requested HLL++ relative standard deviation
# Acceptance margin: the estimate's error is ~N(0, rsd*n), so 6 sigma is
# a never-fires-by-chance bound (P < 1e-9 per group) that still catches
# real sketch breakage (wrong hash width, lost merge, unit mixups).
_AD_SIGMAS = 6.0

_AD_ORACLE = f"""
SELECT l_returnflag,
       count(DISTINCT l_partkey)  AS n_parts_exact,
       count(DISTINCT l_orderkey) AS n_orders_exact,
       TRUE AS parts_within_rsd,
       TRUE AS orders_within_rsd
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_approx_distinct", oracle=_AD_ORACLE, tags=("phase1", "agg", "approx", "eval"))
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) with an error-bound verdict oracle.

    The HLL estimate itself never leaves the query (DuckDB cannot
    reproduce Spark's sketch); what is emitted — and what the oracle
    pins — is the exact distinct count plus whether the estimate landed
    within ``_AD_SIGMAS`` standard deviations (sd = rsd * n_exact) of
    it. A FALSE anywhere fails the hash check, so the correctness gate
    doubles as the sketch's acceptance test — the same upgrade pattern
    as q_approx_quantile_eval (VERDICT r5, next #2). The production
    approximate path (no exact pass) stays available via the same
    aggregate; the exact pass here is the acceptance harness.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Three separate aggregations joined on the 3-row group key instead
    # of one agg with two DISTINCT columns: Spark plans multi-distinct
    # via Expand (row count x3 through the shuffle); splitting keeps
    # each shuffle at input cardinality on two pruned columns
    # (measured 4.6 s -> 0.7 s at sf0.1, identical values).
    # count(col) after distinct, NOT count(*): count(DISTINCT x) never
    # counts NULL, but the distinct-then-count rewrite keeps one
    # (group, NULL) row that count(*) would include (fuzz --nulls).
    pk = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("l_partkey").alias("n_parts_exact"))
    )
    ok = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("l_orderkey").alias("n_orders_exact"))
    )
    hll = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", _AD_RSD).alias("__apx_p"),
        F.approx_count_distinct("l_orderkey", _AD_RSD).alias("__apx_o"),
    )
    # eqNullSafe, not equi-join: all three legs group by the same key, so
    # a NULL l_returnflag group must survive the reassembly exactly as a
    # single GROUP BY would keep it (plain `=` would silently drop it).
    ok = ok.withColumnRenamed("l_returnflag", "__k2")
    hll = hll.withColumnRenamed("l_returnflag", "__k3")
    agg = (
        pk.join(ok, F.col("l_returnflag").eqNullSafe(F.col("__k2")))
        .join(hll, F.col("l_returnflag").eqNullSafe(F.col("__k3")))
        .drop("__k2", "__k3")
    )

    def _within(apx: str, exact: str):
        margin = F.lit(_AD_SIGMAS * _AD_RSD) * F.col(exact)
        return (
            F.abs(F.col(apx).cast("double") - F.col(exact)) <= margin
        ).alias(apx.replace("__apx", "within"))

    return agg.select(
        "l_returnflag",
        "n_parts_exact",
        "n_orders_exact",
        _within("__apx_p", "n_parts_exact").alias("parts_within_rsd"),
        _within("__apx_o", "n_orders_exact").alias("orders_within_rsd"),
    )


_ROLLUP_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("q_rollup", oracle=_ROLLUP_ORACLE, tags=("phase1", "agg"))
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (north-star extension; absent in reference §2.5)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
    )


_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_rows,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("q_cube", oracle=_CUBE_ORACLE, tags=("phase1", "agg"))
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


_GROUPING_SETS_ORACLE = """
SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nationkey,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register("q_grouping_sets", oracle=_GROUPING_SETS_ORACLE, tags=("phase1", "agg"))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
               coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nationkey,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


_PIVOT_VALUES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_PIVOT_ORACLE = """
SELECT o_orderstatus,
       count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
       count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
       count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
       count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
FROM orders
GROUP BY o_orderstatus
"""


@register("q_pivot", oracle=_PIVOT_ORACLE, tags=("phase1", "agg"))
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra job to discover values)."""
    o = load_table(spark, sf_dir, "orders")
    # fill(0): pivot().count() yields NULL for an empty (status, priority)
    # combo while the oracle's count(*) FILTER yields 0 — align on 0 so
    # sparse fixtures can't diverge (current fixtures are dense; latent)
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PIVOT_VALUES)
        .count()
        .na.fill(0, subset=_PIVOT_VALUES)
    )


_SCALAR_SUBQUERY_ORACLE = """
WITH stats AS (
    SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
    FROM orders
)
SELECT count(*) AS n_above,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_above
FROM orders, stats
WHERE o_totalprice > stats.avg_price
"""


@register("q_scalar_subquery", oracle=_SCALAR_SUBQUERY_ORACLE, tags=("phase1", "agg"))
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price (exact-decimal threshold)."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count("*")).alias("avg_price")
    )
    return (
        o.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .agg(
            F.count("*").alias("n_above"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_above"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (W-group + north-star extras: rank/lag/frames/ntile).
# ---------------------------------------------------------------------------

_WINDOW_RANK_ORACLE = """
SELECT c_nationkey, c_custkey, c_acctbal,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER w AS rn
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
QUALIFY rn <= 3
"""


@register("q_window_rank", oracle=_WINDOW_RANK_ORACLE, tags=("phase1", "window"))
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by balance (W1/W2 enumeration family)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


_WINDOW_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       lag(o_orderkey) OVER w AS prev_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
"""


@register("q_window_lag_lead", oracle=_WINDOW_LAG_ORACLE, tags=("phase1", "window"))
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-customer order history (W3's lead + lag mirror)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag(F.col("o_orderdate").cast("date")).over(w)
        ).alias("days_since_prev"),
    )


_WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       max(o_orderkey) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max_key
FROM orders
"""


@register("q_window_running", oracle=_WINDOW_RUNNING_ORACLE, tags=("phase1", "window"))
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal-exact sum + running max (W4's monotone-clamp shape)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.max("o_orderkey").over(w).alias("running_max_key"),
    )


_WINDOW_NTILE_ORACLE = """
SELECT c_custkey, c_acctbal,
       ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile
FROM customer
"""


@register("q_window_ntile", oracle=_WINDOW_NTILE_ORACLE, tags=("phase1", "window"))
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartiles by balance (single-partition window — fine for dim
    tables; at fact scale use operators/rank.py's two-pass bucketed rank
    as q_rfm_segments does). Whitelisted in the plan-shape tripwire
    (tests/test_plans.py::test_no_unpartitioned_windows_anywhere) as the
    deliberate API-coverage demonstration of raw ntile."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("balance_quartile")
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / distinct-on / set ops.
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q_topk", oracle=_TOPK_ORACLE, tags=("phase1", "sort"))
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k (TakeOrderedAndProject — no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


_DISTINCT_ON_ORACLE = """
SELECT o_custkey, o_orderkey AS latest_orderkey, CAST(o_orderdate AS DATE) AS latest_orderdate
FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
)
WHERE rn = 1
"""


@register("q_distinct_on", oracle=_DISTINCT_ON_ORACLE, tags=("phase1", "sort"))
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON-style latest-order-per-customer via ordered window (§1.3
    determinism: full-key tiebreak, never dropDuplicates on unordered data)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").cast("date").alias("latest_orderdate"),
        )
    )


_SET_OPS_ORACLE = """
SELECT 'both' AS tag, o_custkey FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'open_only' AS tag, o_custkey FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
"""


@register("q_set_ops", oracle=_SET_OPS_ORACLE, tags=("phase1", "setop"))
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over customer key sets."""
    o = load_table(spark, sf_dir, "orders")
    open_k = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_k = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = open_k.intersect(done_k).select(F.lit("both").alias("tag"), "o_custkey")
    # subtract = EXCEPT DISTINCT (set semantics); exceptAll would keep
    # multiplicity and diverge from SQL EXCEPT.
    only = open_k.subtract(done_k).select(F.lit("open_only").alias("tag"), "o_custkey")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / case-when / array / json-map.
# ---------------------------------------------------------------------------

_STRING_FUNCS_ORACLE = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substring(p_name, 1, 8) AS name_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       translate(p_type, ' ', '_') AS type_mangled,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       len(string_split(p_name, ' ')) AS n_name_words,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       CASE WHEN p_name LIKE '%al%' THEN 1 ELSE 0 END AS has_al
FROM part
"""


@register("q_string_funcs", oracle=_STRING_FUNCS_ORACLE, tags=("phase1", "scalar"))
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/T12/T13-family scalar string functions, all JVM builtins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.translate("p_type", " ", "_").alias("type_mangled"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_name_words"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%al%"), 1).otherwise(0).alias("has_al"),
    )


_DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       quarter(o_orderdate) AS order_quarter,
       day(o_orderdate) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS order_month_end,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
FROM orders
"""


@register("q_date_funcs", oracle=_DATE_FUNCS_ORACLE, tags=("phase1", "scalar"))
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp scalar functions (absent in reference — §2.8 'Date
    functions: none'; required by the driver's timestamp columns)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofmonth(d).alias("order_day"),
        F.date_trunc("month", d).cast("date").alias("order_month_start"),
        F.last_day(d.cast("date")).alias("order_month_end"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


_MATH_FUNCS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS discount_amount,
       abs(l_extendedprice - l_quantity * 1000) AS price_deviation,
       CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_bucket,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_weeks,
       sqrt(l_quantity) AS qty_sqrt,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_extendedprice - 25000) AS DOUBLE) AS above_mid
FROM lineitem
"""


@register("q_math_funcs", oracle=_MATH_FUNCS_ORACLE, tags=("phase1", "scalar"))
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row IEEE-deterministic math (round/abs/floor/ceil/sqrt/mod/sign)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # rounded in DECIMAL: price*discount hits exact .005 ties constantly,
        # and double-rounding of ties differs between engines.
        F.round(_dec("l_extendedprice") * _dec("l_discount"), 2)
        .cast("double")
        .alias("discount_amount"),
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("price_deviation"),
        F.floor(F.col("l_extendedprice") / 100).alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_weeks"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 25000).alias("above_mid"),
    )


_CASE_WHEN_ORACLE = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS balance_band,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS band_total
FROM customer
GROUP BY 1
"""


@register("q_case_when", oracle=_CASE_WHEN_ORACLE, tags=("phase1", "scalar"))
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + agg."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("balance_band")
    )
    return c.groupBy(band).agg(
        F.count("*").alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("band_total"),
    )


_ARRAY_FUNCS_ORACLE = """
WITH w AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
)
SELECT doc_id,
       len(ws) AS n_words,
       len(list_distinct(ws)) AS n_distinct_words,
       ws[1] AS first_word,
       ws[-1] AS last_word,
       CAST(list_contains(ws, 'spark') AS INT) AS has_spark,
       list_sort(list_distinct(ws))[1] AS min_word
FROM w
"""


@register("q_array_funcs", oracle=_ARRAY_FUNCS_ORACLE, tags=("phase1", "scalar"))
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text (§2.8 array/map coverage)."""
    from ..functions.text import words

    d = load_table(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    return d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("n_distinct_words"),
        F.element_at(ws, 1).alias("first_word"),
        F.element_at(ws, -1).alias("last_word"),
        F.array_contains(ws, "spark").cast("int").alias("has_spark"),
        F.element_at(F.array_sort(F.array_distinct(ws)), 1).alias("min_word"),
    )


# TRY_CAST + json_valid guard: production event payloads contain
# malformed JSON and non-numeric values for '$.k' (nested objects,
# quoted strings). Spark's get_json_object returns NULL on bad JSON but
# a plain ANSI cast hard-fails the JOB on a non-numeric extract
# (props-fuzz probe: {"k": {"nested": 1}}); DuckDB's json_extract_string
# errors on malformed JSON outright. try_cast/NULL-on-bad on both sides
# makes dirty payloads degrade to NULL-ignored aggregates identically.
_JSON_FUNCS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(TRY_CAST(CASE WHEN json_valid(props)
                              THEN json_extract_string(props, '$.k') END
                         AS BIGINT)) AS BIGINT) AS sum_k,
       min(TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT)) AS min_k,
       max(TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register("q_json_funcs", oracle=_JSON_FUNCS_ORACLE, tags=("phase1", "scalar"))
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (T14 from_json analog) + agg over events."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q_salted_join — skew-mitigated equi-join: hot user_ids in `events` are
# split across 8 deterministic salts before joining a per-user dim. The
# oracle is the PLAIN join: salting must be invisible in the result.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
WITH dim AS (
    SELECT user_id, count(*) AS user_events
    FROM events GROUP BY user_id
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(d.user_events) AS BIGINT) AS sum_user_events
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY e.event_type
"""


@register("q_salted_join", oracle=_SALTED_ORACLE, tags=("phase1", "join", "skew"))
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/joins.py): same result, bounded tasks."""
    from ..operators.joins import salted_join

    e = load_table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(F.count("*").alias("user_events"))
    joined = salted_join(
        e.select("event_id", "user_id", "event_type"),
        dim,
        keys=["user_id"],
        salt_src="event_id",
        n_salts=8,
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("user_events").alias("sum_user_events"),
    )


# ---------------------------------------------------------------------------
# q_join_auto — the fifth planner gate (VERDICT r7, next #6): plain vs
# salted equi-join chosen from the MEASURED fact-side key-skew ratio
# (q_key_skew's statistic driving operators/planner.auto_join). Two
# legs so the driver exercises the gate itself:
#   leg 'user' joins on the near-uniform user_id (ratio ~1.3 at every
#   SF -> plain always);
#   leg 'hot' joins on a constructed key where every even event shares
#   one value (ratio = n_keys/2: 8.0 at sf0.001 -> plain, 75 at sf0.01
#   and 750 at sf0.1 -> salted), so BOTH branches and a gate FLIP are
#   hash-checked across the driver's scale factors.
# Salting is result-invisible, so the oracle is the plain join plus the
# same ratio CASE reproduced as a scalar subquery.
# ---------------------------------------------------------------------------

_JOIN_AUTO_THR = 16.0

_HK_SQL = "CASE WHEN event_id % 2 = 0 THEN CAST(-1 AS BIGINT) ELSE user_id END"

_JOIN_AUTO_ORACLE = f"""
WITH dima AS (
    SELECT user_id, count(*) AS c FROM events GROUP BY user_id
),
statsa AS (
    SELECT CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt) AS ratio
    FROM (SELECT user_id, count(*) AS cnt FROM events
          WHERE user_id IS NOT NULL GROUP BY user_id)
),
he AS (
    SELECT event_id, event_type, {_HK_SQL} AS hk FROM events
),
dimb AS (
    SELECT hk, count(*) AS c FROM he GROUP BY hk
),
statsb AS (
    SELECT CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt) AS ratio
    FROM (SELECT hk, count(*) AS cnt FROM he
          WHERE hk IS NOT NULL GROUP BY hk)
)
SELECT 'user' AS leg, e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(d.c) AS BIGINT) AS sum_dim,
       (SELECT CASE WHEN ratio > {_JOIN_AUTO_THR} THEN 'salted' ELSE 'plain' END
        FROM statsa) AS strategy
FROM events e JOIN dima d ON e.user_id = d.user_id
GROUP BY e.event_type
UNION ALL
SELECT 'hot' AS leg, e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(d.c) AS BIGINT) AS sum_dim,
       (SELECT CASE WHEN ratio > {_JOIN_AUTO_THR} THEN 'salted' ELSE 'plain' END
        FROM statsb) AS strategy
FROM he e JOIN dimb d ON e.hk = d.hk
GROUP BY e.event_type
"""


@register("q_join_auto", oracle=_JOIN_AUTO_ORACLE, tags=("phase1", "join", "skew", "planner"))
def q_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-gated join (auto_join): gate decision rides the hashed result."""
    from ..operators.planner import auto_join

    e = load_table(spark, sf_dir, "events")

    dima = e.groupBy("user_id").agg(F.count("*").alias("c"))
    a = auto_join(
        e.select("event_id", "user_id", "event_type"),
        dima,
        ["user_id"],
        "event_id",
        skew_threshold=_JOIN_AUTO_THR,
        strategy_name="strategy",
    )
    lega = a.groupBy("event_type", "strategy").agg(
        F.count("*").alias("n"), F.sum("c").alias("sum_dim")
    ).select(F.lit("user").alias("leg"), "event_type", "n", "sum_dim", "strategy")

    hk = F.when(F.col("event_id") % 2 == 0, F.lit(-1).cast("bigint")).otherwise(
        F.col("user_id")
    )
    he = e.select("event_id", "event_type", hk.alias("hk"))
    dimb = he.groupBy("hk").agg(F.count("*").alias("c"))
    b = auto_join(
        he,
        dimb,
        ["hk"],
        "event_id",
        skew_threshold=_JOIN_AUTO_THR,
        strategy_name="strategy",
    )
    legb = b.groupBy("event_type", "strategy").agg(
        F.count("*").alias("n"), F.sum("c").alias("sum_dim")
    ).select(F.lit("hot").alias("leg"), "event_type", "n", "sum_dim", "strategy")

    return lega.unionByName(legb)


# ---------------------------------------------------------------------------
# q_percentiles — exact interpolated percentiles (Spark `percentile` ==
# DuckDB `quantile_cont`: both sort and linearly interpolate, and the
# interpolation arithmetic on doubles is identical). Median/p25/p75 of
# l_quantity per returnflag.
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT l_returnflag,
       count(*) AS n,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_percentiles", oracle=_PCT_ORACLE, tags=("phase1", "agg"))
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based, no sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
    )


# ---------------------------------------------------------------------------
# q_map_funcs — MapType surface (F5 header-key projection analog,
# chunking_manager.py:161-164): build a headers map, map_filter to the
# "Header N" keys, serialize entries sorted. The oracle constructs the
# same string directly (DuckDB MAPs don't hash-compare with Spark's, so
# the comparison surface is the serialized entry list).
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
-- list_filter: a NULL header VALUE serializes as an absent entry (the
-- engine's concat(key,'=',NULL) -> NULL entry is dropped by
-- array_join), not as a NULL whole-string (what a bare || chain would
-- give; fuzz --nulls)
SELECT doc_id,
       coalesce(array_to_string(list_filter(
           ['Header 1=' || substring(text, 1, 8),
            'Header 2=' || upper(lang)],
           x -> x IS NOT NULL), '|'), '') AS headers,
       2 AS n_header_keys
FROM documents
"""


@register("q_map_funcs", oracle=_MAP_ORACLE, tags=("phase1", "scalar", "map"))
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_filter/map_entries/transform over a MapType column (F5)."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("Header 1"), F.substring("text", 1, 8),
        F.lit("Header 2"), F.upper("lang"),
        F.lit("source"), F.col("source"),
    )
    filtered = F.map_filter(m, lambda k, v: k.startswith("Header "))
    entries = F.transform(
        F.map_entries(filtered), lambda e: F.concat(e.key, F.lit("="), e.value)
    )
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(entries), "|").alias("headers"),
        F.size(F.map_keys(filtered)).cast("int").alias("n_header_keys"),
    )


# ---------------------------------------------------------------------------
# q_revenue_forecast — TPC-H Q6 shape: pure scan + tight range predicates
# + single global agg. Everything pushes to the parquet scan; at 100 TB
# the job IS the scan (zero shuffle beyond the 1-row final agg).
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q_revenue_forecast", oracle=_Q6_ORACLE, tags=("phase1", "agg", "tpch"))
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: predicate-pushdown scan + decimal-exact revenue sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q_returned_items — TPC-H Q10 shape: fact x fact x dims with a top-k.
# orders⋈lineitem shuffles on orderkey; customer/nation broadcast; the
# top-20 is a 20-row exchange after partial per-partition limits.
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q_returned_items", oracle=_Q10_ORACLE, tags=("phase1", "join", "tpch"))
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue top-20 (fact join + broadcast dims)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_window_range_frame — RANGE frames + percent_rank/cume_dist (the
# window features SURVEY.md §2.6 lists as absent from the reference):
# 30-day trailing revenue per customer over order event-time, ranked
# within market segment.
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
WITH o AS (
    SELECT o_custkey, o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS od_s,
           CAST(o_totalprice AS DECIMAL(18,2)) AS price
    FROM orders
)
SELECT o_custkey, o_orderkey,
       CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY od_s NULLS FIRST
                             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d,
       percent_rank() OVER (PARTITION BY o_custkey ORDER BY od_s NULLS FIRST, o_orderkey) AS pr,
       cume_dist() OVER (PARTITION BY o_custkey ORDER BY od_s NULLS FIRST, o_orderkey) AS cd
FROM o
"""


@register("q_window_range_frame", oracle=_RANGE_FRAME_ORACLE, tags=("phase1", "window"))
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame trailing sum + percent_rank/cume_dist analytics."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("od_s"),
        _dec("o_totalprice").alias("price"),
    )
    w_range = (
        W.partitionBy("o_custkey").orderBy("od_s").rangeBetween(-2592000, 0)
    )
    w_rank = W.partitionBy("o_custkey").orderBy("od_s", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("price").over(w_range).cast("double").alias("trailing_30d"),
        F.percent_rank().over(w_rank).alias("pr"),
        F.cume_dist().over(w_rank).alias("cd"),
    )


# ---------------------------------------------------------------------------
# q_moments — mean/variance/stddev via EXPLICIT decimal sums (never the
# engines' streaming variance aggregates, whose accumulation order
# varies): var = (n*sum(x^2) - sum(x)^2) / n^2, from two exact decimal
# sums. Values are quantized to scale 3 BEFORE squaring so every sum is
# exactly representable as a double (sum*10^6 < 2^53) — the
# decimal->double conversion is then exact in both engines (at scale 12
# DuckDB's hugeint->double path rounds differently in the last ulp).
# ---------------------------------------------------------------------------

_MOMENTS_ORACLE = """
WITH s AS (
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS s1,
           CAST(sum(CAST(value AS DECIMAL(18,3)) * CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS s2
    FROM events
    GROUP BY event_type
)
SELECT event_type, n,
       s1 / n AS mean_value,
       greatest(0.0, (n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * n)) AS var_pop,
       sqrt(greatest(0.0, (n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * n))) AS std_pop
FROM s
"""


@register("q_moments", oracle=_MOMENTS_ORACLE, tags=("phase1", "agg", "stats"))
def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mean/variance/stddev from exact decimal sums."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,3)")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    # clamp: the cancellation n*s2 - s1^2 can land one ulp below zero
    # when true variance is 0 (singleton/duplicate-value groups) —
    # sqrt(-eps) is NaN here and an OutOfRange ERROR in DuckDB. The
    # inputs are exact-deterministic doubles, so the clamp fires
    # identically in both engines.
    var = F.greatest(
        F.lit(0.0), (n * s2 - s1 * s1) / (n.cast("double") * n)
    )
    return s.select(
        "event_type",
        "n",
        (s1 / n).alias("mean_value"),
        var.alias("var_pop"),
        F.sqrt(var).alias("std_pop"),
    )


# ---------------------------------------------------------------------------
# q_unpivot — wide->long melt (stack): per-lang doc counts by source
# pivoted wide, then unpivoted back to (source, lang, n). Exercises the
# inverse of q_pivot.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT source,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS en,
           sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS de,
           sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS fr
    FROM documents GROUP BY source
)
SELECT source, lang, CAST(n AS BIGINT) AS n
FROM wide UNPIVOT (n FOR lang IN (en, de, fr))
"""


@register("q_unpivot", oracle=_UNPIVOT_ORACLE, tags=("phase1", "agg"))
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt via stack() — inverse of q_pivot."""
    d = load_table(spark, sf_dir, "documents")
    wide = d.groupBy("source").agg(
        *[
            F.sum(F.when(F.col("lang") == lang, 1).otherwise(0)).alias(lang)
            for lang in ("en", "de", "fr")
        ]
    )
    return wide.select(
        "source",
        F.expr("stack(3, 'en', en, 'de', de, 'fr', fr) AS (lang, n)"),
    ).select("source", "lang", F.col("n").cast("bigint"))


# ---------------------------------------------------------------------------
# q_minmax_by — min_by/max_by (argmin/argmax) aggregates: each user's
# first and last event value/type keyed by event_id (unique => fully
# deterministic; DuckDB spells them arg_min/arg_max).
# ---------------------------------------------------------------------------

_MINMAX_BY_ORACLE = """
SELECT user_id,
       arg_min(value, event_id) AS first_value,
       arg_max(value, event_id) AS last_value,
       arg_min(event_type, event_id) AS first_type,
       count(*) AS n_events
FROM events
GROUP BY user_id
"""


@register("q_minmax_by", oracle=_MINMAX_BY_ORACLE, tags=("phase1", "agg"))
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregates over a unique ordering key."""
    e = load_table(spark, sf_dir, "events")
    # FILTER per leg: DuckDB's arg_min/arg_max skip rows whose ARG is
    # NULL (aggregate NULL-input discipline) while Spark's min_by/max_by
    # happily return the NULL sitting at the extreme key (fuzz --nulls).
    # The filtered form is also the more useful semantics: "first
    # non-missing value", not "whatever the first row held".
    return e.groupBy("user_id").agg(
        F.expr(
            "min_by(value, event_id) FILTER (WHERE value IS NOT NULL)"
        ).alias("first_value"),
        F.expr(
            "max_by(value, event_id) FILTER (WHERE value IS NOT NULL)"
        ).alias("last_value"),
        F.expr(
            "min_by(event_type, event_id) FILTER (WHERE event_type IS NOT NULL)"
        ).alias("first_type"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q_histogram — fixed-width value binning (the width_bucket shape):
# events.value distribution in 10 bins of width 10 over [0, 100).
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT CAST(least(greatest(floor(value / 10), 0), 9) AS INT) AS bin,
       count(*) AS n,
       min(value) AS lo,
       max(value) AS hi
FROM events
GROUP BY 1
"""


@register("q_histogram", oracle=_HISTOGRAM_ORACLE, tags=("phase1", "agg"))
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over event values (10 clamped bins)."""
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(F.greatest(F.floor(F.col("value") / 10), F.lit(0)), F.lit(9)).cast("int")
    return e.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# ===========================================================================
# TPC-H query-shape breadth (adapted to the driver's reduced schemas: no
# partsupp, no l_commitdate/l_receiptdate/l_shipmode, no c_phone).  These
# cover the canonical plan shapes the reference lacks entirely (SURVEY.md
# §2.4 "Absent join types"): EXISTS semi-join + agg (Q4), two-sided
# nation-pair join (Q7), market-share ratio (Q8), outer-join distribution
# (Q13), conditional-percentage (Q14), argmax-equality (Q15), correlated
# avg subquery (Q17), having-IN (Q18), disjunctive pushdown (Q19), and
# NOT EXISTS + scalar subquery (Q22).
# ===========================================================================


_ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register("q_order_priority", oracle=_ORDER_PRIORITY_ORACLE, tags=("phase1", "join", "agg"))
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join then count per priority.

    Scale: the semi-join shuffles both sides on l_orderkey/o_orderkey with
    map-side distinct on the lineitem side; the final agg is 5 groups.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_VOLUME_SHIPPING_ORACLE = """
SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q_volume_shipping", oracle=_VOLUME_SHIPPING_ORACLE, tags=("phase1", "join", "agg"))
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by ship year.

    Scale: nation (25 rows) and the nation-filtered supplier/customer dims
    broadcast; the only big shuffle is lineitem ⋈ orders on orderkey.
    The disjunctive nation-pair predicate is applied after both dim joins,
    on already-broadcast-joined columns (no extra shuffle).
    """
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sup = F.broadcast(
        s.join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", "supp_nation")
    )
    cust = F.broadcast(
        c.join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        .select("c_custkey", "cust_nation")
    )
    ep, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(sup, li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(ep * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


_MARKET_SHARE_ORACLE = """
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


@register("q_market_share", oracle=_MARKET_SHARE_ORACLE, tags=("phase1", "join", "agg"))
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional order volume per year.

    Scale: part/customer/supplier/nation/region dims all broadcast after
    their filters; the big shuffle is lineitem ⋈ orders on orderkey. The
    ratio divides two exact decimal sums as a final double step.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cust_in_region = F.broadcast(
        c.join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .select("c_custkey")
    )
    sup = F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == n1.s_nk).select("s_suppkey", "supp_nation"))
    ep, disc = _dec("l_extendedprice"), _dec("l_discount")
    vol = (ep * (F.lit(1) - disc)).alias("volume")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_in_region, o.o_custkey == F.col("c_custkey"))
        .join(sup, li.l_suppkey == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "supp_nation")
    )
    nation_vol = F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0)))
    return joined.groupBy("o_year").agg(
        (nation_vol.cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
    )


_CUSTOMER_DISTRIBUTION_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q_customer_distribution", oracle=_CUSTOMER_DISTRIBUTION_ORACLE, tags=("phase1", "join", "agg"))
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserving zero-order customers, then a
    two-level count-of-counts distribution.

    Scale: shuffle on custkey for the outer join + first agg (same key, so
    AQE coalesces into one exchange); second agg is tiny.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_PROMO_REVENUE_ORACLE = """
SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q_promo_revenue", oracle=_PROMO_REVENUE_ORACLE, tags=("phase1", "join", "agg"))
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-percentage aggregate over a broadcast join.

    Scale: part broadcasts (small dim); lineitem scan is date-pruned by a
    pushed-down predicate; single scalar out — no meaningful shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    ep, disc = _dec("l_extendedprice"), _dec("l_discount")
    vol = ep * (F.lit(1) - disc)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))).cast("double")
    total = F.sum(vol).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * promo / total).cast("double").alias("promo_revenue"))
    )


_TOP_SUPPLIER_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


@register("q_top_supplier", oracle=_TOP_SUPPLIER_ORACLE, tags=("phase1", "join", "agg"))
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax via exact-decimal max-equality (ties kept).

    Scale: revenue agg shuffles on suppkey; the max is a 1-row broadcast
    back; decimal arithmetic keeps the equality exact (doubles would not).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    ep, disc = _dec("l_extendedprice"), _dec("l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(ep * (F.lit(1) - disc)).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_rev == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


_SMALL_QTY_REVENUE_ORACLE = """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (
    SELECT 0.5 * (CAST(sum(l_quantity) AS DOUBLE) / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


@register("q_small_qty_revenue", oracle=_SMALL_QTY_REVENUE_ORACLE, tags=("phase1", "join", "subquery"))
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average-quantity subquery.

    Decorrelated as groupBy(partkey).agg(sum/count) joined back — the
    idiomatic Spark rewrite; avg computed as exact-sum / count so both
    engines produce the identical double threshold.

    Scale: the per-part avg agg and the join shuffle on the same key
    (partkey) so AQE reuses the exchange; brand filter broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * (F.sum("l_quantity").cast("double") / F.count("*"))).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).cast("double").alias("avg_yearly"))
    )


_LARGE_ORDERS_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(l_quantity) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 100
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@register("q_large_orders", oracle=_LARGE_ORDERS_ORACLE, tags=("phase1", "join", "agg"))
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered IN subquery (large-volume orders).

    Scale: the HAVING agg and the semi-join and the lineitem re-join all
    shuffle on orderkey — one exchange reused three times under AQE; the
    surviving order set is small, so the customer join broadcasts it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, li.l_orderkey == F.col("big_ok"), "inner")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


_DISJUNCTIVE_PRED_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


@register("q_disjunctive_pred", oracle=_DISJUNCTIVE_PRED_ORACLE, tags=("phase1", "join"))
def q_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Scale: Catalyst extracts the common-key equi-join and keeps the
    disjunction as a post-join filter; part side broadcasts. The derivable
    single-side conjuncts (brand ∈ {1,2,3}, size ≤ 35, qty ≤ 30) push to
    the scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    ep, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(pred)
        .agg(F.sum(ep * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


_DORMANT_CUSTOMERS_ORACLE = """
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


@register("q_dormant_customers", oracle=_DORMANT_CUSTOMERS_ORACLE, tags=("phase1", "join", "subquery"))
def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar avg subquery + NOT EXISTS anti-join.

    The global average is computed as exact-decimal-sum / count (one
    deterministic double division) so the > threshold is bit-identical in
    both engines.

    Scale: the 1-row average broadcasts; the anti-join shuffles on custkey
    (orders side map-side-distinct'd by Spark's left_anti).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


_WINDOW_ANALYTIC_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       first_value(o_totalprice) OVER w AS cust_first_price,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cust_last_price,
       nth_value(o_totalprice, 2) OVER w AS cust_second_price,
       percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice NULLS FIRST, o_orderkey) AS price_pct_rank,
       cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice NULLS FIRST, o_orderkey) AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
"""


@register("q_window_analytics", oracle=_WINDOW_ANALYTIC_ORACLE, tags=("phase1", "window"))
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + percent_rank/cume_dist window analytics
    (the remaining analytic-function family absent from the reference —
    SURVEY.md §2.6 'Absent').

    Total orderings everywhere (ties broken by o_orderkey) keep every
    value deterministic for the hash compare. One shuffle on o_custkey
    serves all five functions (same partition spec).
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_price = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("cust_first_price"),
        F.last("o_totalprice").over(w_full).alias("cust_last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("cust_second_price"),
        F.percent_rank().over(w_price).alias("price_pct_rank"),
        F.cume_dist().over(w_price).alias("price_cume_dist"),
    )


_STRING_AGG_ORACLE = """
SELECT n_name,
       string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
       count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@register("q_string_agg", oracle=_STRING_AGG_ORACLE, tags=("phase1", "agg"))
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg family).

    collect_list alone is order-nondeterministic under parallelism;
    array_sort before array_join pins the result regardless of task
    arrival order — the only safe way to emit concatenated groups at
    scale.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count("*").alias("n_suppliers"),
        )
    )


_SOLE_FAULT_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R'
  AND n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


@register("q_sole_fault_supplier", oracle=_SOLE_FAULT_ORACLE, tags=("phase1", "join", "subquery"))
def q_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS against the
    same fact (suppliers solely at fault in multi-supplier orders),
    adapted to l_returnflag (no receipt/commit dates in this schema).

    Scale: both correlated subqueries become semi/anti joins on
    l_orderkey with a residual suppkey-inequality condition — three
    scans of lineitem shuffled on the same key, one exchange reused
    under AQE; nation-filtered supplier broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    sup = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey", "s_name")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    return (
        l1.join(sup, F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


_SET_OPS_ALL_ORACLE = """
SELECT 'both' AS tag, l_suppkey FROM (
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
)
UNION ALL
SELECT 'r_extra' AS tag, l_suppkey FROM (
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
)
"""


@register("q_set_ops_all", oracle=_SET_OPS_ALL_ORACLE, tags=("phase1", "setop"))
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag semantics (multiplicity kept).

    Scale: both plan as a single count-per-key aggregate on each side
    plus a generate/min — one shuffle on the key, no row-by-row
    matching.
    """
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    both = r.intersectAll(a).select(F.lit("both").alias("tag"), "l_suppkey")
    extra = r.exceptAll(a).select(F.lit("r_extra").alias("tag"), "l_suppkey")
    return both.unionByName(extra)


# ---------------------------------------------------------------------------
# q_correlation — Pearson correlation / population covariance / OLS slope
# from EXACT decimal sufficient statistics. Spark's corr()/covar_pop()
# accumulate in float and are summation-order-dependent (non-reproducible
# across partitionings, and they drift vs any oracle); instead we take
# exact DECIMAL sums of x, y, x*y, x*x, y*y — order-independent, one
# map-side-combined shuffle — and evaluate the closed-form formulas in
# DOUBLE as a final deterministic step. The formula strings are shared
# verbatim with the DuckDB oracle so both engines run the identical IEEE
# expression tree on identical exact inputs.
# ---------------------------------------------------------------------------

_CORR_STATS = """
         count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
         sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxy,
         sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxx,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS syy
"""

# The huge exact sums (>2^53 as scaled ints) convert to DOUBLE with
# engine-specific last-bit rounding, so every derived statistic is
# rounded to a scale where a ~1e-12 relative input wobble cannot flip
# the rounded value (verified on the gate's fixed sf0.01 data).
_CORR_FORMULAS = {
    "n_rows": "n",
    "covar_pop": (
        "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4)"
    ),
    "corr_qty_price": (
        "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 8)"
    ),
    "slope_price_per_qty": (
        "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)"
    ),
}

_CORRELATION_ORACLE = f"""
WITH s AS (
    SELECT l_returnflag,
{_CORR_STATS}
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       {_CORR_FORMULAS["n_rows"]} AS n_rows,
       {_CORR_FORMULAS["covar_pop"]} AS covar_pop,
       {_CORR_FORMULAS["corr_qty_price"]} AS corr_qty_price,
       {_CORR_FORMULAS["slope_price_per_qty"]} AS slope_price_per_qty
FROM s
"""


@register("q_correlation", oracle=_CORRELATION_ORACLE, tags=("phase1", "agg", "stats"))
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal Pearson corr / covar_pop / OLS slope per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,4)")
    p = F.col("l_extendedprice").cast("decimal(18,4)")
    stats = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("sx"),
        F.sum(p).alias("sy"),
        F.sum((q * p).cast("decimal(38,8)")).alias("sxy"),
        F.sum((q * q).cast("decimal(38,8)")).alias("sxx"),
        F.sum((p * p).cast("decimal(38,8)")).alias("syy"),
    )
    return stats.select(
        "l_returnflag",
        *[F.expr(expr).alias(name) for name, expr in _CORR_FORMULAS.items()],
    )


# ---------------------------------------------------------------------------
# q_key_skew — join/shuffle-key skew profiler: per candidate key, the
# group-size distribution (key count, max, p50/p99, max/avg skew ratio).
# This is the operational input to the 100 TB partitioning decisions in
# README "100 TB posture" (when to salt, when AQE skew-split kicks in).
# Each leg is one map-side-combined groupBy + a 1-row agg; all counts
# stay integer-exact (< 2^53) so the ratio needs no rounding guard.
# ---------------------------------------------------------------------------

_KEY_SKEW_LEG = """
SELECT '{label}' AS key_label,
       count(*) AS n_keys,
       max(cnt) AS max_group,
       quantile_cont(cnt, 0.5) AS p50_group,
       quantile_cont(cnt, 0.99) AS p99_group,
       CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS skew_ratio
FROM (SELECT {key}, count(*) AS cnt FROM {table} GROUP BY {key})
"""

_KEY_SKEW_ORACLE = " UNION ALL ".join(
    _KEY_SKEW_LEG.format(label=f"{t}.{k}", key=k, table=t)
    for t, k in [
        ("events", "user_id"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]
)


@register("q_key_skew", oracle=_KEY_SKEW_ORACLE, tags=("phase1", "agg", "profile"))
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size skew stats for the candidate shuffle keys."""
    out = None
    for table, key in [
        ("events", "user_id"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]:
        sizes = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count("*").alias("cnt"))
        )
        leg = sizes.agg(
            F.count("*").alias("n_keys"),
            F.max("cnt").alias("max_group"),
            F.percentile("cnt", F.lit(0.5)).alias("p50_group"),
            F.percentile("cnt", F.lit(0.99)).alias("p99_group"),
            (
                F.max("cnt").cast("double")
                * F.count("*").cast("double")
                / F.sum("cnt").cast("double")
            ).alias("skew_ratio"),
        ).select(F.lit(f"{table}.{key}").alias("key_label"), "*")
        out = leg if out is None else out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# q_approx_quantile_eval — sketch-vs-exact evaluation for streaming-size
# quantiles: Spark's approx_percentile (Greenwald-Khanna sketch, the
# mergeable structure you'd run at 100 TB) checked against the exact
# interpolated percentile, with the GK rank-error guarantee converted to
# a value envelope [quantile(p-2eps), quantile(p+2eps)]. Only the exact
# values and the bound verdicts are emitted — sketch internals stay
# engine-local, so the result is deterministic and oracle-checkable.
# ---------------------------------------------------------------------------

_AQ_ACCURACY = 10000  # GK accuracy: rank error <= n / accuracy
_AQ_PS = (0.25, 0.5, 0.75, 0.95)

_AQ_EPS2 = 2.0 / _AQ_ACCURACY

_AQ_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT l_returnflag, {p} AS p,
       quantile_cont(l_quantity, {p}) AS exact_val,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag"""
    for p in _AQ_PS
)


@register("q_approx_quantile_eval", oracle=_AQ_ORACLE, tags=("phase1", "agg", "sketch", "eval"))
def q_approx_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile vs exact percentile, verdict per (group, p).

    The sketch value itself never leaves the query (GK merge order is
    partitioning-dependent); what is emitted — and what the oracle pins —
    is the exact percentile and whether the sketch landed inside its
    guaranteed envelope. A FALSE anywhere fails the hash check, so the
    correctness gate doubles as the sketch's acceptance test.

    The envelope is checked in RANK space, which is what GK actually
    guarantees: the returned element's rank interval
    [count(x < v) + 1, count(x <= v)] must overlap
    [ceil(p*n) - 2*eps*n, ceil(p*n) + 2*eps*n]. The earlier
    value-envelope form ([percentile(p-2eps), percentile(p+2eps)])
    is WRONG under heavy ties — interpolated value bounds can be
    strictly narrower than the rank guarantee (found by the fuzz
    corpus, where l_quantity has ~50 distinct values; latent on driver
    data). One sketch pass (array percentiles) + one rank pass replace
    the old four-scan union.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    ps = F.lit(list(_AQ_PS)).cast("array<double>")
    # count(l_quantity), not count(*): both percentile functions ignore
    # NULL values, so the rank target must be over the NON-NULL
    # population or every verdict shifts by the NULL share
    # (fuzz chaos x relational star)
    sk = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", ps).alias("__ex"),
        F.approx_percentile("l_quantity", ps, F.lit(_AQ_ACCURACY)).alias("__apx"),
        F.count("l_quantity").alias("__n"),
    )
    per_p = sk.select(
        "l_returnflag",
        "__n",
        F.posexplode(F.arrays_zip(F.lit(list(_AQ_PS)).cast("array<double>"), "__ex", "__apx")).alias(
            "__i", "__z"
        ),
    ).select(
        "l_returnflag",
        "__n",
        F.col("__z.0").alias("p"),
        F.col("__z.__ex").alias("exact_val"),
        F.col("__z.__apx").alias("__apx_v"),
    )
    # eqNullSafe: a NULL l_returnflag group is a group like any other —
    # the plain string-key join dropped it from the engine while the
    # oracle's GROUP BY kept it (fuzz chaos x relational star)
    ranked = (
        li.join(
            F.broadcast(per_p),
            li["l_returnflag"].eqNullSafe(per_p["l_returnflag"]),
        )
        .drop(li["l_returnflag"])
        .groupBy("l_returnflag", "p", "exact_val", "__apx_v", "__n")
        .agg(
            F.sum(F.when(F.col("l_quantity") < F.col("__apx_v"), 1).otherwise(0)).alias("__lt"),
            F.sum(F.when(F.col("l_quantity") <= F.col("__apx_v"), 1).otherwise(0)).alias("__le"),
        )
    )
    margin = F.lit(_AQ_EPS2) * F.col("__n")
    target = F.ceil(F.col("p") * F.col("__n"))
    return ranked.select(
        "l_returnflag",
        "p",
        "exact_val",
        F.when(F.col("__n") == 0, F.lit(True))  # empty sketch: nothing to bound
        .otherwise(
            (F.col("__le") >= target - margin)
            & (F.col("__lt") + F.lit(1) <= target + margin)
        )
        .alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# q_winsorized_stats — robust per-group statistics: clamp l_extendedprice
# to its group's [p05, p95] (winsorize), report raw vs winsorized means
# and the clamp counts. The standard outlier-robust cleaning step before
# aggregate features; exact interpolated percentiles keep it
# oracle-checkable (percentile == quantile_cont, proven parity).
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH bounds AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.05) AS lo,
           quantile_cont(l_extendedprice, 0.95) AS hi
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       count(*) AS n,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS raw_mean,
       CAST(sum(CAST(greatest(b.lo, least(b.hi, l.l_extendedprice)) AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) AS winsor_mean,
       count(*) FILTER (WHERE l.l_extendedprice < b.lo) AS n_clamped_lo,
       count(*) FILTER (WHERE l.l_extendedprice > b.hi) AS n_clamped_hi
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY l.l_returnflag
"""


@register("q_winsorized_stats", oracle=_WINSOR_ORACLE, tags=("phase1", "agg", "robust"))
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95-clamped) group means with clamp counts.

    The bounds aggregate is tiny (one row per group) and broadcast back
    onto the fact table; sums go through DECIMAL so the means are
    order-independent exact before the single final double division.

    r13 (guide §2.5): the bounds go through
    ``operators.planner.auto_group_quantile`` — below the 1M-row gate
    (sf0.1 = 600k rows) the plain ``F.percentile`` aggregate, which a
    head-to-head A/B measured FASTER locally (interleaved min-of-5
    noop-sink at sf0.1: percentile 2.77 s vs bucketed 3.98 s — the
    bucketed cascade's ~15 exchange-separated stages cost more than a
    3-task sort of 200k values); above it the bucketed two-pass order
    statistics (``operators.rank.group_quantile_cont``), which at sf1
    is at wall parity (7.64 s vs 7.75 s) while cutting the per-value
    shuffle (108 MB at sf1, all of l_extendedprice to one task per
    l_returnflag group) to KB-scale counts — the only branch that
    survives past single-task scale. Values are bit-identical on both
    branches (parity pinned in tests/test_plans.py), so the gate moves
    no hash-checked result.
    """
    from ..operators.planner import auto_group_quantile
    from ..sources import table_row_count

    li = load_table(spark, sf_dir, "lineitem")
    bounds = auto_group_quantile(
        li,
        ["l_returnflag"],
        F.col("l_extendedprice"),
        {"lo": 0.05, "hi": 0.95},
        n_rows=table_row_count(sf_dir, "lineitem"),
    )
    j = li.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.greatest("lo", F.least("hi", F.col("l_extendedprice")))
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("raw_mean"),
        (
            F.sum(clamped.cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("winsor_mean"),
        F.count(F.when(F.col("l_extendedprice") < F.col("lo"), 1)).alias("n_clamped_lo"),
        F.count(F.when(F.col("l_extendedprice") > F.col("hi"), 1)).alias("n_clamped_hi"),
    )


# ---------------------------------------------------------------------------
# q_cdc_apply — change-data-capture merge: a keyed change stream
# (upserts + deletes, possibly several changes per key) applied to a
# snapshot. Latest-change-per-key wins (ordered by change sequence),
# deletes drop the key, upserts replace-or-insert — the batch semantics
# of lakehouse MERGE, built from the engine's merge_by_key/delete_by_key
# primitives. The change set here is synthesized deterministically from
# orders so the whole thing stays oracle-checkable: every key % 7 == 3
# gets an upsert (status -> 'X', price + 1), every key % 31 == 4 a
# delete; keys hit by both resolve by sequence (delete wins: seq 2).
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH changes AS (
    SELECT o_orderkey, 1 AS seq, 'U' AS op,
           'X' AS new_status, o_totalprice + 1 AS new_price
    FROM orders WHERE o_orderkey % 7 = 3
    UNION ALL
    SELECT o_orderkey, 2 AS seq, 'D', NULL, NULL
    FROM orders WHERE o_orderkey % 31 = 4
),
latest AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM changes
    ) WHERE rn = 1
)
SELECT o.o_orderkey,
       coalesce(l.new_status, o.o_orderstatus) AS status,
       CAST(coalesce(l.new_price, o.o_totalprice) AS DOUBLE) AS totalprice
FROM orders o
LEFT JOIN latest l USING (o_orderkey)
WHERE l.op IS NULL OR l.op = 'U'
"""


@register("q_cdc_apply", oracle=_CDC_ORACLE, tags=("phase4", "incremental", "cdc"))
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a keyed CDC stream (upserts + deletes) to a snapshot.

    Latest change per key is a window over the (small) change set;
    applying it is delete_by_key + merge_by_key — broadcast anti joins
    against one snapshot scan, zero shuffles of the big side. On a
    lakehouse table the same plan compiles to MERGE.
    """
    from ..operators.merge import delete_by_key, merge_by_key
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upserts = o.filter(F.col("o_orderkey") % 7 == 3).select(
        "o_orderkey", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.lit("X").alias("new_status"),
        (F.col("o_totalprice") + 1).alias("new_price"),
    )
    deletes = o.filter(F.col("o_orderkey") % 31 == 4).select(
        "o_orderkey", F.lit(2).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast(upserts.schema["new_price"].dataType).alias("new_price"),
    )
    changes = upserts.unionByName(deletes)
    w = W.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    base = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
    )
    del_keys = latest.filter(F.col("op") == "D").select("o_orderkey")
    upd = latest.filter(F.col("op") == "U").join(o, "o_orderkey").select(
        "o_orderkey",
        F.col("new_status").alias("status"),
        F.col("new_price").cast("double").alias("totalprice"),
    )
    survived = delete_by_key(base, del_keys, ["o_orderkey"])
    return merge_by_key(survived, upd, ["o_orderkey"])


# ---------------------------------------------------------------------------
# q_rfm_segments — recency/frequency/monetary customer segmentation:
# per-customer last-order date, order count and decimal-exact spend,
# each quintile-bucketed (exact ntile semantics with full-key
# tie-break) into the classic 1-5 RFM codes. Customer cardinality
# grows with the corpus, so the three quintiles use the window-free
# two-pass bucketed rank (operators/rank.py) rather than global ntile
# windows (r4 verdict wrong #3): per-metric sampled range buckets,
# PARTITIONED per-bucket row_number, broadcast offsets, closed-form
# ntile arithmetic. The per-customer aggregate is persisted once (it
# feeds three rank passes + the total; bounded to one narrow row per
# customer — far smaller than the orders fact it summarizes, so the
# session-lifetime cache is acceptable).
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH per_cust AS (
    SELECT o_custkey,
           max(o_orderdate) AS last_order,
           count(*) AS frequency,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
    FROM orders
    GROUP BY o_custkey
),
scored AS (
    SELECT o_custkey, last_order, frequency,
           CAST(monetary AS DOUBLE) AS monetary,
           -- o_custkey NULLS FIRST: the NULL-custkey group is a row like
           -- any other and Spark's ASC tie-break puts NULLs first
           ntile(5) OVER (ORDER BY last_order DESC, o_custkey NULLS FIRST) AS r,
           ntile(5) OVER (ORDER BY frequency DESC, o_custkey NULLS FIRST) AS f,
           ntile(5) OVER (ORDER BY monetary DESC, o_custkey NULLS FIRST) AS m
    FROM per_cust
)
SELECT o_custkey, last_order, frequency, monetary,
       CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS rfm
FROM scored
"""


@register("q_rfm_segments", oracle=_RFM_ORACLE, tags=("phase1", "agg", "segmentation"))
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation per customer (window-free exact ntile)."""
    from ..operators.rank import exact_global_rank, ntile_from_rank

    o = load_table(spark, sf_dir, "orders")
    from ..cache import tracked_persist

    per_cust = tracked_persist(
        o.groupBy("o_custkey").agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary_dec"),
        )
    )
    # Three INDEPENDENT rank passes over the cached aggregate, joined
    # back on the customer key — chaining them instead would make each
    # pass's three subtrees (counts, ranked) recompute all previous
    # passes' windows. All three boundary sets come from ONE agg job
    # over the cache (percentile_approx x3), passed into the helper.
    # DESC leading sorts -> negated metrics as the ascending range key;
    # day-granular bucketing of the timestamp is fine (the range key
    # only needs to be monotone non-decreasing in the sort direction;
    # ties share a bucket and the within-bucket ordering disambiguates).
    from ..operators.rank import boundary_accuracy, boundary_probes

    # coalesce: the rank helper's range key must be NON-NULL; a customer
    # whose every order date (or price) is NULL sorts LAST under DESC in
    # both engines, so the sentinel sits above the ascending key domain
    r_key = F.coalesce(
        -F.datediff(F.to_date("last_order"), F.lit("1970-01-01").cast("date")),
        F.lit(1e18),
    )
    f_key = -F.col("frequency")
    m_key = F.coalesce(-F.col("monetary_dec").cast("double"), F.lit(1e18))
    n_b = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    probes = F.lit(boundary_probes(n_b)).cast("array<double>")
    acc = F.lit(boundary_accuracy(n_b))
    brow = per_cust.agg(
        F.percentile_approx(r_key.cast("double"), probes, acc).alias("br"),
        F.percentile_approx(f_key.cast("double"), probes, acc).alias("bf"),
        F.percentile_approx(m_key.cast("double"), probes, acc).alias("bm"),
    ).collect()[0]
    rk_r = exact_global_rank(
        per_cust,
        [F.desc("last_order"), F.asc("o_custkey")],
        r_key,
        rank_name="__rk_r",
        total_name="__total",  # from the persisted bucket counts, no extra scan
        bounds=brow["br"] or [],
    ).select("o_custkey", "__rk_r", "__total")
    rk_f = exact_global_rank(
        per_cust,
        [F.desc("frequency"), F.asc("o_custkey")],
        f_key,
        rank_name="__rk_f",
        bounds=brow["bf"] or [],
    ).select("o_custkey", "__rk_f")
    rk_m = exact_global_rank(
        per_cust,
        [F.desc("monetary_dec"), F.asc("o_custkey")],
        m_key,
        rank_name="__rk_m",
        bounds=brow["bm"] or [],
    ).select("o_custkey", "__rk_m")
    # eqNullSafe joins: the NULL-custkey group is a customer like any
    # other — plain key joins dropped it while the oracle's GROUP BY
    # kept it (fuzz chaos x relational star). Each rank frame's key is
    # renamed first so the chained joins stay unambiguous.
    ranked = per_cust
    for rk in (rk_r, rk_f, rk_m):
        rk = rk.withColumnRenamed("o_custkey", "__k")
        ranked = ranked.join(
            rk, F.col("o_custkey").eqNullSafe(F.col("__k"))
        ).drop("__k")
    scored = ranked.select(
        "o_custkey", "last_order", "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
        ntile_from_rank(F.col("__rk_r"), F.col("__total"), 5).alias("r"),
        ntile_from_rank(F.col("__rk_f"), F.col("__total"), 5).alias("f"),
        ntile_from_rank(F.col("__rk_m"), F.col("__total"), 5).alias("m"),
    )
    return scored.withColumn(
        "rfm",
        F.concat(F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")),
    )


# ---------------------------------------------------------------------------
# q_mad_outliers — robust outlier detection by median absolute
# deviation: flag l_extendedprice rows whose |x - median| exceeds
# 3 * MAD within their returnflag group. Two exact-percentile passes
# (median, then median of absolute deviations) with the tiny per-group
# stats broadcast back — the robust sibling of q_winsorized_stats,
# immune to the outliers it hunts.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
    SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
    FROM lineitem GROUP BY l_returnflag
),
mad AS (
    SELECT l.l_returnflag,
           quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
    FROM lineitem l JOIN med m USING (l_returnflag)
    GROUP BY l.l_returnflag
)
SELECT l.l_returnflag,
       count(*) AS n,
       count(*) FILTER (WHERE abs(l.l_extendedprice - m.med) > 3 * d.mad) AS n_outliers,
       CAST(m.med AS DOUBLE) AS med,
       CAST(d.mad AS DOUBLE) AS mad
FROM lineitem l
JOIN med m USING (l_returnflag)
JOIN mad d USING (l_returnflag)
GROUP BY l.l_returnflag, m.med, d.mad
"""


@register("q_mad_outliers", oracle=_MAD_ORACLE, tags=("phase1", "agg", "robust"))
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MAD outlier counts (3-MAD rule, exact medians).

    r13 (guide §2.5): both exact medians go through
    ``operators.planner.auto_group_quantile``. The committed LOSING
    A/B that motivated the gate instead of an unconditional bucketed
    rewrite (guide §1.1's "measure first"): MAD chains TWO selections
    (median, then median of |x − med|), so the bucketed
    ``group_quantile_cont`` form pays two full count/target/read
    cascades END-TO-END SERIAL (~14 exchange-separated stages on the
    critical path) and measured 4.80 s vs 3.14 s shipped-percentile at
    sf0.1 warm min-of-5 (6.93 s before the operator persisted its tiny
    result) — while ``F.percentile``'s single-task sort of 200k values
    per group costs ~0.7 s per pass locally. Below the 1M-row gate the
    percentile branch is live (this sf0.1 shape, unchanged); above it
    the bucketed branch takes over before a group's values outgrow one
    task. Both gates read the base row count from parquet footer
    metadata (``sources.table_row_count`` — a driver-side catalog
    stat, no count job); the SECOND selection runs over a
    broadcast-join output whose row count equals the base table's by
    construction, so ``n_rows=n`` also never executes the join
    subtree early. Values bit-identical on both branches (parity
    pinned in tests/test_plans.py::test_group_quantile_cont_parity)."""
    from ..operators.planner import auto_group_quantile
    from ..sources import table_row_count

    li = load_table(spark, sf_dir, "lineitem")
    n = table_row_count(sf_dir, "lineitem")
    med = auto_group_quantile(
        li, ["l_returnflag"], F.col("l_extendedprice"), {"med": 0.5}, n_rows=n
    )
    with_med = li.join(F.broadcast(med), "l_returnflag")
    mad = auto_group_quantile(
        with_med,
        ["l_returnflag"],
        F.abs(F.col("l_extendedprice") - F.col("med")),
        {"mad": 0.5},
        n_rows=n,
    )
    j = with_med.join(F.broadcast(mad), "l_returnflag")
    out = F.abs(F.col("l_extendedprice") - F.col("med")) > 3 * F.col("mad")
    return j.groupBy("l_returnflag", "med", "mad").agg(
        F.count("*").alias("n"),
        F.count(F.when(out, 1)).alias("n_outliers"),
    ).select("l_returnflag", "n", "n_outliers", "med", "mad")


# ---------------------------------------------------------------------------
# q_market_basket — association rules from order baskets: part-pair
# co-occurrence (support), confidence and lift, count floor >= 3. The
# a-priori first pass: pair volume is sum of per-basket squares (baskets
# are small), never catalog². All scores are count ratios — identical
# double expressions both engines.
#
# r13 shape (guide §2.3 "aggregate before you shuffle" / §2.4): ONE
# groupBy(l_orderkey).collect_set shuffle replaces the old
# distinct-then-self-join — the basket array IS the distinct item set,
# and the (part1 < part2) pairs are generated MAP-SIDE from the sorted
# array, so the item table is shuffled once instead of three times
# (distinct + both self-join legs). Per-basket pair blowup is identical
# to the self-join's (sum of squares over basket sizes — baskets are
# order-bounded, the same skew envelope as before). Measured warm:
# sf0.1 min-of-5 2.82 s -> 1.99 s (shuffle_write 28.1 -> 23.5 MB,
# input 44.8 -> 23.9 MB — ONE lineitem pass instead of two); sf1
# min-of-3 6.71 s -> 3.78 s (274.5 -> 248.2 MB shuffled, input
# halved). Locally the old join legs rode an AQE broadcast, so the
# win is one scan + the distinct exchange; at 100 TB the item table
# out-sizes any broadcast and the old shape degrades to THREE
# corpus-scale shuffles (distinct + both SMJ legs) where this keeps
# exactly one. NULL semantics pinned to the old plan: a NULL
# l_orderkey joins nothing -> its basket emits no pairs (the explicit
# isNotNull filter); countDistinct(l_orderkey) skipped NULLs ->
# count(l_orderkey) over the grouped baskets; item_freq counted the
# NULL-orderkey basket's distinct items -> explode of its set does too.
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
item_freq AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey),
pairs AS (
    SELECT a.l_partkey AS part1, b.l_partkey AS part2, count(*) AS c_pair
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)
SELECT p.part1, p.part2, p.c_pair, f1.c AS c1, f2.c AS c2,
       CAST(p.c_pair AS DOUBLE) / n.n AS support,
       CAST(p.c_pair AS DOUBLE) / f1.c AS confidence,
       (CAST(p.c_pair AS DOUBLE) * n.n) / (CAST(f1.c AS DOUBLE) * f2.c) AS lift
FROM pairs p
JOIN item_freq f1 ON f1.l_partkey = p.part1
JOIN item_freq f2 ON f2.l_partkey = p.part2
CROSS JOIN n_orders n
WHERE p.c_pair >= 3
"""


@register("q_market_basket", oracle=_BASKET_ORACLE, tags=("phase1", "mining", "basket"))
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (support/confidence/lift) with count floor."""
    from pyspark.storagelevel import StorageLevel

    li = load_table(spark, sf_dir, "lineitem")
    # DISK_ONLY: one row per basket — corpus-scale (the dedup.py persist
    # policy; memory-caching would evict hotter blocks). collect_set
    # dedupes within the basket, so this one shuffle subsumes the old
    # distinct() AND both self-join legs (see block comment).
    from ..cache import tracked_persist

    baskets = tracked_persist(
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts")),
        StorageLevel.DISK_ONLY,
    )
    # basket count rides the plan as a broadcast 1-row crossJoin — no
    # driver-side count job (the lm_perplexity rule); count(col) skips
    # the NULL-orderkey group exactly as countDistinct did
    n_df = baskets.agg(F.count("l_orderkey").cast("double").alias("n_orders"))
    freq = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("c"))
    # (part1 < part2) pairs map-side from the sorted distinct-item array;
    # a NULL l_orderkey produced no pairs under the old equi-join
    sp = F.array_sort("parts")
    # index-lambda + slice: empty/singleton baskets yield an empty pair
    # array with no type-juggling CASE arm
    pair_arr = F.expr(
        """flatten(transform(__sp, (x, i) ->
             transform(slice(__sp, i + 2, size(__sp)), y ->
               struct(x AS part1, y AS part2))))"""
    )
    pairs = (
        baskets.filter(F.col("l_orderkey").isNotNull())
        .withColumn("__sp", sp)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.part1", "p.part2")
        .groupBy("part1", "part2")
        .agg(F.count("*").alias("c_pair"))
        .filter(F.col("c_pair") >= 3)
    )
    f1 = freq.select(F.col("l_partkey").alias("part1"), F.col("c").alias("c1"))
    f2 = freq.select(F.col("l_partkey").alias("part2"), F.col("c").alias("c2"))
    return (
        pairs.join(F.broadcast(f1), "part1")
        .join(F.broadcast(f2), "part2")
        .crossJoin(F.broadcast(n_df))
        .select(
            "part1", "part2", "c_pair", "c1", "c2",
            (F.col("c_pair").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("c_pair").cast("double") / F.col("c1")).alias("confidence"),
            (
                (F.col("c_pair").cast("double") * F.col("n_orders"))
                / (F.col("c1").cast("double") * F.col("c2"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q_skyline — Pareto frontier (preference query, Börzsönyi et al. 2001,
# public): parts not dominated on (price low, size low) by any other
# part of their brand. Domination is an anti-exists self-join blocked by
# brand; at 100 TB the standard refinement is a pre-filter by a grid of
# local skylines — the blocked form here is that algorithm's inner step.
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_brand = p.p_brand
      AND q.p_retailprice <= p.p_retailprice
      AND q.p_size <= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)
"""


@register("q_skyline", oracle=_SKYLINE_ORACLE, tags=("phase1", "preference"))
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier on (retailprice, size), anti-join form
    behind a CORNER PRE-FILTER (round 10): brands are fixed-cardinality,
    so the bare per-brand anti-join is ~n^2/|brands| — the r10 rehearsal's
    max wall ratio (8x at 10x data). Each brand's two lexicographic
    minima — min(struct(price, size)) and min(struct(size, price)), both
    actual data points — are broadcast back, and any point STRICTLY
    dominated by either is dropped from BOTH anti-join sides first.
    Complete by transitivity: if q dominates p and q was pruned, the
    corner that pruned q strictly dominates p too, so every survivor's
    potential dominators survive — skyline(survivors) == skyline(all).
    The oracle stays the brute-force NOT EXISTS, so the driver hash
    check proves the prune's completeness, not just its speed. The
    corner agg is one map-side-combined pass; the anti-join then runs
    on the ~skyline-sized residue instead of the full table."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    # corners from fully-non-NULL rows only (a NULL coordinate can
    # never strictly dominate anything in either engine's semantics)
    corners = (
        p.filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
        .groupBy(F.col("p_brand").alias("c_brand"))
        .agg(
            F.min(F.struct(F.col("p_retailprice").alias("a"),
                           F.col("p_size").alias("b"))).alias("c1"),
            F.min(F.struct(F.col("p_size").alias("a"),
                           F.col("p_retailprice").alias("b"))).alias("c2"),
        )
    )

    def strict_dom(cp, cs):  # corner (price cp, size cs) strictly dominates row
        # NULL-safe: a NULL comparison means "not provably dominated" —
        # prune only on TRUE (left join below keeps cornerless brands)
        return F.coalesce(
            (cp <= F.col("p_retailprice"))
            & (cs <= F.col("p_size"))
            & ((cp < F.col("p_retailprice")) | (cs < F.col("p_size"))),
            F.lit(False),
        )

    surv = (
        p.join(F.broadcast(corners), F.col("p_brand") == F.col("c_brand"), "left")
        .filter(
            ~strict_dom(F.col("c1.a"), F.col("c1.b"))
            & ~strict_dom(F.col("c2.b"), F.col("c2.a"))
        )
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
    )
    q = surv.select(
        F.col("p_brand").alias("q_brand"),
        F.col("p_retailprice").alias("q_price"),
        F.col("p_size").alias("q_size"),
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") <= F.col("p_size"))
        & ((F.col("q_price") < F.col("p_retailprice")) | (F.col("q_size") < F.col("p_size")))
    )
    return surv.join(
        q, (F.col("q_brand") == F.col("p_brand")) & dominated, "left_anti"
    )


# ---------------------------------------------------------------------------
# q_nation_profit — TPC-H Q9 shape adapted to the trimmed schema (the
# testdata carries no partsupp, so profit = discounted revenue instead
# of revenue - supplycost*qty): for parts matching a name pattern, roll
# up profit by the SUPPLIER's nation and the order year.
#
# Scale: part (name-filtered) / supplier / nation / region are dims —
# all broadcast; the one real shuffle is lineitem⋈orders on orderkey,
# then a partial-agg rollup on (nation, year), a key space of
# 25 x |years|. Exactly the plan Q9 wants at 100 TB: one fact-fact
# shuffle, everything else map-side.
# ---------------------------------------------------------------------------

_NATION_PROFIT_ORACLE = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


@register("q_nation_profit", oracle=_NATION_PROFIT_ORACLE, tags=("phase1", "join", "agg"))
def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(profit).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q_data_quality — declarative data-quality constraint suite over the
# orders table (the Deequ/Great-Expectations pattern a production
# pipeline gates ingestion on): completeness, key uniqueness, value
# ranges, accepted categorical values, and referential integrity to
# customer. Every metric is computed in ONE pass over orders (a single
# multi-aggregate — no per-check scan), plus one broadcast anti-join
# for the RI check; at 100 TB that is one scan + one broadcast probe,
# the same cost as any single aggregate. Ratios are single divisions of
# exact bigints, so doubles are engine-identical.
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
WITH m AS (
    SELECT count(*) AS n_rows,
           count(o_custkey) AS n_custkey,
           count(DISTINCT o_orderkey) AS n_key,
           count(*) FILTER (o_totalprice < 0) AS n_neg_price,
           count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')) AS n_bad_status
    FROM orders
),
ri AS (
    SELECT count(*) AS n_orphans
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
)
SELECT * FROM (
    SELECT 'row_count' AS check_name,
           CAST(n_rows AS DOUBLE) AS metric, n_rows > 0 AS passed FROM m
    UNION ALL
    SELECT 'custkey_completeness',
           CAST(n_custkey AS DOUBLE) / n_rows, n_custkey = n_rows FROM m
    UNION ALL
    SELECT 'orderkey_uniqueness',
           CAST(n_key AS DOUBLE) / n_rows, n_key = n_rows FROM m
    UNION ALL
    SELECT 'totalprice_nonnegative',
           CAST(n_neg_price AS DOUBLE), n_neg_price = 0 FROM m
    UNION ALL
    SELECT 'status_accepted_values',
           CAST(n_bad_status AS DOUBLE), n_bad_status = 0 FROM m
    UNION ALL
    SELECT 'custkey_ref_integrity',
           CAST(n_orphans AS DOUBLE), n_orphans = 0 FROM ri
)
"""


@register("q_data_quality", oracle=_DQ_ORACLE, tags=("phase1", "quality", "agg"))
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite: one scan of orders + one broadcast
    anti-probe to customer; emits (check_name, metric, passed)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    m = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_key"),
        F.count_if(F.col("o_totalprice") < 0).alias("n_neg_price"),
        F.count_if(~F.col("o_orderstatus").isin("F", "O", "P")).alias("n_bad_status"),
    )
    ri = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )

    def row(name, metric, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )

    checks_m = m.select(
        F.explode(
            F.array(
                row("row_count", F.col("n_rows"), F.col("n_rows") > 0),
                row(
                    "custkey_completeness",
                    F.col("n_custkey").cast("double") / F.col("n_rows"),
                    F.col("n_custkey") == F.col("n_rows"),
                ),
                row(
                    "orderkey_uniqueness",
                    F.col("n_key").cast("double") / F.col("n_rows"),
                    F.col("n_key") == F.col("n_rows"),
                ),
                row(
                    "totalprice_nonnegative",
                    F.col("n_neg_price"),
                    F.col("n_neg_price") == 0,
                ),
                row(
                    "status_accepted_values",
                    F.col("n_bad_status"),
                    F.col("n_bad_status") == 0,
                ),
            )
        ).alias("c")
    ).select("c.*")
    checks_ri = ri.select(
        F.lit("custkey_ref_integrity").alias("check_name"),
        F.col("n_orphans").cast("double").alias("metric"),
        (F.col("n_orphans") == 0).alias("passed"),
    )
    return checks_m.unionAll(checks_ri)


# ---------------------------------------------------------------------------
# q_zorder_layout — Z-order (Morton) interleaving of two join/filter
# keys, the multi-dimensional clustering layout behind Delta/Iceberg
# OPTIMIZE ZORDER: rows sorted by the interleaved key give every file
# tight min/max ranges on BOTH dimensions, so two-column predicates
# skip files that one-column sorting cannot. The z-value is pure
# integer arithmetic (floor-div and mod over 8 bit positions — bigint
# exact in both engines); the bucket column is the file id a writer
# would emit, and per-bucket the min/max spans of both keys stay
# narrow — the property the layout exists for.
# ---------------------------------------------------------------------------

_Z_BITS = 8
_Z_BUCKETS = 16


def _zvalue_sql(x: str, y: str) -> str:
    """Interleave the low _Z_BITS bits of x (even positions) and y (odd)."""
    terms = []
    for k in range(_Z_BITS):
        terms.append(f"(CAST(floor({x} / {2**k}) AS BIGINT) % 2) * {4**k}")
        terms.append(f"(CAST(floor({y} / {2**k}) AS BIGINT) % 2) * {4**k * 2}")
    return "(" + " + ".join(terms) + ")"


_ZORDER_ORACLE = f"""
WITH z AS (
    SELECT l_orderkey, l_linenumber,
           l_partkey % {2**_Z_BITS} AS kx,
           l_suppkey % {2**_Z_BITS} AS ky,
           {_zvalue_sql(f'(l_partkey % {2**_Z_BITS})', f'(l_suppkey % {2**_Z_BITS})')} AS zval
    FROM lineitem
)
SELECT CAST(zval // {4**_Z_BITS // _Z_BUCKETS} AS BIGINT) AS z_bucket,
       count(*) AS n_rows,
       min(kx) AS min_x, max(kx) AS max_x,
       min(ky) AS min_y, max(ky) AS max_y
FROM z
GROUP BY 1
"""


@register("q_zorder_layout", oracle=_ZORDER_ORACLE, tags=("phase1", "layout", "scan"))
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleave (partkey, suppkey) and report per-bucket key spans."""
    li = load_table(spark, sf_dir, "lineitem")
    kx = F.col("l_partkey") % (2**_Z_BITS)
    ky = F.col("l_suppkey") % (2**_Z_BITS)
    z = li.select(
        kx.alias("kx"),
        ky.alias("ky"),
        F.expr(_zvalue_sql(f"(l_partkey % {2**_Z_BITS})", f"(l_suppkey % {2**_Z_BITS})")).alias("zval"),
    )
    return (
        z.groupBy(
            F.expr(f"zval DIV {4**_Z_BITS // _Z_BUCKETS}").alias("z_bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("kx").alias("min_x"),
            F.max("kx").alias("max_x"),
            F.min("ky").alias("min_y"),
            F.max("ky").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# q_zone_map_eval — data-skipping evaluation: per-file min/max zone maps
# under two physical layouts of the SAME rows (round-robin striped
# across a fixed writer parallelism vs ts-sorted), probed with a
# one-day predicate. Striped files each span the whole month (every
# stripe sees every arrival), so zone maps skip ~nothing; ts-sorted
# files are tight, so ~29/30 of them skip — the quantified version of
# "sort your data or scan all of it", the decision metric behind
# OPTIMIZE/clustering jobs (complements q_zorder_layout, which shows
# the multi-column variant's key spans). Striping, not arrival order,
# is the honest baseline here: the driver's synthetic events arrive
# time-ordered, so an arrival layout would be accidentally sorted. The
# sorted layout's file id comes from operators/rank.exact_global_rank —
# assigning stable file ids under a global sort IS the recipe's
# row_number case — so the eval itself stays window-free and
# scale-safe.
# ---------------------------------------------------------------------------

_ZM_ROWS_PER_FILE = 500
_ZM_STRIPES = 20  # fixed writer parallelism for the striped layout
_ZM_LO = 1705276800_000_000  # 2024-01-15 00:00 UTC, µs
_ZM_HI = 1705363200_000_000  # 2024-01-16 00:00 UTC, µs

_ZONE_MAP_ORACLE = f"""
WITH e AS (
    SELECT event_id, epoch_ns(ts) // 1000 AS t_us FROM events
),
layouts AS (
    SELECT 'striped' AS layout, event_id % {_ZM_STRIPES} AS file_id, t_us
    FROM e
    UNION ALL
    SELECT 'ts_sorted' AS layout,
           (row_number() OVER (ORDER BY t_us, event_id) - 1) // {_ZM_ROWS_PER_FILE} AS file_id,
           t_us
    FROM e
),
zones AS (
    SELECT layout, file_id,
           min(t_us) AS zmin, max(t_us) AS zmax, count(*) AS n_rows,
           count(*) FILTER (t_us >= {_ZM_LO} AND t_us < {_ZM_HI}) AS n_match
    FROM layouts GROUP BY layout, file_id
)
SELECT layout,
       count(*) AS n_files,
       CAST(count(*) FILTER (zmax < {_ZM_LO} OR zmin >= {_ZM_HI}) AS BIGINT)
         AS n_files_skipped,
       CAST(coalesce(sum(n_rows) FILTER (NOT (zmax < {_ZM_LO} OR zmin >= {_ZM_HI})), 0) AS BIGINT)
         AS n_rows_scanned,
       CAST(coalesce(sum(n_match), 0) AS BIGINT) AS n_rows_match
FROM zones
GROUP BY layout
"""


@register(
    "q_zone_map_eval",
    oracle=_ZONE_MAP_ORACLE,
    tags=("phase1", "layout", "scan", "rank"),
)
def q_zone_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map skip rates: striped vs ts-sorted layout, 1-day predicate."""
    from ..operators.rank import _idiv, exact_global_rank

    rpf = F.lit(_ZM_ROWS_PER_FILE).cast("bigint")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("t_us")
    )
    nat = e.select(
        F.lit("striped").alias("layout"),
        F.pmod(F.col("event_id"), F.lit(_ZM_STRIPES)).cast("bigint").alias("file_id"),
        "t_us",
    )
    srt = exact_global_rank(
        e,
        [F.asc("t_us"), F.asc("event_id")],
        F.col("t_us"),
        rank_name="__rk",
    ).select(
        F.lit("ts_sorted").alias("layout"),
        _idiv(F.col("__rk") - F.lit(1), rpf).alias("file_id"),
        "t_us",
    )
    hit = (F.col("t_us") >= _ZM_LO) & (F.col("t_us") < _ZM_HI)
    zones = (
        nat.unionByName(srt)
        .groupBy("layout", "file_id")
        .agg(
            F.min("t_us").alias("zmin"),
            F.max("t_us").alias("zmax"),
            F.count("*").alias("n_rows"),
            F.count_if(hit).alias("n_match"),
        )
    )
    skipped = (F.col("zmax") < _ZM_LO) | (F.col("zmin") >= _ZM_HI)
    return zones.groupBy("layout").agg(
        F.count("*").alias("n_files"),
        F.count_if(skipped).cast("bigint").alias("n_files_skipped"),
        F.coalesce(F.sum(F.when(~skipped, F.col("n_rows"))), F.lit(0))
        .cast("bigint")
        .alias("n_rows_scanned"),
        F.coalesce(F.sum("n_match"), F.lit(0)).cast("bigint").alias("n_rows_match"),
    )


# ---------------------------------------------------------------------------
# q_compaction_plan — OPTIMIZE planning: bin-pack small files into
# target-size compaction groups, per partition. File inventory is
# simulated from orders (one "file" per order day, size = row count;
# partition = month). Files already at/over the target stay untouched
# (keep=1, own bin); small files are ordered by (size DESC, day) and
# binned by cumulative size — floor(cumsum_before / target) — the
# deterministic streaming-bin heuristic Delta/Iceberg OPTIMIZE uses
# (near-optimal without the sequential first-fit-decreasing loop, so
# it stays a partitioned window instead of a driver algorithm). Every
# window is partitioned by month (bounded group), all arithmetic
# bigint.
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 4000  # rows per compacted output file

_COMPACTION_ORACLE = f"""
WITH files AS (
    SELECT date_trunc('month', o_orderdate) AS part_month,
           CAST(o_orderdate AS DATE) AS file_day,
           count(*) AS f_rows
    FROM orders
    GROUP BY 1, 2
),
small AS (
    SELECT *,
           sum(f_rows) OVER (
               PARTITION BY part_month ORDER BY f_rows DESC, file_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f_rows AS cum_before
    FROM files WHERE f_rows < {_COMPACT_TARGET}
),
binned AS (
    SELECT part_month, file_day, f_rows,
           CAST(cum_before // {_COMPACT_TARGET} AS BIGINT) AS bin_id,
           0 AS keep
    FROM small
    UNION ALL
    SELECT part_month, file_day, f_rows,
           CAST(-1 - row_number() OVER (
               PARTITION BY part_month ORDER BY f_rows DESC, file_day) AS BIGINT) AS bin_id,
           1 AS keep
    FROM files WHERE f_rows >= {_COMPACT_TARGET}
)
SELECT CAST(epoch(part_month) AS BIGINT) AS part_month_epoch,
       bin_id,
       CAST(max(keep) AS INT) AS keep,
       count(*) AS n_files,
       CAST(sum(f_rows) AS BIGINT) AS total_rows
FROM binned
GROUP BY 1, 2
"""


@register(
    "q_compaction_plan",
    oracle=_COMPACTION_ORACLE,
    tags=("phase1", "layout", "maintenance"),
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE bin-packing: cumulative-size bins per partition month."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("part_month"),
        F.to_date("o_orderdate").alias("file_day"),
    ).agg(F.count("*").alias("f_rows"))
    w = W.partitionBy("part_month").orderBy(F.desc("f_rows"), F.asc("file_day"))
    small = (
        files.filter(F.col("f_rows") < _COMPACT_TARGET)
        .withColumn(
            "cum_before",
            F.sum("f_rows").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            - F.col("f_rows"),
        )
        .select(
            "part_month",
            "file_day",
            "f_rows",
            F.call_function(
                "div", F.col("cum_before"), F.lit(_COMPACT_TARGET).cast("bigint")
            ).alias("bin_id"),
            F.lit(0).alias("keep"),
        )
    )
    large = files.filter(F.col("f_rows") >= _COMPACT_TARGET).select(
        "part_month",
        "file_day",
        "f_rows",
        (-1 - F.row_number().over(w)).cast("bigint").alias("bin_id"),
        F.lit(1).alias("keep"),
    )
    return (
        small.unionByName(large)
        .groupBy(
            F.unix_timestamp("part_month").alias("part_month_epoch"), "bin_id"
        )
        .agg(
            F.max("keep").cast("int").alias("keep"),
            F.count("*").alias("n_files"),
            F.sum("f_rows").cast("bigint").alias("total_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q_snapshot_diff — table-version diff (the lakehouse "what changed
# between snapshot v1 and v2" primitive behind CDC audits and time
# travel): full-outer join on the key, classify each key as added /
# removed / changed by comparing an md5 row fingerprint. Both versions
# are derived deterministically from orders (v1 = keys not divisible by
# 7; v2 = keys not divisible by 5, with every 3rd-key price bumped), so
# the diff is exactly reproducible. Scale: one shuffle on the join key;
# the fingerprint collapses arbitrary row width to one comparison —
# the standard way to diff 100 TB tables without comparing N columns.
# ---------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = """
-- coalesce inside the fingerprint: Spark's ANSI concat NULL-propagates
-- while DuckDB's concat SKIPS NULLs, so an unguarded NULL status/price
-- makes the engine drop the row (NULL <> NULL filter) where the oracle
-- still fingerprints it (fuzz chaos x relational star) — a NULL column
-- is a value the diff must see, not a row-killer
WITH v1 AS (
    SELECT o_orderkey AS k,
           md5(concat(coalesce(o_orderstatus, '~null~'), ':',
                      coalesce(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '~null~'))) AS fp
    FROM orders WHERE o_orderkey % 7 <> 0
),
v2 AS (
    SELECT o_orderkey AS k,
           md5(concat(coalesce(o_orderstatus, '~null~'), ':',
                      coalesce(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           + CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END AS VARCHAR), '~null~'))) AS fp
    FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT coalesce(v1.k, v2.k) AS o_orderkey,
       CASE WHEN v1.k IS NULL THEN 'added'
            WHEN v2.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
WHERE v1.k IS NULL OR v2.k IS NULL OR v1.fp <> v2.fp
"""


@register("q_snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE, tags=("phase2", "cdc", "join"))
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff via keyed full-outer join of md5 row fingerprints."""
    o = load_table(spark, sf_dir, "orders")
    # integer-cents fingerprint: double->string formatting differs between
    # engines (Java vs DuckDB shortest-roundtrip), bigint->string never does
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    status = F.coalesce(F.col("o_orderstatus"), F.lit("~null~"))
    fp1 = F.md5(
        F.concat(status, F.lit(":"), F.coalesce(cents.cast("string"), F.lit("~null~")))
    )
    cents2 = cents + F.when(F.col("o_orderkey") % 3 == 0, F.lit(100)).otherwise(F.lit(0))
    fp2 = F.md5(
        F.concat(status, F.lit(":"), F.coalesce(cents2.cast("string"), F.lit("~null~")))
    )
    v1 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k1"), fp1.alias("fp1")
    )
    v2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k2"), fp2.alias("fp2")
    )
    j = v1.join(v2, v1.k1 == v2.k2, "full_outer")
    change = (
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .otherwise("changed")
    )
    return j.filter(
        F.col("k1").isNull() | F.col("k2").isNull() | (F.col("fp1") != F.col("fp2"))
    ).select(F.coalesce("k1", "k2").alias("o_orderkey"), change.alias("change"))


# ---------------------------------------------------------------------------
# q_incremental_agg — partial-aggregate maintenance (the materialized-
# view pattern): each ingestion batch keeps only its partial state
# (count / sum / min / max per group), and the serving view is the
# MERGE of partials — never a re-scan of history. Batches here are the
# two halves of orders by key parity; the oracle aggregates the full
# table directly, proving merge(partials) == agg(all). Sums in DECIMAL
# so the merge is order-exact. At 100 TB this is the difference between
# touching one new batch and re-reading the table per refresh.
# ---------------------------------------------------------------------------

_INCR_AGG_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


@register("q_incremental_agg", oracle=_INCR_AGG_ORACLE, tags=("phase2", "agg", "incremental"))
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge per-batch partial aggregates into the serving aggregate."""
    o = load_table(spark, sf_dir, "orders")

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("o_orderpriority").agg(
            F.count("*").alias("pc"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ps"),
            F.min("o_totalprice").alias("pmin"),
            F.max("o_totalprice").alias("pmax"),
        )

    p1 = partial(o.filter(F.col("o_orderkey") % 2 == 0))
    p2 = partial(o.filter(F.col("o_orderkey") % 2 == 1))
    return (
        p1.unionAll(p2)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pc").cast("bigint").alias("n_orders"),
            F.sum("ps").cast("double").alias("total"),
            F.min("pmin").alias("min_price"),
            F.max("pmax").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# q_ivm_join_delta — incremental view maintenance for JOIN views: given
# the old base tables and signed change sets (insert +1 / delete -1;
# update = delete+insert), the delta of V = orders ⋈ customer is the
# classic IVM identity
#     ΔV = ΔO ⋈ C1  ∪  O1 ⋈ ΔC  ∪  ΔO ⋈ ΔC
# summed as signed multisets. The engine computes ΔV from the identity
# (touching only deltas and one pass of each base); the ORACLE computes
# the ground truth the expensive way — full V2 ⊖ V1 recompute diff —
# so the hash check proves the identity itself, cross-engine, on every
# corpus. Change sets are deterministic: every 17th order deleted,
# every 7th (surviving) price-bumped, every 13th spawning an insert
# under a fresh key; every 9th customer's segment rewritten. At 100 TB
# this is the difference between joining yesterday's deltas and
# re-joining the table per refresh (complements q_incremental_agg,
# which maintains aggregates the same way).
# ---------------------------------------------------------------------------

_IVM_ORACLE = """
WITH o1 AS (
    SELECT o_orderkey AS k, o_custkey AS ck,
           CAST(o_totalprice AS DECIMAL(18,2)) AS p
    FROM orders
),
c1 AS (SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer),
o2 AS (
    SELECT k, ck,
           CASE WHEN k % 7 = 0 AND k % 17 <> 0 THEN p + 1.00 ELSE p END AS p
    FROM o1 WHERE k % 17 <> 0
    UNION ALL
    SELECT k + 10000000, ck, CAST(100.00 AS DECIMAL(18,2)) FROM o1 WHERE k % 13 = 0
),
c2 AS (
    SELECT ck, CASE WHEN ck % 9 = 0 THEN 'UPDATED' ELSE seg END AS seg FROM c1
),
v1 AS (SELECT k, ck, CAST(p AS DOUBLE) AS price, seg FROM o1 JOIN c1 USING (ck)),
v2 AS (SELECT k, ck, CAST(p AS DOUBLE) AS price, seg FROM o2 JOIN c2 USING (ck)),
counts AS (
    SELECT k, ck, price, seg, sum(m) AS mult FROM (
        SELECT *, 1 AS m FROM v2
        UNION ALL
        SELECT *, -1 AS m FROM v1
    ) GROUP BY k, ck, price, seg
)
SELECT k AS o_orderkey, ck AS o_custkey, price, seg AS c_mktsegment,
       CAST(mult AS BIGINT) AS mult
FROM counts WHERE mult <> 0
"""


@register(
    "q_ivm_join_delta",
    oracle=_IVM_ORACLE,
    tags=("phase2", "join", "incremental"),
)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view delta via the IVM identity; oracle = full recompute diff."""
    o1 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    c1 = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("seg")
    )
    k, m = F.col("k"), F.col("m")
    upd_mask = (k % 7 == 0) & (k % 17 != 0)
    d_o = (
        o1.filter(k % 17 == 0).select("k", "ck", "p", F.lit(-1).alias("m"))
        .unionByName(o1.filter(upd_mask).select("k", "ck", "p", F.lit(-1).alias("m")))
        .unionByName(
            o1.filter(upd_mask).select(
                "k", "ck",
                (F.col("p") + F.lit("1.00").cast("decimal(3,2)")).alias("p"),
                F.lit(1).alias("m"),
            )
        )
        .unionByName(
            o1.filter(k % 13 == 0).select(
                (k + 10000000).alias("k"), "ck",
                F.lit("100.00").cast("decimal(18,2)").alias("p"),
                F.lit(1).alias("m"),
            )
        )
    )
    d_c = (
        c1.filter(F.col("ck") % 9 == 0)
        .select("ck", "seg", F.lit(-1).alias("mc"))
        .unionByName(
            c1.filter(F.col("ck") % 9 == 0).select(
                "ck", F.lit("UPDATED").alias("seg"), F.lit(1).alias("mc")
            )
        )
    )
    t1 = d_o.join(c1, "ck").select("k", "ck", "p", "seg", m.alias("mult"))
    t2 = o1.join(d_c, "ck").select("k", "ck", "p", "seg", F.col("mc").alias("mult"))
    t3 = (
        d_o.join(d_c, "ck")
        .select("k", "ck", "p", d_c["seg"].alias("seg"), (m * F.col("mc")).alias("mult"))
    )
    return (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy("k", "ck", F.col("p").cast("double").alias("price"), "seg")
        .agg(F.sum("mult").cast("bigint").alias("mult"))
        .filter(F.col("mult") != 0)
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("ck").alias("o_custkey"),
            "price",
            F.col("seg").alias("c_mktsegment"),
            "mult",
        )
    )


# ---------------------------------------------------------------------------
# q_bloom_filter_eval — Bloom-filter join pruning, measured: build a
# k=3-hash, m=1024-bucket Bloom set from the orders build side
# (distinct o_custkey), probe every customer key through it, and score
# the filter against exact membership — passes, true members, false
# positives, and the realized FP rate. This is the structure behind
# Spark's runtime bloom pruning (spark.sql.optimizer.runtimeFilter.*):
# at 100 TB the probe side drops non-joining rows at the SCAN for the
# cost of a broadcast bit set. md5 hashing keeps both engines'
# buckets identical, so even the false-positive SET is deterministic
# and the verdict row hash-matches.
# ---------------------------------------------------------------------------

_BLOOM_M = 1024
_BLOOM_K = 3


def _bloom_bucket(seed: int, key: str, str_t: str = "VARCHAR") -> str:
    # str_t: "VARCHAR" for the DuckDB oracle, "STRING" for Spark (which
    # rejects length-less VARCHAR); the md5 text is identical either way
    h = f"md5(concat('{seed}', chr(58), CAST({key} AS {str_t})))"
    nib = lambda p: f"(instr('0123456789abcdef', substring({h}, {p}, 1)) - 1)"  # noqa: E731
    val = f"((({nib(1)} * 16 + {nib(2)}) * 16 + {nib(3)}) * 16 + {nib(4)})"
    return f"({val} % {_BLOOM_M})"


def _bloom_buckets_sql(key: str) -> str:
    return ", ".join(_bloom_bucket(s, key) for s in range(_BLOOM_K))


_BLOOM_ORACLE = f"""
WITH build AS (SELECT DISTINCT o_custkey AS k FROM orders),
bits AS (
    SELECT DISTINCT b FROM build, unnest([{_bloom_buckets_sql('k')}]) AS t(b)
),
probe AS (
    SELECT c_custkey AS k, unnest([{_bloom_buckets_sql('c_custkey')}]) AS b
    FROM customer
),
hits AS (
    SELECT p.k, count(*) AS n_hit
    FROM probe p JOIN bits ON p.b = bits.b
    GROUP BY p.k
),
verdict AS (
    SELECT c.c_custkey AS k,
           coalesce(h.n_hit, 0) = {_BLOOM_K} AS in_bloom,
           bd.k IS NOT NULL AS is_member
    FROM customer c
    LEFT JOIN hits h ON c.c_custkey = h.k
    LEFT JOIN build bd ON c.c_custkey = bd.k
)
SELECT count(*) AS n_probed,
       CAST(count(*) FILTER (in_bloom) AS BIGINT) AS n_pass,
       CAST(count(*) FILTER (is_member) AS BIGINT) AS n_members,
       CAST(count(*) FILTER (in_bloom AND NOT is_member) AS BIGINT) AS n_false_pos,
       CAST(count(*) FILTER (NOT in_bloom AND is_member) AS BIGINT) AS n_false_neg,
       CAST(count(*) FILTER (in_bloom AND NOT is_member) AS DOUBLE)
         / greatest(count(*) - count(*) FILTER (is_member), 1) AS fp_rate
FROM verdict
"""


@register("q_bloom_filter_eval", oracle=_BLOOM_ORACLE, tags=("phase2", "join", "sketch"))
def q_bloom_filter_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruning eval: pass/member/false-positive census (FN must be 0)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    build = o.select(F.col("o_custkey").alias("k")).distinct()

    def buckets(key: str):
        return F.array(
            *[F.expr(_bloom_bucket(s, key, str_t="STRING")) for s in range(_BLOOM_K)]
        )

    bits = (
        build.select(F.explode(buckets("k")).alias("b")).distinct()
    )
    probe = c.select(F.col("c_custkey").alias("k"), F.explode(buckets("c_custkey")).alias("b"))
    hits = probe.join(F.broadcast(bits), "b").groupBy("k").agg(F.count("*").alias("n_hit"))
    verdict = (
        c.select(F.col("c_custkey").alias("k"))
        .join(hits, "k", "left")
        .join(build.withColumn("__m", F.lit(True)), "k", "left")
        .select(
            "k",
            (F.coalesce("n_hit", F.lit(0)) == _BLOOM_K).alias("in_bloom"),
            F.coalesce("__m", F.lit(False)).alias("is_member"),
        )
    )
    return verdict.agg(
        F.count("*").alias("n_probed"),
        F.count_if(F.col("in_bloom")).cast("bigint").alias("n_pass"),
        F.count_if(F.col("is_member")).cast("bigint").alias("n_members"),
        F.count_if(F.col("in_bloom") & ~F.col("is_member")).cast("bigint").alias("n_false_pos"),
        F.count_if(~F.col("in_bloom") & F.col("is_member")).cast("bigint").alias("n_false_neg"),
        (
            F.count_if(F.col("in_bloom") & ~F.col("is_member")).cast("double")
            / F.greatest(F.count("*") - F.count_if(F.col("is_member")), F.lit(1))
        ).alias("fp_rate"),
    )


# ---------------------------------------------------------------------------
# q_equidepth_bins — equi-depth (equal-count) histogram of a numeric
# column: per-bin count, min and max. These bin edges ARE the
# range-partitioning boundaries a planner samples for (Spark's
# RangePartitioner / repartitionByRange do exactly this internally) and
# the optimizer-statistics shape (equi-height histograms) used for
# selectivity estimation. The bin assignment equals ntile over the
# fully disambiguated order (price, orderkey, linenumber) — but is
# computed WITHOUT a global window (r4 verdict wrong #1): a two-pass
# bucketed rank (operators/rank.py) does a sampled-boundary range
# bucketing, a PARTITIONED per-bucket row_number, and a broadcast
# cumulative-offset join, then closed-form ntile arithmetic. Every
# shuffle is partitioned; the fact table never collapses to one task.
# ---------------------------------------------------------------------------

_EQUIDEPTH_N = 16

_EQUIDEPTH_ORACLE = f"""
WITH t AS (
    SELECT l_extendedprice,
           ntile({_EQUIDEPTH_N}) OVER (
               ORDER BY l_extendedprice NULLS FIRST, l_orderkey, l_linenumber) AS bin
    FROM lineitem
)
SELECT bin, count(*) AS n_rows,
       min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
FROM t GROUP BY bin
"""


@register("q_equidepth_bins", oracle=_EQUIDEPTH_ORACLE, tags=("phase1", "agg", "stats"))
def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: exact ntile bins, window-free global rank."""
    from ..operators.rank import exact_global_rank, ntile_from_rank

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select("l_extendedprice", "l_orderkey", "l_linenumber")
    # NULL prices sort FIRST (both sides say so explicitly — Spark's asc
    # default, NULLS FIRST in the oracle) and the rank helper's
    # range_expr contract requires NON-NULL: coalesce to a sentinel
    # below the price domain so NULL rows range-bucket with the rows
    # they sort with (fuzz chaos x relational star).
    # total rides along from the helper's persisted bucket counts — no
    # separate count scan of the fact table.
    ranked = exact_global_rank(
        base,
        [F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        F.coalesce(F.col("l_extendedprice"), F.lit(-1e18)),
        rank_name="__grank",
        total_name="__total",
    )
    return (
        ranked
        .select(
            "l_extendedprice",
            ntile_from_rank(F.col("__grank"), F.col("__total"), _EQUIDEPTH_N)
            .cast("int")
            .alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# q_rank_auto — the cost-gated GLOBAL-RANK planner rule
# (operators/planner.auto_rank; VERDICT r6, next #8): input row count
# <= threshold -> one unpartitioned window (optimal when the rows fit a
# task — the gate's count just proved it), above -> the two-pass
# bucketed rank. Unlike auto_knn/auto_dedup the two branches compute
# IDENTICAL values (the bucketed pass is pinned equal to row_number in
# tests/test_properties.py), so the oracle is a plain window function
# plus the scalar-count CASE reproducing the gate; the strategy column
# makes the branch choice itself part of the hash. The driver exercises
# the window branch at sf0.01 (500 docs) and bench the bucketed branch
# at sf0.1 (5000 docs). Ranking metric is coalesce(n_chars, -1): the
# range contract wants a NON-NULL leading key, and NULL placement under
# ORDER BY differs across engines — the sentinel pins NULL-n_chars docs
# below the domain explicitly on both sides (fuzz --nulls).
# ---------------------------------------------------------------------------

_RANK_AUTO_THRESHOLD = 1024

_RANK_AUTO_ORACLE = f"""
WITH n AS (SELECT count(*) AS c FROM documents)
SELECT doc_id,
       coalesce(n_chars, -1) AS metric,
       row_number() OVER (ORDER BY coalesce(n_chars, -1), doc_id) AS rnk,
       count(*) OVER () AS total,
       CASE WHEN (SELECT c FROM n) <= {_RANK_AUTO_THRESHOLD}
            THEN 'window' ELSE 'bucketed' END AS strategy
FROM documents
"""


@register(
    "q_rank_auto", oracle=_RANK_AUTO_ORACLE, tags=("phase1", "rank", "planner")
)
def q_rank_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-gated exact global rank (window vs two-pass bucketed)."""
    from ..operators.planner import auto_rank

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("n_chars"), F.lit(-1)).cast("bigint").alias("metric"),
    )
    return auto_rank(
        d,
        [F.asc("metric"), F.asc("doc_id")],
        F.col("metric"),
        threshold=_RANK_AUTO_THRESHOLD,
        rank_name="rnk",
        total_name="total",
        strategy_name="strategy",
    )


# ---------------------------------------------------------------------------
# q_variant_funcs — Spark 4 VARIANT (the open semi-structured type that
# replaces string-JSON hot paths): JSON built from typed columns ->
# parse_json -> variant_get typed extraction (scalar, nested field,
# array element) -> aggregate. The oracle reads the SAME columns
# directly, so a hash match proves the whole variant round-trip is
# lossless — numbers, strings and nesting survive encode/parse/extract
# bit-for-bit. Extracted money goes through DECIMAL before summing (the
# q_pricing_summary rule). Scale: variant encode/extract is JVM-side
# whole-stage codegen; no UDF, no shuffle before the 3-group agg.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT o_orderstatus AS status,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
       CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
FROM orders
GROUP BY o_orderstatus
"""


@register("q_variant_funcs", oracle=_VARIANT_ORACLE, tags=("phase1", "functions", "variant"))
def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT round-trip: parse_json + typed variant_get extraction."""
    o = load_table(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.struct(
                F.col("o_custkey").alias("cust"),
                F.array(F.col("o_orderpriority")).alias("tags"),
            ).alias("meta"),
        )
    )
    v = o.select(F.parse_json(j).alias("v"))
    ext = v.select(
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.price", "double").alias("price"),
        F.variant_get("v", "$.meta.cust", "bigint").alias("cust"),
        F.variant_get("v", "$.meta.tags[0]", "string").alias("prio"),
    )
    return ext.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.sum("cust").cast("bigint").alias("sum_cust"),
        F.count_if(F.col("prio") == "1-URGENT").cast("bigint").alias("n_urgent"),
    )


# ---------------------------------------------------------------------------
# q_bitwise_funcs — bitwise scalar coverage (§2.3): shifts, masks,
# xor, single-bit probe, popcount. Engine-relevant shapes: hash
# partitioning (key & (2^k - 1)), bitmap membership, simhash-style
# popcount distance (the aggregate form lives in q_simhash_pairs).
# Everything stays bigint: DuckDB << returns BIGINT while Spark
# shiftleft preserves width, and bit_count returns INT in Spark vs
# BIGINT in DuckDB — both sides cast explicitly.
#
# NEGATIVE-KEY CONTRACT (chaos-keys fuzz, round 9): DuckDB REFUSES to
# left-shift a negative number (OutOfRangeException) while Spark's
# shiftleft wraps two's-complement — there is no shared semantics, so
# the contract is shl2 IS NULL for negative keys, spelled identically
# on both sides (right-shift, masks, or/xor, popcount agree on
# negatives in both engines — probed, not assumed).
# ---------------------------------------------------------------------------

_BITWISE_ORACLE = """
SELECT p_partkey,
       CAST(CASE WHEN p_partkey >= 0 THEN p_partkey << 2 END AS BIGINT) AS shl2,
       CAST(p_partkey >> 1 AS BIGINT) AS shr1,
       CAST(p_partkey & 255 AS BIGINT) AS low8,
       CAST(p_partkey | 16 AS BIGINT) AS or16,
       CAST(xor(p_partkey, CAST(p_size AS BIGINT)) AS BIGINT) AS xor_size,
       CAST((p_partkey >> 3) & 1 AS BIGINT) AS bit3,
       CAST(bit_count(p_partkey) AS BIGINT) AS popcount
FROM part
"""


@register("q_bitwise_funcs", oracle=_BITWISE_ORACLE, tags=("phase1", "functions"))
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions over part keys (shifts/masks/popcount)."""
    p = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        F.when(k >= 0, F.shiftleft(k, 2).cast("bigint")).alias("shl2"),
        F.shiftright(k, 1).cast("bigint").alias("shr1"),
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low8"),
        k.bitwiseOR(F.lit(16)).cast("bigint").alias("or16"),
        k.bitwiseXOR(F.col("p_size").cast("bigint")).cast("bigint").alias("xor_size"),
        F.shiftright(k, 3).bitwiseAND(F.lit(1)).cast("bigint").alias("bit3"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


# ---------------------------------------------------------------------------
# q_k_anonymity — privacy audit before a dataset release (Sweeney 2002
# k-anonymity; Machanavajjhala et al. 2007 l-diversity — both public):
# group the table by its quasi-identifier combination, measure each
# equivalence class's size (k) and the diversity of the sensitive
# attribute within it (l = distinct sensitive values), and flag classes
# that fail k>=5 or l>=3 — the rows a release would have to suppress or
# generalize. A training-data pipeline runs exactly this before
# publishing user-derived corpora.
#
# Scale: ONE hash aggregation on the quasi-identifier key (map-side
# partial counts; the distinct-l agg is a two-level partial like any
# count(distinct)) — no joins, no windows; the output is bounded by the
# QI domain, not the table. Sensitive attribute = acctbal bucketed to
# $1000 bands (the release granularity).
# ---------------------------------------------------------------------------

_KANON_K = 5
_KANON_L = 3

_KANON_ORACLE = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(count(DISTINCT floor(c_acctbal / 1000)) AS BIGINT) AS l_distinct,
       CAST(count(*) >= {_KANON_K} AS INT) AS k_anonymous,
       CAST(count(DISTINCT floor(c_acctbal / 1000)) >= {_KANON_L} AS INT) AS l_diverse,
       round(1.0 / count(*), 6) AS reident_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


@register(
    "q_k_anonymity",
    oracle=_KANON_ORACLE,
    tags=("phase3", "privacy", "aggregation"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-equivalence-class k-anonymity / l-diversity audit over the
    (nationkey, mktsegment) quasi-identifier — see the block comment."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000)
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("class_size"),
            F.countDistinct(bucket).cast("bigint").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "l_distinct",
            (F.col("class_size") >= _KANON_K).cast("int").alias("k_anonymous"),
            (F.col("l_distinct") >= _KANON_L).cast("int").alias("l_diverse"),
            F.round(F.lit(1.0) / F.col("class_size"), 6).alias("reident_risk"),
        )
    )
