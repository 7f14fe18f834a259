"""Vector similarity expressions (SURVEY.md §2.9 V3).

Distance is a *query-time expression*, not an index property (unlike the
reference's Qdrant/FAISS config at
`/root/reference/src/managers/index_manager.py:111,188-190`).

Determinism contract (what makes these oracle-checkable): float elements
are cast to double *before* any arithmetic, and dot products are
left-to-right sequential folds. float*float is exact in double (24-bit
mantissas), and DuckDB's ``list_dot_product`` over DOUBLE lists matches a
sequential double fold bit-for-bit (verified empirically), so Spark and
DuckDB produce identical IEEE doubles — rankings can never diverge.

All expressions are JVM-side (``aggregate``/``zip_with`` higher-order
functions, whole-stage codegen) — no Python UDF in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def as_double_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over double-cast arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_norm_sql(a: str) -> str:
    return f"sqrt(list_dot_product({a}, {a}))"


def cosine(a: Column, b: Column) -> Column:
    """cosine(a,b) = dot / (||a|| * ||b||); inputs must be double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"


def cosine_pre(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with precomputed norms: dot/(na*nb).

    Identical IEEE result to :func:`cosine` (same expression tree, the
    norm subexpressions just evaluated earlier) — but the O(pairs) side
    of a similarity join only pays one fold per pair instead of three.
    Precompute norms per VECTOR before the join; at 100 TB this is the
    difference between 1x and 3x the interpreted-HOF cost on the blown-up
    pair set.
    """
    return dot(a, b) / (norm_a * norm_b)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_distance_sql(a: str, b: str) -> str:
    # list_distance computes sqrt(sum((x-y)^2)) sequentially over doubles.
    return f"list_distance({a}, {b})"
