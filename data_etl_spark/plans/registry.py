"""Registry mapping query names to (Spark callable, DuckDB oracle SQL).

This is the engine's public query surface and the driver's correctness
contract (__spark_entry__.py): every SQL-expressible operator has both a
PySpark DataFrame implementation and an equivalent ANSI-SQL oracle that
DuckDB runs on the same parquet. Column names/aliases must match exactly
between the two — the driver sorts columns by name before value-hashing.

Determinism rules (SURVEY.md §7 "What's hard"):
- no monotonically_increasing_id; enumerations via ordered windows with
  total orderings (ties broken by full key);
- money aggregates in DECIMAL (order-independent exact sums), converted
  to DOUBLE only as a final single deterministic step;
- session timezone pinned to UTC in every callable (session.prep).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import prep

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}

#: SF-cap inventory (VERDICT r10 #7): the queries that intentionally run
#: on a CAPPED input slice because their job is branch/parity
#: correctness, not scale measurement — each cap must appear as the
#: same literal bound in BOTH the engine filter and the oracle SQL, and
#: tests/test_entry_contract.py asserts completeness in both
#: directions (every *_CAP constant in a plan function is declared
#: here; every declaration matches the code), so a future cap cannot
#: slip in as a silent bench dodge.
CAPPED_QUERIES: dict[str, dict] = {}


def register_cap(
    name: str, column: str, bound: int, constant: str, rationale: str
) -> None:
    """Declare that query ``name`` runs on ``column < bound`` (carried
    by module constant ``constant``) — see CAPPED_QUERIES."""
    if name in CAPPED_QUERIES:
        raise ValueError(f"duplicate cap declaration for {name!r}")
    CAPPED_QUERIES[name] = {
        "column": column,
        "bound": bound,
        "constant": constant,
        "rationale": rationale,
    }


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prep(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__  # the PLAN module, for
        wrapped.__wrapped__ = fn            # fingerprinting/introspection
        REGISTRY[name] = Query(name, wrapped, oracle, tuple(tags), doc=fn.__doc__ or "")
        return wrapped

    return deco
