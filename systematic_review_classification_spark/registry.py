"""Central registry mapping SURVEY.md §2 operator keys to queries.

Each operator module registers its queries with the :func:`query`
decorator; ``__spark_entry__.queries()`` / ``oracle_sql()`` read the
assembled dicts. A query with ``oracle=None`` is declared rows-only
(approx algorithms, seeded ML, streaming semantics) and the driver
records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``, optionally with its DuckDB oracle SQL.

    Column-name contract: every computed/aggregate column must carry the
    same alias in the Spark query and the oracle SQL — the driver sorts
    columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in _QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        _QUERIES[key] = fn
        if oracle is not None:
            _ORACLES[key] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    from systematic_review_classification_spark import load_all

    load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    from systematic_review_classification_spark import load_all

    load_all()
    return dict(_ORACLES)
