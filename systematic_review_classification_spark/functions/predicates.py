"""Shared column predicates.

``finite(c)`` — TRUE iff the double column holds a finite value
(not NULL, not NaN, not ±Infinity). The NaN-world sweep
(tests/test_nan_world.py) showed a single non-finite double aborts
ANSI casts (``CAST(NaN AS INT)`` overflows on BOTH engines), blows
DuckDB's stddev/var out of range, and silently corrupts quantile /
rank / bucket assignments. Statistics and cast-bearing operators
therefore filter to finite measures EXPLICITLY, mirrored in their
oracles with DuckDB's ``isfinite(x)``.

Spark has no isfinite built-in; ``NOT isnan(c) AND abs(c) <
'Infinity'`` compiles to plain codegen'd comparisons and keeps
pushdown-friendly conjuncts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite(c: Column | str) -> Column:
    """TRUE iff c is a finite (non-NULL, non-NaN, non-inf) double."""
    col = F.col(c) if isinstance(c, str) else c
    return ~F.isnan(col) & (F.abs(col) < F.lit(_INF))
