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


def rnd(c: Column | str, scale: int = 6) -> Column:
    """Round to ``scale`` digits AND normalize IEEE −0.0 to +0.0.

    The −0.0 class keeps recurring key-by-key (Wilson interval r4,
    wl_change_attribution / wl_rate_volume_mix r6, wl_linear_forecast
    r7): a derived value that rounds to exact zero can carry sign
    −0.0 on one engine and +0.0 on the other (e.g. DuckDB's round
    keeps the sign of ``0/negative`` and of a negative product that
    rounds away; Spark's drops it), and the driver's ``repr(float)``
    canonicalizer distinguishes them. ``round(x) + 0.0`` is the IEEE
    identity that maps both zeros to +0.0 (round-to-nearest mode) and
    propagates NULL, so rounding through this helper closes the class
    structurally. Oracles mirror it as ``round(expr, n) + 0.0``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col, scale) + F.lit(0.0)


def money_round(c: Column | str, scale: int = 2) -> Column:
    """round() for money-like DOUBLE aggregates, via a decimal snap —
    closes the FP-SUMMATION-MIDPOINT class (duplicate-flood world,
    round 9).

    A sum/avg of 2-to-4-decimal-digit money values can land EXACTLY
    on a coarse-round midpoint in decimal (the flood world's
    13 × 95.475 = 1241.175), while the binary double each engine
    accumulates sits ±1 ulp around it depending on SUMMATION ORDER —
    so round(x, 2) resolves to .17 on one engine/run and .18 on
    another (DuckDB's morsel scheduling makes it nondeterministic
    even run-to-run). Snapping the aggregate to DECIMAL(28,6) first
    is order-robust (the ±1 ulp wobble is ~9 orders below the 1e-6
    snap grid) and engine-consistent: double→decimal rounds to the
    same 6-digit decimal on both engines (probe-verified), and
    round(DECIMAL, 2) is half-up on both, so the midpoint resolves
    identically. Non-finite values bypass the snap (CAST(NaN/inf AS
    DECIMAL) ABORTS on both engines — NaN-world policy) and propagate
    through the plain round; NULL propagates as NULL. Domain bound:
    |x| < 1e22 (DECIMAL(28,6) capacity) — money sums at any real
    scale; beyond it the ANSI cast aborts loudly rather than
    rounding silently. Oracle mirror:
    ``CASE WHEN isfinite(x) THEN CAST(round(CAST(x AS DECIMAL(28,6)),
    n) AS DOUBLE) ELSE round(x, n) END``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        finite(col),
        F.round(col.cast("decimal(28,6)"), scale).cast("double"),
    ).otherwise(F.round(col, scale))


def finite_array(c: Column | str) -> Column:
    """TRUE iff c is a non-NULL array whose every element is finite.

    The vector-hygiene twin of ``finite``: MLlib vector ops abort on
    non-finite components ('Vector values MUST NOT be NaN or
    Infinity') and NPE on NULL arrays, so every embedding-consuming
    operator filters rows through this before ``array_to_vector`` —
    a corrupt vector is corrupt input, never a job abort. All-lambda
    higher-order form: stays JVM-side codegen, no Python."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNotNull() & F.forall(
        col, lambda x: x.isNotNull() & finite(x.cast("double"))
    )
