"""The FLAT / CANCELLATION world: every measure is constructed so
that sums cancel exactly and variances are exactly zero — from
NONZERO values — and every oracled key runs on both engines.

This is the world for the two bug classes round 7's hypothesis tier
caught one key at a time (wl_anomaly_deseasonalized NULL-vs-0.0,
wl_linear_forecast −0.0) and round 8 closes globally. It is DISTINCT
from the degenerate world (zero/constant VALUES — a zero never
exercises sign or residue) and the NaN world (non-finite): here the
inputs are ordinary finite numbers whose AGGREGATES are pathological:

- NONZERO CONSTANT columns (quantity 10.0, discount 0.1): true
  variance is 0, but Spark's central-moment accumulator yields
  exactly 0.0 where DuckDB's sum-of-squares form leaves a
  summation-order-dependent ~1e-16 residue. Unguarded, the residue
  slips past nullif(…, 0) and mints arbitrary statistics — the probe
  measured corr = −0.47 (non-deterministic across runs!), a Welch t
  of 1.8e18, and a Theil index abort. Policy: RELATIVE-epsilon
  flatness tests (var ≤ 1e-9·avg(x²), mu ≤ 1e-9·avg|x|) mirrored on
  both engines (_safe_corr, wl_ab_ttest, wl_theil_index,
  wl_anova_seasonality, wl_anomaly_deseasonalized).
- SYMMETRIC ±v values: group sums cancel to exact 0 (or a residue),
  so share-of-total denominators hit 0 from nonzero inputs and
  winsorized/clamped means land on signed ~1e-14 residues whose
  round(…, n) keeps the − sign on DuckDB and drops it on Spark.
  Policy: rnd() / round(…)+0.0 on every derived zero-able column.
- NEGATIVE flat totals (a user whose value is constantly −5.0, a
  nation whose only customer has negative revenue): 0/negative is
  −0.0 in DuckDB's round; floor-based decimal decomposition renders
  −1000.1 as '-1,001.90' (fn_format); sqrt/ln of a negative aborts
  DuckDB where Spark silently NaN/NULLs (fn_math, wl_theil_index).
  Policy: sign-decomposed formatting, non-negativity gates on both
  engines.
- FLAT daily event series covering all 7 weekdays: the seasonal
  index is flat, so the deseasonalized residual variance is exactly
  0 — the wl_anomaly_deseasonalized class.
- Embedding pairs v/−v: centroids cancel to the zero vector, norms
  to 0 (zero-norm guards must fire identically).

Late-data note: the flat world's 4-way chronological replay also
exposed that applyInPandasWithState does NOT pre-filter late rows, so
a session rebuilt behind the watermark must clamp its TTL horizon to
watermark+1 (stream_stateful_ttl).
"""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

# Excluded for the same physical-layout/staging reasons as the other
# worlds (streaming micro-batch staging, file-layout observability
# sinks). No key is excluded for a cancellation-semantics reason.
EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}

_V = [0.1 * ((i % 8) - 3.5) for i in range(64)]  # symmetric pattern, sum 0
_NV = [-x for x in _V]
_W = [0.3 - 0.01 * (i % 5) for i in range(64)]
_NW = [-x for x in _W]
_FLAT = [0.1] * 64

_D1 = "the quick brown fox jumps over a lazy dog."   # 43 chars
_D2 = "pack my box with five dozen brown jugs now."[:43]

_TABLES = {
    "region": (
        [(0, "AMERICA"), (1, "EUROPE")],
        "r_regionkey int, r_name string",
    ),
    "nation": (
        [(0, "BRAZIL", 0), (1, "FRANCE", 1), (2, "GERMANY", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "sup1", 0, -100.1), (2, "sup2", 1, 100.1),
         (3, "sup3", 2, -100.1), (4, "sup4", 0, 100.1)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [(1, "part1", "Brand#1", "SMALL BRASS", 5, 100.1),
         (2, "part2", "Brand#2", "LARGE COPPER", 5, 100.1),
         (3, "part3", "Brand#1", "SMALL BRASS", 5, 100.1)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        [(1, "cust1", 0, -500.1, "BUILDING"), (2, "cust2", 1, 500.1, "BUILDING"),
         (3, "cust3", 2, -300.1, "MACHINERY"), (4, "cust4", 0, 300.1, "MACHINERY")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        [(1, 1, "O", 1000.1, dt.datetime(1997, 3, 1), "1-URGENT"),
         (2, 1, "F", -1000.1, dt.datetime(1997, 3, 2), "1-URGENT"),
         (3, 2, "O", 250.1, dt.datetime(1997, 3, 3), "2-HIGH"),
         (4, 2, "F", -250.1, dt.datetime(1997, 3, 4), "2-HIGH"),
         (5, 3, "O", -250.1, dt.datetime(1997, 3, 5), "2-HIGH"),
         (6, 4, "O", 250.1, dt.datetime(1997, 3, 6), "3-MEDIUM")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ),
    "lineitem": (
        # quantity CONSTANT 10.0, discount CONSTANT 0.1, tax CONSTANT
        # 0.02, extendedprice symmetric ±100.1 within each returnflag
        [(1, 1, 1, 1, 10.0, 100.1, 0.1, 0.02, "N", "O", dt.datetime(1997, 3, 2)),
         (1, 2, 2, 2, 10.0, -100.1, 0.1, 0.02, "N", "O", dt.datetime(1997, 3, 3)),
         (2, 3, 3, 1, 10.0, 100.1, 0.1, 0.02, "R", "F", dt.datetime(1997, 3, 4)),
         (2, 1, 4, 2, 10.0, -100.1, 0.1, 0.02, "R", "F", dt.datetime(1997, 3, 5)),
         (3, 2, 1, 1, 10.0, 100.1, 0.1, 0.02, "A", "F", dt.datetime(1997, 3, 6)),
         (4, 3, 2, 1, 10.0, -100.1, 0.1, 0.02, "A", "F", dt.datetime(1997, 3, 7))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ),
    "documents": (
        [(0, _D1, "en", "s0", 43), (1, _D1, "en", "s1", 43),
         (2, _D2, "en", "s0", 43), (3, _D2, "en", "s1", 43)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(0, _V, 0), (1, _NV, 1), (2, _W, 0), (3, _NW, 1),
         (4, _FLAT, 0), (5, _FLAT, 1)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        # 8 consecutive days (all 7 weekdays) × 3 events/day:
        # user 1 constant +0.1, user 2 constant −0.1 (the pair
        # cancels), user 3 constant −5.0 → daily total −5.0 (flat
        # NEGATIVE series, day-over-day delta 0 → 0/negative shares)
        [(d * 3 + u, dt.datetime(2024, 3, 1 + d, 6 + u), u + 1,
          ["click", "view", "purchase"][u],
          [0.1, -0.1, -5.0][u], '{"k": %d}' % u)
         for d in range(8) for u in range(3)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("flat_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_flat_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the flat world: {fails}"
