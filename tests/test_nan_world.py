"""The NaN/Inf WORLD: non-finite doubles in every measure column,
every oracled key run on both engines.

A 100 TB feed WILL ship a NaN (0/0 upstream, a corrupt sensor, a
failed join default) and an inf (overflowed accumulator). This world
targets the worst failure class the other worlds can't reach: the
single poisoned double that ABORTS the whole job — ANSI
``CAST(NaN AS INT/BIGINT)`` overflows on BOTH engines, so every
``floor(x)::bigint`` bucket/bin/quantization expression is a landmine;
DuckDB additionally errors its stddev/var family "out of range" on
inf, and ``CAST(inf AS DECIMAL)`` refuses.

Probe-verified agreements that make the world tractable: both engines
propagate NaN through sum/avg/round identically, both treat NaN as
GREATER than +inf in comparisons and sorts (so `x > 0` does NOT
exclude NaN — a trap: filters must test isfinite explicitly), and the
driver canonicalizer renders NaN like NULL on both sides.

The round-6 policy, applied identically on both engines via
``functions/predicates.finite`` ↔ DuckDB ``isfinite``: statistics,
bucketings, quantizations, DECIMAL ledgers, and money renderings
treat a non-finite measure as corrupt input and FILTER it (or null
the derived column) — never abort, never let the engines' NaN
conventions diverge. One genuine limitation is documented instead of
filtered: a pandas UDAF cannot distinguish SQL NULL from NaN (Arrow
delivers both as NaN), so udaf_pandas_agg's oracle declares the
NaN-as-missing contract.

A latent-hazard note this world exposed (wl_q2_mincost): AQE's
empty-relation pruning can skip an entire aggregate subtree at small
fixtures, HIDING an unguarded division/cast that a fuller world
executes — "the suite is green" does not prove an expression is
abort-safe unless some fixture actually forces its evaluation.
"""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

EXCLUDED = {
    # physical-layout / staging exclusions shared with the other worlds
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}

NAN, INF = float("nan"), float("inf")

_VEC_A = [float(i % 7) - 3.0 for i in range(64)]
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(64)]

_TABLES = {
    "region": (
        [(0, "AMERICA"), (1, "EUROPE")],
        "r_regionkey int, r_name string",
    ),
    "nation": (
        [(0, "BRAZIL", 0), (1, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "sup1", 0, 100.0), (2, "sup2", 1, 200.0), (3, "sup3", 0, NAN)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [
            (1, "part1", "Brand#1", "SMALL BRASS", 5, 900.0),
            (2, "part2", "Brand#2", "LARGE COPPER", 10, 1100.0),
            (3, "part3", "Brand#3", "STD TIN", 7, INF),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        [
            (1, "cust1", 0, 500.0, "BUILDING"),
            (2, "cust2", 1, 600.0, "MACHINERY"),
            (3, "cust3", 0, NAN, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        [
            (1, 1, "O", 1000.0, dt.datetime(1997, 3, 1), "1-URGENT"),
            (2, 2, "F", 2000.0, dt.datetime(1997, 4, 1), "2-HIGH"),
            (3, 3, "O", NAN, dt.datetime(1997, 5, 1), "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ),
    "lineitem": (
        [
            (1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
             dt.datetime(1997, 3, 2)),
            (2, 2, 2, 1, 20.0, 2000.0, 0.10, 0.04, "R", "F",
             dt.datetime(1997, 4, 2)),
            (3, 3, 3, 1, NAN, INF, 0.0, 0.0, "N", "O",
             dt.datetime(1997, 5, 2)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ),
    "documents": (
        [
            (0, "spark makes big data simple and fast", "en", "s0", 37),
            (1, "le spark est rapide et simple", "fr", "s1", 29),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(0, _VEC_A, 0), (1, _VEC_B, 1), (2, [NAN] * 64, 0), (3, [INF] * 64, 1)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        [
            (0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0, '{"k": 1}'),
            (1, dt.datetime(2024, 3, 1, 1, 0), 2, "purchase", 60.0, '{"k": 2}'),
            (2, dt.datetime(2024, 3, 1, 2, 0), 1, "click", NAN, '{"k": 3}'),
            (3, dt.datetime(2024, 3, 1, 3, 0), 2, "purchase", INF, '{"k": 4}'),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nan_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_nan_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the NaN world: {fails}"
