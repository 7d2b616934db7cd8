"""The SINGLE-ROW WORLD: every table exactly one row, every key on
both engines.

One row is the boundary where distributional assumptions silently
collapse: n−1 variance factors hit zero, every window frame is its
own partition, medians equal minima equal maxima, splits/folds/CV
have nothing to hold out, and per-group spreads are degenerate
everywhere at once. The degenerate world covers zero/constant VALUES;
this world covers minimal CARDINALITY with healthy values. Added in
round 7 after a report-only probe ran the full registry clean —
the test pins that property against regression.
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

_VEC_A = [float(i % 7) - 3.0 for i in range(64)]

_TS = dt.datetime(1997, 3, 1)

_TABLES = {
    "region": ([(0, "AMERICA")], "r_regionkey int, r_name string"),
    "nation": (
        [(0, "BRAZIL", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "sup1", 0, 100.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [(1, "part1", "Brand#1", "SMALL BRASS", 5, 900.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        [(1, "cust1", 0, 500.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        [(1, 1, "O", 1000.0, _TS, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ),
    "lineitem": (
        [(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
          dt.datetime(1997, 3, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ),
    "documents": (
        [(0, "spark makes big data simple", "en", "s0", 27)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(0, _VEC_A, 0)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        [(0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0, '{"k": 1}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("single_row_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_key_survives_the_single_row_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the single-row world: {fails}"
