"""The EXTREME-TIMESTAMP WORLD: pre-epoch (1950) and far-future (2199)
event times in every temporal table, run against every key on both
engines.

Timestamps outside the unix-epoch comfort zone are where epoch
arithmetic silently breaks: negative epoch micros flip integer
division toward zero instead of -inf (day/bucket boundaries shift by
one), 32-bit second math overflows, and windows/watermarks anchored
at epoch 0 sit BETWEEN the data points. A 100 TB archive ingest WILL
carry a 1969 mainframe record and a fat-fingered 2199 expiry date.
Added in round 7 after a report-only probe ran the full registry
clean — the test pins that property against regression.
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
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(64)]

_OLD = dt.datetime(1950, 6, 1, 12, 0)
_NEW = dt.datetime(2199, 12, 31, 23, 59)

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
        [(1, 1, "O", 1000.0, _OLD, "1-URGENT"),
         (2, 1, "F", 2000.0, _NEW, "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ),
    "lineitem": (
        [(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", _OLD),
         (2, 1, 1, 1, 20.0, 2000.0, 0.10, 0.04, "R", "F", _NEW)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ),
    "documents": (
        [(0, "old doc text here", "en", "s0", 17),
         (1, "new doc text here", "fr", "s1", 17)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(0, _VEC_A, 0), (1, _VEC_B, 1)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        [(0, _OLD, 1, "signup", 5.0, '{"k": 1}'),
         (1, _NEW, 1, "purchase", 60.0, '{"k": 2}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("extreme_ts_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_key_survives_the_extreme_ts_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the extreme-timestamp world: {fails}"
