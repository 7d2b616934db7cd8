"""The SKEW WORLD: one hot key dominating every relation, run against
every key on both engines.

Heavy duplication is the shape 100 TB data actually arrives in — one
viral document mirrored everywhere, one bot user emitting most events,
one order holding most line items, and TIED metric values wherever the
duplicates collapse. Ties are the semantic trap: any arg-extremum,
top-k cut, or mode that orders by a non-unique key returns an
ARBITRARY row — nondeterministic across retries and divergent between
engines. The round-7 report-only probe of this world caught exactly
that in ``agg_minmax_by`` (Spark and DuckDB elected different
customers for an equal balance); the fix made the ordering total, and
this test pins the whole registry against the next regression of that
class.
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

# order 1 owns 16 of 18 line items; user 7 emits 12 of 13 events;
# 8 of 9 documents are verbatim copies; 6 of 7 embeddings identical
_LINEITEM = [
    (k, 1, 1, j + 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
     dt.datetime(1997, 3, 2))
    for j, k in enumerate([1] * 16 + [2] * 2)
]

_TABLES = {
    "region": ([(0, "AMERICA"), (1, "EUROPE")], "r_regionkey int, r_name string"),
    "nation": (
        [(0, "BRAZIL", 0), (1, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "sup1", 0, 100.0), (2, "sup2", 0, 100.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [(1, "part1", "Brand#1", "SMALL BRASS", 5, 900.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        # tied balances in one segment — the arg-extremum trap
        [(1, "cust1", 0, 500.0, "BUILDING"), (2, "cust2", 0, 500.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        [(1, 1, "O", 1000.0, dt.datetime(1997, 3, 1), "1-URGENT"),
         (2, 1, "O", 1000.0, dt.datetime(1997, 3, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ),
    "lineitem": (
        _LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ),
    "documents": (
        [(i, "lorem ipsum dolor sit amet " * 3, "en", "s0", 81) for i in range(8)]
        + [(8, "unique document text here", "fr", "s1", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(i, _VEC_A, 0) for i in range(6)] + [(6, _VEC_B, 1)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        [(i, dt.datetime(2024, 3, 1, 0, i % 60), 7, "click", 5.0, '{"k": 1}')
         for i in range(12)]
        + [(12, dt.datetime(2024, 3, 1, 1, 0), 8, "purchase", 60.0, '{"k": 2}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skew_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_key_survives_the_skew_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the skew world: {fails}"
