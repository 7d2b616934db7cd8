"""The NEGATIVE/BOUNDARY-ID world: negative, zero, and deep-negative
surrogate KEYS in every relation, every oracled key on both engines.

A merged/backfilled 100 TB corpus ships them routinely (hash-derived
synthetic IDs, pre-epoch backfills with negative surrogates), and key
SIGN is where engines can differ: `%` conventions, shifts, hash
inputs, struct-min elections over negative components. The round-9
probe ran the full registry against negative doc/vec/user/order keys
(including a -2^62 surrogate) and caught exactly one divergence:

- fn_bitwise: DuckDB raises Out of Range on `negative << k` where
  Spark shifts arithmetically — shifts are now defined on the
  non-negative domain (NULL elsewhere) on both engines.

Everything else — modulo probe strides (vec_id % 25 on negatives:
both engines truncate toward zero), pmod block assignment, composite
keep-keys, md5-of-negative-id hub keys — agreed. This test pins that
property against regression.
"""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}

_VEC_A = [float(i % 7) - 3.0 for i in range(16)]
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(16)]
_VEC_C = [float((i * 5) % 3) - 1.0 for i in range(16)]

LMIN = -(2**62)  # deep-negative surrogate key (not INT64_MIN: leaves headroom)

_TABLES = {
    "region": ([(0, "AMERICA"), (-1, "EUROPE")], "r_regionkey int, r_name string"),
    "nation": ([(0, "BRAZIL", 0), (-1, "FRANCE", -1)],
               "n_nationkey int, n_name string, n_regionkey int"),
    "supplier": ([(-1, "sup-neg", 0, 100.0), (2, "sup2", -1, 200.0), (0, "sup0", 0, 300.0)],
                 "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
    "part": ([(-5, "partneg", "Brand#1", "SMALL BRASS", -5, 900.0),
              (0, "part0", "Brand#2", "LARGE COPPER", 0, 1100.0),
              (2, "part2", "Brand#3", "STD TIN", 10, 950.0)],
             "p_partkey long, p_name string, p_brand string, p_type string,"
             " p_size int, p_retailprice double"),
    "customer": ([(-7, "custneg", 0, 500.0, "BUILDING"),
                  (0, "cust0", -1, 600.0, "MACHINERY"),
                  (3, "cust3", 0, 700.0, "BUILDING")],
                 "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
                 " c_mktsegment string"),
    "orders": ([(0, -7, "O", 1000.5, dt.datetime(1997, 3, 1), "1-URGENT"),
                (-3, 0, "F", 2000.5, dt.datetime(1997, 4, 1), "2-HIGH"),
                (5, 3, "O", 1500.0, dt.datetime(1997, 5, 1), "3-MEDIUM")],
               "o_orderkey long, o_custkey long, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"),
    "lineitem": ([(0, -5, -1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
                   dt.datetime(1997, 3, 2)),
                  (-3, 0, 2, -1, 20.0, 2000.0, 0.10, 0.04, "R", "F",
                   dt.datetime(1997, 4, 2)),
                  (5, 2, 0, 2, 30.0, 3000.0, 0.00, 0.00, "N", "O",
                   dt.datetime(1997, 5, 2))],
                 "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
                 " l_quantity double, l_extendedprice double, l_discount double,"
                 " l_tax double, l_returnflag string, l_linestatus string,"
                 " l_shipdate timestamp_ntz"),
    "documents": ([(-1, "negative id document about spark and scale", "en", "s0", 41),
                   (0, "zero id document mentions review screening", "en", "s1", 42),
                   (LMIN, "deep negative surrogate key document text", "de", "s0", 41),
                   (7, "an ordinary positive id document as control", "fr", "s1", 43)],
                  "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": ([(-1, _VEC_A, 0), (0, _VEC_B, 1), (LMIN, _VEC_C, 0),
                    (25, _VEC_A, 1), (50, _VEC_B, 0)],
                   "vec_id long, embedding array<float>, label int"),
    "events": ([(-1, dt.datetime(2024, 3, 1, 0, 0), -9, "click", 5.0, '{"k": 1}'),
                (0, dt.datetime(2024, 3, 1, 1, 0), 0, "purchase", 60.0, '{"k": 2}'),
                (3, dt.datetime(2024, 3, 1, 2, 0), -9, "view", 7.5, '{"k": 3}')],
               "event_id long, ts timestamp_ntz, user_id long, event_type string,"
               " value double, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("negid_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_negative_id_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the negative-ID world: {fails}"
