"""The DEGENERATE WORLD: every table in its most pathological legal
form, every oracled key run against it.

One fixed scenario — 1-token mono-language document, zero-norm
embedding, single event, all-zero prices/quantities/balances across
the TPC-H tables — drives every data-derived denominator to zero,
every ln/sqrt argument to its boundary, and every label margin to
empty, in ONE pass over the full oracled registry (~7 min). This is
the sweep that caught 9 distinct round-6 bugs (F.corr's ANSI abort,
ln(0) engine divergence, -0.0 round signs, a descending-sequence
slice, empty-postings NULL-vs-'' ...) that per-family fuzz lists had
missed because each list only covers its own tables.

Complements (does not replace) the hypothesis generators in
test_property.py: hypothesis explores shapes, this pins the one shape
that breaks the most expressions at once.
"""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

# Keys excluded from the degenerate world, each with a reason:
# - stream_* / src_stream_file: execute through the micro-batch staging
#   layout that the streaming fuzz (test_property.py streaming tier)
#   builds properly; under this bare directory layout they read empty
#   batch-0 relations, which tests the harness, not the operator.
# - sink_parquet / sink_compaction: outputs depend on the PHYSICAL
#   file layout of the input (file counts, rewrite sizes) by design —
#   observability keys, pinned by their own plan/invariant tests.
EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degenerate_world"))
    spark.createDataFrame(
        [(0, "AMERICA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    ).write.parquet(f"{d}/region.parquet")
    spark.createDataFrame(
        [(0, "BRAZIL", 0), (1, "FRANCE", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(1, "sup1", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(1, "part1", "Brand#1", "SMALL BRASS", 5, 0.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(1, "cust1", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [
            (1, 1, "O", 0.0, dt.datetime(1997, 3, 1), "1-URGENT"),
            (2, 1, "O", 0.0, dt.datetime(1997, 3, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")
    l_row = (0.0, 0.0, 0.0, 0.0, "N", "O", dt.datetime(1997, 3, 2))
    spark.createDataFrame(
        [(1, 1, 1, 1, *l_row), (2, 1, 1, 1, *l_row)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(0, "spark", "zh", "s0", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(0, [0.0] * 64, 0)], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    spark.createDataFrame(
        [(0, dt.datetime(2024, 3, 1), 1, "click", 0.0, '{"k": 0}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return d


def test_every_oracled_key_survives_the_degenerate_world(spark, world):
    tables = (
        "region", "nation", "supplier", "part", "customer", "orders",
        "lineitem", "documents", "embeddings", "events",
    )
    fails = run_world(spark, world, tables, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the degenerate world: {fails}"
