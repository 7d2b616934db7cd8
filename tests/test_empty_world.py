"""The EMPTY WORLD: every table zero-row, every oracled key run.

Empty relations are routine at scale — a filter that matches nothing,
a partition with no data, a day with no events — and ANSI mode plus
cross-engine NULL-row semantics make them a distinct bug class from
the degenerate-world values (Spark's global agg emits one NULL row
where a grouped form emits none; codegen ANSI division checks the
zero divisor BEFORE the NULL numerator, so count()=0 denominators
abort even under a NULL sum; empty partitioned writes create no
files, breaking schema inference on readback).

This sweep forced the round-6 fixes to wl_holt_smoothing (ANSI
element_at on an empty series), wl_paired_ttest (s1/n with n=0 under
codegen), and the explicit-readback-schema fixes in src_jsonl /
udf_arrow_convert / sink_partitioned / join_dpp / scan_partition_prune.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

# Excluded, with reasons:
# - stream_* / src_stream_file / sink_parquet / sink_compaction: same
#   physical-layout / staging reasons as test_degenerate_world.py.
# - agg_rollup / agg_cube / agg_gsets / agg_grouping_id /
#   agg_time_rollup: GENUINE ENGINE SEMANTICS DIFFERENCE — on empty
#   input DuckDB (per the SQL standard) still emits the grand-total
#   grouping-set row (count 0, NULL aggregates) while Spark's
#   rollup/cube/grouping-sets emit zero rows. The driver compares on
#   non-empty fixtures where both agree; this divergence is recorded
#   here rather than papered over with a synthetic union row.
EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
    "agg_rollup", "agg_cube", "agg_gsets", "agg_grouping_id",
    "agg_time_rollup",
}

_SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "supplier": "s_suppkey long, s_name string, s_nationkey int,"
    " s_acctbal double",
    "part": "p_partkey long, p_name string, p_brand string, p_type string,"
    " p_size int, p_retailprice double",
    "customer": "c_custkey long, c_name string, c_nationkey int,"
    " c_acctbal double, c_mktsegment string",
    "orders": "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    "lineitem": "l_orderkey long, l_partkey long, l_suppkey long,"
    " l_linenumber int, l_quantity double, l_extendedprice double,"
    " l_discount double, l_tax double, l_returnflag string,"
    " l_linestatus string, l_shipdate timestamp_ntz",
    "documents": "doc_id long, text string, lang string, source string,"
    " n_chars long",
    "embeddings": "vec_id long, embedding array<float>, label int",
    "events": "event_id long, ts timestamp_ntz, user_id long,"
    " event_type string, value double, props string",
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_world"))
    for t, s in _SCHEMAS.items():
        spark.createDataFrame([], s).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_empty_world(spark, world):
    fails = run_world(spark, world, _SCHEMAS, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the empty world: {fails}"
