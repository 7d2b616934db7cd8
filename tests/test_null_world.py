"""The NULL WORLD: every nullable non-key column gets a NULL row,
every oracled key run on both engines.

Dirty nulls are routine at 100 TB — a failed fetch, a schema-drifted
upstream, an optional field — and they are a bug class distinct from
degenerate VALUES (test_degenerate_world.py) and empty RELATIONS
(test_empty_world.py), because the two engines' NULL conventions
genuinely diverge:

- SORT position: Spark orders NULLS FIRST (ascending), DuckDB NULLS
  LAST — any rank / cumulative sum / ntile / fold over a nullable
  ordering key silently shifts every real row's position
  (wl_cusum, wl_gini, wl_lorenz_points, wl_equidepth_bins,
  ml_label_index, wl_holt_smoothing).
- concat: Spark propagates a NULL argument, DuckDB concat() SKIPS it
  (|| propagates on both) — hashes/keys built by concatenation
  silently hash the remainder (fn_hash, fn_string, fn_url,
  ml_feature_cross, wl_data_vault_keys).
- printf/format: Java renders NULL %s as the literal "null", DuckDB
  returns NULL (fn_format); df.stat.crosstab stringifies the NULL
  key as "null" (stat_crosstab).
- list folds: DuckDB list_reduce RAISES on NULL/empty lists, Spark
  aggregate() returns NULL / the init value (fn_array_hof,
  txt_fingerprint, mm_decode_stub).
- Python workers: a row UDF / UDTF / mapInPandas body that assumes
  non-None crashes the executor outright (udf_python, udtf_python,
  mm_decode_stub); a pandas UDAF's sum() turns an all-NULL group
  into 0.0 where SQL avg gives NULL (udaf_pandas_agg).
- multi-column count(DISTINCT a, b): Spark skips rows with ANY NULL,
  DuckDB counts the (NULL, NULL) row-value (agg_count_distinct);
  Spark struct ORDERING never yields NULL, SQL row-value comparison
  is three-valued (fn_struct); correlated equality on a NULL group
  key finds nothing (wl_soft_dedup_sampling).

The round-6 policy each fix applies IDENTICALLY on both engines:
time-axis / rank operators drop NULL keys explicitly; key-building
hashes either null out (||) or coalesce with kept delimiters (data
vault); Python UDFs are NULL-total like their SQL twins.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

# Excluded for the same physical-layout/staging reasons as
# test_degenerate_world.py (streaming micro-batch staging, file-layout
# observability sinks). No key is excluded for a NULL-semantics reason.
EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}

import datetime as dt

_VEC_A = [float(i % 7) - 3.0 for i in range(64)]
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(64)]

_TABLES = {
    "region": (
        [(0, "AMERICA"), (1, "EUROPE"), (2, None)],
        "r_regionkey int, r_name string",
    ),
    "nation": (
        [(0, "BRAZIL", 0), (1, "FRANCE", 1), (2, None, None)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "sup1", 0, 100.0), (2, "sup2", 1, 200.0), (3, None, None, None)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [
            (1, "part1", "Brand#1", "SMALL BRASS", 5, 900.0),
            (2, "part2", "LARGE COPPER", "LARGE COPPER", 10, 1100.0),
            (3, None, None, None, None, None),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        [
            (1, "cust1", 0, 500.0, "BUILDING"),
            (2, "cust2", 1, 600.0, "MACHINERY"),
            (3, None, None, None, None),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        [
            (1, 1, "O", 1000.0, dt.datetime(1997, 3, 1), "1-URGENT"),
            (2, 2, "F", 2000.0, dt.datetime(1997, 4, 1), "2-HIGH"),
            (3, None, None, None, None, None),
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
            (3, None, None, 2, None, None, None, None, None, None, None),
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
            (2, None, None, None, None),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(0, _VEC_A, 0), (1, _VEC_B, 1), (2, None, None)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        [
            (0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0, '{"k": 1}'),
            (1, dt.datetime(2024, 3, 1, 1, 0), 2, "purchase", 60.0, '{"k": 2}'),
            (2, None, None, None, None, None),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("null_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_null_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the null world: {fails}"
