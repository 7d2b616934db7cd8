"""The SCHEMA-DRIFT world: the same logical tables arriving with
NARROWER / WIDER physical types — int32 keys, float32 measures,
smallint lengths, float64 embeddings — every oracled key on both
engines.

At 100 TB the engine never owns its inputs: an upstream team
re-exports with pandas (int64 → int32 when values fit), a vendor
feed ships REAL instead of DOUBLE, an embedding service switches to
float64. What the round-10 probe run established (4 keys broke on raw drifted
parquet): width-sensitivity is an ENGINE-INGEST problem, not a
per-operator one —

- hll_sketch_agg ABORTS outright on SMALLINT input
  (wl_hll_daily_rollup); win_ewma's fold state double vs float
  element mismatched the same way;
- DuckDB rounds a REAL measure in float32 space (fn_math read
  142.9290008544922 where Spark's double-widened round read 142.929)
  and compares REAL to DECIMAL literals by its own promotion rules
  (agg_filtered's FILTER matched different rows per engine), while
  Spark widens float → double before both.

The fix is one-place: ``sources.tables.load`` widens every drifted
SCALAR column to its canonical logical type at ingest (exact
widenings, no-op cast list on a canonical corpus), and this world's
oracle views mirror that via SELECT * REPLACE casts — both engines
then see identical logical types, which is the contract a 100 TB
ingest layer owes its operators. Vector columns need no
normalization: the embedding family casts elements to double before
arithmetic (r9 convention) and survived the DOUBLE[] drift unchanged
(mm_embed_quantize's r10 isfinite(mx-mn) escape covers the only
double-only abort path).
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

_TEXTS = [
    ("spark makes big data simple and fast", "en", "s0"),
    ("le spark est rapide et simple", "fr", "s1"),
    ("ein kurzer text ueber gar nichts", "de", "s0"),
    ("data pipelines scale with partitions", "en", "s1"),
]

# Same logical content as the healthy small worlds, but every numeric
# column at a DIFFERENT physical width than the driver corpus.
_TABLES = {
    "region": ([(0, "AMERICA"), (1, "EUROPE")],
               "r_regionkey smallint, r_name string"),
    "nation": ([(0, "BRAZIL", 0), (1, "FRANCE", 1)],
               "n_nationkey smallint, n_name string, n_regionkey smallint"),
    "supplier": ([(1, "sup1", 0, 100.0), (2, "sup2", 1, 200.0)],
                 "s_suppkey int, s_name string, s_nationkey smallint,"
                 " s_acctbal float"),
    "part": ([(1, "part1", "Brand#1", "SMALL BRASS", 5, 900.0),
              (2, "part2", "Brand#2", "LARGE COPPER", 10, 1100.0)],
             "p_partkey int, p_name string, p_brand string, p_type string,"
             " p_size smallint, p_retailprice float"),
    "customer": ([(1, "cust1", 0, 500.0, "BUILDING"),
                  (2, "cust2", 1, 600.0, "MACHINERY")],
                 "c_custkey int, c_name string, c_nationkey smallint,"
                 " c_acctbal float, c_mktsegment string"),
    "orders": ([(1, 1, "O", 1000.5, dt.datetime(1997, 3, 1), "1-URGENT"),
                (2, 2, "F", 2000.5, dt.datetime(1997, 4, 1), "2-HIGH"),
                (3, 1, "O", 1500.0, dt.datetime(1997, 5, 1), "3-MEDIUM")],
               "o_orderkey int, o_custkey int, o_orderstatus string,"
               " o_totalprice float, o_orderdate timestamp_ntz,"
               " o_orderpriority string"),
    "lineitem": ([(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
                   dt.datetime(1997, 3, 2)),
                  (2, 2, 2, 1, 20.0, 2000.0, 0.10, 0.04, "R", "F",
                   dt.datetime(1997, 4, 2)),
                  (3, 1, 2, 2, 30.0, 3000.0, 0.00, 0.00, "N", "O",
                   dt.datetime(1997, 5, 2))],
                 "l_orderkey int, l_partkey int, l_suppkey int,"
                 " l_linenumber smallint, l_quantity float,"
                 " l_extendedprice float, l_discount float, l_tax float,"
                 " l_returnflag string, l_linestatus string,"
                 " l_shipdate timestamp_ntz"),
    "documents": (
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(_TEXTS)],
        "doc_id int, text string, lang string, source string,"
        " n_chars smallint"),
    "embeddings": ([(0, [float(x) for x in _VEC_A], 0),
                    (1, [float(x) for x in _VEC_B], 1)],
                   "vec_id int, embedding array<double>, label smallint"),
    "events": (
        [(i, dt.datetime(2024, 3, 1, i % 24, 0), (i % 3) + 1,
          ["click", "view", "purchase"][i % 3], 5.0 * (i + 1),
          f'{{"k": {i}}}')
         for i in range(6)],
        "event_id int, ts timestamp_ntz, user_id smallint,"
        " event_type string, value float, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("schemadrift_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


_DUCK_TYPES = {"int": "INTEGER", "bigint": "BIGINT", "double": "DOUBLE",
               "timestamp_ntz": "TIMESTAMP"}


def _duck_casts():
    """The oracle-view mirror of load()'s ingest normalization, built
    from the engine's own canonical-type table so the two can never
    drift apart."""
    from systematic_review_classification_spark.sources.tables import _CANONICAL

    return {
        t: {c: _DUCK_TYPES[ty] for c, ty in cols.items()}
        for t, cols in _CANONICAL.items()
    }


def test_every_oracled_key_survives_the_schema_drift_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED, duck_casts=_duck_casts())
    assert not fails, f"{len(fails)} keys broke on the schema-drift world: {fails}"


# --- temporal drift (world B) --------------------------------------
# The temporal twin of width drift: a warehouse export ships
# o_orderdate / l_shipdate as DATE (not timestamp) and a CSV relay
# ships events.ts as ISO VARCHAR. load() widens DATE → timestamp_ntz
# (midnight) via _CANONICAL and normalize_event_ts owns the ts
# variants; the oracle views mirror with CAST AS TIMESTAMP.

_TABLES_B = dict(_TABLES)
_TABLES_B["orders"] = (
    [(1, 1, "O", 1000.5, dt.date(1997, 3, 1), "1-URGENT"),
     (2, 2, "F", 2000.5, dt.date(1997, 4, 1), "2-HIGH"),
     (3, 1, "O", 1500.0, dt.date(1997, 5, 1), "3-MEDIUM")],
    "o_orderkey int, o_custkey int, o_orderstatus string,"
    " o_totalprice float, o_orderdate date, o_orderpriority string")
_TABLES_B["lineitem"] = (
    [(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", dt.date(1997, 3, 2)),
     (2, 2, 2, 1, 20.0, 2000.0, 0.10, 0.04, "R", "F", dt.date(1997, 4, 2)),
     (3, 1, 2, 2, 30.0, 3000.0, 0.00, 0.00, "N", "O", dt.date(1997, 5, 2))],
    "l_orderkey int, l_partkey int, l_suppkey int, l_linenumber smallint,"
    " l_quantity float, l_extendedprice float, l_discount float,"
    " l_tax float, l_returnflag string, l_linestatus string,"
    " l_shipdate date")
_TABLES_B["events"] = (
    [(i, f"2024-03-01 {i % 24:02d}:00:00", (i % 3) + 1,
      ["click", "view", "purchase"][i % 3], 5.0 * (i + 1), f'{{"k": {i}}}')
     for i in range(6)],
    "event_id int, ts string, user_id smallint, event_type string,"
    " value float, props string")


@pytest.fixture(scope="module")
def world_b(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("schemadrift_world_b"))
    for t, (rows, schema) in _TABLES_B.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_temporal_drift_world(spark, world_b):
    casts = _duck_casts()
    casts.setdefault("orders", {})["o_orderdate"] = "TIMESTAMP"
    casts.setdefault("lineitem", {})["l_shipdate"] = "TIMESTAMP"
    casts.setdefault("events", {})["ts"] = "TIMESTAMP"
    fails = run_world(spark, world_b, _TABLES_B, EXCLUDED, duck_casts=casts)
    assert not fails, f"{len(fails)} keys broke on the temporal-drift world: {fails}"


# --- wider-than-canonical drift (world C) --------------------------
# The inverse drift class (r10 ADVICE): an upstream export ships a
# column WIDER than canonical — BIGINT l_linenumber where the engine's
# canonical is INT, DECIMAL(12,2) prices where canonical is DOUBLE.
# load() must NOT silently narrow (an ANSI narrowing cast can abort
# mid-query on overflow; decimal→double is lossy): the contract is a
# loud ValueError at ingest, before any query plan is built.


def test_wider_than_canonical_drift_fails_loudly_at_ingest(spark, tmp_path):
    from systematic_review_classification_spark.sources.tables import load

    d = str(tmp_path / "wide_world")
    spark.createDataFrame(
        [(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
          dt.datetime(1997, 3, 2))],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp_ntz",
    ).write.parquet(f"{d}/lineitem.parquet")
    with pytest.raises(ValueError, match="l_linenumber.*not an exact widening"):
        load(spark, d, "lineitem")


def test_lossy_decimal_drift_fails_loudly_at_ingest(spark, tmp_path):
    from systematic_review_classification_spark.sources.tables import load

    d = str(tmp_path / "decimal_world")
    spark.createDataFrame(
        [(1, 1, "O", 1000.50, dt.datetime(1997, 3, 1), "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz,"
        " o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice",
        "o_orderdate", "o_orderpriority",
    ).write.parquet(f"{d}/orders.parquet")
    with pytest.raises(ValueError, match="o_totalprice.*not an exact widening"):
        load(spark, d, "orders")
