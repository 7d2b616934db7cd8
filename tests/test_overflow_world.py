"""The OVERFLOW-MAGNITUDE world: finite values too large for the
downstream STORAGE TYPE, every oracled key on both engines.

The NaN world closed the ``CAST(NaN AS BIGINT)`` abort class; this
world closes its finite twin (round 9): a FINITE 1e150 aborts every
int-cast bucket/bin/grid expression exactly the same way (Spark ANSI
CAST_OVERFLOW, DuckDB Conversion Error), and a lying bigint metadata
column sizes a job-killing sequence. What the probe forced:

- ``finite_bounded`` (|x| ≤ 9e15 ≈ 2^53): agg_histogram, wl_psi_drift,
  wl_ks_test, udf_map_pandas, ml_calibration — a finite-but-off-grid
  value has no bucket on either engine (numpy's astype would even
  WRAP it to INT64_MIN garbage silently); bucket indices widened to
  BIGINT so every in-grid value is representable.
- metadata lies: txt_chunk / dedup_paragraph / mm_frame_sample sized
  their sequence() from the n_chars COLUMN — one row claiming 4e18
  chars materializes a 2e16-element array and aborts the executor.
  Work sizing now derives from length(text), never metadata.
- wl_data_vault_keys: the hashdiff rendered money via raw
  double→string, which diverges at 1e7 (Spark '1.0E7' vs DuckDB
  '10000000.0') — now an exact DECIMAL(28,2) rendering, bounded to
  |x| ≤ 9e13 where the double→decimal conversion itself is exact on
  both engines.

DOCUMENTED BOUNDARIES this world deliberately respects (see
functions/predicates.py): money columns stay inside money_round's
portable snap domain (past ~2^53/10^scale DuckDB's double→decimal
conversion is lossy); doubles stay ≤ 1e150 because past ~1e154
DuckDB's variance family ABORTS by design ("out of range") where
Spark yields inf — an engine-level contract difference no query
rewrite reconciles; and sums that MIX magnitudes (1e150 with 1e1, or
1e18 with 1e3) lose the small terms to summation ORDER — catastrophic
cancellation/absorption makes even round(sum, 2) nondeterministic
run-to-run (first caught on agg_time_rollup's grand-total cell:
1e150 − 1e150 + 5 is 5.0 or 0.0 by partial-sum order). No rounding
scheme can mask it, so this world's extreme values share ONE
magnitude (every partial sum exactly representable) and mixed-
magnitude second-moment statistics stay out of the bit-equality
contract.
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

BIG = 4 * 10**18          # bigint metadata lie (n_chars), sums past 2^63
DBIG = 1.0e150            # finite, far beyond INT/BIGINT cast range, but
                          # inside DuckDB's variance domain (~1e154)
IMAX = 2**31 - 1

_VEC_A = [float(i % 7) - 3.0 for i in range(16)]
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(16)]

_TABLES = {
    "region": ([(0, "AMERICA"), (1, "EUROPE")], "r_regionkey int, r_name string"),
    "nation": ([(0, "BRAZIL", 0), (1, "FRANCE", 1)],
               "n_nationkey int, n_name string, n_regionkey int"),
    "supplier": (
        [(1, "sup1", 0, 100.0), (2, "sup2", 1, 200.0), (3, "sup3", 0, 300.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
    "part": (
        [(1, "part1", "Brand#1", "SMALL BRASS", IMAX, 900.0),
         (2, "part2", "Brand#2", "LARGE COPPER", IMAX, 1100.0),
         (3, "part3", "Brand#3", "STD TIN", IMAX, 950.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double"),
    "customer": (
        [(1, "cust1", 0, 500.0, "BUILDING"), (2, "cust2", 1, 600.0, "MACHINERY")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string"),
    "orders": (
        [(1, 1, "O", 1000.5, dt.datetime(1997, 3, 1), "1-URGENT"),
         (2, 2, "F", 2000.5, dt.datetime(1997, 4, 1), "2-HIGH"),
         (3, 1, "O", 1000.0, dt.datetime(1997, 5, 1), "3-MEDIUM")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"),
    "lineitem": (
        [(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", dt.datetime(1997, 3, 2)),
         (2, 2, 2, 1, 20.0, 2000.0, 0.10, 0.04, "R", "F", dt.datetime(1997, 4, 2)),
         (3, 3, 3, 1, 30.0, 3000.0, 0.00, 0.00, "N", "O", dt.datetime(1997, 5, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz"),
    "documents": (
        [(0, "spark makes big data simple and fast", "en", "s0", BIG),
         (1, "le spark est rapide et simple", "fr", "s1", BIG),
         (2, "ein kurzer text ueber gar nichts", "de", "s0", BIG)],
        "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": (
        [(0, _VEC_A, 0), (1, _VEC_B, 1), (2, [1.0e19] * 16, 0)],
        "vec_id long, embedding array<float>, label int"),
    "events": (
        [(0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", DBIG, '{"k": 1}'),
         (1, dt.datetime(2024, 3, 1, 1, 0), 2, "purchase", -DBIG, '{"k": 2}'),
         (2, dt.datetime(2024, 3, 1, 2, 0), 1, "click", DBIG, '{"k": 3}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("overflow_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_overflow_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the overflow world: {fails}"
