"""The RAGGED/POISONED-VECTOR world: pathology INSIDE the embedding
arrays, every oracled key run on both engines.

The nan world poisons WHOLE vectors uniformly and the null world NULLs
the whole column; this world carries the intra-array defects a 100 TB
embedding feed actually ships — and its first probe broke 22 keys in
one pass (round 9):

- EMPTY arrays: DuckDB's ``list_reduce`` ERRORS on an empty list where
  Spark's ``F.aggregate`` quietly returns the init value — 14 oracles
  aborted before any comparison. Policy: ``finite_array`` now rejects
  empty arrays, mirrored by ``clean_vec_sql`` in every embedding
  oracle.
- ONE NaN element among finite: the row's norm is NaN, and a bare
  ``nn > 0`` keeps it on BOTH engines (NaN-is-greatest), after which
  ``NaN >= τ`` is FALSE on Spark but TRUE on DuckDB — silent
  divergence, not an abort.
- NULL element inside a healthy array, short-dimension rows, an empty
  corpus dim: pairwise dots are undefined across dims — pair joins now
  require equal lengths; MLlib/GEMM paths filter to the MODAL dim
  (``dominant_dim_only``/``modal_dim_sql``).
- float32-edge magnitudes: one 3e38-component vector made k-means||'s
  cost-weighted init sample nothing else (every other probability
  ~1e-77) and ABORT with an AIOOBE — ml_kmeans now uses uniform init
  over the distinct vector set; ml_calibration's bin cast hit the
  finite-but-off-grid class (finite_bounded).
- an all--0.0 vector: DuckDB's init-less list_reduce folds to -0.0
  where Spark's 0.0-init aggregate gives +0.0 — vmin/vmax/score now
  ride the rnd()/+0.0 signed-zero snap.
"""

from __future__ import annotations

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

_A = [float(i % 7) - 3.0 for i in range(16)]
_B = [float((i * 3) % 5) - 2.0 for i in range(16)]
_NULL_ELT = [x if i != 2 else None for i, x in enumerate(_A)]
_ONE_NAN = [x if i != 5 else NAN for i, x in enumerate(_B)]
_ONE_INF = [x if i != 3 else INF for i, x in enumerate(_B)]

import datetime as dt

_TABLES = {
    "region": ([(0, "AMERICA"), (1, "EUROPE")], "r_regionkey int, r_name string"),
    "nation": ([(0, "BRAZIL", 0), (1, "FRANCE", 1)],
               "n_nationkey int, n_name string, n_regionkey int"),
    "supplier": ([(1, "sup1", 0, 100.0), (2, "sup2", 1, 200.0)],
                 "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
    "part": ([(1, "part1", "Brand#1", "SMALL BRASS", 5, 900.0),
              (2, "part2", "Brand#2", "LARGE COPPER", 10, 1100.0)],
             "p_partkey long, p_name string, p_brand string, p_type string,"
             " p_size int, p_retailprice double"),
    "customer": ([(1, "cust1", 0, 500.0, "BUILDING"),
                  (2, "cust2", 1, 600.0, "MACHINERY")],
                 "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
                 " c_mktsegment string"),
    "orders": ([(1, 1, "O", 1000.5, dt.datetime(1997, 3, 1), "1-URGENT"),
                (2, 2, "F", 2000.5, dt.datetime(1997, 4, 1), "2-HIGH")],
               "o_orderkey long, o_custkey long, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"),
    "lineitem": ([(1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O",
                   dt.datetime(1997, 3, 2)),
                  (2, 2, 2, 1, 20.0, 2000.0, 0.10, 0.04, "R", "F",
                   dt.datetime(1997, 4, 2))],
                 "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
                 " l_quantity double, l_extendedprice double, l_discount double,"
                 " l_tax double, l_returnflag string, l_linestatus string,"
                 " l_shipdate timestamp_ntz"),
    "documents": ([(0, "spark makes big data simple and fast", "en", "s0", 37),
                   (1, "le spark est rapide et simple", "fr", "s1", 29)],
                  "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": (
        [
            (0, _A, 0),
            (1, _B, 1),
            (2, _NULL_ELT, 0),     # NULL element inside the array
            (3, _A[:8], 1),        # short-dimension row (clean but ragged)
            (4, [], 0),            # empty array
            (5, _ONE_NAN, 1),      # one NaN element among finite
            (6, _ONE_INF, 0),      # one Inf element among finite
            (7, [3.0e38] * 16, 1), # f32-near-max: astronomical but finite
            (8, [1.0e-39] * 16, 0),  # subnormal float32
            (9, list(_A), 1),      # exact duplicate of vec 0, other label
            (10, [-0.0] * 16, 0),  # signed zero-norm vector
        ],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": ([(0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0, '{"k": 1}'),
                (1, dt.datetime(2024, 3, 1, 1, 0), 2, "purchase", 60.0, '{"k": 2}')],
               "event_id long, ts timestamp_ntz, user_id long, event_type string,"
               " value double, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ragged_vec_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_ragged_vector_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the ragged-vector world: {fails}"
