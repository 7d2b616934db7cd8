"""The MULTI-FILE SCATTER world: every table physically split across
several tiny parquet files in shuffled row order, every oracled key
on both engines.

At 100 TB no table is one file: a table is thousands of parts whose
enumeration order differs by lister, and Spark's parallel scan
interleaves them nondeterministically. A single-file fixture
therefore MASKS input-order dependence: any key leaning on
first/any_value without a window, on collect_list order without
array_sort, or on a LIMIT without full ORDER BY could hash-match by
luck on one file and diverge on a real multi-part layout (or between
runs). This world writes every table via round-robin repartition —
rows deliberately scattered out of key order across 5 parts — and
requires every oracled key to still hash-match DuckDB reading the
same parts via glob (DuckDB's glob order ≠ Spark's split order, so
agreement proves order-independence, the determinism convention
SURVEY §1.4.4 demands of every key).
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

_VEC = lambda seed, n=16: [float((seed + i * 3) % 7) - 3.0 for i in range(n)]

_TEXTS = [
    "spark makes big data simple and fast",
    "le spark est rapide et simple",
    "ein kurzer text ueber gar nichts",
    "data pipelines scale with partitions",
    "plain words repeated words repeated here",
    "another short document about engines",
    "sorting must never matter for results",
    "hash joins shuffle on their keys",
]

_TABLES = {
    "region": ([(i, n) for i, n in enumerate(["AMERICA", "EUROPE", "ASIA"])],
               "r_regionkey int, r_name string"),
    "nation": ([(0, "BRAZIL", 0), (1, "FRANCE", 1), (2, "CHINA", 2),
                (3, "CANADA", 0)],
               "n_nationkey int, n_name string, n_regionkey int"),
    "supplier": ([(i, f"sup{i}", i % 4, 100.0 * (i + 1)) for i in range(6)],
                 "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
    "part": ([(i, f"part{i}", f"Brand#{i % 3}", ["SMALL BRASS", "LARGE COPPER",
               "STD TIN"][i % 3], 5 + i, 900.0 + 50.0 * i) for i in range(8)],
             "p_partkey long, p_name string, p_brand string, p_type string,"
             " p_size int, p_retailprice double"),
    "customer": ([(i, f"cust{i}", i % 4, 500.0 + 10.0 * i,
                   ["BUILDING", "MACHINERY", "AUTOMOBILE"][i % 3])
                  for i in range(8)],
                 "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
                 " c_mktsegment string"),
    "orders": ([(i, (i % 8), "OF"[i % 2], 1000.0 + 7.5 * i,
                 dt.datetime(1997, 1 + i % 12, 1 + i % 28),
                 ["1-URGENT", "2-HIGH", "3-MEDIUM"][i % 3]) for i in range(24)],
               "o_orderkey long, o_custkey long, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"),
    "lineitem": ([(i % 24, (i % 8) + 1, (i % 6) + 1, i % 7 + 1,
                   10.0 + i % 5, 1000.0 + 13.0 * i, 0.01 * (i % 9),
                   0.01 * (i % 5), "NRA"[i % 3], "OF"[i % 2],
                   dt.datetime(1997, 1 + i % 12, 2 + i % 27)) for i in range(48)],
                 "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
                 " l_quantity double, l_extendedprice double, l_discount double,"
                 " l_tax double, l_returnflag string, l_linestatus string,"
                 " l_shipdate timestamp_ntz"),
    "documents": ([(i, t, ["en", "fr", "de"][i % 3], f"s{i % 2}", len(t))
                   for i, t in enumerate(_TEXTS)],
                  "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": ([(i, _VEC(i), i % 2) for i in range(10)],
                   "vec_id long, embedding array<float>, label int"),
    "events": ([(i, dt.datetime(2024, 3, 1 + i % 5, i % 24, i % 60), (i % 4) + 1,
                 ["click", "view", "purchase"][i % 3], 5.0 * (i % 11),
                 f'{{"k": {i % 7}}}') for i in range(40)],
               "event_id long, ts timestamp_ntz, user_id long, event_type string,"
               " value double, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("multifile_world"))
    for t, (rows, schema) in _TABLES.items():
        # round-robin repartition scatters rows across 5 parts in
        # neither key nor insertion order — the adversarial layout
        (spark.createDataFrame(rows, schema)
         .repartition(5)
         .write.parquet(f"{d}/{t}.parquet"))
    return d


def test_every_oracled_key_survives_the_multifile_scatter(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the multi-file scatter: {fails}"


# --- degenerate parts (world B) -------------------------------------
# The physical-layout twin of the r6 empty-world bugs: at 100 TB a
# table's parts are NOT uniform — compaction leaves zero-row files,
# predicate-pushdown writers emit single-row tails, and a reader that
# assumes "every split has rows" or "splits are comparable in size"
# breaks exactly there. World B lays every table out as: one ZERO-ROW
# parquet part + one 1-ROW part + the remaining rows scattered across
# 3 shuffled parts (maximal scatter skew). Every oracled key must
# still hash-match DuckDB reading the same parts via glob.


@pytest.fixture(scope="module")
def world_degenerate(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("multifile_degenerate_world"))
    for t, (rows, schema) in _TABLES.items():
        path = f"{d}/{t}.parquet"
        # 1-row part
        (spark.createDataFrame(rows[:1], schema)
         .coalesce(1)
         .write.mode("append").parquet(path))
        # remaining rows scattered across 3 parts, shuffled order
        (spark.createDataFrame(rows[1:], schema)
         .repartition(3)
         .write.mode("append").parquet(path))
        # zero-row part: force a single empty task to commit a
        # 0-row file (rows=[] with coalesce(1) writes one part file
        # holding only schema metadata)
        (spark.createDataFrame([], schema)
         .coalesce(1)
         .write.mode("append").parquet(path))
    return d


def test_every_oracled_key_survives_degenerate_parts(spark, world_degenerate):
    import glob as _glob

    # the layout must actually contain a 0-row part, or the world
    # tests nothing — guard against Spark versions that skip the file
    for t in _TABLES:
        parts = _glob.glob(f"{world_degenerate}/{t}.parquet/*.parquet")
        # 1-row part + scattered remainder (repartition SKIPS empty
        # partitions on write, so tiny tables emit <3 scatter files) +
        # the explicit 0-row part
        assert len(parts) >= 3, f"{t}: expected >=3 parts, got {len(parts)}"
        import pyarrow.parquet as pq

        sizes = sorted(pq.ParquetFile(p).metadata.num_rows for p in parts)
        assert sizes[0] == 0, f"{t}: no zero-row part was written ({sizes})"
        assert 1 in sizes, f"{t}: no single-row part was written ({sizes})"
    fails = run_world(spark, world_degenerate, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on degenerate parts: {fails}"
