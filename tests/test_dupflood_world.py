"""The DUPLICATE-FLOOD world: every document, vector, and fact value
is duplicated k times — exact copies and near-identical variants —
and every oracled key runs on both engines.

This is the cluster-density axis no single-value world covers (the
round-8 verdict's stretch item): dedup families that are correct on
sparse duplicates can break when a fingerprint/band bucket holds 60
members (star-edge election ties, pair blowups), and analytics that
are correct on distinct values can diverge when a sort key or sum is
FLOODED with identical rows:

- 60 EXACT copies of one document across 4 sources, 60 near-identical
  variants (3 variant groups of 20), 30 copies flooded into a single
  source, the same text under two langs — dedup_* star/band/bucket
  paths at real cluster density.
- 40+20+20 duplicate embedding vectors (two exact floods plus a
  1e-3-perturbed near-dup flood) — zero-distance ties in every
  similarity/ANN path.
- duplicate TIMESTAMPS (4 distinct ts shared by 60 events, duplicated
  (user, ts) pairs) — window/asof/session tie behavior.
- fact tables whose measures take only 2 distinct values — duplicate
  floods drive sums onto EXACT DECIMAL MIDPOINTS of the coarse round
  (13 × 95.475 = 1241.175), where a plain round(sum, 2) resolves by
  engine/run summation-order luck (.17 vs .18 — DuckDB's morsel
  scheduling makes it nondeterministic run-to-run). The probe caught
  agg_pricing_summary / agg_partial_final; policy = money_round's
  decimal snap (functions/predicates.py), mirrored in the oracles.
"""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

# Excluded for the same physical-layout/staging reasons as the other
# worlds (streaming micro-batch staging, file-layout observability
# sinks). No key is excluded for a duplication-semantics reason.
EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}

_A = (
    "apache spark shuffles data across the cluster while the optimizer "
    "prunes columns and pushes filters down to the parquet scan so that "
    "every executor reads only the bytes it truly needs for the query plan"
)
_B = (
    "the screening pipeline ranks abstracts by relevance and the review "
    "team reads from the top until the estimated recall target is reached "
    "which saves most of the manual effort in a large systematic review"
)
_C = (
    "duplicate records drift into bibliographic databases through mirrored "
    "exports and shared indexing so the dedup stage must elect exactly one "
    "canonical copy from every flooded cluster before training ever begins"
)

_DOCS = (
    # flood 1: 60 EXACT copies of A across 4 sources (15 each)
    [(i, _A, "en", f"s{i % 4}", len(_A)) for i in range(60)]
    # flood 2: 60 near-identical variants of B — 3 variant groups of
    # 20 (exact dups within a group, near-dups across groups)
    + [
        (100 + i, _B + f" variant {i % 3}", "en", f"s{i % 4}", len(_B) + 10)
        for i in range(60)
    ]
    # flood 3: 30 copies of C all in ONE source (same-source flood)
    + [(200 + i, _C, "en", "s9", len(_C)) for i in range(30)]
    # the same text under a different lang (lang-blocking tie)
    + [(240, _C, "de", "s9", len(_C))]
    + [
        (300, "one tiny unique document about nothing in particular today",
         "en", "s0", 59),
        (301, "another short unique text that matches no other row at all",
         "en", "s1", 59),
    ]
)

_V = [0.1 * ((i % 8) + 1) for i in range(16)]
_VP = [x + (0.001 if i == 0 else 0.0) for i, x in enumerate(_V)]  # near-dup
_W = [1.0 - 0.05 * i for i in range(16)]
_EMB = (
    [(i, _V, i % 2) for i in range(40)]            # 40 identical copies
    + [(100 + i, _VP, i % 2) for i in range(20)]   # 20 near-identical
    + [(200 + i, _W, i % 2) for i in range(20)]    # 20 identical, 2nd vec
    + [(300, [float(i) for i in range(16)], 0)]    # unique
)

# duplicate timestamps: 4 distinct ts shared by 60 events, duplicate
# values, duplicated (user, ts) pairs; one later day so daily
# aggregates have 2 groups
_EVENTS = [
    (i, dt.datetime(2024, 5, 1, 12, 0, [0, 0, 30, 45][i % 4]), (i % 3) + 1,
     ["click", "view", "purchase"][i % 3], [5.0, 5.0, 7.5][i % 3],
     '{"k": %d}' % (i % 3))
    for i in range(60)
] + [
    (100 + i, dt.datetime(2024, 5, 2, 9, 0, (i % 2) * 30), (i % 3) + 1,
     "click", 5.0, '{"k": 0}')
    for i in range(12)
]

# only 2 distinct totalprice values, duplicated dates, 4 customers
_ORDERS = [
    (i + 1, (i % 4) + 1, ["O", "F"][i % 2], [1000.5, 2000.5][i % 2],
     dt.datetime(1997, 3, 1 + (i % 3)), ["1-URGENT", "2-HIGH"][i % 2])
    for i in range(40)
]

# identical measure rows flooded: quantity/price/discount from a
# 2-value pool; (orderkey, linenumber) unique. The 2-value pool is
# what lands group sums on exact decimal midpoints (see module doc).
_LINEITEM = [
    ((i % 40) + 1, (i % 3) + 1, (i % 4) + 1, i // 40 + 1,
     [10.0, 20.0][i % 2], [100.5, 200.5][i % 2], 0.05,
     0.02, ["N", "R", "A"][i % 3], ["O", "F"][i % 2],
     dt.datetime(1997, 3, 2 + (i % 3)))
    for i in range(80)
]

_TABLES = {
    "region": ([(0, "AMERICA"), (1, "EUROPE")], "r_regionkey int, r_name string"),
    "nation": (
        [(0, "BRAZIL", 0), (1, "FRANCE", 1), (2, "GERMANY", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "sup1", 0, 100.5), (2, "sup2", 1, 100.5),
         (3, "sup3", 2, 100.5), (4, "sup4", 0, 200.5)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        # duplicate part names/brands (2 of 3 rows identical but for key)
        [(1, "part1", "Brand#1", "SMALL BRASS", 5, 100.5),
         (2, "part1", "Brand#1", "SMALL BRASS", 5, 100.5),
         (3, "part3", "Brand#2", "LARGE COPPER", 7, 200.5)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        # duplicate names and balances
        [(1, "cust1", 0, 500.5, "BUILDING"), (2, "cust1", 1, 500.5, "BUILDING"),
         (3, "cust3", 2, 500.5, "MACHINERY"), (4, "cust4", 0, 700.5, "MACHINERY")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        _ORDERS,
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
        _DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (_EMB, "vec_id long, embedding array<float>, label int"),
    "events": (
        _EVENTS,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dupflood_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_duplicate_flood(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the duplicate flood: {fails}"
