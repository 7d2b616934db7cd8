"""The BLANK/DEGENERATE-TEXT world: empty-string and whitespace-only
documents, every oracled key on both engines.

The null world owns NULL text; this world owns ZERO-LENGTH and
whitespace-only text (a failed extraction that still wrote a row, a
stripped boilerplate page) plus split-edge shapes: leading/trailing/
double spaces ('' tokens mid-stream), a single long token with no
spaces, and a lone punctuation char. First probe (round 9) caught:

- txt_langid / wl_hygiene_attribution: ratio denominators of
  length(text) ANSI-abort on a zero-length document — NULL via nullif
  on both engines (an empty doc has no vowel/digit ratio).
- mm_decode_stub: Python's list('') is [] but DuckDB's
  string_split('', '') is [''] (one empty token, ascii 0) — the
  zero-byte asset case must be EXPLICIT on both engines (0 px, NULL
  mean), matching the real-codec branch's contract.
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
    (0, "", "en", "s0"),                       # empty string (not NULL)
    (1, " ", "en", "s0"),                      # single space
    (2, "   ", "en", "s1"),                    # spaces only
    (3, "\t\n \t", "en", "s1"),                # tabs/newlines
    (4, "supercalifragilistic" * 10, "en", "s0"),  # one long token, no spaces
    (5, " leading space", "en", "s1"),         # leading space -> '' token
    (6, "trailing space ", "en", "s0"),        # trailing space -> '' token
    (7, "double  space", "en", "s1"),          # '' token mid-stream
    (8, "normal healthy text with words", "en", "s0"),
    (9, ".", "en", "s1"),                      # single punctuation char
]

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
    "documents": ([(i, t, lang, src, len(t)) for i, t, lang, src in _TEXTS],
                  "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": ([(0, _VEC_A, 0), (1, _VEC_B, 1)],
                   "vec_id long, embedding array<float>, label int"),
    "events": ([(0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0, '{"k": 1}'),
                (1, dt.datetime(2024, 3, 1, 1, 0), 2, "purchase", 60.0, '{"k": 2}')],
               "event_id long, ts timestamp_ntz, user_id long, event_type string,"
               " value double, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("blanktext_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_blank_text_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the blank-text world: {fails}"
