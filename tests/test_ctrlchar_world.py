"""The CONTROL-CHARACTER world: invisible and non-printing codepoints
in every string column, every oracled key on both engines.

A 100 TB scrape carries what the unicode world (round 6) deliberately
left out: NUL bytes from binary-contaminated pages, vertical-tab /
form-feed from PDF text extraction, bare CR and CRLF from DOS files,
NBSP / zero-width characters from HTML, and the Unicode
Other_Uppercase / Other_Lowercase letters (Roman numerals Ⅰ Ⅻ,
ordinal indicators ª º) that sit OUTSIDE the Lu/Ll general categories.

Known cross-engine fault lines this world prices (probe-verified
round 10):

- Java regex ``\\s`` includes vertical tab \\x0B; RE2's is
  ``[ \\t\\n\\f\\r]`` only — any oracle that pairs Spark ``\\s`` with
  DuckDB ``\\s`` diverges on \\x0B. (At world-build time every ORACLED
  key tokenizes on literal ' ' or explicit classes; the Java-``\\s``
  users — RegexTokenizer in dedup_minhash / txt_hashing_tf / the
  seeded-ML featurizer — are rows-only by design.)
- Spark ``mask()`` classifies via Character.isUpperCase/isLowerCase,
  which follow the Other_Uppercase/Other_Lowercase PROPERTIES: Ⅰ
  (category Nl) masks to X and ª (category Lo) to x, while RE2's
  \\p{Lu}/\\p{Ll} match the general CATEGORY only — fn_mask's oracle
  must mirror the property, not the category.
- NUL bytes survive parquet round-trips on both engines (probe:
  length/upper/trim agree codepoint-wise); the hazard is downstream
  C-string truncation in sinks, covered by the round-trip keys here.
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
    # documented engine divergence: byte-vs-char levenshtein (the
    # multi-byte NBSP/ZWSP rows re-trigger the unicode world's
    # exclusion for the same reason)
    "fn_editdist",
}

_VEC_A = [float(i % 7) - 3.0 for i in range(16)]
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(16)]

_TEXTS = [
    ("plain control free baseline text", "en", "s0"),
    ("nul\x00byte inside a token stream", "en", "s1"),
    ("vertical\x0btab and\x0cformfeed breaks", "en", "s0"),
    ("dos line one\r\nline two\rbare cr", "en", "s1"),
    ("nbsp bound words stay joined", "en", "s0"),
    ("zero​width‌space‍joined text", "en", "s1"),
    ("roman Ⅰ Ⅱ Ⅻ and ordinals ª º mixed", "en", "s0"),
    ("tab\tseparated\tcolumns masquerade", "en", "s1"),
]


_TABLES = {
    "region": ([(0, "AMERICA"), (1, "EUR\tOPE")], "r_regionkey int, r_name string"),
    "nation": ([(0, "BRAZIL", 0), (1, "FRA NCE", 1)],
               "n_nationkey int, n_name string, n_regionkey int"),
    "supplier": ([(1, "sup\tone", 0, 100.0), (2, "sup​two", 1, 200.0)],
                 "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
    "part": ([(1, "part\x0bone", "Brand#1", "SMALL BRASS", 5, 900.0),
              (2, "part two", "Brand#2", "LARGE COPPER", 10, 1100.0)],
             "p_partkey long, p_name string, p_brand string, p_type string,"
             " p_size int, p_retailprice double"),
    "customer": ([(1, "cust\r\none", 0, 500.0, "BUILDING"),
                  (2, "cust two", 1, 600.0, "MACHINERY")],
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
    "documents": (
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(_TEXTS)],
        "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": ([(0, _VEC_A, 0), (1, _VEC_B, 1)],
                   "vec_id long, embedding array<float>, label int"),
    "events": (
        [(0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0,
          '{"k": "a\\u0000b"}'),                       # NUL inside JSON string
         (1, dt.datetime(2024, 3, 1, 1, 0), 2, "view", 10.0,
          '{"k": "tab\\tval"}'),                       # escaped tab value
         (2, dt.datetime(2024, 3, 1, 2, 0), 1, "purchase", 15.0,
          '{"k\\u00a0spaced": 1, "k": 2}'),            # NBSP inside a KEY
         (3, dt.datetime(2024, 3, 1, 3, 0), 2, "click", 20.0,
          '{"k": 3}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ctrlchar_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_ctrlchar_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the control-char world: {fails}"
