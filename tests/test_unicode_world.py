"""The UNICODE WORLD: adversarial multilingual text in every string
column, every oracled key run on both engines.

A 100 TB training corpus is never ASCII. This world packs the cases
that break naive byte/char assumptions — accented Latin (with ß),
CJK without spaces, emoji + ZWJ sequences, RTL Arabic, composed vs
decomposed accents, regex metacharacters as literal text, a 300-char
token — and asserts every oracled key still agrees across engines.

What the sweep established (probe-verified, round 6):

- AGREE on codepoints: length(), substring(), split(''), ascii(),
  reverse(), left/right, strpos — both engines are codepoint-based,
  so the whole tokenize/chunk/fingerprint family is unicode-safe.
- DIVERGE, fixed by making the contract explicit:
  * DuckDB's ``::BLOB`` cast REJECTS non-ASCII — oracles use
    encode()/decode() (fn_base64, mm_binary_meta);
  * Spark mask() classifies by Character.isUpperCase/isLowerCase —
    oracles need \\p{Lu}/\\p{Ll}/\\p{Nd}, not [A-Z]/[a-z]/[0-9]
    (fn_mask: ASCII classes silently LEAK accented letters);
  * from_json with map<string,int> nulls the ENTIRE map when props
    carries one non-int value — parse map<string,string>, cast the
    looked-up value (fn_map);
  * the decode stub's pixel stats are CODEPOINT stats so the
    per-character oracle holds on any corpus (mm_decode_stub).
- DIVERGE, inherent to the engines (documented exclusions below):
  * levenshtein — DuckDB counts UTF-8 BYTES, Spark characters
    (fn_editdist docstring; agrees on ASCII columns only);
  * exotic case mapping — Spark upper('ß')='SS' vs DuckDB 'STRAẞE',
    Spark lower('İ') keeps the combining dot — the corpus keeps
    upper/lower'd COLUMNS (lang/source) ASCII, text exercises
    everything else.
"""

from __future__ import annotations

import datetime as dt

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world

EXCLUDED = {
    # physical-layout / staging exclusions shared with the other worlds
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
    # documented engine divergence: byte-vs-char levenshtein
    "fn_editdist",
}

_TEXTS = [
    ("café résumé naïve coöperate straße weiß", "de", "s0"),
    ("这是一个测试文档 数据 管道 很快", "zh", "s1"),
    ("good \U0001F44D family \U0001F469‍\U0001F469‍\U0001F467 mix",
     "en", "s0"),
    ("مرحبا بالعالم hello world", "ar", "s1"),
    ("é composed é decomposed test case", "fr", "s0"),
    ("a.b*c(d)[e]{f}|g\\h+i?j^k$l regex meta", "en", "s1"),
    ("tab\there nbsp word mixed space", "en", "s0"),
    ("x" * 300 + " short tail words here", "en", "s1"),
]

_VEC_A = [float(i % 7) - 3.0 for i in range(64)]
_VEC_B = [float((i * 3) % 5) - 2.0 for i in range(64)]

_TABLES = {
    "region": (
        [(0, "AMÉRICA"), (1, "EURÓPA")],
        "r_regionkey int, r_name string",
    ),
    "nation": (
        [(0, "BRÉSIL", 0), (1, "FRANÇA", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "supplier": (
        [(1, "søren's supplies", 0, 100.0), (2, "müller gmbh", 1, 200.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [
            (1, "pièce nº1", "Brand#1", "SMALL BRASS", 5, 900.0),
            (2, "零件二", "Brand#2", "LARGE COPPER", 10, 1100.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ),
    "customer": (
        [
            (1, "José Müller", 0, 500.0, "BUILDING"),
            (2, "王小明", 1, 600.0, "MACHINERY"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ),
    "orders": (
        [
            (1, 1, "O", 1000.0, dt.datetime(1997, 3, 1), "1-URGENT"),
            (2, 2, "F", 2000.0, dt.datetime(1997, 4, 1), "2-HIGH"),
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
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    ),
    "documents": (
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(_TEXTS)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "embeddings": (
        [(0, _VEC_A, 0), (1, _VEC_B, 1)],
        "vec_id long, embedding array<float>, label int",
    ),
    "events": (
        [
            (0, dt.datetime(2024, 3, 1, 0, 0), 1, "click", 5.0,
             '{"k": 1, "note": "caf\\u00e9"}'),
            (1, dt.datetime(2024, 3, 1, 1, 0), 2, "purchase", 60.0,
             '{"k": 2, "note": "\\u6d4b\\u8bd5"}'),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ),
}


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unicode_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_unicode_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the unicode world: {fails}"
