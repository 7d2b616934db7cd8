"""The MALFORMED-JSON world: every malformation a 100 TB log feed
ships in the events.props column, every oracled key on both engines.

The JSON functions are where the engines' error philosophies collide:
Spark's get_json_object/from_json PERMISSIVE-NULL malformed input,
DuckDB's ``->>``/json_keys ERROR on it, Spark's parse_json ABORTS
where try_parse_json NULLs, and an ANSI CAST of a string-valued
property aborts both. The round-9 probe broke fn_json (oracle abort),
fn_map (Spark ANSI cast abort on a unicode prop value), and
fn_variant (Spark parse abort) in one pass; all three now share the
null-on-bad-input contract (json_valid/json_type guards + TRY casts
on both engines).

OUT of the value contract — RFC 8259 leaves them implementation-
defined, and the engines legitimately disagree:
- duplicate-key objects: DuckDB's path extraction is first-wins and
  json_keys keeps BOTH keys; Spark's map/variant dedup (last-wins).
- numbers beyond double/int64 interop range: DuckDB renders 1e309 as
  ``Infinity`` and parses 123456789012345678901 as a lossy double;
  Spark's variant keeps the exact decimal.
- number-LEXEME preservation in re-serialization: Spark's variant
  prints JCS shortest form (7.0 → ``7``, 1e2 → ``100``), DuckDB's
  json() keeps the source lexeme (r10).
Those rows live in _AMBIGUOUS and get the weaker abort-safety check:
every key must still EVALUATE (null-propagate), never crash.
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

_PROPS = [
    '{"k": 1}',                      # healthy
    '{"k": 2',                       # truncated
    'not json at all',               # garbage
    '',                              # empty string
    'null',                          # JSON null literal
    '{"k": "str"}',                  # wrong type
    '{"k": "7"}',                    # numeric-ish quoted string (r9 advice)
    '{"k": 3.7}',                    # non-integral number: trunc-vs-round
    '{"k": -3.2}',                   # negative non-integral number
    '{"k": "+5"}',                   # signed numeric string
    '{"k": 2147483648}',             # int64-ok / int32-overflow number
    '{"k": true}',                   # boolean-valued property
    '{"a": {"b": {"c": {"d": 7}}}}', # deep nesting
    '{"k": "\\u00e9\\ud83d\\ude00"}',  # unicode escapes (é + emoji pair)
    '[1, 2, 3]',                     # array at top level
    None,                            # NULL props
]

# RFC 8259-unspecified shapes: cross-engine values are OUT of contract,
# abort-safety is still IN (see module docstring).
_AMBIGUOUS = [
    '{"k": 1, "k": 2}',              # duplicate key
    '{"k": 1e309}',                  # beyond double range
    '{"k": 123456789012345678901}',  # beyond int64 range
    # number-lexeme rendering in re-serialization (fn_variant's
    # canonical): Spark's variant prints JCS shortest form ("7", "100")
    # where DuckDB's json() preserves the source lexeme ("7.0", "1e2").
    # ECMA-404 doesn't specify number serialization; typed k extraction
    # still agrees (7.0 → 7 on both, probe-verified r10).
    '{"k": 7.0}',                    # integral double lexeme
    '{"k": 1e2}',                    # scientific-notation lexeme
]


def _events(props):
    return [
        (i, dt.datetime(2024, 3, 1, i % 24, 0), (i % 3) + 1,
         ["click", "view", "purchase"][i % 3], 5.0 * (i + 1), p)
        for i, p in enumerate(props)
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
    "documents": ([(0, "spark makes big data simple and fast", "en", "s0", 37),
                   (1, "le spark est rapide et simple", "fr", "s1", 29)],
                  "doc_id long, text string, lang string, source string, n_chars long"),
    "embeddings": ([(0, _VEC_A, 0), (1, _VEC_B, 1)],
                   "vec_id long, embedding array<float>, label int"),
    "events": (
        _events(_PROPS),
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"),
}

_EVENT_SCHEMA = _TABLES["events"][1]


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("badjson_world"))
    for t, (rows, schema) in _TABLES.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


def test_every_oracled_key_survives_the_malformed_json_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the malformed-JSON world: {fails}"


def test_json_keys_abort_safe_on_ambiguous_json(spark, tmp_path_factory):
    """Duplicate-key / beyond-range JSON: values are out of contract,
    but the Spark side must still null-propagate, never crash."""
    from systematic_review_classification_spark import all_queries

    d = str(tmp_path_factory.mktemp("badjson_ambiguous"))
    for t, (rows, schema) in _TABLES.items():
        if t == "events":
            rows = _events(_AMBIGUOUS)
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    queries = all_queries()
    for key in ("fn_json", "fn_map", "fn_variant"):
        rows = queries[key](spark, d).collect()
        assert len(rows) == len(_AMBIGUOUS), key
