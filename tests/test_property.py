"""Property-based cross-engine fuzzing (hypothesis): generate small
adversarial corpora — unicode, quotes, whitespace runs, duplicate
texts, single-token docs — write them as the documents table, and
check that a representative slice of document operators still matches
its DuckDB oracle EXACTLY on data the fixtures never exercise.

This is the generalization of test_edge_values: instead of a fixed
edge list, hypothesis searches the input space for dialect drift
(tokenization, hashing, aggregation) and shrinks any failure to a
minimal corpus.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from systematic_review_classification_spark import all_oracles, all_queries
import duckdb

from tests.harness import canonical_rows

# Words mix ascii, unicode, quoting, and digits; texts are space-joined
# so both engines' tokenizers see identical boundaries.
_WORDS = st.sampled_from(
    ["spark", "join", "dup", "中文", "it's", 'q"q', "x1", "UPPER", "a", "zzz"]
)
_TEXT = st.lists(_WORDS, min_size=1, max_size=12).map(" ".join)

_DOC = st.tuples(_TEXT, st.sampled_from(["en", "zh", "unk"]), st.sampled_from(["s0", "s1"]))
_CORPUS = st.lists(_DOC, min_size=1, max_size=12)

# Documents-driven operators with full oracles, chosen to cover the
# dialect-risk families: hashing (dedup), tokenizing + HOFs (bpe
# count), posting-list aggregation (inverted index), shingle pairing
# (containment), and windowed keeper dedup (pretrain manifest).
_KEYS = [
    "dedup_exact",
    "txt_token_count_bpe",
    "wl_inverted_index",
    "txt_containment",
    "wl_pretrain_pipeline",
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_corpus")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_document_oracles_hold_on_generated_corpora(spark, corpus_dir, corpus):
    rows = [
        (i, text, lang, source, len(text))
        for i, (text, lang, source) in enumerate(corpus)
    ]
    path = str(corpus_dir / "case")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")

    queries, oracles = all_queries(), all_oracles()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    try:
        for key in _KEYS:
            sp = canonical_rows(queries[key](spark, path).toPandas())
            du = canonical_rows(con.execute(oracles[key]).df())
            assert sp == du, f"[{key}] diverged on generated corpus {rows!r}"
    finally:
        con.close()


_EVT_TYPES = ["click", "view", "purchase", "signup", "error"]

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3600 * 72),  # seconds offset (collisions likely)
    st.integers(min_value=1, max_value=4),          # user_id — few users => deep windows
    st.sampled_from(_EVT_TYPES),
    st.integers(min_value=1, max_value=100_000),    # value cents => exact doubles
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=25)

_EVENT_KEYS = ["win_running_distinct", "wl_path_trigrams", "wl_hour_heatmap", "win_ewma"]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_EVENTS)
def test_event_oracles_hold_on_generated_streams(spark, corpus_dir, events):
    """Windows over event time must agree cross-engine even with
    COLLIDING timestamps (same user, same second — the tie-break
    determinism the synthetic fixtures barely exercise) and deep
    per-user sequences (EWMA fold order, trigram leads)."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), uid, typ, cents / 100.0)
        for i, (off, uid, typ, cents) in enumerate(events)
    ]
    path = str(corpus_dir / "evcase")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")

    queries, oracles = all_queries(), all_oracles()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/events.parquet/*.parquet')"
    )
    try:
        for key in _EVENT_KEYS:
            sp = canonical_rows(queries[key](spark, path).toPandas())
            du = canonical_rows(con.execute(oracles[key]).df())
            assert sp == du, f"[{key}] diverged on generated events {rows!r}"
    finally:
        con.close()
