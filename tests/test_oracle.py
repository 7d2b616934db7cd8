"""One differential test per registered query — the same comparison
the driver runs at t2, so t2 failures never surprise (SURVEY.md §5.2.5).
Rows-only queries (no oracle) are executed and sanity-checked instead.
"""

from __future__ import annotations

import pytest

from systematic_review_classification_spark import all_oracles, all_queries
from tests.harness import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(key, spark, sf_dir, duck):
    compare(QUERIES[key](spark, sf_dir), duck, ORACLES[key], key=key)


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(key, spark, sf_dir):
    df = QUERIES[key](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
