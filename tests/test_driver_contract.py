"""Driver-contract sweeps over EVERY registered key.

Two failure classes have each cost a full external-verification round:

1. A bare array/map/struct output column — the driver canonicalizes
   results through pandas ``sort_values``, which cannot sort list
   cells, so such a key can never hash-match regardless of semantic
   correctness (`wl_inverted_index`, round 5's only external failure).
2. An unpartitioned window over a data-scaled relation — a single-task
   ``WindowExec: No Partition Defined`` that works at test SF and
   falls over at 100 TB. The per-key plan tests pin the converted
   shapes; this sweep catches NEW regressions anywhere in the
   registry (the JVM-wide WindowExec warning is log4j-silenced in
   session.py, so nothing else would).

Both checks run one pass over all registered queries: build the lazy
DataFrame, record schema and formatted physical plan, assert. Heavy
(~4 min for the full registry) but it turns a burned driver round
into a local test failure.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

from systematic_review_classification_spark import all_oracles, all_queries

# Keys allowed to keep an unpartitioned window: must be a window over
# a PROVABLY BOUNDED relation (a reduced aggregate whose cardinality
# is fixed by the schema, not the data). Currently empty — the r5
# two-pass conversions removed the last ones; add a key here ONLY with
# a bounded-cardinality justification in a comment.
BOUNDED_WINDOW_OK: set[str] = set()

_SCALAR_BAD = (T.ArrayType, T.MapType, T.StructType)

# "Arguments: [...windowspecdefinition(...)..., [partCols], [sortCols]"
# — an empty partition list renders as `], [], [` in the formatted plan
_UNPARTITIONED = re.compile(r"\], \[\], \[")


@pytest.fixture(scope="module")
def surfaces(spark, sf_dir):
    """key -> (schema, formatted physical plan) for every registered
    query, built once."""
    out = {}
    for key, fn in all_queries().items():
        df = fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out[key] = (df.schema, plan)
    return out


def test_oracled_outputs_are_scalar(surfaces):
    """Every oracled key must emit only scalar top-level columns —
    anything else is invisible to the driver's pandas canonicalizer
    (stringify with array_join / to_json instead)."""
    oracled = set(all_oracles())
    bad = [
        (key, f.name, f.dataType.simpleString())
        for key, (schema, _) in surfaces.items()
        if key in oracled
        for f in schema.fields
        if isinstance(f.dataType, _SCALAR_BAD)
    ]
    assert not bad, f"non-scalar output columns on oracled keys: {bad}"


def test_no_unpartitioned_windows(surfaces):
    """No registered key may plan a single-task global window unless
    allowlisted as provably bounded."""
    offenders = []
    for key, (_, plan) in surfaces.items():
        if key in BOUNDED_WINDOW_OK:
            continue
        for m in re.finditer(r"Arguments: \[.*windowspecdefinition.*", plan):
            if _UNPARTITIONED.search(m.group(0)):
                offenders.append((key, m.group(0)[:120]))
                break
    assert not offenders, f"unpartitioned windows: {offenders}"
