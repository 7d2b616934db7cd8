"""The COMBO world: null-world + flat-world + skew-world rows UNIONED
per table (key columns offset per source world so primary keys stay
distinct and intra-world FK joins still resolve), every key on both
engines.

Single-axis worlds can miss COMBINATION divergences — the r7 ADVICE
agg_minmax_by finding (NULL tie-break key × tied skewed metric) was
exactly that shape, and this world's first probe caught three more in
one pass:

- wl_control_chart: a NULL day SHIFTS the moving-range lag chain
  (Spark NULLS FIRST vs DuckDB NULLS LAST) — masked by symmetry at
  the null world's 2 daily rows, divergent at the combo's 9+.
- wl_stratified_ate: a NULL user_id enters the activity rank order at
  opposite ends on the two engines, moving every other user's stratum
  boundary. Both fixed with the standard drop-NULL-keys policy.
- dedup_minhash: Catalyst reorders conjunctive predicates, so the
  empty-token-set filter (which inlines RegexTokenizer's Scala UDF)
  can run BEFORE a plain text-IS-NOT-NULL filter and NPE on the null
  world's row — the same pushdown-defeats-hygiene class as
  sim_ann_lsh, fixed the same way (sentinel inside the expression).

The union deliberately mixes 1997 order dates with 2024 event dates,
NULL rows next to exact-cancellation rows, and duplicate-heavy skew
next to flat groups, so per-key guards must compose rather than each
relying on its own world's shape.

A SECOND union covers the other three axes (nan + unicode +
extreme-ts). Its probes caught three more: wl_simpson_check (one
NaN price makes Spark's regr_slope NaN where DuckDB's is NULL, and
NaN != 0.0 is TRUE in Spark where NULL <> 0 is NULL — the sign_flip
flag fired on one engine only; masked in the pure NaN world where
every slope degenerated identically), ml_cv (a seeded random fold
split stranded a whole class inside one fold, making that fold's
training complement single-class and aborting the AUC evaluator —
now a stratified deterministic foldCol), and wl_mad_outliers (a NaN
value inside a group that MIXES NaN and finite rows poisons the two
engines' exact medians differently, and NaN > 1.8 self-flags — now
finite-filtered on both engines; masked in the pure NaN world where
whole groups degenerated together).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from tests.harness import run_world
from tests.test_extreme_ts_world import _TABLES as _XTS
from tests.test_flat_world import _TABLES as _FLAT
from tests.test_nan_world import _TABLES as _NAN
from tests.test_null_world import _TABLES as _NULL
from tests.test_skew_world import _TABLES as _SKEW
from tests.test_unicode_world import _TABLES as _UNI

import tests.test_extreme_ts_world as _xts_mod
import tests.test_nan_world as _nan_mod
import tests.test_unicode_world as _uni_mod

EXCLUDED = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_dedup", "stream_stateful", "stream_foreachbatch",
    "stream_static_join", "src_stream_file",
    "sink_parquet", "sink_compaction",
}

# the second union inherits every source world's documented exclusions
# (a key excluded from one axis for a world-specific reason stays
# excluded when that axis's rows are present)
EXCLUDED2 = (
    EXCLUDED
    | getattr(_nan_mod, "EXCLUDED", set())
    | getattr(_uni_mod, "EXCLUDED", set())
    | getattr(_xts_mod, "EXCLUDED", set())
)

# key columns offset per source world so unioned worlds don't collide;
# orders.o_custkey follows the customer offset so FK joins resolve
# within each world's slice. region/nation stay the null world's (they
# are the FK targets every world's rows point at).
_PK = {
    "supplier": [0], "part": [0], "customer": [0], "orders": [0],
    "lineitem": [0], "documents": [0], "embeddings": [0], "events": [0],
}
_FK = {"orders": [1]}


def _shift(rows, idxs, off):
    out = []
    for r in rows:
        r = list(r)
        for i in idxs:
            if r[i] is not None:
                r[i] = r[i] + off
        out.append(tuple(r))
    return out


def _build(offsets):
    tables = {}
    base = offsets[0][1]
    for t, (rows, schema) in base.items():
        merged = []
        for tag, world, off in offsets:
            wrows, wschema = world[t]
            assert wschema == schema, f"schema drift in {t} ({tag})"
            if t in ("region", "nation"):
                if off == 0:
                    merged.extend(wrows)
                continue
            merged.extend(_shift(wrows, _PK.get(t, []) + _FK.get(t, []), off))
        tables[t] = (merged, schema)
    return tables


_TABLES = _build([("null", _NULL, 0), ("flat", _FLAT, 1000), ("skew", _SKEW, 2000)])
_TABLES2 = _build([("nan", _NAN, 0), ("uni", _UNI, 1000), ("xts", _XTS, 2000)])


def _write(spark, tmp_path_factory, name, tables):
    d = str(tmp_path_factory.mktemp(name))
    for t, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.parquet(f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    return _write(spark, tmp_path_factory, "combo_world", _TABLES)


@pytest.fixture(scope="module")
def world2(spark, tmp_path_factory):
    return _write(spark, tmp_path_factory, "combo2_world", _TABLES2)


def test_every_oracled_key_survives_the_combo_world(spark, world):
    fails = run_world(spark, world, _TABLES, EXCLUDED)
    assert not fails, f"{len(fails)} keys broke on the combo world: {fails}"


def test_every_oracled_key_survives_the_nan_unicode_ts_combo(spark, world2):
    fails = run_world(spark, world2, _TABLES2, EXCLUDED2)
    assert not fails, f"{len(fails)} keys broke on combo-2: {fails}"
