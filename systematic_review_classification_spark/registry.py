"""Central registry mapping SURVEY.md §2 operator keys to queries.

Each operator module registers its queries with the :func:`query`
decorator; ``__spark_entry__.queries()`` / ``oracle_sql()`` read the
assembled dicts. A query with ``oracle=None`` is declared rows-only
(approx algorithms, seeded ML, streaming semantics) and the driver
records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``, optionally with its DuckDB oracle SQL.

    Column-name contract: every computed/aggregate column must carry the
    same alias in the Spark query and the oracle SQL — the driver sorts
    columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in _QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        _QUERIES[key] = fn
        if oracle is not None:
            _ORACLES[key] = oracle
        return fn

    return deco


# Externally-verified-first iteration order. An external correctness
# harness walks ``queries()`` in iteration order with a bounded budget
# (~50 entries per run), so keys that have not yet been independently
# verified — or were changed since the last run — must come first.
# Rotation rule: changed keys re-enter the head; never-verified keys
# come next in stable relative order; verified-and-unchanged keys
# trail in registration order (listing an unregistered key is a
# no-op; keys absent from this list follow in registration order).
# History: rounds 1-9 verified 317 distinct keys, all clean at their
# latest check (CORRECTNESS_r01..r09.json).
_PRIORITY: list[str] = [
    # ROUND 10 rotation. Window math: the driver verifies the FIRST
    # ~50 keys of _ordered() each round, so the head is (a) keys whose
    # code or oracle changed this round, then (b) the never-driver-
    # verified backlog (126 oracled + 2 rows-only at r10 start, prior
    # relative order) — re-listing already-verified keys would waste
    # window slots; verified keys trail in registration order.
    #
    # (a) r10 changes (all three r9 ADVICE items):
    # - fn_json — oracle k_int/k_bucket gated on json_type BIGINT/
    #   UBIGINT: Spark's from_json(struct<k:int>) NULLs quoted-string
    #   and double-valued k where DuckDB's bare TRY_CAST parses '7'
    #   and rounds '3.7' (probe-verified r10).
    # - fn_map — oracle k_val gated on an integral-token regexp:
    #   Spark try_cast('3.7') is NULL, DuckDB TRY_CAST rounds to 4.
    # - fn_variant — DOUBLE-k trunc branch (Spark variant int cast
    #   truncates 3.7 → 3, DuckDB rounds) + VARCHAR-k integral-token
    #   branch ('+5' casts on Spark, DuckDB's quoted-lexeme cast is
    #   NULL); integral-double/sci-notation canonical lexemes are
    #   documented out of contract (JCS vs source-preserving
    #   rendering; badjson world _AMBIGUOUS pins abort-safety).
    # - mm_embed_quantize — overflow-free (x-mn)/(mx-mn)*255 order +
    #   isfinite(mx-mn) escape (qsum NULL) on both engines: finite
    #   opposite-sign extrema near DBL_MAX made inf/inf = NaN abort
    #   the BIGINT cast (double-typed schema-drift fixture).
    # - fn_try — oracle mirrors try_cast exactly instead of bare
    #   TRY_CAST (same class, found by r10 self-audit): double→int
    #   truncs, string→int gated on integral tokens with the ASCII
    #   [\x00-\x20] trim Spark's parser applies (dormant on the enum/
    #   integral corpus; real on any dirty feed).
    # - agg_stats / agg_linreg / graph_powerlaw_fit / wl_simpson_check
    #   / wl_retention_half_life / agg_corr_matrix — the READ-ORDER
    #   signed-zero class (multi-file scatter world, r10): DuckDB's
    #   covariance-form residue SIGN follows file enumeration order,
    #   so a scattered 5-part layout minted −0.0 slopes/correlations
    #   where the single-file fixture summed to +0.0 (agg_stats and
    #   agg_linreg caught live, one per sweep run; the rest are the
    #   same audit class). All fitted moments now snap via rnd()/+0.0,
    #   and the two keys that BRANCH on a raw slope sign
    #   (wl_simpson_check's sign_flip, wl_retention_half_life's
    #   half-life gate) branch on the ROUNDED slope so the flag cannot
    #   follow read order.
    # NOT re-headed (result-invariant by construction): the r10
    # schema-drift ingest normalization (sources/tables.py _CANONICAL)
    # touches every key's load() path, but on a canonical corpus the
    # cast list is empty and the optimized plan is byte-identical
    # (probe-verified: no Project node) — results can only differ on
    # width/temporal-drifted parquet, which the driver corpus is not.
    # Also structural (no key semantics changed): the r9 duplicate-
    # entry bug that let fn_variant / wl_data_vault_keys /
    # agg_histogram keep their deep backlog rank (last-occurrence-wins
    # dict build) and miss CORRECTNESS_r09 — exactly as ADVICE
    # predicted — is closed: _ordered() is first-occurrence-wins and a
    # module-load assert rejects duplicate _PRIORITY entries. Those
    # three r9-changed keys lead section (b).
    #
    # (b) never-driver-verified backlog: first the two rows-only keys
    # the r9 window cut off (completing the 100%-exercised rows-only
    # family, r8 verdict item 5), then the oracled backlog.
    "fn_json",
    "fn_map",
    "fn_variant",
    "mm_embed_quantize",
    "fn_try",
    "agg_stats",
    "agg_linreg",
    "graph_powerlaw_fit",
    "wl_simpson_check",
    "wl_retention_half_life",
    "agg_corr_matrix",
    "sample_seeded",
    "agg_hll_sketch",
    "wl_data_vault_keys",
    "agg_histogram",
    "wl_theil_sen",
    "txt_burstiness",
    "txt_chao1_richness",
    "wl_effective_sample_size",
    "txt_distinctive_terms",
    "ml_cascade_cost",
    "txt_script_mix",
    "wl_holt_smoothing",
    "wl_abc_analysis",
    "wl_accumulating_snapshot",
    "wl_interval_union",
    "txt_novelty_rate",
    "wl_periodogram",
    "wl_capture_recapture",
    "fn_bround",
    "wl_seasonal_index",
    "wl_srm_check",
    "wl_growth_accounting",
    "wl_diff_in_diff",
    "wl_daily_quantile_bands",
    "wl_error_budget",
    "wl_engagement_hist",
    "wl_rate_volume_mix",
    "wl_stickiness",
    "wl_arc_elasticity",
    "wl_pareto_frontier",
    "wl_markov_absorbing",
    "wl_q20_excess",
    "wl_seasonality",
    "wl_skew_report",
    "wl_resample_ffill",
    "sample_reservoir",
    "agg_grouping_id",
    "sql_qualify",
    "wl_profile",
    "wl_attribution",
    "wl_triangles",
    "fn_width_bucket",
    "wl_gini",
    "wl_equidepth_bins",
    "dedup_cluster_hist",
    "fn_epoch",
    "sink_partitioned",
    "cache_reuse",
    "scan_observe",
    "sql_params",
    "agg_string_agg",
    "src_csv_corrupt",
    "sql_pipe",
    "fn_collate",
    "agg_approx_topk",
    "join_dpp",
    "ml_fpgrowth",
    "wl_chi2_assoc",
    "src_json_array",
    "sink_csv_options",
    "sink_zorder",
    "sink_compaction",
    "fn_string_more",
    "fn_mask",
    "sql_natural_join",
    "win_nth_value",
    "win_lag_ignore_nulls",
    "wl_source_overlap",
    "agg_bitmap_distinct",
    "wl_retention",
    "wl_dau_wau",
    "wl_copurchase",
    "wl_q9_profit",
    "txt_collocation",
    "txt_zipf",
    "fn_struct",
    "wl_q16_suppcnt",
    "wl_q2_mincost",
    "wl_pagerank3",
    "join_null_safe",
    "agg_mode_tiebreak",
    "scan_metadata_cols",
    "txt_stem",
    "join_asof_tolerance",
    "win_gaps_islands",
    "wl_rfm",
    "set_ops_all",
    "fn_base64",
    "txt_readability",
    "wl_snapshot_diff",
    "wl_markov_transitions",
    "ml_feature_cross",
    "sql_lateral",
    "src_parquet_merge_schema",
    "win_time_range",
    "agg_geomean",
    "join_scd2",
    "wl_qtr_growth",
    "wl_basket_rules",
    "sql_subqueries",
    "fn_explode_outer",
    "wl_clean_corpus",
    "pivot_wide",
    "unpivot_long",
    "src_range",
    "set_union_missing",
    "src_binaryfile",
    "src_text",
    "wl_q4_late",
    "wl_q14_promo",
    "wl_q18_large",
    "join_skew_salted",
    "fn_url",
    "txt_sentence_split",
    "join_range_bucket",
    "agg_decimal_exact",
    "wl_q7_volume",
    "wl_q8_share",
    "wl_q12_late",
    "wl_q13_custdist",
    "wl_q15_topsupp",
    "wl_q17_smallqty",
    "wl_q19_disjunct",
    "wl_q21_waiting",
    "wl_q22_inactive",
]


assert len(_PRIORITY) == len(set(_PRIORITY)), (
    "duplicate keys in _PRIORITY: "
    + ", ".join(sorted({k for k in _PRIORITY if _PRIORITY.count(k) > 1}))
)


def _ordered(mapping: dict[str, object]) -> dict[str, object]:
    # First occurrence wins so a re-headed (changed) key keeps its
    # verification-head rank even if a stale backlog entry survives.
    rank: dict[str, int] = {}
    for i, k in enumerate(_PRIORITY):
        rank.setdefault(k, i)
    tail = len(_PRIORITY)
    keys = sorted(
        mapping,
        key=lambda k: (rank.get(k, tail), list(mapping).index(k)),
    )
    return {k: mapping[k] for k in keys}


def all_queries() -> dict[str, QueryFn]:
    from systematic_review_classification_spark import load_all

    load_all()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    from systematic_review_classification_spark import load_all

    load_all()
    return _ordered(_ORACLES)
