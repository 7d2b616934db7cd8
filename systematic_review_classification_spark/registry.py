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
# Round-8 rotation (freeze-and-verify): rounds 1-7 verified 281
# distinct keys, all clean at their latest check. This round froze
# every key except the 25 whose code or oracle genuinely changed
# (the two hypothesis-caught divergence fixes, the four ADVICE
# items, the dedup_paragraph linear rewrite, the PIL decode wiring,
# the 9 flat-world sweep fixes, and the 6 combo-world fixes) —
# those re-enter the head per the rotation rule. Head: (a) keys
# changed in round 8, then (b) the never-driver-verified backlog in
# prior relative order, so the ~50 budget buys ~25 first-time
# verifications after the 25 (a)-keys. Verified keys trail in
# registration order (listing an unregistered key is a no-op; keys
# absent from this list follow in registration order).
_PRIORITY: list[str] = [
    # (a) keys changed in round 8 (rotation rule: any key whose code
    # or oracle changes re-enters the head). Round 8 is otherwise a
    # pure freeze-and-verify round: nothing below this block changed,
    # so the ~45 remaining driver slots burn the never-verified
    # backlog in section (b) order.
    # wl_anomaly_deseasonalized — flat-adjusted-series z-scale is now
    # a relative-ε test (hypothesis-caught NULL vs 0.0 divergence).
    # wl_linear_forecast — all four derived columns through the
    # shared rnd() −0.0 normalizer (hypothesis-caught signed zero).
    # agg_minmax_by — NULL custkeys filtered on both engines (ADVICE
    # r7: NULL tie-break column ranked lowest by Spark's struct
    # order, last by the oracle's window order).
    # src_medline — CRLF .nbib record splitting (ADVICE r7 medium:
    # line-ending sniff + multi-PMID loud failure).
    # sim_ann_lsh — sentinel vector length derived from the row's own
    # array, not a hardcoded 64 (ADVICE r7; rows-only).
    # dedup_paragraph — window slicing rebuilt over a pre-split
    # 200-char block array (O(doclen) per document; the r7 kernel was
    # O(windows × doclen) on MB-scale docs). Oracle unchanged.
    # mm_decode_stub — decode kernel hoisted into make_decoder() so the
    # PIL-gated real branch is testable; fake path byte-identical.
    # Flat-world sweep fixes (the new cancellation/−0.0 world found 8
    # divergences in one pass): fn_format (oracle's floor-based
    # decimal split rendered negatives as '-1,001.90'), fn_math (sqrt
    # gated to non-negative on both engines), wl_theil_index
    # (flatness-aware positive-mean gate — cancelled groups aborted
    # BOTH engines, differently), wl_ab_ttest + agg_stats +
    # agg_corr_matrix (relative-ε variance nullout mirrored into the
    # oracles — DuckDB's variance residue minted arbitrary statistics),
    # wl_winsorized_mean + wl_pareto (−0.0 via rnd()/+0.0),
    # stream_stateful_ttl (TTL horizon clamped to watermark+1 for
    # late-arriving sessions; rows-only).
    # Combo-world fixes (null+flat+skew union; 3 combination bugs a
    # single-axis world can't reach): wl_control_chart +
    # wl_stratified_ate (NULL day / NULL user shifts the lag chain /
    # rank order between engines — standard drop-NULL-keys policy),
    # dedup_minhash (predicate reordering ran the tokenizer UDF before
    # the null filter — sentinel inside the expression; rows-only).
    "wl_anomaly_deseasonalized", "wl_linear_forecast", "agg_minmax_by",
    "src_medline", "sim_ann_lsh", "dedup_paragraph", "mm_decode_stub",
    "fn_format", "fn_math", "wl_theil_index", "wl_ab_ttest", "agg_stats",
    "agg_corr_matrix", "wl_winsorized_mean", "wl_pareto",
    "stream_stateful_ttl", "wl_control_chart", "wl_stratified_ate",
    "dedup_minhash",
    # Combo-2 (nan+unicode+extreme-ts union) fixes: wl_simpson_check
    # (NaN regr_slope vs NULL + NaN comparison flipped the flag on one
    # engine — finite-filtered), wl_mad_outliers (NaN inside a mixed
    # group poisons the exact medians differently — finite-filtered),
    # ml_cv (stratified deterministic foldCol; a seeded split could
    # strand a class in one fold and abort the evaluator; rows-only).
    "wl_simpson_check", "ml_cv", "wl_mad_outliers",
    # NaN-mixed-quantile race class, closed globally: DuckDB's
    # comparison-based median/quantile is RUN-TO-RUN NONDETERMINISTIC
    # over a group mixing NaN and finite values (probe: 2 distinct
    # medians in 10 runs on the same parquet). Every order-statistic
    # oracle over a NaN-able measure is now finite-filtered on both
    # engines; integer-fed quantiles (txt_lang_stats, wl_theil_sen's
    # count-derived slopes) cannot produce NaN and stay unguarded.
    "agg_median_pct", "agg_percentile_disc", "wl_iqr_outliers",
    # (every already-driver-verified key is dropped from this list —
    # verified keys trail in registration order; the r7 verdict
    # flagged re-heads crowding out first-time verifications.)
    # (b) never-driver-verified backlog — 165 at round-8 start. The
    # r7 verdict named these twelve LLM-pipeline / world-sweep
    # stragglers for the first slots:
    "sample_weighted_es", "wl_hhi", "dedup_components",
    "dedup_keep_best", "dedup_incremental", "sim_topk_int8", "txt_chunk",
    "txt_pii_scrub", "wl_domain_mix", "wl_pack_sequences",
    "wl_shard_shuffle",
    # remainder in prior relative order:
    "sql_hint_broadcast", "graph_link_prediction", "wl_rendezvous_hashing",
    "dedup_fellegi_sunter", "rt_analyze_stats", "wl_date_dim",
    "wl_hygiene_attribution", "graph_clustering_coeff",
    "graph_powerlaw_fit", "wl_kl_source_mix", "win_top_percent",
    "wl_kaplan_meier", "wl_percent_of_parent", "wl_cusum",
    "wl_theil_sen",
    "txt_burstiness", "txt_chao1_richness",
    "wl_effective_sample_size", "txt_distinctive_terms", "ml_cascade_cost",
    "txt_script_mix", "wl_holt_smoothing", "wl_abc_analysis",
    "wl_data_vault_keys", "wl_accumulating_snapshot", "wl_interval_union",
    "txt_novelty_rate", "wl_periodogram", "wl_retention_half_life",
    "wl_capture_recapture", "fn_bround", "wl_seasonal_index",
    "wl_srm_check", "wl_growth_accounting", "wl_diff_in_diff",
    "wl_daily_quantile_bands", "wl_error_budget", "wl_engagement_hist",
    "wl_rate_volume_mix", "wl_stickiness", "wl_arc_elasticity",
    "wl_pareto_frontier", "wl_markov_absorbing", "wl_q11_partvalue",
    "wl_q20_excess", "wl_seasonality", "wl_skew_report",
    "wl_resample_ffill", "sample_reservoir", "agg_grouping_id",
    "sql_qualify", "wl_profile", "wl_attribution",
    "wl_triangles", "fn_width_bucket", "wl_gini", "wl_equidepth_bins",
    "dedup_cluster_hist", "fn_epoch", "sink_partitioned", "cache_reuse",
    "scan_observe", "sql_params", "agg_string_agg", "src_csv_corrupt",
    "sql_pipe", "fn_variant", "fn_collate", "agg_approx_topk", "join_dpp",
    "ml_fpgrowth", "wl_chi2_assoc", "src_json_array", "sink_csv_options",
    "sink_zorder", "sink_compaction", "fn_string_more", "stream_progress",
    "fn_mask", "sql_natural_join", "win_nth_value", "win_lag_ignore_nulls",
    "wl_source_overlap", "agg_bitmap_distinct",
    "wl_retention", "wl_dau_wau", "wl_copurchase", "wl_q9_profit",
    "agg_linreg", "txt_collocation", "txt_zipf", "fn_struct",
    "wl_q16_suppcnt", "wl_q2_mincost", "wl_pagerank3", "join_null_safe",
    "agg_mode_tiebreak", "scan_metadata_cols", "txt_stem",
    "join_asof_tolerance", "win_gaps_islands", "wl_rfm", "set_ops_all",
    "fn_base64", "txt_readability", "wl_snapshot_diff",
    "wl_markov_transitions", "ml_feature_cross",
    "sql_lateral", "src_parquet_merge_schema", "win_time_range",
    "agg_geomean", "join_scd2", "txt_compression_ratio", "wl_qtr_growth",
    "wl_basket_rules", "sql_subqueries", "fn_explode_outer", "fn_try",
    "wl_clean_corpus", "agg_histogram", "pivot_wide", "unpivot_long",
    "src_range", "set_union_missing", "sample_seeded", "src_binaryfile",
    "src_text", "wl_q4_late", "wl_q14_promo", "wl_q18_large",
    "agg_hll_sketch", "join_skew_salted", "fn_url", "txt_sentence_split",
    "join_range_bucket", "agg_decimal_exact", "wl_q7_volume",
    "wl_q8_share", "wl_q12_late", "wl_q13_custdist", "wl_q15_topsupp",
    "wl_q17_smallqty", "wl_q19_disjunct", "wl_q21_waiting",
    "wl_q22_inactive"
]


def _ordered(mapping: dict[str, object]) -> dict[str, object]:
    rank = {k: i for i, k in enumerate(_PRIORITY)}
    tail = len(rank)
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
