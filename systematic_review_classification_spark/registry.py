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
    # (a) keys whose code or oracle changed in round 9 (rotation rule:
    # changed keys re-enter the head for external re-verification).
    # Round 9 is otherwise freeze-and-verify: nothing below this block
    # changed.
    # dedup_exact_substring — LINEAR star-edge output (fingerprint
    #   elects min-doc representative; k-1 edges per k-doc span
    #   cluster) + DISTINCT per-doc windows (the repeated-window
    #   quadratic join was the r8 30s-battery timeout). Oracle mirrored.
    # dedup_biblio — 10k-char record cap + length-diff<=64 join
    #   prefilter on both engines (MB "records" are corrupt input, and
    #   DuckDB's unthresholded levenshtein is O(len^2)).
    # src_ris / sink_ris — raw PY carried as year_raw and serialized on
    #   export: dated PY values (PY  - 2019/05/01) now round-trip
    #   (the r8 verdict's lossy-channel item); fixture gained a
    #   dated-PY record.
    # dedup_paragraph — canonical-copy election by lexicographic
    #   struct min over (doc_id, chunk_start); the arithmetic
    #   doc_id*1e6+start composite collided for MB-scale docs
    #   (ADVICE r8).
    # ml_cv — min_per_class >= numFolds guard (2-row class left a
    #   validation fold single-class -> NaN avg_auc; ADVICE r8;
    #   rows-only).
    # sim_ann_lsh — NULL-row sentinel dimension measured from the
    #   corpus, not a hardcoded 64 (ADVICE r8; rows-only).
    # wl_theil_index — theil_t through rnd()/+0.0 on both engines
    #   (signed-zero policy; ADVICE r8).
    # join_bucketed / agg_bucketed_no_shuffle — bucketed-table cache
    #   path and table name PID-keyed (two concurrent sessions raced
    #   on the shared /tmp path; results unchanged by construction,
    #   re-headed per the rotation rule anyway).
    # agg_pricing_summary / agg_partial_final — money aggregates
    #   through money_round's decimal snap (duplicate-flood world
    #   catch: a flood sum landing on an exact 2-digit midpoint,
    #   13 × 95.475 = 1241.175, resolved .17 vs .18 by summation-order
    #   luck). Note: the OTHER staging-path PID-keying this round
    #   (operators/scans.IO_ROOT, streaming/helpers.IO_ROOT,
    #   rt_analyze_stats' table) is result-invariant by construction —
    #   each oracle embeds the same PID-keyed literal path and both
    #   engines read identical staged files — so those keys are NOT
    #   re-headed; the two bucketed keys above are, because the round-8
    #   verdict named them.
    # (b) the four never-verified rows-only keys, so the rows-only
    # family is 100% externally exercised (r8 verdict item 5):
    # stream_progress, txt_compression_ratio, sample_seeded,
    # agg_hll_sketch.
    # (c) never-driver-verified oracled backlog — 128 at round-9
    # start, in prior relative order. Verified keys trail in
    # registration order.
    # (a2) keys changed by the round-9 PROBE-WORLD session (three new
    # adversarial worlds — ragged/poisoned vectors, overflow
    # magnitudes, malformed JSON; see tests/test_*_world.py):
    # - embedding family: clean-vector hygiene (finite_array now
    #   rejects empty arrays and NULL elements; oracles mirror via
    #   clean_vec_sql), equal-dim pair joins, modal-dim filters for
    #   MLlib/GEMM paths, signed-zero snaps on vmin/vmax/score.
    # - ml_kmeans: uniform (random) init over the distinct vector set
    #   (k-means|| cost sampling collapses on one astronomical vector).
    # - fn_json / fn_map / fn_variant: malformed-JSON null-propagation
    #   on both engines (json_valid guards + TRY casts); duplicate-key
    #   and beyond-double/int64-range JSON documented out of contract.
    # - wl_data_vault_keys: hashdiff money rendered via DECIMAL(28,2)
    #   (raw double→string diverges at 1e7: Spark sci notation).
    # - finite_bounded policy (|x| <= 9e15): agg_histogram,
    #   wl_psi_drift, wl_ks_test, udf_map_pandas, ml_calibration —
    #   finite-but-off-grid values have no bucket on either engine.
    # - metadata-lie hardening: txt_chunk / dedup_paragraph /
    #   mm_frame_sample size their sequences from length(text), never
    #   the n_chars column (value-invariant on the driver corpus:
    #   n_chars == length(text) for all rows, probe-verified).
    # - blank-text world: txt_langid / wl_hygiene_attribution ratio
    #   denominators NULL via nullif on zero-length text (ANSI abort);
    #   mm_decode_stub's zero-byte asset is explicit 0 px / NULL mean
    #   on both engines (DuckDB string_split('','') is [''], Python
    #   list('') is []).
    # - negative-ID world: fn_bitwise shifts defined on the
    #   non-negative domain (DuckDB raises on negative << k).
    # NOT re-headed (result-invariant by construction):
    # mm_decode_stub's kernel now ships fully by value — packaging
    # only, the decode output is unchanged.
    "txt_langid", "wl_hygiene_attribution", "mm_decode_stub",
    "fn_bitwise",
    "sim_cosine_topk", "sim_rp_lsh", "sim_semdedup_centroid",
    "sim_bruteforce_topk", "mm_embed_quantize", "mm_vector_norm",
    "ml_knn_classify", "dedup_embed_cos", "dedup_degree_hist",
    "sim_hybrid_rrf", "ml_eval_confusion", "ml_eval_prf",
    "ml_eval_auc", "ml_eval_wss95", "ml_rank_screen",
    "ml_stop_screening", "ml_calibration", "ml_threshold_at_recall",
    "fn_json", "fn_map", "fn_variant", "wl_data_vault_keys",
    "agg_histogram", "wl_psi_drift", "wl_ks_test", "udf_map_pandas",
    "txt_chunk", "ml_kmeans", "ml_pca",
    "dedup_exact_substring", "dedup_biblio", "src_ris", "sink_ris",
    "dedup_paragraph", "ml_cv", "sim_ann_lsh", "wl_theil_index",
    "join_bucketed", "agg_bucketed_no_shuffle",
    "agg_pricing_summary", "agg_partial_final",
    # wl_q11_partvalue (was backlog) / agg_stats — duplicate-flood
    #   catches: part_value midpoint snap (money_round) and −0.0 on
    #   a flooded-constant covariance (rnd()/+0.0 on both engines).
    # agg_rollup / agg_cube / agg_gsets / agg_having — money_round on
    #   the subtotal measures: the flat world's cancelling ±prices
    #   made DuckDB's grand-total cell round to −0.0 RUN-TO-RUN
    #   NONDETERMINISTICALLY (caught as an intermittent CI flake this
    #   round; 12-rep repro pinned it, 0/12 after the snap).
    "wl_q11_partvalue", "agg_stats",
    "agg_rollup", "agg_cube", "agg_gsets", "agg_having",
    "stream_progress",
    "txt_compression_ratio", "sample_seeded", "agg_hll_sketch",
    "wl_theil_sen", "txt_burstiness", "txt_chao1_richness",
    "wl_effective_sample_size", "txt_distinctive_terms", "ml_cascade_cost",
    "txt_script_mix", "wl_holt_smoothing", "wl_abc_analysis",
    "wl_data_vault_keys", "wl_accumulating_snapshot", "wl_interval_union",
    "txt_novelty_rate", "wl_periodogram", "wl_retention_half_life",
    "wl_capture_recapture", "fn_bround", "wl_seasonal_index",
    "wl_srm_check", "wl_growth_accounting", "wl_diff_in_diff",
    "wl_daily_quantile_bands", "wl_error_budget", "wl_engagement_hist",
    "wl_rate_volume_mix", "wl_stickiness", "wl_arc_elasticity",
    "wl_pareto_frontier", "wl_markov_absorbing",
    "wl_q20_excess", "wl_seasonality", "wl_skew_report",
    "wl_resample_ffill", "sample_reservoir", "agg_grouping_id",
    "sql_qualify", "wl_profile", "wl_attribution", "wl_triangles",
    "fn_width_bucket", "wl_gini", "wl_equidepth_bins",
    "dedup_cluster_hist", "fn_epoch", "sink_partitioned", "cache_reuse",
    "scan_observe", "sql_params", "agg_string_agg", "src_csv_corrupt",
    "sql_pipe", "fn_variant", "fn_collate", "agg_approx_topk", "join_dpp",
    "ml_fpgrowth", "wl_chi2_assoc", "src_json_array", "sink_csv_options",
    "sink_zorder", "sink_compaction", "fn_string_more", "fn_mask",
    "sql_natural_join", "win_nth_value", "win_lag_ignore_nulls",
    "wl_source_overlap", "agg_bitmap_distinct", "wl_retention",
    "wl_dau_wau", "wl_copurchase", "wl_q9_profit", "agg_linreg",
    "txt_collocation", "txt_zipf", "fn_struct", "wl_q16_suppcnt",
    "wl_q2_mincost", "wl_pagerank3", "join_null_safe", "agg_mode_tiebreak",
    "scan_metadata_cols", "txt_stem", "join_asof_tolerance",
    "win_gaps_islands", "wl_rfm", "set_ops_all", "fn_base64",
    "txt_readability", "wl_snapshot_diff", "wl_markov_transitions",
    "ml_feature_cross", "sql_lateral", "src_parquet_merge_schema",
    "win_time_range", "agg_geomean", "join_scd2", "wl_qtr_growth",
    "wl_basket_rules", "sql_subqueries", "fn_explode_outer", "fn_try",
    "wl_clean_corpus", "agg_histogram", "pivot_wide", "unpivot_long",
    "src_range", "set_union_missing", "src_binaryfile", "src_text",
    "wl_q4_late", "wl_q14_promo", "wl_q18_large", "join_skew_salted",
    "fn_url", "txt_sentence_split", "join_range_bucket",
    "agg_decimal_exact", "wl_q7_volume", "wl_q8_share", "wl_q12_late",
    "wl_q13_custdist", "wl_q15_topsupp", "wl_q17_smallqty",
    "wl_q19_disjunct", "wl_q21_waiting", "wl_q22_inactive"
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
