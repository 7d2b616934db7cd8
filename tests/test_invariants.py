"""Self-consistency assertions for rows-only operators (SURVEY.md
§5.2.2): approx sketches bounded against exact answers, LSH candidate
sets covering ground truth, engine hashes deterministic, streaming
late-data actually dropped, seeded ML reproducible.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # builder tier: full-registry sweep (see pytest.ini)

from pyspark.sql import functions as F

from systematic_review_classification_spark import all_queries
from systematic_review_classification_spark.sources.tables import load

QUERIES = all_queries()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_nd_part - r.exact_nd_part) / max(r.exact_nd_part, 1)
        assert rel_err < 0.1, f"{r}: HLL estimate off by {rel_err:.2%}"


def test_minhash_covers_exact_duplicates(spark, sf_dir):
    """Any two docs with identical text must appear as a candidate
    pair (distance 0 always survives LSH banding)."""
    d = load(spark, sf_dir, "documents")
    exact = (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("a", "b")
        .collect()
    )
    cands = {
        (r.id1, r.id2) for r in QUERIES["dedup_minhash"](spark, sf_dir).collect()
    }
    for r in exact:
        assert (min(r.a, r.b), max(r.a, r.b)) in cands


def test_ann_lsh_recall_against_exact(spark, sf_dir):
    """LSH neighbor pairs at L2 < 6 must be a subset of the true
    (unfiltered) pair distances; spot-check a sample for distance
    correctness."""
    got = QUERIES["sim_ann_lsh"](spark, sf_dir).limit(20).collect()
    assert got
    e = {
        r.vec_id: r.embedding
        for r in load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200).collect()
    }
    import math

    for r in got:
        if r.id1 in e and r.id2 in e:
            true = math.sqrt(sum((a - b) ** 2 for a, b in zip(e[r.id1], e[r.id2])))
            assert abs(true - r.l2_dist) < 1e-4
            assert r.l2_dist < 6.0


def test_engine_hashes_deterministic(spark, sf_dir):
    a = {(r.doc_id, r.text_xx64) for r in QUERIES["fn_hash_engine"](spark, sf_dir).collect()}
    b = {(r.doc_id, r.text_xx64) for r in QUERIES["fn_hash_engine"](spark, sf_dir).collect()}
    assert a == b and a


def test_watermark_drops_late_rows(spark, sf_dir):
    """The late-replayed oldest 5% must NOT be double counted: the
    append-mode sink's total must not exceed the true event count, and
    the oldest window must not include the replayed duplicates."""
    import datetime as dt

    sink = QUERIES["stream_watermark_late"](spark, sf_dir)
    total_events = load(spark, sf_dir, "events").count()
    emitted = sink.agg(F.sum("n")).collect()[0][0] or 0
    assert emitted <= total_events, "late rows were double counted"
    assert emitted >= total_events // 2, "most on-time rows must be emitted"
    assert sink.count() > 0
    # event-time sanity: a ns/µs unit slip lands every bucket in 1970
    # while keeping counts plausible — pin the bucket range to the data
    b_min, b_max = sink.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert b_min >= dt.datetime(2024, 1, 1), f"bucket in the past: {b_min}"
    assert b_max < dt.datetime(2030, 1, 1), f"bucket in the future: {b_max}"


def test_ml_models_reproducible(spark, sf_dir):
    p1 = {(r.doc_id, r.prediction) for r in QUERIES["ml_rf"](spark, sf_dir).collect()}
    p2 = {(r.doc_id, r.prediction) for r in QUERIES["ml_rf"](spark, sf_dir).collect()}
    assert p1 == p2 and p1


def test_simhash_identical_docs_same_signature(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    dups = (
        d.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    sig = {r.doc_id: r.simhash for r in QUERIES["dedup_simhash"](spark, sf_dir).collect()}
    for r in dups:
        sigs = {sig[i] for i in r.ids}
        assert len(sigs) == 1, f"identical texts got different simhashes: {r.ids}"

def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    """IVF top-1 must be findable in the exact scan, and its cosine can
    never exceed the exact global top-1 for the same probe."""
    import math

    ivf = QUERIES["sim_ivf_topk"](spark, sf_dir).collect()
    assert ivf
    best_ivf = {}
    for r in ivf:
        if r.rn == 1:
            best_ivf[r.id1] = (r.id2, r.cos_sim)
    vecs = {
        r.vec_id: r.embedding
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    checked = 0
    for pid, (nid, sim) in list(best_ivf.items())[:10]:
        exact_best = max(
            cos(vecs[pid], v) for k, v in vecs.items() if k != pid
        )
        assert sim <= exact_best + 1e-6, "IVF found better than exact?!"
        assert abs(cos(vecs[pid], vecs[nid]) - sim) < 1e-4
        checked += 1
    assert checked > 0


def test_approx_pct_brackets_exact(spark, sf_dir):
    """percentile_approx with accuracy 10000 must sit within 2% of the
    exact percentile on every group (and the exact columns are exact by
    construction — they anchor the check)."""
    rows = QUERIES["agg_approx_pct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in ((r.approx_p50, r.exact_p50), (r.approx_p95, r.exact_p95)):
            assert abs(approx - exact) / max(abs(exact), 1e-9) < 0.02, r


def test_stratified_sample_rates_and_subset(spark, sf_dir):
    """sampleBy realized rates must track the requested per-stratum
    fractions (exact for fraction=1.0), and every sampled row must come
    from the source relation."""
    li = load(spark, sf_dir, "lineitem")
    totals = {r.l_returnflag: r.n for r in li.groupBy("l_returnflag").count().withColumnRenamed("count", "n").collect()}
    got = QUERIES["sample_stratified"](spark, sf_dir)
    counts = {r.l_returnflag: r.n for r in got.groupBy("l_returnflag").count().withColumnRenamed("count", "n").collect()}
    assert counts.get("R") == totals["R"], "fraction=1.0 stratum must keep every row"
    for flag, frac in (("A", 0.05), ("N", 0.02)):
        rate = counts.get(flag, 0) / totals[flag]
        assert abs(rate - frac) < frac, f"{flag}: realized {rate:.4f} vs requested {frac}"
    # subset check on a sample of keys
    src = {(r.l_orderkey, r.l_linenumber) for r in li.select("l_orderkey", "l_linenumber").collect()}
    for r in got.limit(200).collect():
        assert (r.l_orderkey, r.l_linenumber) in src


def test_hll_sketch_estimates_track_exact(spark, sf_dir):
    """Per-group HLL estimates must sit within 5% of the exact distinct
    counts, and the unioned global sketch must match the exact global
    distinct — proving the sketches merge losslessly across groups."""
    got = {r.l_returnflag: r.approx_orders
           for r in QUERIES["agg_hll_sketch"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    exact = {r.l_returnflag: r.d
             for r in li.groupBy("l_returnflag")
                        .agg(F.countDistinct("l_orderkey").alias("d")).collect()}
    exact["ALL"] = li.select("l_orderkey").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_events_ts_sanity(spark, sf_dir, duck):
    """Guard against the events.ts unit drift (TIMESTAMP(NANOS) read as
    ntz / long-µs / long-ns depending on Spark build): every read path,
    batch and streaming, must agree with DuckDB's native read to the
    microsecond. A reintroduced blanket ``div 1000`` (or a missed one)
    shifts min(ts) by ~1000× and fails this immediately."""
    import datetime as dt

    from pyspark.sql import types as T

    from systematic_review_classification_spark.sources.tables import (
        normalize_event_ts,
    )
    from systematic_review_classification_spark.streaming.helpers import (
        EVENTS_SCHEMA,
    )

    d_min, d_max = duck.execute("SELECT min(ts), max(ts) FROM events").fetchone()
    assert d_min >= dt.datetime(2024, 1, 1), "test data precondition"

    paths = {
        "batch_load": load(spark, sf_dir, "events"),
        "forced_long": normalize_event_ts(
            spark.read.schema(
                T.StructType([T.StructField("ts", T.LongType())])
            ).parquet(f"{sf_dir}/events.parquet")
        ),
        "forced_ntz": spark.read.schema(EVENTS_SCHEMA).parquet(
            f"{sf_dir}/events.parquet"
        ),
    }
    for name, df in paths.items():
        s_min, s_max = df.agg(F.min("ts"), F.max("ts")).collect()[0]
        assert s_min == d_min and s_max == d_max, (
            f"{name}: spark [{s_min}, {s_max}] != duckdb [{d_min}, {d_max}]"
        )


def test_stream_dedup_matches_batch_distinct(spark, sf_dir):
    """Value-sensitive twin: the double-replay dedup's total must equal
    the exact batch distinct event_id count, per event_type."""
    got = {r.event_type: r.n_unique
           for r in QUERIES["stream_dedup"](spark, sf_dir).collect()}
    exact = {r.event_type: r.n
             for r in load(spark, sf_dir, "events")
                      .dropDuplicates(["event_id"])
                      .groupBy("event_type")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == exact and got


def test_stream_stateful_matches_batch_groupby(spark, sf_dir):
    """Value-sensitive twin: per-user state-store counters must equal
    the batch per-user aggregate, user by user."""
    got = {r.user_id: (r.n_events, r.total_value)
           for r in QUERIES["stream_stateful"](spark, sf_dir).collect()}
    exact = {r.user_id: (r.n, r.v)
             for r in load(spark, sf_dir, "events")
                      .groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.round(F.sum("value"), 2).alias("v")).collect()}
    assert set(got) == set(exact)
    for uid, (n, v) in exact.items():
        assert got[uid][0] == n and abs(got[uid][1] - v) < 0.02, uid


def test_stream_foreachbatch_sink_complete(spark, sf_dir):
    """Value-sensitive twin: the foreachBatch-appended sink, re-read
    and re-aggregated, must carry every event exactly once."""
    got = {r.event_type: (r.n, r.total_value)
           for r in QUERIES["stream_foreachbatch"](spark, sf_dir).collect()}
    exact = {r.event_type: (r.n, r.v)
             for r in load(spark, sf_dir, "events")
                      .groupBy("event_type")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.round(F.sum("value"), 2).alias("v")).collect()}
    assert set(got) == set(exact)
    for et, (n, v) in exact.items():
        assert got[et][0] == n and abs(got[et][1] - v) < 0.02, et


def test_stream_rollup_merge_runs_multiple_batches(spark, sf_dir):
    """The staged 3-file source with maxFilesPerTrigger=1 must produce
    one rollup-store generation per micro-batch — the merge loop is
    only exercised if more than one generation exists."""
    import os

    from systematic_review_classification_spark.streaming.helpers import (
        IO_ROOT, sf_tag,
    )

    QUERIES["stream_rollup_merge"](spark, sf_dir).count()
    store = os.path.join(IO_ROOT, sf_tag(sf_dir), "rollup_store")
    gens = sorted(d for d in os.listdir(store) if d.startswith("g"))
    assert len(gens) == 3, gens


def test_stream_rollup_merge_rerun_deterministic(spark, sf_dir):
    """The rollup store's generation counter is derived from the store
    directory, not Python driver state — so running the query twice in
    one session (fresh checkpoint each run, as work_dir guarantees)
    must return identical results, and a stale in-memory counter can
    never skew which generation is read back."""
    a = {tuple(r) for r in QUERIES["stream_rollup_merge"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["stream_rollup_merge"](spark, sf_dir).collect()}
    assert a == b and a


def test_pca_geometry(spark, sf_dir):
    """PCA projection: k is honored, explained variance is sorted
    descending, and every projection's squared norm is bounded by its
    input vector's squared norm (orthogonal projection contracts)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from systematic_review_classification_spark.sources.tables import load

    out = QUERIES["ml_pca"](spark, sf_dir)
    assert out.filter(F.col("k") != 8).count() == 0

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x * x,
        ).alias("in_sqnorm"),
    )
    ev = PCA(k=8, inputCol="features", outputCol="pc").fit(e).explainedVariance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1)), list(ev)
    joined = out.join(e.select("vec_id", "in_sqnorm"), "vec_id")
    assert (
        joined.filter(F.col("proj_sqnorm") > F.col("in_sqnorm") + 1e-6).count() == 0
    )


def test_priority_list_keys_registered():
    """Every key in the registry's verification priority list must
    name a registered query — a typo would silently push the intended
    key out of the driver's per-round verification window."""
    from systematic_review_classification_spark.registry import _PRIORITY

    missing = [k for k in _PRIORITY if k not in QUERIES]
    assert not missing, f"priority list names unregistered keys: {missing}"
    dupes = sorted({k for k in _PRIORITY if _PRIORITY.count(k) > 1})
    assert not dupes, (
        "duplicate keys in priority list (a stale backlog entry would"
        f" have shadowed the re-headed rank before r10's"
        f" first-occurrence-wins fix): {dupes}"
    )


def test_compression_ratio_band(spark, sf_dir):
    """Compression ratios are positive, and ≤ 1 once the text is long
    enough that zlib's ~11-byte container overhead is amortized (very
    short docs legitimately exceed 1); pure repetition compresses
    strictly better than typical prose."""
    from pyspark.sql import functions as F

    out = QUERIES["txt_compression_ratio"](spark, sf_dir)
    bad = out.filter(
        (F.col("comp_ratio") <= 0)
        | ((F.col("comp_ratio") > 1.0) & (F.col("n_chars") > 200))
    ).count()
    assert bad == 0
    import zlib

    rep = ("repeat " * 200).encode()
    prose = (
        "the quick brown fox jumps over a lazy dog while seven wizards "
        "brew distinct potions of varied and unusual composition "
    ).encode() * 20
    assert len(zlib.compress(rep, 6)) / len(rep) < len(
        zlib.compress(prose, 6)
    ) / len(prose)


def test_observe_metrics_match_independent_agg(spark, sf_dir):
    """scan_observe's piggybacked CollectMetrics must equal an
    independently computed aggregate over the same predicate. Metrics
    are read from the QueryExecution after an action — NOT via an
    Observation handle, whose ObservationManager registration is
    non-serializable session state that breaks later jobs (see the
    operator docstring)."""
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    df = all_queries()["scan_observe"](spark, sf_dir)
    n_rows = len(df.collect())  # action → metrics materialize
    row = df._jdf.queryExecution().observedMetrics().apply("scan_observe_metrics")
    got_n, got_sum = row.getLong(0), row.getDouble(1)
    ref = (
        load(spark, sf_dir, "lineitem")
        .where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 48))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
        .first()
    )
    assert got_n == ref["n"] == n_rows
    assert abs(got_sum - ref["s"]) < 1e-6


def test_als_scores_finite_and_reproducible(spark, sf_dir):
    """Seeded ALS must produce finite scores and be run-to-run
    reproducible (same seed, same data → same factors)."""
    import math

    from systematic_review_classification_spark import all_queries

    q = all_queries()["ml_als"]
    a = {(r.user, r.item): r.score for r in q(spark, sf_dir).collect()}
    b = {(r.user, r.item): r.score for r in q(spark, sf_dir).collect()}
    assert a and a == b
    assert all(math.isfinite(v) for v in a.values())


def test_pq_adc_beats_random_and_reproduces(spark, sf_dir):
    """Product-quantization ADC top-5 must be strongly informative:
    on average well over a third of each query's ADC-top-5 falls in
    the exact L2 top-50 (random placement would land ~10%); and the
    seeded codebooks make the whole output run-to-run identical."""
    import collections

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    q = all_queries()["sim_pq_adc"]
    out1 = {(r.qid, r.vec_id, r.adc_d2) for r in q(spark, sf_dir).collect()}
    out2 = {(r.qid, r.vec_id, r.adc_d2) for r in q(spark, sf_dir).collect()}
    assert out1 and out1 == out2

    approx = collections.defaultdict(set)
    for qid, vid, _ in out1:
        approx[qid].add(vid)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = emb.alias("a")
    b = emb.where(F.col("vec_id") % 29 == 0).alias("b")
    d2 = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    pairs = b.join(a, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("b.vec_id").alias("qid"), F.col("a.vec_id").alias("vid"), d2.alias("d2")
    )
    w = W.partitionBy("qid").orderBy("d2", "vid")
    exact = (
        pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 50).collect()
    )
    ex = collections.defaultdict(set)
    for r in exact:
        ex[r.qid].add(r.vid)
    hits = [len(approx[k] & ex[k]) / 5 for k in ex]
    assert sum(hits) / len(hits) >= 0.35, hits


def test_ttl_sessions_match_batch_gaps_islands(spark, sf_dir):
    """Every session the TTL operator emits must be exactly a batch
    gaps-islands session (same user, bounds, count), and every
    NON-final batch session (those closed by a successor event, which
    is batch-split independent) must have been emitted. Timeout-closed
    final sessions additionally prove the watermark TTL fired."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load
    from systematic_review_classification_spark.streaming.stream_ops import _TTL_GAP_US

    got = all_queries()["stream_stateful_ttl"](spark, sf_dir).collect()
    emitted = {(r.user_id, r.start_us, r.end_us, r.n_events) for r in got}
    assert emitted, "no sessions emitted"
    assert any(r.closed_by == "timeout" for r in got), "watermark TTL never fired"

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us")
    isl = (
        ev.withColumn("prev", F.lag("us").over(w))
        .withColumn(
            "new_s",
            (F.col("prev").isNull() | ((F.col("us") - F.col("prev")) > _TTL_GAP_US))
            .cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count("*").alias("n_events"),
        )
    )
    w_last = W.partitionBy("user_id")
    batch = isl.withColumn("max_sid", F.max("sid").over(w_last)).collect()
    all_sessions = {(r.user_id, r.start_us, r.end_us, r.n_events) for r in batch}
    non_final = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in batch
        if r.sid != r.max_sid
    }
    assert emitted <= all_sessions, emitted - all_sessions
    assert non_final <= emitted, non_final - emitted


def test_active_screen_curve_monotone_and_beats_random(spark, sf_dir):
    """The active-learning screening curve must be strictly
    increasing, and each actively-selected batch must find relevant
    docs at a rate >= the corpus prevalence (i.e., at least as good as
    random screening — in practice far better)."""
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.operators.ml import _featurized

    rows = sorted(
        all_queries()["ml_active_screen"](spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2, 3]
    assert rows[0].n_found < rows[1].n_found < rows[2].n_found
    assert 0 < rows[2].recall <= 1.0

    feat = _featurized(spark, sf_dir)
    stats = feat.agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("pos")
    ).first()
    prevalence = stats["pos"] / stats["n"]
    batch = max(int(stats["n"] * 0.1), 10)
    for prev, cur in zip(rows, rows[1:]):
        assert (cur.n_found - prev.n_found) / batch >= prevalence * 0.9


def test_stream_progress_counts_all_rows(spark, sf_dir):
    """StreamingQueryProgress must account for every event exactly
    once across batches, with at least one batch executed and live
    state rows equal to the grouping cardinality."""
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    rows = all_queries()["stream_progress"](spark, sf_dir).collect()
    assert rows, "no progress entries"
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.num_input_rows for r in rows) == n_events
    assert max(r.state_rows for r in rows) >= 1


def test_cms_one_sided_error(spark, sf_dir):
    """Count-min sketch guarantees est >= exact for every key (hash
    collisions only ever ADD counts), with total over-estimate bounded
    by the collision mass. The absent probe key must report exact=0
    while its estimate may be positive — the signature CMS behavior."""
    from systematic_review_classification_spark import all_queries

    rows = {r.key: r for r in all_queries()["agg_cms_portable"](spark, sf_dir).collect()}
    assert set(rows) == {"spark", "join", "stream", "zzz_absent"}
    for r in rows.values():
        assert r.est >= r.exact, f"{r.key}: CMS under-estimated"
    assert rows["zzz_absent"].exact == 0


def test_bm25_ranks_are_positive_and_bounded(spark, sf_dir):
    """BM25 with the 1+ idf form is strictly positive; top-20 of a
    corpus where every query term is common must fill all 20 slots and
    come back sorted-compatible (no duplicate doc_ids)."""
    from systematic_review_classification_spark import all_queries

    rows = all_queries()["txt_bm25_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert len({r.doc_id for r in rows}) == len(rows)
    assert all(r.score > 0 for r in rows)


def test_inverted_index_postings_consistent(spark, sf_dir):
    """df must equal the posting-list length for every token (the
    postings ARE the distinct docs), and tf_total >= df."""
    from systematic_review_classification_spark import all_queries

    for r in all_queries()["wl_inverted_index"](spark, sf_dir).collect():
        # postings is a comma-joined string (driver-canonicalizer
        # contract — see tests/test_driver_contract.py)
        postings = [int(x) for x in r.postings.split(",")] if r.postings else []
        assert r.df == len(postings)
        assert r.tf_total >= r.df
        assert postings == sorted(set(postings))


def test_hll_merge_estimate_bounded(spark, sf_dir):
    """Merged per-shard HLL sketches must estimate the global distinct
    count within ~5x the configured standard error (lgConfigK=12 →
    ~1.6%), and the merge must see every shard."""
    from systematic_review_classification_spark import all_queries

    r = all_queries()["agg_sketch_merge"](spark, sf_dir).first()
    assert r.n_shards >= 2
    assert r.exact_distinct > 0
    assert r.rel_err <= 0.08, f"HLL union drifted: {r.rel_err}"


def test_ks_stat_in_unit_interval(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    r = all_queries()["wl_ks_test"](spark, sf_dir).first()
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.n_a > 0 and r.n_b > 0


def test_prisma_flow_monotone(spark, sf_dir):
    """Each PRISMA stage can only shrink the record set."""
    from systematic_review_classification_spark import all_queries

    rows = {r.stage: r.n for r in all_queries()["wl_prisma_flow"](spark, sf_dir).collect()}
    assert (
        rows["identified"] >= rows["after_dedup"] >= rows["screened_in"] >= rows["included"]
    )
    assert rows["identified"] > 0


def test_change_attribution_shares_sum_to_one(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    rows = all_queries()["wl_change_attribution"](spark, sf_dir).collect()
    assert abs(sum(r.delta_share for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.delta for r in rows) - sum(r.rev_h2 - r.rev_h1 for r in rows)) < 0.05


def test_soft_dedup_keeps_bounded(spark, sf_dir):
    """Soft dedup keeps at most every doc and, in expectation, about
    one per duplicate cluster — bound loosely from both sides."""
    from systematic_review_classification_spark import all_queries

    rows = all_queries()["wl_soft_dedup_sampling"](spark, sf_dir).collect()
    total_in = sum(r.docs_in for r in rows)
    total_kept = sum(r.docs_kept for r in rows)
    assert 0 < total_kept <= total_in


def test_reservoir_merge_is_exact_topk(spark, sf_dir):
    """The shard-merged sample must EQUAL the direct global min-k by
    hash — distributivity, not approximation."""
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    got = [r.event_id for r in all_queries()["sample_reservoir_merge"](spark, sf_dir).collect()]
    direct = [
        r.event_id
        for r in load(spark, sf_dir, "events")
        .select("event_id", F.md5(F.concat(F.lit("rsv:"), F.col("event_id").cast("string"))).alias("r"))
        .orderBy("r", "event_id")
        .limit(5)
        .collect()
    ]
    assert got == direct


def test_screen_e2e_recall_in_unit_interval(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    r = all_queries()["ml_screen_e2e"](spark, sf_dir).first()
    assert 0.0 <= r.recall_at_10pct <= 1.0
    assert r.found_at_10pct <= r.n_pos <= r.n


def test_boilerplate_strip_conserves_chunks(spark, sf_dir):
    """n_dropped <= n_chunks, and a doc with nothing dropped must
    reconstruct its exact original text."""
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    out = {r.doc_id: r for r in all_queries()["txt_boilerplate_strip"](spark, sf_dir).collect()}
    orig = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}
    assert set(out) == set(orig)
    intact = 0
    for did, r in out.items():
        assert 0 <= r.n_dropped <= r.n_chunks
        if r.n_dropped == 0:
            assert r.text_clean == orig[did]
            intact += 1
    assert intact > 0


def test_lsh_scurve_matches_theory(spark, sf_dir):
    """The measured candidate rate per Jaccard bucket must track the
    theoretical banding curve P(j) = 1 - (1 - j^8)^2 for 2 bands x 8
    rows: within [P(bucket_lo) - 0.15, P(bucket_hi) + 0.15] wherever
    the bucket has enough pairs to measure. If this drifts, the
    signatures are not behaving as independent min-hashes and the
    b/r tuning story collapses."""
    from systematic_review_classification_spark import all_queries

    def theory(j: float) -> float:
        return 1.0 - (1.0 - j**8) ** 2

    rows = all_queries()["dedup_scurve_empirical"](spark, sf_dir).collect()
    checked = 0
    for r in rows:
        if r.n_pairs < 20:
            continue
        lo, hi = r.jac_bucket / 10.0, (r.jac_bucket + 1) / 10.0
        assert theory(lo) - 0.15 <= r.candidate_rate <= theory(hi) + 0.15, (
            r.jac_bucket,
            r.candidate_rate,
            theory(lo),
            theory(hi),
        )
        checked += 1
    assert checked >= 2, "not enough populated buckets to validate the curve"


def test_partition_balance_conserves_rows(spark, sf_dir):
    """Per-partition counts must sum to the table total, and hash
    partitioning on a high-cardinality key must be reasonably even
    (max no more than 3x the mean at any test scale)."""
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    r = all_queries()["wl_partition_balance"](spark, sf_dir).first()
    assert r.total_rows == load(spark, sf_dir, "lineitem").count()
    assert r.n_partitions <= 32
    assert r.skew_factor < 3.0


def test_hll_daily_rollup_bounded_error(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    rows = all_queries()["wl_hll_daily_rollup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_actives > 0
        assert r.rel_err <= 0.08, (r.week, r.rel_err)


def test_rendezvous_minimal_disruption(spark, sf_dir):
    """Removing one node must move EXACTLY that node's keys: survivors
    keep every key (moved=0), the removed node moves all of them."""
    from systematic_review_classification_spark import all_queries

    rows = {r.node: r for r in all_queries()["wl_rendezvous_hashing"](spark, sf_dir).collect()}
    assert rows["n3"].keys_moved == rows["n3"].keys_before > 0
    for n in ("n0", "n1", "n2"):
        assert rows[n].keys_moved == 0, rows[n]


def test_multitouch_credit_conserved(spark, sf_dir):
    """Each attribution model's total credit must equal the number of
    converting users with at least one pre-purchase touch."""
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    rows = all_queries()["wl_multitouch_attribution"](spark, sf_dir).collect()
    total_linear = sum(r.linear_attrib for r in rows)
    total_u = sum(r.u_shape_attrib for r in rows)
    ev = load(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    n_paths = (
        ev.join(conv, "user_id")
        .filter((F.col("ts") < F.col("fp")) & (F.col("event_type") != "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(total_linear - n_paths) < 1e-3, (total_linear, n_paths)
    assert abs(total_u - n_paths) < 1e-3, (total_u, n_paths)


def test_seasonal_indices_weighted_average_is_one(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    rows = all_queries()["wl_seasonal_index"](spark, sf_dir).collect()
    tot_days = sum(r.n_days for r in rows)
    wavg = sum(r.seasonal_index * r.n_days for r in rows) / tot_days
    assert abs(wavg - 1.0) < 1e-4, wavg


def test_hhi_bounds(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    for r in all_queries()["wl_hhi"](spark, sf_dir).collect():
        assert 10000.0 / r.n_participants - 1e-6 <= r.hhi <= 10000.0 + 1e-6, r


def test_growth_accounting_identity(spark, sf_dir):
    """active_t = new + retained + resurrected, and churned_t equals
    last week's actives minus this week's retained."""
    from collections import defaultdict

    from systematic_review_classification_spark import all_queries

    g = defaultdict(dict)
    for r in all_queries()["wl_growth_accounting"](spark, sf_dir).collect():
        g[r.week][r.status] = r.n_users
    weeks = sorted(g)
    active = {
        w: g[w].get("new", 0) + g[w].get("retained", 0) + g[w].get("resurrected", 0)
        for w in weeks
    }
    for prev, cur in zip(weeks, weeks[1:]):
        if cur == prev + 1:
            assert g[cur].get("churned", 0) == active[prev] - g[cur].get("retained", 0), (
                prev,
                cur,
                g[cur],
                active[prev],
            )


def test_rate_volume_mix_additive(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    for r in all_queries()["wl_rate_volume_mix"](spark, sf_dir).collect():
        recomposed = r.volume_effect + r.rate_effect + r.mix_effect
        assert abs(recomposed - r.revenue_delta) < 0.05, r


def test_capture_recapture_lower_bounds(spark, sf_dir):
    from systematic_review_classification_spark import all_queries

    r = all_queries()["wl_capture_recapture"](spark, sf_dir).first()
    assert r.lincoln_petersen_estimate >= max(r.n1, r.n2) - 1e-6
    assert r.overlap <= min(r.n1, r.n2)


# --- r4: invariants for the remaining rows-only keys ----------------------


def test_seeded_classifiers_valid_and_deterministic(spark, sf_dir):
    """ml_lr / ml_svm: binary predictions, calibrated probability in
    [0,1], and bit-identical on a second run (seeded, deterministic
    featurization)."""
    from systematic_review_classification_spark import all_queries

    Q = all_queries()
    lr1 = {r.doc_id: (r.prediction, r.p1) for r in Q["ml_lr"](spark, sf_dir).collect()}
    assert lr1 and all(p in (0.0, 1.0) and 0.0 <= p1 <= 1.0 for p, p1 in lr1.values())
    lr2 = {r.doc_id: (r.prediction, r.p1) for r in Q["ml_lr"](spark, sf_dir).collect()}
    assert lr1 == lr2
    svm = Q["ml_svm"](spark, sf_dir).collect()
    assert svm and all(r.prediction in (0.0, 1.0) for r in svm)


def test_gbt_and_cv_metrics_sane(spark, sf_dir):
    """ml_gbt predicts a valid class per doc; ml_cv reports one row
    per grid point with an AUC in [0.5-ish, 1]."""
    from systematic_review_classification_spark import all_queries

    Q = all_queries()
    gbt = Q["ml_gbt"](spark, sf_dir).collect()
    assert gbt and all(r.prediction in (0.0, 1.0) for r in gbt)
    cv = Q["ml_cv"](spark, sf_dir).collect()
    assert len(cv) == 2  # two regParam grid points
    assert all(0.0 <= r[1] <= 1.0 for r in cv)


def test_sample_seeded_deterministic_and_sized(spark, sf_dir):
    """Same seed => identical sample; size within a loose Bernoulli
    band around the 10% fraction."""
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    Q = all_queries()
    s1 = sorted(tuple(r) for r in Q["sample_seeded"](spark, sf_dir).collect())
    s2 = sorted(tuple(r) for r in Q["sample_seeded"](spark, sf_dir).collect())
    assert s1 == s2
    n_total = load(spark, sf_dir, "lineitem").count()
    assert 0.05 * n_total <= len(s1) <= 0.15 * n_total


def test_hashing_tf_bounds(spark, sf_dir):
    """nnz bounded by the 1024-wide hashed space AND by the doc's
    token count; norms positive for non-empty docs."""
    from pyspark.sql import functions as F
    from systematic_review_classification_spark import all_queries
    from systematic_review_classification_spark.sources.tables import load

    rows = all_queries()["txt_hashing_tf"](spark, sf_dir).collect()
    toks = {
        r.doc_id: r.n
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", "\\s+")).alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert 0 < r.nnz <= min(1024, toks[r.doc_id])
        assert r.vec_norm > 0
