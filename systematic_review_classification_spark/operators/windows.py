"""Category E — window functions (SURVEY.md §2.E).

Every window partitions on a key before ordering, so at scale the sort
is per-partition (one shuffle on the partition key), never global.
Tie-breaking rule (SURVEY.md §1.4.4): every ORDER BY ends with a
unique key so ranking is total and cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load


@query(
    "win_rank",
    oracle="""
SELECT c_custkey, c_mktsegment,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a keyed, totally-ordered window."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id, event_type,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
       lag(epoch_us(ts), 2, CAST(-1 AS BIGINT)) OVER w AS ts2_back_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset functions with defaults — inter-event gaps per user.
    Works on µs-epoch via unix_micros over the normalized ntz ts (UTC
    session tz makes the ltz cast identity) to match DuckDB epoch_us."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        F.lag("ts_us", 2, -1).over(w).cast("bigint").alias("ts2_back_us"),
    )


@query(
    "win_running",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
FROM orders
""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals per customer over order history."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


@query(
    "win_moving",
    oracle="""
SELECT l_orderkey, l_linenumber, l_suppkey,
       round(avg(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_avg_qty
FROM lineitem
""",
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate over a 3-row sliding frame.

    Ordering ends with l_quantity: (l_orderkey, l_linenumber) is NOT
    unique in this data (143k duplicate pairs at sf0.1) — the averaged
    measure itself completes a total order whose ties are
    interchangeable for the output.
    """
    li = load(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(-2, W.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.round(F.avg("l_quantity").over(w), 2).alias("mov_avg_qty"),
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_in_band,
       round(max(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW), 2) AS band_max
FROM orders
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering — value-based neighborhoods
    (orders within $5000 below the current price)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice").rangeBetween(-5000, 0)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
        F.round(F.max("o_totalprice").over(w), 2).alias("band_max"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT c_custkey, c_mktsegment,
       first_value(c_custkey) OVER w AS seg_richest,
       last_value(c_custkey)  OVER w AS seg_poorest,
       first_value(nullif(c_name, 'Customer#000000000') IGNORE NULLS) OVER w AS first_named
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-edge values incl. ignorenulls over a full-partition frame."""
    c = load(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    nullable_name = F.nullif(F.col("c_name"), F.lit("Customer#000000000"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.first("c_custkey").over(w).alias("seg_richest"),
        F.last("c_custkey").over(w).alias("seg_poorest"),
        F.first(nullable_name, ignorenulls=True).over(w).alias("first_named"),
    )


@query(
    "win_topk_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via rank filter — the distributed grouped top-k
    (per-partition heaps after one shuffle on the group key; at 100 TB
    this is the only sane grouped-top-k plan)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_ntile_dist",
    oracle="""
SELECT c_custkey, c_nationkey,
       ntile(4)             OVER w AS quartile,
       percent_rank()       OVER w AS pr,
       cume_dist()          OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
)
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile bucketing plus
    percent_rank/cume_dist (the quantile-assignment primitives for
    per-group score normalization). Partitioned on the group key, so
    the plan is one shuffle + per-partition sorts. percent_rank and
    cume_dist are UNROUNDED on purpose: both are divisions of
    identical small integers, so the doubles are bitwise-identical
    across engines — while round(,6) would DIVERGE whenever k/n lands
    exactly on a .5e-6 midpoint (e.g. n=640: 1/640=0.0015625; Spark
    rounds half-up, DuckDB half-even)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "win_time_range",
    oracle="""
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_trailing_1h,
       round(sum(value) OVER w, 4) AS val_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, how many events (and how
    much value) landed in the trailing hour of EVENT TIME — the
    rate-limit / burst-detection window, distinct from
    `win_moving`'s row-count frame (a RANGE frame is defined by the
    ORDER-BY value, so tied timestamps are frame peers and the result
    is tie-order-independent — no tiebreak column needed).

    The DataFrame API cannot express interval range frames, so this
    goes through the SQL frontend on both engines — identical window
    text. Partitioned on user_id: same scale discipline as every
    per-row window here."""
    from systematic_review_classification_spark.sources.tables import load as _load

    _load(spark, sf_dir, "events").createOrReplaceTempView("ev_time_range")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               count(*) OVER w AS n_trailing_1h,
               round(sum(value) OVER w, 4) AS val_trailing_1h
        FROM ev_time_range
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "win_nth_value",
    oracle="""
SELECT o_orderkey, o_custkey,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       nth_value(o_orderkey, 3)  OVER w AS third_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame — the positional window
    accessor completing first/last (win_first_last): each order sees
    the customer's 2nd order value and 3rd order key so far (NULL
    until the frame holds that many rows). Same single user-partition
    shuffle as every per-customer window."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@query(
    "win_lag_ignore_nulls",
    oracle="""
SELECT event_id, user_id,
       lag(CASE WHEN event_type <> 'error' THEN round(value, 2) END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_good_value,
       lead(CASE WHEN event_type <> 'error' THEN round(value, 2) END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_good_value
FROM events
""",
)
def win_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with IGNORE NULLS — the gap-jumping offset accessors:
    each event sees the previous/next NON-error value for its user,
    skipping over error events entirely (plain lag would return NULL
    whenever the adjacent row is an error). Same one-shuffle
    user-partitioned window as win_lag_lead; the null-skipping happens
    inside the window frame evaluator, not via a second pass."""
    ev = load(spark, sf_dir, "events")
    # python F.lag has no ignoreNulls parameter; the SQL form does
    good = "CASE WHEN event_type <> 'error' THEN round(value, 2) END"
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return ev.select(
        "event_id",
        "user_id",
        F.expr(f"lag({good}, 1) IGNORE NULLS {over}").alias("last_good_value"),
        F.expr(f"lead({good}, 1) IGNORE NULLS {over}").alias("next_good_value"),
    )


@query(
    "win_running_distinct",
    oracle="""
WITH fl AS (
  SELECT user_id, ts, event_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM events)
SELECT user_id, event_id,
       CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS types_so_far
FROM fl
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user — a frame no SQL window can
    express directly (DISTINCT is not frameable). Decomposed into two
    plain windows: flag each (user, type)'s FIRST occurrence, then
    running-sum the flags. Both windows partition on user (and
    user×type), so state per partition is a row counter — nothing
    set-valued is ever carried, which is what makes this linear at
    100 TB where a naive per-row set accumulation is quadratic
    memory."""
    ev = load(spark, sf_dir, "events")
    first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run = W.partitionBy("user_id").orderBy("ts", "event_id")
    fl = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(first) == 1, 1).otherwise(0).alias("is_first"),
    )
    return fl.select(
        "user_id", "event_id", F.sum("is_first").over(run).alias("types_so_far")
    )


@query(
    "win_ewma",
    oracle="""
WITH s AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY user_id)
SELECT user_id, CAST(len(vs) AS INTEGER) AS n,
       round(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
FROM s
""",
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (alpha = 0.3) —
    the sequential recurrence ewma_t = a*x_t + (1-a)*ewma_{t-1} that
    no built-in window aggregate expresses. Computed as a higher-order
    FOLD over the time-ordered value array (sort_array of
    (ts, event_id, value) structs gives deterministic order; the fold
    runs JVM-side, no UDF). Both engines execute the identical
    left-to-right float recurrence, so results are bit-equal before
    rounding. Per-user arrays are bounded by user activity — the
    right unit of parallelism; an unbounded global series would
    instead chunk with carry like wl_resample_ffill."""
    ev = load(spark, sf_dir, "events")
    vs = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    agg = ev.groupBy("user_id").agg(vs.alias("vs"))
    ewma = F.aggregate(
        F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at(F.col("vs"), 1),
        lambda acc, x: 0.3 * x + 0.7 * acc,
    )
    return agg.select(
        "user_id", F.size("vs").alias("n"), F.round(ewma, 6).alias("ewma")
    )


@query(
    "win_rolling_zscore",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, value,
         count(*) OVER fr AS n_f,
         sum(value) OVER fr AS s,
         sum(value * value) OVER fr AS s2
  FROM events
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
SELECT event_id, user_id,
       CASE WHEN n_f >= 4 AND (s2 - s * s / n_f) / (n_f - 1) > 1e-9
            THEN round((value - s / n_f)
                       / sqrt((s2 - s * s / n_f) / (n_f - 1)), 6)
       END AS rolling_z
FROM w
""",
)
def win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly signal: each event scored against its
    user's trailing 8-event window — the streaming-adjacent outlier
    detector (wl_anomaly_zscore scores against GLOBAL per-type stats;
    this adapts per user and per moment). Mean and variance come from
    explicit frame sums (count, Σx, Σx²) so both engines evaluate the
    identical algebra; windows shorter than 4 rows or with
    ~zero variance yield NULL (a z-score against float-noise variance
    is garbage, and ANSI would otherwise divide by zero). One user
    shuffle, one sort, three frame aggregates sharing the spec."""
    ev = load(spark, sf_dir, "events")
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, W.currentRow)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(fr).alias("n_f"),
        F.sum("value").over(fr).alias("s"),
        F.sum(F.col("value") * F.col("value")).over(fr).alias("s2"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n_f")) / (F.col("n_f") - 1)
    z = (F.col("value") - F.col("s") / F.col("n_f")) / F.sqrt(var)
    return w.select(
        "event_id",
        "user_id",
        F.when((F.col("n_f") >= 4) & (var > 1e-9), F.round(z, 6)).alias("rolling_z"),
    )


@query(
    "sample_reservoir_merge",
    oracle="""
SELECT event_id, md5('rsv:' || CAST(event_id AS VARCHAR)) AS r
FROM events
ORDER BY r, event_id LIMIT 5
""",
)
def sample_reservoir_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE reservoir sampling: each of 4 shards keeps its local
    top-5 by a deterministic md5 rank, the union of 20 survivors is
    re-cut to the global top-5 — and because min-k over a uniform hash
    is DISTRIBUTIVE, the merged sample provably equals the direct
    global top-5 (the oracle computes only the direct form; equality
    IS the check). This is how coordination-free sampling works at
    1000 executors: fixed-k state per shard, one tiny merge — the
    sampling sibling of agg_variance_merge and agg_sketch_merge.
    sample_reservoir does per-group sampling; this pins the merge
    algebra itself."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.md5(F.concat(F.lit("rsv:"), F.col("event_id").cast("string"))).alias("r"),
        (F.col("event_id") % 4).alias("shard"),
    )
    local = (
        ev.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("shard").orderBy("r", "event_id")),
        )
        .filter(F.col("rn") <= 5)
        .select("event_id", "r")
    )
    return local.orderBy("r", "event_id").limit(5)


@query(
    "win_top_percent",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
FROM r WHERE rn <= ceil(0.01 * n)
""",
)
def win_top_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-PERCENT per group — the proportional cut win_topk_group's
    fixed k cannot express (each group keeps its own ceil(1% · count)):
    one rank window plus one count window over the same partition
    spec, so both compile into a single sort+window pass. Fully
    deterministic tie-breaks; at scale the 1% emerges from whatever
    each group's size is, with no second pass to count first."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.row_number()
        .over(w.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return r.filter(F.col("rn") <= F.ceil(0.01 * F.col("n"))).drop("rn", "n")
