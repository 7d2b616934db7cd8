"""Category C — joins (SURVEY.md §2.C).

Join-strategy policy for 100 TB (SURVEY.md §4.2): tiny dims broadcast
(explicit ``F.broadcast`` hints — customer⋈nation⋈region never
shuffles the fact side on dim keys), equal-size fact-fact joins go
sort-merge on the shuffle key, and AQE converts to broadcast / splits
skewed partitions at runtime. The as-of join is expressed as a
union + running-window rewrite — one shuffle on (user_id), no
point-in-time loop; the range join constrains with an equi key so
Spark plans SMJ + band filter instead of a nested-loop product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load


@query(
    "join_broadcast",
    oracle="""
SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) / count(*) AS avg_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash equi-join: dim ships to every executor, fact side
    never shuffles for the join.

    avg is expressed round(sum,2)/count, not round(avg,2): small groups
    of 2-decimal values put the true mean exactly on .xx5 boundaries;
    rounding the sum first recovers the exact decimal sum in both
    engines, and the division of identical doubles is bitwise equal.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal"),
        )
    )


@query(
    "join_multiway",
    oracle="""
SELECT r_name, n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'O'
GROUP BY r_name, n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table join chain (BASELINE.md Q3 shape): fact ⋈ broadcast dims —
    a single fact scan, zero fact-side shuffles before the final agg."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "join_sortmerge",
    oracle="""
SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact sort-merge join (hint("merge")): both sides shuffle on
    the key, sorted merge — the strategy that scales when neither side
    broadcasts. Result identical to any other strategy."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


@query(
    "join_shuffle_hash",
    oracle="""
SELECT p_type, count(*) AS n, round(avg(l_quantity), 2) AS avg_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
""",
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join (hint("shuffle_hash")): shuffle both sides,
    build hash on the smaller — avoids the sort when one side is
    modest but over the broadcast threshold."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(p.hint("shuffle_hash"), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        )
    )


@query(
    "join_left",
    oracle="""
SELECT c_custkey, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-padding → count(col) skips nulls, so
    order-less customers show n_orders = 0."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_full",
    oracle="""
WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT coalesce(c.k, s.k) AS nationkey, c.n_cust AS n_cust, s.n_supp AS n_supp
FROM c FULL JOIN s ON c.k = s.k
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nulls where a
    nation has only customers or only suppliers)."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — EXISTS. Emits each left row at most once."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — NOT EXISTS; also the dedup-against-corpus shape
    (new docs anti-joined against an existing fingerprint set)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (bounded: dims only — a cross join of facts is
    never acceptable at scale; similarity ops block/LSH instead)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_theta",
    oracle="""
SELECT p_partkey, count(*) AS n_near, round(avg(l_quantity), 2) AS avg_qty
FROM part JOIN lineitem
  ON p_brand = 'Brand#1' AND l_extendedprice BETWEEN p_retailprice AND p_retailprice + 40
GROUP BY p_partkey
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) band join → BroadcastNestedLoopJoin with the
    small filtered side broadcast. The filter on the broadcast side is
    what keeps the pair count bounded."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load(spark, sf_dir, "lineitem")
    return (
        F.broadcast(p)
        .join(
            li,
            (F.col("l_extendedprice") >= F.col("p_retailprice"))
            & (F.col("l_extendedprice") <= F.col("p_retailprice") + 40),
        )
        .groupBy("p_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_near"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        )
    )


@query(
    "join_range_time",
    oracle="""
SELECT e1.user_id AS user_id, e1.event_id AS id1, e2.event_id AS id2,
       e1.event_type AS type1, e2.event_type AS type2
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
""",
)
def join_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: event pairs of the same user within 10 minutes.
    The equi key (user_id) bounds the pair space — Spark shuffles on
    user_id and applies the time band as a join residual, never a full
    cross product."""
    ev = load(spark, sf_dir, "events")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    return e1.join(
        e2,
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        F.col("e1.user_id").alias("user_id"),
        F.col("e1.event_id").alias("id1"),
        F.col("e2.event_id").alias("id2"),
        F.col("e1.event_type").alias("type1"),
        F.col("e2.event_type").alias("type2"),
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id AS event_id, p.ts AS purchase_ts,
       (SELECT max(c.ts) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS last_click_ts
FROM events p WHERE p.event_type = 'purchase'
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest click at-or-before each purchase, per user).

    Spark-first rewrite: instead of a per-row point-in-time lookup,
    union click+purchase rows, sort once within each user partition,
    and carry the latest click timestamp forward with a running-window
    max — one shuffle on user_id, linear work, no correlated subquery.
    Equal-timestamp ties order clicks first (prio 0) to get inclusive
    '<=' semantics matching the oracle.
    """
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("prio"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "prio", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.withColumn(
        "last_click_ts", F.max(F.when(F.col("prio") == 0, F.col("ts"))).over(w)
    )
    return carried.filter(F.col("prio") == 1).select(
        "event_id", F.col("ts").alias("purchase_ts"), "last_click_ts"
    )


@query(
    "join_self",
    oracle="""
SELECT e1.user_id AS user_id, e1.event_id AS id1, e2.event_id AS id2,
       e1.event_type AS t1, e2.event_type AS t2
FROM events e1 JOIN events e2
  ON e2.event_id = e1.event_id + 1 AND e1.user_id = e2.user_id
""",
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self equi-join on adjacent event ids of the same user."""
    ev = load(spark, sf_dir, "events")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    return e1.join(
        e2,
        (F.col("e2.event_id") == F.col("e1.event_id") + 1)
        & (F.col("e1.user_id") == F.col("e2.user_id")),
    ).select(
        F.col("e1.user_id").alias("user_id"),
        F.col("e1.event_id").alias("id1"),
        F.col("e2.event_id").alias("id2"),
        F.col("e1.event_type").alias("t1"),
        F.col("e2.event_type").alias("t2"),
    )


@query(
    "join_range_bucket",
    oracle="""
SELECT e1.event_id AS id1, e2.event_id AS id2,
       e1.event_type AS type1, e2.event_type AS type2
FROM events e1 JOIN events e2
  ON e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
""",
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with NO equi key — all event pairs within 10
    minutes, across users. A naive theta join is a full cartesian
    product; the scalable plan manufactures an equi key by bucketing
    time into window-sized (600 s) buckets: a qualifying pair's
    buckets can differ by at most 1, so the right side replicates into
    (bucket, bucket-1) via explode and the join becomes an EQUI join
    on bucket with the exact time band as a residual filter. Each pair
    meets in exactly one bucket (floor difference is 0 or 1), so no
    dedup pass is needed.

    Scale shape: one shuffle of each side hash-partitioned on bucket;
    per-bucket pair work is bounded by per-window event density, not
    corpus size — the cartesian blowup a plain theta join would hit at
    100 TB never materializes. Skewed hot windows split further by
    salting the bucket (join_skew_salted pattern)."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    b = F.floor(F.unix_timestamp("ts") / 600)
    e1 = ev.select(
        F.col("event_id").alias("id1"),
        F.col("ts").alias("ts1"),
        F.col("event_type").alias("type1"),
        b.alias("bkt"),
    )
    e2 = ev.select(
        F.col("event_id").alias("id2"),
        F.col("ts").alias("ts2"),
        F.col("event_type").alias("type2"),
        F.explode(F.array(b, b - 1)).alias("bkt"),
    )
    return (
        e1.join(e2, "bkt")
        .filter(
            (F.col("ts2") > F.col("ts1"))
            & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 10 MINUTES"))
        )
        .select("id1", "id2", "type1", "type2")
    )


@query(
    "join_null_safe",
    oracle="""
WITH a AS (
  SELECT nullif(c_nationkey % 5, 4) AS k, count(*) AS c_cnt
  FROM customer GROUP BY 1),
b AS (
  SELECT nullif(s_nationkey % 5, 4) AS k, count(*) AS s_cnt
  FROM supplier GROUP BY 1)
SELECT a.k, a.c_cnt, b.s_cnt
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing — the semantics CDC
    diffs and dimension reconciliation need when keys are genuinely
    optional.

    Scale note: both sides are PRE-AGGREGATED to key grain before the
    join, which is also the scale discipline — a raw null-safe join
    funnels every NULL row of both sides into one reducer pair (NULL
    is one hash bucket: the worst skew key there is). Aggregate first,
    or salt the NULLs, before <=> touches big data."""
    a = (
        load(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("k"))
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    b = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("ks"))
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return a.join(b, F.col("k").eqNullSafe(F.col("ks"))).select(
        "k", "c_cnt", "s_cnt"
    )


@query(
    "join_asof_tolerance",
    oracle="""
SELECT p.event_id AS event_id, p.ts AS purchase_ts,
       (SELECT max(c.ts) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR) AS last_click_ts,
       (SELECT epoch_us(p.ts) - max(epoch_us(c.ts)) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR) AS gap_us
FROM events p WHERE p.event_type = 'purchase'
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof's
    `tolerance=`): the latest click at-or-before each purchase counts
    only within a 1-hour lookback; staler matches become NULL — the
    semantics attribution windows and sensor alignment actually need.

    Same single-shuffle rewrite as `join_asof` (union + per-user
    running-window max); the tolerance is ONE post-window filter on
    the carried timestamp, so the plan cost is identical — no second
    lookup, no range join. The oracle's correlated subquery restates
    it as point-in-time lookups."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("prio"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "prio", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.withColumn(
        "carried_ts", F.max(F.when(F.col("prio") == 0, F.col("ts"))).over(w)
    )
    in_tol = F.col("carried_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    last = F.when(in_tol, F.col("carried_ts"))
    return carried.filter(F.col("prio") == 1).select(
        "event_id",
        F.col("ts").alias("purchase_ts"),
        last.alias("last_click_ts"),
        F.when(
            in_tol,
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("carried_ts").cast("timestamp")),
        ).alias("gap_us"),
    )


@query(
    "join_scd2",
    oracle="""
WITH dim AS (
  SELECT user_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS version
  FROM events WHERE event_type = 'signup')
SELECT f.event_id, f.user_id, f.ts AS purchase_ts,
       d.version AS tier_version, d.valid_from
FROM events f
JOIN dim d ON f.user_id = d.user_id
          AND f.ts >= d.valid_from
          AND (d.valid_to IS NULL OR f.ts < d.valid_to)
WHERE f.event_type = 'purchase'
""",
)
def join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) point-in-time join: each
    signup event opens a new dimension version whose validity interval
    runs to the next signup (`lead()` builds [valid_from, valid_to)),
    and each purchase joins the version valid AT ITS EVENT TIME — the
    canonical warehouse pattern for "what was true about this entity
    when the fact happened".

    Scale shape: version construction is one lead/row_number window
    partitioned by the entity key; the fact join is an EQUI join on
    user_id with the interval as a residual filter — per-user version
    counts are bounded, so the residual never explodes. At 100 TB
    both sides are storage-partitioned on the entity key and this is
    a zero-extra-shuffle merge."""
    ev = load(spark, sf_dir, "events")
    wd = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("d_user"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(
            W.partitionBy("d_user").orderBy("valid_from")
        ))
        .withColumn("version", F.row_number().over(
            W.partitionBy("d_user").orderBy("valid_from")
        ))
    )
    f = ev.filter(F.col("event_type") == "purchase")
    return (
        f.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("version").alias("tier_version"),
            "valid_from",
        )
    )


@query(
    "join_asof_forward",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, ts,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || ':' ||
         lpad(CAST(event_id AS VARCHAR), 10, '0') AS pk
  FROM events),
w AS (
  SELECT event_id, user_id, event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN pk END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_pk
  FROM ev)
SELECT event_id AS error_id, user_id,
       TRY_CAST(ltrim(string_split(next_pk, ':')[2], '0') AS BIGINT) AS next_purchase_id,
       CAST(TRY_CAST(string_split(next_pk, ':')[1] AS BIGINT) - epoch_us(ts) AS BIGINT)
         AS wait_us
FROM w WHERE event_type = 'error'
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every error event, the next purchase by
    the same user — the recovery-time / conversion-after-incident
    question. join_asof carries the latest past value forward; the
    forward direction needs the EARLIEST future match, expressed as a
    min over a FOLLOWING-frame window on a sortable (epoch, id)
    packed key (min of a zero-padded string == earliest event —
    portable where struct-min is not). Same single user-shuffle as the
    backward as-of; no event self-join. NULL when no purchase
    follows. Leading zeros strip via ltrim for the id (ids are
    positive; an all-zero id cannot occur)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.concat(
            F.lpad(F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"),
            F.lit(":"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
        ).alias("pk"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        1, W.unboundedFollowing
    )
    out = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("pk"))).over(w).alias(
            "next_pk"
        ),
    ).filter(F.col("event_type") == "error")
    return out.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.expr("try_cast(ltrim('0', element_at(split(next_pk, ':'), 2)) AS BIGINT)").alias(
            "next_purchase_id"
        ),
        (
            F.expr("try_cast(element_at(split(next_pk, ':'), 1) AS BIGINT)")
            - F.unix_micros(F.col("ts").cast("timestamp"))
        )
        .cast("bigint")
        .alias("wait_us"),
    )
