"""Extended TPC-H-shaped composite workloads + corpus decontamination.

Completes the workload tier begun in operators/scale.py (q3/q5/q6/q10)
and extended there (q4/q14/q18): the remaining classic analytic shapes
— cross-dimension volume (Q7), market share (Q8), lateness-class
distribution (Q12 adapted), customer-order distribution (Q13), top
supplier by scalar max (Q15), small-quantity avg-subquery (Q17),
disjunctive predicate pushdown (Q19), sole-late-supplier multi-EXISTS
(Q21 adapted), and inactive-customer anti-join (Q22 adapted) — each
re-expressed for the test schema (no partsupp / shipmode / commitdate
/ phone columns; see TESTDATA.md) and planned for the 100 TB design
point: broadcast hints only on bounded dims (nation/region, one-row
scalar aggregates), facts joined on their natural keys via AQE-chosen
SMJ/shuffled-hash, semi/anti joins wherever the query only asks
"does a match exist".

Plus `dedup_decontaminate`: benchmark-overlap decontamination — the
training-data hygiene step every LLM pipeline runs before training
(drop training docs that share an n-gram shingle with an eval set).

Determinism conventions follow scale.py: revenue sums round at 4
decimals; threshold comparisons are arranged over exactly-representable
values (integer-valued doubles, or thresholds rounded before compare)
so Spark and DuckDB agree bit-for-bit on boundary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from systematic_review_classification_spark.functions.predicates import finite
from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@query(
    "wl_q7_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= timestamp '1996-01-01'
  AND l_shipdate <  timestamp '1998-01-01'
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
)
def wl_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between
    two nations by ship year — the two-role dimension pattern (nation
    joined twice under different roles).

    Scale shape: both nation copies are 25-row broadcasts, and their
    IN-filters cut the supplier/customer sides BEFORE the fact joins
    (2/25 of each). lineitem⋈orders⋈customer shuffle on their keys via
    AQE; the year comes from the fact row itself so no extra pass."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sn = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    cn = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "wl_q8_share",
    oracle="""
WITH all_orders AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD')
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 4) AS nation_volume,
       round(sum(volume), 4) AS total_volume,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM all_orders GROUP BY o_year
""",
)
def wl_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of
    STANDARD-part revenue sold into EUROPE customers, by order year.

    Scale shape: region/nation (x2 roles) broadcast; `part` is filtered
    to 1/6 of its rows by p_type before the join and carries no hint
    (AQE broadcasts while it fits). The share is a conditional-sum
    ratio inside ONE aggregate pass — no second scan, no self-join.
    Both the numerator CASE and the denominator fold into the same
    map-side partials."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(nation_vol), 4).alias("nation_volume"),
            F.round(F.sum(vol), 4).alias("total_volume"),
            F.round(
                F.sum(nation_vol) / F.nullif(F.sum(vol), F.lit(0.0)), 6
            ).alias("mkt_share"),
        )
    )


@query(
    "wl_q12_late",
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'very_late'
            WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'late'
            ELSE 'on_time' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= timestamp '1997-01-01' AND l_shipdate < timestamp '1998-01-01'
GROUP BY 1
""",
)
def wl_q12_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority), adapted: the schema
    has no l_shipmode/l_commitdate, so lines bucket by shipping DELAY
    class (days between order and ship date) instead of mode, counting
    urgent-vs-other order priorities per class — the same
    derived-category conditional-count pattern.

    Scale shape: one fact⋈fact join on orderkey (AQE SMJ), the year
    filter pushed to the lineitem scan, and the 3-group aggregate
    collapses map-side. datediff on midnight timestamps is exact
    integer days in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.when(days > 60, "very_late")
            .when(days > 30, "late")
            .otherwise("on_time")
            .alias("ship_class"),
            F.when(high, 1).otherwise(0).alias("_h"),
            F.when(~high, 1).otherwise(0).alias("_l"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("_h").alias("high_line_count"),
            F.sum("_l").alias("low_line_count"),
        )
    )


@query(
    "wl_q13_custdist",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def wl_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): orders-per-customer
    histogram, with the classic non-equi extra join condition (Q13's
    comment NOT LIKE becomes a priority exclusion) that must stay IN
    the left join, not a post-filter — a post-filter would drop
    customers with zero qualifying orders instead of counting them
    at 0.

    Scale shape: the join and the first groupBy both key on custkey,
    so Catalyst reuses the join's hash partitioning for the aggregate
    (one shuffle, not two); the second groupBy reduces ~n_customers
    rows to a few dozen histogram buckets — a near-free shuffle.
    count(o_orderkey) counts non-null matches only, exactly the SQL
    semantics."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "wl_q15_topsupp",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= timestamp '1997-01-01' AND l_shipdate < timestamp '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def wl_q15_topsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the supplier(s) hitting the global max — the scalar-subquery
    pattern decorrelated into a one-row broadcast join.

    Scale shape: the revenue CTE is one pruned-scan aggregate on
    suppkey; max() over it is a single-row aggregate that broadcasts
    into the filter (crossJoin of a 1-row frame — the scalar-join
    pattern, not a cartesian product); supplier joins last against the
    already-filtered (usually 1-row) winner set. The max comparison
    runs on the ROUNDED revenue in both engines, so ties and the
    winner row are boundary-exact."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "wl_q17_smallqty",
    oracle="""
WITH avgq AS (
  SELECT l_partkey AS a_partkey, sum(l_quantity) AS q_sum, count(*) AS q_n
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
  GROUP BY l_partkey)
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avgq ON l_partkey = a_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity * q_n * 5 < q_sum
""",
)
def wl_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines of one
    brand whose quantity is below 20% of that part's average quantity —
    the correlated avg subquery decorrelated into a per-part aggregate
    joined back to the fact.

    Scale shape: the brand filter prunes part to 1/25 BEFORE either
    join (AQE broadcasts the filtered dim); the per-part aggregate and
    the join-back both key on partkey so the shuffle partitioning is
    reused. The 20%-of-average threshold is evaluated as
    ``5 * qty * n < sum`` — all integer-valued doubles, so the
    comparison is EXACT in both engines with no division or float
    rounding on the boundary (l_quantity is integral; a sum of
    integer-valued doubles below 2^53 is order-independent)."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = branded.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum("l_quantity").alias("q_sum"), F.count(F.lit(1)).alias("q_n")
    )
    return (
        branded.join(avgq, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") * F.col("q_n") * 5 < F.col("q_sum"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "wl_q19_disjunct",
    oracle="""
SELECT count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
       AND l_quantity BETWEEN 20 AND 35)
""",
)
def wl_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR'd brand/size/quantity branches across BOTH join sides —
    the stress test for predicate decomposition.

    Scale shape: Catalyst factors the single-side conjuncts out of the
    OR — part gets ``p_brand IN (...)`` and a size envelope, lineitem
    gets a quantity envelope — and pushes both to the scans, so the
    join sees pre-filtered inputs and only the mixed-side residual
    runs post-join. Verified in tests/test_plans.py: both scans carry
    PushedFilters despite the top-level OR."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


@query(
    "wl_q21_waiting",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND date_diff('day', o_orderdate, l1.l_shipdate) > 60
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND date_diff('day', o_orderdate, l3.l_shipdate) > 60)
GROUP BY s_name
""",
)
def wl_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted:
    no l_receiptdate/l_commitdate in the schema, so "late" is shipping
    more than 60 days after the order date. For finalized orders, count
    per supplier the orders where it was the ONLY late supplier among
    several — the classic EXISTS + NOT-EXISTS double-correlated shape.

    Scale shape: EXISTS decorrelates to a left-semi and NOT EXISTS to
    a left-anti join, both on orderkey — they never widen rows. The
    NOT-EXISTS side needs o_orderdate to evaluate lateness, so the
    anti-join probe carries (orderkey, suppkey, orderdate) only. All
    three lineitem passes shuffle on the same orderkey, so AQE lines
    them up as co-partitioned SMJs; supplier joins last against the
    surviving (tiny) row set."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    has_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    sole_late = has_other.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey"))
        & (F.datediff("x_shipdate", "o_orderdate") > 60),
        "left_anti",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "wl_q22_inactive",
    oracle="""
WITH avg_bal AS (
  SELECT round(avg(c_acctbal), 4) AS a FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= timestamp '1999-01-01')
GROUP BY c_nationkey
""",
)
def wl_q22_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity), adapted: no c_phone
    column, so the country-code IN-list keys on c_nationkey. Wealthy
    (above the average positive balance) customers from 5 nations with
    no recent orders — scalar-avg subquery + anti join.

    Scale shape: the avg is a one-row aggregate broadcast into the
    filter (scalar-join pattern); the NOT EXISTS is a left-anti join
    on custkey against orders pre-filtered by date (filter pushed
    below the anti join's shuffle). The average is rounded to 4
    decimals in BOTH engines before the comparison, so boundary
    customers resolve identically regardless of float summation
    order."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9)
    )
    avg_bal = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 4).alias("a"))
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "wl_domain_mix",
    oracle="""
WITH weighted AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
         CASE WHEN source IN ('src0', 'src1', 'src2', 'src3', 'src4') THEN '..'
              WHEN source IN ('src5', 'src6', 'src7', 'src8', 'src9') THEN '80'
              ELSE '40' END AS keep_below
  FROM documents),
kept AS (
  SELECT * FROM weighted
  WHERE keep_below = '..'
     OR substring(md5('mix42:' || CAST(doc_id AS VARCHAR)), 1, 2) < keep_below)
SELECT source, count(*) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
FROM kept GROUP BY source
""",
)
def wl_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted mixture sampling: down-sample each source to a
    target mixing weight (here: premium sources keep 100%, mid-tier
    50%, the long tail 25%) — how a pretraining corpus hits its data
    mix. Sampling is a DETERMINISTIC per-document hash coin
    (md5 of a seeded doc key, first byte vs a hex threshold), not
    rand(): the same doc makes the same keep decision on any cluster
    size, any partitioning, any rerun — reproducible epochs, and
    oracle-able (ml_split's discipline applied to weighted sampling).

    Scale shape: pure map-side filter (hash + string compare per row,
    no shuffle until the final per-source count); the weight table is
    a CASE expression here but would broadcast as a dim at 100 TB.
    Reports per-source kept docs + token budget, the numbers a mix
    designer actually monitors."""
    d = load(spark, sf_dir, "documents")
    keep_below = (
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3", "src4"), ".."
        )
        .when(F.col("source").isin("src5", "src6", "src7", "src8", "src9"), "80")
        .otherwise("40")
    )
    coin = F.md5(F.concat(F.lit("mix42:"), F.col("doc_id").cast("string"))).substr(1, 2)
    kept = d.withColumn("keep_below", keep_below).filter(
        (F.col("keep_below") == "..") | (coin < F.col("keep_below"))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens_kept"),
    )


@query(
    "wl_pack_sequences",
    oracle="""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents),
packed AS (
  SELECT source, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // 512 AS seq_id
  FROM t)
SELECT source, CAST(seq_id AS BIGINT) AS seq_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM packed GROUP BY source, seq_id
""",
)
def wl_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: concatenate documents (in a
    deterministic per-shard order) into fixed token-budget training
    sequences — a doc starts in the sequence where the running token
    count before it lands (budget 512 here). The op every LLM data
    loader performs before tokenized examples hit the trainer; the
    output is the packing manifest (docs and tokens per sequence).

    Scale shape: ONE window, partitioned by the shard key (source) —
    never a global order — so per-reducer work is corpus/n_shards,
    exactly wl_shard_shuffle's discipline; the running sum uses the
    rows-frame (cumulative partials, no re-scan per row). At 100 TB
    shards are thousands of hash buckets instead of 20 sources; the
    plan is unchanged."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = d.withColumn(
        "seq_id", F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 512)
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


@query(
    "dedup_decontaminate",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, len(t) - 2),
                                      i -> array_to_string(t[i:i+3], '_'))) AS gs
  FROM toks WHERE len(t) >= 4),
bench_grams AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 20 = 0),
train AS (SELECT * FROM grams WHERE doc_id % 20 <> 0),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(gs) AS g FROM train) t
  JOIN bench_grams b ON t.g = b.g)
SELECT source,
       count(*) AS n_train,
       CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM train LEFT JOIN contaminated c USING (doc_id)
GROUP BY source
""",
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop-or-flag training documents that
    share any 4-gram word shingle with a held-out benchmark set (here:
    ``doc_id % 20 == 0`` stands in for the eval suite). The hygiene
    step every LLM training pipeline runs so eval numbers aren't
    memorization; reports per-source training counts and how many are
    contaminated.

    Scale shape: the benchmark set is tiny relative to the corpus, so
    its distinct-gram set broadcasts; the training side is one linear
    tokenize→shingle→explode pass, a broadcast-semi-join, and a
    distinct on doc_id — never any train×train pairwise work. At
    100 TB: identical plan, with the benchmark gram set staying a few
    GB (13-grams over eval suites), still broadcastable; if not,
    it degrades to a shuffle join on the gram hash."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # upper bound clamped to 1: sequence(1, n) goes DESCENDING when
    # n < 1 (emitting 0, an invalid slice start) and the expression can
    # be evaluated for sub-4-token rows before the size filter applies;
    # clamped rows produce one junk gram and are filtered out anyway
    # (the mm_frame_sample short-document convention)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - 3, F.lit(1))),
            lambda i: F.concat_ws("_", F.slice(toks, i, F.lit(4))),
        )
    )
    g = d.filter(F.size(toks) >= 4).select("doc_id", "source", grams.alias("gs"))
    bench_grams = (
        g.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % 20 != 0)
    contaminated = (
        train.select("doc_id", F.explode("gs").alias("g"))
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.when(F.col("_c").isNotNull(), 1).otherwise(0)).alias(
                "n_contaminated"
            ),
        )
    )


@query(
    "wl_dataset_card",
    oracle="""
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6) AS dup_rate,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source, lang
""",
)
def wl_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics: the per-(source, lang) corpus summary
    every training-data release publishes — doc counts, token volume,
    exact-dup rate (via content fingerprint, so the distinct count
    shuffles 16-byte hashes, not text), length extremes. One hash
    aggregate over the corpus; count(DISTINCT md5) rewrites to a
    two-level agg (expand on the fingerprint, then merge) — both
    levels partial-aggregated map-side, nothing quadratic, no text
    moves across the wire."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    return (
        d.select("source", "lang", n_tok.alias("n_tok"), F.md5("text").alias("fp"), "n_chars")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
            F.countDistinct("fp").alias("n_unique"),
            F.round(
                F.lit(1.0) - F.countDistinct("fp").cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


@query(
    "wl_funnel",
    oracle="""
WITH c AS (
  SELECT user_id, min(ts) AS first_click, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.first_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT c.user_id, c.n_clicks, c.first_click, p.first_purchase,
       p.user_id IS NOT NULL AS converted,
       epoch_us(p.first_purchase) - epoch_us(c.first_click) AS lag_us
FROM c LEFT JOIN p ON c.user_id = p.user_id
""",
)
def wl_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: per user, first click → first purchase at-or-after
    it, with conversion flag and lag. Two grouped mins plus one join —
    funnel analytics without any ordered-row processing, so each stage
    partial-aggregates map-side and the join keys on user_id (the
    natural even-cardinality key at scale). A sessionized variant
    would swap the global min for the session window (stream_session);
    the plan shape is unchanged."""
    from systematic_review_classification_spark.sources.tables import load as _load

    ev = _load(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"), F.count(F.lit(1)).alias("n_clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "first_click"), "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        c.join(p, "user_id", "left")
        .select(
            "user_id",
            "n_clicks",
            "first_click",
            "first_purchase",
            F.col("first_purchase").isNotNull().alias("converted"),
            (
                F.unix_micros(F.col("first_purchase").cast("timestamp"))
                - F.unix_micros(F.col("first_click").cast("timestamp"))
            ).alias("lag_us"),
        )
    )


@query(
    "agg_time_rollup",
    oracle="""
SELECT CAST(CAST(date_trunc('month', ts) AS TIMESTAMP) AS VARCHAR) AS month,
       CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR)   AS day,
       CAST(CAST(date_trunc('hour', ts) AS TIMESTAMP) AS VARCHAR)  AS hour,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts), date_trunc('hour', ts))
""",
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup — the warehouse hour/day/month pre-agg
    cube over event time, exercising the normalized ns→µs timestamp
    path through date_trunc at every grain. ROLLUP computes all four
    grains in ONE scan with partial aggregation (vs four separate
    scans); at 100 TB this materializes the serving layer for
    time-series dashboards. Grain columns surface as strings (rolled
    levels are NULL) so the result hashes identically everywhere."""
    from systematic_review_classification_spark.sources.tables import load as _load

    ev = _load(spark, sf_dir, "events")
    return (
        ev.rollup(
            F.date_trunc("month", "ts").alias("month"),
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("month").cast("string").alias("month"),
            F.col("day").cast("string").alias("day"),
            F.col("hour").cast("string").alias("hour"),
            "n",
            "total_value",
        )
    )


@query(
    "wl_q16_suppcnt",
    oracle="""
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
""",
)
def wl_q16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type) for a size subset, excluding a supplier
    deny-list. The schema has no partsupp, so lineitem is the
    part–supplier bridge (same join/agg shape, the fact is bigger —
    a HARDER scale test than real Q16).

    Scale shape: the deny-list is a broadcast ANTI join (NOT IN on a
    provably non-null key — no null-trap here, and the anti join
    never shuffles the fact). The part filter prunes before the fact
    join; count(DISTINCT) shuffles once on the group key with the
    supplier key carried for reducer-side dedup."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20))
        .select("p_partkey", "p_brand", "p_type")
    )
    deny = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(deny), "l_suppkey", "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "wl_q2_mincost",
    oracle="""
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         ((2 * sum(CAST(round(round(l_extendedprice / l_quantity, 6) * 1000000, 0) AS BIGINT))
           + 100 * count(*)) // (200 * count(*))) / 10000.0 AS avg_price
  FROM lineitem
  WHERE isfinite(l_quantity) AND l_quantity > 0 AND isfinite(l_extendedprice)
  GROUP BY 1, 2),
ranked AS (
  SELECT pk, sk, avg_price,
         row_number() OVER (PARTITION BY pk ORDER BY avg_price, sk) AS rn
  FROM ps)
SELECT r.pk AS p_partkey, p.p_brand, r.sk AS best_suppkey,
       n.n_name AS supp_nation, r.avg_price
FROM ranked r
JOIN part p     ON r.pk = p.p_partkey
JOIN supplier s ON r.sk = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE r.rn = 1 AND p.p_size = 10
""",
)
def wl_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each part in a size
    class, the supplier offering the lowest observed average unit
    price, with its nation. partsupp's ps_supplycost is reconstructed
    as avg(l_extendedprice / l_quantity) per (part, supplier) from the
    fact — the correlated-min-per-group pattern Q2 exercises.

    Scale shape: one hash agg to (part, supplier) grain, then the min
    is a row_number window PARTITIONED BY PART KEY (high cardinality,
    unskewed — never a global sort). Ordering uses the ROUNDED price
    plus the supplier key so the pick is deterministic under fp
    noise. Dimension joins happen AFTER rn=1 cuts the row set to one
    per part; nation broadcasts."""
    # the unit ratio needs a guarded domain on BOTH engines: qty = 0
    # aborts ANSI division, a NaN qty sneaks past `> 0` (NaN compares
    # greatest in Spark AND DuckDB), and an inf price makes the micro
    # cast overflow. AQE's empty-relation pruning HID this at small
    # fixtures (the p_size join side was empty, so the aggregate —
    # and its division — never executed).
    li = load(spark, sf_dir, "lineitem").filter(
        finite("l_quantity")
        & (F.col("l_quantity") > 0)
        & finite("l_extendedprice")
    )
    # avg of RATIOS is the one average where round(avg(x), 4) is not
    # cross-engine safe: the true mean can land EXACTLY on a 5 in the
    # 5th decimal (seen at sf0.1: a 1-row group at 89.11625), and the
    # engines then disagree by construction — Spark rounds the decimal
    # repr HALF_UP while DuckDB rounds the binary double / rounds
    # decimal ties down. The only bit-deterministic form is integer
    # arithmetic: scale each ratio to an exact micro-unit bigint
    # (round(r,6)*1e6 is within 1e-9 of an integer in BOTH engines, so
    # round(...,0) agrees), sum exactly, and compute
    # HALF_UP(S / (100*C)) as (2*S + 100*C) div (200*C) — pure bigint
    # math, identical everywhere, then one exact /10000.0 for display.
    micro = F.round(
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6) * 1_000_000, 0
    ).cast("long")
    ps = (
        li.groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(micro).alias("s"), F.count(F.lit(1)).alias("c"))
        .select(
            "pk",
            "sk",
            (
                F.expr("(2 * s + 100 * c) div (200 * c)") / 10000.0
            ).alias("avg_price"),
        )
    )
    w = W.partitionBy("pk").orderBy("avg_price", "sk")
    best = ps.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey", "p_brand")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(p, F.col("pk") == F.col("p_partkey"))
        .join(s, F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("sk").alias("best_suppkey"),
            F.col("n_name").alias("supp_nation"),
            "avg_price",
        )
    )


@query(
    "wl_hour_heatmap",
    oracle="""
SELECT isodow(ts) AS dow, hour(ts) AS hr,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def wl_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap over event time — the
    operational dashboard staple. One scan, one 168-cell hash
    aggregate (fully map-side combinable); the ISO weekday is
    weekday()+1 in Spark to match DuckDB's isodow (Mon=1..Sun=7),
    dodging the dayofweek() Sunday-origin dialect trap."""
    from systematic_review_classification_spark.sources.tables import load as _load

    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(
        (F.weekday("ts") + 1).alias("dow"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


@query(
    "wl_temperature_mix",
    oracle="""
WITH src AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS toks
  FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS nt, sum(pow(n, 0.3)) AS zt FROM src)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       round(n / tot.nt, 6) AS natural_share,
       round(pow(n, 0.3) / tot.zt, 6) AS temp_share,
       round((pow(n, 0.3) / tot.zt) / (n / tot.nt), 6) AS upsample_factor,
       CAST(round(toks * (pow(n, 0.3) / tot.zt) / (n / tot.nt), 0) AS BIGINT)
         AS epoch_token_budget
FROM src, tot
""",
)
def wl_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled mixture weights: p_i ∝ n_i^α (α = 0.3), the
    standard low-resource upsampling formula multilingual/multi-domain
    pretraining uses to keep head sources from drowning the tail
    (wl_domain_mix APPLIES a hand-set mix; this DERIVES the mix from
    corpus counts). Reports natural vs temperature share, the
    upsample factor each source gets, and the per-epoch token budget
    that factor implies. One per-source hash agg — the corpus is
    scanned ONCE; the two normalizers are global windows over the
    agg, which is bounded by |sources| (a separate `.agg` branch
    would re-derive the scan lineage: measured 4 scans in the
    formatted plan before this shape, 1 after)."""
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.size(F.split("text", " "))).cast("double").alias("toks"),
    )
    wall = W.partitionBy()  # over the bounded per-source aggregate
    src = src.select(
        "source",
        "n",
        "toks",
        F.sum("n").over(wall).alias("nt"),
        F.sum(F.pow("n", F.lit(0.3))).over(wall).alias("zt"),
    )
    w = F.pow("n", F.lit(0.3)) / F.col("zt")
    nat = F.col("n") / F.col("nt")
    return src.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(nat, 6).alias("natural_share"),
        F.round(w, 6).alias("temp_share"),
        F.round(w / nat, 6).alias("upsample_factor"),
        F.round(F.col("toks") * w / nat, 0).cast("bigint").alias("epoch_token_budget"),
    )
