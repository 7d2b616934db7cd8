"""Categories B, F, G — projections/filters, sorts/limits, set ops
(SURVEY.md §2.B/F/G).

All pure narrow/exchange-free transformations except sort/limit (which
plans TakeOrderedAndProject — top-k without a global sort) and the
distinct set ops (one hash-partition exchange). Every predicate is a
Catalyst expression so pushdown and codegen apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systematic_review_classification_spark.functions.predicates import finite
from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load


# --- B. projections / filters -------------------------------------------


@query(
    "proj_select",
    oracle="""
SELECT l_orderkey AS okey, l_linenumber AS line,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue,
       l_quantity * 2 AS double_qty
FROM lineitem
""",
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with rename + computed columns.

    round(,4) not (,2): a product of two 2-decimal values has exactly
    4 decimals, so round(,4) recovers the true decimal in both engines;
    round(,2) would sit on .xx5 half-up boundaries per row.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@query(
    "filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS price
FROM orders
WHERE (o_totalprice > 200000 AND o_orderstatus IN ('O', 'F'))
   OR (NOT o_orderpriority = '1-URGENT' AND o_totalprice BETWEEN 900 AND 1100)
""",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT, isin, between."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_totalprice") > 200000) & F.col("o_orderstatus").isin("O", "F"))
        | (~(F.col("o_orderpriority") == "1-URGENT") & F.col("o_totalprice").between(900, 1100))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
    )


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type, p_brand
FROM part
WHERE (p_name LIKE '%bolt%' OR regexp_matches(p_type, '^(ECO|PRO)'))
  AND p_brand LIKE 'Brand#1%'
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern predicates: LIKE, regex, prefix."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_name").like("%bolt%") | F.col("p_type").rlike("^(ECO|PRO)"))
        & F.col("p_brand").startswith("Brand#1")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@query(
    "filter_null",
    oracle="""
SELECT o_orderkey,
       nullif(o_orderstatus, 'F')                      AS status_or_null,
       coalesce(nullif(o_orderstatus, 'F'), 'FINAL')   AS status_filled,
       (nullif(o_orderstatus, 'F') IS NOT DISTINCT FROM nullif(o_orderpriority, o_orderpriority)) AS both_null
FROM orders
WHERE nullif(o_orderstatus, 'O') IS NOT NULL AND o_totalprice < 5000
""",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: nullif/coalesce/isNotNull/eqNullSafe (<=>).
    The test tables are null-free, so nulls are manufactured with
    nullif — same trick both engines."""
    o = load(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    always_null = F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority"))
    return (
        o.filter(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNotNull() & (F.col("o_totalprice") < 5000))
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("FINAL")).alias("status_filled"),
            status_or_null.eqNullSafe(always_null).alias("both_null"),
        )
    )


@query(
    "proj_case",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS wealth_band,
       CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2 ELSE 0 END AS seg_code
FROM customer
""",
)
def proj_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection: searched + simple CASE."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("wealth_band"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "MACHINERY", 2)
        .otherwise(0)
        .alias("seg_code"),
    )


@query(
    "proj_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR)                          AS key_str,
       CAST(floor(o_totalprice) AS BIGINT)                  AS price_floor,
       CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)  AS price_dec,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR)           AS order_day
FROM orders WHERE o_orderkey < 500 AND isfinite(o_totalprice)
""",
)
def proj_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts. double→int goes through floor() on both sides: Spark
    truncates toward zero, DuckDB rounds half-even — floor removes the
    dialect divergence. DATE is surfaced as string: DuckDB's pandas
    bridge renders DATE as midnight datetime, Spark as date — the
    string form is representation-stable across engines. Finite
    prices only on both engines: floor(NaN)'s ANSI bigint cast (and
    DuckDB's NaN→DECIMAL) abort outright."""
    o = load(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderkey") < 500) & finite("o_totalprice")).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.col("o_totalprice").cast("decimal(14,2)").cast("double").alias("price_dec"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row dedup — hash-partition exchange on all projected columns."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# --- F. sorts / limits ----------------------------------------------------


@query(
    "sort_multi",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total-order sort (unique key last = deterministic)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc_nulls_last(), "o_orderkey")
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price"))
        .limit(100)
    )


@query(
    "limit_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans TakeOrderedAndProject — per-partition heaps
    + driver merge, never a full global sort. The shape that matters
    at 100 TB (top-k of a trillion rows is a per-partition heap)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .limit(50)
    )


# --- G. set operations ----------------------------------------------------


@query(
    "set_union",
    oracle="""
SELECT c_custkey AS custkey, 'rich' AS tag FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT c_custkey AS custkey, 'building' AS tag FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — duplicates preserved."""
    c = load(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey"), F.lit("rich").alias("tag")
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("building").alias("tag")
    )
    return rich.unionByName(building)


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nations having both customers and suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — nations with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_ops_all",
    oracle="""
WITH a AS (SELECT l_orderkey % 100 AS k, l_linenumber AS ln
           FROM lineitem WHERE l_orderkey < 3000),
b AS (SELECT l_orderkey % 100 AS k, l_linenumber AS ln
      FROM lineitem WHERE l_orderkey >= 2000 AND l_orderkey < 5000)
SELECT 'intersect' AS op, k, ln FROM (SELECT k, ln FROM a INTERSECT ALL SELECT k, ln FROM b)
UNION ALL
SELECT 'except' AS op, k, ln FROM (SELECT k, ln FROM a EXCEPT ALL SELECT k, ln FROM b)
""",
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    duplicates count — each row of the result reflects multiset
    multiplicity min(m,n) / max(m−n, 0), which the DISTINCT variants
    (`set_intersect` / `set_except`) destroy.

    Scale shape: Spark plans both as a single hash aggregation over
    the union with per-side multiplicity counters + generate — one
    shuffle on the row key, same cost class as distinct; never a
    join."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") < 3000).select(
        (F.col("l_orderkey") % 100).alias("k"), F.col("l_linenumber").alias("ln")
    )
    b = li.filter(
        (F.col("l_orderkey") >= 2000) & (F.col("l_orderkey") < 5000)
    ).select(
        (F.col("l_orderkey") % 100).alias("k"), F.col("l_linenumber").alias("ln")
    )
    return (
        a.intersectAll(b).select(F.lit("intersect").alias("op"), "k", "ln")
        .unionAll(a.exceptAll(b).select(F.lit("except").alias("op"), "k", "ln"))
    )
