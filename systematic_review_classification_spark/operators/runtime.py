"""Runtime/API-surface operators: caching with plan reuse, observe()
metrics, parameterized SQL, the DataFrame stat API, ordered string
aggregation, and PERMISSIVE corrupt-record capture.

These pin the execution-layer features a production deployment leans
on beyond the relational operators themselves:

- cache_reuse: an explicitly persisted intermediate consumed by two
  branches — at 100 TB this is the difference between one and two fact
  scans for every dashboard that fans out from a shared rollup;
- scan_observe: CollectMetrics piggybacks row-count/sum accumulators
  on the normal pass (the cheap data-quality hook — no second scan,
  metrics ride the action);
- sql_params: named-parameter binding through the SQL frontend — the
  injection-safe template path every scheduled report uses;
- stat_crosstab: the DataFrame stat API's contingency table, which
  desugars to one pivot aggregate;
- agg_string_agg: deterministic ordered string aggregation (the
  export format many downstream consumers still require);
- src_csv_corrupt: PERMISSIVE parse of a malformed feed with the raw
  line captured per failed row — at scale you never DROPMALFORMED
  silently; you route the corrupt column to a quarantine sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from systematic_review_classification_spark.functions.predicates import finite
from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)


@query(
    "cache_reuse",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         count(*) AS n
  FROM events GROUP BY 1, 2),
stats AS (SELECT event_type, avg(n) AS avg_n FROM daily GROUP BY 1)
SELECT daily.event_type, strftime(daily.d, '%Y-%m-%d') AS d, daily.n,
       round(daily.n / stats.avg_n, 4) AS vs_avg
FROM daily JOIN stats USING (event_type)
WHERE daily.n > stats.avg_n * 1.1
""",
)
def cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average traffic days, computed off an explicitly cached
    daily rollup that two plan branches consume.

    The persisted intermediate is the reduced daily table (group
    cardinality, not fact cardinality — cache AFTER the reduction,
    never the raw scan). Branch 1 re-aggregates it into per-type
    averages; branch 2 joins those back. Without persist() the rollup's
    fact scan would run twice; the plan test pins InMemoryTableScan on
    both consumers. unpersist() is deliberately not called here: the
    test session owns the lifecycle, mirroring a shared-rollup service."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .agg(F.count("*").alias("n"))
        .persist()
    )
    stats = daily.groupBy("event_type").agg(F.avg("n").alias("avg_n"))
    return (
        daily.join(stats, "event_type")
        .where(F.col("n") > F.col("avg_n") * 1.1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "n",
            F.round(F.col("n") / F.col("avg_n"), 4).alias("vs_avg"),
        )
    )


@query(
    "scan_observe",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity >= 48
""",
)
def scan_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """observe(): CollectMetrics accumulators attached to a normal
    query — row count and value sum ride the same pass that produces
    the rows (no second scan, unlike a separate count()). The rows are
    unchanged, so the oracle is the plain filter; the metric values
    themselves are asserted in tests/test_invariants.py against an
    independent aggregate (read from queryExecution.observedMetrics
    after an action).

    Deliberately a string-NAMED observe, NOT an Observation handle:
    the handle registers itself with the session's ObservationManager,
    which is NOT serializable — once one is live, any later job whose
    plan references session state fails closure cleaning with
    'Task not serializable: ObservationManager' (observed breaking
    unrelated MLlib fits suite-wide). The named form attaches only
    the CollectMetrics plan node; metrics are read back from the
    QueryExecution, which also works for callers (like the external
    driver) that never read them at all."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 48))
        .observe(
            "scan_observe_metrics",
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


@query(
    "sql_params",
    oracle="""
SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL binding (spark.sql(..., args=...)) — the
    injection-safe template path. Parameters bind as literals BEFORE
    optimization, so constant folding and predicate pushdown see the
    final values exactly as with inline literals."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_p")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_p
        WHERE o_totalprice > :min_total AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_total": 150000, "status": "F"},
    )


@query(
    "stat_crosstab",
    oracle="""
SELECT l_returnflag AS l_returnflag_l_linestatus,
       count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
       count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
FROM lineitem GROUP BY l_returnflag
""",
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame stat API: contingency table of returnflag x
    linestatus via df.stat.crosstab — desugars to one pivot hash
    aggregate (value columns come from a distinct pass on the pivot
    key; bounded domain {F,O} here). Crosstab is safe at 100 TB only
    when the pivot column's cardinality is bounded — that contract is
    the operator's documented precondition. The OUTPUT schema is
    pinned to the documented {F,O} domain (missing statuses
    materialize as 0 columns): raw crosstab's data-dependent column
    set breaks downstream consumers the first day one status is
    absent from a partition of history."""
    li = load(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    for c in ("F", "O"):
        if c not in ct.columns:
            ct = ct.withColumn(c, F.lit(0).cast("bigint"))
    # crosstab STRINGIFIES the row key, rendering a NULL flag as the
    # literal "null" — map it back to a real NULL to match the SQL
    # group key (safe here: the returnflag domain {N,R,A} is the
    # operator's documented precondition, so "null" is unambiguous)
    return ct.select(
        F.nullif(F.col("l_returnflag_l_linestatus"), F.lit("null")).alias(
            "l_returnflag_l_linestatus"
        ),
        "F",
        "O",
    )


@query(
    "agg_string_agg",
    oracle="""
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines_csv,
       count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
""",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (string_agg / listagg parity):
    per-order CSV of line numbers in line order.

    Spark has no ordered string_agg aggregate; the deterministic
    equivalent is collect_list -> sort_array -> concat-join, all three
    JVM expressions in one hash aggregate (collect_list alone is
    order-nondeterministic — the sort is what makes the result
    reproducible across retries and partitionings). Group state is
    bounded by order size (~4 lines)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("lines_csv"),
        F.count("*").alias("n_lines"),
    )


@query(
    "src_csv_corrupt",
    oracle="""
SELECT device_id::INTEGER AS device_id,
       reading::DOUBLE    AS reading,
       ts_day,
       bad_line
FROM (VALUES
  (1, 3.5,  '2024-01-01', NULL),
  (2, NULL, '2024-01-02', '2,not_a_number,2024-01-02'),
  (3, 7.25, NULL,         '3,7.25,bad_date'),
  (4, 9.0,  '2024-01-04', NULL),
  (NULL, NULL, NULL,      'oops_only_one_field'),
  (6, 0.5,  '2024-01-06', NULL)
) AS t(device_id, reading, ts_day, bad_line)
""",
)
def src_csv_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV parse of a malformed telemetry feed
    (tests/fixtures/telemetry.csv): per-row partial recovery — fields
    that parse are kept, failed fields go NULL, and the raw line lands
    in the corrupt-record column for quarantine routing. The oracle is
    the literal expected relation (pinning Spark's observed PERMISSIVE
    semantics: unparseable cell => NULL cell + raw line captured;
    short row => all-NULL + raw line).

    At 100 TB the corrupt column feeds a dead-letter sink; silently
    dropping (DROPMALFORMED) loses data with no audit trail."""
    schema = T.StructType(
        [
            T.StructField("device_id", T.IntegerType()),
            T.StructField("reading", T.DoubleType()),
            T.StructField("ts_day", T.DateType()),
            T.StructField("bad_line", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .options(header=True, mode="PERMISSIVE", columnNameOfCorruptRecord="bad_line")
        .csv(os.path.join(_FIXTURE_DIR, "telemetry.csv"))
    )
    return df.select(
        "device_id",
        "reading",
        F.date_format("ts_day", "yyyy-MM-dd").alias("ts_day"),
        "bad_line",
    )


@query(
    "sql_pipe",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       round(avg(l_extendedprice), 2) AS avg_price
FROM lineitem
WHERE l_quantity >= 10
GROUP BY l_returnflag, l_linestatus
""",
)
def sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operator chain) — the linear
    FROM → WHERE → AGGREGATE form. Parses to the identical logical
    plan as the nested ANSI form (the oracle), so pushdown, partial
    aggregation, and codegen are unchanged; this pins that the frontend
    accepts the pipeline dialect a data-engineering codebase migrates
    to."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_quantity >= 10
        |> AGGREGATE count(*) AS n,
                     round(sum(l_quantity), 2) AS sum_qty,
                     round(avg(l_extendedprice), 2) AS avg_price
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, sum_qty, avg_price
        """
    )


@query(
    "fn_variant",
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(props) THEN
         (CASE WHEN json_type(props, '$.k') = 'DOUBLE'
               THEN TRY_CAST(trunc(CAST(props ->> '$.k' AS DOUBLE)) AS INTEGER)
               WHEN json_type(props, '$.k') = 'VARCHAR'
               THEN (CASE WHEN regexp_matches(props ->> '$.k',
                          '^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$')
                          THEN TRY_CAST(regexp_replace(props ->> '$.k',
                                 '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g')
                               AS INTEGER) END)
               ELSE TRY_CAST(json_extract(props, '$.k') AS INTEGER) END) END
         AS k,
       CASE WHEN json_valid(props) THEN
         (CASE WHEN json_type(props) = 'OBJECT'
               THEN '{' || coalesce(array_to_string(list_transform(
                      list_sort(json_keys(props)),
                      kk -> to_json(kk)::VARCHAR || ':'
                            || coalesce(json_extract(props, '$."' ||
                                 replace(replace(kk, '\\', '\\\\'), '"', '\\"')
                               || '"')::VARCHAR, 'null')),
                    ','), '') || '}'
               ELSE coalesce(json(props)::VARCHAR, 'null') END) END
         AS canonical,
       CASE WHEN json_valid(props)
            THEN (json_extract(props, '$.missing') IS NULL) END AS missing_is_null
FROM events
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4's semi-structured type): parse the
    JSON props column once into a variant, then typed path extraction
    (variant_get), canonical re-serialization (to_json minifies
    identically to DuckDB's json()), and missing-path semantics
    (NULL, no error).

    At 100 TB you parse JSON ONCE into a variant column at ingest and
    bind paths lazily — shredded variant subcolumns make repeated
    json_extract string-parsing (the oracle's form) unnecessary. The
    parse happens in ONE projection here and all three consumers read
    the shared variant column; everything is a codegen'd intrinsic.

    Malformed-JSON world (r9): parse is try_parse_json — a truncated
    or garbage props row becomes a NULL variant (all three outputs
    NULL, mirrored by the oracle's json_valid guard) instead of
    aborting the ingest; the typed extraction is try_variant_get /
    TRY_CAST (a string-valued k is data, not a crash); a non-integral
    DOUBLE k is TRUNCATED by Spark's variant int cast (3.7 → 3) where
    DuckDB's TRY_CAST rounds (→ 4), so the oracle truncs the DOUBLE
    json_type branch explicitly, and a STRING-valued k goes through
    Spark's string→int cast (integral tokens only, '+5' accepted —
    DuckDB's cast of the QUOTED json_extract lexeme '"+5"' is NULL),
    mirrored by an integral-token-regexp ->> branch with explicit
    [\\x00-\\x20] padding — Spark's string cast trims exactly that
    ASCII range (incl NUL), not unicode spaces (probe-verified r10:
    string '7' → 7, '\\t8\\t' → 8, 7.0 → 7, true → 1, int32
    overflow → NULL agree). Canonical re-serialization: Spark's variant SORTS object
    members (the variant metadata dictionary is ordered for binary
    search) where DuckDB's json() preserves source order, so the
    oracle rebuilds top-level objects from list_sort(json_keys) with
    quoted-path extraction (keys containing '$', quotes, backslashes,
    or NBSP all probe-verified, ctrl-char world r10); NESTED
    multi-key objects and number-lexeme rendering remain
    implementation-defined (Spark prints JCS shortest form — {"k":7}
    for input 7.0, 100 for 1e2 — DuckDB keeps the source lexeme;
    badjson world's _AMBIGUOUS rows pin abort-safety). Duplicate-key
    and beyond-double-range JSON stay OUT of the value contract
    (unspecified by RFC 8259; engines legitimately disagree) — the
    world pins abort-safety only for those."""
    ev = load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return ev.select("event_id", v.alias("v")).select(
        "event_id",
        F.try_variant_get("v", "$.k", "int").alias("k"),
        F.to_json("v").alias("canonical"),
        F.when(
            F.col("v").isNotNull(),
            F.try_variant_get("v", "$.missing", "string").isNull(),
        ).alias("missing_is_null"),
    )


@query(
    "fn_collate",
    oracle="""
SELECT min(w) AS w_min, count(*) AS n
FROM (
  SELECT unnest(string_split(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g'), ' ')) AS w
  FROM documents) t
WHERE length(w) >= 3
GROUP BY lower(w)
""",
)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): fold case
    variants of a token together by grouping on the column under
    UTF8_LCASE collation instead of materializing lower(w).

    The group KEY value under a non-binary collation is whichever
    variant the engine keeps — nondeterministic across partitionings —
    so the deterministic output is min(w) under binary collation plus
    the count; the oracle folds with lower() (equivalent for this
    ASCII corpus). Collation comparison happens in the hash agg's key
    comparator — still one map-side-combinable aggregate, no extra
    projection."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.regexp_replace("text", "[^a-zA-Z ]", " "), " ")
        ).alias("w")
    ).where(F.length("w") >= 3)
    return words.groupBy(F.expr("w COLLATE UTF8_LCASE").alias("wk")).agg(
        F.min(F.expr("w COLLATE UTF8_BINARY")).alias("w_min"),
        F.count("*").alias("n"),
    ).drop("wk").select("w_min", "n")


@query(
    "agg_approx_topk",
    oracle="""
SELECT event_type, count(*) AS n
FROM events GROUP BY event_type
ORDER BY n DESC, event_type LIMIT 3
""",
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy-hitters sketch (Spark 4): top-3 event types
    with counts from ONE mergeable sketch aggregate — no full groupBy
    + sort at 100 TB when the domain is huge; the sketch tracks 10k
    candidates per partition and merges.

    On this bounded 5-value domain the sketch is EXACT, which is what
    makes the SQL oracle legitimate; the operator's contract at scale
    is approximate with count error bounded by the tracked-item
    budget."""
    ev = load(spark, sf_dir, "events")
    topk = ev.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return topk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("event_type"), F.col("e.count").alias("n")
    )


@query(
    "join_dpp",
    oracle="""
SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
WHERE CAST(date_trunc('day', ts) AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
GROUP BY 1
""",
)
def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a day-partitioned fact joined to a
    tiny day dimension — at planning time the fact's partition filter
    is UNKNOWN; DPP injects the dim's day list as a runtime subquery
    into the fact's PartitionFilters, so only 3 of ~30 day directories
    are ever read (the star-schema pattern that makes or breaks
    100 TB fact scans; pinned in test_plans).

    Setup stages the fact partitioned by day (repartition on the
    partition column first so each day is one file, not one file per
    task x day)."""
    import os
    import tempfile

    ev = load(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        "systematic_review_classification_spark_dpp",
        os.path.basename(sf_dir.rstrip("/")),
    )
    fact = ev.withColumn("day", F.date_trunc("day", F.col("ts")).cast("date"))
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            fact.repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(out)
        )
    # explicit schema (partition column included): an empty staged
    # fact has no directories to infer from; DPP still injects the
    # runtime PartitionFilters subquery on the declared day column
    part_fact = spark.read.schema(fact.schema).parquet(out)
    # the dim carries a real filter: DPP's planner rule only injects
    # the runtime subquery when the build side has a selective
    # predicate (otherwise pruning is assumed not worthwhile)
    dim = (
        spark.range(1, 32)
        .select(
            F.make_date(F.lit(2024), F.lit(1), F.col("id").cast("int")).alias(
                "day_key"
            )
        )
        .where(
            F.col("day_key").between(F.lit("2024-01-05"), F.lit("2024-01-07"))
        )
    )
    return (
        part_fact.join(
            F.broadcast(dim), part_fact.day == F.col("day_key")
        )
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "src_json_array",
    oracle="""
SELECT sku::BIGINT AS sku, name, price::DOUBLE AS price, n_tags::INTEGER AS n_tags
FROM (VALUES
  (101, 'widget', 9.99, 2),
  (102, 'gadget', 19.5, 0),
  (103, 'gizmo "deluxe"', NULL, 1)
) AS t(sku, name, price, n_tags)
""",
)
def src_json_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-level JSON ARRAY document (tests/fixtures/catalog.json) —
    the other JSON shape in the wild besides JSON-lines. multiLine
    mode parses the whole document and explodes the array into rows.

    Scale note: multiLine JSON is non-splittable (one parser per
    file), so array-of-records exports must arrive as many files —
    parallelism comes from file count, exactly like multiLine CSV
    (src_csv_quoted)."""
    d = spark.read.option("multiLine", True).json(
        os.path.join(_FIXTURE_DIR, "catalog.json")
    )
    return d.select(
        "sku", "name", "price", F.size("tags").alias("n_tags")
    )


@query(
    "sink_csv_options",
    oracle="""
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price
FROM orders
WHERE o_orderstatus = 'P'
""",
)
def sink_csv_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV writer options round-trip: write a filtered extract as
    tab-separated with explicit quoting/escape and a header, read it
    back with the same dialect. Pins that the writer/reader option
    pair is lossless for strings containing the delimiter and quotes
    (o_orderpriority values contain '-'; the quote mode must not
    mangle them). Export files are written per-partition in parallel
    — a CSV sink scales exactly like any other sink, only the dialect
    is legacy."""
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        "systematic_review_classification_spark_csv_sink",
        os.path.basename(sf_dir.rstrip("/")),
    )
    ex = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "P")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    (
        ex.write.mode("overwrite")
        .options(header=True, sep="\t", quote='"', escape='"')
        .csv(out)
    )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .options(header=True, sep="\t", quote='"', escape='"')
        .csv(out)
    )


@query(
    "sink_zorder",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_partkey % 16 AS INTEGER) AS px,
       CAST(l_suppkey % 16 AS INTEGER) AS sy,
       CAST(
         ((l_partkey % 16) & 1)       * 1 + ((l_suppkey % 16) & 1)       * 2
       + (((l_partkey % 16) // 2) & 1) * 4 + (((l_suppkey % 16) // 2) & 1) * 8
       + (((l_partkey % 16) // 4) & 1) * 16 + (((l_suppkey % 16) // 4) & 1) * 32
       + (((l_partkey % 16) // 8) & 1) * 64 + (((l_suppkey % 16) // 8) & 1) * 128
       AS INTEGER) AS zcode
FROM lineitem
WHERE l_quantity >= 49
""",
)
def sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two
    join/filter dimensions into one sort key, so range-sorting the
    files makes parquet row-group min/max stats selective on BOTH
    columns at once — the multi-dimensional generalization of
    sink_sorted_parquet's single-column clustering, and what table
    formats' OPTIMIZE ZORDER does underneath.

    The bit interleave is plain integer arithmetic (bit-identical in
    both engines — same portability rule as the md5-based hashes);
    computing it is a pure codegen projection. The filter keeps the
    verified output small; the layout property itself (tight zcode
    ranges per file after repartitionByRange on zcode) is exercised by
    writing and reading back in tests."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    px = (F.col("l_partkey") % 16).cast("int")
    sy = (F.col("l_suppkey") % 16).cast("int")
    # interleave 4 bits of each dimension: bit i of px -> bit 2i,
    # bit i of sy -> bit 2i+1
    z = F.lit(0)
    for i in range(4):
        z = z + ((px / (2**i)).cast("int") % 2) * (2 ** (2 * i))
        z = z + ((sy / (2**i)).cast("int") % 2) * (2 ** (2 * i + 1))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        px.alias("px"),
        sy.alias("sy"),
        z.cast("int").alias("zcode"),
    )


@query(
    "sink_compaction",
    oracle="""
SELECT 'before' AS phase, 32 AS n_files, count(*) AS n_rows FROM events
UNION ALL
SELECT 'after' AS phase, 2 AS n_files, count(*) AS n_rows FROM events
""",
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the maintenance job every file-based
    lake runs: a fragmented 32-file layout is rewritten into 2 large
    files with coalesce (no shuffle: coalesce only narrows the
    partitioning, unlike repartition which would pay a full exchange
    to rebalance — the right trade for compaction, where input
    partitions are already small and numerous).

    Output reports (phase, n_files, n_rows) for both layouts, with
    n_files counted from the hidden _metadata.file_name column and
    row counts proving the rewrite is lossless. At 100 TB this runs
    per-partition-directory with a target file size, never globally."""
    import os
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        "systematic_review_classification_spark_compact",
        os.path.basename(sf_dir.rstrip("/")),
    )
    frag, packed = f"{base}/frag", f"{base}/packed"
    ev = load(spark, sf_dir, "events")
    ev.repartition(32).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(2).write.mode("overwrite").parquet(packed)

    def stats(path, phase):
        d = spark.read.parquet(path)
        return d.agg(
            F.lit(phase).alias("phase"),
            F.countDistinct(F.col("_metadata.file_name")).cast("int").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    return stats(frag, "before").unionByName(stats(packed, "after"))


@query(
    "fn_string_more",
    oracle="""
SELECT doc_id,
       ascii(substring(text, 1, 1))             AS first_code,
       chr(65 + CAST(doc_id % 26 AS INTEGER))   AS letter,
       left(text, 8)                            AS head8,
       right(text, 5)                           AS tail5,
       repeat('=', CAST(doc_id % 4 AS INTEGER)) AS bar,
       translate(left(text, 20), 'aeiou', '_____') AS devoweled,
       CASE WHEN text IS NULL THEN NULL
            ELSE split_part(text, ' ', 2) END   AS second_word
FROM documents
""",
)
def fn_string_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function tranche (ascii/chr/left/right/repeat/
    translate/split_part) — byte-code, slicing, and field-extraction
    parity both engines agree on exactly. Pure codegen projections;
    complements fn_string's core set. One NULL-policy divergence:
    DuckDB split_part(NULL, ...) returns '' where Spark returns NULL —
    the oracle CASEs it back to NULL."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.ascii(F.substring("text", 1, 1)).alias("first_code"),
        F.chr(65 + F.col("doc_id") % 26).alias("letter"),
        F.left("text", F.lit(8)).alias("head8"),
        F.right("text", F.lit(5)).alias("tail5"),
        F.repeat(F.lit("="), (F.col("doc_id") % 4).cast("int")).alias("bar"),
        F.translate(F.left("text", F.lit(20)), "aeiou", "_____").alias("devoweled"),
        F.split_part("text", F.lit(" "), F.lit(2)).alias("second_word"),
    )


@query(
    "fn_mask",
    oracle="""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(left(text, 40),
         '\\p{Lu}', 'X', 'g'), '\\p{Ll}', 'x', 'g'), '\\p{Nd}', 'n', 'g') AS masked,
       regexp_replace(left(text, 40), '\\p{Nd}', '*', 'g') AS digits_starred
FROM documents
""",
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask() — the built-in data-masking function (upper→X, lower→x,
    digit→n, other kept), plus a digits-only variant — the
    de-identification primitive for sharing derived tables. DuckDB has
    no mask(), so the oracle spells out the same character-class
    substitution with UNICODE classes (\\p{Lu}/\\p{Ll}/\\p{Nd}):
    Spark's mask() tests Character.isUpperCase etc., so é masks to x
    and 汉 (category Lo) passes through — ASCII [a-z] classes would
    silently leak accented letters. Pure codegen projection; complements the regex-based
    txt_pii_scrub with the engine-native masking path."""
    d = load(spark, sf_dir, "documents")
    head = F.left("text", F.lit(40))
    return d.select(
        "doc_id",
        F.mask(head).alias("masked"),
        F.mask(
            head,
            upperChar=F.lit(None),
            lowerChar=F.lit(None),
            digitChar=F.lit("*"),
        ).alias("digits_starred"),
    )


@query(
    "sql_natural_join",
    oracle="""
SELECT n_name, r_name
FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation) n
NATURAL JOIN region
""",
)
def sql_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN / USING frontend parity: the join condition is
    inferred from the shared column name. Desugars to the identical
    broadcast equi-join as an explicit ON — pinning that the frontend
    sugar carries no plan cost. (NATURAL JOIN is listed for parity;
    production code should prefer USING/ON — an accidental shared
    column silently changes the join.)"""
    load(spark, sf_dir, "nation").selectExpr(
        "n_nationkey", "n_name", "n_regionkey AS r_regionkey"
    ).createOrReplaceTempView("nation_nj")
    load(spark, sf_dir, "region").createOrReplaceTempView("region_nj")
    return spark.sql("SELECT n_name, r_name FROM nation_nj NATURAL JOIN region_nj")


@query(
    "agg_percentile_disc",
    oracle="""
SELECT o_orderpriority,
       round(quantile_disc(o_totalprice, 0.25), 2) AS p25,
       round(quantile_disc(o_totalprice, 0.50), 2) AS p50,
       round(quantile_disc(o_totalprice, 0.75), 2) AS p75
FROM orders WHERE isfinite(o_totalprice) GROUP BY o_orderpriority
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete quantiles (percentile_disc WITHIN GROUP): the reported
    quartile is an ACTUAL data element, never an interpolated value —
    what a latency or spend report wants (agg_median_pct covers the
    interpolated percentile_cont family). Element selection — the
    smallest value whose cume_dist reaches p — agrees between engines,
    so the oracle matches exactly; round(2) only normalizes the
    double.

    Non-finite values are filtered on both engines: DuckDB's
    comparison-based quantile selection is run-to-run
    NONDETERMINISTIC over a group mixing NaN and finite values
    (probe-verified on agg_median_pct's median — same machinery)."""
    load(spark, sf_dir, "orders").filter(
        finite("o_totalprice")
    ).createOrReplaceTempView("orders_pd")
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p25,
               round(percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p50,
               round(percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p75
        FROM orders_pd GROUP BY o_orderpriority
        """
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY o_orderpriority
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+):
    keys bucket into 32k-bit bitmaps (bitmap_bucket_number /
    bitmap_bit_position), each group x bucket ORs its bitmap together
    (bitmap_construct_agg — mergeable, fixed 4 KB state), and the
    distinct count is the sum of per-bucket popcounts.

    This is the exact-count analogue of HLL (agg_approx_distinct /
    agg_hll_sketch): linear state in key-range/32k rather than the
    sketch's constant, but no error — the materialized-view pattern
    for COUNT(DISTINCT) at 100 TB. The oracle is the plain
    count(DISTINCT)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_bm")
    return spark.sql(
        """
        SELECT o_orderpriority, sum(cnt) AS n_cust FROM (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bkt,
                 bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey))) AS cnt
          FROM orders_bm
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        ) GROUP BY o_orderpriority
        """
    )


@query("wl_partition_balance")  # rows-only: partition ids are engine-internal
def wl_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-balance observability: per-partition row counts of
    the shuffled fact (spark_partition_id after a repartition on the
    join key), summarized as a balance report — the first thing to
    look at when one straggler task dominates a stage. Rows-only by
    nature (partition ids are engine-internal);
    tests/test_invariants.py pins conservation (counts sum to the
    table total) and the balance factor on the hash-partitioned key."""
    li = load(spark, sf_dir, "lineitem").repartition(32, "l_orderkey")
    per = li.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum("rows").cast("bigint").alias("total_rows"),
        F.min("rows").cast("bigint").alias("min_rows"),
        F.max("rows").cast("bigint").alias("max_rows"),
        F.round(
            F.max("rows") / (F.sum("rows") / F.count(F.lit(1))), 4
        ).alias("skew_factor"),
    )


@query(
    "rt_analyze_stats",
    oracle="""
SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders FROM lineitem
""",
)
def rt_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE … COMPUTE STATISTICS — feeding the cost-based
    optimizer: table row counts and per-column NDVs land in the
    catalog, where join reordering and broadcast decisions read them.
    The operator analyzes a catalog table, reads the recorded rowCount
    back from the catalog metadata, and emits it NEXT TO the live
    counts — equal by construction (ANALYZE counts exactly), which is
    precisely what makes the stats trustworthy inputs for CBO. At
    100 TB you ANALYZE partitions incrementally on ingest; the
    catalog read stays O(1)."""
    import shutil

    from systematic_review_classification_spark.streaming.helpers import sf_tag

    import os

    # PID-keyed like the other staging roots (concurrent harness
    # processes must not race on the table's parquet files)
    t = f"li_stats_{sf_tag(sf_dir)}_{os.getpid()}"
    base = f"/tmp/systematic_review_classification_spark_stats/{t}"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(base, ignore_errors=True)
    load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).write.mode("overwrite").option("path", base).saveAsTable(t)
    spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
    stats = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").filter(
        F.col("col_name") == "Statistics"
    )
    n_from_stats = stats.select(
        F.regexp_extract("data_type", r"(\d+) rows", 1).cast("bigint").alias("n")
    )
    live = spark.table(t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    # catalog rowCount must equal the live count — join enforces it:
    # a drifted stat would produce an empty (row-count-mismatched) result
    return live.join(
        F.broadcast(n_from_stats), live.n_rows == n_from_stats.n
    ).select("n_rows", "n_orders")
