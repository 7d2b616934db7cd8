"""Category L — UDF / UDAF / UDTF surface (SURVEY.md §2.L).

Policy (SURVEY.md §1.2, guide): UDFs are the slow path. Every UDF here
exists to prove the extension mechanism and is oracle-checked against
the built-in twin expression that SHOULD replace it in production
code. Ordering of preference at scale:

  built-in expression  >  pandas UDF (Arrow-batched)  >  row Python UDF

Row UDFs serialize row-at-a-time through a forked Python worker
(~10-100× slower than codegen); pandas UDFs amortize via Arrow record
batches; iterator pandas UDFs additionally amortize per-partition
setup (model loading etc.).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load
from systematic_review_classification_spark.streaming.helpers import sf_tag


@query(
    "udf_python",
    oracle="""
SELECT doc_id, length(text) AS slen, upper(lang) AS lang_up
FROM documents WHERE doc_id < 300
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF, checked against its built-in twin
    (length/upper). Correct, and ~10-100x slower than the twin — which
    is the documented reason it is not used anywhere else."""
    # a row UDF must be NULL-total like the SQL twin: length(NULL) and
    # upper(NULL) are NULL, and a NULL text cell (dirty data at scale)
    # must not crash the Python worker
    slen = F.udf(lambda s: len(s) if s is not None else None, T.IntegerType())
    up = F.udf(lambda s: s.upper() if s is not None else None, T.StringType())
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select("doc_id", slen("text").alias("slen"), up("lang").alias("lang_up"))


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem WHERE l_orderkey < 2000
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Series→Series over Arrow batches)."""

    @pandas_udf(T.DoubleType())
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return (price * (1 - disc)).round(4)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "udf_pandas_iter",
    oracle="""
SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS taxed
FROM orders WHERE o_orderkey < 3000
""",
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator pandas UDF — per-partition setup (the broadcast-model
    loading shape) paid once, then Arrow batches stream through."""

    @pandas_udf(T.DoubleType())
    def taxed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rate = 1.1  # expensive setup would happen here, once per partition
        for s in batches:
            yield (s * rate).round(4)

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select("o_orderkey", taxed("o_totalprice").alias("taxed"))


@query(
    "udaf_pandas_agg",
    oracle="""
SELECT l_returnflag,
       avg(CASE WHEN isnan(l_quantity) THEN NULL ELSE l_quantity END)
         AS mean_qty,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Series→scalar). Quantities are
    integer-valued doubles, so the pandas sum is exact and the mean is
    bit-identical to SQL avg — no rounding required. The UDAF must
    mirror SQL avg's NULL policy: skip NULLs, and return NULL (not
    0/NaN) for a group with no non-NULL values — ``Series.mean``
    does exactly that once the NaN result is mapped to None.

    Documented pandas-UDAF limitation: Arrow delivers SQL NULL *and*
    NaN to the worker as the same NaN, so a NaN datum is
    indistinguishable from a missing one and ``mean`` skips both.
    The oracle declares that contract (CASE isnan → NULL) rather
    than pretending SQL's NaN-propagating avg is reproducible here."""

    @pandas_udf(T.DoubleType())
    def mean_qty(q: pd.Series) -> float:
        m = q.mean()  # skips NaN like SQL avg skips NULL
        return float(m) if pd.notna(m) else None

    # pandas grouped aggs can't mix with JVM aggs in one agg() —
    # the row count is a pandas UDAF too
    @pandas_udf(T.LongType())
    def n_rows(q: pd.Series) -> int:
        return len(q)

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        mean_qty("l_quantity").alias("mean_qty"), n_rows("l_quantity").alias("n")
    )


@query(
    "udf_grouped_map",
    oracle="""
SELECT p_brand, count(*) AS n,
       round(min(p_retailprice), 2) AS min_price,
       round(max(p_retailprice), 2) AS max_price
FROM part GROUP BY p_brand
""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: whole group as one pandas frame.
    The scale contract: a group must fit one worker's memory — use
    only with bounded group cardinality (brands here, never doc_id)."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [pdf["p_brand"].iloc[0]],
                "n": [len(pdf)],
                "min_price": [round(pdf["p_retailprice"].min(), 2)],
                "max_price": [round(pdf["p_retailprice"].max(), 2)],
            }
        )

    p = load(spark, sf_dir, "part")
    return p.groupBy("p_brand").applyInPandas(
        summarize, "p_brand string, n long, min_price double, max_price double"
    )


@query(
    "udf_map_pandas",
    oracle="""
SELECT event_id, event_type, round(value, 2) AS value_r,
       CAST(floor(value / 100) AS BIGINT) AS value_bucket
FROM events WHERE value > 100 AND isfinite(value) AND abs(value) <= 9e15
""",
)
def udf_map_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas partition transform — the batch-level shape used for
    tokenizers / model scoring / multimodal decode: arbitrary
    per-batch pandas logic, streaming batches in and out."""

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # finite AND on-grid only (|x| <= 9e15, the finite_bounded
            # policy — overflow world r9): floor(inf).astype(int64)
            # would crash the worker, and a FINITE 1e150 silently
            # wraps to INT64_MIN garbage under numpy's astype — one
            # poisoned double must never abort OR corrupt the batch
            keep = pdf[
                (pdf["value"] > 100)
                & np.isfinite(pdf["value"])
                & (pdf["value"].abs() <= 9e15)
            ]
            yield pd.DataFrame(
                {
                    "event_id": keep["event_id"],
                    "event_type": keep["event_type"],
                    "value_r": keep["value"].round(2),
                    "value_bucket": np.floor(keep["value"] / 100).astype("int64"),
                }
            )

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.mapInPandas(
        transform, "event_id long, event_type string, value_r double, value_bucket long"
    )


@query(
    "udtf_python",
    oracle="""
SELECT doc_id,
       unnest(string_split(text, ' '))                 AS token,
       unnest(range(0, len(string_split(text, ' '))))  AS pos
FROM documents WHERE doc_id < 50
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one row in → token rows out) via SQL LATERAL join,
    oracle-checked against the built-in posexplode/unnest twin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, token: string, pos: bigint")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            # NULL text yields no rows — matching the twin, where
            # unnest(string_split(NULL, ' ')) unnests to zero rows
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, tok, i

    tag = sf_tag(sf_dir)
    spark.udtf.register(f"tokenize_{tag}", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView(f"docs_{tag}")
    return spark.sql(
        f"""
        SELECT t.doc_id, t.token, t.pos
        FROM docs_{tag} d, LATERAL tokenize_{tag}(d.doc_id, d.text) t
        WHERE d.doc_id < 50
        """
    )


@query("udf_arrow_convert", oracle="SELECT r_regionkey, r_name FROM region")
def udf_arrow_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow interchange round-trip: toPandas() → createDataFrame()
    with arrow.pyspark.enabled — the JVM↔Python boundary itself,
    verified lossless against the source table."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    pdf = load(spark, sf_dir, "region").select("r_regionkey", "r_name").toPandas()
    # explicit schema: an empty pandas frame (empty upstream filter)
    # has no rows for type inference
    return spark.createDataFrame(pdf, schema="r_regionkey int, r_name string")
