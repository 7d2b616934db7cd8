"""Category J (dedup half) — deduplication operators (SURVEY.md §2.J).

Three tiers, matching how an LLM-data pipeline dedups at 100 TB:

1. exact      — fingerprint hash + one groupBy. Linear, one shuffle.
2. near/exact — token-set Jaccard, but ONLY on blocked candidate
                pairs (same source block here; at scale: LSH buckets).
                Never an unblocked O(n²) pairwise pass.
3. minhash    — MLlib MinHashLSH banding: sub-quadratic candidate
                generation; exact Jaccard re-check only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load


@query(
    "dedup_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
)
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
FROM corpus GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint, keep-lowest-id. The corpus
    is the documents table unioned with a shifted copy of every third
    doc, so real duplicates exist and are provably collapsed."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    corpus = d.unionByName(dup)
    return corpus.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


@query(
    "dedup_near_jaccard",
    oracle="""
WITH t AS (SELECT doc_id, source,
                  list_sort(list_distinct(string_split(text, ' '))) AS toks
           FROM documents),
pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                 len(list_intersect(a.toks, b.toks)) AS n_common,
                 len(a.toks) AS n1, len(b.toks) AS n2
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
SELECT id1, id2,
       round(CAST(n_common AS DOUBLE) / (n1 + n2 - n_common), 6) AS jaccard
FROM pairs
WHERE CAST(n_common AS DOUBLE) / (n1 + n2 - n_common) >= 0.62
""",
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection via token-set Jaccard on blocked pairs.
    Blocking key = source (the generic pattern: any cheap equality
    block — at 100 TB an LSH band hash). Jaccard is integer-ratio
    arithmetic, so both engines divide identical values."""
    t = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    a, b = t.alias("a"), t.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id1"),
        F.col("b.doc_id").alias("id2"),
        F.size(F.array_intersect("a.toks", "b.toks")).alias("n_common"),
        F.size("a.toks").alias("n1"),
        F.size("b.toks").alias("n2"),
    )
    jac = F.col("n_common").cast("double") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return pairs.filter(jac >= 0.62).select(
        "id1", "id2", F.round(jac, 6).alias("jaccard")
    )


@query("dedup_minhash")  # rows-only: LSH banding layout is engine-specific
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup at scale: CountVectorizer(binary) →
    MinHashLSH(seeded) → approxSimilarityJoin. Sub-quadratic candidate
    generation — the only near-dedup shape that survives 100 TB.
    Local tests assert the candidate set covers exact duplicates."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = RegexTokenizer(inputCol="text", outputCol="toks", pattern="\\s+").transform(d)
    cv = CountVectorizer(inputCol="toks", outputCol="vec", binary=True, minDF=1.0).fit(toks)
    vecs = cv.transform(toks).filter(F.expr("aggregate(toks, 0, (a, x) -> a + 1) > 0"))
    mh = MinHashLSH(inputCol="vec", outputCol="sig", numHashTables=8, seed=42).fit(vecs)
    pairs = mh.approxSimilarityJoin(vecs, vecs, 0.3, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("id1"),
            F.col("datasetB.doc_id").alias("id2"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .filter(F.col("id1") < F.col("id2"))
    )
