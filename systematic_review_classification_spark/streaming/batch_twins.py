"""Category K — batch twins of streaming window semantics
(SURVEY.md §2.K strategy: every streaming window shape also exists as
a batch query with a full oracle, so window semantics are verified
even where the streaming runtime itself can't be oracle-matched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systematic_review_classification_spark.registry import query
from systematic_review_classification_spark.sources.tables import load


@query(
    "stream_session",
    oracle="""
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new,
         event_id
  FROM events WHERE ts IS NOT NULL),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via session_window,
    executed through the REAL streaming engine (file replay →
    merging session state per key → complete-mode memory sink); the
    oracle derives the same sessions with the classic lag +
    cumulative-sum rewrite."""
    from systematic_review_classification_spark.streaming.helpers import (
        read_events_stream,
        run_to_memory,
        stage_events_dir,
    )

    src = stage_events_dir(sf_dir, "session_src")
    stream = read_events_stream(spark, src, as_ntz=False).withWatermark("ts", "45 days")
    agg = stream.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = agg.select(
        "user_id",
        F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
        "n_events",
    )
    qname = run_to_memory(out, sf_dir, "session", "complete")
    return spark.table(qname)


@query(
    "batch_session_window",
    oracle="""
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new,
         event_id
  FROM events WHERE ts IS NOT NULL),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in BATCH mode — the same merging-session operator
    the stream uses, over the batch relation (the batch/stream unified
    semantics Spark guarantees). NULL timestamps are filtered
    explicitly on both sides: session_window silently drops them (no
    window can be assigned — same as the streaming engine), and the
    oracle's lag/cumsum rewrite would otherwise emit them as a
    phantom NaT session."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
