"""Table loaders for the test star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

The only table needing special handling is ``events``: its ``ts``
column is parquet TIMESTAMP(NANOS). With
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark reads it as bigint
nanoseconds; we convert to ``timestamp_ntz`` at microsecond precision
with *truncating* integer division (``div``), which matches DuckDB's
native read of the same column (DuckDB truncates ns → µs). Float
division would lose precision (ns epoch ≈ 1.7e18 > 2^53) and round —
hence ``div``, never ``/``. See SURVEY.md §1.4.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systematic_review_classification_spark.session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tiny dimension tables: always safe (and profitable) to broadcast.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalizes events.ts to timestamp_ntz(µs)."""
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts left as raw bigint nanoseconds (streaming replay)."""
    ensure_confs(spark)
    return spark.read.parquet(f"{sf_dir}/events.parquet")
