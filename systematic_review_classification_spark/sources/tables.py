"""Table loaders for the test star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

The only table needing special handling is ``events``: its ``ts``
column is parquet TIMESTAMP(NANOS). How Spark surfaces that type has
DRIFTED across environments — observed variants:

* inferred read → ``timestamp_ntz`` already truncated ns → µs
  (current behavior; matches DuckDB's native ns → µs truncation);
* ``nanosAsLong=true`` honored → bigint NANOseconds (older behavior);
* explicit ``LongType`` schema → bigint MICROseconds (current
  behavior — the reader truncates before widening to long!).

So no code path may assume a fixed unit for a bigint ``ts``. The guard
below keys on the observed dtype and, for bigint, on magnitude:
µs-epoch for this dataset ≈ 1.7e15, ns-epoch ≈ 1.7e18, so 1e17 cleanly
separates them (it would misread only dates past year 5138). The
conversion uses *truncating* integer division (``div``) to match
DuckDB; float division would lose precision (ns epoch > 2^53) and
round. See SURVEY.md §1.4.1 and
tests/test_invariants.py::test_events_ts_sanity.
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


# bigint epochs below this are µs, above ns (2024 ≈ 1.7e15 µs / 1.7e18 ns)
_NS_MAGNITUDE_CUTOFF = 10**17


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an events timestamp column to ``timestamp_ntz`` (µs)
    whatever the reader delivered: timestamp/ntz pass through; bigint is
    unit-detected by magnitude per row (ns → truncating ``div 1000``)."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        us = F.when(
            F.abs(F.col(col)) >= F.lit(_NS_MAGNITUDE_CUTOFF),
            F.expr(f"{col} div 1000"),
        ).otherwise(F.col(col))
        return df.withColumn(col, F.timestamp_micros(us).cast("timestamp_ntz"))
    if dtype and dtype != "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalizes events.ts to timestamp_ntz(µs)."""
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df
