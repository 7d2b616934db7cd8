"""Shared plumbing for streaming operators: staged file sources,
checkpoint dirs, memory-sink naming."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from systematic_review_classification_spark.session import ensure_confs

# PID-keyed for the same reason as operators/scans.IO_ROOT: staged
# stream sources + checkpoints must not be shared across concurrent
# harness processes.
IO_ROOT = f"/tmp/systematic_review_classification_spark_stream_{os.getpid()}"

# events.ts is parquet TIMESTAMP(NANOS). Declaring it TIMESTAMP_NTZ
# makes the vectorized reader truncate ns -> µs itself — exactly what
# DuckDB does — so no epoch arithmetic exists anywhere downstream.
# (Declaring LongType instead yields MICROseconds in this Spark build,
# which is why any "raw long = ns, div 1000" assumption is banned;
# see tests/test_invariants.py::test_events_ts_sanity.)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),  # ns truncated to µs by reader
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


def work_dir(sf_dir: str, name: str) -> str:
    path = os.path.join(IO_ROOT, sf_tag(sf_dir), name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


def stage_events_dir(sf_dir: str, name: str) -> str:
    """Stage events.parquet into a single-file source directory."""
    src = work_dir(sf_dir, name)
    os.symlink(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
    return src


def read_events_stream(spark: SparkSession, src: str, as_ntz: bool = True) -> DataFrame:
    """readStream over a staged events dir; the explicit TIMESTAMP_NTZ
    schema makes the reader deliver µs-truncated event time directly.
    Watermark-bearing queries need as_ntz=False: withWatermark only
    accepts TIMESTAMP (ltz) event time — with the UTC session timezone
    the two are value-identical."""
    ensure_confs(spark)
    df = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    if not as_ntz:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


from contextlib import contextmanager


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Bound the state-store partition count for a streaming execution.

    A streaming query creates one state partition per shuffle
    partition, fixed at first run by the checkpoint. An uncontrolled
    caller session (e.g. a vanilla 200-partition default) pays 200
    state-store instances per stateful operator per micro-batch — pure
    overhead at test scale. Every streaming op here starts from a fresh
    checkpoint, so scoping the conf around the run is safe; a real
    deployment sizes this to the cluster once, at first launch."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_to_memory(
    df: DataFrame, sf_dir: str, name: str, mode: str, once: bool = False
) -> str:
    """Execute a streaming query into a memory sink with availableNow
    (or Trigger.Once for unbounded sources like rate, which have no
    "available now" notion); returns the sink table name. (Memory sink
    = test harness only; the production path is update-mode into a
    replayable sink.)"""
    qname = f"mem_{name}_{sf_tag(sf_dir)}"
    ckpt = work_dir(sf_dir, f"{name}_ckpt")
    trigger = {"once": True} if once else {"availableNow": True}
    with stream_shuffle_partitions(df.sparkSession):
        (
            df.writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
            .awaitTermination()
        )
    return qname
