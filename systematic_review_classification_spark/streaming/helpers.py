"""Shared plumbing for streaming operators: staged file sources,
checkpoint dirs, memory-sink naming."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from systematic_review_classification_spark.session import ensure_confs

IO_ROOT = "/tmp/systematic_review_classification_spark_stream"

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw ns (nanosAsLong)
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
    """readStream over a staged events dir, ts normalized to µs exactly
    like the batch loader. Watermark-bearing queries need as_ntz=False:
    withWatermark only accepts TIMESTAMP (ltz) event time — with the
    UTC session timezone the two are value-identical."""
    ensure_confs(spark)
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    if as_ntz:
        ts = ts.cast("timestamp_ntz")
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(src).withColumn("ts", ts)


def run_to_memory(df: DataFrame, sf_dir: str, name: str, mode: str) -> str:
    """Execute a streaming query into a memory sink with availableNow;
    returns the sink table name. (Memory sink = test harness only; the
    production path is update-mode into a replayable sink.)"""
    qname = f"mem_{name}_{sf_tag(sf_dir)}"
    ckpt = work_dir(sf_dir, f"{name}_ckpt")
    (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return qname
