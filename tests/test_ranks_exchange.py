"""The two-pass range rank's exchange-determinism contract (ADVICE r4).

``functions/ranks.py`` evaluates the range-partitioned relation in two
plan branches (per-partition stats, offset join). Correct offsets need
both branches to observe the SAME range bounds / partition ids. Two
pins:

1. under default config the branches share one exchange
   (``ReusedExchange`` in the formatted plan) — the cheap path;
2. with ``spark.sql.exchange.reuse=false`` the ranks are STILL exact
   (RangePartitioner samples deterministically, so two independent
   exchanges over identical input agree on bounds).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from systematic_review_classification_spark.functions.ranks import (
    global_prefix_sum,
    global_rank,
)


def _skewed_df(spark, n=5_000):
    # non-uniform keys + ties so sampled range bounds actually matter
    return spark.range(n).select(
        (F.col("id") * F.col("id") % 977).alias("k"), F.col("id").alias("uid")
    )


def test_global_rank_reuses_one_range_exchange(spark):
    """With AQE off, the ReuseExchange planner rule must fuse the two
    range-exchange branches into one (canonically identical plans) —
    the same property AQE's runtime stage reuse provides when it is on.
    If this ever breaks, the branches have drifted apart structurally
    and the value-level tests below are the only safety net."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = global_rank(_skewed_df(spark), F.col("k"), F.col("uid"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower(), plan
        assert "ReusedExchange" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


@pytest.mark.parametrize("reuse", ["true", "false"])
def test_global_rank_exact_without_exchange_reuse(spark, reuse):
    spark.conf.set("spark.sql.exchange.reuse", reuse)
    try:
        df = _skewed_df(spark)
        got = {
            r.uid: r.rnk
            for r in global_rank(df, F.col("k"), F.col("uid")).collect()
        }
        # reference rank via a driver-side sort of the collected rows
        # (test-only; 5k rows)
        rows = sorted((r.k, r.uid) for r in df.collect())
        want = {uid: i + 1 for i, (_, uid) in enumerate(rows)}
        assert got == want
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")


@pytest.mark.parametrize("reuse", ["true", "false"])
def test_global_prefix_sum_exact_without_exchange_reuse(spark, reuse):
    spark.conf.set("spark.sql.exchange.reuse", reuse)
    try:
        df = _skewed_df(spark).withColumn("v", (F.col("uid") % 7).cast("double"))
        got = {
            r.uid: r.cum
            for r in global_prefix_sum(
                df, "v", F.col("k"), F.col("uid")
            ).collect()
        }
        rows = sorted((r.k, r.uid, r.v) for r in df.collect())
        cum, want = 0.0, {}
        for _, uid, v in rows:
            cum += v
            want[uid] = cum
        assert got == pytest.approx(want)
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
